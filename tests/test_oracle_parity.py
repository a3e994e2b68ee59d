"""Driver-style correctness gate: every registered query with an
oracle must match DuckDB exactly at the test scale factor."""

from __future__ import annotations

import pytest

from mindseye_dataframes_spark.queries import load_all
from tests.helpers import assert_matches_oracle

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    assert_matches_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir, name=name)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must execute and return a schema."""
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_bounded_compare_engages_and_matches(spark, sf_dir):
    """The opt-in bounded-aggregate comparison (Query.bounded_compare)
    must (a) reproduce the exact compare's verdict on q120 when forced
    to engage via a tiny threshold — the aggregates are engine-equal
    at every sf because the underlying relation is — and (b) catch a
    tampered result: dropping one row moves the cardinality AND the
    order-insensitive checksum, so the assertion fires. This is the
    r12 harness upgrade that turns q120's sf1 row from a documented
    maxResultSize kill (which also poisoned the session for the
    queries swept after it, r8) into a real value-verified green."""
    q = REGISTRY["q120_simhash_hamming_pairs"]
    assert q.bounded_compare is not None
    spec = dict(q.bounded_compare, threshold_rows=1)  # force-engage
    df = q.fn(spark, sf_dir)
    assert_matches_oracle(df, q.oracle, sf_dir, name="q120", bounded=spec)

    n = df.count()
    tampered = df.limit(n - 1)
    with pytest.raises(AssertionError, match="bounded aggregates differ"):
        assert_matches_oracle(
            tampered, q.oracle, sf_dir, name="q120", bounded=spec
        )


def test_bounded_compare_stays_exact_below_threshold(spark, sf_dir):
    """Below threshold_rows the standard exact value compare must run
    (the driver's sf0.01 gate never sees the bounded path): a tampered
    result that keeps count+sum+checksum-sensitive columns intact in
    AGGREGATE but permutes values across rows would only be caught by
    the exact compare — verify the exact path is the one engaged by
    checking a row-level value mismatch is reported as 'rows differ',
    not 'bounded aggregates differ'."""
    import pyspark.sql.functions as F

    q = REGISTRY["q120_simhash_hamming_pairs"]
    df = q.fn(spark, sf_dir)
    # swap the pair orientation on one row: aggregate-invariant for
    # count, but row-level different
    tampered = df.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "hamming"
    )
    with pytest.raises(AssertionError, match="rows differ"):
        assert_matches_oracle(
            tampered, q.oracle, sf_dir, name="q120",
            bounded=q.bounded_compare,  # real threshold: stays exact
        )
