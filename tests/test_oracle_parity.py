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
