"""Curation primitives a 100 TB training-data pipeline needs as
*reproducible* relational operators.

q75: deterministic hash-bucket sampling. ``df.sample(seed)`` (q48) is
seeded but engine-specific — a rerun on a different engine, Spark
version, or partitioning can pick different rows. Hash sampling keys
each row by ``md5(key) % 100`` so the sample is a pure function of the
data: stable across engines (oracle-checkable, unlike q48), across
reruns, and across repartitioning — which is what makes held-out
splits auditable at 100 TB. The md5 stays JVM-side (whole-stage
codegen, no Python), the filter is a narrow map over the scan, and
bucket membership can even serve as a partition-pruning key if the
table is written bucketed by it.

q76: column profiling — per-column row/null/distinct counts and
min/max — the standard first pass over a new crawl snapshot before
dedup/filter decisions. One aggregate pass per column expressed as a
grouping-free ``agg``; all profiled stats render to VARCHAR so one
long-format row per column survives a single union'd schema.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


def hash_bucket(col, buckets: int = 100):
    """Deterministic [0, buckets) bucket from md5 of the rendered key.

    Identical expression exists in ANSI SQL
    (``CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT)``),
    so samples are portable across engines.
    """
    prefix = F.substring(F.md5(F.col(col).cast("string")), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") % buckets).alias("bucket")


@query(
    "q75_hash_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
             AS bucket
    FROM documents
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 5
    ORDER BY doc_id
    """,
    tags=("curation", "sampling", "north-star"),
)
def q75_hash_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", hash_bucket("doc_id"))
        .filter(F.col("bucket") < 5)
        .select("doc_id", "lang", "source", "n_chars", "bucket")
        .orderBy("doc_id")
    )


_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "q76_profile_columns",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
    tags=("curation", "profiling", "north-star"),
)
def q76_profile_columns(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    profiles = [
        orders.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return reduce(lambda a, b: a.unionAll(b), profiles).orderBy("col_name")
