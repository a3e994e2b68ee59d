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

from pyspark.sql import Window
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


@query(
    "q160_mixture_token_plan",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
      FROM documents GROUP BY source),
    ranked AS (
      SELECT source, actual_tokens,
             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS r,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM tok),
    wts AS (
      SELECT source, actual_tokens,
             greatest(1, r * 2000000 // (n * (n + 1))) AS weight_ppm
      FROM ranked),
    budget AS (
      SELECT min(actual_tokens * 1000000 // weight_ppm) AS b FROM wts)
    SELECT source, actual_tokens, weight_ppm,
           b * weight_ppm // 1000000 AS planned_tokens,
           (b * weight_ppm // 1000000) * 1000000 // actual_tokens AS rate_ppm
    FROM wts CROSS JOIN budget
    ORDER BY source
    """,
    tags=("curation", "mixture", "north-star"),
)
def q160_mixture_token_plan(spark, sf_dir):
    """Training-mixture planning — the sizing pass before q83's
    mixture sampler: given per-source token supply and target weights
    (here: rank-proportional, w_i ∝ i over sources sorted by name —
    derived, so the query works at any SF), find the largest total
    token budget every source can serve (B = min actual·1e6/w) and
    each source's planned tokens + sampling rate. ALL arithmetic is
    BIGINT floor-division in parts-per-million — the plan is
    bit-identical on every engine, which matters because these
    numbers get embedded in run configs. One token-count aggregate
    over the corpus; everything after operates on |sources| rows."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("actual_tokens"))
    )
    w = Window.orderBy("source")
    ranked = tok.select(
        "source",
        "actual_tokens",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    wts = ranked.select(
        "source",
        "actual_tokens",
        # greatest(1, …): rank-proportional ppm floors to 0 once
        # n(n+1) > 2e6 (~1413 sources); a zero weight divides by zero
        # downstream — NULL on Spark, an error on DuckDB — so clamp the
        # underflow to 1 ppm identically on both engines
        F.expr("greatest(1L, r * 2000000 DIV (n * (n + 1)))").alias("weight_ppm"),
    )
    budget = wts.agg(
        F.min(F.expr("actual_tokens * 1000000 DIV weight_ppm")).alias("b")
    )
    return (
        wts.crossJoin(F.broadcast(budget))
        .select(
            "source",
            "actual_tokens",
            "weight_ppm",
            F.expr("b * weight_ppm DIV 1000000").alias("planned_tokens"),
            F.expr(
                "(b * weight_ppm DIV 1000000) * 1000000 DIV actual_tokens"
            ).alias("rate_ppm"),
        )
        .orderBy("source")
    )
