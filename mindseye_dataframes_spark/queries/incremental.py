"""Incremental aggregate maintenance — never rescan history.

q111: the mergeable-partial-state contract behind every 100 TB rollup
pipeline: an aggregate over yesterday's data (``base`` state) plus an
aggregate over today's delta, merged state-wise, must equal the
aggregate over everything. Count and exact-decimal sum are the
canonical mergeable pair (avg/stddev derive from them — SURVEY §2A A1
moments). The query materializes base+delta partial states, merges
them, and emits the merged rollup alongside a ``matches_full`` flag
recomputed from scratch — engine-exact on both sides, so the oracle
proves merge == recompute, not just approximately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q111_incremental_agg",
    oracle="""
    WITH base AS (
      SELECT l_returnflag, count(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
      FROM lineitem WHERE l_orderkey % 10 < 8 GROUP BY l_returnflag),
    delta AS (
      SELECT l_returnflag, count(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
      FROM lineitem WHERE l_orderkey % 10 >= 8 GROUP BY l_returnflag),
    merged AS (
      SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n_merged,
             CAST(sum(s) AS DOUBLE) AS sum_merged
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY l_returnflag),
    full_agg AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_full,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_full
      FROM lineitem GROUP BY l_returnflag)
    SELECT m.l_returnflag, m.n_merged, m.sum_merged,
           (m.n_merged = f.n_full AND m.sum_merged = f.sum_full) AS matches_full
    FROM merged m JOIN full_agg f ON m.l_returnflag = f.l_returnflag
    ORDER BY m.l_returnflag
    """,
    tags=("agg", "incremental", "scale-rewrite"),
)
def q111_incremental_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,2)")

    def state(df):
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), F.sum(dq).alias("s")
        )

    base = state(li.filter(F.col("l_orderkey") % 10 < 8))
    delta = state(li.filter(F.col("l_orderkey") % 10 >= 8))
    merged = (
        base.unionAll(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n_merged"),
            F.sum("s").cast("double").alias("sum_merged"),
        )
    )
    full = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_full"),
        F.sum(dq).cast("double").alias("sum_full"),
    )
    return (
        merged.join(full, "l_returnflag")
        .select(
            "l_returnflag",
            "n_merged",
            "sum_merged",
            (
                (F.col("n_merged") == F.col("n_full"))
                & (F.col("sum_merged") == F.col("sum_full"))
            ).alias("matches_full"),
        )
        .orderBy("l_returnflag")
    )
