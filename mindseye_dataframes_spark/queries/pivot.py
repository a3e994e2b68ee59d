"""Pivot / conditional aggregation (§2B grouped-agg row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dsum
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q57_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_f,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "parity:pivot"),
)
def q57_pivot(spark, sf_dir):
    """Pivot expressed as conditional aggregation — the shape Spark's
    ``groupBy().pivot()`` lowers to, written explicitly so the plan is
    a single hash aggregate (no extra distinct-values job) and the
    oracle is plain ANSI SQL."""
    li = load_table(spark, sf_dir, "lineitem")

    def when_status(v):
        return F.when(F.col("l_linestatus") == v, F.col("l_quantity")).otherwise(0.0)

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias("n_o"),
            dsum(when_status("F")).alias("qty_f"),
            dsum(when_status("O")).alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q59_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "parity:grouping-sets"),
)
def q59_grouping_sets(spark, sf_dir):
    """GROUPING SETS with GROUPING() markers (§2B grouped-agg row) —
    explicit set list rather than full cube/rollup, expressed via the
    SQL surface (S3) since the grouping-set lattice is a parser-level
    construct; Catalyst expands it to a single Expand+hash-aggregate
    (one scan, one shuffle)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )
