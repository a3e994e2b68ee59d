"""Correlated-subquery + conditional-aggregation surface.

The reference exposes full Spark SQL through its REPL
(`Trainer.scala:110-121`), which includes correlated subqueries; the
engine declares them explicitly here. Comparisons run in exact
decimal (see ``functions/exact.py``) so boundary rows can't flip
between engines on a 1-ulp float difference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dec
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table, register_views

# Parts priced above their brand's average. Stated sum/count form so
# both engines compare exact decimals: AVG would reintroduce a
# double division whose rounding could disagree at the boundary.
_Q70_SQL = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice
FROM part p
WHERE CAST(p.p_retailprice AS DECIMAL(12,2))
        * (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
      > (SELECT SUM(CAST(p3.p_retailprice AS DECIMAL(12,2)))
         FROM part p3 WHERE p3.p_brand = p.p_brand)
ORDER BY p.p_partkey
"""


@query(
    "q70_scalar_subquery",
    oracle=_Q70_SQL,
    tags=("sql", "parity:correlated-scalar-subquery"),
)
def q70_scalar_subquery(spark, sf_dir):
    """Same SQL text on both engines: Catalyst decorrelates the two
    scalar subqueries into aggregate+join — no per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(_Q70_SQL)


@query(
    "q71_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "parity:conditional-agg"),
)
def q71_conditional_agg(spark, sf_dir):
    """DataFrame-API conditional aggregation (the `when`-inside-agg
    idiom — equivalent to SQL FILTER clauses, single hash-agg pass)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
            F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
            .cast("double")
            .alias("disc_revenue"),
        )
        .orderBy("l_returnflag")
    )
