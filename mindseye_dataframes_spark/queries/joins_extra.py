"""Join-matrix completion (§2B: full outer, right, cross) — the
remaining join types not exercised by q05/q08/q09/q10/q13/q22/q23."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q51_full_outer_join",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ), spenders AS (
      SELECT o_custkey AS k, n_orders FROM per_cust WHERE n_orders >= 12
    ), rich AS (
      SELECT c_custkey AS k, c_name FROM customer WHERE c_acctbal > 8000
    )
    SELECT COALESCE(s.k, r.k) AS custkey, r.c_name, s.n_orders
    FROM spenders s FULL OUTER JOIN rich r ON s.k = r.k
    ORDER BY custkey
    """,
    tags=("join", "parity:join-full-outer"),
)
def q51_full_outer_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spenders = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
        .select(F.col("o_custkey").alias("sk"), "n_orders")
    )
    rich = customer.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_custkey").alias("rk"), "c_name"
    )
    return (
        spenders.join(rich, spenders.sk == rich.rk, "full_outer")
        .select(
            F.coalesce("sk", "rk").alias("custkey"),
            "c_name",
            "n_orders",
        )
        .orderBy("custkey")
    )


@query(
    "q52_right_and_cross",
    oracle="""
    WITH liagg AS (
      SELECT p.p_partkey, COUNT(l.l_orderkey) AS n_lines
      FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_partkey
    ), pairs AS (
      SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2
    )
    SELECT (SELECT COUNT(*) FROM pairs) AS n_region_pairs,
           COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT) AS unused_parts
    FROM liagg
    """,
    tags=("join", "parity:join-right,join-cross"),
)
def q52_right_and_cross(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    region = load_table(spark, sf_dir, "region")
    liagg = (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )
    r2 = region.select(F.col("r_name").alias("b"))
    n_pairs = (
        region.select(F.col("r_name").alias("a")).crossJoin(r2).count()
    )
    return liagg.agg(
        F.lit(n_pairs).cast("long").alias("n_region_pairs"),
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(F.col("n_lines") == 0, 1).otherwise(0)).alias("unused_parts"),
    )
