"""Supplier-side queries — completes testdata coverage (supplier was
the last unused table) and exercises a multi-fact join path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dsum
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q54_supplier_volume",
    oracle="""
    SELECT n.n_name,
           COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "parity:supplier"),
)
def q54_supplier_volume(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("n_name")
    )
