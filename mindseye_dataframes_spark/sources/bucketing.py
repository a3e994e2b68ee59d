"""Bucketed tables — co-located joins without a shuffle.

The 100 TB design lever the plain parquet path can't give: a table
bucketed by its join key is hash-partitioned *on disk*, so a join
between two tables bucketed the same way (same columns, same bucket
count) needs NO exchange at query time — Spark matches bucket files
pairwise. For a fact table joined on the same key by every query in a
workload, that converts the dominant per-query shuffle into a one-time
write cost.

Rules that make it work (asserted in tests/test_plans.py):
- both sides bucketed by the SAME columns and bucket count;
- bucket count sized so one bucket ≈ one task's worth of data at the
  target scale (100 TB / bucket_size);
- ``sortBy`` the join key inside buckets to also drop the sort from
  sort-merge joins.

This is the DataFrame-level equivalent of the reference's persisted
staging tables (`Trainer.scala:91-99`) upgraded with physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (parquet).

    ``num_buckets`` is a physical-layout decision: at 100 TB with
    ~256 MB task targets that's ~400k buckets over the whole table —
    in practice pick the workload's join parallelism (e.g. 4096) so
    each bucket stays task-sized at the *joined* stage.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives through the
    catalog (``spark.table``), never through ``read.parquet`` on the
    same files."""
    return spark.table(table_name)
