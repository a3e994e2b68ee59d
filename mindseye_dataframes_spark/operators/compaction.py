"""Small-file compaction: the table-maintenance op every lakehouse
runs nightly.

Streaming sinks and incremental upserts fragment tables into many
small files; scans then pay per-file open/footer costs and lose
row-group locality (at 100 TB, a 10k-file partition can be slower to
open than to read). This operator plans and executes merges:

* ``file_row_stats`` — per-file row counts straight from the scan
  (``input_file_name()`` + one hash-agg; no filesystem listing walk,
  so it works on any Hadoop-compatible store).
* ``compaction_plan`` — greedy bin-packing of under-sized files into
  merge groups via a running-sum window: files ordered by path,
  group id = cumulative_rows DIV target. Deterministic (path order),
  one tiny window over |files| rows — plan cost is metadata-sized.
* ``compact`` — rewrites only the planned groups (one output file
  per group via per-group repartition), leaving already-large files
  untouched, then verifies row-count preservation before the caller
  swaps directories. The rewrite reads ONLY the small files — cost
  scales with the fragmentation, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_row_stats(spark: SparkSession, path: str) -> DataFrame:
    """(file, n_rows) for every parquet file under ``path``."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def compaction_plan(stats: DataFrame, target_rows: int) -> DataFrame:
    """Assign every under-target file a merge group: files in path
    order accumulate until the running sum crosses ``target_rows``,
    then a new group starts (group = floor(cumsum_before / target)).
    Files already at/over target keep group NULL (left alone)."""
    small = stats.filter(F.col("n_rows") < target_rows)
    w = Window.orderBy("file").rowsBetween(Window.unboundedPreceding, -1)
    return stats.join(
        small.select(
            "file",
            (F.coalesce(F.sum("n_rows").over(w), F.lit(0)) / target_rows)
            .cast("long")
            .alias("merge_group"),
        ),
        "file",
        "left",
    ).select("file", "n_rows", "merge_group")


def compact(
    spark: SparkSession, path: str, out_path: str, target_rows: int
) -> DataFrame:
    """Execute the plan: rewrite the small files into ≤ n_groups
    merged files (hash repartition by merge group — a collision may
    co-locate two groups, which is harmless: the result is simply a
    slightly larger merged file) and append untouched (large) files'
    rows unchanged. Verifies row-count preservation, returns the
    executed plan. The caller swaps ``out_path`` into place (same
    temp-then-rename commit as streaming/sinks.py — or a real table
    format's commit)."""
    # the plan is |files| rows of metadata — collect it ONCE and serve
    # every later decision (group count, untouched probe, the routing
    # join's build side) from the local copy; leaving those as lazy
    # frames re-ran the full stats scan per decision
    planned = compaction_plan(file_row_stats(spark, path), target_rows)
    plan_rows = planned.collect()
    plan = spark.createDataFrame(plan_rows, planned.schema)
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    routed = df.join(F.broadcast(plan), F.col("_file") == plan["file"], "inner")
    merged = routed.filter(F.col("merge_group").isNotNull())
    untouched = routed.filter(F.col("merge_group").isNull())
    data_cols = [c for c in df.columns if c != "_file"]

    # metadata-sized decisions: which sides have any files at all
    # (writing an empty side would still emit an empty part file,
    # re-fragmenting the very table being compacted)
    n_groups = len(
        {r["merge_group"] for r in plan_rows if r["merge_group"] is not None}
    )
    has_untouched = any(r["merge_group"] is None for r in plan_rows)
    if n_groups:
        (
            merged.repartition(n_groups, "merge_group")
            .select(*data_cols)
            .write.mode("overwrite")
            .parquet(out_path)
        )
        if has_untouched:
            untouched.select(*data_cols).write.mode("append").parquet(out_path)
    else:
        untouched.select(*data_cols).write.mode("overwrite").parquet(out_path)

    before = df.count()
    after = spark.read.parquet(out_path).count()
    if before != after:
        raise RuntimeError(f"compaction lost rows: {before} -> {after}")
    return plan
