"""Sketch aggregates — the sub-linear state family for 100 TB rollups.

No DuckDB oracle by design: sketch internals are engine-specific, so
the driver records rows-only checks and the accuracy contracts are
pinned by seeded pytest instead (tests/test_sketches.py):

q106 approximate percentiles — ``approx_percentile`` (KLL-style) per
event_type at accuracy 10000: rank error ≤ n/accuracy, verified
against exact ``percentile_cont`` on the same data. At scale this is
one partial+final agg with O(accuracy) state per group versus the
full sort an exact percentile needs.

q107 mergeable HLL rollup — per-day HyperLogLog sketches of distinct
users (``hll_sketch_agg``) merged into per-type totals
(``hll_union_agg``): the re-aggregatable-rollup pattern — store tiny
daily sketches, answer any date-range distinct-count later without
rescanning raw data. Standard error ~1.6% at lgK=12, pinned at 5% in
tests against exact countDistinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query("q106_approx_percentiles", tags=("agg", "sketch", "approx"))
def q106_approx_percentiles(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], 10000
            ).alias("approx_p50_p95_p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query("q107_sketch_rollup", tags=("agg", "sketch", "hll"))
def q107_sketch_rollup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )
