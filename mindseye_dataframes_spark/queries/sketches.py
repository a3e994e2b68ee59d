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


@query("q156_rolling_hll_wau", tags=("sketch", "rolling", "hll"))
def q156_rolling_hll_wau(spark, sf_dir):
    """Approximate rolling 7-day actives — the sketch twin of q145's
    exact rewrite, and the version that survives when |users| is too
    large to count-distinct per window: ONE HLL sketch per (day)
    (each user hashed once per day), then each report day unions the
    ≤7 daily sketches in its window. Merging sketches is
    associative, so at 100 TB the daily sketches are tiny persisted
    state and the rolling union never revisits raw data. Rows-only
    check (HLL estimates are engine-specific); the accuracy contract
    vs exact q145 is pinned in tests/test_sketches.py."""
    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    days = daily.select(F.col("day").alias("rday"))
    contrib = daily.select(
        "sketch",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("rday"),
    )
    return (
        contrib.join(days, "rday")
        .groupBy("rday")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("wau7_approx")
        )
        .select(F.col("rday").alias("day"), "wau7_approx")
        .orderBy("day")
    )
