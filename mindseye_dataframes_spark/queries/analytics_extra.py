"""Per-key model fitting and blocked fuzzy matching.

q101 per-user trend — built-in linear regression aggregates
(``regr_slope``/``regr_intercept``/``regr_count``) of event value
against day-of-month. Day-of-month keeps |x| small so the covariance
accumulators don't cancel catastrophically; round(6) absorbs the
residual ulp difference from partial-aggregation order. One hash
exchange, all JVM. The grouped-map pandas twin for kernels with no
built-in aggregate lives in ``operators/grouped.py`` and is pinned to
this query's results in tests.

q102 blocked fuzzy match — entity resolution over part names:
``levenshtein ≤ 2`` within a ``p_brand`` block. Blocking is the scale
story: the quadratic edit-distance comparison only runs inside small
same-brand buckets (an equi-join), never across the full corpus —
the same blocked shape as the LSH dedup family (q32), with an exact
integer distance both engines define identically.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q101_trend_per_user",
    oracle="""
    WITH s AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(day(ts)) AS BIGINT) AS sx,
             CAST(SUM(day(ts) * day(ts)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy_c,
             CAST(SUM(day(ts) * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sxy_c
      FROM events GROUP BY user_id),
    r AS (
      SELECT user_id, n, sx, sy_c,
             CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                  ELSE CAST(n * sxy_c - sx * sy_c AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 END
               AS slope_raw
      FROM s)
    SELECT user_id,
           round(slope_raw, 6) AS slope,
           round(CAST(sy_c AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)
                 - slope_raw * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS intercept,
           n
    FROM r ORDER BY user_id
    """,
    tags=("agg", "regression"),
)
def q101_trend_per_user(spark, sf_dir):
    """Per-user least-squares trend of event value over day-of-month.

    NOT the built-in ``regr_slope``/``regr_intercept``: those
    accumulate doubles in engine- and partition-specific orders, and
    at sf1 a user's sums drift across a round(·,6) boundary (the
    round-6 sf1 sweep caught exactly one such row). Instead all five
    sufficient statistics are EXACT BIGINTs (x = day ∈ [1,31], y
    quantized to cents — the q114 integer-micros idiom), and slope/
    intercept are derived with one shared IEEE op sequence, so both
    engines round identical doubles. Ceiling: n·Σxy_c < 2^63 holds
    until a single user has ~5e6 events of value ~1e3; past that,
    shard per user-epoch. NULL slope/intercept for users whose x has
    zero variance (n = 1 or all events the same day), matching
    ``regr_slope``'s contract."""
    day = F.dayofmonth("ts").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    s = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(day).alias("sx"),
            F.sum(day * day).alias("sxx"),
            F.sum(cents).alias("sy_c"),
            F.sum(day * cents).alias("sxy_c"),
        )
    )
    slope_raw = F.when(
        F.expr("n * sxx - sx * sx") != 0,
        F.expr("CAST(n * sxy_c - sx * sy_c AS DOUBLE)")
        / F.expr("CAST(n * sxx - sx * sx AS DOUBLE)")
        / F.lit(100.0),
    )
    r = s.withColumn("slope_raw", slope_raw)
    return r.select(
        "user_id",
        F.round("slope_raw", 6).alias("slope"),
        F.round(
            F.expr("CAST(sy_c AS DOUBLE) / 100.0 / CAST(n AS DOUBLE)")
            - F.col("slope_raw")
            * F.expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"),
            6,
        ).alias("intercept"),
        "n",
    ).orderBy("user_id")


@query(
    "q102_fuzzy_name_match",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY key_a, key_b
    """,
    tags=("join", "fuzzy", "north-star"),
)
def q102_fuzzy_name_match(spark, sf_dir):
    # PassJoin-style segment blocking (operators/edit_join.py):
    # candidates come from an equi-join on exact string segments, so
    # they scale with the number of true near-matches instead of
    # block² (the naive in-block quadratic was 19s at sf0.1; the
    # length-prefiltered variant 7.7s; this path cuts the levenshtein
    # call count to the candidate set).
    from mindseye_dataframes_spark.operators.edit_join import edit_distance_join

    part = load_table(spark, sf_dir, "part")
    return edit_distance_join(
        part, key_col="p_partkey", text_col="p_name", block_col="p_brand", k=2
    ).orderBy("key_a", "key_b")


@query(
    "q143_pareto_frontier",
    oracle="""
    WITH p AS (
      SELECT p_brand, p_partkey, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part),
    fr AS (
      SELECT p_brand, p_partkey, p_size, price_cents,
             max(p_size) OVER (PARTITION BY p_brand ORDER BY price_cents
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS m_cheaper,
             max(p_size) OVER (PARTITION BY p_brand ORDER BY price_cents
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS m_upto
      FROM p)
    SELECT p_brand, p_partkey, price_cents, p_size
    FROM fr
    WHERE (m_cheaper IS NULL OR m_cheaper < p_size) AND m_upto <= p_size
    ORDER BY p_brand, price_cents, p_partkey
    """,
    tags=("analytics", "skyline", "north-star"),
)
def q143_pareto_frontier(spark, sf_dir):
    """Per-brand Pareto frontier (skyline) of parts: minimize price,
    maximize size. A part is dominated iff some part in the brand is
    strictly cheaper with size >= its own (``m_cheaper >= size``) or
    same-or-cheaper with size strictly larger (``m_upto > size``).
    Both dominance tests are running maxima over RANGE frames keyed
    on integer cents — engine-exact, tie-correct (equal price+size
    survivors all kept), and O(n log n) per brand partition instead
    of the quadratic dominance self-join. At 100 TB the window is
    partitioned by brand, so no global sort and no single-partition
    exchange."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_upto = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "price_cents",
            "p_size",
            F.max("p_size").over(w_cheaper).alias("m_cheaper"),
            F.max("p_size").over(w_upto).alias("m_upto"),
        )
        .filter(
            (F.col("m_cheaper").isNull() | (F.col("m_cheaper") < F.col("p_size")))
            & (F.col("m_upto") <= F.col("p_size"))
        )
        .select("p_brand", "p_partkey", "price_cents", "p_size")
        .orderBy("p_brand", "price_cents", "p_partkey")
    )
