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
    SELECT user_id,
           round(regr_slope(value, day(ts)), 6) AS slope,
           round(regr_intercept(value, day(ts)), 6) AS intercept,
           CAST(regr_count(value, day(ts)) AS BIGINT) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("agg", "regression"),
)
def q101_trend_per_user(spark, sf_dir):
    x = F.dayofmonth("ts").cast("double")
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
            F.round(F.regr_intercept(F.col("value"), x), 6).alias("intercept"),
            F.regr_count(F.col("value"), x).alias("n"),
        )
        .orderBy("user_id")
    )


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
