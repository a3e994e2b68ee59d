"""ML feature-engineering & skew patterns (round-4 widening).

q129 salted hot-key aggregation — the explicit two-phase (salt →
partial → merge) aggregate for planned key skew
(operators/skew.py:salted_agg). The events table's 5 event types ARE
hot keys at scale; the oracle is the plain single-phase aggregate,
proving the salted plan is semantics-preserving. Sums run in exact
decimal so the two-phase re-merge is bit-identical to one-phase
(double re-merge would change accumulation order).

q130 target encoding — smoothed per-category mean of a numeric
target, enc = (Σy + prior·m) / (n + m), the standard leakage-averse
categorical encoder of a tabular ML pipeline. Engine-exact: decimal
sums (order-independent), one shared IEEE divide sequence, round(6).
Two tiny aggregates (global prior + per-category) and a broadcast of
the 1-row prior.

q131 group-aware split — train/val/test partition where every USER
lands in exactly one split (the group-leakage guard for ML splits):
split = md5-bucket of user_id. One narrow map for assignment, one
aggregate for the audit counts; the same expression splits any table
keyed by the group at 100 TB with zero shuffles before the audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import PRECISION, dec
from mindseye_dataframes_spark.operators.skew import salted_agg
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_VSCALE = 6  # events.value carries ~6 significant fractional digits


@query(
    "q129_salted_hot_agg",
    oracle=f"""
    SELECT event_type,
           CAST(count(value) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL({PRECISION},{_VSCALE}))) AS DOUBLE)
             AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "skew", "scale-rewrite"),
)
def q129_salted_hot_agg(spark, sf_dir):
    """Two-phase salted aggregate == plain aggregate (the oracle):
    exact-decimal sums make the re-merge order-independent, so the
    salted plan is provably semantics-preserving. count is merged as
    a sum of partial counts."""
    out = salted_agg(
        load_table(spark, sf_dir, "events"),
        keys=["event_type"],
        aggs={
            "n": ("count", F.col("value")),
            "sum_value": ("sum", dec("value", _VSCALE)),
            "min_value": ("min", F.col("value")),
            "max_value": ("max", F.col("value")),
        },
        salt=8,
        salt_from="event_id",
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


_TE_M = 10.0  # smoothing pseudo-count


@query(
    "q130_target_encoding",
    oracle=f"""
    WITH prior AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL({PRECISION},{_VSCALE}))) AS DOUBLE)
               / CAST(count(value) AS DOUBLE) AS mu
      FROM events),
    per_cat AS (
      SELECT event_type,
             CAST(count(value) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL({PRECISION},{_VSCALE}))) AS DOUBLE) AS s
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           round((s + mu * {_TE_M}) / (CAST(n AS DOUBLE) + {_TE_M}), 6) AS enc
    FROM per_cat CROSS JOIN prior
    ORDER BY event_type
    """,
    tags=("featurize", "encoding", "north-star"),
)
def q130_target_encoding(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    prior = ev.agg(
        (
            F.sum(dec("value", _VSCALE)).cast("double")
            / F.count("value").cast("double")
        ).alias("mu")
    )
    per_cat = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(dec("value", _VSCALE)).cast("double").alias("s"),
    )
    return (
        per_cat.crossJoin(F.broadcast(prior))
        .select(
            "event_type",
            "n",
            F.round(
                (F.col("s") + F.col("mu") * _TE_M)
                / (F.col("n").cast("double") + F.lit(_TE_M)),
                6,
            ).alias("enc"),
        )
        .orderBy("event_type")
    )


# 80/10/10 by md5 bucket of the GROUP key (user), not the row
_SPLIT_BUCKETS = 100
_SPLIT_EDGES = (80, 90)  # < 80 train, < 90 val, else test


def _split_expr(col_sql: str) -> str:
    return f"""CASE
      WHEN CAST('0x' || substring(md5(CAST({col_sql} AS VARCHAR)), 1, 8) AS BIGINT)
             % {_SPLIT_BUCKETS} < {_SPLIT_EDGES[0]} THEN 'train'
      WHEN CAST('0x' || substring(md5(CAST({col_sql} AS VARCHAR)), 1, 8) AS BIGINT)
             % {_SPLIT_BUCKETS} < {_SPLIT_EDGES[1]} THEN 'val'
      ELSE 'test' END"""


@query(
    "q131_group_split",
    oracle=f"""
    SELECT {_split_expr("user_id")} AS split,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY split ORDER BY split
    """,
    tags=("curation", "split", "north-star"),
)
def q131_group_split(spark, sf_dir):
    """Leakage-safe ML split: the md5 bucket of the GROUP key assigns
    every user's events to exactly one of train/val/test (a row-level
    random split would leak users across splits). Assignment is a
    narrow map; this query emits the audit counts."""
    bucket = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _SPLIT_BUCKETS
    split = (
        F.when(bucket < _SPLIT_EDGES[0], "train")
        .when(bucket < _SPLIT_EDGES[1], "val")
        .otherwise("test")
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(split.alias("split"), "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("split")
    )


@query(
    "q148_price_decile_lift",
    oracle="""
    WITH ordered AS (SELECT DISTINCT l_partkey FROM lineitem),
    p AS (
      SELECT p_partkey, p_retailprice,
             CASE WHEN o.l_partkey IS NULL THEN 0 ELSE 1 END AS is_ordered
      FROM part LEFT JOIN ordered o ON o.l_partkey = p_partkey),
    q AS (
      SELECT quantile_cont(p_retailprice, 0.2) AS q1,
             quantile_cont(p_retailprice, 0.4) AS q2,
             quantile_cont(p_retailprice, 0.6) AS q3,
             quantile_cont(p_retailprice, 0.8) AS q4
      FROM p),
    b AS (
      SELECT CASE WHEN p_retailprice < q1 THEN 0
                  WHEN p_retailprice < q2 THEN 1
                  WHEN p_retailprice < q3 THEN 2
                  WHEN p_retailprice < q4 THEN 3
                  ELSE 4 END AS bin,
             is_ordered
      FROM p CROSS JOIN q),
    g AS (
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(is_ordered) AS BIGINT) AS n_ordered
      FROM b GROUP BY bin),
    t AS (SELECT CAST(sum(n_parts) AS BIGINT) AS tp,
                 CAST(sum(n_ordered) AS BIGINT) AS tord FROM g)
    SELECT bin, n_parts, n_ordered,
           round(CAST(n_ordered AS DOUBLE) / CAST(n_parts AS DOUBLE), 4)
             + 0.0 AS order_rate,
           round(CAST(n_ordered * tp AS DOUBLE)
                 / CAST(n_parts * tord AS DOUBLE), 4) + 0.0 AS lift
    FROM g CROSS JOIN t ORDER BY bin
    """,
    tags=("ml", "lift", "north-star"),
)
def q148_price_decile_lift(spark, sf_dir):
    """Quintile lift table for "price band → was the part ever
    ordered" — the model-evaluation / feature-screening primitive.
    Boundaries are one exact-percentile aggregate (broadcast, q135
    idiom); the lift ratio is computed as ONE division of two exact
    BIGINT cross-products (n_ordered·total_parts) /
    (n_parts·total_ordered), so both engines execute a single shared
    IEEE op — no rate/rate double division chain to drift. Plan:
    broadcast semi-flag join + broadcast boundary join + one
    hash-agg; nothing global except two 1-row aggregates."""
    ordered = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    )
    p = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice")
        .join(ordered, F.col("l_partkey") == F.col("p_partkey"), "left")
        .select(
            "p_retailprice",
            F.when(F.col("l_partkey").isNull(), 0).otherwise(1).alias("is_ordered"),
        )
    )
    q = p.agg(
        *[
            F.percentile("p_retailprice", F.lit(x)).alias(f"q{i}")
            for i, x in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
        ]
    )
    b = p.crossJoin(F.broadcast(q)).select(
        F.when(F.col("p_retailprice") < F.col("q1"), 0)
        .when(F.col("p_retailprice") < F.col("q2"), 1)
        .when(F.col("p_retailprice") < F.col("q3"), 2)
        .when(F.col("p_retailprice") < F.col("q4"), 3)
        .otherwise(4)
        .cast("long")
        .alias("bin"),
        "is_ordered",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("is_ordered").alias("n_ordered"),
    )
    t = g.agg(
        F.sum("n_parts").alias("tp"), F.sum("n_ordered").alias("tord")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n_parts",
            "n_ordered",
            (
                F.round(
                    F.col("n_ordered").cast("double") / F.col("n_parts").cast("double"),
                    4,
                )
                + 0.0
            ).alias("order_rate"),
            (
                F.round(
                    (F.col("n_ordered") * F.col("tp")).cast("double")
                    / (F.col("n_parts") * F.col("tord")).cast("double"),
                    4,
                )
                + 0.0
            ).alias("lift"),
        )
        .orderBy("bin")
    )
