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
