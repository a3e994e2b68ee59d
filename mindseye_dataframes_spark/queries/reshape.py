"""Reshaping and remaining SQL-surface parity: unpivot, null-safe
joins, time-weighted averages.

q103 unpivot/melt — the inverse of q57's pivot: a wide per-flag
aggregate goes long as (key, metric, value). ``DataFrame.unpivot`` is
a zero-shuffle Expand node — rows×metrics without any exchange.

q104 null-safe join — ``<=>`` (IS NOT DISTINCT FROM) equi-join
semantics: NULL keys match each other instead of dropping out. Spark
plans a null-safe equi-hash-join, not a theta join, so the scale cost
is identical to a plain equi-join.

q105 TWAP — time-weighted average price/value per user: each
observation weighted by its holding interval (lead(ts) − ts, whole
seconds). Weights are integer seconds and values decimal(18,2) so the
weighted sum's unscaled value stays below 2^53 — the ``exact.py``
ceiling under which decimal→double is exact in both engines (at
microsecond weights DuckDB's two-step int128→double conversion
diverges from Spark's correctly-rounded BigDecimal cast by 1 ulp).
Only the final division is floating point (single IEEE op on
identical inputs, then round(6)) — engine-exact. The standard
downsampling operator for irregular financial/telemetry streams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q103_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(count(*) AS DOUBLE) AS n
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, value
    FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, n))
    ORDER BY l_returnflag, metric
    """,
    tags=("reshape", "parity:unpivot"),
)
def q103_unpivot_metrics(spark, sf_dir):
    wide = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "n"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


@query(
    "q104_nullsafe_join",
    oracle="""
    WITH a AS (SELECT DISTINCT CASE WHEN user_id % 7 = 0 THEN NULL
                                    ELSE user_id END AS k
               FROM events WHERE event_type = 'click'),
    b AS (SELECT DISTINCT CASE WHEN user_id % 7 = 0 THEN NULL
                               ELSE user_id END AS k
          FROM events WHERE event_type = 'error')
    SELECT a.k AS k, b.k IS NULL AS matched_null
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY k NULLS FIRST
    """,
    tags=("join", "parity:null-safe-eq"),
)
def q104_nullsafe_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    nullable_key = F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("user_id")
    )
    a = (
        ev.filter(F.col("event_type") == "click")
        .select(nullable_key.alias("k"))
        .distinct()
    )
    b = (
        ev.filter(F.col("event_type") == "error")
        .select(nullable_key.alias("bk"))
        .distinct()
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["bk"]))
        .select("k", F.col("bk").isNull().alias("matched_null"))
        .orderBy(F.col("k").asc_nulls_first())
    )


@query(
    "q105_twap",
    oracle="""
    WITH t AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,2)) AS dv,
             (CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)) // 1000000
               AS dt_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CAST(sum(dt_s) AS BIGINT) AS total_s,
           CAST(sum(dv * dt_s) AS DOUBLE) AS weighted_sum,
           round(CAST(sum(dv * dt_s) AS DOUBLE) / CAST(sum(dt_s) AS DOUBLE), 6)
             AS twap
    FROM t WHERE dt_s IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("timeseries", "twap", "exact-decimal"),
)
def q105_twap(spark, sf_dir):
    t = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("value").cast("decimal(18,2)").alias("dv"),
            F.expr(
                "(unix_micros(lead(ts) over (partition by user_id"
                " order by ts, event_id)) - unix_micros(ts)) div 1000000"
            ).alias("dt_s"),
        )
        .filter(F.col("dt_s").isNotNull())
    )
    return (
        t.groupBy("user_id")
        .agg(
            F.sum("dt_s").alias("total_s"),
            F.sum(F.col("dv") * F.col("dt_s")).cast("double").alias("weighted_sum"),
        )
        .select(
            "user_id",
            "total_s",
            "weighted_sum",
            F.round(
                F.col("weighted_sum") / F.col("total_s").cast("double"), 6
            ).alias("twap"),
        )
        .orderBy("user_id")
    )
