"""Sequence & ratio analytics batch 4 (round-4 widening).

q136 event transitions — the user-journey Markov matrix: counts and
probabilities of consecutive (event_type → next_event_type) steps per
user. One partitioned lag window (keyed by user — parallel across
users at any scale), one hash-aggregate; probabilities are exact
integer counts with a single shared IEEE divide.

q137 balanced resample — inverse-frequency source rebalancing: each
source's keep-rate is min(1, target/size) so every source contributes
≈ target docs. The rate table is O(sources) (broadcast), assignment is
the deterministic md5-bucket filter of q83 — zero fact-side shuffles,
exact oracle.

q138 contribution margins — percent-of-total revenue by region →
nation: window sums over exact integer cents at two grouping depths.
Shares divide cents by cents (exact integers < 2^53 → one IEEE
divide each). The windows partition by region (and the grand-total
window runs over the O(regions × nations) AGGREGATED frame, never the
fact table).

q139 month-over-month growth — calendar rollup + lag: revenue per
month in exact cents, MoM delta and growth ratio from the lag window
over the tiny months frame.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import cents
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q136_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    cnt AS (
      SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from
      FROM cnt GROUP BY event_type)
    SELECT cnt.event_type, next_type, n,
           CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
    FROM cnt JOIN tot USING (event_type)
    ORDER BY cnt.event_type, next_type
    """,
    tags=("analytics", "sequences", "north-star"),
)
def q136_event_transitions(spark, sf_dir):
    seq = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("event_type").agg(F.sum("n").alias("n_from"))
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


_TARGET_PER_SOURCE = 200
_RS_BUCKETS = 1_000_000


@query(
    "q137_balanced_resample",
    oracle=f"""
    WITH sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_src
      FROM documents GROUP BY source),
    rates AS (
      SELECT source,
             CASE WHEN n_src <= {_TARGET_PER_SOURCE} THEN {_RS_BUCKETS}
                  ELSE CAST({_TARGET_PER_SOURCE} * {_RS_BUCKETS} // n_src AS BIGINT)
             END AS keep_below
      FROM sizes)
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates USING (source)
    WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
            % {_RS_BUCKETS} < keep_below
    ORDER BY d.doc_id
    """,
    tags=("curation", "sampling", "north-star"),
)
def q137_balanced_resample(spark, sf_dir):
    """Inverse-frequency rebalancing: over-represented sources are
    down-sampled toward a fixed per-source target (integer-exact
    rates — no float thresholds), under-represented ones kept whole.
    Rates are O(sources), broadcast; the fact side is a pure
    deterministic filter (same md5 bucket as q83) — zero shuffles
    before the output."""
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rates = sizes.select(
        "source",
        F.when(F.col("n_src") <= _TARGET_PER_SOURCE, F.lit(_RS_BUCKETS))
        .otherwise(
            F.expr(f"CAST({_TARGET_PER_SOURCE} * {_RS_BUCKETS} div n_src AS BIGINT)")
        )
        .alias("keep_below"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % _RS_BUCKETS
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("keep_below"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "q138_contribution_margins",
    oracle="""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT region, nation,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY region) AS DOUBLE)
             AS share_of_region,
           CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER () AS DOUBLE) AS share_of_total
    FROM rev ORDER BY region, nation
    """,
    tags=("analytics", "ratio", "north-star"),
)
def q138_contribution_margins(spark, sf_dir):
    """Percent-of-total at two depths (ratio_to_report): revenue in
    exact integer cents, shares as cents/cents single divides. The
    windows run over the AGGREGATED O(regions × nations) frame — the
    fact table shuffles exactly once, into the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents("l_extendedprice")).alias("cents"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    d = F.col("cents").cast("double")
    return rev.select(
        "region",
        "nation",
        (d / 100.0).alias("revenue"),
        (d / F.sum("cents").over(w_region).cast("double")).alias("share_of_region"),
        (d / F.sum("cents").over(w_all).cast("double")).alias("share_of_total"),
    ).orderBy("region", "nation")


@query(
    "q139_mom_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY month)
    SELECT month,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           CAST(cents - lag(cents) OVER (ORDER BY month) AS BIGINT) AS delta_cents,
           CAST(cents AS DOUBLE)
             / CAST(lag(cents) OVER (ORDER BY month) AS DOUBLE) AS growth
    FROM m ORDER BY month
    """,
    tags=("analytics", "timeseries", "north-star"),
)
def q139_mom_growth(spark, sf_dir):
    """Month-over-month revenue: calendar hash-aggregate in exact
    cents, then lag over the O(months) frame (tiny by construction —
    the unpartitioned window never sees fact rows)."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .agg(F.sum(cents("o_totalprice")).alias("cents"))
    )
    w = Window.orderBy("month")
    d = F.col("cents").cast("double")
    return m.select(
        "month",
        (d / 100.0).alias("revenue"),
        (F.col("cents") - F.lag("cents").over(w)).alias("delta_cents"),
        (d / F.lag("cents").over(w).cast("double")).alias("growth"),
    ).orderBy("month")


@query(
    "q149_session_paths",
    oracle="""
    WITH r AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events),
    s AS (
      SELECT user_id, day,
             concat_ws('>',
               max(CASE WHEN rn = 1 THEN event_type END),
               max(CASE WHEN rn = 2 THEN event_type END),
               max(CASE WHEN rn = 3 THEN event_type END)) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, day)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY path ORDER BY n DESC, path LIMIT 20
    """,
    tags=("sequences", "paths", "north-star"),
)
def q149_session_paths(spark, sf_dir):
    """Top-20 opening event paths (first ≤3 event types of each
    user-day session, '>'-joined) — the session-flow mining behind
    onboarding/funnel analysis. Path assembly avoids collect_list
    (whose order is partition-dependent): row_number pins the
    ordering, conditional max pivots the 3 steps into columns, and
    concat_ws skips the NULLs of shorter sessions identically on
    both engines. Two hash-aggregates + TakeOrdered, no collects,
    no windows wider than a user-day."""
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    r = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"), "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    s = r.groupBy("user_id", "day").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return (
        s.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )
