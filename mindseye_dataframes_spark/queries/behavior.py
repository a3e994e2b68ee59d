"""Behavioral / product-analytics queries (round-4 widening).

q121 retention cohorts — the classic cohort-retention triangle:
users grouped by first-event week, activity counted per week offset.
Two hash-aggregates (first event per user, distinct user-weeks) and
one equi-join on user_id — no windows, no cross products; at 100 TB
both aggregates partial-combine map-side and the join shuffles
already-reduced per-user rows.

q122 last-touch attribution — every purchase attributed to the most
recent click/view of the same user within a 1-hour window. Exercises
the as-of join's ``tolerance_seconds`` bound (operators/asof.py): the
union-marker fill runs in ONE shuffle, and stale matches null out via
a post-fill predicate on the matched row's own timestamp — no range
join, no per-key collect. Oracle is a LATERAL top-1 lookup.

q123 language-ID confusion matrix — labeled ``lang`` vs the n-gram
marker heuristic's prediction (functions/textfns.py:lang_id), the
eval harness for the language-ID component. One hash-aggregate; the
prediction is a pure expression (no UDF).

q124 exact stratified sample — exactly N docs per source, chosen by
deterministic md5 order (engine-portable, seedable via the hash
input). Unlike fraction-based sampling (q48/q83) the quota is EXACT
per stratum; one partitioned window ranks within each stratum, so
parallelism = number of strata × their sizes, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.textfns import lang_id, lang_id_sql
from mindseye_dataframes_spark.operators.asof import asof_join
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q121_retention_cohorts",
    oracle="""
    WITH first_ev AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events)
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
             AS offset_weeks,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM first_ev f JOIN activity a USING (user_id)
    GROUP BY f.cohort_week, offset_weeks
    ORDER BY f.cohort_week, offset_weeks
    """,
    tags=("analytics", "retention", "north-star"),
)
def q121_retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    first_ev = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        first_ev.join(activity, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("long")
            .alias("offset_weeks"),
        )
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    )


_TOUCH_TYPES = ("click", "view")
_ATTR_TOL_S = 3600


@query(
    "q122_last_touch_attribution",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts,
           t.event_type AS touch_type, t.event_id AS touch_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT event_type, event_id
      FROM events t
      WHERE t.user_id = p.user_id
        AND t.event_type IN {_TOUCH_TYPES}
        AND t.ts <= p.ts
        AND epoch_us(p.ts) - epoch_us(t.ts) <= {_ATTR_TOL_S * 1_000_000}
      ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
    ) t ON TRUE
    ORDER BY p.event_id
    """,
    tags=("analytics", "attribution", "asof", "north-star"),
)
def q122_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution via the tolerance-bounded as-of join:
    ONE shuffle of purchases+touches (union-marker fill), stale
    matches (> 1 h) nulled by the post-fill staleness predicate — the
    oracle's LATERAL top-1 is the quadratic phrasing of the same
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("touch_id"),
    )
    return asof_join(
        purchases,
        touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="touch_ts",
        payload=["touch_type", "touch_id"],
        tiebreak="touch_id",
        tolerance_seconds=_ATTR_TOL_S,
    ).select("event_id", "user_id", "ts", "touch_type", "touch_id").orderBy(
        "event_id"
    )


@query(
    "q123_langid_confusion",
    oracle=f"""
    SELECT lang, {lang_id_sql("text")} AS pred,
           CAST(count(*) AS BIGINT) AS n
    FROM documents
    GROUP BY lang, pred
    ORDER BY lang, pred
    """,
    tags=("text", "langid", "north-star"),
)
def q123_langid_confusion(spark, sf_dir):
    """Confusion matrix of labeled language vs the marker-word
    heuristic's prediction — the language-ID component's eval. The
    prediction is a pure JVM expression, so the whole query is one
    hash-aggregate over the scan."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("lang", lang_id("text").alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


_STRATUM_N = 20


@query(
    "q124_stratified_exact_sample",
    oracle=f"""
    SELECT doc_id, source, rn FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      FROM documents)
    WHERE rn <= {_STRATUM_N}
    ORDER BY source, rn
    """,
    tags=("curation", "sampling", "north-star"),
)
def q124_stratified_exact_sample(spark, sf_dir):
    """Exactly N per stratum, deterministic: rank within each source
    by md5(doc_id) (an unbiased, engine-portable, reshuffle-stable
    order) and keep the first N. The partitioned window keeps
    parallelism at stratum granularity — no global sort, no driver
    collect; the md5 input doubles as a seed slot (prefix it to draw a
    different epoch's sample)."""
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", rn.cast("long").alias("rn"))
        .filter(F.col("rn") <= _STRATUM_N)
        .orderBy("source", "rn")
    )


@query(
    "q145_rolling_active_users",
    oracle="""
    WITH au AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM au)
    SELECT d.day,
           CAST(count(DISTINCT CASE WHEN a.day = d.day
                                    THEN a.user_id END) AS BIGINT) AS dau,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau7
    FROM days d JOIN au a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
    tags=("behavior", "rolling-distinct", "north-star"),
)
def q145_rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users (WAU) plus same-day DAU,
    per day. Distinct-over-sliding-window has no window-function
    form (COUNT(DISTINCT) OVER RANGE is unsupported in both
    engines), and the naive range join is a theta-join. The scale
    rewrite: dedup to (day, user) first (one hash-agg — the ONLY
    pass over the raw 100 TB), then explode each active-day into the
    ≤7 report days it contributes to — a bounded fan-out equi-join
    on day, then one count-distinct hash-agg over data already
    reduced to |users|·|days| rows. The oracle runs the naive
    range-join SQL, proving the rewrite exact."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    au = ev.distinct()
    days = au.select("day").distinct().select(F.col("day").alias("rday"))
    contrib = au.select(
        "user_id",
        F.col("day").alias("aday"),
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("rday"),
    )
    return (
        contrib.join(days, "rday")
        .groupBy("rday")
        .agg(
            F.countDistinct(
                F.when(F.col("aday") == F.col("rday"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau7"),
        )
        .select(F.col("rday").alias("day"), "dau", "wau7")
        .orderBy("day")
    )


@query(
    "q155_cohort_ltv_curve",
    oracle="""
    WITH p AS (
      SELECT user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS spend_cents
      FROM events WHERE event_type = 'purchase'),
    first_wk AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week FROM p
      GROUP BY user_id),
    wk AS (
      SELECT f.cohort_week,
             CAST(datediff('week', f.cohort_week,
                           CAST(date_trunc('week', p.ts) AS DATE)) AS BIGINT) AS week_offset,
             p.spend_cents
      FROM p JOIN first_wk f ON f.user_id = p.user_id),
    g AS (
      SELECT cohort_week, week_offset,
             CAST(sum(spend_cents) AS BIGINT) AS rev_cents
      FROM wk GROUP BY cohort_week, week_offset)
    SELECT cohort_week, week_offset,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
                                     ORDER BY week_offset) AS BIGINT)
             AS cum_rev_cents
    FROM g ORDER BY cohort_week, week_offset
    """,
    tags=("behavior", "ltv", "north-star"),
)
def q155_cohort_ltv_curve(spark, sf_dir):
    """Cohort LTV curve: users grouped by first-purchase week,
    cumulative spend per week offset — the retention-revenue view a
    growth team reads next to q121's activity triangle. All money
    stays integer cents end-to-end (sums AND the cumulative window),
    so the curve is bit-exact. Plan: per-user first-week agg, an
    equi-join back (both sides pre-reduced), one (cohort, offset)
    hash-agg, then a window over the tiny rollup — the wide work
    happens on reduced data only."""
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("spend_cents"),
        )
    )
    first_wk = p.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("week", F.col("ts")))).alias("cohort_week")
    )
    wk = p.join(first_wk, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.col("cohort_week"))
            / 7
        )
        .cast("long")
        .alias("week_offset"),
        "spend_cents",
    )
    g = wk.groupBy("cohort_week", "week_offset").agg(
        F.sum("spend_cents").alias("rev_cents")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        "cohort_week",
        "week_offset",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    ).orderBy("cohort_week", "week_offset")


@query(
    "q168_distribution_drift",
    oracle="""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us FROM events),
    bounds AS (
      SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
    counts AS (
      SELECT event_type,
             CAST(sum(CASE WHEN us <  mid THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
             CAST(sum(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS b_n
      FROM ev CROSS JOIN bounds GROUP BY event_type),
    tot AS (
      SELECT CAST(sum(a_n) AS BIGINT) AS a_tot,
             CAST(sum(b_n) AS BIGINT) AS b_tot FROM counts)
    SELECT event_type, a_n, b_n,
           CAST(round(
             (CAST(a_n * b_tot - b_n * a_tot AS DOUBLE)
              * CAST(a_n * b_tot - b_n * a_tot AS DOUBLE))
             / (CAST(a_tot AS DOUBLE) * CAST(b_tot AS DOUBLE)
                * CAST(a_n + b_n AS DOUBLE)) * 1000000) AS BIGINT)
             AS chi2_micros
    FROM counts CROSS JOIN tot
    ORDER BY event_type
    """,
    tags=("behavior", "drift", "north-star"),
)
def q168_distribution_drift(spark, sf_dir):
    """Category-distribution drift between the first and second half
    of the event stream — the monitoring check that catches a logging
    change or behavior shift before it contaminates training data.
    Per event type, the two-sample chi-square contribution
    (a·B − b·A)² / (A·B·(a+b)), where A/B are window totals.

    Engine-exactness: the half-split boundary is integer epoch-micros
    midpoint; every count product is exact BIGINT; the single
    squared term is evaluated in doubles through an IDENTICAL IEEE
    op sequence on both engines (cast → multiply → divide, each
    correctly rounded, no libm), then quantized to micros. Ceilings
    (a_n·b_tot ≈ N²/4 for N total events): the int64→double casts are
    EXACT for N ≲ 1.9e8 events; beyond that both engines perform the
    identical correctly-rounded int64→double cast, so the outputs
    still agree bit-for-bit; the hard wall is int64 overflow of the
    product at N ≳ 6.1e9 events per evaluation window, where
    non-ANSI Spark wraps silently while DuckDB errors — shard the
    window (per day/source) before that.

    Scale: one min/max scalar aggregate (broadcast 1-row), one
    conditional hash-aggregate over the stream with map-side combine,
    then |event types| rows. No window, no join wider than the 1-row
    broadcasts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    # (min+max) DIV 2, not /2: '/' yields a DOUBLE midpoint (loses
    # integer precision above 2^53 — summed epoch-micros are ~3.4e15
    # today, ~2.4x from that edge); DIV keeps the boundary exact
    # BIGINT on both engines
    bounds = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr("(mn + mx) DIV 2").alias("mid")
    )
    counts = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid"), 1).otherwise(0)).alias("a_n"),
            F.sum(F.when(F.col("us") >= F.col("mid"), 1).otherwise(0)).alias("b_n"),
        )
    )
    tot = counts.agg(
        F.sum("a_n").alias("a_tot"), F.sum("b_n").alias("b_tot")
    )
    num = F.col("a_n") * F.col("b_tot") - F.col("b_n") * F.col("a_tot")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "a_n",
            "b_n",
            F.round(
                (num.cast("double") * num.cast("double"))
                / (
                    F.col("a_tot").cast("double")
                    * F.col("b_tot").cast("double")
                    * (F.col("a_n") + F.col("b_n")).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("chi2_micros"),
        )
        .orderBy("event_type")
    )
