"""Operator patterns that keep working at 100 TB.

q91 token position index — per-document token → (first position,
occurrence count) via ``posexplode``. Generate+aggregate, one
exchange; the inverted-index building block for q80/q87-style joins.

q92 binned interval join — the scale rewrite of an inequality join.
A naive ``a.ts BETWEEN b.ts - 6h AND b.ts + 6h`` theta-join plans as
BroadcastNestedLoopJoin (O(n·m) comparisons — a cluster-killer).
Binning both sides to 12-hour buckets (= window width) turns it into
an *equi*-join on ``(user_id, bin)`` with ≤3 candidate bins exploded
on the probe side, then the exact predicate filters survivors. Same
result set, hash-join plan, linear shuffle. The oracle runs the
naive theta-join SQL — DuckDB can afford it at sf0.01 — proving the
rewrite is semantics-preserving.

q93 trailing-window anomaly flags — value > 2× trailing average,
computed entirely in exact decimal (see ``functions/exact.py``):
``value·n > 2·Σ`` cross-multiplied so no division ever happens —
engine-exact, no fp-drift false flags.

q94 distinctive terms — per-source top-3 tokens by an integer
tf/df score (``tf·1e6 div df``) with lexicographic tie-breaks:
TF-IDF's ranking power without floating-point logs, so the ranking
is bit-identical on every engine.

q95 price histogram — 20 equi-width buckets over integer *cents*
(``round(price·100)``): bucket arithmetic is pure BIGINT, so bucket
edges cannot drift between engines. Global min/max come from a
broadcast 1-row aggregate (scalar-subquery shape).

q96 CDC compaction (latest-per-key) — the upsert-log → snapshot
operator: ``row_number() OVER (PARTITION BY key ORDER BY ts DESC,
id DESC) = 1``. One hash exchange + per-partition sort; ties broken
by id so replays are deterministic.

q141 Bloom-prefiltered join (operators/bloom.py) — a selective
dimension filter is folded into a ≤512 KB Bloom bitset (one
``bit_or`` hash-aggregate) and broadcast to prune the fact side
BEFORE its join shuffle. False positives die in the exact join that
follows, so the oracle is the plain join SQL — the Bloom stage is
provably performance-only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_HOUR_US = 3_600_000_000
_BIN_US = 12 * _HOUR_US  # bin width == interval width (±6h)


@query(
    "q91_token_positions",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id < 50),
    tok AS (SELECT doc_id, list_extract(ws, CAST(pos AS INT)) AS token, pos
            FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS pos) p)
    SELECT doc_id, token,
           CAST(min(pos) AS BIGINT) AS first_pos,
           CAST(count(*) AS BIGINT) AS n_occur
    FROM tok GROUP BY doc_id, token ORDER BY doc_id, token
    """,
    tags=("text", "lateral", "parity:posexplode"),
)
def q91_token_positions(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token"))
        .groupBy("doc_id", "token")
        .agg(
            (F.min("pos0") + 1).cast("long").alias("first_pos"),
            F.count(F.lit(1)).alias("n_occur"),
        )
        .orderBy("doc_id", "token")
    )


@query(
    "q92_binned_interval_join",
    oracle="""
    SELECT e.event_id AS error_id, c.event_id AS click_id,
           e.user_id AS user_id
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
    WHERE e.event_type = 'error'
      AND c.ts BETWEEN e.ts - INTERVAL 6 HOUR AND e.ts + INTERVAL 6 HOUR
    ORDER BY error_id, click_id
    """,
    tags=("join", "interval", "scale-rewrite"),
)
def q92_binned_interval_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.unix_micros("ts").alias("e_us"),
        )
        # probe side: a ±half-bin window can only land in 3 bins
        .withColumn(
            "bin",
            F.explode(
                F.array(
                    F.expr(f"e_us div {_BIN_US} - 1"),
                    F.expr(f"e_us div {_BIN_US}"),
                    F.expr(f"e_us div {_BIN_US} + 1"),
                )
            ),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
        F.expr(f"unix_micros(ts) div {_BIN_US}").alias("bin"),
    )
    return (
        errors.join(
            clicks,
            (errors["user_id"] == clicks["c_user"]) & (errors["bin"] == clicks["bin"]),
        )
        .filter(
            (F.col("c_us") >= F.col("e_us") - 6 * _HOUR_US)
            & (F.col("c_us") <= F.col("e_us") + 6 * _HOUR_US)
        )
        .select("error_id", "click_id", "user_id")
        .orderBy("error_id", "click_id")
    )


@query(
    "q93_trailing_anomaly",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(value AS DECIMAL(18,6)) AS dv,
             SUM(CAST(value AS DECIMAL(18,6))) OVER w AS trail_sum,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_trail
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, value, n_trail
    FROM t WHERE n_trail >= 5 AND dv * n_trail > 2 * trail_sum
    ORDER BY event_id
    """,
    tags=("window", "anomaly", "exact-decimal"),
)
def q93_trailing_anomaly(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    dv = F.col("value").cast("decimal(18,6)")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            dv.alias("dv"),
            F.sum(dv).over(w).alias("trail_sum"),
            F.count(F.lit(1)).over(w).alias("n_trail"),
        )
        .filter(
            (F.col("n_trail") >= 5)
            & (F.col("dv") * F.col("n_trail") > 2 * F.col("trail_sum"))
        )
        .select("event_id", "user_id", "value", "n_trail")
        .orderBy("event_id")
    )


@query(
    "q94_distinctive_terms",
    oracle="""
    WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n_tf
           FROM tok GROUP BY source, token),
    idf AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_df
            FROM tok GROUP BY token),
    scored AS (SELECT source, token, n_tf, n_df,
                      n_tf * 1000000 // n_df AS score
               FROM tf JOIN idf USING (token))
    SELECT source, token, n_tf, n_df, score FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, token) AS rn
      FROM scored) WHERE rn <= 3
    ORDER BY source, score DESC, token
    """,
    tags=("text", "tfidf", "north-star"),
)
def q94_distinctive_terms(spark, sf_dir):
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n_tf"))
    idf = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("n_df"))
    scored = tf.join(F.broadcast(idf), "token").withColumn(
        "score", F.expr("n_tf * 1000000 div n_df")
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("score"), "token")
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("source", "token", "n_tf", "n_df", "score")
        .orderBy("source", F.desc("score"), "token")
    )


@query(
    "q95_price_histogram",
    oracle="""
    WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    m AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c)
    SELECT least(19, (cents - mn) * 20 // (mx - mn + 1)) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents
    FROM c, m
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def q95_price_histogram(spark, sf_dir):
    cents = (
        load_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    )
    minmax = cents.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    return (
        cents.crossJoin(F.broadcast(minmax))
        .select(
            F.least(F.lit(19), F.expr("(cents - mn) * 20 div (mx - mn + 1)")).alias(
                "bucket"
            ),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "q96_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("window", "cdc", "compaction"),
)
def q96_latest_per_key(spark, sf_dir):
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
        .orderBy("user_id")
    )


def _morton_sql(xe: str, ye: str, bits: int, divop: str) -> str:
    """Portable 2-D Morton (Z-order) code as pure integer arithmetic —
    no engine-specific bit operators, so the SAME formula (modulo the
    integer-division spelling) runs on Spark and DuckDB: interleave
    bit i of x into position 2i and bit i of y into 2i+1 via
    ((v div 2^i) % 2) * 4^i."""
    terms = []
    for i in range(bits):
        p2, p4 = 2**i, 4**i
        terms.append(f"((({xe}) {divop} {p2}) % 2) * {p4}")
        terms.append(f"((({ye}) {divop} {p2}) % 2) * {2 * p4}")
    return " + ".join(terms)


_MORTON_SPARK = _morton_sql("l_partkey % 1024", "l_suppkey % 1024", 10, "div")
_MORTON_DUCK = _morton_sql("l_partkey % 1024", "l_suppkey % 1024", 10, "//")


@query(
    "q97_zorder_layout",
    oracle=f"""
    WITH m AS (SELECT l_partkey, l_suppkey,
                      {_MORTON_DUCK} AS zcode
               FROM lineitem)
    SELECT zcode // 4096 AS zfile,
           CAST(count(*) AS BIGINT) AS n,
           min(l_partkey) AS min_part, max(l_partkey) AS max_part,
           min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
    FROM m GROUP BY zfile ORDER BY zfile
    """,
    tags=("layout", "zorder", "scale-rewrite"),
)
def q97_zorder_layout(spark, sf_dir):
    """Z-order clustering for multi-dimensional data-skipping: sort by
    an interleaved-bit code and every output block covers a tight
    (partkey × suppkey) rectangle, so min/max footer stats prune scans
    on EITHER predicate column. The emitted per-block ranges are
    exactly the skipping index a 100 TB writer would persist. Morton
    math is a pure narrow map (codegen, no shuffle); the stats are one
    hash-aggregate."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr(_MORTON_SPARK).alias("zcode"),
        )
        .select(F.expr("zcode div 4096").alias("zfile"), "l_partkey", "l_suppkey")
        .groupBy("zfile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("zfile")
    )


@query(
    "q98_gap_fill",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value, ts FROM events),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
    days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
             FROM b),
    users AS (SELECT DISTINCT user_id FROM ev),
    daily AS (SELECT user_id, day, arg_max(value, ts) AS day_value
              FROM ev GROUP BY user_id, day)
    SELECT users.user_id, days.day,
           last_value(daily.day_value IGNORE NULLS) OVER (
             PARTITION BY users.user_id ORDER BY days.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
           daily.day_value IS NOT NULL AS had_event
    FROM users CROSS JOIN days
    LEFT JOIN daily ON daily.user_id = users.user_id AND daily.day = days.day
    ORDER BY users.user_id, days.day
    """,
    tags=("timeseries", "gap-fill", "north-star"),
)
def q98_gap_fill(spark, sf_dir):
    """Time-series regularization: project an irregular event stream
    onto a daily grid and forward-fill the last observation — the
    hypertable-rollup companion every feature-store export needs.
    Daily last-observation = ``max_by(value, ts)`` (ts unique per
    user — verified at both scale factors); the grid is a broadcast
    cross of two tiny sides (distinct users × day span), so the only
    full shuffle is the per-user window. Rows before a user's first
    event stay NULL by design."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value", "ts"
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    users = ev.select("user_id").distinct()
    daily = ev.groupBy("user_id", "day").agg(
        F.max_by("value", F.col("ts")).alias("day_value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        users.crossJoin(F.broadcast(days))
        .join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("value_ff"),
            F.col("day_value").isNotNull().alias("had_event"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "q141_bloom_prefilter_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o.o_totalprice > 150000
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join", "bloom", "scale", "north-star"),
)
def q141_bloom_prefilter_join(spark, sf_dir):
    """Revenue of urgent high-value orders, with the fact side pruned
    by a hand-rolled Bloom filter BEFORE the join shuffle
    (operators/bloom.py). Build side = filtered order keys folded to
    ≤64 K bit-or words; probe side = lineitem surviving two broadcast
    word-lookups — only possible matches (plus ~2 % false positives)
    ever enter the exchange. The closing equi-join keeps the result
    exact, so the oracle is the plain join. At 100 TB this is the
    difference between shuffling 100 % and ~selectivity % of the
    fact table."""
    from mindseye_dataframes_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_totalprice") > 150000)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    li_pruned = bloom_prefilter(li, "l_orderkey", bloom)
    return (
        li_pruned.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q153_join_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
      GROUP BY user_id),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_keys FROM c),
    top AS (
      SELECT user_id, n FROM c ORDER BY n DESC, user_id LIMIT 15)
    SELECT top.user_id, top.n,
           top.n * 1000000 // t.total AS share_ppm,
           t.total // t.n_keys AS mean_per_key
    FROM top CROSS JOIN t ORDER BY top.n DESC, top.user_id
    """,
    tags=("scale", "skew", "north-star"),
)
def q153_join_key_skew_profile(spark, sf_dir):
    """Join-key skew diagnosis — the pre-flight check before keying a
    shuffle on user_id: the 15 hottest keys with their exact
    parts-per-million share of all rows and the mean rows/key for
    contrast. A key whose share_ppm ≫ 1e6/shuffle-partitions is the
    one that needs salting (operators/skew.py) or AQE skew handling.
    Shares are integer cross-products (n·1e6 DIV total) — no float
    drift. One hash-agg + TakeOrdered + a 1-row totals broadcast."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = c.orderBy(F.desc("n"), "user_id").limit(15)
    return (
        top.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "n",
            F.expr("n * 1000000 DIV total").alias("share_ppm"),
            F.expr("total DIV n_keys").alias("mean_per_key"),
        )
        .orderBy(F.desc("n"), "user_id")
    )


# --- q217: rendezvous (HRW) sharding vs mod-N under a reshard --------
#
# The resharding story a 100 TB corpus actually lives or dies by:
# growing a mod-N layout from 8 to 9 shards moves (N-1)/N ≈ 89% of all
# keys (every shard rewrites), while rendezvous/HRW hashing moves only
# the ~1/9 of keys whose new shard wins their highest hash — the
# minimal-disruption property that makes standing-index/bucket layouts
# maintainable without full rewrites. Both assignments and both
# movement fractions are computed exactly and value-checked.
_RDZV_FROM = 8
_RDZV_TO = 9


def _rdzv_expr(n: int) -> str:
    """Rendezvous winner among ``n`` shards for this row's doc_id, as
    a pure JVM fold over a literal range (``aggregate(sequence(...))``)
    — per-row narrow compute, no explode, no shuffle, no UDF."""
    key = "md5(concat(cast(doc_id AS string), ':', cast(x AS string)))"
    return (
        f"aggregate(sequence(0, {n - 1}), "
        "named_struct('h', cast('' AS string), 's', -1), "
        f"(acc, x) -> IF({key} > acc.h, named_struct('h', {key}, 's', x), acc)"
        ").s"
    )


@query(
    "q217_rendezvous_sharding",
    oracle=f"""
    WITH r8 AS (
      SELECT d.doc_id,
             arg_max(u.s, md5(CAST(d.doc_id AS VARCHAR) || ':'
                              || CAST(u.s AS VARCHAR))) AS sh
      FROM documents d, range(0, {_RDZV_FROM}) u(s) GROUP BY d.doc_id),
    r9 AS (
      SELECT d.doc_id,
             arg_max(u.s, md5(CAST(d.doc_id AS VARCHAR) || ':'
                              || CAST(u.s AS VARCHAR))) AS sh
      FROM documents d, range(0, {_RDZV_TO}) u(s) GROUP BY d.doc_id),
    per_doc AS (
      SELECT 'mod' AS method, d.doc_id % {_RDZV_TO} AS shard,
             CASE WHEN d.doc_id % {_RDZV_FROM} <> d.doc_id % {_RDZV_TO}
                  THEN 1 ELSE 0 END AS moved
      FROM documents d
      UNION ALL
      SELECT 'rendezvous' AS method, r9.sh AS shard,
             CASE WHEN r8.sh <> r9.sh THEN 1 ELSE 0 END AS moved
      FROM r8 JOIN r9 USING (doc_id)),
    by_shard AS (
      SELECT method, shard, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(moved) AS BIGINT) AS moved
      FROM per_doc GROUP BY method, shard)
    SELECT method,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(moved) AS BIGINT) AS moved,
           CAST(sum(moved) AS BIGINT) * 1000000
             // CAST(sum(n) AS BIGINT) AS moved_ppm,
           CAST(max(n) AS BIGINT) AS shard_to_max,
           CAST(min(n) AS BIGINT) AS shard_to_min
    FROM by_shard GROUP BY method ORDER BY method
    """,
    tags=("scale", "sharding", "north-star", "parity:rendezvous"),
)
def q217_rendezvous_sharding(spark, sf_dir):
    """Rendezvous (highest-random-weight) sharding vs mod-N under a
    reshard from 8 → 9 shards: per method, the exact number/ppm of
    keys that change shard plus the new layout's max/min shard sizes
    (balance). HRW's contract — only ~1/N_new of keys move, vs mod-N's
    ~(N-1)/N full reshuffle — is what lets a 100 TB bucketed layout
    (standing indexes, dedup stages) grow its shard count without
    rewriting every shard; the driver value-checks both movement
    fractions and the balance, so the claim is pinned, not asserted.

    Plan shape: shard winners are per-row JVM folds over a literal
    shard range (``_rdzv_expr`` — no explode, no join, no Python); the
    only exchanges are a 2N-row unpivot into groupBy(method, shard)
    (tiny fixed-width rows) and the O(methods·shards) final rollup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shards = docs.select(
        "doc_id",
        F.expr(_rdzv_expr(_RDZV_FROM)).alias("rz_from"),
        F.expr(_rdzv_expr(_RDZV_TO)).alias("rz_to"),
        (F.col("doc_id") % _RDZV_FROM).alias("m_from"),
        (F.col("doc_id") % _RDZV_TO).alias("m_to"),
    )
    per_doc = shards.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mod").alias("method"),
                    F.col("m_to").cast("long").alias("shard"),
                    (F.col("m_from") != F.col("m_to"))
                    .cast("long")
                    .alias("moved"),
                ),
                F.struct(
                    F.lit("rendezvous").alias("method"),
                    F.col("rz_to").cast("long").alias("shard"),
                    (F.col("rz_from") != F.col("rz_to"))
                    .cast("long")
                    .alias("moved"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    by_shard = per_doc.groupBy("method", "shard").agg(
        F.count(F.lit(1)).alias("n"), F.sum("moved").alias("moved")
    )
    return (
        by_shard.groupBy("method")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("moved").alias("moved"),
            F.expr("sum(moved) * 1000000 DIV sum(n)").alias("moved_ppm"),
            F.max("n").alias("shard_to_max"),
            F.min("n").alias("shard_to_min"),
        )
        .orderBy("method")
    )


# --- q233: Bloom prefilter FPR gate --------------------------------------


@query(
    "q233_bloom_fpr_gate",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_present,
           CAST(count(*) AS BIGINT) AS n_absent,
           true AS fn_ok, true AS fpr_ok
    FROM customer
    """,
    tags=("scale", "sketch", "eval", "parity:bloom-fpr"),
)
def q233_bloom_fpr_gate(spark, sf_dir):
    """Accuracy gate for the q141 Bloom prefilter (the q50/q162
    pattern: exact companion stats + boolean gates the oracle pins to
    ``true``). Build the filter over the distinct customer keys with
    production sizing (m = next power of two ≥ 16·n → k·n/m ≈ 0.125,
    theoretical FPR ≈ 1.4%), then probe two determined sets: the keys
    themselves (EVERY one must pass — a Bloom filter has no false
    negatives, ``fn_ok``) and the disjoint shifted domain key + 10⁹
    (whatever passes is a false positive; ``fpr_ok`` gates the
    measured rate at ≤ 4× theoretical). xxhash64 makes the bit
    pattern engine-specific, so the raw FP count never leaves the
    gate — but the gate is DETERMINISTIC for a given dataset, not
    statistical: one green run at an sf pins it forever. Both counts
    the oracle CAN replay (n_present = n_absent = |customer|) are
    emitted exactly. Scale: the build is one hash-aggregate into
    m/64 words, probes are broadcast 1:≤1 joins — nothing shuffles."""
    import math

    from mindseye_dataframes_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    n = cust.count()  # O(1) driver scalar — sizes the filter
    m = 1 << max(12, (16 * n - 1).bit_length())
    k_hashes = 2
    bloom = bloom_build(cust, "k", n_bits=m, n_hashes=k_hashes)
    theory = (1.0 - math.exp(-k_hashes * n / m)) ** k_hashes
    fp_bound = int(4 * theory * n) + 1
    absent = cust.select((F.col("k") + F.lit(1_000_000_000)).alias("k"))
    n_present_pass = bloom_prefilter(cust, "k", bloom).agg(
        F.count(F.lit(1)).alias("c")
    )
    n_absent_pass = bloom_prefilter(absent, "k", bloom).agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        cust.agg(F.count(F.lit(1)).alias("n_present"))
        .crossJoin(n_present_pass.select(F.col("c").alias("pp")))
        .crossJoin(n_absent_pass.select(F.col("c").alias("ap")))
        .select(
            "n_present",
            F.col("n_present").alias("n_absent"),
            (F.col("pp") == F.col("n_present")).alias("fn_ok"),
            (F.col("ap") <= F.lit(fp_bound)).alias("fpr_ok"),
        )
    )


# --- q234: HLL set-overlap gate -------------------------------------------


@query(
    "q234_hll_overlap_gate",
    oracle="""
    WITH e AS (
      SELECT event_type,
             user_id * 1000 + dayofyear(ts) AS el
      FROM events WHERE event_type IN ('purchase', 'click')),
    m AS (SELECT
      (SELECT count(DISTINCT el) FROM e WHERE event_type = 'purchase')
        AS n_a,
      (SELECT count(DISTINCT el) FROM e WHERE event_type = 'click')
        AS n_b,
      (SELECT count(DISTINCT el) FROM e) AS n_u)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_a + n_b - n_u AS BIGINT) AS exact_inter,
           true AS overlap_ok
    FROM m
    """,
    tags=("scale", "sketch", "eval", "parity:hll-overlap"),
)
def q234_hll_overlap_gate(spark, sf_dir):
    """Accuracy gate for COMPOSED HLL arithmetic (q50 gates one
    cardinality; real pipelines combine sketches): estimate the
    overlap of two activity sets — (user, day-of-year) pairs with
    purchases vs with clicks — by inclusion–exclusion over three
    approx_count_distinct(rsd=0.01) sketches, and gate the estimate
    against the EXACT intersection at ±(15% of it + 3·rsd·|A∪B| +
    10) — the union-scaled term is load-bearing: each sketch errs
    relative to ITS OWN cardinality, so the composed absolute error
    scales with the union even when the true intersection is tiny.
    Inclusion–exclusion compounds the error of three estimates and is the
    step where sketch overlap math usually goes wrong at scale; the
    gate is deterministic for a dataset (HLL++ is), so a green row
    pins it. The exact trio (n_a, n_b, exact_inter — also via
    inclusion–exclusion, but over exact countDistinct) is what the
    oracle replays. Scale: one map-side-combinable distinct-element
    aggregate (the only exchange carries distinct elements, not
    events) followed by a single-row sketch aggregate; no joins."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    el = (F.col("user_id") * 1000 + F.dayofyear("ts")).cast("long")
    d = ev.select("event_type", el.alias("el"))
    is_a = F.col("event_type") == "purchase"
    # One distinct-element pass with side flags, then a single
    # expand-free aggregate. The previous form mixed three
    # countDistinct with three HLLs in ONE aggregate, which triggers
    # the distinct-aggregate Expand rewrite: its first aggregation
    # keys on (gid, el), building one rsd-0.01 HLL++ buffer PER
    # DISTINCT ELEMENT (the q50 pathology ×3) — measured 6.3 s → 2.4 s
    # at sf0.1 for identical values. Idempotence makes the reshape
    # exact: the distinct set behind each side's sketch/count is
    # unchanged ({el with ≥1 purchase row} ≡ {el where has_a}), and
    # HLL++ over a set equals HLL++ over any multiset with that
    # distinct set. Both aggregates remain map-side combinable.
    # pin countDistinct's null-exclusion explicitly (ADVICE r13): a
    # NULL el (possible only under NULL user_id/ts) would form its own
    # group and shift n_a/n_b/n_u by one vs the countDistinct
    # semantics the oracle replays — a no-op on current data
    flags = d.filter(F.col("el").isNotNull()).groupBy("el").agg(
        F.max(is_a).alias("has_a"), F.max(~is_a).alias("has_b")
    )
    row = flags.agg(
        F.sum(F.when(F.col("has_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("has_b"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.count(F.lit(1)).alias("n_u"),
        F.approx_count_distinct(
            F.when(F.col("has_a"), F.col("el")), 0.01
        ).alias("e_a"),
        F.approx_count_distinct(
            F.when(F.col("has_b"), F.col("el")), 0.01
        ).alias("e_b"),
        F.approx_count_distinct("el", 0.01).alias("e_u"),
    )
    exact_inter = F.col("n_a") + F.col("n_b") - F.col("n_u")
    est_inter = F.col("e_a") + F.col("e_b") - F.col("e_u")
    return row.select(
        "n_a",
        "n_b",
        exact_inter.alias("exact_inter"),
        (
            F.abs(est_inter * 100 - exact_inter * 100)
            <= exact_inter * 15 + F.col("n_u") * 3 + 1000
        ).alias("overlap_ok"),
    )
