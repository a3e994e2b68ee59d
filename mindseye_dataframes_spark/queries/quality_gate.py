"""Corpus admission checks and event-stream hygiene.

q108 quality gate — the declarative expectations engine
(``operators/expectations.py``) over ``lineitem``: six checks
(row floor, null-free keys, key uniqueness, quantity/discount ranges,
return-flag domain) evaluated in ONE aggregate pass. The oracle
recomputes every check as plain SQL aggregates — bit-exact integer
counts and booleans.

q109 debounce — drop events of the same (user, type) arriving within
60 s of the previous one: the lag-window hygiene filter that kills
double-fires before sessionization. Integer-microsecond comparison,
one hash exchange.

q110 ordered funnel — view → click → purchase with strict temporal
ordering per user: min-timestamp per stage joined stepwise
(click after first view, purchase after that click), then one row of
stage counts. Joins are per-user equi-joins (no theta), so the
funnel costs three keyed aggregates at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.expectations import (
    check_in_range,
    check_in_set,
    check_min_rows,
    check_not_null,
    check_unique,
    run_checks,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q108_quality_gate",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n_rows,
             count(*) - count(l_orderkey) AS null_keys,
             count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dupes,
             CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS qty_out,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc_out,
             CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                           THEN 1 ELSE 0 END) AS BIGINT) AS flag_out
      FROM lineitem)
    SELECT 'in_range:l_discount' AS "check", disc_out = 0 AS passed,
           CAST(disc_out AS BIGINT) AS observed FROM a
    UNION ALL
    SELECT 'in_range:l_quantity', qty_out = 0, CAST(qty_out AS BIGINT) FROM a
    UNION ALL
    SELECT 'in_set:l_returnflag', flag_out = 0, CAST(flag_out AS BIGINT) FROM a
    UNION ALL
    SELECT 'min_rows', n_rows >= 1000, CAST(n_rows AS BIGINT) FROM a
    UNION ALL
    SELECT 'not_null:l_orderkey', null_keys = 0, CAST(null_keys AS BIGINT) FROM a
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber', dupes = 0, CAST(dupes AS BIGINT) FROM a
    ORDER BY "check"
    """,
    tags=("quality", "expectations", "north-star"),
)
def q108_quality_gate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return run_checks(
        li,
        [
            check_min_rows(1000),
            check_not_null("l_orderkey"),
            check_unique("l_orderkey", "l_linenumber"),
            check_in_range("l_quantity", 1, 50),
            check_in_range("l_discount", 0.0, 0.1),
            check_in_set("l_returnflag", ["A", "N", "R"]),
        ],
    )


@query(
    "q109_debounce",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 60000000
    ORDER BY event_id
    """,
    tags=("window", "debounce", "hygiene"),
)
def q109_debounce(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 60_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )


@query(
    "q110_ordered_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS tc
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS tp
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
    SELECT CAST(count(v.user_id) AS BIGINT) AS n_view,
           CAST(count(c.user_id) AS BIGINT) AS n_click_after_view,
           CAST(count(p.user_id) AS BIGINT) AS n_full_funnel
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("funnel", "analytics"),
)
def q110_ordered_funnel(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("tv").alias("n_view"),
            F.count("tc").alias("n_click_after_view"),
            F.count("tp").alias("n_full_funnel"),
        )
    )


@query(
    "q113_udtf_token_windows",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id < 100),
    starts AS (
      SELECT doc_id, ws, CAST(s.i AS INT) AS i,
             CAST((s.i - 1) / 15 AS INT) AS win_idx
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws), 15)) AS i) s
      WHERE s.i = 1 OR s.i + 5 <= len(ws))
    SELECT doc_id, win_idx,
           array_to_string(list_slice(ws, i, i + 19), ' ') AS window_text,
           CAST(least(20, len(ws) - i + 1) AS INT) AS n_tokens
    FROM starts ORDER BY doc_id, win_idx
    """,
    tags=("udtf", "parity:table-function"),
)
def q113_udtf_token_windows(spark, sf_dir):
    """Python UDTF surface (``functions/udtfs.py``) addressed via SQL
    LATERAL — sliding 20-token windows at stride 15, matched exactly
    by a built-in SQL oracle. Restricted to doc_id < 100: the UDTF is
    the per-row-Python API demonstration, not the scale path (q88 is
    the codegen form)."""
    from mindseye_dataframes_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.win_idx, t.window_text, t.n_tokens
        FROM _udtf_docs d, LATERAL token_windows(d.text) t
        ORDER BY d.doc_id, t.win_idx
        """
    )


@query(
    "q144_table_fingerprint",
    oracle="""
    WITH li AS (
      SELECT 'lineitem' AS table_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(('0x' || substr(md5(
                 CAST(l_orderkey AS VARCHAR) || '|' ||
                 CAST(l_linenumber AS VARCHAR) || '|' ||
                 CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
                 || '|' || l_returnflag || '|' || l_linestatus
               ), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
      FROM lineitem),
    o AS (
      SELECT 'orders' AS table_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                 || '|' || o_orderstatus
               ), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
      FROM orders)
    SELECT * FROM li UNION ALL SELECT * FROM o ORDER BY table_name
    """,
    tags=("quality", "fingerprint", "north-star"),
)
def q144_table_fingerprint(spark, sf_dir):
    """Order-independent table fingerprints — the replica/migration
    verification primitive: hash a canonical row encoding (integer
    cents for money, '|' field separator) with md5, fold the first
    32 bits of each digest into a commutative BIGINT sum. Identical
    data ⇒ identical (n_rows, checksum) regardless of row order,
    partitioning, or engine — md5 and decimal integer formatting are
    engine-portable, unlike xxhash64/hash(). One scan + one agg per
    table, embarrassingly parallel; the 32-bit addend keeps the sum
    < 2^63 up to ~2^31 rows per table (state the ceiling: at 100 TB
    row counts, fold per-partition sums modulo 2^32 instead)."""

    def fp(df, name, cols):
        enc = F.concat_ws("|", *cols)
        word = F.conv(F.substring(F.md5(enc.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        )
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(word).alias("checksum"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "checksum")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return fp(
        li,
        "lineitem",
        [
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        ],
    ).unionAll(
        fp(
            orders,
            "orders",
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                F.col("o_orderstatus"),
            ],
        )
    ).orderBy("table_name")


@query(
    "q159_referential_integrity",
    oracle="""
    SELECT 'customer->nation' AS fk, CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    UNION ALL
    SELECT 'lineitem->orders', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    UNION ALL
    SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY fk
    """,
    tags=("quality", "integrity", "north-star"),
)
def q159_referential_integrity(spark, sf_dir):
    """Foreign-key integrity audit across the star schema: for each
    child→parent relationship, total child rows and orphan rows
    (child key with no parent) — the admission check a warehouse
    runs after every load. Each check is one left join reduced
    immediately to two counters; parent sides are dimension-sized
    (broadcast) except orders, which joins on its natural
    shuffle key. Orphan counting via LEFT JOIN + NULL test (not
    anti-join) so n_child and n_orphans come from the SAME pass."""

    def check(child, parent, child_key, parent_key, name):
        p = parent.select(F.col(parent_key).alias("_pk")).distinct()
        return (
            child.select(F.col(child_key).alias("_ck"))
            .join(F.broadcast(p) if name != "lineitem->orders" else p,
                  F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("_pk").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )

    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "nation", "lineitem", "orders", "part", "supplier")}
    checks = [
        check(t["customer"], t["nation"], "c_nationkey", "n_nationkey",
              "customer->nation"),
        check(t["lineitem"], t["orders"], "l_orderkey", "o_orderkey",
              "lineitem->orders"),
        check(t["lineitem"], t["part"], "l_partkey", "p_partkey",
              "lineitem->part"),
        check(t["lineitem"], t["supplier"], "l_suppkey", "s_suppkey",
              "lineitem->supplier"),
        check(t["orders"], t["customer"], "o_custkey", "c_custkey",
              "orders->customer"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.orderBy("fk")
