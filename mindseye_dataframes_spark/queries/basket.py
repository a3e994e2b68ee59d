"""Retail/ML analytics batch 3 (round-4 widening).

q132 association rules — market-basket support/confidence/lift over
part pairs co-occurring in orders. All inputs are exact integer
counts; each metric is exact-product-then-one-divide in doubles
(products < 2^53), so both engines emit bit-identical values. The
pair join is per-order bounded (never corpus-quadratic) — the same
edge generation as the co-purchase graph (q125/q126).

q133 conversion latency — signup→first-purchase delay distribution:
exact integer seconds, interpolated percentiles via the shared
(n−1)·p definition (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
the q46-proven pairing). Two tiny per-user aggregates and one join.

q134 snapshot diff — the dbt-style table diff: full outer join of
two snapshots on the key, rows classified added / removed / changed /
unchanged — the audit an incremental pipeline emits per run. One
shuffle on the key; the simulated next-day snapshot (deletes, price
updates, inserts) is derived deterministically from ``orders``.

q135 quantile binning — equal-frequency feature binning: exact
quartile boundaries (one global aggregate, 3 numbers) broadcast back
as a narrow CASE assignment — the two-phase "tiny model → wide apply"
shape (cf. q119's vocabulary).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_AR_MIN_PAIRS = 3
_AR_TOP = 50


@query(
    "q132_association_rules",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING count(*) >= {_AR_MIN_PAIRS}),
    items AS (
      SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS n_p
      FROM op GROUP BY l_partkey),
    scored AS (
      SELECT pa, pb, n_ab, ia.n_p AS n_a, ib.n_p AS n_b,
             CAST(n_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
             CAST(n_ab AS DOUBLE) / CAST(ia.n_p AS DOUBLE) AS confidence,
             (CAST(n_ab AS DOUBLE) * CAST(n.n AS DOUBLE))
               / (CAST(ia.n_p AS DOUBLE) * CAST(ib.n_p AS DOUBLE)) AS lift
      FROM pairs
      JOIN items ia ON ia.p = pairs.pa
      JOIN items ib ON ib.p = pairs.pb
      CROSS JOIN n_orders n)
    SELECT pa, pb, n_ab, n_a, n_b, support, confidence, lift FROM (
      SELECT *, row_number() OVER (ORDER BY lift DESC, pa, pb) AS rn
      FROM scored) WHERE rn <= {_AR_TOP}
    ORDER BY lift DESC, pa, pb
    """,
    tags=("analytics", "basket", "north-star"),
)
def q132_association_rules(spark, sf_dir):
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _AR_MIN_PAIRS)
    )
    items = op.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    d = lambda c: F.col(c).cast("double")
    scored = (
        pairs.join(items.select(F.col("p").alias("pa"), F.col("n_p").alias("n_a")), "pa")
        .join(items.select(F.col("p").alias("pb"), F.col("n_p").alias("n_b")), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa", "pb", "n_ab", "n_a", "n_b",
            (d("n_ab") / d("n")).alias("support"),
            (d("n_ab") / d("n_a")).alias("confidence"),
            ((d("n_ab") * d("n")) / (d("n_a") * d("n_b"))).alias("lift"),
        )
    )
    return (
        scored.orderBy(F.desc("lift"), "pa", "pb").limit(_AR_TOP)
    )


@query(
    "q133_conversion_latency",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT user_id, min(ts) AS first_purchase FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    lat AS (
      SELECT s.user_id,
             (epoch_us(p.first_purchase) - epoch_us(s.signup_ts)) // 1000000
               AS latency_sec
      FROM s JOIN p USING (user_id)
      WHERE p.first_purchase >= s.signup_ts)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(latency_sec) AS BIGINT) AS min_sec,
           quantile_cont(latency_sec, 0.5) AS p50_sec,
           quantile_cont(latency_sec, 0.9) AS p90_sec,
           CAST(max(latency_sec) AS BIGINT) AS max_sec
    FROM lat
    """,
    tags=("analytics", "funnel", "north-star"),
)
def q133_conversion_latency(spark, sf_dir):
    """Signup→first-purchase latency distribution: exact integer
    seconds (truncating div, identical both engines), interpolated
    percentiles via the q46-proven percentile/quantile_cont pairing."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = (
        s.join(p, "user_id")
        .filter(F.col("first_purchase") >= F.col("signup_ts"))
        .select(
            F.expr(
                "(unix_micros(first_purchase) - unix_micros(signup_ts)) div 1000000"
            ).alias("latency_sec")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("latency_sec").alias("min_sec"),
        F.percentile("latency_sec", F.lit(0.5)).alias("p50_sec"),
        F.percentile("latency_sec", F.lit(0.9)).alias("p90_sec"),
        F.max("latency_sec").alias("max_sec"),
    )


@query(
    "q134_snapshot_diff",
    oracle="""
    WITH snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 10 != 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, 'N'
      FROM orders WHERE o_orderkey % 13 = 0),
    diff AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
             CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice != b.o_totalprice
                       OR a.o_orderstatus != b.o_orderstatus THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM orders a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey)
    SELECT status, CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
    FROM diff GROUP BY status ORDER BY status
    """,
    tags=("lakehouse", "diff", "north-star"),
)
def q134_snapshot_diff(spark, sf_dir):
    """Table diff between two snapshots (dbt-style audit): full outer
    join on the key, each row classified added/removed/changed/
    unchanged. ONE shuffle on the key at any scale; the 'next-day'
    snapshot is simulated deterministically (10% deletes, ~14% price
    updates, ~8% inserts)."""
    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = a.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    ).unionAll(
        a.filter(F.col("o_orderkey") % 13 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )
    al = a.select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_totalprice").alias("pa"),
        F.col("o_orderstatus").alias("sa"),
    )
    bl = b.select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_totalprice").alias("pb"),
        F.col("o_orderstatus").alias("sb"),
    )
    diff = al.join(bl, al["ka"] == bl["kb"], "full_outer").select(
        F.coalesce("ka", "kb").alias("k"),
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(
            (F.col("pa") != F.col("pb")) | (F.col("sa") != F.col("sb")), "changed"
        )
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("status")
    )


@query(
    "q135_quantile_binning",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.5)  AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders),
    binned AS (
      SELECT CASE WHEN o_totalprice < q1 THEN 0
                  WHEN o_totalprice < q2 THEN 1
                  WHEN o_totalprice < q3 THEN 2
                  ELSE 3 END AS bin,
             o_totalprice
      FROM orders CROSS JOIN q)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("featurize", "binning", "north-star"),
)
def q135_quantile_binning(spark, sf_dir):
    """Equal-frequency (quartile) binning: one global exact-percentile
    aggregate (3 boundary doubles — identical both engines per the
    q46 pairing) broadcast into a narrow CASE assignment + audit agg.
    The boundaries frame is 1 row, so the apply side never shuffles
    before the final count."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    binned = orders.crossJoin(F.broadcast(q)).select(
        F.when(F.col("o_totalprice") < F.col("q1"), 0)
        .when(F.col("o_totalprice") < F.col("q2"), 1)
        .when(F.col("o_totalprice") < F.col("q3"), 2)
        .otherwise(3)
        .cast("long")
        .alias("bin"),
        "o_totalprice",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bin")
    )
