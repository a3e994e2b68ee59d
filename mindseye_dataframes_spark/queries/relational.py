"""Relational parity surface (SURVEY §2A: S/P/J/A/O/U rows).

Each query is declarative DataFrame API — Catalyst owns pushdown,
pruning, join strategy; we add explicit ``broadcast()`` hints on
dimension tables and keep aggregates order-independent (exact decimal
accumulation, see ``functions/exact.py``) so results hash-match the
DuckDB oracle under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import cavg, cents, csum, davg, dec, dsum
from mindseye_dataframes_spark.operators.zip_frames import zip_frames
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# A1/A3/F6 + P6 + O1: the flagship — TPC-H Q1-style pricing summary.
# Mirrors the reference's staging+stats pattern (`Trainer.scala:91-121`
# generated SQL; moment aggregation `DataframeModeler.scala:84-100,172-176`).
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)
               * CAST(round((1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
        / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "parity:A1,A3,F6,P6,O1"),
    bench=True,
)
def q01_pricing_summary(spark, sf_dir):
    # integer-cents accumulation (functions/exact.py): 2.3x faster
    # than decimal hash-agg, engine-exact; BIGINT ceiling for the
    # 3-factor charge (scale 10^6) is ~sf30
    li = load_table(spark, sf_dir, "lineitem")
    disc_price_u = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    charge_u = disc_price_u * cents(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast(li.schema["l_shipdate"].dataType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity").alias("sum_qty"),
            csum("l_extendedprice").alias("sum_base_price"),
            (F.sum(disc_price_u).cast("double") / 1e4).alias("sum_disc_price"),
            (F.sum(charge_u).cast("double") / 1e6).alias("sum_charge"),
            cavg("l_quantity").alias("avg_qty"),
            cavg("l_extendedprice").alias("avg_price"),
            cavg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P1-P4, P6, S1: filter + projection; predicate and both columns must reach
# the parquet scan (PushedFilters — asserted in tests/test_plans.py).
# ---------------------------------------------------------------------------


@query(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R' AND l_quantity > 25
    """,
    tags=("scan", "parity:P1,P4,P6,S1"),
)
def q02_filter_project(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ship_t = li.schema["l_shipdate"].dataType
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast(ship_t))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast(ship_t))
        & (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") > 25)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")


# ---------------------------------------------------------------------------
# P1/P2/P3: staging projection parity — cast every integer column to double
# and drop columns by name prefix, mirroring the generated SELECT at
# `Trainer.scala:100-107` (which drops Soil_Type* and casts ints).
# ---------------------------------------------------------------------------


@query(
    "q03_staging_cast",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS DOUBLE) AS p_size,
           p_name, p_type, p_retailprice
    FROM part
    """,
    tags=("project", "parity:P1,P2,P3,P5"),
)
def q03_staging_cast(spark, sf_dir):
    df = load_table(spark, sf_dir, "part")
    drop_prefix = "p_brand"
    cols = []
    for field in df.schema.fields:  # schema walk, P5
        if field.name.startswith(drop_prefix):
            continue
        if field.dataType.simpleString() in ("int", "smallint", "tinyint"):
            cols.append(F.col(field.name).cast("double").alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols).select("p_partkey", "p_size", "p_name", "p_type", "p_retailprice")


# ---------------------------------------------------------------------------
# O1/O2: top-k = orderBy + limit with a deterministic tiebreak.
# ---------------------------------------------------------------------------


@query(
    "q04_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "parity:O1,O2"),
)
def q04_topk_orders(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        )
    )


# ---------------------------------------------------------------------------
# J2 + broadcast: star join over orders→customer→nation→region. Dimension
# sides carry explicit broadcast hints — no shuffle of the fact table for
# the join itself at any scale (asserted in tests/test_plans.py).
# ---------------------------------------------------------------------------


@query(
    "q05_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("join", "parity:J2,A1"),
    bench=True,
)
def q05_revenue_by_region(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ord_t = orders.schema["o_orderdate"].dataType
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast(ord_t))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast(ord_t))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue_u = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            (F.sum(revenue_u).cast("double") / 1e4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# A2: categorical dictionary discovery — distinct `path=value` keys, sorted.
# Parity with `initKeys`' representation-key pass
# (`DataframeModeler.scala:68-82,163-169`) expressed as aggregates.
# ---------------------------------------------------------------------------


@query(
    "q06_dictionary_keys",
    oracle="""
    SELECT key, n FROM (
      SELECT 'lineitem/l_returnflag=' || l_returnflag AS key, COUNT(*) AS n
      FROM lineitem GROUP BY 1
      UNION ALL
      SELECT 'lineitem/l_linestatus=' || l_linestatus AS key, COUNT(*) AS n
      FROM lineitem GROUP BY 1
      UNION ALL
      SELECT 'orders/o_orderpriority=' || o_orderpriority AS key, COUNT(*) AS n
      FROM orders GROUP BY 1
    ) ORDER BY key
    """,
    tags=("agg", "parity:A2,U1,O1,F1"),
)
def q06_dictionary_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def keys(df, table, col):
        return df.groupBy(
            F.concat(F.lit(f"{table}/{col}="), F.col(col)).alias("key")
        ).agg(F.count(F.lit(1)).alias("n"))

    return (
        keys(li, "lineitem", "l_returnflag")
        .unionAll(keys(li, "lineitem", "l_linestatus"))
        .unionAll(keys(orders, "orders", "o_orderpriority"))
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# A1/F6 exactly as the reference computes it: per-path moments [n, Σx, Σx²]
# then mean/σ derived on top (`DataframeModeler.scala:84-100,129-133`).
# Catalyst's partial+final hash aggregation IS the reference's map-side
# partial + merge (§4.2) — nothing manual to schedule.
# ---------------------------------------------------------------------------


@query(
    "q07_group_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(l_quantity) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_x,
             CAST(SUM(CAST(l_quantity AS DECIMAL(14,4)) * CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_x2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sum_x, sum_x2,
           sum_x / CAST(n AS DOUBLE) AS mean,
           SQRT(ABS(sum_x2 / CAST(n AS DOUBLE) - (sum_x / CAST(n AS DOUBLE)) * (sum_x / CAST(n AS DOUBLE)))) AS stddev
    FROM m ORDER BY l_returnflag
    """,
    tags=("agg", "parity:A1,F6"),
)
def q07_group_moments(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 4, 14)
    m = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        dsum("l_quantity").alias("sum_x"),
        F.sum(x * x).cast("double").alias("sum_x2"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sum_x") / n_d
    return m.select(
        "l_returnflag",
        "n",
        "sum_x",
        "sum_x2",
        mean.alias("mean"),
        F.sqrt(F.abs(F.col("sum_x2") / n_d - mean * mean)).alias("stddev"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Semi/anti joins (§2B join matrix).
# ---------------------------------------------------------------------------


@query(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    tags=("join", "parity:join-semi"),
)
def q08_semi_join(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "parity:join-anti"),
)
def q09_anti_join(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Outer join + agg (§2B join matrix).
# ---------------------------------------------------------------------------


@query(
    "q10_outer_join_agg",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           COUNT(l.l_orderkey) AS n_lines,
           COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS sum_qty
    FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
    GROUP BY p.p_partkey, p.p_brand
    ORDER BY p.p_partkey
    """,
    tags=("join", "parity:join-outer,A1"),
)
def q10_outer_join_agg(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.coalesce(dsum("l_quantity"), F.lit(0.0)).alias("sum_qty"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# U1 + set ops: union / intersect / except.
# ---------------------------------------------------------------------------


@query(
    "q11_union_groups",
    oracle="""
    SELECT src, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM (
      SELECT 'small' AS src, l_extendedprice FROM lineitem WHERE l_quantity < 10
      UNION ALL
      SELECT 'large' AS src, l_extendedprice FROM lineitem WHERE l_quantity > 40
    ) GROUP BY src ORDER BY src
    """,
    tags=("setop", "parity:U1"),
)
def q11_union_groups(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    small = li.filter(F.col("l_quantity") < 10).select(
        F.lit("small").alias("src"), "l_extendedprice"
    )
    large = li.filter(F.col("l_quantity") > 40).select(
        F.lit("large").alias("src"), "l_extendedprice"
    )
    return (
        small.unionAll(large)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("src")
    )


@query(
    "q12_intersect_except",
    oracle="""
    WITH
      buyers   AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
      openers  AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
      both_ck  AS (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM openers),
      only_f   AS (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM openers)
    SELECT 'both' AS grp, custkey FROM both_ck
    UNION ALL
    SELECT 'only_f' AS grp, custkey FROM only_f
    ORDER BY grp, custkey
    """,
    tags=("setop", "parity:intersect,except"),
)
def q12_intersect_except(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    both = f.intersect(o).select(F.lit("both").alias("grp"), "custkey")
    only_f = f.exceptAll(o).select(F.lit("only_f").alias("grp"), "custkey")
    return both.unionAll(only_f).orderBy("grp", "custkey")


# ---------------------------------------------------------------------------
# J1: positional zip with explicit unique order keys (the reference's
# signature operator, `DataframeModeler.scala:246-258`). Frame A is
# lineitem keyed by (orderkey, linenumber); frame B is prices ordered by
# (price, orderkey, linenumber) — zip pairs the i-th of each.
# ---------------------------------------------------------------------------


@query(
    "q13_zip_positional",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag)
               - 1 AS rid
      FROM lineitem
    ), b AS (
      SELECT l_extendedprice AS price,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) - 1 AS rid
      FROM lineitem
    )
    SELECT a.rid, a.l_orderkey, a.l_linenumber, a.l_returnflag, b.price
    FROM a JOIN b USING (rid)
    """,
    tags=("join", "parity:J1,J2"),
    bench=True,
)
def q13_zip_positional(spark, sf_dir):
    """Positional zip of two projections of lineitem, each under its
    own order (J1 semantics). Frame a's order key is the FULL row
    (l_orderkey, l_linenumber, l_returnflag): (l_orderkey,
    l_linenumber) alone is not unique in the synthetic data, and the
    tied rows carry different return flags — ranks among such ties
    are engine/partition-arbitrary, so the rid→flag pairing would be
    a latent cross-engine flake. With the payload included in the
    key, tied rows are bytewise identical and every tie permutation
    yields the same output multiset (the relaxation with_row_index's
    contract documents). Frame b's (price, key) order is unique
    outright — verified at all scale factors."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    b = li.select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_orderkey").alias("_bok"),
        F.col("l_linenumber").alias("_bln"),
    )
    zipped = zip_frames(
        [a, b],
        [
            ["l_orderkey", "l_linenumber", "l_returnflag"],
            ["price", "_bok", "_bln"],
        ],
        index_col="rid",
    )
    return zipped.select("rid", "l_orderkey", "l_linenumber", "l_returnflag", "price")


# ---------------------------------------------------------------------------
# Grouped aggregation extensions (§2B): count distinct, rollup.
# ---------------------------------------------------------------------------


@query(
    "q14_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "parity:count-distinct"),
)
def q14_count_distinct(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q15_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "parity:rollup"),
)
def q15_rollup(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )
