"""Window-function surface (SURVEY §2B: "Window functions" row).

All windows are partitioned (never a global single-partition window on
a data path) and ordered by a unique key so results are deterministic
under any physical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dec
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q16_window_topn",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
    tags=("window", "parity:window-rank"),
)
def q16_window_topn(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@query(
    "q17_window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    ORDER BY event_id
    """,
    tags=("window", "parity:window-lag"),
)
def q17_window_lag_delta(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("delta", F.col("value") - F.lag("value").over(w))
        .select("event_id", "user_id", "delta")
        .orderBy("event_id")
    )


@query(
    "q18_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
    FROM events
    ORDER BY event_id
    """,
    tags=("window", "parity:window-sum"),
)
def q18_running_sum(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("run_sum", F.sum(dec("value", 2)).over(w).cast("double"))
        .select("event_id", "user_id", "run_sum")
        .orderBy("event_id")
    )


@query(
    "q19_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / CAST(COUNT(value) OVER w AS DOUBLE) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "parity:window-avg"),
)
def q19_moving_avg(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    mov = F.sum(dec("value", 2)).over(w).cast("double") / F.count("value").over(w).cast(
        "double"
    )
    return (
        events.withColumn("mov_avg", mov)
        .select("event_id", "user_id", "mov_avg")
        .orderBy("event_id")
    )


@query(
    "q20_ntile_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4)  OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile,
           rank()    OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS status_rank,
           CAST(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pct
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("window", "parity:window-ntile,rank,percent_rank"),
)
def q20_ntile_rank(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    by_status = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(by_price).alias("quartile"),
            F.rank().over(by_status).alias("status_rank"),
            F.percent_rank().over(by_price).cast("double").alias("pct"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q21_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window", "parity:window-first-last"),
)
def q21_first_last(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        )
        .distinct()
        .orderBy("user_id")
    )


@query(
    "q64_analytic_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           dense_rank()   OVER w AS drank,
           CAST(percent_rank() OVER w AS DOUBLE) AS prank,
           CAST(cume_dist()    OVER w AS DOUBLE) AS cdist
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, drank, o_orderkey
    """,
    tags=("window", "parity:analytic-ranks"),
)
def q64_analytic_ranks(spark, sf_dir):
    """Remaining analytic rank family: dense_rank / percent_rank /
    cume_dist — one window per partition key, order made total with
    the key tiebreak so both engines agree exactly."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).cast("double").alias("prank"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
    ).orderBy("o_orderpriority", "drank", "o_orderkey")
