"""Lakehouse maintenance operators: CDC apply + dimension history.

q99 MERGE/upsert — ``operators/merge.py`` applied to a deterministic
changelog derived from ``orders`` (keys %10=3 mutate price+status,
keys %100=7 arrive as new rows). One keyed full-outer join — the
snapshot+changelog compaction pattern; see the operator docstring for
the 100 TB story. The +100 price mutation is an exact double add, so
values stay engine-exact.

q100 SCD2 intervals — slowly-changing-dimension type-2 history from
an event log: per user each event opens a version valid
``[ts, next ts)``; ``lead`` closes it, the last version stays open
(NULL valid_to, is_current). One hash exchange for the per-user
window; at scale this is the standard dimension-history build.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.merge import merge_upsert
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q99_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey + 1000000, o_totalprice, 'I'
      FROM orders WHERE o_orderkey % 100 = 7)
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                  THEN 'update'
                WHEN b.o_orderkey IS NULL THEN 'insert'
                ELSE 'keep' END AS action
    FROM orders b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey
    """,
    tags=("join", "merge", "lakehouse"),
)
def q99_merge_upsert(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 3)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 100).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
        .unionAll(
            base.filter(F.col("o_orderkey") % 100 == 7).select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("I").alias("o_orderstatus"),
            )
        )
    )
    return merge_upsert(base, updates, ["o_orderkey"]).orderBy("o_orderkey")


@query(
    "q100_scd2_intervals",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           event_id, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
    """,
    tags=("window", "scd2", "lakehouse"),
)
def q100_scd2_intervals(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


@query(
    "q151_shard_balance",
    oracle="""
    WITH s AS (
      SELECT CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 64 AS shard,
             doc_id, n_chars
      FROM documents)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("lakehouse", "sharding", "north-star"),
)
def q151_shard_balance(spark, sf_dir):
    """Content-hash shard assignment audit: route each document to
    one of 64 shards by the first 32 bits of md5(text) and report
    per-shard row/byte balance — the skew check run before a
    partitioned write or a sharded training run. md5 makes the
    routing REPRODUCIBLE across engines, languages, and Spark
    versions (unlike hash()/xxhash64, whose seeds are
    implementation-specific) — the property you need when shard
    membership is persisted and later recomputed by a different
    system. One scan + one 64-group hash-agg, embarrassingly
    parallel; the digest value is < 2^32 so % 64 is exact BIGINT
    arithmetic on both engines."""
    s = load_table(spark, sf_dir, "documents").select(
        (
            F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % 64
        ).alias("shard"),
        "doc_id",
        "n_chars",
    )
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )
