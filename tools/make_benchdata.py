"""Generate sf-scale bench data matching the driver testdata's schemas
and distributions (TESTDATA.md tables), entirely Spark-side.

The README's 8x probe replicates sf0.1 with perturbation — useful for
scaling curves but synthetic: replicated keys repeat exactly and dup
structure is artificial. This generator instead draws every table at
the target sf with the same schema, key ranges, and statistical shape
as the driver data (hash-based uniforms keyed by row id, so output is
deterministic for a given sf and independent of partitioning):

* row counts extrapolate the driver's sf ladder (lineitem = 6M * sf,
  orders = 1.5M * sf, events = 1M * sf, customer = 150k * sf,
  part = 200k * sf, supplier = 10k * sf, documents = 50k * sf,
  embeddings = 20k * sf; region/nation fixed at 5/25);
* value distributions mirror the observed ones (prices, discounts,
  flags, priorities, 2024 event timeline, word-salad documents over
  the same vocabulary, 64-dim float embeddings);
* ~8% of documents are near-duplicates of an earlier doc (a few word
  substitutions) so MinHash/LSH queries see a realistic dup rate.

Usage: python tools/make_benchdata.py [sf] [out_dir]
Defaults: sf=1.0, out_dir=benchdata/sf1. Never writes outside the
repo.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "spark", "query", "table", "column", "row", "scan", "filter", "join",
    "group", "agg", "sort", "hash", "batch", "stream", "window", "key",
    "value", "part", "order", "line", "customer", "vector", "fast", "slow",
    "small", "the", "a",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]


def u(col, salt, lo=0.0, hi=1.0):
    """Deterministic uniform in [lo, hi) keyed by (col, salt)."""
    h = F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_000))
    return F.lit(lo) + (h / F.lit(1_000_000_000.0)) * F.lit(hi - lo)


def ui(col, salt, n):
    """Deterministic uniform integer in [0, n)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n)).cast("long")


def pick(col, salt, values):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (ui(col, salt, len(values)) + 1).cast("int"))


def main(sf: float, out: str) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"make-benchdata-sf{sf}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    n_customer = int(150_000 * sf)
    n_supplier = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_lineitem = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(20_000 * sf)

    spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/region.parquet")

    spark.createDataFrame(
        [(i, n, i % 5) for i, n in enumerate(NATIONS)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/nation.parquet")

    ids = lambda n, parts=32: spark.range(0, n, 1, parts)  # noqa: E731

    (
        ids(n_customer)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
            ui(F.col("id"), 1, 25).cast("int").alias("c_nationkey"),
            F.round(u(F.col("id"), 2, -999.99, 9999.99), 2).alias("c_acctbal"),
            pick(F.col("id"), 3, SEGMENTS).alias("c_mktsegment"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )

    (
        ids(n_supplier, 8)
        .select(
            F.col("id").alias("s_suppkey"),
            F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
            ui(F.col("id"), 4, 25).cast("int").alias("s_nationkey"),
            F.round(u(F.col("id"), 5, -999.99, 9999.99), 2).alias("s_acctbal"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/supplier.parquet")
    )

    (
        ids(n_part)
        .select(
            F.col("id").alias("p_partkey"),
            F.concat(F.lit("part "), pick(F.col("id"), 6, VOCAB), F.lit(" "), pick(F.col("id"), 7, VOCAB)).alias("p_name"),
            pick(F.col("id"), 8, BRANDS).alias("p_brand"),
            pick(F.col("id"), 9, TYPES).alias("p_type"),
            (ui(F.col("id"), 10, 50) + 1).cast("int").alias("p_size"),
            F.round(u(F.col("id"), 11, 900.0, 2100.0), 2).alias("p_retailprice"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/part.parquet")
    )

    (
        ids(n_orders)
        .select(
            F.col("id").alias("o_orderkey"),
            ui(F.col("id"), 12, n_customer).alias("o_custkey"),
            pick(F.col("id"), 13, ["O", "F", "P"]).alias("o_orderstatus"),
            F.round(u(F.col("id"), 14, 1000.0, 450_000.0), 2).alias("o_totalprice"),
            F.timestamp_seconds(
                F.lit(820_454_400)  # 1996-01-01
                + ui(F.col("id"), 15, 7 * 365 * 24 * 3600)
            ).alias("o_orderdate"),
            pick(F.col("id"), 16, PRIORITIES).alias("o_orderpriority"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )

    (
        ids(n_lineitem)
        .select(
            ui(F.col("id"), 17, n_orders).alias("l_orderkey"),
            ui(F.col("id"), 18, n_part).alias("l_partkey"),
            ui(F.col("id"), 19, n_supplier).alias("l_suppkey"),
            (ui(F.col("id"), 20, 7) + 1).cast("int").alias("l_linenumber"),
            (ui(F.col("id"), 21, 50) + 1).cast("double").alias("l_quantity"),
            F.round(u(F.col("id"), 22, 900.0, 104_000.0), 2).alias("l_extendedprice"),
            F.round(u(F.col("id"), 23, 0.0, 0.11), 2).alias("l_discount"),
            F.round(u(F.col("id"), 24, 0.0, 0.09), 2).alias("l_tax"),
            pick(F.col("id"), 25, ["A", "N", "R"]).alias("l_returnflag"),
            pick(F.col("id"), 26, ["O", "F"]).alias("l_linestatus"),
            F.timestamp_seconds(
                F.lit(788_918_400)  # 1995-01-01
                + ui(F.col("id"), 27, 8 * 365 * 24 * 3600)
            ).alias("l_shipdate"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )

    (
        ids(n_events)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000)  # 2024-01-01
                + F.col("id") * 6_000_000  # ~6s cadence, ordered like the driver's
                + ui(F.col("id"), 28, 5_000_000)
            ).alias("ts"),
            ui(F.col("id"), 29, n_users).alias("user_id"),
            pick(F.col("id"), 30, EVENT_TYPES).alias("event_type"),
            F.round(u(F.col("id"), 31, 0.0, 200.0), 2).alias("value"),
            F.concat(F.lit('{"k": '), ui(F.col("id"), 32, 100).cast("string"), F.lit("}")).alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    # documents: 40-120 word salads over VOCAB; ~8% near-duplicate an
    # earlier doc (same word stream, ~5% of positions substituted)
    word_at = lambda seed_col, pos: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in VOCAB]),
        (F.pmod(F.xxhash64(seed_col, pos), F.lit(len(VOCAB))) + 1).cast("int"),
    )
    docs = (
        ids(n_docs, 16)
        .withColumn("is_dup", (ui(F.col("id"), 33, 100) < 8) & (F.col("id") >= 50))
        .withColumn(
            "seed_id",
            F.when(F.col("is_dup"), ui(F.col("id"), 34, 50)).otherwise(F.col("id")),
        )
        .withColumn("n_words", (ui(F.col("seed_id"), 35, 81) + 40).cast("int"))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words")),
                    lambda pos: F.when(
                        F.col("is_dup")
                        & (F.pmod(F.xxhash64(F.col("id"), pos, F.lit(36)), F.lit(20)) == 0),
                        word_at(F.col("id") + F.lit(1_000_000_000), pos),
                    ).otherwise(word_at(F.col("seed_id"), pos)),
                ),
                " ",
            ),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.when(ui(F.col("id"), 37, 10) < 6, F.lit("en"))
            .otherwise(pick(F.col("id"), 38, LANGS))
            .alias("lang"),
            F.concat(F.lit("src"), ui(F.col("id"), 39, 20).cast("string")).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )

    # seeded near-dup cohort with PAIR-UNIQUE tokens: the common-VOCAB
    # corpus has only 27 words, so at sf≥0.1 every 3-word shingle's
    # document frequency blows past the df≤50 cap the exact dedup
    # ground truth (q226/q80) uses for candidate blocking — leaving
    # n_true=0 and a vacuous recall gate (VERDICT r10 item 4). Each
    # cohort pair (2k, 2k+1) shares a 60-word stream of tokens unique
    # to that pair (shingle df=2, always under the cap); the second
    # member substitutes ~4% of positions, giving shingle-Jaccard
    # ≈0.75-0.85 ≥ τ=0.5 — known true pairs at EVERY sf.
    n_pairs = max(20, int(100 * sf))
    cohort = (
        ids(2 * n_pairs, 4)
        .withColumn("pair", F.expr("id DIV 2"))
        .withColumn("member", F.pmod(F.col("id"), F.lit(2)))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda pos: F.when(
                        (F.col("member") == 1)
                        & (
                            F.pmod(
                                F.xxhash64(F.col("pair"), pos, F.lit(42)),
                                F.lit(25),
                            )
                            == 0
                        ),
                        F.concat(
                            F.lit("s"), F.col("pair").cast("string"),
                            F.lit("x"), pos.cast("string"),
                        ),
                    ).otherwise(
                        F.concat(
                            F.lit("w"), F.col("pair").cast("string"),
                            F.lit("p"), pos.cast("string"),
                        )
                    ),
                ),
                " ",
            ),
        )
        .select(
            (F.col("id") + F.lit(n_docs)).alias("doc_id"),
            "text",
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), ui(F.col("id"), 43, 20).cast("string")).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    docs.unionByName(cohort).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    (
        ids(n_emb, 16)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d, F.lit(40)), F.lit(2_000_001))
                    / F.lit(1_000_000.0)
                    - F.lit(1.0)
                ).cast("float"),
            ).alias("embedding"),
            ui(F.col("id"), 41, 10).cast("int").alias("label"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    print(f"wrote sf={sf} to {out}")
    spark.stop()


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "benchdata/sf1"
    main(sf, out)
