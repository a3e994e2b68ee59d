"""Curation primitives a 100 TB training-data pipeline needs as
*reproducible* relational operators.

q75: deterministic hash-bucket sampling. ``df.sample(seed)`` (q48) is
seeded but engine-specific — a rerun on a different engine, Spark
version, or partitioning can pick different rows. Hash sampling keys
each row by ``md5(key) % 100`` so the sample is a pure function of the
data: stable across engines (oracle-checkable, unlike q48), across
reruns, and across repartitioning — which is what makes held-out
splits auditable at 100 TB. The md5 stays JVM-side (whole-stage
codegen, no Python), the filter is a narrow map over the scan, and
bucket membership can even serve as a partition-pruning key if the
table is written bucketed by it.

q76: column profiling — per-column row/null/distinct counts and
min/max — the standard first pass over a new crawl snapshot before
dedup/filter decisions. One aggregate pass per column expressed as a
grouping-free ``agg``; all profiled stats render to VARCHAR so one
long-format row per column survives a single union'd schema.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


def hash_bucket(col, buckets: int = 100):
    """Deterministic [0, buckets) bucket from md5 of the rendered key.

    Identical expression exists in ANSI SQL
    (``CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT)``),
    so samples are portable across engines.
    """
    prefix = F.substring(F.md5(F.col(col).cast("string")), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") % buckets).alias("bucket")


# Deterministic train/test split: md5-bucket < SPLIT_TEST_BUCKETS of
# 100 → 'test'. ONE definition for the rule (q185/q186 consume the
# column form, their oracles the SQL twin) — the threshold and bucket
# count must never drift between the engines.
SPLIT_TEST_BUCKETS = 10

SPLIT_LABEL_SQL = (
    "CASE WHEN CAST(('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 8)) AS BIGINT)"
    f" % 100 < {SPLIT_TEST_BUCKETS} THEN 'test' ELSE 'train' END"
)


def split_label(col):
    """'test'/'train' from the hash-bucket rule above — a pure
    function of the id, so split membership never needs a join."""
    return F.when(hash_bucket(col) < SPLIT_TEST_BUCKETS, F.lit("test")).otherwise(
        F.lit("train")
    )


@query(
    "q75_hash_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
             AS bucket
    FROM documents
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 5
    ORDER BY doc_id
    """,
    tags=("curation", "sampling", "north-star"),
)
def q75_hash_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", hash_bucket("doc_id"))
        .filter(F.col("bucket") < 5)
        .select("doc_id", "lang", "source", "n_chars", "bucket")
        .orderBy("doc_id")
    )


_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "q76_profile_columns",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
    tags=("curation", "profiling", "north-star"),
)
def q76_profile_columns(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    profiles = [
        orders.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return reduce(lambda a, b: a.unionAll(b), profiles).orderBy("col_name")


@query(
    "q160_mixture_token_plan",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
      FROM documents GROUP BY source),
    ranked AS (
      SELECT source, actual_tokens,
             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS r,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM tok),
    wts AS (
      SELECT source, actual_tokens,
             greatest(1, r * 2000000 // (n * (n + 1))) AS weight_ppm
      FROM ranked),
    budget AS (
      SELECT min(actual_tokens * 1000000 // weight_ppm) AS b FROM wts)
    SELECT source, actual_tokens, weight_ppm,
           b * weight_ppm // 1000000 AS planned_tokens,
           (b * weight_ppm // 1000000) * 1000000 // actual_tokens AS rate_ppm
    FROM wts CROSS JOIN budget
    ORDER BY source
    """,
    tags=("curation", "mixture", "north-star"),
)
def q160_mixture_token_plan(spark, sf_dir):
    """Training-mixture planning — the sizing pass before q83's
    mixture sampler: given per-source token supply and target weights
    (here: rank-proportional, w_i ∝ i over sources sorted by name —
    derived, so the query works at any SF), find the largest total
    token budget every source can serve (B = min actual·1e6/w) and
    each source's planned tokens + sampling rate. ALL arithmetic is
    BIGINT floor-division in parts-per-million — the plan is
    bit-identical on every engine, which matters because these
    numbers get embedded in run configs. One token-count aggregate
    over the corpus; everything after operates on |sources| rows."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("actual_tokens"))
    )
    w = Window.orderBy("source")
    ranked = tok.select(
        "source",
        "actual_tokens",
        F.row_number().over(w).cast("long").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    wts = ranked.select(
        "source",
        "actual_tokens",
        # greatest(1, …): rank-proportional ppm floors to 0 once
        # n(n+1) > 2e6 (~1413 sources); a zero weight divides by zero
        # downstream — NULL on Spark, an error on DuckDB — so clamp the
        # underflow to 1 ppm identically on both engines
        F.expr("greatest(1L, r * 2000000 DIV (n * (n + 1)))").alias("weight_ppm"),
    )
    budget = wts.agg(
        F.min(F.expr("actual_tokens * 1000000 DIV weight_ppm")).alias("b")
    )
    return (
        wts.crossJoin(F.broadcast(budget))
        .select(
            "source",
            "actual_tokens",
            "weight_ppm",
            F.expr("b * weight_ppm DIV 1000000").alias("planned_tokens"),
            F.expr(
                "(b * weight_ppm DIV 1000000) * 1000000 DIV actual_tokens"
            ).alias("rate_ppm"),
        )
        .orderBy("source")
    )


_TOPP_PCT = 80  # keep the top-p quality mass per language


@query(
    "q164_topp_quality_curation",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
      FROM documents),
    ranked AS (
      SELECT lang, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id) AS rnk,
             sum(score) OVER (PARTITION BY lang
                              ORDER BY score DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(score) OVER (PARTITION BY lang) AS total
      FROM scored)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rnk = 1 OR cum * 100 <= total * {_TOPP_PCT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rnk = 1 OR cum * 100 <= total * {_TOPP_PCT}
                         THEN score ELSE 0 END) AS BIGINT) AS kept_score,
           CAST(max(total) AS BIGINT) AS total_score
    FROM ranked GROUP BY lang ORDER BY lang
    """,
    tags=("curation", "quality", "north-star"),
)
def q164_topp_quality_curation(spark, sf_dir):
    """Nucleus (top-p) curation: per language, keep the highest-quality
    documents until they account for p% of the total quality mass —
    the budgeted analog of a fixed score threshold (a fixed threshold
    keeps unpredictable volume as the crawl mix drifts; top-p keeps a
    predictable share). Quality here is the lexical-richness proxy
    |distinct words| — an exact BIGINT, so the cumulative-mass cutoff
    is integer arithmetic and bit-identical on every engine.

    Scale: one narrow map computes scores at the scan (no text leaves
    the executor), one hash-shuffle by lang for the window, and the
    final rollup aggregates map-side to |langs| rows. Skewed languages
    are real at 100 TB (en dominates) — the same pattern then runs per
    (lang, shard-of-source) with a second rollup, which q129's salted
    aggregation already demonstrates."""
    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("score"),
    )
    order = [F.col("score").desc(), F.col("doc_id")]
    wlang = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "score",
        F.row_number().over(wlang.orderBy(*order)).alias("rnk"),
        F.sum("score")
        .over(wlang.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("score").over(wlang).alias("total"),
    )
    kept = (F.col("rnk") == 1) | (
        F.col("cum") * 100 <= F.col("total") * _TOPP_PCT
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("score")).otherwise(0)).alias("kept_score"),
            F.max("total").alias("total_score"),
        )
        .orderBy("lang")
    )


@query(
    "q166_temperature_mixture",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
      FROM documents GROUP BY source),
    s AS (
      SELECT source, actual_tokens,
             CAST(round(sqrt(CAST(actual_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS s6
      FROM tok),
    t AS (SELECT CAST(sum(s6) AS BIGINT) AS tot6,
                 CAST(sum(actual_tokens) AS BIGINT) AS tot_tokens FROM s)
    SELECT source, actual_tokens,
           CAST(s6 * 1000000 // tot6 AS BIGINT) AS weight_ppm,
           CAST(actual_tokens * 1000000 // tot_tokens AS BIGINT) AS natural_ppm,
           CAST((s6 * 1000000 // tot6) * 1000000
             // greatest(actual_tokens * 1000000 // tot_tokens, 1) AS BIGINT)
             AS boost_ppm
    FROM s CROSS JOIN t
    ORDER BY source
    """,
    tags=("curation", "mixture", "north-star"),
)
def q166_temperature_mixture(spark, sf_dir):
    """Temperature-scaled sampling weights (the multilingual-corpus
    rebalancing rule of Conneau & Lample 2019: w_s ∝ p_s^α, here
    α = 0.5): up-weights small sources relative to their natural share
    so the mixture isn't dominated by the largest crawl. sqrt is
    IEEE-correctly-rounded on every engine, and each sqrt is quantized
    to BIGINT micros BEFORE the normalizing sum, so the total — and
    every derived ppm — is exact integer arithmetic: the published
    mixture weights are bit-identical regardless of engine, partition
    order, or parallelism (a double-precision Σ√t_s would not be).
    boost_ppm = weight/natural share, the oversampling factor each
    source's shards get in the training dataloader.

    Scale: one token-count aggregate over the corpus; everything after
    runs on |sources| rows against a broadcast 1-row total."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("actual_tokens"))
    )
    s = tok.select(
        "source",
        "actual_tokens",
        F.round(F.sqrt(F.col("actual_tokens").cast("double")) * 1_000_000)
        .cast("long")
        .alias("s6"),
    )
    t = s.agg(
        F.sum("s6").alias("tot6"), F.sum("actual_tokens").alias("tot_tokens")
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            "actual_tokens",
            F.expr("s6 * 1000000 DIV tot6").alias("weight_ppm"),
            F.expr("actual_tokens * 1000000 DIV tot_tokens").alias("natural_ppm"),
            F.expr(
                "(s6 * 1000000 DIV tot6) * 1000000"
                " DIV greatest(actual_tokens * 1000000 DIV tot_tokens, 1L)"
            ).alias("boost_ppm"),
        )
        .orderBy("source")
    )


@query(
    "q173_mixture_materialized",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
      FROM documents GROUP BY source),
    s AS (
      SELECT source, actual_tokens,
             CAST(round(sqrt(CAST(actual_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS s6
      FROM tok),
    t AS (SELECT CAST(sum(s6) AS BIGINT) AS tot6 FROM s),
    w AS (
      SELECT source, actual_tokens,
             CAST(greatest(s6 * 1000000 // tot6, 1) AS BIGINT) AS weight_ppm
      FROM s CROSS JOIN t),
    b AS (
      SELECT CAST(min(actual_tokens * 1000000 // weight_ppm) AS BIGINT) AS bud
      FROM w),
    rates AS (
      SELECT source,
             CAST(least(
               (bud * weight_ppm // 1000000) * 1000000 // actual_tokens,
               1000000) AS BIGINT) AS rate_ppm
      FROM w CROSS JOIN b),
    sampled AS (
      SELECT d.source,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 1000000 < r.rate_ppm)
    SELECT r.source AS source, r.rate_ppm,
           CAST(count(s.ntok) AS BIGINT) AS n_sampled,
           CAST(COALESCE(sum(s.ntok), 0) AS BIGINT) AS tokens_sampled
    FROM rates r LEFT JOIN sampled s ON s.source = r.source
    GROUP BY r.source, r.rate_ppm
    ORDER BY r.source
    """,
    tags=("curation", "mixture", "sampling", "north-star"),
)
def q173_mixture_materialized(spark, sf_dir):
    """The mixture loop CLOSED: q166's temperature weights feed q160's
    budget rule (largest total every source can serve at its weight),
    which yields per-source sampling rates, which the q75 md5-bucket
    sampler then actually applies — returning what each source really
    contributed. One declared job from 'α = 0.5' to materialized
    per-source token counts, every stage integer/md5-exact, so the
    sample is reproducible across engines, reruns, and partitionings
    (the property that makes a training mixture auditable).

    Scale: one token aggregate; |sources|-row weight/budget algebra on
    broadcast totals; the sampler is a narrow md5 filter at the scan
    behind a broadcast rate join; one closing hash-aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("actual_tokens")
    )
    s = tok.select(
        "source",
        "actual_tokens",
        F.round(F.sqrt(F.col("actual_tokens").cast("double")) * 1_000_000)
        .cast("long")
        .alias("s6"),
    )
    t = s.agg(F.sum("s6").alias("tot6"))
    w = s.crossJoin(F.broadcast(t)).select(
        "source",
        "actual_tokens",
        F.expr("greatest(s6 * 1000000 DIV tot6, 1L)").alias("weight_ppm"),
    )
    b = w.agg(
        F.min(F.expr("actual_tokens * 1000000 DIV weight_ppm")).alias("bud")
    )
    rates = w.crossJoin(F.broadcast(b)).select(
        "source",
        F.expr(
            "least((bud * weight_ppm DIV 1000000) * 1000000"
            " DIV actual_tokens, 1000000L)"
        ).alias("rate_ppm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1_000_000
    )
    sampled = (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_ppm"))
        .select("source", F.size(F.split("text", " ")).cast("long").alias("ntok"))
    )
    return (
        rates.join(
            sampled.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_sampled"),
                F.sum("ntok").alias("tokens_sampled"),
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "rate_ppm",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("tokens_sampled", F.lit(0)).alias("tokens_sampled"),
        )
        .orderBy("source")
    )


_UNIMAX_EPOCH_CAP = 3  # max epochs any source may repeat
_UNIMAX_BUDGET_EPOCHS = 2  # training budget = 2x the corpus


@query(
    "q174_unimax_mixture",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_s
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS tot,
                   CAST(count(*) AS BIGINT) AS n FROM tok),
    u AS (SELECT source, t_s, t_s * {_UNIMAX_EPOCH_CAP} AS cap,
                 tot.tot * {_UNIMAX_BUDGET_EPOCHS} AS budget, tot.n
          FROM tok CROSS JOIN tot),
    r AS (SELECT *,
                 CAST(ROW_NUMBER() OVER (ORDER BY cap, source) AS BIGINT) AS i,
                 CAST(sum(cap) OVER (ORDER BY cap, source
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
          FROM u),
    f AS (SELECT *, CASE WHEN cap <= (budget - (p - cap)) // (n - i + 1)
                         THEN 1 ELSE 0 END AS flag FROM r),
    pf AS (SELECT *, CAST(min(flag) OVER (ORDER BY cap, source
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS sat FROM f),
    kk AS (SELECT CAST(sum(sat) AS BIGINT) AS k,
                  CAST(coalesce(sum(CASE WHEN sat = 1 THEN cap END), 0)
                       AS BIGINT) AS pk FROM pf)
    SELECT source, t_s AS supply_tokens, cap AS cap_tokens,
           CAST(CASE WHEN sat = 1 THEN cap
                     ELSE (budget - kk.pk) // (n - kk.k) END AS BIGINT)
             AS alloc_tokens,
           CAST((CASE WHEN sat = 1 THEN cap
                      ELSE (budget - kk.pk) // (n - kk.k) END) * 1000000 // t_s
                AS BIGINT) AS epochs_ppm,
           sat = 1 AS saturated
    FROM pf CROSS JOIN kk ORDER BY source
    """,
    tags=("curation", "mixture", "north-star"),
)
def q174_unimax_mixture(spark, sf_dir):
    """UniMax mixture allocation (Chung et al. 2023, arXiv:2304.09151):
    spread the training budget UNIFORMLY across sources, but cap any
    source at ``_UNIMAX_EPOCH_CAP`` epochs of its supply — the
    alternative to temperature sampling (q166) that never over-repeats
    low-resource sources. The waterfill is computed in closed form:
    sources ascend by capped supply; a source is saturated iff its cap
    fits under the running fair share (budget − smaller caps, split
    over the rest); everything after the saturation prefix takes the
    EQUAL integer share of what remains (flooring — the ≤|sources|
    leftover tokens are deliberately unallocated rather than dribbled
    to arbitrary sources, keeping the allocation a pure function of
    the inputs; pinned vs a sequential-greedy reference in
    tests/test_properties.py). All BIGINT with DIV — bit-identical on
    both engines, no iterative loop.

    Scale: ONE token-count aggregate over the corpus — literally one
    parquet scan in the plan: the budget, source count, saturation
    prefix, and its totals are all full-frame window aggregates over
    the same |sources|-row frame (a naive agg-and-cross-join form
    re-derived the corpus aggregate five times; window form keeps the
    single subtree). The waterfill runs on parameters, not data —
    single-partition windows over 10⁴ sources are nothing."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("t_s")
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = Window.orderBy("cap", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = (
        tok.select(
            "source", "t_s", (F.col("t_s") * _UNIMAX_EPOCH_CAP).alias("cap")
        )
        .withColumn(
            "budget", F.sum("t_s").over(full) * _UNIMAX_BUDGET_EPOCHS
        )
        .withColumn("n", F.count(F.lit(1)).over(full))
        .withColumn("i", F.row_number().over(Window.orderBy("cap", "source")))
        .withColumn("p", F.sum("cap").over(cum))
        .withColumn(
            "flag",
            F.when(
                F.expr("cap <= (budget - (p - cap)) DIV (n - i + 1)"), 1
            ).otherwise(0),
        )
        .withColumn("sat", F.min("flag").over(cum))
        .withColumn("k", F.sum("sat").over(full))
        .withColumn(
            "pk",
            F.coalesce(
                F.sum(F.when(F.col("sat") == 1, F.col("cap"))).over(full),
                F.lit(0),
            ),
        )
    )
    alloc = F.expr(
        "CASE WHEN sat = 1 THEN cap ELSE (budget - pk) DIV (n - k) END"
    )
    return (
        flagged.select(
            "source",
            F.col("t_s").alias("supply_tokens"),
            F.col("cap").alias("cap_tokens"),
            alloc.alias("alloc_tokens"),
            (F.col("sat") == 1).alias("saturated"),
        )
        # the q165 ceiling discipline: alloc·1e6 must stay in BIGINT —
        # raise, never wrap (alloc ≤ 3·t_s, so this fires around
        # 9.2e12 tokens allocated to ONE source; shard the evaluation
        # scope before that)
        .withColumn(
            "epochs_ppm",
            F.when(
                F.expr(f"alloc_tokens > {(2**63 - 1) // 1_000_000}"),
                F.expr(
                    "CAST(raise_error('q174: alloc_tokens exceeds the "
                    "exact-BIGINT ppm ceiling; evaluate per shard') AS BIGINT)"
                ),
            ).otherwise(
                F.expr("alloc_tokens * 1000000 DIV supply_tokens")
            ),
        )
        .select(
            "source", "supply_tokens", "cap_tokens", "alloc_tokens",
            "epochs_ppm", "saturated",
        )
        .orderBy("source")
    )


_PACK_SEQ_LEN = 512


@query(
    "q176_packing_efficiency",
    oracle=f"""
    WITH tk AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           CAST(sum((ntok + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN})
                AS BIGINT) AS n_seqs,
           CAST(sum(ntok) * 1000000
             // (sum((ntok + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN})
                 * {_PACK_SEQ_LEN}) AS BIGINT) AS util_ppm
    FROM tk GROUP BY source ORDER BY source
    """,
    tags=("curation", "packing", "north-star"),
)
def q176_packing_efficiency(spark, sf_dir):
    """Sequence-packing utilization per source at seq_len 512 under
    the no-cross-document rule (each doc splits into ⌈ntok/L⌉
    sequences, the tail padded): util_ppm = tokens / (n_seqs·L). This
    is the planning stat that decides whether a source needs the
    cross-doc greedy packer (q81) — a source with util far below 1e6
    is mostly short docs whose padding the packer can reclaim. Pure
    integer arithmetic (ceil via (n+L−1) DIV L), one hash-aggregate
    with map-side combine; scan-bound at any scale."""
    tk = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).cast("long").alias("ntok")
    )
    L = _PACK_SEQ_LEN
    return (
        tk.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.sum(F.expr(f"(ntok + {L - 1}) DIV {L}")).alias("n_seqs"),
        )
        # same BIGINT ppm ceiling as q165/q174: raise past ~9.2e12
        # tokens per source rather than wrap to a wrong sign
        .withColumn(
            "util_ppm",
            F.when(
                F.expr(f"total_tokens > {(2**63 - 1) // 1_000_000}"),
                F.expr(
                    "CAST(raise_error('q176: total_tokens exceeds the "
                    "exact-BIGINT ppm ceiling; evaluate per shard') AS BIGINT)"
                ),
            ).otherwise(F.expr(f"total_tokens * 1000000 DIV (n_seqs * {L})")),
        )
        .orderBy("source")
    )


_DSIR_BUCKETS = 4096


@query(
    "q181_importance_resampling",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, lang,
             CAST(('0x' || substr(md5(u.w), 1, 8)) AS BIGINT)
               % {_DSIR_BUCKETS} AS b
      FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
    ),
    nr AS (SELECT COUNT(*) AS n FROM words),
    nt AS (SELECT COUNT(*) AS n FROM words WHERE lang = 'en'),
    pr AS (SELECT b, COUNT(*) * 1000000 // (SELECT n FROM nr) AS ppm
           FROM words GROUP BY b),
    pt AS (SELECT b, COUNT(*) * 1000000 // (SELECT n FROM nt) AS ppm
           FROM words WHERE lang = 'en' GROUP BY b),
    dc AS (SELECT doc_id, source, b, COUNT(*) AS c
           FROM words GROUP BY 1, 2, 3),
    ds AS (
      SELECT dc.doc_id, dc.source,
             CAST(SUM(dc.c * (COALESCE(pt.ppm, 0) - pr.ppm)) AS BIGINT)
               AS score
      FROM dc JOIN pr USING (b) LEFT JOIN pt USING (b)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM ds
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rn <= (n_src + 4) // 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted,
           CAST(SUM(CASE WHEN rn <= (n_src + 4) // 5 THEN score ELSE 0 END)
                AS BIGINT) AS sum_adm_score,
           CAST(MIN(CASE WHEN rn <= (n_src + 4) // 5 THEN score END)
                AS BIGINT) AS min_adm_score,
           CAST(MAX(CASE WHEN rn <= (n_src + 4) // 5 THEN score END)
                AS BIGINT) AS max_adm_score
    FROM ranked GROUP BY source ORDER BY source
    """,
    tags=("curation", "parity:importance-resampling"),
)
def q181_importance_resampling(spark, sf_dir):
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — public
    paper): score every document by how much its unigram distribution
    looks like a TARGET domain (here lang='en') versus the raw crawl,
    then admit the top ceil(20%) per source.

    Features are HASHED into a fixed 4096-bucket space —
    exactly the paper's construction, and the property that makes the
    method scale-safe: the two distribution tables are O(buckets)
    (constant) rows no matter how large the crawl's raw vocabulary
    grows, so the broadcast join below never depends on corpus size.
    The hash is the engine-portable md5-prefix pair (Spark ``conv``
    ≡ DuckDB ``'0x' || substr`` — the q75 idiom).

    Exactness: the published method uses log-likelihood ratios of
    hashed n-gram features; floats in ``ln`` differ across engines,
    so the score is re-expressed in exact integer arithmetic —
    score(doc) = Σ_b c_doc(b) · (ppm_target(b) − ppm_raw(b)), a
    linear importance proxy with every term BIGINT (ppm = count·10⁶
    DIV total, the q165/q174 pattern). Overflow ceiling: per-bucket
    ppm delta is bounded by ±10⁶, so |score| ≤ 10⁶·tokens_per_doc —
    exact until a single document holds ~9.2e12 tokens.

    Scale shape: the corpus text is scanned and exploded ONCE, into a
    single (doc, source, lang, bucket) hash-aggregate; every other
    input — raw/target bucket counts, both totals — is re-aggregated
    from that doc_counts frame (O(docs · distinct-buckets-per-doc)
    rows, no text), so lineage recompute never re-reads the corpus
    more than once per branch. The two ppm tables are O(buckets) =
    4096 rows and BROADCAST to the per-doc count join (no corpus
    shuffle on the join key, and the broadcast cannot outgrow
    memory); ranking is a per-source window over O(docs) scored rows;
    totals are 1-row broadcast cross-joins.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    bucket = (
        F.expr("conv(substring(md5(w), 1, 8), 16, 10)").cast("long")
        % _DSIR_BUCKETS
    ).alias("b")
    words = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split("text", " ")).alias("w"),
    ).select("doc_id", "source", "lang", bucket)
    # the ONE corpus-wide aggregate; everything below derives from it.
    # localCheckpoint pins it: five consumers with different prunings
    # would otherwise each re-derive the explode from the scan (per-
    # branch column pruning defeats ReuseExchange — verified: 5 scans
    # without the pin, 1 with)
    doc_counts = (
        words.groupBy("doc_id", "source", "lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    n_raw = doc_counts.agg(F.sum("c").alias("n_r"))
    n_tgt = doc_counts.filter(F.col("lang") == "en").agg(
        F.sum("c").alias("n_t")
    )
    p_raw = (
        doc_counts.groupBy("b")
        .agg(F.sum("c").alias("c_r"))
        .crossJoin(F.broadcast(n_raw))
        .select("b", F.expr("c_r * 1000000 DIV n_r").alias("ppm_r"))
    )
    p_tgt = (
        doc_counts.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("c").alias("c_t"))
        .crossJoin(F.broadcast(n_tgt))
        .select("b", F.expr("c_t * 1000000 DIV n_t").alias("ppm_t"))
    )
    vocab = p_raw.join(p_tgt, "b", "left").select(
        "b",
        (F.coalesce("ppm_t", F.lit(0)) - F.col("ppm_r")).alias("delta"),
    )
    scores = (
        doc_counts.join(F.broadcast(vocab), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("c") * F.col("delta")).alias("score"))
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w_src = Window.partitionBy("source")
    ranked = scores.select(
        "source",
        "score",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_src).alias("n_src"),
    )
    admitted = F.col("rn") <= F.expr("(n_src + 4) DIV 5")
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(admitted.cast("long")).alias("n_admitted"),
            F.sum(F.when(admitted, F.col("score")).otherwise(0)).alias(
                "sum_adm_score"
            ),
            F.min(F.when(admitted, F.col("score"))).alias("min_adm_score"),
            F.max(F.when(admitted, F.col("score"))).alias("max_adm_score"),
        )
        .orderBy("source")
    )


@query(
    "q190_token_budget_selection",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(toks)) * 1000 AS BIGINT) // CAST(len(toks) AS BIGINT)
               AS score
      FROM t),
    b AS (SELECT CAST(CAST(sum(n_tok) AS BIGINT) * 2 // 5 AS BIGINT) AS budget FROM s),
    c AS (
      SELECT s.*, b.budget,
             SUM(n_tok) OVER (ORDER BY score DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM s, b)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(n_tok) AS BIGINT) AS BIGINT) AS tokens_total,
           CAST(COUNT(*) FILTER (WHERE cum <= budget) AS BIGINT) AS n_admitted,
           CAST(COALESCE(CAST(SUM(n_tok) FILTER (WHERE cum <= budget) AS BIGINT), 0)
                AS BIGINT) AS tokens_admitted
    FROM c GROUP BY lang ORDER BY lang
    """,
    tags=("curation", "llm-prep", "parity:token-budget"),
)
def q190_token_budget_selection(spark, sf_dir):
    """Token-budget-constrained corpus selection: fill a fixed token
    budget (40% of corpus tokens, exact integer) with the
    highest-quality documents under a total order (quality score
    DESC, doc_id ASC), the greedy knapsack every pretraining data
    plan runs ("pick the best B tokens"). Score is an exact-integer
    lexical-diversity proxy (distinct·1000 DIV total tokens — swap in
    any deterministic scorer).

    The oracle states the semantics as ONE global window cumsum; the
    Spark plan computes the SAME admitted set scalably in two phases,
    because a corpus-wide single-partition running sum is exactly the
    plan that dies at 100 TB:
    1. aggregate (score → tokens) — a ≤1001-row frame (score is
       bounded 0..1000 by construction), collected to the driver
       (O(score-cardinality) parameters, not data) to find the
       threshold bucket t* where the bucket-level cumulative crosses
       the budget and the remaining in-bucket budget;
    2. one corpus scan admits score > t* outright (their cumulative
       is ≤ budget by construction of t*), plus a doc_id-ordered
       running sum INSIDE the single boundary bucket — the only
       window in the plan, bounded by one bucket's membership, never
       the corpus.
    Per-lang admitted/total accounting hash-checks the selection."""
    from mindseye_dataframes_spark.functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    s = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000 AS BIGINT)"
            " DIV CAST(size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    )
    # phase 1: bounded bucket histogram -> threshold + in-bucket budget
    buckets = {
        int(r["score"]): int(r["btoks"])
        for r in s.groupBy("score").agg(F.sum("n_tok").alias("btoks")).collect()
    }
    budget = sum(buckets.values()) * 2 // 5
    cum, t_star, rem = 0, None, 0
    for sc in sorted(buckets, reverse=True):
        if cum + buckets[sc] > budget:
            t_star, rem = sc, budget - cum
            break
        cum += buckets[sc]
    if t_star is None:
        flagged = s.withColumn("_adm", F.lit(1))
    else:
        # the ONLY window in the plan runs inside the single boundary
        # bucket (its membership, never the corpus); admitted boundary
        # ids come back as a broadcast flag join — no driver row data
        w_bucket = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        boundary = (
            s.filter(F.col("score") == t_star)
            .withColumn("bcum", F.sum("n_tok").over(w_bucket))
            .filter(F.col("bcum") <= rem)
            .select("doc_id", F.lit(1).alias("_b"))
        )
        flagged = s.join(F.broadcast(boundary), "doc_id", "left").withColumn(
            "_adm",
            ((F.col("score") > t_star) | F.col("_b").isNotNull()).cast("int"),
        )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
            F.sum("_adm").cast("long").alias("n_admitted"),
            F.coalesce(
                F.sum(F.col("n_tok") * F.col("_adm")), F.lit(0)
            ).alias("tokens_admitted"),
        )
        .orderBy("lang")
    )


def _q200_score_sql() -> str:
    from mindseye_dataframes_spark.functions.textfns import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
      SELECT doc_id, source,
             CAST(len(list_filter(toks, x -> x IN ({sw}))) AS BIGINT)
               * 500000 // CAST(len(toks) AS BIGINT)
             + CASE WHEN len(toks) >= 30 THEN 500000
                    ELSE CAST(len(toks) AS BIGINT) * 500000 // 30 END
               AS score_ppm
      FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
            FROM documents)
    """


@query(
    "q200_cross_source_quality_calibration",
    oracle=f"""
    WITH scored AS ({_q200_score_sql()}),
    b AS (SELECT doc_id, source, score_ppm,
                 score_ppm // 1000 AS bucket FROM scored),
    hist AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY source, bucket),
    cum AS (SELECT source, bucket, cnt,
                   CAST(COALESCE(SUM(cnt) OVER (
                     PARTITION BY source ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS cum_lt,
                   CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_src
            FROM hist),
    calib AS (
      SELECT b.doc_id, b.source, b.score_ppm,
             cum.cum_lt * 1000000 // cum.n_src AS calib_ppm
      FROM b JOIN cum ON b.source = cum.source AND b.bucket = cum.bucket)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN calib_ppm >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted,
           MIN(CASE WHEN calib_ppm >= 500000 THEN score_ppm END) AS thr_ppm,
           md5(COALESCE(string_agg(
             CASE WHEN calib_ppm >= 500000 THEN CAST(doc_id AS VARCHAR) END,
             ',' ORDER BY doc_id), '')) AS admitted_md5
    FROM calib GROUP BY source ORDER BY source
    """,
    tags=("curation", "quality", "parity:quality-calibration"),
)
def q200_cross_source_quality_calibration(spark, sf_dir):
    """CROSS-SOURCE QUALITY CALIBRATION — quantile-normalize quality
    scores WITHIN each source before admitting the top half per
    source: raw quality heuristics are not comparable across crawls
    (a news source's median outscores a forum's 90th percentile), so
    admitting on a single global threshold silently starves whole
    sources; calibrating each doc to its within-source percentile
    admits the best half OF EACH SOURCE, whatever its raw score
    distribution. Output per source: doc/admit counts, the effective
    raw-score threshold (visibly different per source — the point),
    and the md5 of the admitted id set (full-value evidence).

    Scale shape — the q190 two-phase pattern, NO corpus-wide window:
    phase 1 aggregates a bounded (source × 1001-bucket) score
    histogram (one map-side-combinable exchange); the percentile
    arithmetic runs on the tiny histogram only; phase 2 re-scans with
    the per-(source,bucket) calibration broadcast back. A direct
    per-source rank window would shuffle the whole corpus partitioned
    by source — skew-bound at 100 TB when one crawl dominates; this
    plan's only corpus exchanges are the histogram aggregate and the
    final per-source rollup. Bucket granularity (1000 ppm) is the
    documented resolution: ties within a bucket calibrate identically
    on both engines."""
    from mindseye_dataframes_spark.functions.textfns import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    # integer-exact score (mirrors the oracle literally)
    score = F.expr(
        "CAST(size(filter(split(text, ' '), x -> x IN ("
        + ", ".join(f"'{w}'" for w in STOPWORDS)
        + "))) AS BIGINT) * 500000 DIV CAST(size(split(text, ' ')) AS BIGINT)"
        " + CASE WHEN size(split(text, ' ')) >= 30 THEN 500000"
        " ELSE CAST(size(split(text, ' ')) AS BIGINT) * 500000 DIV 30 END"
    )
    b = docs.select(
        "doc_id", "source", score.alias("score_ppm")
    ).withColumn("bucket", F.expr("score_ppm DIV 1000"))
    hist = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "source",
        "bucket",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("cum_lt"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n_src"),
    )
    calib = b.join(F.broadcast(cum), ["source", "bucket"]).withColumn(
        "calib_ppm", F.expr("cum_lt * 1000000 DIV n_src")
    )
    adm = F.col("calib_ppm") >= 500000
    return (
        calib.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(adm.cast("long")).alias("n_admitted"),
            F.min(F.when(adm, F.col("score_ppm"))).alias("thr_ppm"),
            F.md5(
                F.coalesce(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.when(adm, F.col("doc_id")))
                            ),
                            lambda d: d.cast("string"),
                        ),
                    ),
                    F.lit(""),
                )
            ).alias("admitted_md5"),
        )
        .orderBy("source")
    )


_NB_BUCKETS = 4096  # hashed feature space, fixed regardless of vocabulary
_NB_POS_SOURCE = "src0"  # the curated-corpus proxy class
_NB_NEUTRAL_PPM = 500_000  # score for buckets never seen in training


@query(
    "q201_nb_quality_classifier",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             {SPLIT_LABEL_SQL.format(id="doc_id")} AS split,
             CASE WHEN source = '{_NB_POS_SOURCE}' THEN 1 ELSE 0 END AS y,
             text
      FROM documents),
    tok AS (
      SELECT doc_id, source, split, y,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {_NB_BUCKETS} AS b
      FROM d, LATERAL (SELECT unnest(string_split(text, ' ')) AS w)),
    dc AS (
      SELECT doc_id, source, split, y, b, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, source, split, y, b),
    train AS (SELECT * FROM dc WHERE split = 'train'),
    model AS (
      SELECT b,
             CAST((CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) + 1)
                  * 1000000
                  // (CAST(sum(c) AS BIGINT) + 2) AS BIGINT) AS w_ppm
      FROM train GROUP BY b),
    prior AS (
      SELECT CAST(CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT)
                  * 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT) AS prior_ppm
      FROM train),
    test AS (SELECT * FROM dc WHERE split = 'test'),
    scored AS (
      SELECT doc_id, source, y,
             CAST(sum(c * coalesce(w_ppm, {_NB_NEUTRAL_PPM})) // sum(c)
                  AS BIGINT) AS score_ppm
      FROM test LEFT JOIN model USING (b)
      GROUP BY doc_id, source, y),
    pred AS (
      SELECT source, y, score_ppm,
             CASE WHEN score_ppm >= prior_ppm THEN 1 ELSE 0 END AS p
      FROM scored CROSS JOIN prior)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(p) AS BIGINT) AS n_pred_pos,
           CAST(sum(CASE WHEN p = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(score_ppm) AS BIGINT) AS sum_score_ppm
    FROM pred GROUP BY source ORDER BY source
    """,
    tags=("curation", "classifier", "training", "north-star"),
)
def q201_nb_quality_classifier(spark, sf_dir):
    """IN-ENGINE TRAINED QUALITY CLASSIFIER, train → apply → eval in
    one declarative plan — the CCNet / GPT-3 curation recipe (train a
    cheap linear classifier with a curated corpus as the positive
    class, score the crawl, keep what looks curated): hashed-unigram
    Naive-Bayes-style model fit on the deterministic 'train' split
    (``split_label`` — the ONE shared rule with q185/q186), applied to
    the held-out 'test' split, reported as a per-source confusion
    rollup (docs / true positives / predicted positives / correct).

    Exactness: the textbook NB score Σ log P(b|y) drifts across libm
    implementations, so the per-bucket evidence is re-expressed as an
    integer Laplace posterior in ppm — w_ppm(b) = (c_pos+1)·10⁶ DIV
    (c_total+2) — and a document scores the c-weighted mean of its
    buckets' w_ppm (decision: score ≥ train prior). Same
    exact-integer substitution q118 (lift not log-PMI) and q181
    (ppm deltas not log-likelihood ratios) already use; every column
    is BIGINT, so the oracle replays training AND inference
    bit-exactly. Overflow: Σ c·w_ppm ≤ 10⁶·tokens-per-doc — exact
    until a single document holds ~9.2e12 tokens.

    Scale shape: the corpus is tokenized ONCE into one
    (doc, split, y, bucket) hash-aggregate (map-side combinable); the
    model is a second aggregate over its train half with O(4096)
    output rows — corpus-size-INDEPENDENT by the hashing-trick
    construction, so the model join below is always a broadcast, and
    "retrain on 100 TB" is two aggregates, not a learning loop. The
    prior is a 1-row broadcast cross-join; scoring touches only test
    rows. No corpus-wide window, no Python in the plan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    labeled = docs.select(
        "doc_id",
        "source",
        split_label("doc_id").alias("split"),
        (F.col("source") == _NB_POS_SOURCE).cast("int").alias("y"),
        "text",
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % _NB_BUCKETS
    ).alias("b")
    tok = labeled.select(
        "doc_id",
        "source",
        "split",
        "y",
        F.explode(F.split("text", " ")).alias("w"),
    ).select("doc_id", "source", "split", "y", bucket)
    # the ONE corpus-wide aggregate; train/test halves derive from it
    # (localCheckpoint pins it so the two consumers don't each re-read
    # and re-explode the corpus — the q181-verified pattern)
    dc = (
        tok.groupBy("doc_id", "source", "split", "y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    train = dc.filter(F.col("split") == "train")
    model = train.groupBy("b").agg(
        F.expr(
            "CAST((sum(CASE WHEN y = 1 THEN c ELSE 0 END) + 1) * 1000000"
            " DIV (sum(c) + 2) AS BIGINT)"
        ).alias("w_ppm")
    )
    prior = train.agg(
        F.expr(
            "CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) * 1000000"
            " DIV sum(c) AS BIGINT)"
        ).alias("prior_ppm")
    )
    scored = (
        dc.filter(F.col("split") == "test")
        .join(F.broadcast(model), "b", "left")
        .groupBy("doc_id", "source", "y")
        .agg(
            F.expr(
                f"CAST(sum(c * coalesce(w_ppm, {_NB_NEUTRAL_PPM}))"
                " DIV sum(c) AS BIGINT)"
            ).alias("score_ppm")
        )
    )
    pred = scored.crossJoin(F.broadcast(prior)).select(
        "source",
        "y",
        "score_ppm",
        # coalesce mirrors the oracle's CASE ... ELSE 0: with an empty
        # train split prior_ppm is NULL and the bare comparison would
        # yield NULL (dropping rows from n_pred_pos/n_correct) where
        # the oracle counts 0 — a cross-engine divergence in a
        # degenerate but reachable corpus (ADVICE r7)
        F.coalesce(
            (F.col("score_ppm") >= F.col("prior_ppm")).cast("int"), F.lit(0)
        ).alias("p"),
    )
    return (
        pred.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("p").cast("long").alias("n_pred_pos"),
            F.sum((F.col("p") == F.col("y")).cast("long")).alias("n_correct"),
            F.sum("score_ppm").alias("sum_score_ppm"),
        )
        .orderBy("source")
    )


_LM_B = 256  # hashed context/event buckets — model ≤ B² cells, broadcast-safe


def _lm_bucket_sql(expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % {_LM_B}"
    )


@query(
    "q206_bigram_lm_perplexity_filter",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             {SPLIT_LABEL_SQL.format(id="doc_id")} AS split,
             string_split(text, ' ') AS toks
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    bg AS (
      SELECT doc_id, source, split,
             {_lm_bucket_sql("w1")} AS b1,
             {_lm_bucket_sql("w2")} AS b2
      FROM (
        SELECT doc_id, source, split,
               unnest(toks[1:len(toks)-1]) AS w1,
               unnest(toks[2:len(toks)]) AS w2
        FROM d)),
    dc AS (
      SELECT doc_id, source, split, b1, b2, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY doc_id, source, split, b1, b2),
    pair AS (
      SELECT b1, b2, CAST(sum(c) AS BIGINT) AS c12
      FROM dc WHERE split = 'train' GROUP BY b1, b2),
    ctx AS (
      SELECT b1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY b1),
    scored AS (
      SELECT doc_id, source,
             CAST(sum(c * ((coalesce(c12, 0) + 1) * 1000000
                           // (coalesce(c1, 0) + {_LM_B})))
                  // sum(c) AS BIGINT) AS score_ppm
      FROM dc
      LEFT JOIN pair USING (b1, b2)
      LEFT JOIN ctx USING (b1)
      WHERE split = 'test'
      GROUP BY doc_id, source),
    thr AS (
      SELECT CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_ppm
      FROM scored)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score_ppm < mean_ppm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(sum(score_ppm) AS BIGINT) AS sum_score_ppm
    FROM scored CROSS JOIN thr
    GROUP BY source ORDER BY source
    """,
    tags=("curation", "lm", "perplexity", "north-star"),
)
def q206_bigram_lm_perplexity_filter(spark, sf_dir):
    """LM-PERPLEXITY-STYLE FILTERING — the other half of the CCNet
    curation recipe (q201 is the classifier half): fit a bigram
    language model on the 'train' split, score held-out documents by
    how predictable their token transitions are, and flag the
    high-perplexity tail per source (the rows a crawl pipeline routes
    to its "remove or review" bucket).

    Exactness: perplexity's log-likelihood is re-expressed in exact
    integers end-to-end (the q118/q181/q201 discipline) — the model
    stores Laplace conditionals in ppm, cond(b1,b2) = (c12+1)·10⁶ DIV
    (c1+256), a document scores the count-weighted mean conditional of
    its transitions (LOW score = high perplexity), and the flag
    threshold is the exact integer mean over the scored split — so
    the oracle replays training, inference, and thresholding with no
    cross-engine libm or float-accumulation drift.

    Scale shape: contexts and events hash into 256 buckets each, so
    the model is ≤ 256² cells and the context table at most 256 rows
    — both corpus-size-INDEPENDENT broadcasts (the hashing-trick
    bound, as in q181/q201). The corpus reduces to ONE bigram-bucket
    hash-aggregate (pinned; train/test branches both derive from it);
    scoring is two broadcast left-joins + one per-doc aggregate; the
    threshold is a 1-row broadcast; no corpus-wide window
    anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.filter(F.size(toks) >= 2).select(
        "doc_id",
        "source",
        split_label("doc_id").alias("split"),
        toks.alias("toks"),
    )
    bg = d.select(
        "doc_id",
        "source",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                " element_at(toks, i + 1) AS w2))"
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "source",
        "split",
        (
            F.conv(F.substring(F.md5("p.w1"), 1, 8), 16, 10).cast("long")
            % _LM_B
        ).alias("b1"),
        (
            F.conv(F.substring(F.md5("p.w2"), 1, 8), 16, 10).cast("long")
            % _LM_B
        ).alias("b2"),
    )
    # the ONE corpus-wide aggregate; model and scoring derive from it
    dc = (
        bg.groupBy("doc_id", "source", "split", "b1", "b2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    pair = (
        dc.filter(F.col("split") == "train")
        .groupBy("b1", "b2")
        .agg(F.sum("c").alias("c12"))
    )
    ctx = pair.groupBy("b1").agg(F.sum("c12").alias("c1"))
    cond = F.expr(
        f"(coalesce(c12, 0) + 1) * 1000000 DIV (coalesce(c1, 0) + {_LM_B})"
    )
    scored = (
        dc.filter(F.col("split") == "test")
        .join(F.broadcast(pair), ["b1", "b2"], "left")
        .join(F.broadcast(ctx), ["b1"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.expr(
                f"CAST(sum(c * ((coalesce(c12, 0) + 1) * 1000000"
                f" DIV (coalesce(c1, 0) + {_LM_B}))) DIV sum(c) AS BIGINT)"
            ).alias("score_ppm")
        )
    )
    thr = scored.agg(
        F.expr("CAST(sum(score_ppm) DIV count(*) AS BIGINT)").alias("mean_ppm")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("score_ppm") < F.col("mean_ppm")).cast("long")
            ).alias("n_flagged"),
            F.sum("score_ppm").alias("sum_score_ppm"),
        )
        .orderBy("source")
    )


# --- q231: priority sampling --------------------------------------------
#
# Duffield–Lund–Thorup priority sampling (JACM 2007, public): draw a
# weight-sensitive sample WITHOUT replacement — priority
# q_i = w_i / u_i with u_i uniform in (0,1], keep the k largest — and
# the k+1-th priority τ gives the UNBIASED subset-sum estimator
# ŵ_i = max(w_i, τ): E[Σ_sample ŵ] = Σ_corpus w, so any filtered
# class's total weight is estimable from the tiny sample. Engine-
# exact: u_i comes from a 24-bit md5 window ((h+1)/2²⁴], so
# q_n = (w · 2²⁴) DIV (h+1) is pure BIGINT (w ≤ 10⁶ chars keeps the
# product < 2⁴⁴), and τ = min over the top-(k+1) multiset — the
# tie-robust form of "the (k+1)-th largest".

_PRI_K = 40
_PRI_H24 = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)"


@query(
    "q231_priority_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             CAST((CAST(n_chars AS BIGINT) * 16777216)
                  // ({_PRI_H24} + 1) AS BIGINT) AS qn
      FROM documents),
    top1 AS (
      SELECT doc_id, w, qn FROM d
      ORDER BY qn DESC, doc_id LIMIT {_PRI_K + 1}),
    tau AS (
      SELECT CASE WHEN count(*) > {_PRI_K} THEN min(qn) ELSE 0 END AS t
      FROM top1),
    s AS (
      SELECT doc_id, w, qn FROM d
      ORDER BY qn DESC, doc_id LIMIT {_PRI_K})
    SELECT doc_id, w, qn,
           CAST(greatest(w, COALESCE((SELECT t FROM tau), 0)) AS BIGINT)
             AS w_hat
    FROM s ORDER BY qn DESC, doc_id
    """,
    tags=("curation", "sampling", "sketch", "parity:priority-sample"),
)
def q231_priority_sample(spark, sf_dir):
    """Weighted sample of 40 docs (weight = n_chars) + the estimator
    column. Plan: ONE narrow map computes (w, qn) at the scan (text
    never read — column pruning keeps the scan to doc_id/n_chars),
    then two TakeOrdereds share it (top-k sample, top-(k+1) for τ)
    and the 1-row τ broadcasts onto the sample. Nothing shuffles;
    driver holds k+1 rows. At 100 TB this is THE way to audit a
    quality-weighted subsample: reproducible (hash-seeded), single
    pass, and Σ max(w, τ) over the sample unbiasedly estimates the
    corpus total weight."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        F.expr(
            "CAST((CAST(n_chars AS BIGINT) * 16777216) DIV"
            " (CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT) + 1) AS BIGINT)"
        ).alias("qn"),
    )
    # τ is the (k+1)-th largest priority; Duffield-Lund-Thorup defines
    # τ = 0 when the corpus has ≤ k rows (the whole population is the
    # sample, so ŵ must degrade to w exactly, not max(w, min-priority)).
    top1 = d.orderBy(F.desc("qn"), "doc_id").limit(_PRI_K + 1)
    tau = top1.agg(
        F.when(F.count(F.lit(1)) > _PRI_K, F.min("qn"))
        .otherwise(F.lit(0))
        .alias("t")
    )
    s = d.orderBy(F.desc("qn"), "doc_id").limit(_PRI_K)
    return (
        s.crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "w",
            "qn",
            F.greatest("w", F.coalesce("t", F.lit(0))).alias("w_hat"),
        )
        .orderBy(F.desc("qn"), "doc_id")
    )
