"""Deduplication queries (north-star ★): exact, MinHash-LSH, SimHash
clusters, embedding cosine near-dup.

The exact-dedup query simulates a double-ingest (two "crawls" of the
same corpus) so the operator's survivor semantics are actually
exercised — the raw documents table has no byte-identical dups.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import oracle_tuple_rank, tuple_rank
from mindseye_dataframes_spark.operators.dedup import (
    dedup_exact,
    jaccard_verified_pairs,
    minhash_signatures,
)
from mindseye_dataframes_spark.queries.curation import (
    SPLIT_LABEL_SQL as _SPLIT_SQL,
    split_label,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

# Four queries (q77/q79/q158/q167) consume the SAME
# LSH→Jaccard-verified pair relation over the documents table, and
# three of them also contract it to components. Re-deriving that
# stage per query made q167 the heaviest query in the suite (VERDICT
# r5 item 5), so the stage is computed once per (session, sf_dir,
# threshold) and shared (q32 keeps its direct pipeline — see its
# bench note): the pair frame is localCheckpoint-ed (it is the
# verified-duplicate set — tiny relative to the corpus; a stored RDD,
# not a CacheManager entry, so the build keeps AQE coalescing and the
# first materialization costs the same as a direct run — persist()
# measured ~40% slower cold), and the cluster frame is the
# star-contraction output, which connected_components_star already
# materializes via localCheckpoint. The cache is keyed weakly by
# session so a torn-down session frees its frames. Round 7 adds the
# cross-SESSION layer underneath: both stages persist as bucketed
# standing tables (sources/bucketing.py:standing_table) keyed by a
# corpus content-fingerprint, so a fresh session warm-starts from the
# warehouse instead of rebuilding (sf1: 26.4 s -> 5.1 s measured
# across processes); a corpus rewrite invalidates by fingerprint.
_PAIR_STAGE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _stage_names(sf_dir: str, threshold: float) -> tuple[str, str, str]:
    """(pairs_base, clusters_base, corpus_fingerprint) for the
    standing-table layer. The base embeds a hash of the corpus PATH
    (two sf_dirs never collide on one warehouse) and the threshold;
    the fingerprint embeds the corpus CONTENT listing (any rewrite
    invalidates)."""
    import hashlib

    from mindseye_dataframes_spark.sources.bucketing import dataset_fingerprint

    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    thr = str(int(round(threshold * 1000)))
    fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))
    return (
        f"msdf_stage_pairs_{loc}_{thr}",
        f"msdf_stage_clusters_{loc}_{thr}",
        fp,
    )


def verified_pairs_cached(spark, sf_dir: str, threshold: float = 0.5):
    """The q32 pair machinery (MinHash → LSH bands → exact-Jaccard
    verify), materialized once per session/sf_dir/threshold AND kept
    as a cross-session standing index: the first session ever pays
    the build and publishes a bucketed managed table keyed by the
    corpus content-fingerprint; every later session (driver round,
    bench run, sweep chunk) warm-starts by reading it — the q154/q187
    standing-index story extended from fingerprints to the whole
    derived pair stage (VERDICT r6 item 7). A corpus rewrite changes
    the fingerprint, drops the stale table, and rebuilds."""
    from mindseye_dataframes_spark.sources.bucketing import standing_table

    per_session = _PAIR_STAGE_CACHE.setdefault(spark, {})
    key = ("pairs", os.path.realpath(sf_dir), threshold)
    if key not in per_session:
        pairs_base, _clusters_base, fp = _stage_names(sf_dir, threshold)

        def build():
            docs = load_table(spark, sf_dir, "documents")
            return jaccard_verified_pairs(
                docs, "text", "doc_id", threshold=threshold
            ).localCheckpoint(eager=False)

        per_session[key] = standing_table(
            spark, pairs_base, fp, build, ["id_a"], 32, ["id_a", "id_b"]
        )
    return per_session[key]


def dup_clusters_cached(spark, sf_dir: str, threshold: float = 0.5):
    """Star-contraction connected components over the cached pairs
    (doc_id → min-id cluster label), shared by q79/q158/q167 — also a
    cross-session standing table (bucketed by doc_id, the key every
    consumer joins/aggregates on), fingerprint-invalidated with the
    pair stage."""
    from mindseye_dataframes_spark.operators.components import (
        connected_components_star,
    )
    from mindseye_dataframes_spark.sources.bucketing import standing_table

    per_session = _PAIR_STAGE_CACHE.setdefault(spark, {})
    key = ("clusters", os.path.realpath(sf_dir), threshold)
    if key not in per_session:
        _pairs_base, clusters_base, fp = _stage_names(sf_dir, threshold)

        def build():
            return connected_components_star(
                verified_pairs_cached(spark, sf_dir, threshold),
                out_node="doc_id",
                out_component="cluster_id",
            )

        per_session[key] = standing_table(
            spark, clusters_base, fp, build, ["doc_id"], 32, ["doc_id"]
        )
    return per_session[key]


@query(
    "q30_exact_dedup",
    oracle="""
    WITH ingest AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
    FROM ingest GROUP BY text
    ORDER BY survivor_id
    """,
    tags=("dedup", "parity:dedup-exact"),
)
def q30_exact_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    second_crawl = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    ingest = docs.unionAll(second_crawl)
    return (
        dedup_exact(ingest, ["text"], "doc_id")
        .select("survivor_id", "n_copies")
        .orderBy("survivor_id")
    )


@query(
    "q31_minhash_signatures",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN list_distinct(list_transform(range(1, len(string_split(text, ' '))-1),
                       i -> concat_ws(' ', string_split(text, ' ')[i], string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
                  ELSE [text] END AS t
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_transform(range(0, 16), i ->
               list_aggregate(list_transform(t, s -> md5(concat(i, ':', s))), 'min')),
             ',') AS sig
    FROM feats
    ORDER BY doc_id
    """,
    tags=("dedup", "parity:minhash"),
)
def q31_minhash_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        minhash_signatures(docs, "text", "doc_id")
        .select("doc_id", F.concat_ws(",", "signature").alias("sig"))
        .orderBy("doc_id")
    )


# The MinHash→LSH-band→exact-Jaccard pair relation in SQL — the ONE
# definition every pair-consuming oracle builds on (q32 reads it
# directly; the closure oracles append edges/reach; q185/q186 append
# split audits). Kept as a CTE-core string so the replay logic exists
# exactly once.
_PAIRS_CORE = """toks AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN list_distinct(list_transform(range(1, len(string_split(text, ' '))-1),
                       i -> concat_ws(' ', string_split(text, ' ')[i], string_split(text, ' ')[i+1], string_split(text, ' ')[i+2])))
                  ELSE [text] END AS t
      FROM documents
    ), sigs AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_aggregate(list_transform(t, s -> md5(concat(i, ':', s))), 'min')) AS sig
      FROM toks
    ), buckets AS (
      SELECT doc_id,
             unnest(list_transform(range(0, 4), j ->
               concat(j, ':', md5(array_to_string(sig[j*4+1 : j*4+4], ','))))) AS band_key
      FROM sigs
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
               / CAST(len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)) AS DOUBLE) AS jaccard
      FROM cands
      JOIN toks ta ON ta.doc_id = id_a
      JOIN toks tb ON tb.doc_id = id_b
      WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
              / CAST(len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)) AS DOUBLE) >= 0.5
    )"""

_Q32_PAIRS_CTE = "\n    WITH " + _PAIRS_CORE


@query(
    "q32_lsh_dup_pairs",
    oracle=_Q32_PAIRS_CTE
    + """
    SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b
    """,
    tags=("dedup", "parity:minhash-lsh"),
    bench=True,
)
def q32_lsh_dup_pairs(spark, sf_dir):
    # deliberately NOT the session-shared cached stage: q32 is the
    # bench-timed query, and a CacheManager-persisted plan loses AQE
    # partition coalescing and rebuilds pathologically after
    # clearCache (measured 1.3 s direct vs 6-7 s via a cleared cache
    # at sf0.1); the cache exists for the CLUSTER consumers
    # (q77/q79/q158/q167) that reuse the stage within a session
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_verified_pairs(
        docs, "text", "doc_id", threshold=0.5
    ).orderBy("id_a", "id_b")


@query(
    "q33_simhash_clusters",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp
      FROM documents
    )
    SELECT bag_fp, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
    FROM fp GROUP BY bag_fp HAVING COUNT(*) > 1
    ORDER BY min_doc
    """,
    tags=("dedup", "parity:fingerprint-clusters"),
)
def q33_simhash_clusters(spark, sf_dir):
    from mindseye_dataframes_spark.functions.textfns import bag_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", bag_fingerprint("text").alias("bag_fp"))
        .groupBy("bag_fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
        .select("bag_fp", "n_docs", "min_doc")
        .orderBy("min_doc")
    )


@query(
    "q34_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 9) AS cos_r
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 9) >= 0.4
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "similarity", "parity:embedding-near-dup"),
)
def q34_embedding_near_dup(spark, sf_dir):
    """Embedding near-duplicate pairs above a cosine threshold —
    EXACT listing, same output as the quadratic oracle, but computed
    by the block-partitioned triangle scheme
    (operators/similarity.py:allpairs_cosine_threshold): hash-sized
    blocks replicated to their block-pairs, one BLAS GEMM per
    block-pair with an ε-margin prefilter, then exact re-verify of
    the ≈output-sized survivor set with the shared ``cosine_ranked``
    fold. NO cartesian/theta-join in the plan (pinned in
    tests/test_plans.py) — the r12 weak mark's fix. The O(n²) FLOP
    floor is inherent to exact θ=0.4 listing (LSH coverage is
    unprovable at that threshold — the fixture has pairs AT 0.4);
    the production near-dup path at high τ stays the bucketed family
    (q32/q36/q60/q163)."""
    from mindseye_dataframes_spark.operators.similarity import (
        allpairs_cosine_threshold,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return allpairs_cosine_threshold(
        emb, "vec_id", "embedding", 0.4
    ).select(
        F.col("id_a"), F.col("id_b"), F.col("cos_r")
    ).orderBy("id_a", "id_b")


# Shared by q77 (naive label propagation) and q79 (star contraction):
# both must produce the identical transitive-closure clustering, so
# they share one recursive-CTE reachability oracle.
_CLOSURE_CTES = (
    "\n    WITH RECURSIVE "
    + _PAIRS_CORE
    + """, edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(s, d) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges)
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )"""
)

_CLOSURE_SELECT = """
    SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s ORDER BY doc_id
    """

_CLOSURE_ORACLE = _CLOSURE_CTES + _CLOSURE_SELECT


@query(
    "q77_dup_clusters",
    oracle=_CLOSURE_ORACLE,
    tags=("dedup", "iterative", "parity:connected-components"),
)
def q77_dup_clusters(spark, sf_dir):
    """Transitive-closure dedup clusters: every doc in a verified
    near-dup pair (same pairs as q32) labeled with the min doc id of
    its connected component — the unit curation actually deletes by.
    Spark side is iterative min-label propagation
    (`operators/components.py`); oracle is a recursive-CTE reachability
    closure over the identical pair relation."""
    from mindseye_dataframes_spark.operators.components import connected_components

    pairs = verified_pairs_cached(spark, sf_dir, 0.5)
    return (
        connected_components(
            pairs, out_node="doc_id", out_component="cluster_id"
        ).orderBy("doc_id")
    )


@query(
    "q79_dup_clusters_star",
    oracle=_CLOSURE_ORACLE,
    tags=("dedup", "iterative", "parity:connected-components-star"),
)
def q79_dup_clusters_star(spark, sf_dir):
    """Same transitive-closure clustering as q77, computed with
    large-star/small-star contraction (Kiveris et al., SoCC'14,
    `operators/components.py:connected_components_star`) — the
    O(log n)-round scale path whose round count is independent of
    graph diameter. Both queries share one reachability oracle, so the
    driver verifies the two algorithms agree with SQL and with each
    other."""
    return dup_clusters_cached(spark, sf_dir, 0.5).orderBy("doc_id")


_SURV_RANK = oracle_tuple_rank("n_chars", "doc_id")


@query(
    "q115_dedup_survivorship",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang, source, n_chars,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
      FROM documents)
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_members,
           arg_max(doc_id, {_SURV_RANK}) AS survivor_id,
           min(doc_id) AS first_seen_id,
           max(n_chars) AS survivor_chars,
           arg_max(lang, {_SURV_RANK}) AS survivor_lang,
           arg_max(source, {_SURV_RANK}) AS survivor_source
    FROM f GROUP BY fp HAVING count(*) > 1
    ORDER BY fp
    """,
    tags=("dedup", "survivorship", "north-star"),
)
def q115_dedup_survivorship(spark, sf_dir):
    """Survivorship: after clustering duplicates (here: order-
    insensitive bag fingerprint, catching token-shuffled copies), pick
    the canonical record per cluster with explicit field-level rules —
    longest document wins (padded-string tuple rank, collision-free
    for ANY int64 doc_id — no scale ceiling; ties to higher doc_id),
    provenance keeps the earliest id. One hash-aggregate over the
    fingerprint; the same ``max_by`` rank drives every survivor field
    so the chosen record is consistent across columns."""
    from mindseye_dataframes_spark.functions.textfns import bag_fingerprint

    rank = tuple_rank("n_chars", "doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("fp", bag_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(F.col("doc_id"), rank).alias("survivor_id"),
            F.min("doc_id").alias("first_seen_id"),
            F.max("n_chars").alias("survivor_chars"),
            F.max_by(F.col("lang"), rank).alias("survivor_lang"),
            F.max_by(F.col("source"), rank).alias("survivor_source"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("fp")
    )


@query(
    "q150_cross_source_dup_matrix",
    oracle="""
    WITH d AS (SELECT DISTINCT md5(text) AS digest, source FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM d a JOIN d b ON b.digest = a.digest AND a.source < b.source
    GROUP BY a.source, b.source ORDER BY source_a, source_b
    """,
    tags=("dedup", "cross-source", "north-star"),
)
def q150_cross_source_dup_matrix(spark, sf_dir):
    """Cross-source exact-duplicate overlap matrix: for every source
    pair, how many distinct texts appear in both — the "how much of
    corpus B is already in corpus A" question that decides dedup
    order in a training-data mix. Texts reduce to (digest, source)
    pairs first (one hash-agg over the raw corpus — the only pass at
    100 TB); the pair join is keyed on digest with fan-out bounded
    by the number of sources a text appears in (≤ |sources|, never
    corpus-quadratic). md5 is the portable digest (xxhash64 is
    engine-specific)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(F.col("text").cast("binary")).alias("digest"), "source")
        .distinct()
    )
    a = d.select("digest", F.col("source").alias("source_a"))
    b = d.select("digest", F.col("source").alias("source_b"))
    return (
        a.join(b, "digest")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("source_a", "source_b")
    )


# The standing corpus vs the new increment: docs below the split are
# "already ingested", docs at/above it are "today's batch".
_INCR_SPLIT = 800


@query(
    "q154_incremental_corpus_dedup",
    oracle=f"""
    WITH standing AS (
      SELECT DISTINCT md5(text) AS digest FROM documents
      WHERE doc_id < {_INCR_SPLIT}),
    incr AS (
      SELECT doc_id, source, md5(text) AS digest FROM documents
      WHERE doc_id >= {_INCR_SPLIT})
    SELECT i.source,
           CAST(count(*) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN s.digest IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dup_vs_standing,
           CAST(count(DISTINCT i.digest) AS BIGINT) AS n_distinct_texts
    FROM incr i LEFT JOIN standing s ON s.digest = i.digest
    GROUP BY i.source ORDER BY i.source
    """,
    tags=("dedup", "incremental", "north-star"),
)
def q154_incremental_corpus_dedup(spark, sf_dir):
    """Incremental ingest dedup — the nightly-batch question: of the
    new documents, how many are exact duplicates of the standing
    corpus, per source? The standing side reduces to distinct digests
    (one hash-agg, and the ONLY thing the 100 TB history contributes
    — at scale this digest set is the persisted dedup index, not a
    rescan); the increment left-joins it on digest, so cost scales
    with the increment, not the corpus. Portable md5 digests keep
    the persisted index engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    standing = (
        docs.filter(F.col("doc_id") < _INCR_SPLIT)
        .select(F.md5(F.col("text").cast("binary")).alias("s_digest"))
        .distinct()
    )
    incr = docs.filter(F.col("doc_id") >= _INCR_SPLIT).select(
        "source", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    return (
        incr.join(standing, F.col("digest") == F.col("s_digest"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(
                F.when(F.col("s_digest").isNull(), 0).otherwise(1)
            ).alias("n_dup_vs_standing"),
            F.countDistinct("digest").alias("n_distinct_texts"),
        )
        .orderBy("source")
    )


@query(
    "q158_dedup_pipeline_end_to_end",
    oracle=_CLOSURE_CTES
    + f"""
    , clusters AS (
      SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s)
    SELECT c.cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           arg_max(d.doc_id, {oracle_tuple_rank("d.n_chars", "d.doc_id")})
             AS survivor_doc,
           CAST(sum(d.n_chars) - max(d.n_chars) AS BIGINT) AS chars_dropped
    FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY c.cluster_id
    ORDER BY c.cluster_id
    """,
    tags=("dedup", "pipeline", "north-star"),
)
def q158_dedup_pipeline_end_to_end(spark, sf_dir):
    """The WHOLE near-dup curation pipeline as one declared query:
    MinHash/LSH candidates → exact-Jaccard verify (q32 machinery) →
    star-contraction connected components (q79) → survivor election
    per cluster (q115's padded-rank, longest text wins, ties to the
    higher id) → per-cluster audit row (members, survivor, chars
    dropped). Every stage is the proven scale shape (band equi-join,
    O(log n) contraction rounds, one closing hash-agg), so the
    composition IS the production job — and the oracle replays all
    four stages in SQL (recursive-CTE closure + arg_max), verifying
    the end-to-end composition, not just the parts. The pair/cluster
    stage is the session-shared cache (one LSH→verify→contract per
    sf_dir, reused by q32/q77/q79/q167)."""
    docs = load_table(spark, sf_dir, "documents")
    clusters = dup_clusters_cached(spark, sf_dir, 0.5)
    rank = tuple_rank("n_chars", "doc_id")
    return (
        clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by("doc_id", rank).alias("survivor_doc"),
            (F.sum("n_chars") - F.max("n_chars")).alias("chars_dropped"),
        )
        .orderBy("cluster_id")
    )


@query(
    "q167_net_token_accounting",
    oracle=_CLOSURE_CTES
    + """
    , clus AS (
      SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s),
    tk AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      FROM documents)
    SELECT tk.source AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c.cluster_id IS NOT NULL
                          AND c.cluster_id <> tk.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes,
           CAST(sum(CASE WHEN c.cluster_id IS NULL
                          OR c.cluster_id = tk.doc_id
                         THEN ntok ELSE 0 END) AS BIGINT) AS net_tokens,
           CAST(sum(CASE WHEN c.cluster_id IS NULL
                          OR c.cluster_id = tk.doc_id
                         THEN ntok ELSE 0 END) * 1000000
                // sum(ntok) AS BIGINT) AS net_ppm
    FROM tk LEFT JOIN clus c USING (doc_id)
    GROUP BY tk.source ORDER BY tk.source
    """,
    tags=("dedup", "curation", "mixture", "north-star"),
)
def q167_net_token_accounting(spark, sf_dir):
    """Dedup-adjusted token supply per source — the number q160's
    mixture planner should actually budget against: near-dup clusters
    (q77's LSH → Jaccard-verify → connected-components machinery)
    keep only their min-id representative, and each source is credited
    only the tokens of the docs it SURVIVES with. A source whose
    net_ppm is far below 1e6 is mostly recycled content; feeding its
    raw token count into the mixture over-weights it.

    Scale shape: the pair/cluster machinery is the proven q77 path
    (band equi-join candidates, O(log n) contraction) computed ONCE
    per session via the shared cache above — this query previously
    rebuilt it from scratch and was the suite's heaviest; the
    accounting is one broadcast-size join (cluster labels exist only
    for docs in ≥1 near-dup pair — a small fraction of the corpus)
    and one per-source hash-aggregate with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    clus = dup_clusters_cached(spark, sf_dir, 0.5)
    tk = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("ntok")
    )
    survives = F.col("cluster_id").isNull() | (
        F.col("cluster_id") == F.col("doc_id")
    )
    return (
        tk.join(clus, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("cluster_id").isNotNull()
                    & (F.col("cluster_id") != F.col("doc_id")),
                    1,
                ).otherwise(0)
            ).alias("n_dupes"),
            F.sum(F.when(survives, F.col("ntok")).otherwise(0)).alias("net_tokens"),
        )
        .withColumn(
            "net_ppm", F.expr("net_tokens * 1000000 DIV n_tokens")
        )
        .orderBy("source")
    )


_SPAN_K = 8  # window length in tokens


@query(
    "q170_shared_span_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= {_SPAN_K}),
    w AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')) AS g
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-{_SPAN_K - 1}))
                       AS i)),
    sg AS (
      SELECT g FROM (
        SELECT g, count(DISTINCT doc_id) AS nd FROM w GROUP BY g)
      WHERE nd >= 2),
    sp AS (SELECT w.doc_id, w.pos FROM w JOIN sg USING (g)),
    runs AS (
      SELECT doc_id,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM sp),
    r AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
      FROM runs GROUP BY doc_id, grp),
    base AS (
      SELECT doc_id, CAST(len(toks) - {_SPAN_K - 1} AS BIGINT) AS n_windows
      FROM t)
    SELECT b.doc_id AS doc_id, b.n_windows,
           CAST(sum(r.run_len) AS BIGINT) AS n_shared,
           CAST(max(r.run_len) AS BIGINT) AS longest_run
    FROM base b JOIN r ON r.doc_id = b.doc_id
    GROUP BY b.doc_id, b.n_windows
    ORDER BY doc_id
    """,
    tags=("dedup", "substring", "north-star"),
)
def q170_shared_span_stats(spark, sf_dir):
    """Exact substring-duplication audit (the detection pass of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499): for every document, how many of
    its {K}-token windows also occur verbatim in ANOTHER document, and
    the longest consecutive run of such windows — the span a
    substring-level dedup would trim. Cross-doc only (a phrase
    repeated inside one doc is q117's repetition signal, not
    contamination).

    Scale shape: windows reduce to md5 fingerprints at the scan (the
    shuffle moves 32-hex keys, never the text); shared grams are one
    hash-aggregate (count distinct docs ≥ 2); membership is an
    equi-join on the fingerprint; and the longest-run islands
    computation (pos − row_number) is one window over each doc's
    shared positions. No pass is quadratic in docs or corpus — the
    suffix-array of the original paper is replaced by the
    fingerprint-join shape Spark executes well."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.filter(F.size(toks) >= _SPAN_K).select(
        "doc_id", toks.alias("toks")
    )
    w = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SPAN_K - 1}),"
                f" i -> struct(i AS pos,"
                f" md5(concat_ws(' ', slice(toks, i, {_SPAN_K}))) AS g))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    sg = (
        w.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    sp = w.join(sg, "g").select("doc_id", "pos")
    win = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        sp.withColumn("grp", F.col("pos") - F.row_number().over(win))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    base = t.select(
        "doc_id", (F.size("toks") - (_SPAN_K - 1)).cast("long").alias("n_windows")
    )
    return (
        base.join(runs, "doc_id")
        .groupBy("doc_id", "n_windows")
        .agg(
            F.sum("run_len").alias("n_shared"),
            F.max("run_len").alias("longest_run"),
        )
        .orderBy("doc_id")
    )


_NOVELTY_BATCH = 100  # docs per ingest batch (doc_id is ingest order)


@query(
    "q175_ingest_novelty",
    oracle=f"""
    WITH f AS (
      SELECT doc_id // {_NOVELTY_BATCH} AS batch,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
      FROM documents),
    fb AS (SELECT fp, CAST(min(batch) AS BIGINT) AS first_batch
           FROM f GROUP BY fp)
    SELECT CAST(f.batch AS BIGINT) AS batch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT f.fp) AS BIGINT) AS n_distinct,
           CAST(count(DISTINCT CASE WHEN fb.first_batch = f.batch
                                    THEN f.fp END) AS BIGINT) AS n_novel,
           CAST(count(DISTINCT CASE WHEN fb.first_batch = f.batch
                                    THEN f.fp END) * 1000000
                // count(DISTINCT f.fp) AS BIGINT) AS novelty_ppm
    FROM f JOIN fb ON fb.fp = f.fp
    GROUP BY f.batch ORDER BY batch
    """,
    tags=("dedup", "incremental", "north-star"),
)
def q175_ingest_novelty(spark, sf_dir):
    """Crawl-health novelty curve: per ingest batch (doc_id is ingest
    order), what fraction of its distinct content fingerprints was
    never seen in ANY earlier batch? A crawler whose novelty_ppm
    decays toward zero is re-fetching the same content — the signal
    that decides when to stop paying for a source. Fingerprints are
    the order-insensitive bag digest (q115), so shuffled near-copies
    count as stale, not novel.

    Scale shape: one fingerprint map (row-local), ONE corpus scan —
    first-seen is a min-over-fp window, so the plan is scan → exchange
    on fp → window → per-batch count-distinct roll-up (an
    aggregate-and-join-back form scans and re-fingerprints the corpus
    twice). At 100 TB the (fp → min batch) relation is the persisted
    first-seen index q154 maintains incrementally, so the nightly form
    joins only the new batch against the index instead of
    rescanning."""
    from mindseye_dataframes_spark.functions.textfns import bag_fingerprint

    f = load_table(spark, sf_dir, "documents").select(
        # DIV, not /: the double path loses integer precision past 2^53
        F.expr(f"doc_id DIV {_NOVELTY_BATCH}").alias("batch"),
        bag_fingerprint(F.col("text")).alias("fp"),
    )
    first = f.withColumn(
        "first_batch", F.min("batch").over(Window.partitionBy("fp"))
    )
    novel = F.when(F.col("first_batch") == F.col("batch"), F.col("fp"))
    return (
        first.groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
            F.countDistinct(novel).alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm", F.expr("n_novel * 1000000 DIV n_distinct")
        )
        .select("batch", "n_docs", "n_distinct", "n_novel", "novelty_ppm")
        .orderBy("batch")
    )





@query(
    "q185_split_leakage_audit",
    oracle=_Q32_PAIRS_CTE
    + f""",
    p AS (
      SELECT {_SPLIT_SQL.format(id='id_a')} AS s_a,
             {_SPLIT_SQL.format(id='id_b')} AS s_b,
             id_a, id_b
      FROM pairs)
    SELECT COUNT(*) AS total_pairs,
           CAST(COALESCE(SUM(CASE WHEN s_a <> s_b THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS cross_pairs,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(CASE WHEN s_a <> s_b THEN 1 ELSE 0 END)
                     * 1000000 // COUNT(*) END AS BIGINT) AS leak_ppm,
           CAST(COUNT(DISTINCT CASE WHEN s_a <> s_b THEN
                  CASE WHEN s_a = 'test' THEN id_a ELSE id_b END END)
                AS BIGINT) AS n_leaked_test_docs
    FROM p
    """,
    tags=("dedup", "curation", "parity:split-leakage"),
)
def q185_split_leakage_audit(spark, sf_dir):
    """Eval-contamination audit for a train/test split: how many
    verified near-duplicate pairs CROSS the split boundary — the
    leakage that silently inflates eval scores when test documents
    have near-dups in train (the reason dedup must precede splitting,
    Lee et al. 2022 §6). The split is the deterministic md5-bucket
    rule (``split_label``/``SPLIT_TEST_BUCKETS``, the ONE shared
    definition whose SQL twin formats both oracles), so
    membership is a PURE FUNCTION of doc_id — the audit computes both
    sides' labels inline on the pair relation and touches neither the
    corpus nor a split table: zero joins, zero extra shuffles, one
    global aggregate over the (already tiny) verified-pair frame,
    which is the session-shared q32 stage (verified_pairs_cached) the
    q77/q158/q167 family reuses. Output: total/crossing pair counts,
    the crossing rate in exact integer ppm, and the number of test
    docs that must be evicted (distinct test-side members of crossing
    pairs)."""
    from mindseye_dataframes_spark.queries.curation import split_label

    pairs = verified_pairs_cached(spark, sf_dir, threshold=0.5)
    p = pairs.select(
        "id_a",
        "id_b",
        split_label("id_a").alias("s_a"),
        split_label("id_b").alias("s_b"),
    )
    cross = F.col("s_a") != F.col("s_b")
    return p.agg(
        F.count(F.lit(1)).alias("total_pairs"),
        F.coalesce(F.sum(cross.cast("long")), F.lit(0)).alias("cross_pairs"),
        F.coalesce(
            F.expr(
                "CASE WHEN count(1) = 0 THEN 0 ELSE "
                "sum(CASE WHEN s_a <> s_b THEN 1 ELSE 0 END) * 1000000 "
                "DIV count(1) END"
            ),
            F.lit(0),
        ).alias("leak_ppm"),
        F.countDistinct(
            F.when(cross, F.when(F.col("s_a") == "test", F.col("id_a")).otherwise(F.col("id_b")))
        ).alias("n_leaked_test_docs"),
    )


@query(
    "q186_leakage_eviction",
    oracle=_CLOSURE_CTES
    + f""",
    clus AS (SELECT s AS doc_id, MIN(d) AS cluster_id FROM reach GROUP BY s),
    cl AS (SELECT doc_id, cluster_id,
                  {_SPLIT_SQL.format(id='doc_id')} AS s FROM clus),
    tainted AS (
      SELECT cluster_id,
             MAX(CASE WHEN s = 'train' THEN 1 ELSE 0 END) AS has_train
      FROM cl GROUP BY cluster_id),
    evicted AS (
      SELECT cl.doc_id FROM cl JOIN tainted USING (cluster_id)
      WHERE tainted.has_train = 1 AND cl.s = 'test'),
    base AS (
      SELECT doc_id, {_SPLIT_SQL.format(id='doc_id')} AS s FROM documents),
    fp AS (
      SELECT CASE WHEN id_a IN (SELECT doc_id FROM evicted)
                  THEN 'train' ELSE {_SPLIT_SQL.format(id='id_a')} END AS f_a,
             CASE WHEN id_b IN (SELECT doc_id FROM evicted)
                  THEN 'train' ELSE {_SPLIT_SQL.format(id='id_b')} END AS f_b
      FROM pairs)
    SELECT (SELECT COUNT(*) FROM base) AS n_docs,
           (SELECT CAST(COALESCE(SUM(CASE WHEN s = 'test' THEN 1 ELSE 0 END), 0)
                   AS BIGINT) FROM base) AS test_before,
           (SELECT COUNT(*) FROM evicted) AS n_evicted,
           (SELECT CAST(COALESCE(SUM(CASE WHEN s = 'test' THEN 1 ELSE 0 END), 0)
                   AS BIGINT) FROM base)
             - (SELECT COUNT(*) FROM evicted) AS test_after,
           (SELECT CAST(COALESCE(SUM(CASE WHEN f_a <> f_b THEN 1 ELSE 0 END), 0)
                   AS BIGINT) FROM fp) AS residual_cross_pairs
    """,
    tags=("dedup", "curation", "parity:leakage-eviction"),
)
def q186_leakage_eviction(spark, sf_dir):
    """Resolve the leakage q185 measures: evict from 'test' every doc
    whose dup CLUSTER also touches 'train' (cluster-level eviction —
    evicting only the directly-paired docs can CREATE new crossings
    between a surviving test doc and its re-assigned former test
    neighbor; whole-cluster eviction makes residual leakage zero by
    construction, and the query PROVES it by recomputing the crossing
    count under the final assignment — the driver hashes the zero).

    Scale shape: split labels are pure md5 functions of doc_id (zero
    joins to the corpus); the cluster frame is the session-shared
    star-contraction output (O(docs-in-pairs) rows); taint is one
    keys-only aggregate over it; the residual audit is a narrow map
    over the pair frame against the BROADCAST evicted set. Nothing
    here touches document text at all."""
    lab = split_label
    clusters = dup_clusters_cached(spark, sf_dir, 0.5)
    cl = clusters.withColumn("s", lab("doc_id"))
    tainted = cl.groupBy("cluster_id").agg(
        F.max((F.col("s") == "train").cast("int")).alias("has_train")
    )
    evicted = (
        cl.join(tainted, "cluster_id")
        .filter((F.col("has_train") == 1) & (F.col("s") == "test"))
        .select("doc_id")
    )
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", lab("doc_id").alias("s")
    )
    counts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum((F.col("s") == "test").cast("long")), F.lit(0)
        ).alias("test_before"),
    )
    n_evicted = evicted.agg(F.count(F.lit(1)).alias("n_evicted"))
    pairs = verified_pairs_cached(spark, sf_dir, 0.5)
    ev_a = evicted.select(F.col("doc_id").alias("id_a")).withColumn(
        "ev_a", F.lit(1)
    )
    ev_b = evicted.select(F.col("doc_id").alias("id_b")).withColumn(
        "ev_b", F.lit(1)
    )
    fp = (
        pairs.join(F.broadcast(ev_a), "id_a", "left")
        .join(F.broadcast(ev_b), "id_b", "left")
        .select(
            F.when(F.col("ev_a") == 1, F.lit("train"))
            .otherwise(lab("id_a"))
            .alias("f_a"),
            F.when(F.col("ev_b") == 1, F.lit("train"))
            .otherwise(lab("id_b"))
            .alias("f_b"),
        )
    )
    residual = fp.agg(
        F.coalesce(
            F.sum((F.col("f_a") != F.col("f_b")).cast("long")), F.lit(0)
        ).alias("residual_cross_pairs")
    )
    return (
        counts.crossJoin(F.broadcast(n_evicted))
        .crossJoin(F.broadcast(residual))
        .select(
            "n_docs",
            "test_before",
            "n_evicted",
            (F.col("test_before") - F.col("n_evicted")).alias("test_after"),
            "residual_cross_pairs",
        )
    )


@query(
    "q207_substring_dedup_rewrite",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= {_SPAN_K}),
    w AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i+{_SPAN_K - 1}], ' ')) AS g
      FROM e, LATERAL (SELECT unnest(generate_series(1, len(toks)-{_SPAN_K - 1}))
                       AS i)),
    own AS (
      SELECT g, CAST(min(doc_id) AS BIGINT) AS own_doc
      FROM w GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    cov AS (
      SELECT DISTINCT w.doc_id, tp
      FROM w JOIN own USING (g),
           LATERAL (SELECT unnest(generate_series(w.pos, w.pos + {_SPAN_K - 1}))
                    AS tp)
      WHERE w.doc_id <> own.own_doc),
    rm AS (
      SELECT doc_id, list(tp) AS rms, CAST(count(*) AS BIGINT) AS n_removed
      FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tok,
           COALESCE(rm.n_removed, 0) AS n_removed,
           md5(COALESCE(array_to_string(
             list_filter(
               list_transform(generate_series(1, len(toks)),
                 i -> CASE WHEN rm.rms IS NOT NULL
                            AND list_contains(rm.rms, i)
                           THEN NULL ELSE toks[i] END),
               x -> x IS NOT NULL), ' '), '')) AS new_md5
    FROM t LEFT JOIN rm USING (doc_id)
    ORDER BY t.doc_id
    """,
    tags=("dedup", "substring", "rewrite", "north-star"),
)
def q207_substring_dedup_rewrite(spark, sf_dir):
    """CROSS-DOCUMENT SUBSTRING REMOVAL — the rewrite pass that
    completes Lee et al. 2022 (arXiv:2107.06499) in this engine: q170
    DETECTS the verbatim shared spans; this query REMOVES them,
    keeping one canonical occurrence corpus-wide. Policy (total and
    deterministic): every shared {K}-token window names the smallest
    doc_id containing its gram as owner; a token is dropped iff some
    shared window covering it sits in a NON-owner document. Owners
    keep their text verbatim; every other copy of a duplicated span
    is trimmed. Output per document: token count, tokens removed, and
    the md5 of the reassembled text — so the driver hashes the full
    rewrite, not a summary.

    Scale shape (the q170 discipline end-to-end): windows reduce to
    md5 fingerprints at the scan — the only exchanges move 32-hex
    keys and (doc, position) ints, never text; ownership is one
    gram-keyed aggregate; coverage explodes at most K ints per
    FOREIGN-shared window (∝ duplicated content, not corpus);
    removal sets group per doc, bounded by document length; the
    rewrite itself is a doc-local array filter over the original
    token array — text moves exactly once, scan → rewrite, like
    q180/q191. The in-filter membership test is O(|removed|) per
    token; past ~10⁵ removed positions per doc, switch the rewrite to
    the posexplode ∖ anti-join + array_sort(collect_list) form — at
    {K}=8 a document that duplicated that much is dropped by the
    doc-level dedup long before span surgery matters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select("doc_id", toks.alias("toks"))
    e = t.filter(F.size("toks") >= _SPAN_K)
    w = e.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SPAN_K - 1}),"
                f" i -> struct(i AS pos,"
                f" md5(concat_ws(' ', slice(toks, i, {_SPAN_K}))) AS g))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    own = (
        w.groupBy("g")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("own_doc"),
        )
        .filter(F.col("nd") >= 2)
        .select("g", "own_doc")
    )
    cov = (
        w.join(own, "g")
        .filter(F.col("doc_id") != F.col("own_doc"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(_SPAN_K - 1))
            ).alias("tp"),
        )
        .distinct()
    )
    rm = cov.groupBy("doc_id").agg(F.collect_set("tp").alias("rms"))
    rms = F.coalesce(F.col("rms"), F.expr("CAST(array() AS array<int>)"))
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.array_contains(rms, i + F.lit(1)),
    )
    return (
        t.join(rm, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tok"),
            F.size(rms).cast("long").alias("n_removed"),
            F.md5(F.concat_ws(" ", kept)).alias("new_md5"),
        )
        .orderBy("doc_id")
    )


# --- q226: LSH dedup quality eval ----------------------------------------
#
# Measures the MinHash-LSH banding approximation (q32's candidate
# generator) against EXACT ground truth — the dedup-side analogue of
# q162 (PQ recall), q221 (Matryoshka recall) and q222 (retrieval
# eval). Ground truth = all pairs with shingle-Jaccard ≥ 0.5,
# enumerated exactly via a df-capped inverted index on the SAME
# 3-word shingles (every candidate pair must share a shingle; the
# df ≤ 50 cap is the documented scale knob, shared verbatim with the
# oracle so both engines see the identical relation — the q80
# blocking pattern). recall_ppm = how many true pairs the 4×4 banding
# surfaces; cand_precision_ppm = what fraction of surfaced candidates
# survive exact verification (the verify-join's cost efficiency).

_LSH_EVAL_TAU = 0.5
_LSH_EVAL_MAXDF = 50


@query(
    "q226_lsh_dedup_eval",
    oracle=_Q32_PAIRS_CTE
    + f""",
    gr AS (SELECT doc_id, unnest(t) AS g FROM toks),
    gdf AS (SELECT g FROM gr GROUP BY g HAVING count(*) <= {_LSH_EVAL_MAXDF}),
    rg AS (SELECT gr.doc_id, gr.g FROM gr JOIN gdf USING (g)),
    tcand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rg a JOIN rg b USING (g) WHERE a.doc_id < b.doc_id),
    truth AS (
      SELECT id_a, id_b FROM tcand
      JOIN toks ta ON ta.doc_id = id_a
      JOIN toks tb ON tb.doc_id = id_b
      WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE)
              / CAST(len(ta.t) + len(tb.t)
                     - len(list_intersect(ta.t, tb.t)) AS DOUBLE)
            >= {_LSH_EVAL_TAU}),
    det AS (
      SELECT t.id_a FROM truth t
      JOIN pairs p ON p.id_a = t.id_a AND p.id_b = t.id_b),
    m AS (SELECT
      (SELECT count(*) FROM truth) AS n_true,
      (SELECT count(*) FROM cands) AS n_cand,
      (SELECT count(*) FROM pairs) AS n_verified,
      (SELECT count(*) FROM det) AS n_detected)
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_verified AS BIGINT) AS n_verified,
           CAST(n_detected AS BIGINT) AS n_detected,
           CAST(CASE WHEN n_true = 0 THEN 1000000
                     ELSE (n_detected * 1000000) // n_true END AS BIGINT)
             AS recall_ppm,
           CAST(CASE WHEN n_cand = 0 THEN 0
                     ELSE (n_verified * 1000000) // n_cand END AS BIGINT)
             AS cand_precision_ppm
    FROM m
    """,
    tags=("dedup", "eval", "parity:lsh-eval"),
)
def q226_lsh_dedup_eval(spark, sf_dir):
    """One-row LSH-vs-exact dedup scorecard. Plan shape: the shingle
    UDF pass runs once (persisted base), the LSH side is the standard
    band-bucket self-join, the truth side a df-capped shingle
    inverted-index self-join (per-shingle fan-out ≤ df² ≤ 2500 —
    never all-pairs) whose posting join now folds straight into the
    per-pair shared-rare-shingle COUNT, and BOTH verify paths run the
    q80 decomposition (``inter = inter_rare + |common_a ∩ common_b|``
    over sparse dictionary indices, ``_pair_parts_from_feats``) — no
    shingle string arrays ever travel with a pair (VERDICT r13 item
    2; the strings measured ~2-3 s of the 4.2 s sf0.1 cost). LSH
    candidates that share no rare shingle take inter_rare = 0 from
    the left join — exact, since every shingle is rare xor common.
    All metric arithmetic is BIGINT ppm."""
    from pyspark.storagelevel import StorageLevel

    from mindseye_dataframes_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_K,
        _candidate_pairs,
        _inter_common_udf,
        _pair_parts_from_feats,
        doc_features,
    )
    from mindseye_dataframes_spark.plans.parallelism import (
        spread_for_compute,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = doc_features(docs, "text", "doc_id")
    pair_rare, sizes, n_common = _pair_parts_from_feats(
        base.select("doc_id", F.col("feats").alias("grams")),
        "doc_id",
        _LSH_EVAL_MAXDF,
    )
    # q226 consumes pair_rare twice (truth verify + LSH-candidate
    # left join) and sizes four times (both pair sides of both
    # verifies) — pin both; q80/q213 consume pair_rare once and sizes
    # twice, where a persist barrier measured as a variance source,
    # so the helper leaves persisting to callers
    pair_rare = pair_rare.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sizes.persist(StorageLevel.MEMORY_AND_DISK)
    sa = sizes.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_grams").alias("n_a"),
        F.col("cbm").alias("cbm_a"),
        F.col("ctail").alias("ctail_a"),
    )
    sb = sizes.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_grams").alias("n_b"),
        F.col("cbm").alias("cbm_b"),
        F.col("ctail").alias("ctail_b"),
    )
    inter = F.coalesce(F.col("inter_rare"), F.lit(0)) + _inter_common_udf(
        n_common
    )("cbm_a", "ctail_a", "cbm_b", "ctail_b")
    jac = inter.cast("double") / (
        F.col("n_a") + F.col("n_b") - inter
    ).cast("double")

    def verified(pairs):
        # the pair relation is byte-small but each row does
        # O(width + |tail|) intersect work — same post-join
        # AQE-coalescing guard as the q80/q213 verifies
        return (
            spread_for_compute(
                pairs.join(sa, "id_a").join(sb, "id_b"), "id_a", "id_b"
            )
            .filter(jac >= _LSH_EVAL_TAU)
            .select("id_a", "id_b")
        )

    # cand feeds the verify AND the n_cand count; ver feeds the
    # semi-join AND the n_verified count — unpersisted, each consumer
    # re-ran the band self-join / verify joins from the cached base
    # (the truth side was already pinned; these two weren't)
    cand = _candidate_pairs(base, "doc_id", LSH_BANDS, MINHASH_K).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ver = verified(
        cand.join(pair_rare, ["id_a", "id_b"], "left")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # truth candidates ARE pair_rare's keys (pairs sharing ≥1 rare
    # shingle), inter_rare riding along — the old separate
    # posting-join + distinct is gone
    truth = verified(pair_rare).persist(StorageLevel.MEMORY_AND_DISK)
    det = truth.join(ver, ["id_a", "id_b"], "left_semi")
    row = (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(ver.agg(F.count(F.lit(1)).alias("n_verified")))
        .crossJoin(det.agg(F.count(F.lit(1)).alias("n_detected")))
    )
    return row.select(
        "n_true",
        "n_cand",
        "n_verified",
        "n_detected",
        F.expr(
            "CASE WHEN n_true = 0 THEN CAST(1000000 AS BIGINT)"
            " ELSE (n_detected * 1000000) DIV n_true END"
        ).alias("recall_ppm"),
        F.expr(
            "CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (n_verified * 1000000) DIV n_cand END"
        ).alias("cand_precision_ppm"),
    )
