"""Text-analysis queries over the documents table (north-star ★).

Tokenization, quality metrics, and fingerprints are shared with the
operators in ``functions/textfns.py``; oracle SQL reproduces the same
math (single-space split, md5, exact integer-ratio divisions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dec
from mindseye_dataframes_spark.functions.textfns import (
    lang_id,
    lang_id_sql,
    STOPWORDS,
    bag_fingerprint,
    distinct_tokens,
    simhash16_sql,
    tokens,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q26_text_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, text,
             string_split(text, ' ') AS toks
      FROM documents
    )
    SELECT doc_id, lang, source,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_word_len,
           CAST(len(list_filter(toks, x -> x IN ({_SW}))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stopword_ratio
    FROM t
    ORDER BY doc_id
    """,
    tags=("text", "parity:text-stats"),
    bench=True,
)
def q26_text_stats(spark, sf_dir):
    from mindseye_dataframes_spark.plans.parallelism import ensure_min_parallelism

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens("text")
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(distinct_tokens("text")).alias("n_distinct"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / n_tokens.cast("double")
        ).alias("avg_word_len"),
        (stop_hits.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    ).orderBy("doc_id")


@query(
    "q27_quality_by_lang",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT lang,
             CAST(len(list_filter(toks, x -> x IN ({_SW}))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
               * 0.5
             + CASE WHEN len(toks) >= 30 THEN 0.5 ELSE CAST(len(toks) AS DOUBLE) / 60.0 END
               AS quality
      FROM t
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
    FROM scored GROUP BY lang ORDER BY lang
    """,
    tags=("text", "parity:text-quality"),
)
def q27_quality_by_lang(spark, sf_dir):
    """Heuristic document quality score (stopword ratio + length
    saturation), averaged per language with exact-decimal accumulation
    so group means are engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double") / n
    length_score = F.when(F.size(toks) >= 30, F.lit(0.5)).otherwise(n / F.lit(60.0))
    quality = stop_ratio * F.lit(0.5) + length_score
    return (
        docs.select("lang", quality.alias("quality"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(dec("quality", 9)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@query(
    "q28_token_frequency",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("text", "parity:token-frequency"),
)
def q28_token_frequency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "q29_simhash_fingerprints",
    oracle=f"""
    SELECT doc_id,
           {simhash16_sql('text')} AS simhash,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "dedup", "parity:simhash,fingerprint"),
)
def q29_simhash_fingerprints(spark, sf_dir):
    # Arrow-batched fingerprint twin (band 0 of py_simhash_bands is
    # bit-identical to the simhash16 fold — test-pinned): the
    # interpreted 16-fold HOF expression re-walks the token array per
    # bit and is never codegen'd (the q120 lesson). Cast matches the
    # fold's integer type.
    from mindseye_dataframes_spark.functions.textfns import py_simhash_bands

    sh16_udf = F.pandas_udf(
        lambda texts: texts.map(lambda t: py_simhash_bands(t, 1)[0]), "int"
    )
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        sh16_udf(F.col("text")).alias("simhash"),
        bag_fingerprint("text").alias("bag_fp"),
    ).orderBy("doc_id")


@query(
    "q58_language_id",
    oracle=f"""
    SELECT lang, {lang_id_sql('text')} AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
    tags=("text", "parity:lang-id"),
)
def q58_language_id(spark, sf_dir):
    """Content-based language identification (marker-word heuristic,
    north-star "language-ID") cross-tabulated against the labeled
    ``lang`` column. Scores are JVM-side array filters over the token
    array — one scan, no UDF, no shuffle beyond the final group-by."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            lang_id("text").alias("lang_pred"),
            F.size(tokens("text")).alias("_nt"),
        )
        .groupBy("lang", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_nt").alias("n_tokens"),
        )
        .orderBy("lang", "lang_pred")
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
# each optionally preceded by one space (the GPT-2 pre-tokenizer shape,
# simplified to the character classes both regex engines share).
_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@query(
    "q61_token_count_bpe",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_tokens
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
           CAST(SUM(bpe_tokens) AS DOUBLE) / CAST(SUM(ws_tokens) AS DOUBLE) AS bpe_per_word
    FROM t GROUP BY lang ORDER BY lang
    """,
    tags=("text", "parity:token-count"),
)
def q61_token_count_bpe(spark, sf_dir):
    """Token-count estimation for LLM-pipeline budgeting: whitespace
    tokens vs a BPE-ish regex pre-tokenizer (letter/digit/punct runs
    with optional leading space). One scan, two JVM-side regex/array
    expressions, one small group-by — no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(tokens("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias(
            "bpe_tokens"
        ),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            (
                F.sum("bpe_tokens").cast("double")
                / F.sum("ws_tokens").cast("double")
            ).alias("bpe_per_word"),
        )
        .orderBy("lang")
    )


# Winnowing (MOSS-style rolling-hash fingerprinting): hash every
# character k-gram, slide a w-window over the hash sequence, keep each
# window's minimum — a position-robust document sketch.
_WIN_K = 8  # k-gram length (characters)
_WIN_W = 4  # winnowing window (hashes)


@query(
    "q62_winnow_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(text) - {_WIN_K - 1}, 1) + 1),
               i -> md5(substr(text, i, {_WIN_K}))
             ) AS kg
      FROM documents
    ), w AS (
      SELECT doc_id, kg,
             list_distinct(list_transform(
               range(1, greatest(len(kg) - {_WIN_W - 1}, 1) + 1),
               j -> list_aggregate(kg[j:j+{_WIN_W - 1}], 'min')
             )) AS fps
      FROM t
    )
    SELECT doc_id,
           CAST(len(kg) AS INT) AS n_kgrams,
           CAST(len(fps) AS INT) AS n_fps,
           md5(array_to_string(list_sort(fps), ' ')) AS digest
    FROM w ORDER BY doc_id
    """,
    tags=("text", "dedup", "parity:winnowing"),
)
def q62_winnow_fingerprints(spark, sf_dir):
    """Document fingerprinting by winnowing (the rolling-hash scheme
    behind MOSS): per-row array math only — k-gram hashes, windowed
    minima, distinct — so it scales linearly with corpus size and
    never shuffles until a downstream bucket join. The digest column
    condenses the fingerprint set for exact cross-engine comparison."""
    # Arrow-batched Python twin of the expression pipeline: the HOF
    # form ran TWO interpreted transform() passes per row (one md5 per
    # character position, then an array_min(slice) per window — never
    # codegen'd, the textfns.py lesson), measured 12.5 s at sf0.1; the
    # per-doc Python loop with C md5 is 4.5 s. Exactness is
    # mechanical: Spark substring/length are character-based like
    # Python slicing, md5 hashes the UTF-8 bytes on both paths, and
    # hex-digest min/sort are plain ASCII comparisons in both engines
    # (oracle re-verified at sf0.001/0.01/0.1).
    import hashlib

    import pandas as pd

    def winnow(text: str):
        m = max(len(text) - (_WIN_K - 1), 1)
        kg = [
            hashlib.md5(text[i : i + _WIN_K].encode("utf-8")).hexdigest()
            for i in range(m)
        ]
        n_w = max(len(kg) - (_WIN_W - 1), 1)
        fps = {min(kg[j : j + _WIN_W]) for j in range(n_w)}
        digest = hashlib.md5(" ".join(sorted(fps)).encode("utf-8")).hexdigest()
        return (len(kg), len(fps), digest)

    win_udf = F.pandas_udf(
        lambda texts: pd.DataFrame(
            texts.map(winnow).tolist(),
            columns=["n_kgrams", "n_fps", "digest"],
        ),
        "n_kgrams int, n_fps int, digest string",
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", win_udf(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.col("w.n_kgrams").alias("n_kgrams"),
            F.col("w.n_fps").alias("n_fps"),
            F.col("w.digest").alias("digest"),
        )
        .orderBy("doc_id")
    )


# --- q193: BM25-style retrieval from a standing inverted index -------
#
# Fixed benchmark query set (term must be drawn from the synthetic
# vocabulary so every query matches); all (query_id, token) pairs
# distinct so per-doc scores sum over distinct terms.
_BM25_QUERIES = (
    (0, "spark"), (0, "join"),
    (1, "window"), (1, "agg"),
    (2, "hash"), (2, "merge"), (2, "scan"),
)
_BM25_K = 5
# Integer-exact BM25 (k1=1.2, b=0.75), derived so BOTH engines replay
# the identical BIGINT arithmetic (no log, no doubles — the repo's
# ppm discipline):
#   idf_ppm   = least(1e9, ((N-df)*2e6 + 1e6) // (2*df+1))
#               -- the BM25+ idf argument (N-df+0.5)/(df+0.5) in ppm,
#                  saturated at ratio 1000 (binds only for df < N/1000)
#   norm_micro= 250000 + 750000*dl*1000 // avgdl_milli   (1 - b + b*dl/avgdl)
#   term_ppm  = idf_ppm * 2200000 * tfc // (1000000*tfc + 1200*norm_micro)
# with tfc = least(tf, 4000): the tf saturation cap also bounds the
# widest product at 1e9 * 2.2e6 * 4000 = 8.8e18 < 2^63 (load-bearing
# ceiling, enforced on both sides).
_BM25_TERM = """
least(1000000000, ((n_docs - df) * 2000000 + 1000000) DIV (2 * df + 1))
* 2200000 * least(tf, 4000)
DIV (1000000 * least(tf, 4000)
     + 1200 * (250000 + (750000 * dl * 1000)
                        DIV ((1000 * total_len) DIV n_docs)))
"""


# The BM25 relation as a reusable oracle CTE block: q193 ranks it
# directly; q199 (hybrid RRF fusion, queries/similarity.py) embeds the
# SAME block so fusion replays the identical BM25 ranking.
_BM25_CORE_SQL = f"""
    q(query_id, token) AS (VALUES {', '.join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)}),
    d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM d),
    tf AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY token, doc_id),
    dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
    bm_scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(sum({_BM25_TERM.replace("DIV", "//")}) AS BIGINT) AS score_ppm
      FROM q JOIN tf USING (token) JOIN dfs USING (token)
             JOIN dl ON tf.doc_id = dl.doc_id, st
      GROUP BY q.query_id, tf.doc_id),
    bm_ranked AS (
      SELECT query_id, doc_id, score_ppm,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_ppm DESC, doc_id) AS bm_rank
      FROM bm_scored)
"""


def bm25_standing_postings(spark, sf_dir):
    """The one-time corpus pass of the standing BM25 index (see q193's
    docstring), published/looked-up as a bucketed standing table.
    Returns the postings DataFrame ``(token, doc_id, dl, tf, df,
    n_docs, total_len)``; shared by q193 and the q199 hybrid fusion."""
    import hashlib
    import os

    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))

    def build_postings():
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("toks")
        )
        toks = d.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("token"),
        )
        tf = toks.groupBy("token", "doc_id", "dl").agg(
            F.count(F.lit(1)).alias("tf")
        )
        dfs = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        stats = d.select(F.size("toks").cast("long").alias("dl")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_len"),
        )
        return (
            tf.join(F.broadcast(dfs), "token")
            .crossJoin(F.broadcast(stats))
            .select("token", "doc_id", "dl", "tf", "df", "n_docs", "total_len")
        )

    return standing_table(
        spark,
        f"msdf_stage_bm25post_{loc}",
        fp,
        build_postings,
        ["token"],
        16,
        ["token", "doc_id"],
    )


def bm25_topk(spark, postings, k):
    """The warm probe of the standing BM25 index: pushed In-filter on
    the probed terms, broadcast probe join, one (query, doc)
    aggregate, per-query top-k. Shared by q193 and q199."""
    from pyspark.sql import Window

    probe_tokens = sorted({t for _, t in _BM25_QUERIES})
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id int, token string")
    cand = F.broadcast(q).join(
        postings.filter(F.col("token").isin(probe_tokens)), "token"
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(_BM25_TERM)).cast("long").alias("score_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_ppm"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_ppm")
    )


@query(
    "q193_standing_bm25_topk",
    oracle=f"""
    WITH {_BM25_CORE_SQL}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "lakehouse", "parity:bm25-standing"),
)
def q193_standing_bm25_topk(spark, sf_dir):
    """BM25 top-k text retrieval answered from a STANDING INVERTED
    INDEX — the text-side twin of q192's standing ANN index. The
    corpus pass (tokenize -> per-(term,doc) tf -> per-term df ->
    corpus length stats) is published once as ONE bucketed standing
    table ``postings(token, doc_id, dl, tf, df, n_docs, total_len)``
    (``sources/bucketing.py:standing_table``, corpus-fingerprint
    invalidation, df/stats denormalized so the probe needs zero side
    lookups and zero driver collects); every later session scores a
    query by (1) an `isin` filter on the probed terms — pushed to the
    parquet scan, so only the matching postings row groups are READ —
    (2) a broadcast join of the O(|query terms|) probe table, (3) one
    (query_id, doc_id) partial+final aggregate, (4) a per-query top-k
    window over candidates only. The raw corpus is never re-scanned
    warm, and nothing scales with |corpus| except the pruned postings
    read. Scoring is integer-exact BM25 (see _BM25_TERM) so the
    oracle replays the identical BIGINT arithmetic from the raw
    documents table — storage must never change the answer."""
    postings = bm25_standing_postings(spark, sf_dir)
    return bm25_topk(spark, postings, _BM25_K).orderBy("query_id", "rank")


def _inc_postings(frame):
    """Normalized posting rows (token, doc_id, dl, tf) for any slice
    of the documents table — the append-only unit of the incremental
    BM25 layout (q203/q205)."""
    d = frame.select("doc_id", F.split("text", " ").alias("toks"))
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("token"),
    ).groupBy("token", "doc_id", "dl").agg(F.count(F.lit(1)).alias("tf"))


def _inc_stats(frame):
    """1-row (k, n_docs, total_len) corpus stats for a document slice
    — merged across slices by addition."""
    return frame.select(
        F.size(F.split("text", " ")).cast("long").alias("dl")
    ).agg(
        F.lit(0).alias("k"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )


def bm25_incremental_base(spark, sf_dir):
    """The STANDING BASE of the incremental BM25 index, shared by the
    batch-delta (q203) and streaming-delta (q205) maintenance paths:
    normalized postings of the ``split_label`` 'train' 90% as a
    token-bucketed standing table, plus the 1-row corpus-stats side
    table. Returns ``(base_post, base_stats, docs)`` where docs
    carries the split column for the callers' delta selection."""
    import hashlib
    import os

    from mindseye_dataframes_spark.queries.curation import split_label
    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", split_label("doc_id").alias("split")
    )
    base = docs.filter(F.col("split") == "train")
    base_post = standing_table(
        spark,
        f"msdf_stage_bm25incpost_{loc}",
        fp,
        lambda: _inc_postings(base),
        ["token"],
        16,
        ["token", "doc_id"],
    )
    base_stats = standing_table(
        spark,
        f"msdf_stage_bm25incstats_{loc}",
        fp,
        lambda: _inc_stats(base),
        ["k"],
        1,
    )
    return base_post, base_stats, docs


def _bm25_merged_topk(spark, base_post, base_stats, delta_post, delta_stats):
    """Score + top-k over base postings ∪ delta postings with merged
    corpus stats — the probe shared by q203 and q205. ``delta_post``
    must already be pruned to the probed tokens and cheap to consume
    twice (checkpointed or storage-backed); ``delta_stats`` is any
    1-row (n_docs, total_len) frame."""
    from pyspark.sql import Window

    probe_tokens = sorted({t for _, t in _BM25_QUERIES})
    merged = base_post.filter(F.col("token").isin(probe_tokens)).unionByName(
        delta_post.select("token", "doc_id", "dl", "tf")
    )
    # exact df: a term's posting list IS its document set
    dfs = merged.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        base_stats.crossJoin(
            delta_stats.select(
                F.col("n_docs").alias("d_docs"),
                F.col("total_len").alias("d_len"),
            )
        )
        .select(
            (F.col("n_docs") + F.col("d_docs")).alias("n_docs"),
            (F.col("total_len") + F.col("d_len")).alias("total_len"),
        )
    )
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id int, token string")
    cand = (
        F.broadcast(q)
        .join(merged, "token")
        .join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(stats))
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(_BM25_TERM)).cast("long").alias("score_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_ppm"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score_ppm")
        .orderBy("query_id", "rank")
    )


@query(
    "q203_incremental_bm25_update",
    oracle=f"""
    WITH {_BM25_CORE_SQL}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "incremental", "parity:bm25-incremental"),
)
def q203_incremental_bm25_update(spark, sf_dir):
    """INCREMENTAL MAINTENANCE of the standing BM25 index — the
    retrieval twin of q154/q187's incremental-dedup story: the corpus
    splits into a standing BASE (the ``split_label`` 'train' 90%,
    indexed once) and a late-arriving DELTA batch (the 'test' 10%);
    the probe answers from base postings + freshly tokenized delta,
    and the oracle replays BM25 over the FULL corpus — pinning the
    load-bearing claim that incremental maintenance returns
    bit-identically what a full index rebuild would.

    Unlike q193's read-optimized layout (df/stats denormalized into
    every posting row — cheap probes, but a delta batch would dirty
    every posting of every term it touches), the incremental layout
    NORMALIZES: base postings carry only (token, doc_id, dl, tf), so
    a delta merge is append-only; per-term df is re-derived from the
    probed tokens' unioned postings (exact: a term's posting list IS
    its document set), and corpus stats live in a 1-row standing
    side table merged with the delta's stats by addition. That's the
    classic mutable-index trade, made explicit here: denormalize for
    read-only serving (q193), normalize for append-heavy ingest
    (this query).

    Scale shape, warm: the base corpus text is NEVER re-scanned —
    the probe reads base postings with the probed-term `isin` pushed
    to the parquet scan AND bucket-pruned (token-bucketed layout);
    only the delta batch (new arrivals, by definition small) is
    tokenized per update; df/stats merge is arithmetic over
    O(|probed terms|) + O(1) rows; scoring/top-k is the q193 probe
    shape on the unioned candidates."""
    base_post, base_stats, docs = bm25_incremental_base(spark, sf_dir)
    # the late-arriving batch: tokenized fresh, appended logically.
    # The delta tokenize is the one expensive derivation consumed by
    # both probe branches (df + scoring) — pin it; the base side stays
    # unpinned deliberately: its re-read is a bucket-pruned, In-pushed
    # file scan of the standing table (cheap, and visible in the plan,
    # where tests/test_plans.py asserts it)
    delta = docs.filter(F.col("split") == "test")
    probe_tokens = sorted({t for _, t in _BM25_QUERIES})
    delta_probe_post = (
        _inc_postings(delta)
        .filter(F.col("token").isin(probe_tokens))
        .localCheckpoint(eager=False)
    )
    return _bm25_merged_topk(
        spark, base_post, base_stats, delta_probe_post, _inc_stats(delta)
    )


def bm25_ingest_batch_fn(post_log: str, stats_log: str):
    """foreachBatch body of the streaming BM25 ingest (q205): tokenize
    ONE micro-batch into normalized posting rows + a 1-row stats
    record, each written to the DETERMINISTIC ``batch=<batchId>`` path
    in overwrite mode — a replayed trigger (crash between sink write
    and checkpoint commit) overwrites its own partition instead of
    double-appending, which is what makes the append-only log
    exactly-once without a transactional table format. Module-level so
    tests can drive it directly (idempotence, multi-trigger layout)."""

    def ingest_batch(batch_df, batch_id):
        batch_df.persist()
        try:
            _inc_postings(batch_df).write.mode("overwrite").parquet(
                f"{post_log}/batch={batch_id}"
            )
            _inc_stats(batch_df).drop("k").write.mode("overwrite").parquet(
                f"{stats_log}/batch={batch_id}"
            )
        finally:
            batch_df.unpersist()

    return ingest_batch


@query(
    "q205_streaming_bm25_ingest",
    oracle=f"""
    WITH {_BM25_CORE_SQL}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "streaming", "parity:bm25-streaming"),
)
def q205_streaming_bm25_ingest(spark, sf_dir):
    """STREAMING maintenance of the incremental BM25 index — q203's
    delta batch arrives as a STREAM instead: the 'test' split is
    staged as a many-file drop and consumed by a file-source stream
    over multiple micro-batch triggers; each trigger's foreachBatch
    tokenizes ONLY that batch's documents into normalized posting
    rows and appends them to the posting log, plus a per-batch 1-row
    stats record. After the drain, the probe answers from standing
    base postings ∪ streamed posting log with stats merged by
    addition, and the oracle replays BM25 over the FULL corpus — four
    unordered incremental commits must converge to exactly the
    one-shot rebuild answer.

    Exactly-once appends without a transactional table format: each
    batch writes to the DETERMINISTIC path ``batch=<batchId>`` in
    overwrite mode, so a replayed trigger (crash between sink write
    and checkpoint commit) overwrites its own partition instead of
    double-appending — the idempotent-path pattern that foreachBatch
    + epoch ids make possible, and the file-level equivalent of what
    Delta/Iceberg's transactional append gives (the q198 rename-commit
    story, specialized to append-only logs).

    Scale shape: per trigger the work is one bounded tokenize-
    aggregate over that batch's documents (state O(batch), never
    O(stream) — no stateful operator involved at all); the posting
    log stays partitioned by batch for audit/replay and is read back
    pruned by the probed-term filter; the base is the same standing
    bucketed table q203 serves from, never re-scanned."""
    import shutil

    from mindseye_dataframes_spark.sources.staging import (
        read_log_or_empty,
        staging_dir,
    )

    base_post, base_stats, docs = bm25_incremental_base(spark, sf_dir)
    delta = docs.filter(F.col("split") == "test").select("doc_id", "text")
    # executor-reachable scratch: spark.mindseye.stagingDir on a real
    # cluster, tempfile only under a local master (ADVICE r7)
    root = staging_dir(spark, "msdf_stream_bm25_")
    src = f"{root}/src"
    post_log = f"{root}/postings"
    stats_log = f"{root}/stats"
    ckpt = f"{root}/ckpt"
    try:
        delta.repartition(32).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.format("parquet")
            .schema(delta.schema)
            .option("maxFilesPerTrigger", 8)
            .load(src)
        )

        q = (
            stream.writeStream.foreachBatch(
                bm25_ingest_batch_fn(post_log, stats_log)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("q205 ingest stream did not drain")
        probe_tokens = sorted({t for _, t in _BM25_QUERIES})
        # an empty delta leaves the logs unwritten → base-only merge
        streamed_post = read_log_or_empty(
            spark, post_log, _inc_postings(delta.limit(0)).schema
        ).filter(F.col("token").isin(probe_tokens))
        # coalesce: an empty micro-batch writes n_docs=0 with a NULL
        # total_len (sum over zero rows), and sum() must not let that
        # NULL poison the merged corpus stats
        streamed_stats = read_log_or_empty(
            spark, stats_log, _inc_stats(delta.limit(0)).drop("k").schema
        ).agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("total_len"), F.lit(0)).alias("total_len"),
        )
        out = _bm25_merged_topk(
            spark, base_post, base_stats, streamed_post, streamed_stats
        )
        # pin the result before the staging dirs vanish
        return spark.createDataFrame(out.collect(), schema=out.schema).orderBy(
            "query_id", "rank"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --- q208: tombstone DELETES against the standing BM25 index ---------
#
# The takedown batch, as a deterministic predicate so the oracle can
# replay the surviving corpus: every 10th document (ids ending in 7).
_BM25_TOMB_PRED = "doc_id % 10 = 7"


def bm25_tombstone_base(spark, sf_dir):
    """Standing full-corpus BM25 base laid out FOR deletes (q208):
    normalized token-bucketed postings, a doc-keyed ``(doc_id, dl)``
    length companion, and the 1-row corpus stats. The length companion
    is the piece an append-only layout lacks: takedown requests carry
    ids only, and correcting (n_docs, total_len) for deleted docs must
    not re-scan text — it's one aggregate over the companion's two
    integer columns instead. Returns ``(post, dlens, stats)``."""
    import hashlib
    import os

    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    post = standing_table(
        spark,
        f"msdf_stage_bm25tombpost_{loc}",
        fp,
        lambda: _inc_postings(docs),
        ["token"],
        16,
        ["token", "doc_id"],
    )
    dlens = standing_table(
        spark,
        f"msdf_stage_bm25tombdl_{loc}",
        fp,
        lambda: docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
        ),
        ["doc_id"],
        16,
    )
    stats = standing_table(
        spark,
        f"msdf_stage_bm25tombstats_{loc}",
        fp,
        lambda: _inc_stats(docs),
        ["k"],
        1,
    )
    return post, dlens, stats


@query(
    "q208_bm25_tombstone_delete",
    oracle=f"""
    WITH {_BM25_CORE_SQL.replace(
        "FROM documents", f"FROM documents WHERE NOT ({_BM25_TOMB_PRED})"
    )}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "incremental", "parity:bm25-tombstone"),
)
def q208_bm25_tombstone_delete(spark, sf_dir):
    """TOMBSTONE DELETES against the standing BM25 index — the
    eviction half of the index-maintenance story (VERDICT r7 item 8):
    q203/q205 prove append-only ingest ≡ rebuild; real corpora also
    EVICT (takedowns, licensing pulls, dedup rewrites). Here a
    takedown batch (ids only — ``doc_id % 10 = 7``) lands as a
    tombstone side table, nothing in the standing index is rewritten,
    and the probe answers as if the index had been rebuilt without
    those documents: the oracle replays full-corpus-minus-tombstones
    BM25 from raw text, so the driver hashes that LOGICAL deletion is
    exact — same contract as the ingest twins, flipped.

    Probe-time mechanics, all O(probe) + O(|tombstones|):
    (1) postings pruned to the probed terms (``isin`` pushed to the
        bucketed scan) then anti-joined against the BROADCAST
        tombstone ids — a narrow filter, no shuffle, bucketing
        preserved;
    (2) per-term df re-derived from the surviving posting lists (a
        term's posting list IS its live document set — exact, the
        normalized-layout dividend q203 established);
    (3) corpus stats corrected by ONE aggregate over the doc-keyed
        length companion semi-joined to the tombstones — text is
        never re-read to learn what the deleted docs contributed;
    (4) q193's probe shape (broadcast query terms, one (query, doc)
        aggregate, per-query top-k window over candidates only).
    The raw corpus is never re-scanned; compaction (physically
    rewriting the posting buckets minus tombstones) is a background
    concern the fingerprint roll already models — logical deletes
    keep serving correct answers until then."""
    from pyspark.sql import Window

    post, dlens, stats = bm25_tombstone_base(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # the takedown id list is consumed by BOTH anti-joins — pin it so
    # the plan derives it once (in production it arrives as a side
    # table and this scan doesn't exist at all)
    tomb = (
        docs.filter(F.expr(_BM25_TOMB_PRED))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )

    probe_tokens = sorted({t for _, t in _BM25_QUERIES})
    live_post = post.filter(F.col("token").isin(probe_tokens)).join(
        F.broadcast(tomb), "doc_id", "left_anti"
    )
    dfs = live_post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # stats correction: one aggregate over the length companion's
    # tombstoned rows (coalesce: an empty takedown batch must yield 0)
    del_stats = dlens.join(F.broadcast(tomb), "doc_id", "left_semi").agg(
        F.count(F.lit(1)).alias("d_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("d_len"),
    )
    live_stats = stats.crossJoin(F.broadcast(del_stats)).select(
        (F.col("n_docs") - F.col("d_docs")).alias("n_docs"),
        (F.col("total_len") - F.col("d_len")).alias("total_len"),
    )
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id int, token string")
    cand = (
        F.broadcast(q)
        .join(live_post, "token")
        .join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(live_stats))
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(_BM25_TERM)).cast("long").alias("score_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_ppm"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score_ppm")
        .orderBy("query_id", "rank")
    )


@query(
    "q210_bm25_compaction",
    oracle=f"""
    WITH {_BM25_CORE_SQL.replace(
        "FROM documents", f"FROM documents WHERE NOT ({_BM25_TOMB_PRED})"
    )}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "incremental", "parity:bm25-compaction"),
)
def q210_bm25_compaction(spark, sf_dir):
    """PHYSICAL COMPACTION of q208's tombstoned BM25 index — the
    background half of the delete lifecycle: q208 serves correct
    answers with tombstones applied at probe time; compaction
    REWRITES the standing tables without them so probes stop paying
    the anti-join and the deleted bytes actually leave storage. The
    compacted tables publish under a DERIVED fingerprint
    (md5(base_fp : tombstone-set digest)) — the same atomic-rename /
    metadata-sidecar machinery as any standing table, so a crashed
    compaction can never half-replace the live index, and re-running
    is a warm no-op. The oracle is IDENTICAL to q208's (full rebuild
    over the surviving corpus): one green row pins probe-time deletes,
    the other pins the physical rewrite, so
    tombstone == compaction == rebuild is hash-checked end to end.

    Scale shape: compaction reads ONLY the standing tables — postings
    and the doc-keyed length companion anti-joined against broadcast
    tombstones (narrow), stats re-derived by one aggregate over the
    compacted companion's two integer columns; raw text is never
    touched. The warm probe is q193's shape with NO tombstone filter
    anywhere — the plan must not contain documents.parquet at all
    (pinned in tests/test_plans.py)."""
    import hashlib
    import os

    from pyspark.sql import Window

    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    post, dlens, stats = bm25_tombstone_base(spark, sf_dir)
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    base_fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))
    # the compacted generation's identity = base corpus + tombstone set
    fp2 = hashlib.md5(
        f"{base_fp}:tomb:{_BM25_TOMB_PRED}".encode()
    ).hexdigest()[:16]
    tomb = (
        load_table(spark, sf_dir, "documents")
        .filter(F.expr(_BM25_TOMB_PRED))
        .select("doc_id")
    )

    cpost = standing_table(
        spark,
        f"msdf_stage_bm25cpost_{loc}",
        fp2,
        lambda: post.join(F.broadcast(tomb), "doc_id", "left_anti"),
        ["token"],
        16,
        ["token", "doc_id"],
    )
    cdlens = standing_table(
        spark,
        f"msdf_stage_bm25cdl_{loc}",
        fp2,
        lambda: dlens.join(F.broadcast(tomb), "doc_id", "left_anti"),
        ["doc_id"],
        16,
    )
    cstats = standing_table(
        spark,
        f"msdf_stage_bm25cstats_{loc}",
        fp2,
        lambda: cdlens.agg(
            F.lit(0).alias("k"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("total_len"),
        ),
        ["k"],
        1,
    )
    # the post-compaction probe: q193's shape, zero tombstone awareness
    probe_tokens = sorted({t for _, t in _BM25_QUERIES})
    live_post = cpost.filter(F.col("token").isin(probe_tokens))
    dfs = live_post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id int, token string")
    cand = (
        F.broadcast(q)
        .join(live_post, "token")
        .join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(cstats.select("n_docs", "total_len")))
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(_BM25_TERM)).cast("long").alias("score_ppm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_ppm"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "rank", "doc_id", "score_ppm")
        .orderBy("query_id", "rank")
    )


@query(
    "q219_bm25_index_checkpoint",
    oracle=f"""
    WITH {_BM25_CORE_SQL}
    SELECT query_id, bm_rank AS rank, doc_id, score_ppm FROM bm_ranked
    WHERE bm_rank <= {_BM25_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "lakehouse", "parity:bm25-checkpoint"),
)
def q219_bm25_index_checkpoint(spark, sf_dir):
    """CHECKPOINT ROLL of the streamed BM25 posting log into the
    standing base — q218's lexical twin, completing the lifecycle for
    BOTH index families (ingest → serve-from-union → checkpoint →
    serve-flat): q205 leaves probes merging base postings with a
    per-batch log and adding stats at probe time, forever; this query
    FOLDS the drained log into a NEW token-bucketed standing posting
    table plus a rolled 1-row stats table under a derived fingerprint
    (md5(base_fp : log spec), atomic publish, warm no-op), after which
    the probe is the plain merged-probe shape with an EMPTY delta —
    zero log reads, zero probe-time stat addition. The oracle replays
    BM25 over the FULL corpus, pinning that the roll-up answers
    bit-identically what the one-shot rebuild would.

    Scale shape: the fold reads base postings + the small log once and
    rewrites them bucketed (bounded maintenance, no corpus re-scan,
    no re-tokenize); the warm probe reads ONE In-pushed bucket-pruned
    table and a 1-row stats side table."""
    import hashlib
    import os
    import shutil

    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )
    from mindseye_dataframes_spark.sources.staging import (
        read_log_or_empty,
        staging_dir,
    )

    base_post, base_stats, docs = bm25_incremental_base(spark, sf_dir)
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    base_fp = dataset_fingerprint(os.path.join(real, "documents.parquet"))
    fp2 = hashlib.md5(f"{base_fp}:ckpt:test-split".encode()).hexdigest()[:16]

    # the drained ingest log: four unordered batches through q205's
    # idempotent batch fn (the post-stream state, sans stream)
    root = staging_dir(spark, "msdf_bm25_ckptlog_")
    post_log = f"{root}/postings"
    stats_log = f"{root}/stats"
    try:
        delta = docs.filter(F.col("split") == "test").select("doc_id", "text")
        for b in range(4):
            bm25_ingest_batch_fn(post_log, stats_log)(
                delta.filter(F.col("doc_id") % 4 == b), b
            )
        streamed_post = read_log_or_empty(
            spark, post_log, _inc_postings(delta.limit(0)).schema
        ).select("token", "doc_id", "dl", "tf")
        streamed_stats = read_log_or_empty(
            spark, stats_log, _inc_stats(delta.limit(0)).drop("k").schema
        ).agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("d_docs"),
            F.coalesce(F.sum("total_len"), F.lit(0)).alias("d_len"),
        )
        ckpt_post = standing_table(
            spark,
            f"msdf_stage_bm25ckptpost_{loc}",
            fp2,
            lambda: base_post.unionByName(streamed_post),
            ["token"],
            16,
            ["token", "doc_id"],
        )
        ckpt_stats = standing_table(
            spark,
            f"msdf_stage_bm25ckptstats_{loc}",
            fp2,
            lambda: base_stats.crossJoin(streamed_stats).select(
                F.lit(0).alias("k"),
                (F.col("n_docs") + F.col("d_docs")).alias("n_docs"),
                (F.col("total_len") + F.col("d_len")).alias("total_len"),
            ),
            ["k"],
            1,
        )
        ckpt_post.count()  # materialize before the staging log vanishes
        ckpt_stats.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    empty_delta = spark.createDataFrame(
        [], "token string, doc_id long, dl long, tf long"
    )
    zero_stats = spark.createDataFrame([(0, 0)], "n_docs long, total_len long")
    return _bm25_merged_topk(
        spark, ckpt_post, ckpt_stats.drop("k"), empty_delta, zero_stats
    )
