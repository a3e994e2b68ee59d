"""Deduplication operators (north-star §2B ★ rows).

Four tiers, all shuffle-bounded (no pairwise cross product outside a
candidate bucket):

- exact:    hash-groupBy on (normalized) content → canonical survivor
- MinHash:  salted-md5 signatures → LSH banding → bucket self-join →
            exact Jaccard verify on candidates only
- SimHash:  16-bit fingerprint equality clusters
- embedding: cosine threshold pairs (brute within LSH bucket at scale)

Scale analysis: LSH banding turns O(n²) near-dup search into
O(n·bands) + O(Σ bucket²); with b bands of r rows the candidate
probability for Jaccard j is 1-(1-j^r)^b, so bucket sizes stay small
unless the corpus truly is one giant dup cluster (then salting the
band key by a content prefix bounds the bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.textfns import (
    LSH_BANDS,
    MINHASH_K,
    distinct_tokens,
    lsh_band_keys,
    py_distinct_tokens,
    py_minhash,
    py_shingles,
    shingles,
)
from mindseye_dataframes_spark.plans.parallelism import (
    ensure_min_parallelism,
    spread_for_compute,
)

def _features(text_col: str, feature: str):
    """Feature set for similarity: 'shingles' (word 3-grams — order-
    sensitive, discriminative even on tiny vocabularies) or 'tokens'
    (order-insensitive bag). Shingles are the default: on a 31-word
    vocabulary token-set jaccard has a ~0.65 baseline between
    *unrelated* docs, so token-level LSH degenerates to all-pairs."""
    if feature == "shingles":
        return shingles(text_col, 3)
    if feature == "tokens":
        return distinct_tokens(text_col)
    raise ValueError(f"unknown feature: {feature}")


def _py_features(feature: str):
    if feature == "shingles":
        return py_shingles
    if feature == "tokens":
        return py_distinct_tokens
    raise ValueError(f"unknown feature: {feature}")


def _features_udf(feature: str):
    """Arrow-batched feature extraction (see textfns.py: interpreted
    higher-order functions are ~25ms/doc; this path is ~µs/doc)."""
    fn = _py_features(feature)
    return F.pandas_udf(lambda texts: texts.map(fn), "array<string>")


def _signature_udf(feature: str, k: int):
    fn = _py_features(feature)
    return F.pandas_udf(
        lambda texts: texts.map(lambda t: py_minhash(fn(t), k)), "array<string>"
    )


def doc_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = MINHASH_K,
    feature: str = "shingles",
) -> DataFrame:
    """(id, feats, signature) per doc from ONE Arrow-batched UDF pass,
    persisted (memory, spill to disk): the LSH bucket self-join and
    the Jaccard verify both consume this relation twice — without
    pinning, Spark re-runs the UDF subtree once per plan branch."""
    import pandas as pd
    from pyspark.storagelevel import StorageLevel

    fn = _py_features(feature)

    def both(texts):
        feats = texts.map(fn)
        sigs = feats.map(lambda f: py_minhash(f, k))
        return pd.DataFrame({"feats": feats, "sig": sigs})

    udf = F.pandas_udf(both, "feats array<string>, sig array<string>")
    return (
        ensure_min_parallelism(df, id_col)
        .select(F.col(id_col), udf(F.col(text_col)).alias("_x"))
        .select(id_col, F.col("_x.feats").alias("feats"), F.col("_x.sig").alias("signature"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def dedup_exact(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one survivor (minimum id — deterministic, unlike
    ``dropDuplicates``) per distinct content. Map-side partial agg +
    one shuffle on the content hash."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = MINHASH_K,
    feature: str = "shingles",
) -> DataFrame:
    """Per-doc MinHash signature over the chosen feature set.

    Arrow-batched pandas UDF: shingling+hashing is doc-local, so this
    is a pure map — zero shuffle at any scale. (The SQL-expression
    form via nested transform() was measured 30× slower: higher-order
    functions run interpreted, re-evaluating the feature array k
    times per row; an explode+groupBy form was 5× slower and added a
    shuffle.)
    """
    sig = _signature_udf(feature, k)
    return ensure_min_parallelism(df, id_col).select(
        F.col(id_col), sig(F.col(text_col)).alias("signature")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    feature: str = "shingles",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.
    Returns distinct (id_a < id_b) pairs. The only join is the bucket
    self-join — each side keyed by (band key), never all-pairs."""
    sigs = minhash_signatures(df, text_col, id_col, k, feature)
    return _candidate_pairs(sigs, id_col, bands, k)


def _candidate_pairs(sigs: DataFrame, id_col: str, bands: int, k: int) -> DataFrame:
    """Bucket self-join over LSH band keys → distinct (id_a < id_b)."""
    buckets = sigs.select(
        F.col(id_col),
        F.explode(lsh_band_keys(F.col("signature"), bands, k)).alias("band_key"),
    )
    a = buckets.select(F.col("band_key"), F.col(id_col).alias("id_a"))
    b = buckets.select(F.col("band_key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    feature: str = "shingles",
) -> DataFrame:
    """LSH candidates + exact feature-set Jaccard ≥ threshold.
    Jaccard is |A∩B| / (|A|+|B|-|A∩B|) — integer counts, so the double
    division is engine-exact for the oracle."""
    base = doc_features(df, text_col, id_col, k, feature)
    candidates = _candidate_pairs(base, id_col, bands, k)
    toks = base.select(F.col(id_col), F.col("feats").alias("toks")).withColumn(
        "n_toks", F.size("toks")
    )
    ta = toks.select(
        F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"), F.col("n_toks").alias("n_a")
    )
    tb = toks.select(
        F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"), F.col("n_toks").alias("n_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter).cast("double")
    return (
        candidates.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs via an inverted-index
    candidate join (the prefix-filtering family — complements
    MinHash-LSH with exact candidate semantics).

    Spec: candidates are pairs sharing ≥1 *rare* n-gram (document
    frequency ≤ ``max_df``); survivors have exact n-gram-set Jaccard
    ≥ ``threshold`` over the FULL gram sets. The df cutoff is what
    makes the inverted index scale: without it, a stop-gram appearing
    in every doc turns the posting self-join into all-pairs. Near-dups
    share many grams, so requiring one *rare* shared gram costs recall
    only when every shared gram is corpus-common (then the pair is
    boilerplate, not duplication).

    Plan shape: one Arrow-batched gram pass (persisted — consumed by
    both the posting join and the verify), explode → groupBy(gram) for
    document frequency, posting-list self-join keyed on the gram,
    distinct, then an equi-join verify with JVM-side
    ``array_intersect``. Shuffles are bounded by posting-list size,
    never O(n²).
    """
    from pyspark.storagelevel import StorageLevel

    from mindseye_dataframes_spark.functions.textfns import py_char_ngrams

    grams_udf = F.pandas_udf(
        lambda texts: texts.map(lambda t: py_char_ngrams(t, n)), "array<string>"
    )
    feats = (
        ensure_min_parallelism(df, id_col)
        .select(F.col(id_col), grams_udf(F.col(text_col)).alias("grams"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    postings = feats.select(F.col(id_col), F.explode("grams").alias("g"))
    rare = (
        postings.groupBy("g")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") <= max_df)
        .select("g")
    )
    rare_postings = postings.join(rare, "g")
    a = rare_postings.select("g", F.col(id_col).alias("id_a"))
    b = rare_postings.select("g", F.col(id_col).alias("id_b"))
    candidates = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sized = feats.withColumn("n_grams", F.size("grams"))
    ga = sized.select(
        F.col(id_col).alias("id_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("n_a"),
    )
    gb = sized.select(
        F.col(id_col).alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("n_b"),
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter).cast("double")
    # the candidate relation is byte-small but each verify row does
    # O(|grams|) intersection work — pin cluster-wide parallelism so
    # AQE's size-based coalescing can't serialize the verify stage
    return (
        spread_for_compute(candidates, "id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold_ppm: int = 800_000,
    max_df: int = 50,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT near-dup pairs: C(src→dst) =
    |grams(src) ∩ grams(dst)| / |grams(src)|, emitted as ordered
    (src_id, dst_id) rows for every direction with containment ≥
    ``threshold_ppm``. Containment is the metric Jaccard structurally
    misses: a short doc fully embedded in a much longer one (quote
    farms, boilerplate wrappers, chunk-of-a-book) has C(short→long)
    ≈ 1 while J = |short|/|long| ≈ 0 — so a Jaccard gate never fires.
    Broder's containment sketch is the classical form; here candidates
    are exact (shared rare gram), so the score is exact too.

    Same inverted-index candidate stage as :func:`ngram_jaccard_pairs`
    (one Arrow-batched gram pass, df ≤ ``max_df`` posting self-join —
    bounded buckets, never all-pairs); the verify computes the
    intersection ONCE per unordered pair and fans out both directed
    scores with an array explode (no second join). Scores are integer
    ppm (``inter·1e6 DIV n_src``) — BIGINT-exact on every engine.
    """
    from pyspark.storagelevel import StorageLevel

    from mindseye_dataframes_spark.functions.textfns import py_char_ngrams

    grams_udf = F.pandas_udf(
        lambda texts: texts.map(lambda t: py_char_ngrams(t, n)), "array<string>"
    )
    feats = (
        ensure_min_parallelism(df, id_col)
        .select(F.col(id_col), grams_udf(F.col(text_col)).alias("grams"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    postings = feats.select(F.col(id_col), F.explode("grams").alias("g"))
    rare = (
        postings.groupBy("g")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") <= max_df)
        .select("g")
    )
    rare_postings = postings.join(rare, "g")
    a = rare_postings.select("g", F.col(id_col).alias("id_a"))
    b = rare_postings.select("g", F.col(id_col).alias("id_b"))
    candidates = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sized = feats.withColumn("n_grams", F.size("grams"))
    ga = sized.select(
        F.col(id_col).alias("id_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("n_a"),
    )
    gb = sized.select(
        F.col(id_col).alias("id_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("n_b"),
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("long")
    # same AQE-coalescing guard as the Jaccard verify: the pair list
    # is tiny in bytes, the per-row intersection is not (VERDICT r9
    # item 3 — the sf0.1 cold path serialized here)
    scored = (
        spread_for_compute(candidates, "id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, "id_b")
        .select("id_a", "id_b", inter.alias("inter"), "n_a", "n_b")
    )
    directed = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.expr("inter * 1000000 DIV n_a").alias("containment_ppm"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.expr("inter * 1000000 DIV n_b").alias("containment_ppm"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    return directed.filter(F.col("containment_ppm") >= threshold_ppm)
