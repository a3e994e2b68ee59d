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


def _gram_pair_parts(
    df: DataFrame, text_col: str, id_col: str, n: int, max_df: int
):
    """Shared candidate + decomposed-intersection machinery for the
    n-gram pair operators (Jaccard and containment).

    Returns ``(pair_rare, sizes)``:

    - ``pair_rare``: (id_a, id_b, inter_rare) — candidate pairs
      sharing ≥1 rare gram (document frequency ≤ ``max_df``), with the
      EXACT count of shared rare grams. Grams are distinct per doc
      (``py_char_ngrams``), so the posting equi-join emits exactly one
      row per shared rare gram and the groupBy count replaces the old
      ``distinct()`` on the same exchange.
    - ``sizes``: (doc_id, n_grams, cids) — per-doc total gram count
      and the doc's COMMON grams (df > ``max_df``) as a sorted array
      of dictionary indices.

    Why: the full intersection decomposes exactly as
    ``inter = inter_rare + |common_a ∩ common_b|``. The old verify
    shuffled every candidate pair's full gram STRING arrays (~8 KB
    per pair at sf0.1) through two joins and ran a string
    ``array_intersect`` per pair — measured 45.7 s of q80's 52.7 s at
    sf0.1 for 1.24M candidates → 256 survivors. Here the pair
    relation carries 24 bytes, the doc side carries int arrays
    (≤ one int per gram, ~6× narrower than the strings), and the
    per-pair intersect runs on ints. The common-gram dictionary is
    bounded by construction: each common gram has df > max_df, so
    K < total_postings / max_df — its index assignment is an
    O(K)-row metadata window, the zip-offsets precedent."""
    from pyspark.sql import Window
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
    # one document-frequency aggregate feeds BOTH the rare filter and
    # the common dictionary — persist it (O(distinct grams) rows)
    gcounts = postings.groupBy("g").agg(
        F.count(F.lit(1)).alias("doc_freq")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rare_postings = postings.join(
        gcounts.filter(F.col("doc_freq") <= max_df).select("g"), "g"
    )
    a = rare_postings.select("g", F.col(id_col).alias("id_a"))
    b = rare_postings.select("g", F.col(id_col).alias("id_b"))
    pair_rare = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_rare"))
    )
    common = gcounts.filter(F.col("doc_freq") > max_df).select(
        "g",
        (
            F.row_number().over(Window.orderBy("g")) - 1
        ).alias("cidx"),
    )
    # fixed-width BITMAP per doc over the common-gram dictionary: the
    # per-pair common intersection then vectorizes to AND + popcount
    # over (batch, W) int64 matrices — no per-row hash-set build (a
    # JVM array_intersect per pair measured ~25 µs; the whole-batch
    # numpy path is ~ns/word). K needs one count on the persisted
    # doc-frequency relation (O(1) to the driver, sizing only).
    n_common = common.count()
    width = max(1, -(-n_common // 64))

    def _to_bitmap(idx_lists):
        import numpy as np
        import pandas as pd

        out = []
        for idxs in idx_lists:
            bm = np.zeros(width, dtype=np.int64)
            if idxs is not None and len(idxs):
                a = np.asarray(idxs, dtype=np.int64)
                np.bitwise_or.at(
                    bm, a // 64, np.int64(1) << (a % 64).astype(np.int64)
                )
            out.append(bm.tolist())
        return pd.Series(out)

    bm_udf = F.pandas_udf(_to_bitmap, "array<bigint>")
    doc_common = (
        postings.join(common, "g")
        .groupBy(id_col)
        .agg(F.collect_list("cidx").alias("cidxs"))
        .select(F.col(id_col), bm_udf("cidxs").alias("cbm"))
    )
    zero_bm = F.array(*[F.lit(0).cast("bigint") for _ in range(width)])
    sizes = (
        feats.select(F.col(id_col), F.size("grams").alias("n_grams"))
        .join(doc_common, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce(F.col("cbm"), zero_bm).alias("cbm"),
        )
    )
    return pair_rare, sizes


def _popcount_and_udf():
    """(bitmap_a, bitmap_b) → |a ∩ b| via whole-batch numpy: stack to
    (rows, W) int64, AND, SWAR popcount (numpy 1.x has no
    bitwise_count), row-sum. Exact for any bit pattern incl. bit 63."""
    import numpy as np
    import pandas as pd

    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)

    # no type hints: stringified annotations break pandas_udf
    # signature inference (the word_ngrams_udf lesson)
    def pop(a, b):
        if not len(a):
            return pd.Series([], dtype="int32")
        x = np.bitwise_and(
            np.stack(a.values).astype(np.int64).view(np.uint64),
            np.stack(b.values).astype(np.int64).view(np.uint64),
        )
        x = x - ((x >> np.uint64(1)) & m1)
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        counts = (x * h01) >> np.uint64(56)
        return pd.Series(counts.sum(axis=1).astype("int32"))

    return F.pandas_udf(pop, "int")


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

    Plan shape: one Arrow-batched gram pass (persisted), one
    document-frequency aggregate, posting-list self-join keyed on the
    gram folded straight into a per-pair shared-rare-gram COUNT, then
    a decomposed exact verify (``_gram_pair_parts``): the full
    intersection is ``inter_rare + |common_a ∩ common_b|`` over
    dictionary-encoded int arrays, so no gram strings ever travel
    with the pairs. An exact LENGTH filter (J ≥ t ⇒ min·1 ≥ t·max)
    prunes pairs before the int intersect. Shuffles are bounded by
    posting-list size, never O(n²).
    """
    pair_rare, sizes = _gram_pair_parts(df, text_col, id_col, n, max_df)
    sa = sizes.select(
        F.col(id_col).alias("id_a"),
        F.col("n_grams").alias("n_a"),
        F.col("cbm").alias("cbm_a"),
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"),
        F.col("n_grams").alias("n_b"),
        F.col("cbm").alias("cbm_b"),
    )
    # the candidate relation is byte-small but each verify row does
    # O(|common|/64) popcount work — pin cluster-wide parallelism so
    # AQE's size-based coalescing can't serialize the verify stage
    withsz = (
        spread_for_compute(pair_rare, "id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        # exact length filter: true J ≤ min/max and double rounding is
        # monotone, so computed(min/max) < t ⇒ computed(J) < t — the
        # division form can never prune a pair the verify would keep
        .filter(
            F.least("n_a", "n_b").cast("double")
            / F.greatest("n_a", "n_b").cast("double")
            >= F.lit(threshold)
        )
    )
    inter = F.col("inter_rare") + _popcount_and_udf()("cbm_a", "cbm_b")
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter).cast("double")
    return (
        withsz.select("id_a", "id_b", jac.alias("jaccard"))
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
    intersection ONCE per unordered pair via the decomposed exact form
    (``inter_rare`` from the posting join + an int-array intersect of
    dictionary-encoded common grams, ``_gram_pair_parts``) and fans
    out both directed scores with an array explode (no second join).
    No length prefilter — containment has none (a short doc fully
    inside a long one qualifies at any length ratio). Scores are
    integer ppm (``inter·1e6 DIV n_src``) — BIGINT-exact on every
    engine.
    """
    pair_rare, sizes = _gram_pair_parts(df, text_col, id_col, n, max_df)
    sa = sizes.select(
        F.col(id_col).alias("id_a"),
        F.col("n_grams").alias("n_a"),
        F.col("cbm").alias("cbm_a"),
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"),
        F.col("n_grams").alias("n_b"),
        F.col("cbm").alias("cbm_b"),
    )
    inter = (
        F.col("inter_rare") + _popcount_and_udf()("cbm_a", "cbm_b")
    ).cast("long")
    # same AQE-coalescing guard as the Jaccard verify: the pair list
    # is tiny in bytes, the per-row intersection is not (VERDICT r9
    # item 3 — the sf0.1 cold path serialized here)
    scored = (
        spread_for_compute(pair_rare, "id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
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
