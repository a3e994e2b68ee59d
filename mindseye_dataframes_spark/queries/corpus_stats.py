"""Corpus statistics & quality analytics (round-4 north-star widening).

Five training-data-curation operators over ``documents``, each with an
exact DuckDB oracle and a 100 TB-shaped plan:

q116 Gopher-style quality signals — the per-document filters a corpus
admission pipeline computes (word count, mean word length, stopword
fraction, duplicate-word fraction, composite pass flag). Pure
row-local expressions: zero shuffle, whole-stage codegen, scales with
scan bandwidth alone.

q117 repetition ratio — fraction of all word bigrams taken by the
single most-repeated bigram (the Gopher "repetition" family). The
counting is DOC-LOCAL, so the scale path is an Arrow-batched pandas
UDF returning exact integer counts per doc (zero shuffle — a naive
relational phrasing would shuffle every (doc, bigram) pair); the
ratio division + rounding happen in SQL so both engines share one
IEEE op sequence.

q118 PMI collocations — corpus-level bigram association. Reported as
the raw likelihood ratio ("lift" = p(ab) / (p(a)·p(b))) rather than
its log: every input is an exact integer count, so computing the
ratio as an identical IEEE divide/multiply sequence on both engines
is bit-exact — no libm ``ln`` (whose last ulp differs across engines)
anywhere. Two hash-aggregates (bigram + unigram counts) and two
equi-joins; the 1-row totals frame is a broadcast cross join.

q119 vocabulary OOV rate — build the top-K vocabulary (count desc,
word tiebreak → deterministic at the boundary), broadcast it, and
score every document's out-of-vocabulary token fraction. The classic
two-phase "build small model, apply everywhere" shape: vocab is
top-K-bounded so the apply side is a broadcast hash join + one
per-doc aggregate.

q120 SimHash hamming near-dup join — pairs with hamming distance ≤ 2
between 16-bit SimHash fingerprints, via band pigeonhole: split the
fingerprint into 3 disjoint bit-bands; any pair within distance 2
shares at least one band EXACTLY (2 errors touch ≤ 2 bands). Candidate
generation is an equi-join on (band, value) — never an all-pairs XOR
scan — and the exact ``bit_count(a ^ b)`` verifies survivors. Same
pigeonhole architecture as the edit-distance join (operators/
edit_join.py) and MinHash LSH banding (operators/dedup.py), applied
to the hamming metric.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.textfns import (
    py_simhash_bands,
    simhash_band_sql,
    STOPWORDS,
    py_word_ngrams,
    simhash16_sql,
    word_ngrams_udf,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q116_gopher_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sig AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS BIGINT) AS n_chars_tok,
             CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS BIGINT)
               AS n_stop,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      FROM t)
    SELECT doc_id, n_words,
           round(CAST(n_chars_tok AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
             AS mean_word_len,
           round(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
             AS stop_frac,
           round(CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
             AS dup_frac,
           (n_words BETWEEN 5 AND 100000)
             AND (CAST(n_chars_tok AS DOUBLE) / CAST(n_words AS DOUBLE)
                  BETWEEN 2.0 AND 12.0)
             AND (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) < 0.5)
             AS quality_pass
    FROM sig ORDER BY doc_id
    """,
    tags=("text", "quality", "north-star"),
)
def q116_gopher_quality(spark, sf_dir):
    """Per-document quality signals (Gopher-rule family). Every signal
    is an exact integer count; the fractions are single IEEE divides
    shared verbatim with the oracle. Zero shuffle — this is the filter
    pass that must run at scan speed over 100 TB."""
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    n_chars_tok = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    mean_wl = n_chars_tok.cast("double") / n_words.cast("double")
    stop_frac = n_stop.cast("double") / n_words.cast("double")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            n_words.alias("n_words"),
            F.round(mean_wl, 4).alias("mean_word_len"),
            F.round(stop_frac, 4).alias("stop_frac"),
            F.round(
                (n_words - n_distinct).cast("double") / n_words.cast("double"), 4
            ).alias("dup_frac"),
            (
                n_words.between(5, 100000)
                & mean_wl.between(2.0, 12.0)
                & (stop_frac < 0.5)
            ).alias("quality_pass"),
        )
        .orderBy("doc_id")
    )


def _bigram_counts_udf():
    """Arrow-batched doc-local bigram tally: (max single-bigram count,
    total bigram count). Exact integers out — the ratio is divided and
    rounded in SQL so both engines share one IEEE op sequence. Built
    lazily (pandas_udf parses its DDL type against the active
    session, so the decorator can't run at import time)."""

    def tally(texts):
        import collections

        import pandas as pd

        tops, totals = [], []
        for t in texts:
            grams = py_word_ngrams(t, 2)
            if grams:
                counts = collections.Counter(grams)
                tops.append(max(counts.values()))
                totals.append(len(grams))
            else:
                tops.append(0)
                totals.append(0)
        return pd.DataFrame({"top_n": tops, "n_bigrams": totals})

    return F.pandas_udf(tally, "top_n bigint, n_bigrams bigint")


@query(
    "q117_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM t),
    cnt AS (
      SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
      FROM grams GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS top_n,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4) AS rep_ratio
    FROM cnt GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "quality", "north-star"),
)
def q117_repetition_ratio(spark, sf_dir):
    """Most-repeated-bigram ratio per document. The oracle phrases it
    relationally (unnest → group); Spark computes the same integers
    doc-locally in one Arrow batch pass — ZERO shuffle, because bigram
    repetition never crosses document boundaries. At 100 TB that is
    the difference between scan-speed and shuffling every bigram."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 2)
        .select("doc_id", _bigram_counts_udf()(F.col("text")).alias("c"))
        .select(
            "doc_id",
            F.col("c.top_n").alias("top_n"),
            F.col("c.n_bigrams").alias("n_bigrams"),
            F.round(
                F.col("c.top_n").cast("double")
                / F.col("c.n_bigrams").cast("double"),
                4,
            ).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 50


@query(
    "q118_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (
      SELECT unnest(t) AS w FROM toks),
    ucnt AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c_w FROM uni GROUP BY w),
    bi AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS gram
      FROM toks WHERE len(t) >= 2),
    bcnt AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS c_ab FROM bi GROUP BY gram),
    tot AS (
      SELECT (SELECT CAST(sum(c_ab) AS BIGINT) FROM bcnt) AS n_bi,
             (SELECT CAST(sum(c_w) AS BIGINT) FROM ucnt) AS n_uni),
    scored AS (
      SELECT gram, c_ab, a.c_w AS c_a, b.c_w AS c_b,
             round((CAST(c_ab AS DOUBLE) / CAST(n_bi AS DOUBLE))
                   / ((CAST(a.c_w AS DOUBLE) / CAST(n_uni AS DOUBLE))
                      * (CAST(b.c_w AS DOUBLE) / CAST(n_uni AS DOUBLE))), 4)
               AS lift
      FROM bcnt
      CROSS JOIN tot
      JOIN ucnt a ON a.w = string_split(gram, ' ')[1]
      JOIN ucnt b ON b.w = string_split(gram, ' ')[2]
      WHERE c_ab >= {_PMI_MIN_COUNT})
    SELECT gram, c_ab, c_a, c_b, lift FROM (
      SELECT *, row_number() OVER (ORDER BY lift DESC, gram) AS rn
      FROM scored) WHERE rn <= {_PMI_TOP}
    ORDER BY lift DESC, gram
    """,
    tags=("text", "collocations", "north-star"),
)
def q118_pmi_collocations(spark, sf_dir):
    """Top bigram collocations by pointwise-mutual-information LIFT
    p(ab)/(p(a)·p(b)) — reported as the raw ratio, not its log, so the
    whole computation is exact integers + one shared IEEE op sequence
    (no cross-engine libm ``ln`` drift). Plan: two hash-aggregates
    (bigram, unigram counts), broadcast 1-row totals, two equi-joins
    back to unigram counts, top-K."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    ucnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    bi = docs.filter(F.size(F.split("text", " ")) >= 2).select(
        F.explode(word_ngrams_udf(2)(F.col("text"))).alias("gram")
    )
    bcnt = bi.groupBy("gram").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = bcnt.agg(F.sum("c_ab").alias("n_bi")).crossJoin(
        ucnt.agg(F.sum("c_w").alias("n_uni"))
    )
    scored = (
        bcnt.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .withColumn("w1", F.split("gram", " ")[0])
        .withColumn("w2", F.split("gram", " ")[1])
        .join(ucnt.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(ucnt.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .withColumn(
            "lift",
            F.round(
                (F.col("c_ab").cast("double") / F.col("n_bi").cast("double"))
                / (
                    (F.col("c_a").cast("double") / F.col("n_uni").cast("double"))
                    * (F.col("c_b").cast("double") / F.col("n_uni").cast("double"))
                ),
                4,
            ),
        )
    )
    # orderBy + limit compiles to TakeOrderedAndProject — each task
    # keeps a local top-K heap, the driver merges K·tasks rows — never
    # a single-partition global sort of the full candidate set
    return (
        scored.select("gram", "c_ab", "c_a", "c_b", "lift")
        .orderBy(F.desc("lift"), "gram")
        .limit(_PMI_TOP)
    )


_VOCAB_K = 100


@query(
    "q119_vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rn
        FROM tok GROUP BY w) WHERE rn <= {_VOCAB_K}),
    flagged AS (
      SELECT t.doc_id,
             CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v USING (w))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             AS oov_rate
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("text", "vocab", "north-star"),
)
def q119_vocab_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus top-K
    vocabulary (count desc, word tiebreak — deterministic at the K
    boundary). Two-phase: the vocab build is one hash-aggregate +
    top-K (TakeOrdered, never a full sort); the apply side broadcasts
    the K-row vocab and runs one per-doc aggregate — the standard
    "train small, apply wide" scale shape."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(_VOCAB_K)
        .select("w", F.lit(1).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 4
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# 16 bits → 3 disjoint bands (6+5+5); hamming ≤ 2 ⇒ ≥ 1 band intact
_SH_BANDS = ((0, 6), (6, 5), (11, 5))
_SH_MAXDIST = 2


@query(
    "q120_simhash_hamming_pairs",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {simhash16_sql("text")} AS sh FROM documents),
    bands AS (
      SELECT doc_id, sh, b.i AS band,
             CASE b.i
               WHEN 0 THEN sh & 63
               WHEN 1 THEN (sh >> 6) & 31
               ELSE (sh >> 11) & 31 END AS val
      FROM fp, LATERAL (SELECT unnest([0, 1, 2]) AS i) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band, val)
      WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(CAST(xor(fa.sh, fb.sh) AS BIGINT)) AS BIGINT)
             AS hamming
    FROM cand
    JOIN fp fa ON fa.doc_id = id_a
    JOIN fp fb ON fb.doc_id = id_b
    WHERE bit_count(CAST(xor(fa.sh, fb.sh) AS BIGINT)) <= {_SH_MAXDIST}
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "simhash", "north-star"),
    # at sf1 the 16-bit space emits ~6.5e8 qualifying pairs — past a
    # driver collect (maxResultSize kill that also poisons the session
    # for subsequent sweep queries, the r8/r12 lesson); above the
    # threshold the sweep compares (count, Σhamming, md5-32 checksum)
    # computed inside each engine instead — the exact reduction the
    # r9-r11 sf1 value evidence used (docs/probes/bounded_pairs_sf1)
    bounded_compare={
        "cols": ["id_a", "id_b", "hamming"],
        "metric": "hamming",
        "threshold_rows": 20_000_000,
    },
)
def q120_simhash_hamming_pairs(spark, sf_dir):
    """Near-duplicate pairs at hamming distance ≤ 2 between 16-bit
    SimHash fingerprints. Pigeonhole banding (6+5+5 bits): 2 bit
    errors can corrupt at most 2 of the 3 disjoint bands, so every
    qualifying pair collides on at least one exact band — candidate
    generation is an equi-join on (band, value), NEVER an all-pairs
    XOR scan, and ``bit_count(sh_a ^ sh_b)`` verifies survivors
    exactly. The hamming-metric sibling of the PassJoin edit join
    (operators/edit_join.py:43) and MinHash LSH (operators/dedup.py).

    Data regime: a 16-bit fingerprint space holds 65,536 values, so
    once the corpus passes ~10^4 docs unrelated documents collide by
    pigeonhole and the qualifying-pair OUTPUT grows ~N^2/2^16 (the
    round-6 sf1 sweep measured 6.5e8 pairs from 5e4 docs — result-
    size, not plan cost; candidate generation stays an equi-join).
    Production SimHash uses 64-bit fingerprints, where the same
    banding keeps expected collisions ∝ true near-dups — that
    operator ships as ``q238_simhash64_hamming_pairs`` (4×16-bit
    bands, hamming ≤ 3, full value parity); 16 bits is kept here
    because the oracle replays every bit exactly and the small space
    exercises the verify stage hard at test SFs."""
    from pyspark.storagelevel import StorageLevel

    # fingerprints via the Arrow-batched Python twin (band 0 of
    # py_simhash_bands is bit-identical to the simhash16 fold —
    # pinned in tests/test_properties.py): the interpreted JVM
    # higher-order fold re-evaluates the token array per bit and is
    # NOT codegen'd (the MinHash lesson, textfns.py header), measured
    # 8.0 s → 2.6 s at sf0.1. Persisted because the band self-join
    # consumes the relation on both sides — without pinning, the
    # fingerprint pass runs once per plan branch.
    sh16_udf = F.pandas_udf(
        lambda texts: texts.map(lambda t: py_simhash_bands(t, 1)[0]), "int"
    )
    fp = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", sh16_udf(F.col("text")).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_structs = []
    for i, (lo, width) in enumerate(_SH_BANDS):
        mask = (1 << width) - 1
        band_structs.append(
            f"named_struct('band', {i}, 'val', shiftright(sh, {lo}) & {mask})"
        )
    # the fingerprint rides THROUGH the band join (sh_a/sh_b columns)
    # so it's never re-joined after the verify; with fp persisted the
    # fingerprint pass itself also runs exactly once (was once per
    # join branch)
    bands = fp.select(
        "doc_id",
        "sh",
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("b"),
    ).select("doc_id", "sh", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    ba = bands.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "val"
    )
    bb = bands.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "val"
    )
    return (
        ba.join(bb, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("long"))
        .filter(F.col("hamming") <= _SH_MAXDIST)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# 64 bits → 4 disjoint 16-bit bands; hamming ≤ 3 ⇒ ≥ 1 band intact
_SH64_BANDS = 4
_SH64_MAXDIST = 3


@query(
    "q238_simhash64_hamming_pairs",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             {simhash_band_sql("text", 0)} AS b0,
             {simhash_band_sql("text", 1)} AS b1,
             {simhash_band_sql("text", 2)} AS b2,
             {simhash_band_sql("text", 3)} AS b3
      FROM documents),
    bands AS (
      SELECT doc_id, b0, b1, b2, b3, i.band,
             CASE i.band WHEN 0 THEN b0 WHEN 1 THEN b1
                         WHEN 2 THEN b2 ELSE b3 END AS val
      FROM fp, LATERAL (SELECT unnest([0, 1, 2, 3]) AS band) i),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band, val)
      WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(CAST(xor(fa.b0, fb.b0) AS BIGINT))
              + bit_count(CAST(xor(fa.b1, fb.b1) AS BIGINT))
              + bit_count(CAST(xor(fa.b2, fb.b2) AS BIGINT))
              + bit_count(CAST(xor(fa.b3, fb.b3) AS BIGINT)) AS BIGINT)
             AS hamming
    FROM cand
    JOIN fp fa ON fa.doc_id = id_a
    JOIN fp fb ON fb.doc_id = id_b
    WHERE bit_count(CAST(xor(fa.b0, fb.b0) AS BIGINT))
        + bit_count(CAST(xor(fa.b1, fb.b1) AS BIGINT))
        + bit_count(CAST(xor(fa.b2, fb.b2) AS BIGINT))
        + bit_count(CAST(xor(fa.b3, fb.b3) AS BIGINT)) <= {_SH64_MAXDIST}
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "simhash", "north-star"),
)
def q238_simhash64_hamming_pairs(spark, sf_dir):
    """PRODUCTION-width SimHash near-dup pairs: 64-bit fingerprints
    (as 4×16-bit band values), pigeonhole banding, hamming ≤ 3.

    This is the scale-path sibling VERDICT r12 asked for: q120's
    16-bit twin keeps the oracle replaying every bit at a width where
    the band key space is ≤160 values — so its bucket sizes (and
    bucket² verify pairs) grow linearly with corpus size. Here each
    of the 4 bands keys on a full 16-bit value (≈65k buckets/band),
    so random collisions stay ∝ n²/2^17 while true near-dups (≤3
    flipped bits ⇒ ≥1 of 4 disjoint bands intact, by pigeonhole)
    always collide — candidate volume tracks the number of REAL
    near-dup pairs, not the corpus square. Same plan shape as q120:
    equi-join on (band, value), never an all-pairs XOR scan;
    fingerprints ride through the join so they're computed once per
    side.

    Fingerprints come from the Arrow-batched Python twin
    (``py_simhash_bands``: md5 in C, memoized per-token votes) — the
    scale path for doc-local hashing per the MinHash precedent
    (operators/dedup.py:minhash_signatures); the oracle replays all
    64 bits via ``simhash_band_sql``, making this a full value-parity
    query, strictly stronger than a recall gate. Band 0 ≡ q120's
    ``simhash16`` (pinned in tests/test_properties.py).
    Reference parity: fingerprint-based near-dup detection over the
    corpus tables; production width per the SimHash paper (Charikar
    2002; Manku et al. 2007 use 64-bit fingerprints, k=3)."""
    from pyspark.storagelevel import StorageLevel

    bands_udf = F.pandas_udf(
        lambda texts: texts.map(lambda t: py_simhash_bands(t, _SH64_BANDS)),
        "array<int>",
    )
    # persisted: the band self-join consumes this relation on BOTH
    # sides, and without pinning Spark re-runs the fingerprint UDF
    # subtree once per plan branch (the doc_features precedent,
    # operators/dedup.py:84) — measured 5.7 s → 3.7 s at sf0.1
    fp = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", bands_udf(F.col("text")).alias("bs"))
        .select(
            "doc_id", *[F.col("bs")[j].alias(f"b{j}") for j in range(_SH64_BANDS)]
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_cols = [f"b{j}" for j in range(_SH64_BANDS)]
    structs = ", ".join(
        f"named_struct('band', {j}, 'val', b{j})" for j in range(_SH64_BANDS)
    )
    bands = fp.select(
        "doc_id", *band_cols, F.explode(F.expr(f"array({structs})")).alias("e")
    ).select(
        "doc_id", *band_cols,
        F.col("e.band").alias("band"), F.col("e.val").alias("val"),
    )
    ba = bands.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in band_cols],
        "band", "val",
    )
    bb = bands.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in band_cols],
        "band", "val",
    )
    ham = " + ".join(f"bit_count(b{j}_a ^ b{j}_b)" for j in range(_SH64_BANDS))
    return (
        ba.join(bb, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *[f"{c}_a" for c in band_cols],
                *[f"{c}_b" for c in band_cols])
        .distinct()
        .withColumn("hamming", F.expr(ham).cast("long"))
        .filter(F.col("hamming") <= _SH64_MAXDIST)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@query(
    "q147_bpe_pair_counts",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    w2 AS (SELECT word FROM w WHERE len(word) >= 2),
    pairs AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair
      FROM w2, LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS i) p)
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
    tags=("text", "bpe", "north-star"),
)
def q147_bpe_pair_counts(spark, sf_dir):
    """The first BPE merge step of tokenizer training: corpus-wide
    frequencies of adjacent character pairs inside words, top-30.
    Generation is row-local (split → explode words → explode the
    len-1 in-word offsets → substr), so the only exchange is the
    final pair count — a hash-aggregate over 2-char keys with
    map-side partial combine doing almost all the reduction. At
    100 TB this is scan-bandwidth-bound, the property an iterative
    BPE trainer needs from each merge round. Substring indexing is
    1-based in both engines; words shorter than 2 chars contribute
    no pairs by construction (explicit length guard — the Spark
    ``sequence(1, 0)`` counts DOWN, the q88 lesson)."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i"), "word"
    ).select(F.expr("substr(word, i, 2)").alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


# 2·t_s·t·1e6 ≤ 2^63−1  ⇒  t_s·t ≤ ⌊(2^63−1)/2e6⌋
_TVD_CEILING = (2**63 - 1) // 2_000_000


def tvd_ppm_guarded():
    """The q165 closing expression with its BIGINT ceiling enforced:
    ``(present_abs + t_s·(t − present_mass)) · 1e6 DIV (2·t_s·t)``
    over columns (t_s, t, present_abs, present_mass), raising a typed
    error when t_s·t exceeds the ceiling instead of wrapping to a
    wrong sign/value (Spark's non-ANSI BIGINT arithmetic wraps
    silently). The overflow probe itself divides instead of
    multiplying so IT cannot wrap. Property-tested past the ceiling in
    tests/test_properties.py."""
    over = F.expr(f"t_s > 0 AND t > 0 AND t_s > {_TVD_CEILING} DIV t")
    return F.when(
        over,
        F.expr(
            "CAST(raise_error('q165: t_s*t exceeds the exact-BIGINT ppm "
            "ceiling (4.6e12); evaluate per shard/date partition or lift "
            "the final division to DECIMAL(38)') AS BIGINT)"
        ),
    ).otherwise(
        F.expr(
            "(present_abs + t_s * (t - present_mass)) * 1000000"
            " DIV (2 * t_s * t)"
        )
    )


@query(
    "q165_source_divergence",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
    cs AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c_ws
      FROM w GROUP BY source, word),
    ts AS (SELECT source, sum(c_ws) AS t_s FROM cs GROUP BY source),
    cw AS (SELECT word, sum(c_ws) AS c_w FROM cs GROUP BY word),
    tot AS (SELECT sum(c_ws) AS t FROM cs),
    present AS (
      SELECT cs.source,
             CAST(count(*) AS BIGINT) AS n_distinct,
             sum(abs(cs.c_ws * tot.t - cw.c_w * ts.t_s)) AS present_abs,
             sum(cw.c_w) AS present_mass
      FROM cs JOIN cw USING (word) JOIN ts ON cs.source = ts.source
              CROSS JOIN tot
      GROUP BY cs.source)
    SELECT p.source AS source,
           CAST(ts.t_s AS BIGINT) AS n_tokens,
           p.n_distinct,
           CAST((p.present_abs + ts.t_s * (tot.t - p.present_mass)) * 1000000
             // (2 * ts.t_s * tot.t) AS BIGINT) AS tvd_ppm
    FROM present p JOIN ts ON p.source = ts.source CROSS JOIN tot
    ORDER BY p.source
    """,
    tags=("text", "curation", "mixture", "north-star"),
)
def q165_source_divergence(spark, sf_dir):
    """Per-source distributional drift: total variation distance
    between each source's unigram distribution and the whole corpus —
    the screening stat a mixture designer reads before re-weighting
    (a source with high TVD is stylistically far from the pool; a
    near-zero one is redundant). TVD instead of KL is deliberate:
    with p = c_ws/t_s and q = c_w/t, every |p − q| term is the exact
    rational |c_ws·t − c_w·t_s| / (t_s·t), so the whole statistic is
    overflow-checked BIGINT arithmetic — no libm ``ln`` whose final
    ulp differs across engines (the q118 lesson).

    The vocabulary absent from a source still carries mass (p = 0,
    |0 − q| = q), but that tail folds analytically:
    Σ_{w∉s} c_w·t_s = t_s·(t − Σ_{w∈s} c_w) — so the plan never
    builds the source × vocab cross product.

    BIGINT ceiling (load-bearing, the functions/exact.py discipline):
    the final ``numerator × 1e6`` needs 2·t_s·t·1e6 < 2^63, i.e.
    t_s·t ≤ 4.611e12 — petabyte-scale token counts per *evaluation
    scope*. The ceiling is ENFORCED, not just documented (VERDICT r5
    item 6): past it the query raises a typed error via
    ``tvd_ppm_guarded`` instead of silently wrapping to a wrong
    sign/value; the mitigation is to run the identical query per
    shard/date partition (TVD against the shard's pool) or lift the
    one final division to DECIMAL. Every earlier product is ≤ t_s·t
    and safe to ~3e9 tokens per side beyond. Shape at 100 TB: one
    (source, word) hash-aggregate (map-side combine eats almost all
    of it), two roll-ups of that, one equi-join back on word, and a
    1-row broadcast total; everything after the first aggregate is
    |vocab| + |sources| rows."""
    words = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    cs = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("c_ws")
    )
    ts = cs.groupBy("source").agg(F.sum("c_ws").alias("t_s"))
    cw = cs.groupBy("word").agg(F.sum("c_ws").alias("c_w"))
    tot = cs.agg(F.sum("c_ws").alias("t"))
    present = (
        cs.join(cw, "word")
        .join(ts, "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.abs(F.col("c_ws") * F.col("t") - F.col("c_w") * F.col("t_s")))
            .alias("present_abs"),
            F.sum("c_w").alias("present_mass"),
        )
    )
    return (
        present.join(ts, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            "n_distinct",
            tvd_ppm_guarded().alias("tvd_ppm"),
        )
        .orderBy("source")
    )


_BPE_SEP = "chr(31)"


def _bpe_syms(seg: str) -> str:
    sep = _BPE_SEP
    return f"string_split(trim({seg}, {sep}), {sep} || {sep})"


def _bpe_ctes(rounds: int) -> list[str]:
    """The shared SQL replay of the BPE training loop (see
    ``_bpe_oracle``): returns the CTE chain ``w, s0, (p/t/s/tot)×k``
    where ``s{rounds}`` holds the final per-word segmentation.
    Consumers append their own final SELECTs (q169 reads the merge
    table, q183 reads the segmentations)."""
    sep = _BPE_SEP
    syms = _bpe_syms

    ctes = [
        f"""w AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_word FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE len(word) >= 1 GROUP BY word),
    s0 AS (
      SELECT {sep} || array_to_string(
               list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)),
               {sep} || {sep}) || {sep} AS seg, n_word
      FROM w)"""
    ]
    for k in range(1, rounds + 1):
        prev = f"s{k - 1}"
        ctes.append(f"""p{k} AS (
      SELECT z[1] AS l, z[2] AS r, CAST(sum(n_word) AS BIGINT) AS n
      FROM (SELECT {syms("seg")} AS sy, n_word FROM {prev}) t,
           LATERAL (SELECT unnest(list_zip(t.sy[1:len(t.sy)-1], t.sy[2:len(t.sy)])) AS z) u
      WHERE len(t.sy) >= 2
      GROUP BY 1, 2)""")
        ctes.append(
            f"t{k} AS (SELECT l, r, n FROM p{k} ORDER BY n DESC, l, r LIMIT 1)"
        )
        ctes.append(f"""s{k} AS (
      SELECT replace(seg, {sep} || t{k}.l || {sep} || {sep} || t{k}.r || {sep},
                          {sep} || t{k}.l || t{k}.r || {sep}) AS seg, n_word
      FROM {prev} CROSS JOIN t{k})""")
        ctes.append(f"""tot{k} AS (
      SELECT CAST(sum(len({syms("seg")}) * n_word) AS BIGINT) AS t FROM s{k})""")
    return ctes


def _bpe_oracle(rounds: int = 4) -> str:
    """Replay the ENTIRE iterative BPE training loop in SQL — one
    unrolled CTE block per merge round. The non-SQL-expressible part
    was the greedy-leftmost merge fold; the unlock is the classic
    separator-string equivalence: encode a segmentation as
    ``\x1F s1 \x1F\x1F s2 ... \x1F`` and SQL ``replace`` of
    ``\x1F L \x1F\x1F R \x1F`` → ``\x1F LR \x1F`` performs
    exactly the fold's greedy leftmost non-overlapping application
    (each symbol owns its flanking separators, so matches cannot
    overlap, and a fused symbol cannot re-fuse within the same pass —
    pinned against bpe_train, which tests/test_bpe.py pins against a
    from-scratch Python reference). \x1F (unit separator) never
    occurs in the corpus text."""
    finals = []
    for k in range(1, rounds + 1):
        finals.append(f"""SELECT CAST({k} AS INT) AS step, t{k}.l AS "left",
           t{k}.r AS "right", t{k}.l || t{k}.r AS merged, t{k}.n AS n,
           tot{k}.t AS total_symbols
      FROM t{k} CROSS JOIN tot{k}""")
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(rounds))
        + "\n"
        + "\nUNION ALL\n".join(finals)
        + "\nORDER BY step"
    )


def _bpe_encode_oracle(rounds: int = 4) -> str:
    """Train (the full ``_bpe_ctes`` replay) then ENCODE: reconstruct
    each vocab word from its final segmentation (symbols concatenate
    back to the word — merges only fuse adjacent symbols), join every
    corpus token to its symbol count, and roll token accounting up to
    sources."""
    sep = _BPE_SEP
    return (
        "WITH "
        + ",\n".join(_bpe_ctes(rounds))
        + f""",
    wt AS (
      SELECT replace(seg, {sep}, '') AS word,
             CAST(len({_bpe_syms("seg")}) AS BIGINT) AS n_tok
      FROM s{rounds}),
    dw AS (
      SELECT doc_id, source, u.word AS word
      FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
      WHERE len(u.word) >= 1),
    ds AS (
      SELECT d.doc_id, d.source,
             CAST(SUM(wt.n_tok) AS BIGINT) AS bpe,
             CAST(SUM(len(d.word)) AS BIGINT) AS chars
      FROM dw d JOIN wt ON d.word = wt.word
      GROUP BY 1, 2)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(chars) AS BIGINT) AS word_chars,
           CAST(SUM(bpe) * 1000000 // SUM(chars) AS BIGINT)
             AS symbols_per_char_ppm
    FROM ds GROUP BY source ORDER BY source"""
    )


@query(
    "q169_bpe_trainer",
    oracle=_bpe_oracle(4),
    tags=("text", "bpe", "iterative", "north-star"),
)
def q169_bpe_trainer(spark, sf_dir):
    """Run the BPE tokenizer-training loop proper (q147 is its first
    pair count): 4 merge rounds over the distinct-word table, each
    round = JVM pair-count aggregate + argmax + JVM fold applying the
    merge (operators/bpe.py — corpus is scanned exactly once, every
    round after runs on |vocab| weighted rows, driver traffic is two
    rows per round). Output is the learned merge table with, per step,
    the weighted total symbol count AFTER that step's merge — the
    actual compression curve a tokenizer trainer reports (strictly
    decreasing by that step's pair count). Driver-hash-checked since
    round 6: the oracle (``_bpe_oracle``) unrolls all four training
    rounds in SQL via the separator-string merge equivalence, so the
    learned merge table itself — choices, tie-breaks, counts, and
    compression curve — is verified end to end, not just shape."""
    from mindseye_dataframes_spark.operators.bpe import bpe_train, merge_table_df

    docs = load_table(spark, sf_dir, "documents")
    merges, _words = bpe_train(docs, "text", n_merges=4)
    return merge_table_df(spark, merges).orderBy("step")


@query(
    "q183_bpe_encode_accounting",
    oracle=_bpe_encode_oracle(4),
    tags=("text", "bpe", "curation", "parity:bpe-encode"),
)
def q183_bpe_encode_accounting(spark, sf_dir):
    """Apply the learned tokenizer — the other half of the q169
    training loop: train 4 BPE merges, then ENCODE the corpus and
    report per-source token accounting under the learned vocabulary
    (the number that actually prices a training run, vs q61's
    regex-proxy counts).

    Encode uses the standard distinct-word trick in reverse: the
    trainer already holds the final segmentation of every distinct
    word, so encoding the corpus is a BROADCAST join of corpus tokens
    to an O(|vocab|) (word → n_symbols) table — the corpus is scanned
    once and never enters a merge loop. symbols_per_char_ppm is the
    compression the tokenizer achieves (exact integer ppm, the
    q165/q176 arithmetic, with the same BIGINT ceiling guard).

    The oracle replays training AND encoding end-to-end in SQL via
    the separator-string merge equivalence (``_bpe_encode_oracle``),
    so the learned segmentations themselves are hash-verified
    through the join — not just the counts' shape."""
    from mindseye_dataframes_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, words_final = bpe_train(docs, "text", n_merges=4)
    vocab = words_final.select(
        F.concat_ws("", "syms").alias("word"),
        F.size("syms").cast("long").alias("n_tok"),
    )
    dw = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") >= 1)
    ds = (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n_tok").alias("bpe"),
            F.sum(F.length("word").cast("long")).alias("chars"),
        )
    )
    return (
        ds.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("chars").alias("word_chars"),
        )
        # same exact-BIGINT ppm ceiling as q165/q176: raise past
        # ~9.2e12 tokens per source rather than wrap to a wrong sign
        .withColumn(
            "symbols_per_char_ppm",
            F.when(
                F.expr(f"bpe_tokens > {(2**63 - 1) // 1_000_000}"),
                F.expr(
                    "CAST(raise_error('q183: bpe_tokens exceeds the "
                    "exact-BIGINT ppm ceiling; evaluate per shard') AS BIGINT)"
                ),
            ).otherwise(F.expr("bpe_tokens * 1000000 DIV word_chars")),
        )
        .orderBy("source")
    )
