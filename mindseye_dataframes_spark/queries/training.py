"""Training-data layout queries (north-star ★): n-gram Jaccard dedup,
GPT-style sequence packing, seeded epoch shuffle, mixture-weighted
sampling. These are the post-curation ops a pre-training pipeline runs
between "clean corpus" and "token blocks on disk".

All four are fully oracle-checked: the layout decisions (offsets,
block ids, shuffle positions, keep/drop) are deterministic functions
of (content, seed), so DuckDB reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.dedup import ngram_jaccard_pairs
from mindseye_dataframes_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
    seeded_shuffle,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_NGRAM_N = 8
_NGRAM_MAXDF = 50
_NGRAM_THRESHOLD = 0.5


@query(
    "q80_ngram_jaccard_pairs",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN len(text) >= {_NGRAM_N}
                  THEN list_distinct(list_transform(range(1, len(text) - {_NGRAM_N} + 2),
                       i -> substr(text, i, {_NGRAM_N})))
                  ELSE [text] END AS grams
      FROM documents
    ), postings AS (
      SELECT doc_id, unnest(grams) AS gr FROM g
    ), rare AS (
      SELECT gr FROM postings GROUP BY gr HAVING COUNT(*) <= {_NGRAM_MAXDF}
    ), rp AS (
      SELECT postings.doc_id, postings.gr FROM postings JOIN rare USING (gr)
    ), cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rp a JOIN rp b USING (gr)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             / CAST(len(ga.grams) + len(gb.grams)
                    - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) AS jaccard
    FROM cands
    JOIN g ga ON ga.doc_id = id_a
    JOIN g gb ON gb.doc_id = id_b
    WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / CAST(len(ga.grams) + len(gb.grams)
                   - len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
          >= {_NGRAM_THRESHOLD}
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "training", "parity:ngram-jaccard"),
)
def q80_ngram_jaccard_pairs(spark, sf_dir):
    """Character-8-gram Jaccard near-dup pairs via inverted-index
    candidates (df ≤ 50) — the exact-candidate complement to q32's
    MinHash-LSH (`operators/dedup.py:ngram_jaccard_pairs`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=_NGRAM_N,
        threshold=_NGRAM_THRESHOLD, max_df=_NGRAM_MAXDF,
    ).orderBy("id_a", "id_b")


_BLOCK = 256


@query(
    "q81_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), o AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(floor(start_offset / {_BLOCK}) AS BIGINT) AS first_block,
           CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / {_BLOCK}) AS BIGINT) AS last_block,
           CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / {_BLOCK})
                - floor(start_offset / {_BLOCK}) + 1 AS BIGINT) AS n_blocks
    FROM o ORDER BY doc_id
    """,
    tags=("training", "packing", "parity:sequence-packing"),
)
def q81_pack_sequences(spark, sf_dir):
    """GPT-style packing: concatenate token streams in doc_id order,
    chop into 256-token blocks; each doc gets its global offset and
    block span. The offset scan is the two-phase distributed prefix
    sum (`operators/packing.py:with_global_prefix_sum`) — no
    single-partition window."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        pack_sequences(docs, "n_tokens", ["doc_id"], _BLOCK)
        .select("doc_id", "n_tokens", "start_offset",
                "first_block", "last_block", "n_blocks")
        .orderBy("doc_id")
    )


_SHUFFLE_SEED = "epoch-0"


@query(
    "q82_seeded_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5('{_SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)))
                - 1 AS BIGINT) AS shuffle_pos
    FROM documents ORDER BY doc_id
    """,
    tags=("training", "shuffle", "parity:seeded-shuffle"),
)
def q82_seeded_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle: dense position ordered by
    md5(seed:doc_id). Engine-portable (md5), cluster-size-invariant,
    and the range exchange on the hash IS the data movement
    (`operators/packing.py:seeded_shuffle`)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return seeded_shuffle(docs, ["doc_id"], _SHUFFLE_SEED).orderBy("doc_id")


_MIX_RATES = {"en": 0.8, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.1}
_MIX_BUCKETS = 10_000


@query(
    "q83_mixture_sample",
    oracle=f"""
    WITH rates(lang, keep_below) AS (VALUES
      {", ".join(f"('{g}', {int(round(r * _MIX_BUCKETS))})" for g, r in sorted(_MIX_RATES.items()))}
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN rates USING (lang)
    WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
            % {_MIX_BUCKETS} < rates.keep_below
    ORDER BY d.doc_id
    """,
    tags=("training", "sampling", "parity:mixture-sample"),
)
def q83_mixture_sample(spark, sf_dir):
    """Mixture-weighted corpus sampling: per-language keep rates
    applied via a deterministic md5 bucket — broadcast join + map-side
    filter, zero fact-table shuffles
    (`operators/packing.py:mixture_sample`)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, "lang", "doc_id", _MIX_RATES, buckets=_MIX_BUCKETS)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
