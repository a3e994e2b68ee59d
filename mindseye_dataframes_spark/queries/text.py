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
    simhash16,
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
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        simhash16("text").alias("simhash"),
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
