"""LLM corpus-preparation operators (north-star §2B extensions).

Five first-class pipeline stages a 100 TB training-data build needs,
each engine-exact against the DuckDB oracle:

q86 PII redaction — regex detect + replace. The synthetic corpus has
no real PII, so contact cards are built deterministically from
``customer`` and then redacted; the operator under test is the
redaction expression itself (`regexp_replace`/`regexp_count`), a pure
narrow map that whole-stage-codegens — zero shuffle at any scale.

q87 contamination screen — flag corpus documents sharing a word
8-gram with a benchmark set (here: ``source='src0'`` stands in for an
eval suite). Classic decontamination: shingle both sides, broadcast
the benchmark's distinct shingles (benchmark sets are small by
definition), equi-join. At 100 TB the corpus side stays shuffle-free:
shingling is a generate+explode map and the join is broadcast-hash.

q88 document chunking — fixed-width overlapping character windows
(stride 90, width 120), the standard context-window prep. Pure
row-local generate+explode: no shuffle, parallelism scales with input
splits. Chunks are emitted as md5 digests + lengths so the oracle
compares exactly without hauling text.

q89 corpus extremes — per-source arg-min/max (``max_by``/``min_by``
with a collision-free padded-string tuple rank: ties on n_chars
broken by doc_id so both engines pick the same row, no id ceiling).
One hash-aggregate, one exchange.

q90 vector features via higher-order functions — per-embedding
positive-component count, L1 norm, sum of squares, max |x| computed
with ``filter``/``aggregate``/``transform`` lambdas (JVM-side, no
Python). float→double casts are exact; both engines fold
left-to-right from a zero/first-element seed so the double sums are
bitwise-reproducible; round(4) guards the residual libm edge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import oracle_tuple_rank, tuple_rank
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_EMAIL = r"[a-z0-9.]+@[a-z0-9.]+[a-z]"
_PHONE = r"\+1-555-[0-9]{4}"


@query(
    "q86_pii_redaction",
    oracle=rf"""
    WITH card AS (
      SELECT c_custkey,
             'contact ' || lower(replace(c_name, '#', '.')) ||
             '@example.com or +1-555-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' for ' || c_mktsegment AS txt
      FROM customer)
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(txt, '{_EMAIL}', '[EMAIL]', 'g'),
             '{_PHONE}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(txt, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE}')) AS BIGINT) AS n_phones
    FROM card ORDER BY c_custkey
    """,
    tags=("text", "pii", "north-star"),
)
def q86_pii_redaction(spark, sf_dir):
    card = F.concat(
        F.lit("contact "),
        F.lower(F.regexp_replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" for "),
        F.col("c_mktsegment"),
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey"), card.alias("txt"))
        .select(
            "c_custkey",
            F.regexp_replace(
                F.regexp_replace(F.col("txt"), F.lit(_EMAIL), F.lit("[EMAIL]")),
                F.lit(_PHONE),
                F.lit("[PHONE]"),
            ).alias("redacted"),
            F.regexp_count(F.col("txt"), F.lit(_EMAIL)).cast("long").alias("n_emails"),
            F.regexp_count(F.col("txt"), F.lit(_PHONE)).cast("long").alias("n_phones"),
        )
        .orderBy("c_custkey")
    )


# word 8-gram shingles via the Arrow-batched UDF (3× faster than the
# interpreted SQL transform form — see functions/textfns.word_ngrams_udf);
# duplicates are kept and removed relationally below, matching the
# oracle's unnest+DISTINCT semantics


@query(
    "q87_contamination_screen",
    oracle="""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest(list_transform(generate_series(1, len(ws) - 7),
                         i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS shingle
           FROM w),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    corp AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> 'src0')
    SELECT corp.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM corp JOIN bench USING (shingle)
    GROUP BY corp.doc_id ORDER BY n_shared DESC, doc_id
    """,
    tags=("dedup", "contamination", "north-star"),
)
def q87_contamination_screen(spark, sf_dir):
    from mindseye_dataframes_spark.functions.textfns import word_ngrams_udf

    docs = load_table(spark, sf_dir, "documents")
    sh = F.explode(word_ngrams_udf(8)(F.col("text"))).alias("shingle")
    bench = (
        docs.filter(F.col("source") == "src0").select(sh).distinct()
    )
    corp = (
        docs.filter(F.col("source") != "src0")
        .select(F.col("doc_id"), sh)
        .distinct()
    )
    return (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(F.desc("n_shared"), "doc_id")
    )


@query(
    "q88_chunk_documents",
    oracle="""
    SELECT doc_id, (s.start - 1) // 90 AS chunk_id, s.start,
           CAST(length(substr(text, CAST(s.start AS INT), 120)) AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(s.start AS INT), 120)) AS chunk_md5
    FROM documents,
         LATERAL (SELECT unnest(generate_series(1, n_chars, 90)) AS start) s
    ORDER BY doc_id, chunk_id
    """,
    tags=("text", "chunking", "north-star"),
)
def q88_chunk_documents(spark, sf_dir):
    """Empty docs yield zero chunks: Spark's sequence(1, 0, 90) THROWS
    (DuckDB's generate_series returns no rows), so guard n_chars > 0
    before the explode — same semantics, no crash on empty input."""
    chunk = F.expr("substring(text, CAST(start AS INT), 120)")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "text",
            F.explode(F.expr("sequence(1, n_chars, 90)")).alias("start"),
        )
        .select(
            "doc_id",
            F.expr("CAST((start - 1) DIV 90 AS BIGINT)").alias("chunk_id"),
            "start",
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "q89_corpus_extremes",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           arg_max(doc_id, {oracle_tuple_rank("n_chars", "doc_id")}) AS longest_doc,
           arg_min(doc_id, {oracle_tuple_rank("n_chars", "doc_id")}) AS shortest_doc,
           median(n_chars) AS median_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    tags=("agg", "parity:max_by"),
)
def q89_corpus_extremes(spark, sf_dir):
    """Longest/shortest doc per source via collision-free padded-string
    tuple rank (no doc_id ceiling — see functions/exact.py)."""
    rank = tuple_rank("n_chars", "doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max_by(F.col("doc_id"), rank).alias("longest_doc"),
            F.min_by(F.col("doc_id"), rank).alias("shortest_doc"),
            F.median("n_chars").alias("median_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "q90_vector_features",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_reduce(
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
             (a, x) -> a + x), 4) AS l1,
           round(list_reduce(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (a, x) -> a + x), 4) AS sumsq,
           round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4)
             AS maxabs
    FROM embeddings ORDER BY vec_id
    """,
    tags=("vector", "higher-order", "north-star"),
)
def q90_vector_features(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("n_pos"),
            F.round(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (a, x) -> a + abs(CAST(x AS DOUBLE)))"
                ),
                4,
            ).alias("l1"),
            F.round(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
                ),
                4,
            ).alias("sumsq"),
            F.round(
                F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"),
                4,
            ).alias("maxabs"),
        )
        .orderBy("vec_id")
    )


def _admission_oracle() -> str:
    from mindseye_dataframes_spark.functions.textfns import STOPWORDS

    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents WHERE source <> 'src0'),
    sig AS (
      SELECT doc_id, source,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum')
                  AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_wl,
             CAST(len(list_filter(ws, x -> x IN ({stop_in}))) AS DOUBLE)
               / CAST(len(ws) AS DOUBLE) AS stop_frac,
             md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS bag_fp
      FROM base),
    dup AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY bag_fp) < doc_id AS is_dup
      FROM sig),
    bench AS (
      SELECT DISTINCT
             unnest(list_transform(generate_series(1, len(string_split(text,' ')) - 7),
                    i -> array_to_string(list_slice(string_split(text,' '), i, i + 7), ' ')))
               AS shingle
      FROM documents WHERE source = 'src0'),
    contam AS (
      SELECT DISTINCT b.doc_id
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - 7),
                          i -> array_to_string(list_slice(ws, i, i + 7), ' ')))
                     AS shingle
            FROM base) b JOIN bench USING (shingle)),
    verdicts AS (
      SELECT s.source, s.n_words,
             CASE
               WHEN NOT ((s.n_words BETWEEN 5 AND 100000)
                         AND (s.mean_wl BETWEEN 2.0 AND 12.0)
                         AND (s.stop_frac < 0.5)) THEN 'quality'
               WHEN d.is_dup THEN 'duplicate'
               WHEN c.doc_id IS NOT NULL THEN 'contaminated'
               ELSE 'admitted'
             END AS verdict
      FROM sig s JOIN dup d ON s.doc_id = d.doc_id
                 LEFT JOIN contam c ON s.doc_id = c.doc_id)
    SELECT source, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens
    FROM verdicts GROUP BY source, verdict
    ORDER BY source, verdict
    """


@query(
    "q171_corpus_admission_pipeline",
    oracle=_admission_oracle(),
    tags=("curation", "pipeline", "quality", "dedup", "north-star"),
)
def q171_corpus_admission_pipeline(spark, sf_dir):
    """The whole corpus-admission decision as ONE declared job — the
    audit table an ingestion run publishes: every candidate document
    (src0 is the held-out benchmark, so it is never admitted) gets a
    first-reason-wins verdict — 'quality' (fails the q116 Gopher
    composite), else 'duplicate' (a lower-id doc has the same q33
    bag fingerprint), else 'contaminated' (shares an 8-token shingle
    with the benchmark, q87's screen), else 'admitted' — rolled up to
    (source, verdict) doc/token counts. Composing the three families
    in one plan is the point: the driver verifies the precedence
    logic end-to-end, not just each filter alone.

    Scale shape: quality signals are row-local expressions at the
    scan; the dup flag is one window over bag fingerprints (32-hex
    shuffle keys, never text); contamination is the q87 broadcast
    semi-join on shingles; the rollup is one hash-aggregate. Three
    narrow exchanges total, nothing quadratic, no raw text past its
    own stage."""
    from mindseye_dataframes_spark.functions.textfns import (
        STOPWORDS,
        bag_fingerprint,
        word_ngrams_udf,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("source") != "src0")
    ws = F.split("text", " ")
    n_words = F.size(ws).cast("long")
    mean_wl = (
        F.aggregate(ws, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_words.cast("double")
    )
    stop_frac = (
        F.size(F.filter(ws, lambda x: x.isin(*STOPWORDS))).cast("double")
        / n_words.cast("double")
    )
    sig = base.select(
        "doc_id",
        "source",
        "text",
        n_words.alias("n_words"),
        (
            n_words.between(5, 100000)
            & mean_wl.between(2.0, 12.0)
            & (stop_frac < 0.5)
        ).alias("quality_ok"),
        bag_fingerprint("text").alias("bag_fp"),
    )
    sig = sig.withColumn(
        "is_dup",
        F.min("doc_id").over(Window.partitionBy("bag_fp")) < F.col("doc_id"),
    )
    sh = F.explode(word_ngrams_udf(8)(F.col("text"))).alias("shingle")
    bench = docs.filter(F.col("source") == "src0").select(sh).distinct()
    contam = (
        base.select("doc_id", sh)
        .join(F.broadcast(bench), "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    verdict = (
        F.when(~F.col("quality_ok"), F.lit("quality"))
        .when(F.col("is_dup"), F.lit("duplicate"))
        .when(F.col("is_contam"), F.lit("contaminated"))
        .otherwise(F.lit("admitted"))
    )
    return (
        sig.join(contam, "doc_id", "left")
        .withColumn("is_contam", F.coalesce("is_contam", F.lit(False)))
        .groupBy("source", verdict.alias("verdict"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
        )
        .orderBy("source", "verdict")
    )
