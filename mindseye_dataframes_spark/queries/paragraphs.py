"""Paragraph-granularity exact dedup with document reassembly — the
C4/RefinedWeb curation step the doc-level dedup family (q30/q158)
doesn't cover: a *chunk* of a document can be boilerplate shared by
thousands of pages even when no two documents are identical.

The synthetic corpus has no newline structure, so "paragraphs" are
fixed 16-word chunks — the mechanics (chunk → fingerprint →
corpus-wide first-occurrence → reassemble survivors in order) are
exactly the production shape; only the splitter differs.

Reference context: SURVEY §2B ★ dedup (the reference engine has no
sub-document dedup at all — this extends the family the same way
q170's shared-span audit does, but with a materialized rewrite).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

CHUNK_WORDS = 16


@query(
    "q180_paragraph_dedup_rewrite",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS chunk,
             array_to_string(
               ws[CAST(t.i * {CHUNK_WORDS} + 1 AS BIGINT)
                  :CAST((t.i + 1) * {CHUNK_WORDS} AS BIGINT)], ' ') AS ctext
      FROM parts,
           UNNEST(range(0, (len(ws) + {CHUNK_WORDS - 1}) // {CHUNK_WORDS})) AS t(i)
    ),
    keep AS (
      SELECT doc_id, chunk, ctext,
             ROW_NUMBER() OVER (
               PARTITION BY md5(ctext) ORDER BY doc_id, chunk) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(LENGTH(
             string_agg(CASE WHEN rn = 1 THEN ctext END, ' ' ORDER BY chunk)),
             0) AS BIGINT) AS kept_chars,
           md5(COALESCE(
             string_agg(CASE WHEN rn = 1 THEN ctext END, ' ' ORDER BY chunk),
             '')) AS kept_md5
    FROM keep GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "curation", "parity:paragraph-dedup"),
)
def q180_paragraph_dedup_rewrite(spark, sf_dir):
    """Corpus-wide paragraph dedup + rewrite: split every document
    into 16-word chunks, keep only the FIRST occurrence of each
    distinct chunk (first = lexicographically smallest (doc_id,
    chunk_idx) — deterministic, order-independent), reassemble each
    document from its surviving chunks in order, and report per-doc
    chunk/keep counts plus the md5 of the rewritten text (hashable
    full-value evidence without shipping the text to the driver).

    Scale shape (the part that must survive 100 TB):
    - chunking is a narrow map + ONE (doc_id, chunk) hash-aggregate;
    - the first-occurrence decision shuffles by the 16-byte md5
      fingerprint — the canonical paragraph-dedup exchange. The
      keeper table is keys-only (fp → min (doc_id, chunk) struct),
      built with a map-side-combining min aggregate, then joined
      back; chunk text crosses that join exchange once;
    - reassembly is ONE groupBy(doc_id) — the second and last time
      text moves.
    No driver collect, no window over the whole corpus, nothing
    quadratic: cost is 2 text shuffles + 1 key shuffle, all
    hash-partitioned on high-cardinality keys.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    chunks = words.groupBy(
        "doc_id", F.expr(f"pos DIV {CHUNK_WORDS}").alias("chunk")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("ctext")
    )
    fp_chunks = chunks.withColumn("fp", F.md5("ctext"))
    keepers = fp_chunks.groupBy("fp").agg(
        F.min(F.struct("doc_id", "chunk")).alias("keeper")
    )
    decided = fp_chunks.join(keepers, "fp").withColumn(
        "kept", F.struct("doc_id", "chunk") == F.col("keeper")
    )
    kept_struct = F.when(F.col("kept"), F.struct("chunk", "ctext"))
    return (
        decided.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["ctext"],
                ),
                " ",
            ).alias("_kept_text"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_kept",
            F.length("_kept_text").cast("long").alias("kept_chars"),
            F.md5("_kept_text").alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


_STANDING_MAX_ID = 300


@query(
    "q187_incremental_paragraph_dedup",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS chunk,
             md5(array_to_string(
               ws[CAST(t.i * {CHUNK_WORDS} + 1 AS BIGINT)
                  :CAST((t.i + 1) * {CHUNK_WORDS} AS BIGINT)], ' ')) AS fp,
             array_to_string(
               ws[CAST(t.i * {CHUNK_WORDS} + 1 AS BIGINT)
                  :CAST((t.i + 1) * {CHUNK_WORDS} AS BIGINT)], ' ') AS ctext
      FROM parts,
           UNNEST(range(0, (len(ws) + {CHUNK_WORDS - 1}) // {CHUNK_WORDS})) AS t(i)
    ),
    standing AS (
      SELECT DISTINCT fp FROM chunks WHERE doc_id < {_STANDING_MAX_ID}
    ),
    fresh AS (
      SELECT c.doc_id, c.chunk, c.ctext, c.fp,
             ROW_NUMBER() OVER (PARTITION BY c.fp
                                ORDER BY c.doc_id, c.chunk) AS rn,
             s.fp IS NOT NULL AS known
      FROM chunks c LEFT JOIN standing s ON c.fp = s.fp
      WHERE c.doc_id >= {_STANDING_MAX_ID}
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN NOT known AND rn = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN known THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vs_standing,
           md5(COALESCE(string_agg(
             CASE WHEN NOT known AND rn = 1 THEN ctext END,
             ' ' ORDER BY chunk), '')) AS kept_md5
    FROM fresh GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "curation", "incremental", "parity:incremental-paragraph-dedup"),
)
def q187_incremental_paragraph_dedup(spark, sf_dir):
    """The incremental twin of q180, composed with q154's
    standing-corpus pattern: a new crawl batch (doc_id ≥ 300) is
    rewritten against the ALREADY-INGESTED corpus's paragraph
    fingerprint store (doc_id < 300) — a new chunk survives only if
    its fingerprint is absent from the standing store AND it is the
    first occurrence within the batch ((doc_id, chunk_idx) order).
    Per new doc: chunk counts, how many chunks the standing store
    already held (the boilerplate rate an ingest monitor tracks), and
    the md5 of the rewritten text.

    Scale shape: the standing side reduces to DISTINCT 16-byte
    fingerprints — at 100 TB that store is what you persist between
    crawls (q175's pattern), not the text; here it is derived in-query
    from the same table for oracle replayability. One fp-keyed
    left join decides known/fresh; the in-batch first-occurrence
    window runs on the batch's (fp, ids) only; reassembly is one
    groupBy(doc_id). Text moves twice, exactly like q180."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    chunks = (
        words.groupBy("doc_id", F.expr(f"pos DIV {CHUNK_WORDS}").alias("chunk"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("ctext")
        )
        .withColumn("fp", F.md5("ctext"))
    )
    standing = (
        chunks.filter(F.col("doc_id") < _STANDING_MAX_ID)
        .select("fp")
        .distinct()
        .withColumn("known", F.lit(True))
    )
    from pyspark.sql import Window

    w_first = Window.partitionBy("fp").orderBy("doc_id", "chunk")
    fresh = (
        chunks.filter(F.col("doc_id") >= _STANDING_MAX_ID)
        .join(standing, "fp", "left")
        .withColumn("known", F.coalesce("known", F.lit(False)))
        .withColumn("rn", F.row_number().over(w_first))
    )
    keep = ~F.col("known") & (F.col("rn") == 1)
    kept_struct = F.when(keep, F.struct("chunk", "ctext"))
    return (
        fresh.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.sum(F.col("known").cast("long")).alias("n_vs_standing"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["ctext"],
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "q191_intra_doc_dedup",
    oracle=f"""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS chunk,
             array_to_string(
               ws[CAST(t.i * {CHUNK_WORDS} + 1 AS BIGINT)
                  :CAST((t.i + 1) * {CHUNK_WORDS} AS BIGINT)], ' ') AS ctext
      FROM parts,
           UNNEST(range(0, (len(ws) + {CHUNK_WORDS - 1}) // {CHUNK_WORDS})) AS t(i)
    ),
    keep AS (
      SELECT doc_id, chunk, ctext,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id, md5(ctext) ORDER BY chunk) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END))
                * 1000000 // COUNT(*) AS BIGINT) AS rep_ppm,
           md5(COALESCE(
             string_agg(CASE WHEN rn = 1 THEN ctext END, ' ' ORDER BY chunk),
             '')) AS kept_md5
    FROM keep GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "curation", "parity:intra-doc-dedup"),
)
def q191_intra_doc_dedup(spark, sf_dir):
    """WITHIN-document repetition removal — the complement of q180's
    corpus-wide pass: a page that repeats its own boilerplate (nav
    blocks, templated headers, decoding glitches that loop a
    paragraph) keeps only the FIRST occurrence of each distinct
    16-word chunk WITHIN that document; other documents are
    irrelevant to the decision. This is the doc-local half of C4's
    "discard repeated lines" rule and the remedy for the q117
    repetition signal — q117 measures it, this rewrites it. Output
    per doc: chunk/keep counts, the repeated fraction in exact ppm,
    and the md5 of the rewritten text (full-value evidence, no text
    to the driver).

    Scale shape — strictly cheaper than q180: chunking is a narrow
    map; the first-occurrence decision and the reassembly are windows
    and aggregates PARTITIONED BY doc_id (+ chunk fingerprint), so
    the ONLY exchange is the one (doc_id)-keyed text shuffle the
    reassembly needs — no corpus-wide fingerprint exchange, no
    standing state, nothing cross-document at all. At 100 TB this is
    embarrassingly parallel over documents."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split("text", " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(CHUNK_WORDS)).cast("long")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * CHUNK_WORDS + 1, CHUNK_WORDS), " "
                ),
            )
        ).alias("chunk", "ctext"),
    ).select("doc_id", F.col("chunk").cast("long").alias("chunk"), "ctext")
    w_first = Window.partitionBy("doc_id", F.md5("ctext")).orderBy("chunk")
    kept = chunks.withColumn("rn", F.row_number().over(w_first))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.expr(
                "CAST((count(1) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END))"
                " * 1000000 DIV count(1) AS BIGINT)"
            ).alias("rep_ppm"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        F.col("rn") == 1,
                                        F.struct("chunk", "ctext"),
                                    )
                                )
                            ),
                            lambda s: s["ctext"],
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )
