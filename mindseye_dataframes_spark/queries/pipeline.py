"""Composite pipeline queries — the 'training-data curation' shapes a
large-scale pipeline actually runs: sliding-window rollups and
quality-filter → embedding-join funnels."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.exact import dec, dsum
from mindseye_dataframes_spark.functions.textfns import STOPWORDS, tokens
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q55_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT e.event_type, e.value,
             unnest([time_bucket(INTERVAL 30 MINUTES, e.ts),
                     time_bucket(INTERVAL 30 MINUTES, e.ts) - INTERVAL 30 MINUTES]) AS w_start
      FROM events e
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY w_start, event_type
    ORDER BY window_start, event_type
    """,
    tags=("timeseries", "parity:sliding-window"),
)
def q55_sliding_window(spark, sf_dir):
    """Batch sliding windows (1h window, 30m slide): each event lands
    in exactly two windows. Spark's F.window handles the expansion
    natively; the oracle expands window starts explicitly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q56_curation_funnel",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_SW}))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), kept AS (
      SELECT doc_id, lang FROM scored
      WHERE n_tokens >= 30 AND stop_ratio >= 0.02
    )
    SELECT e.label, COUNT(*) AS n_docs, COUNT(DISTINCT k.lang) AS n_langs
    FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id
    GROUP BY e.label
    ORDER BY e.label
    """,
    tags=("pipeline", "parity:curation-funnel"),
)
def q56_curation_funnel(spark, sf_dir):
    """Curation funnel: heuristic quality gate on documents →
    join to the embedding table → per-label counts. The join is the
    doc-to-vector bridge a dedup/ANN pipeline uses; filters push into
    both scans."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = tokens("text")
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast(
        "double"
    ) / n.cast("double")
    kept = docs.select("doc_id", "lang", n.alias("n_tokens"), stop_ratio.alias("sr")).filter(
        (F.col("n_tokens") >= 30) & (F.col("sr") >= 0.02)
    )
    return (
        kept.join(emb, kept.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("label")
    )
