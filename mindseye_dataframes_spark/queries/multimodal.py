"""Multimodal-column queries (north-star ★): binary payload +
metadata. The decode path is stub-kerneled (tests/test_multimodal.py);
the metadata path is fully oracle-checked — md5/size over the payload
bytes agree with DuckDB hashing the same UTF-8 text."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.multimodal import decode_image, pack_blob
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q41_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS size_bytes,
           md5(text) AS content_md5,
           'application/octet-stream' AS mime
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "parity:blob-metadata"),
)
def q41_blob_metadata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    packed = pack_blob(docs, "payload", mime="application/octet-stream")
    return packed.select(
        "doc_id",
        F.col("blob_meta.size_bytes").alias("size_bytes"),
        F.col("blob_meta.content_md5").alias("content_md5"),
        F.col("blob_meta.mime").alias("mime"),
    ).orderBy("doc_id")


@query(
    "q42_image_decode_features",
    oracle=None,  # stub decode kernel (no image libs in env) — rows-only
    tags=("multimodal", "parity:decode"),
)
def q42_image_decode_features(spark, sf_dir):
    """Decode plumbing end-to-end: binary payloads → (width, height,
    channels, features) via Arrow-batched mapInPandas with the
    deterministic stub kernel."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    packed = pack_blob(docs, "payload", mime="image/fake")
    return decode_image(packed.select("doc_id", "blob"), "blob").orderBy("doc_id")
