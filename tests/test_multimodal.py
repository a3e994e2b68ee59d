"""Multimodal column plumbing: schema, metadata, Arrow batch shape.
Decode kernels are stubbed (no image libs in env) — the contract
under test is the Spark-side plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    pack_blob,
)
from mindseye_dataframes_spark.sources.readers import load_table


def _blob_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return pack_blob(
        docs.withColumn("payload", F.encode("text", "utf-8")),
        "payload",
        mime="application/octet-stream",
    )


def test_pack_blob_metadata(spark, sf_dir):
    df = _blob_df(spark, sf_dir)
    row = df.select("text", "blob", "blob_meta").first()
    assert bytes(row["blob"]).decode() == row["text"]
    assert row["blob_meta"]["size_bytes"] == len(row["text"].encode())
    import hashlib

    assert row["blob_meta"]["content_md5"] == hashlib.md5(row["text"].encode()).hexdigest()
    assert row["blob_meta"]["mime"] == "application/octet-stream"


def test_decode_image_stub_deterministic(spark, sf_dir):
    df = _blob_df(spark, sf_dir)
    out = decode_image(df.select("doc_id", "blob"), "blob")
    rows = out.orderBy("doc_id").collect()
    assert len(rows) == 50
    assert all(64 <= r["width"] <= 255 and r["channels"] == 3 for r in rows)
    assert all(len(r["features"]) == 4 for r in rows)
    rows2 = decode_image(df.select("doc_id", "blob"), "blob").orderBy("doc_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]  # deterministic


def test_frame_sample_stub(spark, sf_dir):
    df = _blob_df(spark, sf_dir)
    out = frame_sample(df.select("blob"), every_n=7)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["frame_index"] % 7 == 0 for r in rows)
