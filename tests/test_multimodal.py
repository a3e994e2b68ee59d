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


def test_resize_image_stub(spark, sf_dir):
    from mindseye_dataframes_spark.operators.multimodal import resize_image

    df = _blob_df(spark, sf_dir)
    out = resize_image(df.select("doc_id", "blob"), 32, 16).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["resized"] is not None and len(r["resized"]) > 0
        assert r["resized_meta"]["size_bytes"] == len(r["resized"])
        assert r["resized_meta"]["mime"] == "image/png"
    # deterministic kernel
    again = resize_image(df.select("doc_id", "blob"), 32, 16).orderBy("doc_id").collect()
    assert [r["resized_meta"]["content_md5"] for r in rows] == [
        r["resized_meta"]["content_md5"] for r in again
    ]


def test_audio_features_stub(spark, sf_dir):
    from mindseye_dataframes_spark.operators.multimodal import audio_features

    df = _blob_df(spark, sf_dir)
    out = audio_features(df.select("doc_id", "blob"), n_coeffs=6).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert 0.5 <= r["duration_sec"] <= 32.5
        assert r["sample_rate"] in (16000, 44100)
        assert len(r["coeffs"]) == 6
        assert all(-1.0 <= c <= 1.0 for c in r["coeffs"])
