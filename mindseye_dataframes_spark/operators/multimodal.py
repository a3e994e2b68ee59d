"""Multimodal columns (north-star §2B ★): image/audio/video payloads
as opaque ``binary`` columns with typed metadata, plus Arrow-batched
decode/feature-extract plumbing.

The decode kernels are STUBBED: the container has no image/audio
libraries, so ``decode_image`` tries Pillow and otherwise uses a
deterministic fake decoder (dimensions derived from the payload hash)
clearly marked as such. Everything Spark-side — schema, partitioning,
UDF signatures, Arrow batch shapes — is real and tested; swapping the
kernel for a real decoder changes no plumbing.

Scale notes: payload bytes never shuffle — metadata extraction and
decode are pure maps; `ensure_min_parallelism` spreads single-file
test inputs. For real lakes, store payloads as (uri, byte-range) and
fetch lazily inside the UDF batch to keep scan volume down.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mindseye_dataframes_spark.plans.parallelism import ensure_min_parallelism

BLOB_META_SCHEMA = "size_bytes long, content_md5 string, mime string"


def pack_blob(df: DataFrame, bytes_col: str, mime: str, uri_col: str | None = None) -> DataFrame:
    """Wrap a binary column into the engine's multimodal layout:
    ``blob: binary`` + ``blob_meta: struct<size_bytes, content_md5, mime>``."""
    meta = F.struct(
        F.octet_length(F.col(bytes_col)).cast("long").alias("size_bytes"),
        F.md5(F.col(bytes_col)).alias("content_md5"),
        F.lit(mime).alias("mime"),
    )
    out = df.withColumn("blob", F.col(bytes_col)).withColumn("blob_meta", meta)
    if uri_col:
        out = out.withColumn("blob_uri", F.col(uri_col))
    return out


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: pretend-dimensions
    and a 4-dim feature vector derived from the content hash. Replaces
    cleanly with a real kernel (see decode_image)."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [h[i] / 255.0 for i in range(4)]
    return {"width": width, "height": height, "channels": 3, "features": feats}


def decode_image(df: DataFrame, blob_col: str = "blob", id_col: str | None = None) -> DataFrame:
    """Decode image payloads into (width, height, channels, features).

    Real kernel (Pillow) when available; deterministic fake otherwise.
    Arrow-batched ``mapInPandas`` — one pass, no shuffle; batch size
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch so payload
    memory stays bounded regardless of row width.
    """
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["width int, height int, channels int, features array<double>"]
    )

    def decode(batches):
        try:  # real decoder if the environment provides it
            from PIL import Image  # noqa: F401
            import io

            def kernel(payload: bytes) -> dict:
                img = Image.open(io.BytesIO(payload))
                return {
                    "width": img.width,
                    "height": img.height,
                    "channels": len(img.getbands()),
                    "features": [float(x) for x in img.resize((2, 2)).convert("L").getdata()],
                }

        except ImportError:
            kernel = _fake_decode

        for pdf in batches:
            decoded = pdf[blob_col].map(lambda b: kernel(bytes(b) if b is not None else b""))
            out = pdf[keep].copy()
            out["width"] = decoded.map(lambda d: d["width"])
            out["height"] = decoded.map(lambda d: d["height"])
            out["channels"] = decoded.map(lambda d: d["channels"])
            out["features"] = decoded.map(lambda d: d["features"])
            yield out

    return ensure_min_parallelism(df).mapInPandas(decode, schema=out_schema)


def frame_sample(df: DataFrame, blob_col: str = "blob", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing (STUB kernel): emits one row per
    sampled frame index. Real implementation would demux the container
    inside the batch; the explode shape and schema are the real
    contract."""

    def sample(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[blob_col]) if row[blob_col] is not None else b""
                n_frames = 1 + (hashlib.md5(payload).digest()[2] % 30)
                for idx in range(0, n_frames, every_n):
                    rows.append({"frame_index": idx, "frame_md5": hashlib.md5(payload + bytes([idx])).hexdigest()})
            yield pd.DataFrame(rows, columns=["frame_index", "frame_md5"])

    return ensure_min_parallelism(df).mapInPandas(
        sample, schema="frame_index int, frame_md5 string"
    )


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    blob_col: str = "blob",
    kernel: str = "auto",
) -> DataFrame:
    """Image resize plumbing: emits a resized payload column plus its
    new metadata. Real kernel (Pillow) when available, else a
    deterministic fake (content-hash-derived payload of the right
    conceptual shape) clearly marked. The contract — binary in, binary
    out, metadata refreshed, one Arrow pass, no shuffle — is real.

    ``kernel``: "auto" (Pillow if importable, else fake), "fake"
    (always the deterministic stand-in — used by the oracle-checked
    query so its values don't depend on library availability)."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["resized binary", "resized_meta struct<size_bytes:bigint,content_md5:string,mime:string>"]
    )

    def resize(batches):
        def fake_kernel(payload: bytes) -> bytes:
            # FAKE: deterministic stand-in payload (hash-expanded to
            # a size proportional to the target area)
            seed = hashlib.md5(payload + f"{target_w}x{target_h}".encode()).digest()
            reps = max(1, (target_w * target_h) // len(seed))
            return (seed * reps)[: target_w * target_h]

        run_kernel = fake_kernel
        if kernel == "auto":
            try:
                import io

                from PIL import Image

                def run_kernel(payload: bytes) -> bytes:
                    img = Image.open(io.BytesIO(payload)).resize((target_w, target_h))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()

            except ImportError:
                pass

        for pdf in batches:
            resized = pdf[blob_col].map(
                lambda b: run_kernel(bytes(b) if b is not None else b"")
            )
            out = pdf[keep].copy()
            out["resized"] = resized
            out["resized_meta"] = resized.map(
                lambda b: {
                    "size_bytes": len(b),
                    "content_md5": hashlib.md5(b).hexdigest(),
                    "mime": "image/png",
                }
            )
            yield out

    return ensure_min_parallelism(df).mapInPandas(resize, schema=out_schema)


def audio_features(
    df: DataFrame, blob_col: str = "blob", n_coeffs: int = 8
) -> DataFrame:
    """Audio feature-extraction plumbing (STUB kernel): emits
    (duration_sec, sample_rate, coeffs[n]) per payload — the MFCC-ish
    shape a real librosa/torchaudio kernel would fill. Deterministic
    fake derived from the content hash; schema, batching, and
    partitioning are the real contract."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["duration_sec double, sample_rate int, coeffs array<double>"]
    )

    def extract(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            payloads = pdf[blob_col].map(lambda b: bytes(b) if b is not None else b"")
            digests = payloads.map(lambda p: hashlib.md5(p).digest())
            out["duration_sec"] = [
                round(0.5 + d[3] / 8.0, 3) for d in digests
            ]
            out["sample_rate"] = [16000 if d[4] % 2 else 44100 for d in digests]
            out["coeffs"] = [
                [(d[i % 16] - 128) / 128.0 for i in range(n_coeffs)] for d in digests
            ]
            yield out

    return ensure_min_parallelism(df).mapInPandas(extract, schema=out_schema)
