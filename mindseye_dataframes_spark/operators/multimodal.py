"""Multimodal columns (north-star §2B ★): image/audio/video payloads
as opaque ``binary`` columns with typed metadata, plus Arrow-batched
decode/feature-extract plumbing.

Decode kernels, by format:

- **PNG**: REAL decoder built on stdlib ``zlib`` + numpy — parses
  chunks/IHDR, inflates IDAT, unfilters scanlines (filters 0-4), and
  pools a grayscale plane into features. 8-bit gray/RGB/(A), no
  interlace; other PNG shapes fall through to the fake.
- **WAV (PCM)**: REAL decoder on stdlib ``wave`` + numpy — duration,
  sample rate, and log-energy FFT band coefficients.
- **Pillow**, when importable, takes precedence for images.
- Everything else: a deterministic fake (hash-derived values), clearly
  marked — the container ships no image/audio libraries beyond stdlib.

Everything Spark-side — schema, partitioning, UDF signatures, Arrow
batch shapes — is identical across real and fake kernels, so swapping
in richer decoders changes no plumbing.

Scale notes: payload bytes never shuffle — metadata extraction and
decode are pure maps; `ensure_min_parallelism` spreads single-file
test inputs. For real lakes, store payloads as (uri, byte-range) and
fetch lazily inside the UDF batch to keep scan volume down.
"""

from __future__ import annotations

import hashlib
import io
import wave
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mindseye_dataframes_spark.plans.parallelism import ensure_min_parallelism

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> dict | None:
    """Real PNG decode (stdlib zlib + numpy): returns
    ``{width, height, channels, pixels: ndarray[h, w, c]}`` or None if
    the payload isn't a PNG this decoder supports (8-bit depth,
    gray/RGB with optional alpha, non-interlaced)."""
    if not payload.startswith(_PNG_MAGIC):
        return None
    pos, idat, meta = len(_PNG_MAGIC), [], None
    while pos + 8 <= len(payload):
        (length,) = np.frombuffer(payload[pos : pos + 4], dtype=">u4")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + int(length)]
        pos += 12 + int(length)  # length + type + data + crc
        if ctype == b"IHDR":
            w, h = np.frombuffer(data[:8], dtype=">u4")
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                return None
            meta = (int(w), int(h), _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        return None
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw[row_start + 1 : row_start + 1 + stride], dtype=np.uint8
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row left neighbor
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    cc = prev[x - c] if x >= c else 0  # up-left
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    return None  # invalid filter byte
        out[y] = cur.astype(np.uint8)
        prev = cur
    return {
        "width": w,
        "height": h,
        "channels": c,
        "pixels": out.reshape(h, w, c),
    }


def _png_features(pixels: np.ndarray) -> list[float]:
    """2×2 block-mean over the luma plane, scaled to [0, 1] — the same
    shape the Pillow branch emits (resize((2,2)).convert('L'))."""
    h, w, c = pixels.shape
    if c >= 3:
        luma = (
            0.299 * pixels[:, :, 0] + 0.587 * pixels[:, :, 1] + 0.114 * pixels[:, :, 2]
        )
    else:
        luma = pixels[:, :, 0].astype(np.float64)
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    quads = [
        luma[i * h2 : (i + 1) * h2 if i == 0 else h, j * w2 : (j + 1) * w2 if j == 0 else w]
        for i in (0, 1)
        for j in (0, 1)
    ]
    return [float(q.mean()) / 255.0 for q in quads]


def decode_wav(payload: bytes, n_coeffs: int = 8) -> dict | None:
    """Real WAV-PCM decode (stdlib wave + numpy): duration, sample
    rate, and ``n_coeffs`` log-energy FFT band coefficients over the
    mono-mixed signal. None when the payload isn't a PCM WAV."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            n = w.getnframes()
            frames = w.readframes(n)
    except (wave.Error, EOFError):
        return None
    if sw == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if ch > 1:
        samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch).mean(axis=1)
    spec = np.abs(np.fft.rfft(samples)) if len(samples) else np.zeros(1)
    bands = np.array_split(spec, n_coeffs)
    coeffs = [
        round(float(np.log1p(b.mean())) if len(b) else 0.0, 6) for b in bands
    ]
    return {
        "duration_sec": round(n / sr, 3) if sr else 0.0,
        "sample_rate": int(sr),
        "coeffs": coeffs,
    }

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
        try:  # richest decoder first if the environment provides it
            from PIL import Image  # noqa: F401

            def kernel(payload: bytes) -> dict:
                img = Image.open(io.BytesIO(payload))
                return {
                    "width": img.width,
                    "height": img.height,
                    "channels": len(img.getbands()),
                    "features": [float(x) for x in img.resize((2, 2)).convert("L").getdata()],
                }

        except ImportError:

            def kernel(payload: bytes) -> dict:
                # REAL stdlib PNG decode; deterministic fake otherwise
                png = decode_png(payload)
                if png is not None:
                    return {
                        "width": png["width"],
                        "height": png["height"],
                        "channels": png["channels"],
                        "features": _png_features(png["pixels"]),
                    }
                return _fake_decode(payload)

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
    """Audio feature extraction: (duration_sec, sample_rate,
    coeffs[n]) per payload. REAL kernel for PCM WAV payloads (stdlib
    ``wave`` + numpy FFT band energies — see :func:`decode_wav`);
    deterministic hash-derived fake for other formats (no audio codec
    libraries in the environment). Same schema/batching either way."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["duration_sec double, sample_rate int, coeffs array<double>"]
    )

    def extract(batches):
        def kernel(p: bytes) -> dict:
            real = decode_wav(p, n_coeffs)
            if real is not None:
                return real
            d = hashlib.md5(p).digest()
            return {
                "duration_sec": round(0.5 + d[3] / 8.0, 3),
                "sample_rate": 16000 if d[4] % 2 else 44100,
                "coeffs": [(d[i % 16] - 128) / 128.0 for i in range(n_coeffs)],
            }

        for pdf in batches:
            out = pdf[keep].copy()
            decoded = pdf[blob_col].map(
                lambda b: kernel(bytes(b) if b is not None else b"")
            )
            out["duration_sec"] = decoded.map(lambda d: d["duration_sec"])
            out["sample_rate"] = decoded.map(lambda d: d["sample_rate"])
            out["coeffs"] = decoded.map(lambda d: d["coeffs"])
            yield out

    return ensure_min_parallelism(df).mapInPandas(extract, schema=out_schema)


def stft_spectrogram(
    samples: "np.ndarray", win: int = 256, hop: int = 128
) -> "np.ndarray":
    """Real STFT magnitude spectrogram (hann window, numpy rFFT):
    (n_frames, win//2+1). Deterministic for fixed input."""
    if len(samples) < win:
        samples = np.pad(samples, (0, win - len(samples)))
    n_frames = 1 + (len(samples) - win) // hop
    window = np.hanning(win)
    frames = np.stack(
        [samples[i * hop : i * hop + win] * window for i in range(n_frames)]
    )
    return np.abs(np.fft.rfft(frames, axis=1))


def audio_spectrogram(
    df: DataFrame, blob_col: str = "blob", win: int = 256, hop: int = 128
) -> DataFrame:
    """Windowed STFT spectrogram summary per WAV payload: frame/bin
    shape, the global peak (frame, bin), and per-frame dominant bins —
    the downsampled representation a training pipeline would hand to
    an audio encoder. REAL kernel (wave + numpy rFFT) for PCM WAV;
    non-WAV payloads yield NULLs (explicit, not fake — spectrogram
    fakes would be misleading). Arrow-batched mapInPandas: one pass,
    no shuffle, payload memory bounded by the Arrow batch size."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + [
            "n_frames int, n_bins int, peak_frame int, peak_bin int",
            "frame_peak_bins array<int>",
        ]
    )

    def extract(batches):
        def kernel(p: bytes) -> dict | None:
            d = decode_wav(p, 1)
            if d is None:
                return None
            with wave.open(io.BytesIO(p)) as w:
                sw, ch = w.getsampwidth(), w.getnchannels()
                raw = w.readframes(w.getnframes())
            if sw == 2:
                s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            else:
                s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            if ch > 1:
                s = s[: (len(s) // ch) * ch].reshape(-1, ch).mean(axis=1)
            spec = stft_spectrogram(s, win, hop)
            pf, pb = np.unravel_index(np.argmax(spec), spec.shape)
            return {
                "n_frames": int(spec.shape[0]),
                "n_bins": int(spec.shape[1]),
                "peak_frame": int(pf),
                "peak_bin": int(pb),
                "frame_peak_bins": [int(b) for b in spec.argmax(axis=1)],
            }

        for pdf in batches:
            out = pdf[keep].copy()
            decoded = pdf[blob_col].map(
                lambda b: kernel(bytes(b)) if b is not None else None
            )
            for field in ("n_frames", "n_bins", "peak_frame", "peak_bin"):
                out[field] = decoded.map(lambda d, f=field: d[f] if d else None)
            out["frame_peak_bins"] = decoded.map(
                lambda d: d["frame_peak_bins"] if d else None
            )
            yield out

    return ensure_min_parallelism(df).mapInPandas(extract, schema=out_schema)


def sample_video_frames(
    df: DataFrame, blob_col: str = "blob", stride: int = 1
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (``frame_idx`` stepping by ``stride``), with per-frame content
    digests — the shape a multimodal training pipeline feeds to a
    frame encoder.

    No video codec library ships in this environment, so the
    container parse is a clearly-marked deterministic fake: frame
    count and digests derive from md5(payload) (same honesty contract
    as the image/audio fakes above). A real decoder (e.g. PyAV) slots
    into ``kernel`` without touching the Spark plumbing: the
    mapInPandas row-explosion, schema, and batching are production
    shape.

    Scale: pure map over payload partitions — frames multiply rows
    ~n_frames/stride×, but payload bytes are dropped before the rows
    fan out, so the exploded relation carries only ids + digests.
    """
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["n_frames int, frame_idx int, ts_sec double, frame_md5 string"]
    )

    def sample(batches):
        def kernel(p: bytes) -> list[dict]:
            d = hashlib.md5(p).digest()
            n_frames = (d[5] % 8) + 2  # fake container: 2..9 frames
            return [
                {
                    "n_frames": n_frames,
                    "frame_idx": i,
                    "ts_sec": i / 24.0,  # fake container: fixed 24 fps
                    "frame_md5": hashlib.md5(
                        p + b":" + str(i).encode()
                    ).hexdigest(),
                }
                for i in range(0, n_frames, stride)
            ]

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                p = row[blob_col]
                for fr in kernel(bytes(p) if p is not None else b""):
                    rows.append({**{c: row[c] for c in keep}, **fr})
            yield pd.DataFrame(
                rows,
                columns=keep + ["n_frames", "frame_idx", "ts_sec", "frame_md5"],
            )

    return ensure_min_parallelism(df).mapInPandas(sample, schema=out_schema)


def image_phash(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode → grayscale
    feature grid → threshold each cell against the grid mean → pack
    bits → hex string. Identical payloads always collide; near-
    identical images collide with high probability — which is what
    makes the hash a *dedup key*: an exact groupBy/join on ``phash``
    replaces pairwise image comparison, the same all-pairs→bucket
    rewrite as MinHash-LSH for text (operators/dedup.py). Decode and
    hash are one Arrow-batched pass; the kernel chain is the same
    real-PNG-else-fake fallback as ``decode_image``."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["phash string"]
    )

    def hash_batches(batches):
        def kernel(payload: bytes) -> str:
            png = decode_png(payload)
            feats = (
                _png_features(png["pixels"])
                if png is not None
                else _fake_decode(payload)["features"]
            )
            mean = sum(feats) / len(feats)
            bits = 0
            for f in feats:
                bits = (bits << 1) | (1 if f > mean else 0)
            return f"{bits:0{(len(feats) + 3) // 4}x}"

        for pdf in batches:
            out = pdf[keep].copy()
            out["phash"] = pdf[blob_col].map(
                lambda b: kernel(bytes(b) if b is not None else b"")
            )
            yield out

    return ensure_min_parallelism(df).mapInPandas(hash_batches, schema=out_schema)


def mel_filterbank(
    n_mels: int, n_bins: int, sr: int, fmin: float = 0.0, fmax: float | None = None
) -> "np.ndarray":
    """Triangular mel filterbank (HTK mel scale, 2595·log10(1+f/700)),
    shape (n_mels, n_bins) for an rFFT of win = 2·(n_bins−1) samples.
    Pure numpy, deterministic — no audio library required."""
    fmax = fmax if fmax is not None else sr / 2.0
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    inv = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    pts = inv(np.linspace(mel(fmin), mel(fmax), n_mels + 2))
    bins = np.floor((2 * (n_bins - 1)) * pts / sr).astype(int)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, ctr, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, min(ctr, n_bins)):
            if ctr > lo:
                fb[i, b] = (b - lo) / (ctr - lo)
        for b in range(max(ctr, 0), min(hi, n_bins)):
            if hi > ctr:
                fb[i, b] = (hi - b) / (hi - ctr)
    return fb


def log_mel_profile(
    samples: "np.ndarray", sr: int, n_mels: int = 16, win: int = 256, hop: int = 128
) -> "np.ndarray":
    """Time-averaged log-mel energy profile, shape (n_mels,): STFT
    power → mel filterbank → log10 → mean over frames. The standard
    compact audio-encoder input statistic."""
    spec = stft_spectrogram(samples, win, hop)  # (frames, bins) magnitude
    fb = mel_filterbank(n_mels, spec.shape[1], sr)
    mel_pow = (spec**2) @ fb.T  # (frames, n_mels)
    return np.log10(mel_pow + 1e-10).mean(axis=0)


def audio_mel_features(
    df: DataFrame,
    blob_col: str = "blob",
    n_mels: int = 16,
    win: int = 256,
    hop: int = 128,
) -> DataFrame:
    """Per-payload log-mel profile (array<double>, len n_mels) — the
    feature layer above ``audio_spectrogram``: REAL kernel for PCM
    WAV (wave + numpy), NULL for non-WAV payloads. Arrow-batched
    mapInPandas, one pass, zero shuffle; at 100 TB the cost is scan
    + O(frames·bins·n_mels) numpy per payload, embarrassingly
    parallel."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["sample_rate int", "mel_profile array<double>"]
    )

    def extract(batches):
        def kernel(p: bytes) -> dict | None:
            if decode_wav(p, 1) is None:
                return None
            with wave.open(io.BytesIO(p)) as w:
                sr, sw, ch = w.getframerate(), w.getsampwidth(), w.getnchannels()
                raw = w.readframes(w.getnframes())
            if sw == 2:
                s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            else:
                s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            if ch > 1:
                s = s[: (len(s) // ch) * ch].reshape(-1, ch).mean(axis=1)
            return {
                "sample_rate": int(sr),
                "mel_profile": [float(x) for x in log_mel_profile(s, sr, n_mels, win, hop)],
            }

        for pdf in batches:
            out = pdf[keep].copy()
            decoded = pdf[blob_col].map(
                lambda b: kernel(bytes(b)) if b is not None else None
            )
            out["sample_rate"] = decoded.map(lambda d: d["sample_rate"] if d else None)
            out["mel_profile"] = decoded.map(lambda d: d["mel_profile"] if d else None)
            yield out

    return ensure_min_parallelism(df).mapInPandas(extract, schema=out_schema)


def encode_png_gray(pixels: "np.ndarray") -> bytes:
    """Minimal REAL PNG encoder (8-bit grayscale, filter 0,
    non-interlaced): the write twin of :func:`decode_png`, small
    enough to run inside an Arrow batch kernel. Input [h, w] uint8."""
    import struct

    h, w = pixels.shape
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav_pcm16(samples, rate: int) -> bytes:
    """Real PCM-16 WAV encode (stdlib ``wave``): mono, little-endian
    int16 frames. The write-side twin of :func:`decode_wav`, so
    container roundtrips exercise a genuine audio codec boundary."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_pcm_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Integer-exact PCM stats per WAV payload: (n_samples,
    sample_rate, sum_abs) where sum_abs = Σ|sᵢ| over the RAW int16
    samples — pure BIGINT arithmetic, so an oracle that knows the
    samples replays the value bit-exactly (no FFT/float in the loop).
    REAL stdlib ``wave`` parse; non-WAV payloads yield NULLs. One
    Arrow-batched ``mapInPandas`` pass, no shuffle."""
    keep = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["n_samples int, sample_rate int, sum_abs long"]
    )

    def extract(batches):
        def kernel(p: bytes) -> dict:
            nul = {"n_samples": None, "sample_rate": None, "sum_abs": None}
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return nul
            try:
                with wave.open(io.BytesIO(p)) as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        return nul
                    sr = w.getframerate()
                    n = w.getnframes()
                    frames = w.readframes(n)
            except (wave.Error, EOFError):
                return nul
            s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
            return {
                "n_samples": int(len(s)),
                "sample_rate": int(sr),
                "sum_abs": int(np.abs(s).sum()),
            }

        for pdf in batches:
            out = pdf[keep].copy()
            decoded = pdf[blob_col].map(
                lambda b: kernel(bytes(b) if b is not None else b"")
            )
            out["n_samples"] = decoded.map(lambda d: d["n_samples"])
            out["sample_rate"] = decoded.map(lambda d: d["sample_rate"])
            out["sum_abs"] = decoded.map(lambda d: d["sum_abs"])
            yield out

    return ensure_min_parallelism(df).mapInPandas(extract, schema=out_schema)
