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


# -- real stdlib decode kernels (PNG via zlib, WAV via wave) ----------

def _make_png(pixels, color_type=2, filters=None):
    """Build a real PNG from an [h, w, c] uint8 array, one chosen
    filter byte per scanline (0=None ... 4=Paeth), with correct
    filtering applied — an independent mini-encoder the decoder can't
    share bugs with."""
    import struct
    import zlib

    import numpy as np

    h, w, c = pixels.shape
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int64)
        f = filters[y]
        raw.append(f)
        enc = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) % 256
        raw.extend(int(v) for v in enc)
        prev = line

    def chunk(ctype, data):
        out = struct.pack(">I", len(data)) + ctype + data
        return out + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_real_kernel():
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for filters in ([0] * 6, [1] * 6, [2] * 6, [3] * 6, [4] * 6, [0, 1, 2, 3, 4, 1]):
        got = decode_png(_make_png(pixels, filters=filters))
        assert got is not None, filters
        assert (got["width"], got["height"], got["channels"]) == (5, 6, 3)
        assert np.array_equal(got["pixels"], pixels), filters
    # non-PNG payloads are declined, not mis-decoded
    assert decode_png(b"not a png") is None


def test_decode_image_uses_real_png_kernel(spark):
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import decode_image

    pixels = np.zeros((4, 4, 3), dtype=np.uint8)
    pixels[:2, :2] = 255  # top-left quadrant white
    png = _make_png(pixels)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id int, blob binary")
    row = decode_image(df, "blob").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (4, 4, 3)
    # luma block means: white quadrant ~1.0, others 0.0
    feats = row["features"]
    assert feats[0] > 0.99 and max(feats[1:]) < 0.01, feats


def _make_wav(samples, sr=8000, ch=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_features_real_wav_kernel(spark):
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import audio_features, decode_wav

    t = np.arange(8000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)  # 1 s @ 440 Hz
    wav = _make_wav(tone, sr=8000)
    direct = decode_wav(wav, 4)
    assert direct["duration_sec"] == 1.0 and direct["sample_rate"] == 8000

    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id int, blob binary")
    row = audio_features(df, "blob", n_coeffs=4).collect()[0]
    assert row["duration_sec"] == 1.0
    assert row["sample_rate"] == 8000
    assert row["coeffs"] == direct["coeffs"]
    # 440 Hz lives in the first of 4 bands over 0-4000 Hz: dominant energy
    assert row["coeffs"][0] == max(row["coeffs"]), row["coeffs"]


def test_image_phash_dedup_clusters(spark, sf_dir):
    """Identical payloads must collide (same phash), clusters must be
    deterministic across runs, and forced duplicates must be found."""
    from mindseye_dataframes_spark.queries import load_all

    q = load_all()["q112_image_phash_clusters"]
    rows1 = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    rows2 = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert rows1 == rows2  # deterministic
    # sf0.001+: docs 300..499 share payloads with 0..199 → clusters exist
    total_dups = sum(r[1] for r in rows1)
    assert total_dups >= 2
    for _, n_images, canonical in rows1:
        assert n_images >= 2 and canonical < 300


def test_spectrogram_peak_tracks_tone_frequency(spark):
    """The STFT kernel must place the spectral peak at the tone's FFT
    bin, and per-frame peaks must move when the signal changes pitch
    mid-stream (two concatenated tones)."""
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import (
        audio_spectrogram,
        stft_spectrogram,
    )

    sr, win, hop = 8000, 256, 128
    t = np.arange(sr) / sr
    tone_a = 0.5 * np.sin(2 * np.pi * 1000.0 * t)  # 1 kHz -> bin 32
    tone_b = 0.5 * np.sin(2 * np.pi * 2000.0 * t)  # 2 kHz -> bin 64
    spec = stft_spectrogram(tone_a, win, hop)
    assert spec.shape[1] == win // 2 + 1
    assert abs(int(spec.sum(axis=0).argmax()) - round(1000.0 * win / sr)) <= 1

    wav = _make_wav(np.concatenate([tone_a, tone_b]), sr=sr)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not a wav"))],
        "doc_id int, blob binary",
    )
    rows = {r["doc_id"]: r for r in audio_spectrogram(df, win=win, hop=hop).collect()}
    good = rows[1]
    bins = good["frame_peak_bins"]
    assert good["n_bins"] == win // 2 + 1
    assert abs(bins[2] - round(1000.0 * win / sr)) <= 1       # first half: 1 kHz
    assert abs(bins[-3] - round(2000.0 * win / sr)) <= 1      # second half: 2 kHz
    assert rows[2]["n_frames"] is None                        # non-WAV -> NULLs


def test_mel_features_separate_tone_bands(spark):
    """Log-mel profiles through the real WAV kernel: a low tone's
    energy peaks in a lower mel band than a high tone's, profiles are
    deterministic across runs, and non-WAV payloads yield NULLs."""
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import (
        audio_mel_features,
        log_mel_profile,
    )

    sr = 8000
    t = np.arange(sr) / sr
    low = 0.5 * np.sin(2 * np.pi * 300.0 * t)
    high = 0.5 * np.sin(2 * np.pi * 3000.0 * t)
    assert log_mel_profile(low, sr).argmax() < log_mel_profile(high, sr).argmax()

    df = spark.createDataFrame(
        [
            (1, bytearray(_make_wav(low, sr=sr))),
            (2, bytearray(_make_wav(high, sr=sr))),
            (3, bytearray(b"not a wav")),
        ],
        "doc_id int, blob binary",
    )
    rows = {r["doc_id"]: r for r in audio_mel_features(df).collect()}
    assert rows[1]["sample_rate"] == sr
    p_low = np.array(rows[1]["mel_profile"])
    p_high = np.array(rows[2]["mel_profile"])
    assert len(p_low) == 16 and p_low.argmax() < p_high.argmax()
    assert rows[3]["mel_profile"] is None
    rows2 = {r["doc_id"]: r for r in audio_mel_features(df).collect()}
    assert rows2[1]["mel_profile"] == rows[1]["mel_profile"]


def test_png_encoder_roundtrips_through_real_decoder():
    """encode_png_gray must produce PNGs the real decoder reads back
    pixel-exact, at sizes where features are true block means."""
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    rng = np.random.default_rng(3)
    for h, w in ((2, 2), (5, 7), (16, 16)):
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        got = decode_png(encode_png_gray(px))
        assert got is not None
        assert (got["width"], got["height"], got["channels"]) == (w, h, 1)
        assert (got["pixels"][:, :, 0] == px).all()


def test_binary_file_sink_and_source_roundtrip(spark, tmp_path_factory):
    """write_binary_files → binaryFile source: every object comes back
    byte-identical, named, with glob pruning at the listing."""
    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.sources.readers import read_binary_files
    from mindseye_dataframes_spark.sources.sinks import write_binary_files

    out = str(tmp_path_factory.mktemp("bin") / "objs")
    rows = [(f"obj{i}.bin", bytes([i] * (i + 1))) for i in range(10)]
    rows.append(("skip.txt", b"not matched by the glob"))
    df = spark.createDataFrame(rows, "name string, payload binary")
    write_binary_files(df, out, "name", "payload")

    back = read_binary_files(spark, out, glob="*.bin").select(
        F.element_at(F.split("path", "/"), -1).alias("name"), "content", "length"
    )
    got = {r["name"]: bytes(r["content"]) for r in back.collect()}
    assert got == {n: p for n, p in rows if n.endswith(".bin")}
    lengths = {r["name"]: r["length"] for r in back.collect()}
    assert lengths == {f"obj{i}.bin": i + 1 for i in range(10)}


def test_pack_binary_objects_roundtrip_and_shard_count(spark, tmp_path_factory):
    """pack_binary_objects → read_packed_binary: every blob comes back
    byte-identical under its name, metadata columns ride along, and
    the shard count is sized from the REAL payload volume (ceil of
    total/target), so a small-object corpus lands in few container
    files instead of one file per object."""
    import glob as globmod

    from mindseye_dataframes_spark.sources.readers import read_packed_binary
    from mindseye_dataframes_spark.sources.sinks import pack_binary_objects

    out = str(tmp_path_factory.mktemp("packed") / "shards")
    rows = [
        (f"obj{i}.bin", f"mime/{i % 3}", bytes([i % 251] * (100 + i)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "name string, mime string, payload binary")
    total = sum(len(p) for _, _, p in rows)
    target = 4096
    shards = pack_binary_objects(
        df, out, "name", "payload", target_shard_bytes=target, meta_cols=("mime",)
    )
    assert shards == -(-total // target)  # ceil from real volume
    # few container files, not one per object
    part_files = globmod.glob(out + "/part-*.parquet")
    assert 0 < len(part_files) <= shards
    back = read_packed_binary(spark, out)
    assert set(back.columns) == {"name", "mime", "content"}
    got = {r["name"]: (r["mime"], bytes(r["content"])) for r in back.collect()}
    assert got == {n: (m, p) for n, m, p in rows}


def test_pack_binary_objects_min_one_shard(spark, tmp_path_factory):
    """An empty/tiny frame still produces exactly one shard — the
    ceil sizing never divides by zero or emits zero partitions."""
    from mindseye_dataframes_spark.sources.readers import read_packed_binary
    from mindseye_dataframes_spark.sources.sinks import pack_binary_objects

    out = str(tmp_path_factory.mktemp("packed1") / "shards")
    df = spark.createDataFrame([("a.bin", b"x")], "name string, payload binary")
    assert pack_binary_objects(df, out, "name", "payload") == 1
    assert read_packed_binary(spark, out).count() == 1


def test_wav_pcm16_roundtrip_and_stats(spark):
    """encode_wav_pcm16 → wav_pcm_stats is byte-lossless: n_samples,
    rate, and Σ|s| match the source arrays exactly; non-WAV payloads
    yield NULL stats rather than fakes."""
    import numpy as np

    from mindseye_dataframes_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_pcm_stats,
    )

    rng = np.random.default_rng(11)
    rows, want = [], {}
    for i, (n, rate) in enumerate([(1, 8000), (16, 8000), (333, 44100)]):
        s = rng.integers(-32768, 32768, size=n, dtype=np.int64)
        rows.append((i, bytearray(encode_wav_pcm16(s, rate))))
        want[i] = (n, rate, int(np.abs(s).sum()))
    rows.append((99, bytearray(b"not a wav payload")))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {
        r["doc_id"]: (r["n_samples"], r["sample_rate"], r["sum_abs"])
        for r in wav_pcm_stats(df, "blob").collect()
    }
    for i, expect in want.items():
        assert got[i] == expect
    assert got[99] == (None, None, None)
