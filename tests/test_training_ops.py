"""Unit tests for the training-data layout operators (packing,
shuffle, mixture sampling, n-gram dedup, video frame sampling) —
edge cases the oracle queries don't reach (zero counts, missing
groups, permutation laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.dedup import ngram_jaccard_pairs
from mindseye_dataframes_spark.operators.multimodal import sample_video_frames
from mindseye_dataframes_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
    seeded_shuffle,
    with_global_prefix_sum,
)


def test_prefix_sum_is_exclusive_and_contiguous(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 5) for i in range(100)], "id long, v long"
    )
    rows = {
        r["id"]: r
        for r in with_global_prefix_sum(df, "v", ["id"], out_col="ps").collect()
    }
    acc = 0
    for i in range(100):
        assert rows[i]["ps"] == acc, i
        acc += (i * 7) % 5


def test_pack_sequences_blocks_cover_stream(spark):
    # include zero-length docs: they must occupy exactly one block
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 300), (3, 5), (4, 256)], "id long, n long"
    )
    out = {r["id"]: r for r in pack_sequences(df, "n", ["id"], 256).collect()}
    assert out[0]["start_offset"] == 0 and out[0]["first_block"] == 0
    assert out[1]["n_blocks"] == 1  # empty doc collapses to one block
    assert out[2]["start_offset"] == 10
    # doc 2 spans tokens 10..309 → blocks 0 and 1
    assert (out[2]["first_block"], out[2]["last_block"]) == (0, 1)
    # doc 4 starts at 315, ends at 570 → blocks 1..2
    assert out[4]["start_offset"] == 315
    assert (out[4]["first_block"], out[4]["last_block"]) == (1, 2)


def test_seeded_shuffle_is_permutation_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {r["id"]: r["shuffle_pos"] for r in seeded_shuffle(df, ["id"], "s1").collect()}
    assert sorted(a.values()) == list(range(500))
    b = {r["id"]: r["shuffle_pos"] for r in seeded_shuffle(df, ["id"], "s2").collect()}
    assert sorted(b.values()) == list(range(500))
    assert a != b  # different seed → different permutation
    a2 = {r["id"]: r["shuffle_pos"] for r in seeded_shuffle(df, ["id"], "s1").collect()}
    assert a == a2  # same seed → identical permutation


def test_mixture_sample_whitelists_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], "id long, g string"
    )
    kept = mixture_sample(df, "g", "id", {"a": 1.0}).collect()
    assert all(r["g"] == "a" for r in kept)  # 'b' absent from rates → dropped
    assert len(kept) == 200  # rate 1.0 keeps every 'a'
    half = mixture_sample(df, "g", "id", {"a": 0.5})
    n1, n2 = half.count(), half.count()
    assert n1 == n2  # deterministic under recomputation
    assert 0 < n1 < 200


def test_ngram_jaccard_finds_exact_dup(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated content with different words"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=8, threshold=0.5, max_df=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got == {(1, 2): 1.0}


def test_video_frame_sample_stride_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode()) for i in range(20)], "id long, blob binary"
    )
    out = sample_video_frames(df, "blob", stride=2).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    for rid, rows in by_id.items():
        n = rows[0]["n_frames"]
        assert 2 <= n <= 9
        assert sorted(r["frame_idx"] for r in rows) == list(range(0, n, 2))
        assert all(r["ts_sec"] == r["frame_idx"] / 24.0 for r in rows)
    again = sample_video_frames(df, "blob", stride=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_grouped_ols_matches_builtin_regression(spark, sf_dir):
    """The applyInPandas grouped-map kernel must agree with the JVM
    regr_slope/regr_intercept aggregates on the same data."""
    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.operators.grouped import grouped_ols
    from mindseye_dataframes_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").cast("double").alias("x"), "value"
    )
    ours = {
        r["user_id"]: r for r in grouped_ols(ev, "user_id", "x", "value").collect()
    }
    ref = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.regr_slope("value", "x").alias("slope"),
            F.regr_intercept("value", "x").alias("intercept"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k]["n"] == ref[k]["n"]
        assert abs(ours[k]["slope"] - ref[k]["slope"]) < 1e-9
        assert abs(ours[k]["intercept"] - ref[k]["intercept"]) < 1e-9


def test_pca_matches_numpy_direct(spark, sf_dir):
    """Distributed partial-moments PCA must match a direct numpy PCA
    on the same data (same covariance convention, same sign rule)."""
    import numpy as np

    from mindseye_dataframes_spark.operators.decomp import (
        pca_components,
        pca_project,
    )
    from mindseye_dataframes_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)

    mean, comps, evar = pca_components(emb, "embedding", k=2)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)

    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    ref = evecs[:, order].T
    for row in ref:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    assert np.allclose(comps, ref, atol=1e-6)
    assert np.all(evar[:-1] >= evar[1:])  # descending explained variance

    proj = {
        r["vec_id"]: r["pc"]
        for r in pca_project(emb, "vec_id", "embedding", k=2).collect()
    }
    ref_proj = (x - x.mean(axis=0)) @ ref.T
    got = np.array([proj[r["vec_id"]] for r in rows])
    assert np.allclose(got, ref_proj, atol=1e-6)


def test_kmeans_recovers_separated_blobs(spark):
    """On well-separated blobs, 3 Lloyd iterations must group each
    blob into one cluster (regardless of which cell id it lands on)."""
    import numpy as np

    from mindseye_dataframes_spark.operators.clustering import kmeans_fit_assign

    rng = np.random.default_rng(7)
    rows = []
    for blob, center in enumerate([(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]):
        for i in range(30):
            x = [float(center[0] + rng.normal(0, 0.1)),
                 float(center[1] + rng.normal(0, 0.1))]
            # interleaved ids: vec_id % 3 == blob, so the deterministic
            # modulo-cell init seeds one centroid per blob (like any
            # k-means, Lloyd's cannot escape an init where all seeds
            # land in one blob — init quality is the caller's lever)
            rows.append((i * 3 + blob, x))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["_cell"]
        for r in kmeans_fit_assign(df, "vec_id", "embedding", k=3, iters=3).collect()
    }
    assert len(got) == 90
    for blob in range(3):
        cells = {got[i * 3 + blob] for i in range(30)}
        assert len(cells) == 1, f"blob {blob} split across {cells}"
    assert len({got[0], got[1], got[2]}) == 3  # blobs not merged


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """A short doc fully embedded in a long one must score containment
    1.0 (short→long) while its Jaccard stays far below any dedup gate
    — the asymmetry that justifies the operator. Direction matters:
    long→short containment is small."""
    from mindseye_dataframes_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog"
    long = (
        " ".join(f"prologue sentence number {i} with distinct words" for i in range(10))
        + " " + short + " "
        + " ".join(f"epilogue sentence number {i} closes the document" for i in range(10))
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely unrelated content here")],
        "doc_id long, text string",
    )
    got = {
        (r["src_id"], r["dst_id"]): r["containment_ppm"]
        for r in ngram_containment_pairs(
            df, "text", "doc_id", n=8, threshold_ppm=0, max_df=50
        ).collect()
    }
    assert got[(1, 2)] == 1_000_000  # every short-doc gram is in long
    assert got[(2, 1)] < 200_000  # reverse direction nowhere near
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", n=8, threshold=0.0, max_df=50
        ).collect()
    }
    assert jac[(1, 2)] < 0.2  # Jaccard under-scores the superset pair


def test_curriculum_schedule_tiers_and_permutation(spark, sf_dir):
    """q216 invariants: global_pos is a dense permutation, tiers are
    monotone in score, and the schedule is tier-contiguous (every
    tier-k position precedes every tier-(k+1) position)."""
    from mindseye_dataframes_spark.queries import load_all

    rows = load_all()["q216_curriculum_schedule"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["global_pos"] for r in rows) == list(range(n))
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r)
    assert set(by_tier) <= {1, 2, 3, 4}
    # tiers partition the score axis monotonically
    for k in sorted(by_tier)[:-1]:
        assert max(r["score"] for r in by_tier[k]) <= min(
            r["score"] for r in by_tier[k + 1]
        )
        # and the schedule is tier-contiguous
        assert max(r["global_pos"] for r in by_tier[k]) < min(
            r["global_pos"] for r in by_tier[k + 1]
        )
    # equal scores never straddle a tier boundary (value quantiles)
    score_tier = {}
    for r in rows:
        assert score_tier.setdefault(r["score"], r["tier"]) == r["tier"]


def test_manifest_append_equals_full_rebuild(spark):
    """Incremental block-manifest maintenance (manifest_append) must
    equal re-manifesting the whole corpus: appended docs pack after
    the standing token stream, so prefix-summing ONLY the delta with
    the base total as offset reproduces the full rebuild exactly —
    including the boundary block a straddling base doc partially
    fills. O(delta) maintenance, proven row-identical."""
    from mindseye_dataframes_spark.operators.packing import pack_sequences
    from mindseye_dataframes_spark.queries.training import (
        _BLOCK,
        manifest_append,
        manifest_segments,
    )

    # token counts chosen to straddle: doc 3 crosses a block boundary,
    # doc 4 (first delta doc) lands mid-block
    docs = spark.createDataFrame(
        [(i, 100 + 37 * i) for i in range(8)], "doc_id long, n_tokens long"
    )
    base = docs.filter("doc_id < 4")
    delta = docs.filter("doc_id >= 4")

    def manifest(d):
        packed = pack_sequences(d, "n_tokens", ["doc_id"], _BLOCK).select(
            "doc_id",
            F.col("n_tokens").alias("n"),
            F.col("start_offset").alias("s"),
        )
        return manifest_segments(packed)

    full = {tuple(r) for r in manifest(docs).collect()}
    base_manifest = manifest(base)
    base_total = base.agg(F.sum("n_tokens")).collect()[0][0]
    incr = manifest_append(
        base_manifest, base_total, delta, "n_tokens", ["doc_id"]
    )
    got = {tuple(r) for r in incr.collect()}
    assert got == full and len(full) > 0
    # the cheap-precondition path (ADVICE r11): base_keys = the
    # PRE-EXPLODE base docs, so the check never aggregates the
    # manifest plan — result must be identical
    incr_cheap = manifest_append(
        base_manifest, base_total, delta, "n_tokens", ["doc_id"],
        base_keys=base,
    )
    assert {tuple(r) for r in incr_cheap.collect()} == full
    # sanity: the boundary block genuinely mixes base and delta docs
    by_block = {}
    for bid, doc, *_ in full:
        by_block.setdefault(bid, set()).add(doc)
    boundary = [b for b, ds in by_block.items() if ds & {0, 1, 2, 3} and ds & {4, 5, 6, 7}]
    assert boundary, "fixture must exercise a base/delta straddling block"


def test_manifest_append_rejects_interleaving_delta(spark):
    """The O(delta) append is only equivalent to a rebuild when every
    delta key sorts after every base key; an interleaving delta must
    fail loudly (ValueError from the precondition aggregates), not
    silently produce a manifest that diverges from the rebuild
    (ADVICE r10)."""
    import pytest

    from mindseye_dataframes_spark.operators.packing import pack_sequences
    from mindseye_dataframes_spark.queries.training import (
        _BLOCK,
        manifest_append,
        manifest_segments,
    )

    docs = spark.createDataFrame(
        [(i, 100 + 37 * i) for i in range(8)], "doc_id long, n_tokens long"
    )
    base = docs.filter("doc_id >= 4")  # WRONG side: base holds the larger ids
    delta = docs.filter("doc_id < 4")
    packed = pack_sequences(base, "n_tokens", ["doc_id"], _BLOCK).select(
        "doc_id",
        F.col("n_tokens").alias("n"),
        F.col("start_offset").alias("s"),
    )
    base_manifest = manifest_segments(packed)
    base_total = base.agg(F.sum("n_tokens")).collect()[0][0]
    with pytest.raises(ValueError, match="precondition"):
        manifest_append(base_manifest, base_total, delta, "n_tokens", ["doc_id"])
    # the cheap base_keys precondition path must reject it too
    with pytest.raises(ValueError, match="precondition"):
        manifest_append(
            base_manifest, base_total, delta, "n_tokens", ["doc_id"],
            base_keys=base,
        )
    # the caller-enforced escape hatch still works
    out = manifest_append(
        base_manifest, base_total, delta, "n_tokens", ["doc_id"],
        check_order=False,
    )
    assert out.count() > 0
