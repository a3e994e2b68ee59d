"""Featurization + training tests (SURVEY §5.2: seeded parity vs
numpy on tiny frames; training smoke = loss strictly decreases)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindseye_dataframes_spark.featurize import (
    CategorizingStrategy,
    DataframeModeler,
    ModelContext,
    ModelingStrategy,
)
from mindseye_dataframes_spark.featurize.layers import Dense, Network, ReLU, mlp
from mindseye_dataframes_spark.functions.hashing import (
    hmac_sha1_seed,
    name_uuid,
    seeded_unit_rms_tensor,
)


def test_name_uuid_matches_java_scheme():
    # UUID.nameUUIDFromBytes("hello".getBytes("UTF-8")) in Java
    assert name_uuid("hello") == "5d41402a-bc4b-3a76-b971-9d911017c592"


def test_seeded_tensor_deterministic_unit_rms():
    a = seeded_unit_rms_tensor("some/key=v", 10)
    b = seeded_unit_rms_tensor("some/key=v", 10)
    assert np.array_equal(a, b)
    assert abs(np.sqrt(np.mean(a**2)) - 1.0) < 1e-12
    assert hmac_sha1_seed("k1") != hmac_sha1_seed("k2")


def test_schema_recursion_channels(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0, (3, 4.0))],
        "i int, s string, d double, st struct<a:int, b:double>",
    )
    modeler = DataframeModeler(ModelingStrategy(default_size=4))
    chans = {c.path: (c.kind, c.col) for c in modeler.channels(df.schema)}
    assert chans == {
        "i": ("categorical", "i"),
        "s": ("categorical", "s"),
        "d": ("numeric", "d"),
        "st/a": ("categorical", "st.a"),
        "st/b": ("numeric", "st.b"),
    }


def test_featurize_matches_numpy(spark):
    """F1+F2+F3 parity: summed features equal a hand computation."""
    rows = [("a", 1.0), ("b", 2.0), ("a", 3.0)]
    df = spark.createDataFrame(rows, "cat string, x double")
    strategy = ModelingStrategy(default_size=4, mapping_power=2)
    modeler = DataframeModeler(strategy)
    modeler.init_keys(df)
    out = (
        modeler.eval_to_dataframe(df, "f")
        .select("f")
        .toPandas()["f"]
        .map(np.array)
    )

    xs = np.array([1.0, 2.0, 3.0])
    mean, std = xs.mean(), xs.std()
    ctx = modeler.context
    w = ctx.transforms["transform/x"]
    for i, (cat, x) in enumerate(rows):
        z = (x - mean) / std
        expect = ctx.representations[f"cat={cat}"] + np.array([1.0, z]) @ w
        assert np.allclose(out[i], expect, atol=1e-9), i
    assert abs(ctx.stats["x"][1] - mean) < 1e-9
    assert abs(ctx.stats["x"][2] - std) < 1e-9


def test_one_hot_strategy():
    s = CategorizingStrategy("label", categories=3, base=1)
    assert np.array_equal(s.initial_representation("label=2"), [0, 1, 0])
    assert s.is_frozen("label=2")
    assert not s.is_frozen("other=2")
    vi = {"R": 0, "A": 1, "N": 2}
    s2 = CategorizingStrategy("flag", categories=3, value_index=vi)
    assert np.array_equal(s2.initial_representation("flag=A"), [0, 1, 0])


def test_network_gradcheck():
    """Analytic vs numerical gradients on a tiny MLP."""
    net = mlp("t", 4, [5], 3)
    params = net.init_params()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 4))
    target = np.eye(3)[rng.integers(0, 3, 6)]
    loss, grads, _ = net.loss_and_grads(params, x, target)
    eps = 1e-6
    for key in grads:
        flat = params[key].ravel()
        for idx in [0, flat.size // 2, flat.size - 1]:
            orig = flat[idx]
            flat[idx] = orig + eps
            lp, _, _ = net.loss_and_grads(params, x, target)
            flat[idx] = orig - eps
            lm, _, _ = net.loss_and_grads(params, x, target)
            flat[idx] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - grads[key].ravel()[idx]) < 1e-4, (key, idx)


def test_eval_distributed_matches_local(spark):
    """Distributed eval (mapInPandas + grouped merge) equals a local
    numpy computation of the same loss/gradients."""
    rows = [("a", 1.0, "X"), ("b", 2.0, "Y"), ("a", 3.0, "X"), ("b", 4.0, "Y")]
    df = spark.createDataFrame(rows, "cat string, x double, label string").repartition(3)
    strategy = CategorizingStrategy(
        "label", categories=2, value_index={"X": 0, "Y": 1}, default_size=4
    )
    modeler = DataframeModeler(strategy)
    modeler.init_keys(df, "label")
    net = mlp("m", 4, [6], 2)
    for k, v in net.init_params().items():
        modeler.context.layers[k] = v

    loss, grads = modeler.eval(df, net, "label")

    # local recomputation
    ctx = modeler.context
    params = ctx.all_params()
    xs = np.array([r[1] for r in rows])
    mean, std = ctx.stats["x"][1], ctx.stats["x"][2]
    feats = np.stack([np.ones(4), (xs - mean) / std], axis=1)
    x_in = np.stack([params[f"cat={r[0]}"] for r in rows]) + feats @ params["transform/x"]
    target = np.stack([params[f"label={r[2]}"] for r in rows])
    loss_l, grads_l, gx = net.loss_and_grads(params, x_in, target)

    assert abs(loss - loss_l) < 1e-9
    for key, g in grads_l.items():
        assert np.allclose(grads[key], g, atol=1e-9), key
    # embedding grads: routed per categorical value
    for v, idx in (("a", [0, 2]), ("b", [1, 3])):
        assert np.allclose(grads[f"cat={v}"], gx[idx].sum(axis=0), atol=1e-9)
    assert np.allclose(grads["transform/x"], feats.T @ gx, atol=1e-9)


def test_training_loss_decreases(spark):
    """M4 smoke (SURVEY §5.2): loss strictly decreases over iterations
    on a covtype-like synthetic task."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"
    )
    strategy = CategorizingStrategy(
        "l_returnflag",
        categories=3,
        value_index={"A": 0, "N": 1, "R": 2},
        default_size=8,
    )
    modeler = DataframeModeler(strategy)
    net = mlp("clf", 8, [16], 3)
    losses = modeler.fit(
        li, net, "l_returnflag", fractions=[0.5], max_iters=4, lr=0.5, seed=1
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0], losses


def test_context_save_load_roundtrip(spark, tmp_path):
    ctx = ModelContext()
    ctx.representations["a=1"] = np.arange(4.0)
    ctx.transforms["transform/x"] = np.arange(8.0).reshape(2, 4)
    ctx.layers["layer/w"] = np.arange(6.0).reshape(2, 3)
    path = str(tmp_path / "params")
    ctx.save(spark, path)
    back = ModelContext.load(spark, path)
    assert np.array_equal(back.representations["a=1"], ctx.representations["a=1"])
    assert np.array_equal(back.transforms["transform/x"], ctx.transforms["transform/x"])
    assert np.array_equal(back.layers["layer/w"], ctx.layers["layer/w"])


def test_hashed_bucket_strategy_caps_dictionary(spark):
    """HashedBucketStrategy bounds the parameter dictionary regardless
    of categorical cardinality (SURVEY §7.3 risk 2) while keeping
    lookups deterministic."""
    from mindseye_dataframes_spark.featurize import HashedBucketStrategy

    n_values = 200
    df = spark.createDataFrame(
        [(i, f"user_{i}") for i in range(n_values)], "id long, user string"
    )
    strategy = HashedBucketStrategy(n_buckets=16, default_size=4)
    modeler = DataframeModeler(strategy)
    modeler.init_keys(df)
    bucket_keys = [k for k in modeler.context.representations if k.startswith("user#")]
    assert 0 < len(bucket_keys) <= 16  # dictionary capped, not 200
    # id is also categorical (long) → its buckets are separate per path
    assert all(k.split("#")[0] in ("user", "id") for k in modeler.context.representations)

    out = modeler.eval_to_dataframe(df, "f", passthrough=["id"]).collect()
    assert len(out) == n_values
    # colliding values share embeddings: featurization must equal the
    # bucket embedding sum computed by hand
    import numpy as np

    params = modeler.context.all_params()
    by_id = {r["id"]: np.array(r["f"]) for r in out}
    for i in (0, 7, 199):
        # passthrough columns are excluded from featurization, so the
        # output is exactly the (possibly shared) user-bucket embedding
        expect = params[strategy.key_for("user", f"user_{i}")]
        assert np.allclose(by_id[i], expect, atol=1e-12)


def test_timestamp_channel_epoch_zscore(spark):
    """Timestamp columns featurize as epoch-seconds z-scores: executor
    features must reproduce CAST(ts AS DOUBLE) against driver moments."""
    import numpy as np

    from mindseye_dataframes_spark.featurize import DataframeModeler, ModelingStrategy

    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00"), (1, "2024-01-02 00:00:00"), (2, None)],
        "rid long, ts string",
    ).select("rid", F.col("ts").cast("timestamp").alias("ts"))
    feat = df.select("rid", "ts")
    modeler = DataframeModeler(ModelingStrategy(default_size=4))
    modeler.init_keys(feat.drop("rid"))
    n, mean, std = modeler.context.stats["ts"]
    assert n == 2  # null excluded from moments
    epochs = [1704067200.0, 1704153600.0]
    assert abs(mean - np.mean(epochs)) < 1e-6
    w = modeler.context.transforms["transform/ts"]
    out = {
        r["rid"]: np.array(r["f"])
        for r in modeler.eval_to_dataframe(feat, "f", passthrough=["rid"]).collect()
    }
    for rid, epoch in enumerate(epochs):
        z = (epoch - mean) / std
        want = np.array([1.0, z]) @ w
        assert np.allclose(out[rid], want, atol=1e-9), rid
    # null timestamp -> z=0 -> bias row only
    assert np.allclose(out[2], np.array([1.0, 0.0]) @ w, atol=1e-9)


def test_vector_channel_affine_and_gradients(spark):
    """array<double> embedding columns project through a learned
    [dim x size] map; gradients flow back into it during training."""
    import numpy as np

    from mindseye_dataframes_spark.featurize import (
        CategorizingStrategy,
        DataframeModeler,
    )
    from mindseye_dataframes_spark.featurize.layers import mlp

    rows = [
        (0, [1.0, 0.0, 2.0], "X"),
        (1, [0.5, 1.5, -1.0], "Y"),
        (2, None, "X"),
    ]
    df = spark.createDataFrame(rows, "rid long, emb array<double>, label string")
    strategy = CategorizingStrategy(
        "label", categories=2, value_index={"X": 0, "Y": 1}, default_size=4
    )
    modeler = DataframeModeler(strategy)
    modeler.init_keys(df.drop("rid"), "label")
    w = modeler.context.transforms["vector/emb"]
    assert w.shape == (3, 4)
    out = {
        r["rid"]: np.array(r["f"])
        for r in modeler.eval_to_dataframe(
            df.drop("label"), "f", passthrough=["rid"]
        ).collect()
    }
    assert np.allclose(out[0], np.array([1.0, 0.0, 2.0]) @ w, atol=1e-9)
    assert np.allclose(out[2], np.zeros(4), atol=1e-12)  # null vector -> zero
    net = mlp("m", 4, [5], 2)
    for k, v in net.init_params().items():
        modeler.context.layers[k] = v
    loss, grads = modeler.eval(df.drop("rid"), net, "label")
    assert np.isfinite(loss)
    assert "vector/emb" in grads and grads["vector/emb"].shape == (3, 4)
    assert float(np.abs(grads["vector/emb"]).sum()) > 0


def test_dictionary_overflow_auto_buckets_high_cardinality(spark):
    """VERDICT r4 item 2: init_keys must never collect a dictionary
    beyond max_dictionary_keys to the driver. Over the cap, the
    offending path auto-switches to hashed buckets (PathBucketedOverlay)
    while low-cardinality paths keep per-value embeddings; featurization
    then runs end-to-end with the overlay. Reference context:
    `DataframeModeler.scala:163-178` is the unconditional collect being
    guarded."""
    import numpy as np

    from mindseye_dataframes_spark.featurize.modeler import (
        DictionaryOverflowError,
    )
    from mindseye_dataframes_spark.featurize.strategy import (
        PathBucketedOverlay,
    )

    n = 500
    df = spark.createDataFrame(
        [
            (i, f"user_{i}", "red" if i % 2 else "blue", float(i))
            for i in range(n)
        ],
        "id long, user string, color string, x double",
    )

    modeler = DataframeModeler(
        ModelingStrategy(default_size=4),
        max_dictionary_keys=50,
        on_dictionary_overflow="auto_bucket",
        overflow_buckets=16,
    )
    modeler.init_keys(df)
    assert isinstance(modeler.strategy, PathBucketedOverlay)
    # both high-cardinality paths bucket; color stays exact
    assert modeler.strategy.bucketed_paths == frozenset({"user", "id"})
    reps = modeler.context.representations
    user_keys = [k for k in reps if k.startswith("user")]
    # the whole user dictionary is the 16 a-priori buckets — no
    # user=<value> key was ever materialized on the driver
    assert sorted(user_keys) == sorted(f"user#bucket={b}" for b in range(16))
    # the low-cardinality path keeps exact per-value embeddings
    assert {"color=red", "color=blue"} <= set(reps)

    out = modeler.eval_to_dataframe(df, "f", passthrough=["id"]).collect()
    assert len(out) == n
    params = modeler.context.all_params()
    ctx = modeler.context
    mean, std = ctx.stats["x"][1], ctx.stats["x"][2]
    w = ctx.transforms["transform/x"]
    by_id = {r["id"]: np.array(r["f"]) for r in out}
    for i in (0, 3, 499):
        z = (float(i) - mean) / std
        expect = (
            params[modeler.strategy.key_for("user", f"user_{i}")]
            + params[f"color={'red' if i % 2 else 'blue'}"]
            + np.array([1.0, z]) @ w
        )
        assert np.allclose(by_id[i], expect, atol=1e-9), i


def test_dictionary_overflow_error_mode_raises(spark):
    from mindseye_dataframes_spark.featurize.modeler import (
        DictionaryOverflowError,
    )

    df = spark.createDataFrame(
        [(f"user_{i}",) for i in range(200)], "user string"
    )
    modeler = DataframeModeler(
        ModelingStrategy(default_size=4),
        max_dictionary_keys=50,
        on_dictionary_overflow="error",
    )
    import pytest as _pytest

    with _pytest.raises(DictionaryOverflowError, match="user"):
        modeler.init_keys(df)


def test_bucketed_overlay_respects_base_path_size():
    """A base strategy with per-path size overrides must size bucketed
    keys by the ORIGINAL path, not the synthetic 'p#bucket' path —
    otherwise layers sized from strategy.size(p) receive mismatched
    representations (review finding, round 5)."""
    from mindseye_dataframes_spark.featurize.strategy import (
        ModelingStrategy,
        PathBucketedOverlay,
    )

    class SizedBase(ModelingStrategy):
        def size(self, path):
            return 32 if path == "wide_col" else self.default_size

    overlay = PathBucketedOverlay(SizedBase(), ["wide_col"], n_buckets=4)
    assert overlay.size("wide_col") == 32
    for key in overlay.enumerate_keys("wide_col"):
        assert overlay.initial_representation(key).shape == (32,), key
    # non-bucketed paths keep base behavior end to end
    assert overlay.initial_representation("other=x").shape == (10,)
