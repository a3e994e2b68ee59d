"""DataframeModeler — schema-recursive differentiable featurization.

Rebuild of the reference's core (`DataframeModeler.scala`,
`ModelingStrategy.scala`) on idiomatic PySpark:

- **Schema recursion** (`DataframeModeler.scala:68-119`): walk the
  DataFrame schema; ``StructType`` recurses with path extension,
  int/string columns are categorical (F1), doubles are numeric (F2),
  struct children reduce by element-wise sum (F3,
  `ModelingStrategy.scala:84-89`).
- **Key discovery** (`initKeys`, `DataframeModeler.scala:163-178`) is
  TWO aggregate queries — one distinct-keys union (A2), one moments
  aggregation (A1) — run ONCE and cached in the ModelContext, fixing
  the reference's per-eval rescan (SURVEY §4.3a). Moments accumulate
  in exact decimal so the derived parameters are bit-reproducible.
- **Batch inference** ``eval_to_dataframe`` (M1,
  `ModelingStrategy.scala:167-186`): broadcast params → Arrow-batched
  ``mapInPandas`` forward → ``name: array<double>`` column.
- **Distributed gradients** ``eval`` (M2,
  `ModelingStrategy.scala:188-236`): per-partition forward+backward
  emits (key, grad) rows; the merge is a *distributed* groupBy-key
  array sum (fixing the reference's flat reduce through the driver,
  SURVEY §4.3c) and only the final per-key gradients reach the driver.
- **Training** ``fit`` (M3/M4, `Trainer.scala:170-193`): epoch
  schedule over sample fractions, gradient descent with bisection
  line search; the mutated context re-broadcasts each step
  (broadcasts are immutable — SURVEY §7.3 risk 2).

Scale notes: the only driver-sized state is the parameter dict
(capped by dictionary size — hash-bucket embeddings if categorical
cardinality explodes); everything row-shaped stays on executors.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mindseye_dataframes_spark.compat import broadcast_value
from mindseye_dataframes_spark.featurize.context import ModelContext
from mindseye_dataframes_spark.featurize.layers import Network
from mindseye_dataframes_spark.featurize.strategy import (
    ModelingStrategy,
    PathBucketedOverlay,
)
from mindseye_dataframes_spark.functions.exact import dec
from mindseye_dataframes_spark.functions.hashing import seeded_unit_rms_tensor  # noqa: F401 (re-exported for strategies)

LOSS_KEY = "__loss__"


@dataclass
class Channel:
    path: str  # hierarchical key path, e.g. "lineitem/l_quantity"
    col: str  # spark column accessor, e.g. "l_quantity" or "a.b"
    kind: str  # "categorical" | "numeric" | "vector"
    dtype: str = "string"  # spark simpleString of the source column


_INT_DTYPES = {"int", "bigint", "smallint", "tinyint"}


def _render_values(col: pd.Series, dtype: str) -> list:
    """Render a pandas column the way Spark's CAST(x AS STRING) does,
    so executor-side parameter keys match driver-discovered keys:
    booleans are 'true'/'false' (pandas str() gives 'True'), integer
    columns that arrived as float64 via Arrow null-handling render
    without the '.0', and nulls stay None (null categorical values
    contribute a zero vector, never a 'nan' key)."""
    out = []
    for v in col:
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
            out.append(None)
        elif dtype == "boolean":
            out.append("true" if v else "false")
        elif dtype in _INT_DTYPES:
            out.append(str(int(v)))
        else:
            out.append(str(v))
    return out


class DictionaryOverflowError(RuntimeError):
    """A categorical path's distinct-value dictionary exceeds the
    configured driver cap and on_dictionary_overflow='error'."""


class DataframeModeler:
    """Facade mirroring `DataframeModeler.scala:48-50`."""

    def __init__(
        self,
        strategy: ModelingStrategy,
        context: ModelContext | None = None,
        root: str = "",
        max_dictionary_keys: int = 100_000,
        on_dictionary_overflow: str = "auto_bucket",
        overflow_buckets: int = 1 << 16,
    ):
        if on_dictionary_overflow not in ("auto_bucket", "error"):
            raise ValueError(
                "on_dictionary_overflow must be 'auto_bucket' or 'error', "
                f"got {on_dictionary_overflow!r}"
            )
        self.strategy = strategy
        self.context = context or ModelContext()
        self.root = root
        # Guard for the init_keys dictionary collect (the reference
        # collects distinct values unconditionally,
        # `DataframeModeler.scala:163-178` — a driver OOM at 100 TB
        # cardinalities). Above the cap, the offending paths either
        # auto-switch to hashed-bucket embeddings (PathBucketedOverlay)
        # or raise DictionaryOverflowError, per on_dictionary_overflow.
        self.max_dictionary_keys = max_dictionary_keys
        self.on_dictionary_overflow = on_dictionary_overflow
        self.overflow_buckets = overflow_buckets
        # broadcasts created by eval_to_dataframe stay alive while the
        # (lazy) result DataFrame is unconsumed; they are released on
        # the next call or via release_broadcasts() (unpersist, not
        # destroy — a re-used broadcast re-ships lazily from the driver)
        self._live_broadcasts: list = []

    def release_broadcasts(self) -> None:
        """Drop executor copies of broadcasts from earlier
        ``eval_to_dataframe`` calls. Called automatically at the start
        of each new inference call so repeated inference on a
        long-lived session doesn't accumulate broadcast blocks."""
        for bc in self._live_broadcasts:
            try:
                bc.unpersist()
            except Exception:
                pass  # session already stopped
        self._live_broadcasts.clear()

    # -- schema recursion (P5 / F1-F3) ---------------------------------
    def channels(self, schema: T.StructType, path: str | None = None, col: str = "") -> list[Channel]:
        """Walk the schema exactly like `DataframeModeler.scala:68-119`:
        struct → recurse, int/string → categorical, double/float →
        numeric, anything else → explicit unsupported (the reference
        MatchError-ed; SURVEY §7.3 risk 3)."""
        out: list[Channel] = []
        base = self.root if path is None else path
        for field in schema.fields:
            p = f"{base}/{field.name}" if base else field.name
            c = f"{col}.{field.name}" if col else field.name
            dt = field.dataType
            if isinstance(dt, T.StructType):
                out.extend(self.channels(dt, p, c))
            elif isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.StringType, T.BooleanType)):
                out.append(Channel(p, c, "categorical", dt.simpleString()))
            elif isinstance(dt, (T.DoubleType, T.FloatType)):
                out.append(Channel(p, c, "numeric", dt.simpleString()))
            elif isinstance(dt, T.TimestampType):
                # SURVEY §1.2 extension: timestamp → epoch-seconds
                # double, then the standard z-score numeric channel
                out.append(Channel(p, c, "numeric", "timestamp"))
            elif isinstance(dt, T.ArrayType) and isinstance(
                dt.elementType, (T.DoubleType, T.FloatType)
            ):
                # SURVEY §1.2 extension: embedding column → learned
                # affine map [dim → default_size]
                out.append(Channel(p, c, "vector", dt.simpleString()))
            # other types are not featurized (documented type matrix)
        return out

    # -- key discovery: two aggregate queries, cached (F1/F2/A1/A2) ----
    def init_keys(self, df: DataFrame, label_col: str | None = None) -> None:
        chans = self.channels(df.schema)
        cats = [ch for ch in chans if ch.kind == "categorical"]
        nums = [ch for ch in chans if ch.kind == "numeric"]
        vecs = [ch for ch in chans if ch.kind == "vector"]

        discovered_keys: list[str] = []
        discover = []
        for ch in cats:
            enumerated = self.strategy.enumerate_keys(ch.path)
            if enumerated is not None:
                # bounded dictionaries (e.g. hashed buckets) enumerate
                # their keys a priori — no data scan, no driver collect
                discovered_keys.extend(enumerated)
            else:
                discover.append(ch)
        if discover:
            # ONE scan for every discovered channel: explode each row
            # into its (path, value) pairs and distinct once. The
            # previous per-channel distinct-then-union shape scanned
            # the input once PER categorical channel — at 100 TB that
            # is C full passes for C dictionary columns; this is one.
            # The distinct's map-side partial aggregation still dedupes
            # before the (path, value) exchange, so shuffle volume is
            # unchanged. Same key set: explode(C pairs)+filter+distinct
            # ≡ union of per-channel filtered distincts.
            pair_structs = [
                F.struct(
                    F.lit(ch.path).alias("path"),
                    F.col(ch.col).cast("string").alias("value"),
                )
                for ch in discover
            ]
            keys = (
                df.select(F.explode(F.array(*pair_structs)).alias("pv"))
                .select(F.col("pv.path").alias("path"), F.col("pv.value").alias("value"))
                .filter(F.col("value").isNotNull())
                .distinct()
            )
            # the cardinality probe and the value collect below are
            # two jobs over the same union-of-distincts aggregation —
            # pin it so the dominant shuffle of key discovery runs once
            # (the overflow branch rebinds ``keys`` with a filter on
            # top, so keep the pinned handle for the unpersist)
            keys = pinned = keys.persist()
            try:
                if self.max_dictionary_keys is not None:
                    # cardinality probe BEFORE any row collect: O(paths)
                    # rows to the driver, never values. Paths over the cap
                    # auto-bucket (hashing trick) or error; only the
                    # survivors' values are ever materialized.
                    per_path = {
                        r["path"]: r["c"]
                        for r in keys.groupBy("path")
                        .agg(F.count(F.lit(1)).alias("c"))
                        .collect()
                    }
                    over = sorted(
                        p
                        for p, c in per_path.items()
                        if c > self.max_dictionary_keys
                    )
                    if over:
                        if self.on_dictionary_overflow == "error":
                            raise DictionaryOverflowError(
                                f"distinct-value dictionaries for {over} exceed "
                                f"max_dictionary_keys={self.max_dictionary_keys} "
                                f"(counts: {[per_path[p] for p in over]}); use "
                                "HashedBucketStrategy, raise the cap, or set "
                                "on_dictionary_overflow='auto_bucket'"
                            )
                        self.strategy = PathBucketedOverlay(
                            self.strategy, over, n_buckets=self.overflow_buckets
                        )
                        for p in over:
                            discovered_keys.extend(self.strategy.enumerate_keys(p))
                        keys = keys.filter(~F.col("path").isin(*over))
                discovered_keys.extend(
                    self.strategy.key_for(path, value)
                    for path, value in sorted(
                        (r["path"], r["value"]) for r in keys.collect()
                    )
                )
            finally:
                # unpersist on EVERY exit — a DictionaryOverflowError (or
                # any probe failure) must not leak a cached RDD into a
                # long-lived session
                pinned.unpersist()
        for key in discovered_keys:
            if key not in self.context.representations:
                self.context.representations[key] = (
                    self.strategy.initial_representation(key)
                )
            if self.strategy.is_frozen(key):
                self.context.frozen.add(key)

        if nums:
            aggs = []
            for ch in nums:
                src = (
                    F.col(ch.col).cast("double")
                    if ch.dtype == "timestamp"
                    else F.col(ch.col)
                )
                aggs += [
                    F.count(src).alias(f"n__{ch.path}"),
                    F.sum(dec(src, 4, 18)).cast("double").alias(f"s__{ch.path}"),
                    F.sum(dec(src, 4, 14) * dec(src, 4, 14))
                    .cast("double")
                    .alias(f"q__{ch.path}"),
                ]
            row = df.agg(*aggs).collect()[0]
            for ch in nums:
                n = float(row[f"n__{ch.path}"] or 0)
                s = float(row[f"s__{ch.path}"] or 0.0)
                q = float(row[f"q__{ch.path}"] or 0.0)
                mean = s / n if n else 0.0
                std = float(np.sqrt(abs(q / n - mean * mean))) if n else 1.0  # F6
                self.context.stats[ch.path] = (n, mean, std if std > 0 else 1.0)
                tkey = f"transform/{ch.path}"
                if tkey not in self.context.transforms:
                    size = self.strategy.size(ch.path)
                    p = self.strategy.mapping_power
                    init = seeded_unit_rms_tensor(tkey, p * size).reshape(p, size)
                    self.context.transforms[tkey] = init / np.sqrt(p)

        if vecs:
            # dimension probe: one tiny agg, never a row collect
            dims = df.agg(
                *[
                    F.max(F.size(F.col(ch.col))).alias(f"d__{ch.path}")
                    for ch in vecs
                ]
            ).collect()[0]
            for ch in vecs:
                d = int(dims[f"d__{ch.path}"] or 0)
                key = f"vector/{ch.path}"
                if d and key not in self.context.transforms:
                    size = self.strategy.size(ch.path)
                    init = seeded_unit_rms_tensor(key, d * size).reshape(d, size)
                    # scale so the projected output stays unit-RMS for
                    # unit-RMS inputs (same convention as transforms)
                    self.context.transforms[key] = init / np.sqrt(d)

        if label_col is not None:
            # dimension probe happens via strategy.size on the label path
            pass

    # -- featurization (executed inside mapInPandas) -------------------
    @staticmethod
    def _featurize(
        pdf: pd.DataFrame,
        chans: list[Channel],
        params: dict[str, np.ndarray],
        stats: dict[str, tuple[float, float, float]],
        size: int,
        mapping_power: int,
        skip_paths: set[str],
        strat: "ModelingStrategy",
    ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        """Batch → summed feature tensor [n, size] (F1+F2 reduced by F3
        sum). Returns per-channel caches for backward."""
        n = len(pdf)
        out = np.zeros((n, size))
        caches: dict[str, np.ndarray] = {}
        for ch in chans:
            if ch.path in skip_paths:
                continue
            col = pdf[ch.col.replace(".", "__")]
            if ch.kind == "categorical":
                vals = _render_values(col, ch.dtype)
                rows = np.zeros((n, size))
                lookup: dict = {}
                for i, v in enumerate(vals):
                    if v is None:
                        continue  # null category -> zero contribution
                    vec = lookup.get(v)
                    if vec is None:
                        key = strat.key_for(ch.path, v)
                        vec = params.get(key)
                        if vec is None:  # lookup-or-init, deterministic
                            vec = strat.initial_representation(key)
                        lookup[v] = vec
                    rows[i] = vec
                out += rows
                caches[ch.path] = vals
            elif ch.kind == "vector":
                w = params.get(f"vector/{ch.path}")
                if w is None:
                    continue  # no vectors seen at init (empty column)
                d = w.shape[0]
                mat = np.zeros((n, d))
                for i, v in enumerate(col):
                    if v is None:
                        continue  # null vector -> zero contribution
                    a = np.asarray(v, dtype=np.float64)
                    m = min(d, a.shape[0])
                    mat[i, :m] = a[:m]  # ragged rows pad/truncate
                out += mat @ w
                caches[ch.path] = mat
            else:
                if ch.dtype == "timestamp":
                    # epoch seconds — matches Spark CAST(ts AS DOUBLE),
                    # so executor features use the driver's moments
                    arr = pd.to_datetime(col).to_numpy(dtype="datetime64[ns]")
                    nat = np.isnat(arr)
                    vals_np = arr.astype("int64").astype(np.float64) / 1e9
                    vals_np[nat] = np.nan
                else:
                    vals_np = col.to_numpy(dtype=np.float64)
                _, mean, std = stats[ch.path]
                z = (vals_np - mean) / std
                # null numeric -> z=0 (the mean), mirroring the
                # null-categorical zero-contribution convention
                z = np.nan_to_num(z, nan=0.0)
                feats = np.stack([z**i for i in range(mapping_power)], axis=1)  # [1, z, ...]
                out += feats @ params[f"transform/{ch.path}"]
                caches[ch.path] = feats
        return out, caches

    @staticmethod
    def _route_feature_grads(
        grad_in: np.ndarray,
        chans: list[Channel],
        caches: dict[str, np.ndarray],
        skip_paths: set[str],
        strat: "ModelingStrategy",
    ) -> dict[str, np.ndarray]:
        """Route d(loss)/d(features) into embedding and transform
        gradients (reference `DataframeModeler.accumulate`,
        `DataframeModeler.scala:192-211`)."""
        grads: dict[str, np.ndarray] = {}
        for ch in chans:
            if ch.path in skip_paths or ch.path not in caches:
                continue
            if ch.kind == "categorical":
                vals = caches[ch.path]
                # group rows by categorical value: one grad per key
                # (hashed-bucket keys accumulate across colliding values;
                # null categories contributed nothing -> no gradient)
                groups: dict = {}
                for i, v in enumerate(vals):
                    if v is not None:
                        groups.setdefault(v, []).append(i)
                for v, idxs in groups.items():
                    key = strat.key_for(ch.path, v)
                    g = grad_in[idxs].sum(axis=0)
                    prev = grads.get(key)
                    grads[key] = g if prev is None else prev + g
            elif ch.kind == "vector":
                grads[f"vector/{ch.path}"] = caches[ch.path].T @ grad_in
            else:
                feats = caches[ch.path]
                grads[f"transform/{ch.path}"] = feats.T @ grad_in
        return grads

    def _flat_select(self, df: DataFrame, chans: list[Channel]) -> DataFrame:
        """Flatten (possibly nested) channel columns to top level so the
        Arrow batches carry plain columns; pushes column pruning into
        the scan."""
        return df.select(
            *[F.col(ch.col).alias(ch.col.replace(".", "__")) for ch in chans]
        )

    # -- M1: batch inference ------------------------------------------
    def eval_to_dataframe(
        self, df: DataFrame | list[DataFrame], name: str = "features",
        network: Network | None = None,
        label_col: str | None = None, passthrough: list[str] | None = None,
        order_keys: list[list[str]] | None = None,
    ) -> DataFrame:
        """Featurize (plus optional network forward) into a new column
        ``name: array<double>`` (`ModelingStrategy.scala:167-186`).

        ``df`` may be a LIST of DataFrames — the reference's N-ary
        signature (`DataframeModeler.scala:48-50`): the frames are
        positionally zipped (`:246-258`) before featurization, which
        on an unordered relation requires one explicit unique
        ``order_keys`` list per frame (SURVEY §7.3 risk 1).

        ``passthrough`` columns are excluded from featurization and
        copied into the output unchanged — the keyed alternative to
        the reference's positional zip of results back onto inputs.
        """
        if isinstance(df, (list, tuple)):
            from mindseye_dataframes_spark.operators.zip_frames import zip_frames

            if len(df) == 1:
                df = df[0]
            else:
                if order_keys is None:
                    raise ValueError(
                        "zipping multiple frames needs one order_keys list per "
                        "frame: DataFrames are unordered (SURVEY §7.3 risk 1)"
                    )
                df = zip_frames(list(df), order_keys)
        self.release_broadcasts()
        passthrough = passthrough or []
        chans = self.channels(
            T.StructType([f for f in df.schema.fields if f.name not in passthrough])
        )
        skip = {c.path for c in chans if label_col and c.col == label_col}
        if not self.context.stats and not self.context.representations:
            self.init_keys(df)
        spark = df.sparkSession
        bc = broadcast_value(
            spark,
            (
                self.context.all_params(),
                self.context.stats,
                chans,
                self.strategy.default_size,
                self.strategy.mapping_power,
                skip,
                network.layers if network else None,
                self.strategy,
            )
        )
        self._live_broadcasts.append(bc)

        featurize = DataframeModeler._featurize

        def infer(batches):
            params, stats, chans_b, size, power, skip_b, net_layers, strat = bc.value
            for pdf in batches:
                x, _ = featurize(pdf, chans_b, params, stats, size, power, skip_b, strat)
                if net_layers:
                    for layer in net_layers:
                        x, _ = layer.forward(params, x)
                out = pdf[passthrough].copy() if passthrough else pd.DataFrame(index=pdf.index)
                # bulk C-level conversion: ndarray.tolist() on the
                # whole matrix, not a Python loop over 10k rows/batch
                out[name] = x.tolist()
                yield out

        flat = df.select(
            *[F.col(c) for c in passthrough],
            *[F.col(ch.col).alias(ch.col.replace(".", "__")) for ch in chans],
        )
        out_schema = ", ".join(
            [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in passthrough]
            + [f"{name} array<double>"]
        )
        return flat.mapInPandas(infer, schema=out_schema)

    # -- M2: distributed forward+backward ------------------------------
    def eval(
        self, df: DataFrame, network: Network, label_col: str,
        loss_only: bool = False,
        params_override: dict[str, np.ndarray] | None = None,
    ) -> tuple[float, dict[str, np.ndarray]]:
        """One distributed forward+backward pass: returns (mean loss,
        gradients by param key). Per-partition partial gradients are
        merged by a distributed groupBy-key array sum; only final
        per-key gradients reach the driver.

        ``loss_only`` skips the backward pass and gradient shuffle — the
        cheap forward probe the bisection line search runs several times
        per optimizer step. ``params_override`` evaluates a trial
        parameter set without mutating the context."""
        chans = self.channels(df.schema)
        label_chan = next(c for c in chans if c.col == label_col)
        skip = {label_chan.path}
        spark = df.sparkSession
        eval_params = (
            params_override if params_override is not None
            else self.context.all_params()
        )
        bc = broadcast_value(
            spark,
            (
                eval_params,
                self.context.stats,
                chans,
                self.strategy.default_size,
                self.strategy.mapping_power,
                skip,
                network,
                label_chan,
                self.strategy,
                loss_only,
            )
        )
        featurize = DataframeModeler._featurize
        route = DataframeModeler._route_feature_grads

        def fwd_bwd(batches):
            params, stats, chans_b, size, power, skip_b, net, lchan, strat, fwd_only = bc.value
            acc: dict[str, np.ndarray] = {}
            loss_sum, n_rows = 0.0, 0
            for pdf in batches:
                if not len(pdf):
                    continue
                labels = _render_values(pdf[lchan.col.replace(".", "__")], lchan.dtype)
                keep = [i for i, v in enumerate(labels) if v is not None]
                if not keep:
                    continue
                if len(keep) < len(pdf):
                    pdf = pdf.iloc[keep].reset_index(drop=True)
                    labels = [labels[i] for i in keep]
                x, caches = featurize(
                    pdf, chans_b, params, stats, size, power, skip_b, strat
                )
                # one lookup per DISTINCT label, not per row (the .get
                # default would eagerly build a seeded tensor per row)
                table: dict = {}
                for v in labels:
                    if v not in table:
                        key = strat.key_for(lchan.path, v)
                        vec = params.get(key)
                        table[v] = (
                            vec if vec is not None else strat.initial_representation(key)
                        )
                target = np.stack([table[v] for v in labels])
                w = len(pdf)
                if fwd_only:
                    logits, _ = net.forward(params, x)
                    loss, _, _ = net.head.forward_loss(logits, target)
                    loss_sum += loss * w
                    n_rows += w
                    continue
                loss, grads, grad_x = net.loss_and_grads(params, x, target)
                grads.update(route(grad_x, chans_b, caches, skip_b, strat))
                loss_sum += loss * w
                n_rows += w
                # loss_and_grads returns batch-MEAN gradients; convert
                # to sums so partitions of unequal size merge correctly
                # (global mean applied once, after the merge)
                for k, g in grads.items():
                    prev = acc.get(k)
                    gw = g * w
                    acc[k] = gw if prev is None else prev + gw
            rows = [(k, v.ravel().tolist(), 0.0, 0) for k, v in acc.items()]
            rows.append((LOSS_KEY, [], loss_sum, n_rows))
            yield pd.DataFrame(rows, columns=["key", "grad", "loss", "n"])

        flat = self._flat_select(df, chans)
        partials = flat.mapInPandas(
            fwd_bwd, schema="key string, grad array<double>, loss double, n long"
        )

        def merge_group(key, pdf):
            k = key[0]
            if k == LOSS_KEY:
                return pd.DataFrame(
                    [(k, [], float(pdf["loss"].sum()), int(pdf["n"].sum()))],
                    columns=["key", "grad", "loss", "n"],
                )
            total = np.sum(np.stack(pdf["grad"].map(np.asarray)), axis=0)
            return pd.DataFrame(
                [(k, total.tolist(), 0.0, 0)], columns=["key", "grad", "loss", "n"]
            )

        merged = partials.groupBy("key").applyInPandas(
            merge_group, schema="key string, grad array<double>, loss double, n long"
        )
        loss_total, n_total = 0.0, 0
        grads: dict[str, np.ndarray] = {}
        params = eval_params
        for row in merged.collect():
            if row["key"] == LOSS_KEY:
                loss_total, n_total = row["loss"], row["n"]
            else:
                shape = params[row["key"]].shape if row["key"] in params else None
                g = np.array(row["grad"])
                grads[row["key"]] = g.reshape(shape) if shape else g
        bc.unpersist()
        n_total = max(n_total, 1)
        for k in grads:
            grads[k] = grads[k] / n_total
        return (loss_total / n_total, grads)

    # -- M3/M4: training loop ------------------------------------------
    def _line_search(
        self,
        batch: DataFrame,
        network: Network,
        label_col: str,
        grads: dict[str, np.ndarray],
        f0: float,
        t0: float,
        max_probes: int = 3,
    ) -> float:
        """Bisection line search over the step size (the reference's
        ``BisectionSearch``, `Trainer.scala:68-69,183-184`): ≥2
        loss-only distributed probes per optimizer step, each a forward
        pass over the SAME persisted batch (the probe cache — the
        featurized tensors themselves cannot be reused across probes
        because trial parameters change the featurization). Expands the
        step while the loss improves, halves it while it regresses;
        returns the best improving step, or 0.0 when none was found."""
        base = self.context.all_params()
        frozen = self.context.frozen

        def probe(t: float) -> float:
            trial = dict(base)
            for k, g in grads.items():
                if k in trial and k not in frozen:
                    trial[k] = trial[k] - t * g
            loss, _ = self.eval(
                batch, network, label_col, loss_only=True, params_override=trial
            )
            return loss

        probes: list[tuple[float, float]] = [(t0, probe(t0))]
        if probes[-1][1] < f0:
            while len(probes) < max(2, max_probes):
                t_next = probes[-1][0] * 2.0
                f_next = probe(t_next)
                probes.append((t_next, f_next))
                if f_next >= probes[-2][1]:
                    break
        else:
            while len(probes) < max(2, max_probes):
                t_next = probes[-1][0] / 2.0
                f_next = probe(t_next)
                probes.append((t_next, f_next))
                if f_next < f0:
                    break
        self.probe_history.append(len(probes))
        best_t, best_f = min(probes, key=lambda p: p[1])
        return best_t if best_f < f0 else 0.0

    def fit(
        self,
        df: DataFrame,
        network: Network,
        label_col: str,
        fractions: list[float] = (0.1, 0.2),
        max_iters: int = 10,
        lr: float = 0.1,
        seed: int = 42,
        line_search: bool = True,
        max_probes: int = 3,
        verbose: bool = False,
    ) -> list[float]:
        """Epoch schedule over sample fractions with gradient descent
        and a bisection line search per step, mirroring the reference's
        ``GradientDescent`` + ``BisectionSearch``
        (`Trainer.scala:68-71,170-193`). Each epoch's sampled batch is
        persisted once (MEMORY_ONLY serialized, the reference's working
        tier `Trainer.scala:174`) and shared by the gradient pass and
        every line-search probe. Seeded sampling — the reference left
        it unseeded (SURVEY §7.3 risk 4). Within an epoch the loss is
        monotone non-increasing: a step is taken only when a probe
        confirmed it improves the (deterministic) batch loss."""
        from mindseye_dataframes_spark.sources.staging import stage

        if not self.context.representations and not self.context.stats:
            self.init_keys(df, label_col)
        for key, arr in network.init_params().items():
            self.context.layers.setdefault(key, arr)
        losses: list[float] = []
        self.probe_history: list[int] = []
        for epoch, fraction in enumerate(fractions):
            batch = df.sample(fraction=min(fraction, 1.0), seed=seed + epoch)
            batch = stage(batch, "working")
            try:
                step = lr
                for _ in range(max_iters):
                    loss, grads = self.eval(batch, network, label_col)
                    losses.append(loss)
                    if verbose:
                        print(f"epoch {epoch} fraction {fraction} loss {loss:.5f}")
                    if line_search:
                        step = self._line_search(
                            batch, network, label_col, grads, loss, step, max_probes
                        )
                        if step == 0.0:
                            break  # no improving step on this batch
                    self.context.apply_gradients(grads, step)
            finally:
                batch.unpersist()
        return losses
