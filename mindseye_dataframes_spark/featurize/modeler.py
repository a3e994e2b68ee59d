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
from functools import reduce as _reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mindseye_dataframes_spark.featurize.context import ModelContext
from mindseye_dataframes_spark.featurize.layers import Network
from mindseye_dataframes_spark.featurize.strategy import ModelingStrategy
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


class DataframeModeler:
    """Facade mirroring `DataframeModeler.scala:48-50`."""

    def __init__(
        self,
        strategy: ModelingStrategy,
        context: ModelContext | None = None,
        root: str = "",
    ):
        self.strategy = strategy
        self.context = context or ModelContext()
        self.root = root
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
            key_frames = [
                df.select(
                    F.lit(ch.path).alias("path"),
                    F.col(ch.col).cast("string").alias("value"),
                )
                .filter(F.col("value").isNotNull())
                .distinct()
                for ch in discover
            ]
            keys = _reduce(lambda a, b: a.unionAll(b), key_frames).distinct()
            discovered_keys.extend(
                self.strategy.key_for(path, value)
                for path, value in sorted(
                    (r["path"], r["value"]) for r in keys.collect()
                )
            )
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
        bc = spark.sparkContext.broadcast(
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
                out[name] = [row.tolist() for row in x]
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
        self, df: DataFrame, network: Network, label_col: str
    ) -> tuple[float, dict[str, np.ndarray]]:
        """One distributed forward+backward pass: returns (mean loss,
        gradients by param key). Per-partition partial gradients are
        merged by a distributed groupBy-key array sum; only final
        per-key gradients reach the driver."""
        chans = self.channels(df.schema)
        label_chan = next(c for c in chans if c.col == label_col)
        skip = {label_chan.path}
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(
            (
                self.context.all_params(),
                self.context.stats,
                chans,
                self.strategy.default_size,
                self.strategy.mapping_power,
                skip,
                network,
                label_chan,
                self.strategy,
            )
        )
        featurize = DataframeModeler._featurize
        route = DataframeModeler._route_feature_grads

        def fwd_bwd(batches):
            params, stats, chans_b, size, power, skip_b, net, lchan, strat = bc.value
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
                loss, grads, grad_x = net.loss_and_grads(params, x, target)
                grads.update(route(grad_x, chans_b, caches, skip_b, strat))
                w = len(pdf)
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
        params = self.context.all_params()
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
        verbose: bool = False,
    ) -> list[float]:
        """Epoch schedule over sample fractions with gradient descent
        and learning-rate halving on in-epoch loss regression — a
        simplified backtracking stand-in for the reference's bisection
        line search (`Trainer.scala:68-71,170-193`). Seeded sampling —
        the reference left it unseeded (SURVEY §7.3 risk 4)."""
        if not self.context.representations and not self.context.stats:
            self.init_keys(df, label_col)
        for key, arr in network.init_params().items():
            self.context.layers.setdefault(key, arr)
        losses: list[float] = []
        for epoch, fraction in enumerate(fractions):
            batch = df.sample(fraction=min(fraction, 1.0), seed=seed + epoch)
            batch = batch.persist()
            try:
                step_lr = lr
                epoch_losses: list[float] = []
                for _ in range(max_iters):
                    loss, grads = self.eval(batch, network, label_col)
                    epoch_losses.append(loss)
                    losses.append(loss)
                    if verbose:
                        print(f"epoch {epoch} fraction {fraction} loss {loss:.5f}")
                    # compare within the epoch only — across epochs the
                    # sample fraction changes and losses aren't comparable
                    if (
                        line_search
                        and len(epoch_losses) >= 2
                        and epoch_losses[-1] > epoch_losses[-2]
                    ):
                        step_lr /= 2  # halve on regression
                    self.context.apply_gradients(grads, step_lr)
            finally:
                batch.unpersist()
        return losses
