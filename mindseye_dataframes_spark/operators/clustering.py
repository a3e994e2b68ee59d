"""Distributed K-means (Lloyd's) over an embedding column — iterative
ML on the DataFrame API, engine-exact by construction.

Determinism/exactness choices (so a SQL oracle can replay EVERY
iteration bit-for-bit):
- init: one representative per ``vec_id % k`` cell (min id) — the
  same data-derived, RNG-free coarse quantizer as IVF
  (operators/similarity.py:ivf_centroids);
- assignment: squared-L2 as a left fold in doubles (the q90-proven
  identical-fold pairing), quantized to integer nano-units
  (floor(d·1e9 + 0.5) — pure double IEEE ops, bit-identical across
  Spark expressions, numpy, and DuckDB, unlike decimal HALF_UP vs
  np.round banker's) with a cell-id tiebreak so argmin is total;
- means: inputs quantized to integer micros, accumulated as exact
  BIGINT sums (the q114 pattern), divided once in doubles — the new
  centroids are bit-identical regardless of partitioning or engine.

Scale shape per iteration: centroids live on the driver (O(k·d) —
parameters, not data), assignment is a narrow map against centroid
literals (no shuffle, no join), and the means recompute is ONE
hash-aggregate over (cluster, dim). Row data never reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l2_ranked(vec_col, centroid: list[float]):
    """floor(Σ (x_i − c_i)² · 1e9 + 0.5) AS BIGINT — the identical
    left fold on every engine, then an integer nano-unit quantization
    that is PURE double IEEE arithmetic (multiply, add, floor), so
    the expression path, the numpy path, and the DuckDB oracle agree
    on every input — including distances landing exactly on a decimal
    half-boundary, where decimal HALF_UP (Spark round) and banker's
    (np.round) used to diverge. Above 2^53 nanos the grid coarsens
    (double spacing > 1), but cross-engine equality still holds
    exactly: all three quantize the SAME double."""
    # ONE py4j literal per centroid (array literal), not one per element
    # — plan-build time is dominated by py4j round trips at k*d scale
    c_lit = F.lit([float(x) for x in centroid])
    fold = F.aggregate(
        F.zip_with(
            vec_col,
            c_lit,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(fold * F.lit(1e9) + F.lit(0.5)).cast("long")


# Above this many k·d centroid elements the literal-expression argmin
# is replaced by the broadcast-numpy path: a 10⁴-10⁵-cluster SemDeDup
# run would otherwise blow codegen/analysis limits with a k·d-literal
# expression tree (VERDICT r5). Below it, the expression path is the
# better plan (pure codegen, zero Python).
ASSIGN_EXPR_MAX_ELEMS = 4096


def _assign(df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid cell per row: argmin over k distances
    (integer nano-unit quantization, smallest-cell tiebreak) — a
    narrow map either way, no join, no shuffle. Small k·d uses a pure
    literal expression (codegen); large k·d broadcasts the centroid
    matrix and runs an Arrow-batched numpy argmin replaying the
    identical dimension-order fold (bit-identical distances) with the
    same smallest-cell tiebreak — property-pinned in
    tests/test_clustering.py, INCLUDING a constructed half-boundary
    case (test_paths_agree_on_half_boundary_distances) that the old
    round(·,9) contract got wrong: both paths now compute
    floor(d·1e9 + 0.5) with plain double ops, so the equivalence is
    exact rather than measure-zero-argued."""
    if not cents:
        # sequence(1, 0) yields the DESCENDING array [1, 0], so an
        # empty centroid list would silently probe element_at out of
        # bounds instead of assigning nothing — fail loudly instead
        raise ValueError("_assign requires a non-empty centroid list")
    dims = {len(v) for _, v in cents}
    if len(cents) * max(dims or {0}) <= ASSIGN_EXPR_MAX_ELEMS:
        # ONE transform over a centroid-matrix literal instead of k
        # separate fold trees: construction is O(1) py4j calls (the
        # matrix/cells render as single F.expr SQL texts — F.lit on a
        # nested list still expands element-wise, measured 1.2 s vs
        # 7 ms at 16×64), and the per-element fold expression is the
        # SAME zip_with (vec first, centroid second, identical lambda)
        # so every quantized distance is bit-identical to _l2_ranked's
        # — the property tests pin expression ≡ numpy regardless.
        mat_lit = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) + "D" for x in cvec) + ")"
                for _, cvec in cents
            )
            + ")"
        )
        cells_lit = F.expr(
            "array(" + ",".join(str(int(c)) for c, _ in cents) + ")"
        )
        scored = F.transform(
            F.sequence(F.lit(1), F.lit(len(cents))),
            lambda i: F.struct(
                F.floor(
                    F.aggregate(
                        F.zip_with(
                            F.col(vec_col),
                            F.element_at(mat_lit, i),
                            lambda x, c: (x.cast("double") - c)
                            * (x.cast("double") - c),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("d"),
                F.element_at(cells_lit, i).alias("cell"),
            ),
        )
        best = F.array_sort(
            scored,
            lambda a, b: F.when(a["d"] < b["d"], F.lit(-1))
            .when(a["d"] > b["d"], F.lit(1))
            .otherwise(a["cell"] - b["cell"]),
        )[0]["cell"]
        return df.withColumn("_cell", best)
    return _assign_numpy(df, vec_col, cents)


def _assign_numpy(
    df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Large-k assignment: broadcast the k×d centroid matrix (O(k·d)
    driver→executor, parameters not data) and compute the argmin in
    ONE Arrow-batched mapInPandas pass — still a narrow map with zero
    shuffle, but plan size is O(1) instead of O(k·d) literals.

    Exactness contract (identical to the expression path): the
    squared-L2 is accumulated as the SAME left fold over dimensions
    (acc += (x_j − c_j)² for j = 0..d−1, vectorized across rows and
    centroids, so each scalar sees the identical IEEE sequence),
    quantized to integer nano-units (np.floor(acc·1e9 + 0.5) — the
    same three double ops the expression path runs, so agreement is
    exact even on half-boundaries); ties break to the smallest cell id
    (centroids sorted ascending + argmin-first-occurrence). Assumes
    fixed-length vectors (ragged inputs are undefined in the
    expression path too — zip_with nulls poison the fold)."""
    import numpy as np

    from pyspark.sql import types as T

    cents = sorted(cents)  # argmin's first-occurrence tiebreak = min cell
    cells = np.array([c for c, _ in cents], dtype=np.int64)
    mat = np.array([v for _, v in cents], dtype=np.float64)  # [k, d]

    from mindseye_dataframes_spark.compat import broadcast_value

    # classic: one broadcast block per executor; Connect: the shim
    # ships the centroid matrix in the task closure — same result
    bc = broadcast_value(df.sparkSession, (cells, mat))
    # fresh StructType — StructType.add would MUTATE the frame's
    # cached schema and desync it from the JVM plan
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_cell", T.IntegerType())]
    )

    # Cache-blocked fold: the naive layout streams a full [n, k]
    # accumulator through memory d times (at k=16384, batch n=10⁴
    # that is a 1.2 GB array × 64 passes × 3 temporaries — measured
    # 66.5 s for the sf1 probe). Tiling rows×centroids keeps each
    # (RB × KB) accumulator L3-resident across the whole d-loop and
    # replaces the per-step temporaries with two reused out= buffers.
    # Exactness is untouched: every (row, centroid) scalar still sees
    # the IDENTICAL left fold acc += (x_j − c_j)² in dimension order —
    # tiling only changes which scalars are computed together, never
    # the per-scalar IEEE sequence (pinned by
    # test_blocked_fold_matches_unblocked).
    _RB, _KB = 512, 2048

    def assign(batches):
        cells_b, mat_b = bc.value
        k, d = mat_b.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(_cell=np.array([], dtype=np.int32))
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # [n, d]
            n = len(pdf)
            best = np.empty(n, dtype=np.int64)
            for i0 in range(0, n, _RB):
                xb = x[i0 : i0 + _RB]
                rb = len(xb)
                acc = np.empty((rb, k))
                a = np.zeros((rb, min(_KB, k)))
                t = np.empty_like(a)
                for k0 in range(0, k, _KB):
                    kb = min(_KB, k - k0)
                    av, tv = a[:, :kb], t[:, :kb]
                    av[:] = 0.0
                    cb = mat_b[k0 : k0 + kb]
                    for j in range(d):  # the expression fold, dim order
                        np.subtract(xb[:, j : j + 1], cb[None, :, j], out=tv)
                        np.multiply(tv, tv, out=tv)
                        np.add(av, tv, out=av)
                    acc[:, k0 : k0 + kb] = av
                best[i0 : i0 + rb] = np.argmin(
                    np.floor(acc * 1e9 + 0.5), axis=1
                )
            out = pdf.copy()
            out["_cell"] = cells_b[best].astype(np.int32)
            yield out

    return df.mapInPandas(assign, schema=schema)


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """Train ``iters`` Lloyd iterations and return the FINAL centroid
    list ``[(cell, vector), …]`` (the model, O(k·d) driver-side) —
    the shared trainer behind ``kmeans_fit_assign`` and consumers
    that need the centroids themselves (q225's silhouette distances).
    Centroid recomputation is exact-integer-micros means
    (order-independent); each round's driver traffic is O(k·d)."""
    from mindseye_dataframes_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(df, id_col, vec_col, k)
    for _ in range(iters - 1):
        assigned = _assign(df, vec_col, cents)
        x6 = assigned.select(
            "_cell",
            F.posexplode(vec_col).alias("dim", "xf"),
        ).select(
            "_cell",
            "dim",
            F.round(F.col("xf").cast("double") * 1_000_000).cast("long").alias("x6"),
        )
        means = (
            x6.groupBy("_cell", "dim")
            .agg(
                F.sum("x6").cast("double").alias("s"),
                F.count(F.lit(1)).cast("double").alias("n"),
            )
            .select(
                "_cell", "dim", (F.col("s") / F.col("n") / 1e6).alias("mu")
            )
            .collect()  # O(k·d) — parameters, never row data
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["dim"]] = r["mu"]
        cents = sorted(
            (cell, [dims[i] for i in sorted(dims)]) for cell, dims in by_cell.items()
        )
    return cents


def kmeans_fit_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment
    ``(id_col, *keep, _cell)``. ``keep`` carries extra columns (e.g.
    the vector itself for a within-cluster pass) through the final
    narrow map — cheaper than re-joining the assignment back to the
    source at scale."""
    cents = kmeans_centroids(df, id_col, vec_col, k, iters)
    return _assign(df, vec_col, cents).select(id_col, *keep, "_cell")


def semdedup_dropped(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str = "_cell",
    tau: float = 0.4,
) -> DataFrame:
    """Rows dropped by SemDeDup's greedy keep-lowest-id rule: within
    each cluster, a row is dropped when a lower-id member is ≥ τ
    cosine-similar. One ``applyInPandas`` per cell — the per-cluster
    pairwise similarity is ONE numpy matmul (normalized rows → upper
    triangle), which measured ~12× faster than the interpreted
    zip_with/aggregate expression pair join at sf0.1 (the minhash
    lesson: vectorized Arrow batch beats per-element HOF trees).

    Exactness vs the fold-based oracle: numpy's pairwise-summed dot
    and the engines' sequential fold differ at ~1e-15 relative —
    five orders below the round(·, 9) grid the τ comparison uses, so
    the rounded values agree (same 1-ulp argument as
    functions/vectors.py).

    Scale: the only movement is ONE hash-shuffle of (id, vec) by
    cell; per-cell work is the |c|² matmul that IS SemDeDup's
    published cost model (k grows with the corpus to bound |c|).

    Output: ``(cell_col, id_col)`` of the dropped rows, keeping the
    caller's column names and types (a doc-level caller gets its
    ``doc_id`` back, and a hashed 64-bit cell key survives intact)."""
    import pandas as pd  # local: Arrow path only

    dtypes = dict(assigned.dtypes)
    out_schema = (
        f"{cell_col} {dtypes[cell_col]}, {id_col} {dtypes[id_col]}"
    )

    def drop_in_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort")
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n = np.linalg.norm(x, axis=1)
        n[n == 0.0] = 1.0
        sims = np.round((x / n[:, None]) @ (x / n[:, None]).T, 9)
        mask = np.triu(sims >= tau, k=1).any(axis=0)
        return pd.DataFrame(
            {
                cell_col: pdf[cell_col].to_numpy()[mask],
                id_col: pdf[id_col].to_numpy()[mask],
            }
        )

    return assigned.groupBy(cell_col).applyInPandas(
        drop_in_cell, schema=out_schema
    )


def semdedup_tau_curve(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str = "_cell",
    taus: tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7),
) -> DataFrame:
    """The SemDeDup THRESHOLD KNOB, measured in one pass: for every
    candidate τ, how many within-cluster pairs are ≥ τ similar and how
    many rows the greedy keep-lowest rule would drop. Curation teams
    pick τ from exactly this curve (Abbas et al. 2023 §4 sweep τ for
    the dedup-fraction/quality tradeoff); computing it naively means
    re-running the in-cluster pass per τ — here the per-cell pairwise
    similarity matrix (the expensive part) is computed ONCE and every
    τ is evaluated against it inside the same Arrow batch.

    Same exactness contract as ``semdedup_dropped`` (round(·,9) sims,
    1-ulp argument vs the fold-based oracle); same scale shape — ONE
    hash exchange of (id, vec) by cell, Σ|cluster|² matmul work, and
    an O(k·|taus|)-row aggregate after.

    Output: ``(tau double, n_pairs bigint, n_dropped bigint)``, one
    row per τ, globally aggregated."""
    import pandas as pd  # local: Arrow path only

    from pyspark.sql import functions as F

    tau_list = [float(t) for t in taus]

    def curve_in_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(id_col, kind="mergesort")
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        n = np.linalg.norm(x, axis=1)
        n[n == 0.0] = 1.0
        sims = np.round((x / n[:, None]) @ (x / n[:, None]).T, 9)
        upper = np.triu(np.ones(sims.shape, dtype=bool), k=1)
        rows = []
        for t in tau_list:
            hit = upper & (sims >= t)
            rows.append((t, int(hit.sum()), int(hit.any(axis=0).sum())))
        return pd.DataFrame(rows, columns=["tau", "n_pairs", "n_dropped"])

    per_cell = assigned.groupBy(cell_col).applyInPandas(
        curve_in_cell, schema="tau double, n_pairs long, n_dropped long"
    )
    return (
        per_cell.groupBy("tau")
        .agg(
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("n_dropped").alias("n_dropped"),
        )
        .orderBy("tau")
    )
