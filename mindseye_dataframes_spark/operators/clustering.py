"""Distributed K-means (Lloyd's) over an embedding column — iterative
ML on the DataFrame API, engine-exact by construction.

Determinism/exactness choices (so a SQL oracle can replay EVERY
iteration bit-for-bit):
- init: one representative per ``vec_id % k`` cell (min id) — the
  same data-derived, RNG-free coarse quantizer as IVF
  (operators/similarity.py:ivf_centroids);
- assignment: squared-L2 as a left fold in doubles (the q90-proven
  identical-fold pairing), rounded to 9 digits with a cell-id
  tiebreak so argmin is total;
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


def _l2_ranked(vec_col, centroid: list[float], digits: int = 9):
    """round(Σ (x_i − c_i)², 9) — identical left fold on both engines."""
    c_lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(
                vec_col,
                c_lit,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        digits,
    )


def _assign(df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid cell per row: argmin over k literal distances
    (rounded, cell tiebreak) — a pure expression, no join, no shuffle."""
    scored = F.array(
        *[
            F.struct(
                _l2_ranked(F.col(vec_col), cvec).alias("d"),
                F.lit(cell).alias("cell"),
            )
            for cell, cvec in cents
        ]
    )
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["d"] < b["d"], F.lit(-1))
        .when(a["d"] > b["d"], F.lit(1))
        .otherwise(a["cell"] - b["cell"]),
    )[0]["cell"]
    return df.withColumn("_cell", best)


def kmeans_fit_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment
    ``(id_col, *keep, _cell)``. Centroid recomputation is exact-integer-
    micros means (order-independent); each round's driver traffic is
    O(k·d). ``keep`` carries extra columns (e.g. the vector itself for
    a within-cluster pass) through the final narrow map — cheaper than
    re-joining the assignment back to the source at scale."""
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
    return _assign(df, vec_col, cents).select(id_col, *keep, "_cell")
