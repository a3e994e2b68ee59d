"""Distributed PCA over an embedding column (north-star §2B ★).

The covariance path is the same partial-moments architecture as the
featurization statistics (featurize/modeler.py): every partition
reduces its Arrow batches to (n, Σx, ΣxxT) — O(d²) floats per
partition, independent of row count — the driver sums the partials
(O(partitions · d²), bounded metadata, never row data), solves the
d×d eigenproblem with numpy, and the resulting components broadcast
back into a vectorized projection UDF. At 100 TB the only full-data
passes are the one moments scan and the one projection map; nothing
row-shaped ever reaches the driver.

Eigenvector sign is normalized (largest-|component| entry positive)
so projections are reproducible run to run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_components(
    df: DataFrame, vec_col: str, k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit: returns (mean[d], components[k, d], explained_variance[k]).

    One mapInPandas pass reduces each partition to exact-shape partial
    moments; partials are summed on the driver in partition order
    (deterministic for a fixed partitioning)."""

    def partials(batches):
        import pandas as pd

        n, s, m = 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            mm = x.T @ x
            m = mm if m is None else m + mm
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "m": [m.ravel().tolist()]}
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, m array<double>")
        .collect()  # O(partitions) rows of O(d^2) floats — metadata, not data
    )
    if not parts:
        raise ValueError("pca_components: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    m = np.sum([np.asarray(p["m"]) for p in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = m.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|x| entry of each component positive
    for row in comps:
        pivot = np.argmax(np.abs(row))
        if row[pivot] < 0:
            row *= -1.0
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, k: int = 2
) -> DataFrame:
    """Project every vector onto the top-k principal components:
    (id_col, pc array<double> of length k). The fit statistics ride
    into the projection UDF as plain broadcast literals (O(k·d))."""
    mean, comps, _ = pca_components(df, vec_col, k)
    mean_l, comps_l = mean.tolist(), comps.tolist()

    @F.pandas_udf("array<double>")
    def project(vecs):
        import pandas as pd

        mu = np.asarray(mean_l)
        w = np.asarray(comps_l)  # (k, d)
        x = np.stack(vecs.to_numpy()).astype(np.float64) - mu
        out = x @ w.T  # (n, k)
        return pd.Series(list(out))

    return df.select(F.col(id_col), project(F.col(vec_col)).alias("pc"))
