"""Grouped-map UDAF surface: ``applyInPandas`` over ``groupBy``.

The engine's extension point for per-group logic that built-in
aggregates can't express (SURVEY §2A UDF/UDAF row: the reference's
extension points are strategy subclassing; the Spark-native
equivalent is grouped-map pandas). Arrow moves each group as a
columnar batch, the kernel is vectorized numpy, and the shuffle is
the same single hash exchange a built-in aggregate pays.

``grouped_ols`` fits y = a·x + b per group — the reference example.
Prefer the built-in ``F.regr_slope``/``F.regr_intercept`` (JVM,
whole-stage codegen — see q101) when plain OLS is all that's needed;
this operator exists for kernels with no built-in twin, and the test
suite pins its output to the built-in on the same data.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def grouped_ols(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """Per-``key`` least-squares fit of ``y`` on ``x`` via grouped-map
    pandas. Returns one row per key: slope, intercept, n."""
    schema = f"{key} long, slope double, intercept double, n long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        xs = pdf[x].to_numpy(dtype="float64")
        ys = pdf[y].to_numpy(dtype="float64")
        n = len(xs)
        if n < 2 or np.all(xs == xs[0]):
            slope, intercept = float("nan"), float("nan")
        else:
            xm, ym = xs.mean(), ys.mean()
            slope = float(((xs - xm) * (ys - ym)).sum() / ((xs - xm) ** 2).sum())
            intercept = float(ym - slope * xm)
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "slope": [slope], "intercept": [intercept], "n": [n]}
        )

    return df.groupBy(key).applyInPandas(fit, schema=schema)
