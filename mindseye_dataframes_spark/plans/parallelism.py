"""Plan-shape utilities.

``ensure_min_parallelism``: small single-file inputs scan as one
partition, so compute-heavy per-row work (hashing, vector math) runs
on one core. When — and only when — the input's parallelism is below
the cluster's, repartition before the heavy stage. On real multi-TB
inputs the scan already has thousands of splits and this is a no-op,
so no shuffle is added at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, *repartition_cols: str) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # metadata-only fast path: a scan over >= target files can't be
        # under-parallel, and answering from the file listing avoids
        # the plan->RDD conversion that df.rdd forces on every call
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass  # non-file source; fall through to the precise check
    if df.rdd.getNumPartitions() >= target:
        return df
    if repartition_cols:
        return df.repartition(target, *repartition_cols)
    return df.repartition(target)
