"""Plan-shape utilities.

``ensure_min_parallelism``: small single-file inputs scan as one
partition, so compute-heavy per-row work (hashing, vector math) runs
on one core. When — and only when — the input's parallelism is below
the cluster's, repartition before the heavy stage. On real multi-TB
inputs the scan already has thousands of splits and this is a no-op,
so no shuffle is added at scale.

All backend probes route through ``compat`` (VERDICT r9 item 5):
under Spark Connect there is no RDD view to count scan partitions,
so ``scan_partitions`` reports "wide enough" and the widening becomes
a no-op — the correct degradation, since the probe exists for the
single-machine small-file corner that a Connect cluster deployment
doesn't hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mindseye_dataframes_spark.compat import (
    scan_partition_count,
    session_key,
)

# (session key, analyzed-plan semanticHash) -> scan partition count.
# Converting a plan to an RDD to ask its partition count costs ~140ms
# of physical planning per call (measured, local single file), while
# semanticHash on the analyzed plan is ~2ms — so the probe is paid
# once per distinct plan per session, not once per query construction.
_PARTS_CACHE: dict[tuple[str, int], int] = {}


def default_parallelism(spark) -> int:
    """The cluster's task-slot count, Connect-safe: classic sessions
    read ``sparkContext.defaultParallelism``; Spark Connect exposes no
    SparkContext, so fall back to the shuffle-partition conf (the
    knob deployments size to the cluster anyway)."""
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except Exception:
            # non-numeric conf values (e.g. "auto") raise from int();
            # a restricted Connect session can raise from conf.get
            # itself (ADVICE r11) — degrade to the Spark default either
            # way rather than escaping from a parallelism HINT
            return 200


def scan_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical scan, memoized per
    semantically-equal analyzed plan."""
    wide_enough = default_parallelism(df.sparkSession)
    try:
        # public API (3.1+, Connect since 3.5) — no JVM plan handle
        key = (session_key(df.sparkSession), df.semanticHash())
    except Exception:
        # no usable plan hash — one probe, which itself degrades to
        # the "wide enough" default on Connect
        return scan_partition_count(df, wide_enough)
    n = _PARTS_CACHE.get(key)
    if n is None:
        n = scan_partition_count(df, wide_enough)
        _PARTS_CACHE[key] = n
    return n


def ensure_min_parallelism(df: DataFrame, *repartition_cols: str) -> DataFrame:
    target = default_parallelism(df.sparkSession)
    if scan_partitions(df) >= target:
        return df
    if repartition_cols:
        return df.repartition(target, *repartition_cols)
    return df.repartition(target)


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit REPARTITION_BY_NUM before a compute-heavy narrow stage
    whose input is byte-small. AQE's size-based coalescing shrinks any
    small shuffle output toward one partition — correct for byte-bound
    work, pathological when each row then does O(hundreds) of array/
    hash work (the q213 cold-path lesson: a few-MB candidate-pair
    relation can serialize the verify join onto one core). A
    user-numbered repartition is exempt from AQE coalescing, so the
    downstream stage keeps cluster-wide parallelism; the extra shuffle
    moves only the small relation itself."""
    n = default_parallelism(df.sparkSession)
    return df.repartition(n, *cols) if cols else df.repartition(n)
