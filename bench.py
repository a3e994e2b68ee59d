"""Headline benchmark: run the bench-tagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes through the ``noop`` sink so the full plan runs
(scan → shuffle → agg) without driver-collect or disk-write skew.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from mindseye_dataframes_spark.queries import load_all
    from mindseye_dataframes_spark.session import get_session

    spark = get_session(app_name="mindseye-dataframes-spark-bench", cpus=cpus)
    registry = load_all()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    # warm the JVM (codegen, shuffle services, Python workers) and
    # parquet footer caches with one untimed pass over every headline
    # query — the metric is steady-state execution, not first-JIT
    for q in bench_queries.values():
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # min of 2 timed runs per query: single runs at this scale are
    # dominated by GC/scheduling noise (observed 1.3s vs 7.5s for the
    # same plan); the minimum is the reproducible steady-state cost
    timings: dict[str, float] = {}
    for _ in range(2):
        # drop operator-internal caches so every timed run pays its
        # own materialization cost (no cross-run cache flattery)
        spark.catalog.clearCache()
        for name, q in bench_queries.items():
            start = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - start, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
