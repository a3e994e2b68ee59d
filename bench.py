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

    # warm the JVM + parquet footer caches once, off the clock
    next(iter(bench_queries.values())).fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        start = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)

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
