"""Full-registry oracle-parity sweep at an arbitrary scale factor —
the scale-hardening companion to tests/test_oracle_parity.py (which
runs at the suite's sf0.001 default) and the driver's sf0.01 gate.

The bug class this hunts is scale-DEPENDENT arithmetic: BIGINT/2^53
overflow ceilings, rank ties that only materialize with more data,
and approximation-quality gates whose estimators degrade with corpus
size. Round 6's sweep at sf0.1 caught exactly one: the PQ recall
gate (q162) — code distance alone fell from 0.62 to 0.42 avg
recall@10 when the corpus grew 4×, which motivated the ADC+re-rank
path (operators/pq.py:pq_topk_rerank).

Usage (run FROM THE REPO ROOT, or export PYTHONPATH=<repo> — Python
workers resolve module imports through PYTHONPATH/cwd, not the
driver's sys.path, so a /tmp-launched sweep fails with
ModuleNotFoundError inside pandas UDFs):

    python tools/parity_sweep.py /root/testdata/sf0.1 0 40
    python tools/parity_sweep.py /root/testdata/sf0.1 40 80
    ...

Chunked by [lo, hi) registry index so each invocation stays inside a
CI step timeout; prints one line per query and a final FAILS list.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9
    # comma-separated name prefixes to skip (oracle-cost-bound at big
    # SF: recursive closures, quadratic verifies, multi-M-row result
    # materialization in the COMPARISON harness — not engine paths)
    skip = tuple(s for s in (sys.argv[4] if len(sys.argv) > 4 else "").split(",") if s)

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "24")
        .appName("parity-sweep")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.helpers import assert_matches_oracle

    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name in sorted(qs)[lo:hi]:
        if any(name.startswith(s) for s in skip):
            print(f"{name} skipped", flush=True)
            continue
        t0 = time.time()
        try:
            if name in osql:
                assert_matches_oracle(qs[name](spark, sf), osql[name], sf, name=name)
                status = "ok"
            else:
                assert qs[name](spark, sf).count() >= 0
                status = "rows-only-ok"
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            status = f"FAIL {repr(ex)[:300]}"
            fails.append(name)
        print(f"{name} {status} {round(time.time() - t0, 1)}s", flush=True)
    print("CHUNK", lo, hi, "FAILS", fails, flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
