"""Full-registry oracle-parity sweep at an arbitrary scale factor —
the scale-hardening companion to tests/test_oracle_parity.py (which
runs at the suite's sf0.001 default) and the driver's sf0.01 gate.

The bug class this hunts is scale-DEPENDENT arithmetic: BIGINT/2^53
overflow ceilings, rank ties that only materialize with more data,
and approximation-quality gates whose estimators degrade with corpus
size. Round 6's sweep at sf0.1 caught exactly one: the PQ recall
gate (q162) — code distance alone fell from 0.62 to 0.42 avg
recall@10 when the corpus grew 4×, which motivated the ADC+re-rank
path (operators/pq.py:pq_topk_rerank). Round 6's sf1 probe of q101
caught regr_slope accumulation-order drift (fixed b04fb97).

Every run writes an AUDITABLE JSON log (--log, default
docs/probes/sweep_<sfname>_<lo>_<hi>.json) recording the
sf dir, the chunk bounds, the EXACT skip set and which queries it
suppressed, per-query status + wall seconds, and the final fail
list — so "all pass at sfX" is checkable after the fact, including
what was NOT checked (VERDICT r6 watch item).

Usage (run FROM THE REPO ROOT, or export PYTHONPATH=<repo> — Python
workers resolve module imports through PYTHONPATH/cwd, not the
driver's sys.path, so a /tmp-launched sweep fails with
ModuleNotFoundError inside pandas UDFs):

    python tools/parity_sweep.py /root/testdata/sf0.1 0 40
    python tools/parity_sweep.py /root/testdata/sf0.1 40 80
    python tools/parity_sweep.py /root/testdata/sf1 --only q101,q165,q168
    ...

Chunked by [lo, hi) registry index so each invocation stays inside a
CI step timeout; prints one line per query and a final FAILS list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("lo", nargs="?", type=int, default=0)
    ap.add_argument("hi", nargs="?", type=int, default=10**9)
    ap.add_argument(
        "skip_pos",
        nargs="?",
        default="",
        help="legacy positional skip list (comma-separated name prefixes)",
    )
    ap.add_argument(
        "--skip",
        default="",
        help="comma-separated name prefixes to skip (oracle-cost-bound "
        "at big SF: recursive closures, quadratic verifies, multi-M-row "
        "result materialization in the COMPARISON harness — not engine "
        "paths). Recorded verbatim in the log.",
    )
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated name prefixes: run ONLY matching queries "
        "(targeted family sweeps, e.g. the exact-BIGINT ceiling set)",
    )
    ap.add_argument(
        "--log",
        default="",
        help="JSON log path (default docs/probes/"
        "sweep_<sfname>_<lo>_<hi>.json under the repo root)",
    )
    args = ap.parse_args()

    skip = tuple(
        s for s in (args.skip or args.skip_pos).split(",") if s
    )
    only = tuple(s for s in args.only.split(",") if s)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.driver.memory", "64g")
        .config("spark.sql.shuffle.partitions", "24")
        # q120's sf1 digest aggregate (6.5e8 rows) can stall the
        # single local-mode JVM in long GC pauses; stock tolerances
        # (10s heartbeats, 120s network timeout) declare the executor
        # dead mid-aggregate and poison the rest of the chunk — give
        # the heavy chunks the same survival margin the r11
        # bounded-pair probe had, plus heap headroom over its 48g
        .config("spark.network.timeout", "800s")
        .config("spark.executor.heartbeatInterval", "30s")
        .appName("parity-sweep")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from mindseye_dataframes_spark.queries import load_all
    from tests.helpers import assert_matches_oracle

    qs, osql = e.queries(), e.oracle_sql()
    # opt-in bounded-aggregate comparison for results too large to
    # collect at big SF (q120's ~6.5e8 sf1 pairs killed the r8/r12
    # collect AND poisoned the session for the queries after it);
    # below each spec's row threshold the exact compare runs unchanged
    bounded = {n: q.bounded_compare for n, q in load_all().items()}
    names = sorted(qs)[args.lo : args.hi]
    if only:
        names = [n for n in names if any(n.startswith(o) for o in only)]

    fails, skipped, results = [], [], {}
    t_start = time.time()
    for name in names:
        if any(name.startswith(s) for s in skip):
            print(f"{name} skipped", flush=True)
            skipped.append(name)
            results[name] = {"status": "skipped", "sec": 0.0}
            continue
        t0 = time.time()
        try:
            if name in osql:
                mode = assert_matches_oracle(
                    qs[name](spark, args.sf_dir), osql[name], args.sf_dir,
                    name=name, bounded=bounded.get(name),
                )
                # "ok-bounded" marks rows verified by engine-side
                # aggregate checksums (result too large to collect) so
                # the artifact records which evidence form each green
                # row carries
                status = "ok" if mode == "exact" else f"ok-{mode}"
            else:
                assert qs[name](spark, args.sf_dir).count() >= 0
                status = "rows-only-ok"
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            status = f"FAIL {repr(ex)[:300]}"
            fails.append(name)
        sec = round(time.time() - t0, 1)
        results[name] = {"status": status, "sec": sec}
        print(f"{name} {status} {sec}s", flush=True)

    log_path = args.log
    if not log_path:
        sfname = os.path.basename(args.sf_dir.rstrip("/"))
        hi_tag = "end" if args.hi >= 10**9 else str(args.hi)
        only_tag = ("_only-" + "-".join(only)) if only else ""
        log_path = os.path.join(
            repo,
            "docs",
            "probes",
            f"sweep_{sfname}_{args.lo}_{hi_tag}{only_tag}.json",
        )
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    with open(log_path, "w") as fh:
        json.dump(
            {
                "sf_dir": args.sf_dir,
                "chunk": [args.lo, args.hi],
                "only": list(only),
                "skip_prefixes": list(skip),
                "skipped_queries": skipped,
                "n_run": len(names) - len(skipped),
                "n_fail": len(fails),
                "fails": fails,
                "total_sec": round(time.time() - t_start, 1),
                "results": results,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print("LOG", log_path, flush=True)
    print("CHUNK", args.lo, args.hi, "FAILS", fails, flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
