"""Operator-dominant timing for the streaming/maintenance harness
queries (VERDICT r9 item 4).

q228 (streaming LEFT OUTER drain) and q218 (ANN checkpoint fold)
previously had only whole-query probe rows, which re-stage their
source drop / ingest log inside the timed region on EVERY run — so
the recorded numbers were majority-harness and useless as regression
trackers for the operators themselves. This probe stages ONCE per
session, then times the drain/fold alone, min-of-N:

- q228: ``oj_stage`` once → N × ``oj_drain`` (each drain is a fresh
  bounded stream with its own checkpoint/memory table over the same
  staged drop — the multi-trigger join + eviction IS the timed work).
- q218: ``ann_ckpt_stage_log`` once → N × ``ann_ckpt_fold`` with a
  per-run salt, so every run performs a REAL fold + publish (not the
  warm no-op re-publish a same-fingerprint re-run would measure).

Each timed result is also sanity-checked (rollup rows / probe rows
non-empty) so a probe can't go green on a short-circuited run.

Statistical protocol (VERDICT r10 item 3 — the r10 sf1 numbers spanned
a ±2× band, useless as a regression tracker): one UNTIMED warm-up run
per family first (the r10 spread's worst outliers were cold JVM/
codegen/state-store initialization on run 1), then median-of-N
(default 5) with the full run list and the max/min spread ratio
recorded; a jvm System.gc() between runs drains collector debt so one
run's garbage doesn't bill the next. Trigger count is already pinned
by the staged layout (32 aged files + 1 sentinel at
maxFilesPerTrigger=8 → 5 triggers, every run).

Usage:  python tools/stream_drain_probe.py [sf_dir] [n_runs]
Writes docs/probes/stream_drain_<sfname>.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time


def _jvm_gc(spark) -> None:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[24]")
        .appName("stream-drain-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mindseye_dataframes_spark.queries.similarity import (
        ann_ckpt_fold,
        ann_ckpt_stage_log,
    )
    from mindseye_dataframes_spark.queries.timeseries import oj_drain, oj_stage
    from mindseye_dataframes_spark.sources.staging import staging_dir

    out = {"sf_dir": sf_dir, "n_runs": n_runs, "results": {}}

    # --- q228: stage once, drain N times -------------------------------
    src = staging_dir(spark, "msdf_probe_oj_")
    try:
        t0 = time.monotonic()
        oj_stage(spark, sf_dir, src)
        t_stage = round(time.monotonic() - t0, 2)
        assert oj_drain(spark, src).count() > 0  # warm-up, untimed
        runs = []
        for _ in range(n_runs):
            _jvm_gc(spark)
            t0 = time.monotonic()
            snap = oj_drain(spark, src)
            assert snap.count() > 0
            runs.append(round(time.monotonic() - t0, 2))
        out["results"]["q228_drain"] = {
            "stage_once": t_stage,
            "drain_median": round(statistics.median(runs), 2),
            "drain_min": min(runs),
            "spread_max_over_min": round(max(runs) / min(runs), 2),
            "runs": runs,
        }
        print("q228", out["results"]["q228_drain"], flush=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)

    # --- q218: stage the log once, fold N times (fresh fp per run) -----
    root = staging_dir(spark, "msdf_probe_annckpt_")
    post_log = f"{root}/postings"
    try:
        t0 = time.monotonic()
        ann_ckpt_stage_log(spark, sf_dir, post_log)
        t_stage = round(time.monotonic() - t0, 2)
        # warm-up, untimed (distinct salt so it performs a real fold)
        assert ann_ckpt_fold(spark, sf_dir, post_log, salt=":warm").count() > 0
        runs = []
        for i in range(n_runs):
            _jvm_gc(spark)
            t0 = time.monotonic()
            probe = ann_ckpt_fold(spark, sf_dir, post_log, salt=f":probe{i}")
            assert probe.count() > 0
            runs.append(round(time.monotonic() - t0, 2))
        out["results"]["q218_fold"] = {
            "stage_once": t_stage,
            "fold_median": round(statistics.median(runs), 2),
            "fold_min": min(runs),
            "spread_max_over_min": round(max(runs) / min(runs), 2),
            "runs": runs,
        }
        print("q218", out["results"]["q218_fold"], flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    sfname = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(repo, "docs", "probes", f"stream_drain_{sfname}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("WROTE", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
