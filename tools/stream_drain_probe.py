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
recorded; a jvm System.gc() plus an untimed 8 s settle between runs
(with the state-store maintenance interval shortened to 5 s) lets
finished queries' state providers unload before the next run starts —
without it the sf1 series CLIMBED 18→49 s run-over-run as provider
heap from completed drains billed their successors. Trigger count is
already pinned by the staged layout (32 aged files + 1 sentinel at
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


def _stats(runs):
    """Median + two spread measures: max/min (brittle — one co-tenant
    burst moves it) and the IQR ratio p75/p25 (robust for n=5; the
    regression-tracking band). Both recorded so the artifact shows
    whether an outlier or the distribution moved."""
    s = sorted(runs)
    n = len(s)
    p25 = s[max(0, int(round(0.25 * (n - 1))))]
    p75 = s[min(n - 1, int(round(0.75 * (n - 1))))]
    return {
        "median": round(statistics.median(s), 2),
        "min": min(s),
        "spread_max_over_min": round(max(s) / min(s), 2),
        "iqr_ratio_p75_over_p25": round(p75 / p25, 2),
        "runs": runs,
    }


def _jvm_gc(spark) -> None:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _drop_probe_views(spark, prefix: str) -> None:
    """Drop the memory-sink tables earlier drains registered: each
    bounded drain materializes its result into a session temp view,
    and letting those accumulate across runs biases later runs with
    mounting heap pressure."""
    try:
        for t in spark.catalog.listTables():
            if t.name.startswith(prefix):
                spark.catalog.dropTempView(t.name)
    except Exception:
        pass


def _warm_to_steady(run, *, max_warm: int = 6, tol: float = 0.10):
    """Run untimed warm-ups until two consecutive runs agree within
    ``tol`` (or ``max_warm`` runs) — a single warm-up is not enough
    for the stateful-join drain, whose generated code keeps getting
    C2-compiled across the first few full drains (the r11 sf0.1
    five-run series decayed 42 → 19 s monotonically after ONE
    warm-up). Returns the warm-up timings for the probe record.
    The divisor floors at 0.01 s so a drain fast enough to round to
    0.00 can't abort the probe with ZeroDivisionError (ADVICE r11)."""
    warm = []
    prev = None
    for _ in range(max_warm):
        t0 = time.monotonic()
        run()
        t = round(time.monotonic() - t0, 2)
        warm.append(t)
        if prev is not None and abs(t - prev) / max(prev, 0.01) < tol:
            break
        prev = t
    return warm


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
        # default 60s: with ~5 drains of 20-50s each, providers from
        # FINISHED queries outlive several timed runs and their heap
        # bills the successors (the r11 sf1 series CLIMBED 18→49 s
        # run-over-run); a short cycle unloads them between runs
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "5s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # untimed settle between runs: one maintenance cycle + GC, so each
    # timed run starts from the same unloaded-provider state
    settle_sec = 8.0

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
        def _one_drain():
            assert oj_drain(spark, src, timeout_sec=300).count() > 0
            _drop_probe_views(spark, "q228_oj_")

        warm = _warm_to_steady(_one_drain)
        runs = []
        for _ in range(n_runs):
            _jvm_gc(spark)
            time.sleep(settle_sec)
            t0 = time.monotonic()
            _one_drain()
            runs.append(round(time.monotonic() - t0, 2))
        st = _stats(runs)
        out["results"]["q228_drain"] = {
            "stage_once": t_stage,
            "warmup_runs": warm,
            "drain_median": st["median"],
            "drain_min": st["min"],
            "spread_max_over_min": st["spread_max_over_min"],
            "iqr_ratio_p75_over_p25": st["iqr_ratio_p75_over_p25"],
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
        # warm-up (distinct salt per run so each performs a real fold)
        salt_seq = iter(range(1000))

        def _one_fold():
            s = f":w{next(salt_seq)}"
            assert ann_ckpt_fold(spark, sf_dir, post_log, salt=s).count() > 0

        warm = _warm_to_steady(_one_fold)
        runs = []
        for i in range(n_runs):
            _jvm_gc(spark)
            time.sleep(settle_sec)
            t0 = time.monotonic()
            probe = ann_ckpt_fold(spark, sf_dir, post_log, salt=f":probe{i}")
            assert probe.count() > 0
            runs.append(round(time.monotonic() - t0, 2))
        st = _stats(runs)
        out["results"]["q218_fold"] = {
            "stage_once": t_stage,
            "warmup_runs": warm,
            "fold_median": st["median"],
            "fold_min": st["min"],
            "spread_max_over_min": st["spread_max_over_min"],
            "iqr_ratio_p75_over_p25": st["iqr_ratio_p75_over_p25"],
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
