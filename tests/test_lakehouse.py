"""Lakehouse-maintenance loop (VERDICT r4 item 8): the streaming
upsert sink fragments its snapshot over many micro-batches; nightly
compaction rewrites the fragments; the swapped-in table is
row-identical and file-lean. This chains streaming/sinks.py →
operators/compaction.py end-to-end the way a real deployment runs
them."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mindseye_dataframes_spark.sources.readers import load_table


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f).startswith("part-")
    ]


def test_streaming_sink_then_compaction_round_trip(spark, tmp_path_factory):
    from mindseye_dataframes_spark.operators.compaction import (
        compact,
        compaction_plan,
        file_row_stats,
    )
    from mindseye_dataframes_spark.streaming.sinks import upsert_stream

    src = str(tmp_path_factory.mktemp("lh_src"))
    target = str(tmp_path_factory.mktemp("lh_out")) + "/snapshot"
    ckpt = str(tmp_path_factory.mktemp("lh_ckpt"))

    # many small input files -> many micro-batches -> fragmented snapshot
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(2000)
    events.repartition(8).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    # at test scale AQE coalesces the sink's rewrite to one file;
    # disable coalescing during the drain so the snapshot lands in
    # full-shuffle-width fragments — the small-files regime a real
    # high-volume deployment hits even with AQE on
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        q = upsert_stream(
            stream,
            target,
            keys=["user_id", "event_type"],
            order_cols=["ts", "event_id"],
            checkpoint_dir=ckpt,
        ).start()
        q.awaitTermination(180)
    finally:
        spark.conf.set(coalesce_key, prev)

    snapshot_rows = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    n_files_before = len(_parquet_files(target))
    assert snapshot_rows and n_files_before > 1, (
        f"expected a fragmented snapshot, got {n_files_before} files"
    )

    # plan: every snapshot fragment is small, so all get merge groups
    stats = file_row_stats(spark, target)
    n_rows_total = spark.read.parquet(target).count()
    plan = compaction_plan(stats, target_rows=n_rows_total + 1)
    assert plan.filter(F.col("merge_group").isNull()).count() == 0

    # execute + swap, the same temp-then-rename commit the sink uses
    out = target + ".compacted"
    compact(spark, target, out, target_rows=n_rows_total + 1)
    os.rename(target, target + "_precompact")
    os.rename(out, target)

    compacted_rows = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    assert compacted_rows == snapshot_rows  # row-identical table
    n_files_after = len(_parquet_files(target))
    assert n_files_after < n_files_before
    assert n_files_after == 1  # everything fit one merge group

    # the sink keeps working against the compacted snapshot: stream one
    # more file through the same checkpoint and verify upsert semantics
    extra = events.limit(50).withColumn("value", F.col("value") + 1000.0)
    extra.coalesce(1).write.mode("append").parquet(src)
    q = upsert_stream(
        stream,
        target,
        keys=["user_id", "event_type"],
        order_cols=["ts", "event_id"],
        checkpoint_dir=ckpt,
    ).start()
    q.awaitTermination(180)
    final = spark.read.parquet(target)
    # extra reuses keys already in the snapshot, so the latest-per-key
    # row count is unchanged — upserts replaced, never appended
    assert final.count() == len(snapshot_rows)
    key_counts = (
        final.groupBy("user_id", "event_type").count().filter("count > 1").count()
    )
    assert key_counts == 0


def test_concurrent_live_writers_are_fenced(spark, tmp_path_factory):
    """VERDICT r5 item 8: two LIVE writers racing the commit (the
    split-brain case crash-recovery can't see) must serialize through
    the lock, and staleness must be governed by the ORDER-AWARE merge
    (not batch ids — an id-based skip would drop real data whenever a
    fresh checkpoint restarts numbering): the final snapshot equals
    one sequential application of the batch sequence, with no torn
    renames, lost snapshots, or stale leftovers."""
    import threading

    from mindseye_dataframes_spark.streaming.sinks import (
        _committed_epoch,
        batch_upserter,
    )

    target = str(tmp_path_factory.mktemp("fence") / "snap")
    apply_batch = batch_upserter(target, ["k"], ["v", "k"])

    # batch i updates shared keys 0-3 to version i and adds key 10+i
    def batch(i):
        rows = [(k, i) for k in range(4)] + [(10 + i, i)]
        return spark.createDataFrame(rows, "k int, v int")

    n_batches, errs = 6, []

    def writer():
        # both writers replay the SAME ascending sequence — the
        # duplicate-driver scenario; commits serialize under the lock
        # and re-applied batches merge idempotently to the same state
        try:
            for i in range(n_batches):
                apply_batch(batch(i), i)
        except Exception as exc:  # surfaced after join
            errs.append(exc)

    threads = [threading.Thread(target=writer) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    snap = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    want = {k: n_batches - 1 for k in range(4)}
    want.update({10 + i: i for i in range(n_batches)})
    assert snap == want
    assert 0 <= _committed_epoch(target) <= n_batches - 1  # metadata present
    # no stranded temp/old dirs survive the race
    parent = os.path.dirname(target)
    leftovers = [
        d for d in os.listdir(parent) if ".tmp-" in d or ".old-" in d
    ]
    assert leftovers == []

    # a zombie writer replaying an OLD batch carrying stale-ordered
    # rows cannot roll newer state back (the merge is the authority)...
    zombie = spark.createDataFrame([(0, 1), (99, 0)], "k int, v int")
    apply_batch(zombie, 2)
    snap2 = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert snap2[0] == n_batches - 1  # newer version kept
    assert snap2[99] == 0  # genuinely new key is NOT lost to an id fence

    # ...and a fresh pipeline whose checkpoint restarts at batch 0
    # with NEWER data must not be dropped by any id comparison
    fresh = spark.createDataFrame([(0, 100)], "k int, v int")
    apply_batch(fresh, 0)
    snap3 = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert snap3[0] == 100
