"""Custom Python DataSource (sources/synth_source.py) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.sources.synth_source import (
    SYNTH_SCHEMA,
    register_synth_source,
)


def _agg(spark, n_rows, n_parts):
    register_synth_source(spark)
    df = (
        spark.read.format("msdf_synth")
        .option("n_rows", n_rows)
        .option("n_parts", n_parts)
        .load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount_cents").alias("s"),
        F.sum("user_id").alias("u"),
        F.max("row_id").alias("m"),
    ).collect()[0]


def test_partition_count_invariance(spark):
    """Fields are functions of row_id only: re-splitting the source
    (1 vs 16 partitions) must leave every aggregate identical —
    the property that makes the source safe to re-plan at scale."""
    a = _agg(spark, 5_000, 1)
    b = _agg(spark, 5_000, 16)
    assert a == b


def test_scan_parallelism_matches_n_parts(spark):
    register_synth_source(spark)
    df = (
        spark.read.format("msdf_synth")
        .option("n_rows", 1_000)
        .option("n_parts", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1_000


def test_schema_is_declared(spark):
    register_synth_source(spark)
    df = spark.read.format("msdf_synth").option("n_rows", 10).load()
    assert df.schema.simpleString() == (
        "struct<row_id:bigint,user_id:bigint,item_id:bigint,"
        "amount_cents:bigint,day:int>"
    )
    assert SYNTH_SCHEMA.split(",")[0].strip() == "row_id long"


def test_stream_offsets_clamp_and_cover():
    """latestOffset advances by rows_per_batch and clamps at n_rows;
    the per-batch partitions tile each offset range exactly — union of
    all batches covers [0, n) once (the exactly-once contract the q230
    oracle hash-pins end-to-end)."""
    from mindseye_dataframes_spark.sources.synth_source import (
        SynthStreamReader,
    )

    r = SynthStreamReader(
        {"n_rows": "10000", "rows_per_batch": "3000", "n_parts": "4"}
    )
    offsets = [r.initialOffset()["index"]]
    while offsets[-1] < 10000:
        offsets.append(r.latestOffset()["index"])
    assert offsets == [0, 3000, 6000, 9000, 10000]
    seen = []
    for lo, hi in zip(offsets, offsets[1:]):
        parts = r.partitions({"index": lo}, {"index": hi})
        for p in parts:
            seen.extend(range(p.lo, p.hi))
    assert seen == list(range(10000))


def test_stream_read_replays_batch_fields():
    """read() over any offset range regenerates the same rows the
    batch reader produces — source-side recovery is a pure replay."""
    from mindseye_dataframes_spark.sources.synth_source import (
        SynthStreamReader,
        _fields,
        _RangePartition,
    )

    r = SynthStreamReader({"n_rows": "100"})
    rows = list(r.read(_RangePartition(40, 60)))
    assert rows == [_fields(i) for i in range(40, 60)]

def test_stream_restart_resumes_from_replayed_offset():
    """Crash-recovery discipline (ADVICE r9): a restarted query's
    FIRST call into a fresh reader instance is the replay
    partitions(committed, logged_end); the high-water mark that call
    seeds must clamp the next latestOffset() so it resumes AT the
    replayed end — never behind the checkpoint, never skipping rows,
    never re-emitting committed ranges in a later batch."""
    from mindseye_dataframes_spark.sources.synth_source import (
        SynthStreamReader,
    )

    opts = {"n_rows": "10000", "rows_per_batch": "3000", "n_parts": "4"}

    # pre-crash session: batches [0,3000) and [3000,6000) committed,
    # batch [6000,9000) written to the offset log but NOT committed
    r1 = SynthStreamReader(opts)
    assert r1.initialOffset() == {"index": 0}
    assert r1.latestOffset() == {"index": 3000}
    r1.partitions({"index": 0}, {"index": 3000})
    r1.commit({"index": 3000})
    assert r1.latestOffset() == {"index": 6000}
    r1.partitions({"index": 3000}, {"index": 6000})
    r1.commit({"index": 6000})
    assert r1.latestOffset() == {"index": 9000}
    # crash here: end offset 9000 logged, never committed

    # restart: fresh instance; Spark replays the pending batch first
    r2 = SynthStreamReader(opts)
    parts = r2.partitions({"index": 6000}, {"index": 9000})
    replayed = [i for p in parts for i in range(p.lo, p.hi)]
    assert replayed == list(range(6000, 9000))  # bit-identical replay
    r2.commit({"index": 9000})
    # next planned offset continues PAST the checkpoint, no regression
    assert r2.latestOffset() == {"index": 10000}
    parts = r2.partitions({"index": 9000}, {"index": 10000})
    tail = [i for p in parts for i in range(p.lo, p.hi)]
    assert tail == list(range(9000, 10000))
    # drained: latest stays clamped, no phantom batches
    assert r2.latestOffset() == {"index": 10000}


def test_stream_commit_alone_seeds_high_water():
    """commit(end) also advances the high-water mark (the replay may
    be planned but the runner can call commit first on an
    empty-replay path); latestOffset must respect it."""
    from mindseye_dataframes_spark.sources.synth_source import (
        SynthStreamReader,
    )

    r = SynthStreamReader({"n_rows": "10000", "rows_per_batch": "3000"})
    r.commit({"index": 6000})
    assert r.latestOffset() == {"index": 9000}
