"""Custom PYTHON DATA SOURCE (pyspark.sql.datasource, Spark 4 API) —
the source-extensibility surface: when no built-in connector exists
for a system, a DataSource subclass turns it into a first-class,
PARTITIONED, schema-declared relation that Catalyst plans like any
other scan (column pruning still applies downstream; parallelism is
whatever ``partitions()`` returns, so the reader — not the driver —
decides the split granularity, exactly like an HDFS input format).

This instance is deliberately deterministic so the driver can VALUE-
CHECK the source end-to-end: every field is a pure function of
``row_id`` via md5 hex windows (the engine-portable hash triple —
Python ``hashlib.md5(str(i))`` == Spark ``md5(cast(i as string))``
== DuckDB ``md5(CAST(i AS VARCHAR))``), so a DuckDB
``generate_series`` replays the ENTIRE relation bit-for-bit and any
aggregate over it hash-matches. Fields depend only on row_id, never
on the partition, so results are independent of the partition count —
the property that makes a source safe to re-split at 100 TB.

Rows are emitted as pyarrow RecordBatches (the Arrow fast path of the
DataSource API), chunked so worker memory stays O(batch), not O(rows
per partition).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_SCHEMA = (
    "row_id long, user_id long, item_id long, amount_cents long, day int"
)

_ARROW_BATCH = 4096


def _fields(i: int) -> tuple[int, int, int, int, int]:
    """All columns from one md5 of the row id — hex windows match the
    oracle's substr() offsets (1-based SQL ↔ 0-based Python)."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    return (
        i,
        int(h[0:8], 16) % 1000,
        int(h[8:16], 16) % 5000,
        int(h[16:24], 16) % 100000,
        int(h[24:32], 16) % 365,
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = max(1, int(options.get("n_parts", 16)))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        import pyarrow as pa

        for lo in range(partition.lo, partition.hi, _ARROW_BATCH):
            hi = min(lo + _ARROW_BATCH, partition.hi)
            cols = list(zip(*(_fields(i) for i in range(lo, hi))))
            yield pa.record_batch(
                [
                    pa.array(cols[0], pa.int64()),
                    pa.array(cols[1], pa.int64()),
                    pa.array(cols[2], pa.int64()),
                    pa.array(cols[3], pa.int64()),
                    pa.array(cols[4], pa.int32()),
                ],
                names=["row_id", "user_id", "item_id", "amount_cents", "day"],
            )


class SynthDataSource(DataSource):
    """``spark.read.format("msdf_synth").option("n_rows", N)`` after
    ``spark.dataSource.register(SynthDataSource)``."""

    @classmethod
    def name(cls):
        return "msdf_synth"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema):
        return SynthReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SynthDataSource)


# --- streaming side -------------------------------------------------------
#
# The PARTITION-PLANNED stream reader (DataSourceStreamReader, not the
# driver-side Simple variant): the driver only tracks an integer row
# offset; each trigger's latestOffset() advances it by rows_per_batch,
# partitions(start, end) splits the offset range into n_parts range
# partitions, and the rows themselves are produced ON EXECUTORS — the
# shape that scales, since the driver never touches row data. Offsets
# are checkpointable dicts, so exactly-once replay (readBetweenOffsets
# semantics via the same pure row_id functions) is free: any offset
# range regenerates bit-identical rows.

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SynthStreamReader(DataSourceStreamReader):
    """Offset discipline (ADVICE r9): the Python stream-reader API
    never hands the reader the checkpointed offset directly — a
    restarted query only reveals it through ``partitions(start, end)``
    (batch replay) and ``commit(end)``. So the reader keeps a
    high-water mark fed by BOTH callbacks and clamps
    ``latestOffset()`` to it, which makes the crash-recovery path
    (restart with an uncommitted batch: Spark replays
    ``partitions(committed, logged_end)`` before asking for a new
    offset) exact — the replay seeds the high-water mark, so the next
    latest offset resumes from the checkpoint, never behind it.
    The one unreachable case: a restart from a FULLY-committed
    checkpoint calls ``latestOffset()`` first, with no callback having
    revealed the committed offset — no Python-API hook exists for
    that, so restarts of a finished/idle query should use a fresh
    checkpoint dir (rows are pure functions of row_id, so a fresh run
    is bit-identical anyway)."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 20_000))
        self.rows_per_batch = int(options.get("rows_per_batch", 5_000))
        self.n_parts = max(1, int(options.get("n_parts", 4)))
        self._latest = 0
        self._seen = 0  # high-water from partitions()/commit()

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # monotone per-trigger advance from the highest offset any
        # callback has revealed; clamps at n_rows so the query goes
        # idle (processAllAvailable returns) once drained
        self._latest = min(
            max(self._latest, self._seen) + self.rows_per_batch, self.n_rows
        )
        return {"index": self._latest}

    def partitions(self, start, end):
        lo, hi = int(start["index"]), int(end["index"])
        self._seen = max(self._seen, lo, hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.n_parts)
        return [
            _RangePartition(b, min(b + step, hi)) for b in range(lo, hi, step)
        ]

    def read(self, partition):
        for i in range(partition.lo, partition.hi):
            yield _fields(i)

    def commit(self, end):
        self._seen = max(self._seen, int(end["index"]))


class SynthStreamDataSource(DataSource):
    """``spark.readStream.format("msdf_synth_stream")`` after
    ``spark.dataSource.register(SynthStreamDataSource)``."""

    @classmethod
    def name(cls):
        return "msdf_synth_stream"

    def schema(self):
        return SYNTH_SCHEMA

    def streamReader(self, schema):
        return SynthStreamReader(self.options)


def register_synth_stream_source(spark) -> None:
    spark.dataSource.register(SynthStreamDataSource)
