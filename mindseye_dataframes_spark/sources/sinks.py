"""Sinks.

The reference's only sink is driver display (S5, `Trainer.scala:196-200`).
The engine's real sink is partitioned parquet; ``noop`` is used by
bench.py to measure full-plan execution without I/O skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_noop(df: DataFrame) -> None:
    """Execute the full plan, discard output (benchmark sink)."""
    df.write.format("noop").mode("overwrite").save()


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_zordered(
    df, path: str, cols: list[str], bits: int = 10, files: int = 16
) -> None:
    """Write ``df`` clustered by a 2-D Z-order (Morton) code over two
    integer columns: range-partition by the interleaved code, sort
    within partitions, one file per range. Every output file then
    covers a tight rectangle in (cols[0] × cols[1]) space, so parquet
    min/max footer stats prune scans on EITHER column — multi-
    dimensional data skipping from plain parquet, no table format
    needed. The morton map is a narrow codegen expression; the only
    wide cost is the single range exchange any sorted write pays.
    """
    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.queries.scale_patterns import _morton_sql

    if len(cols) != 2:
        raise ValueError("z-order clustering takes exactly two columns")
    mask = (1 << bits) - 1
    z = _morton_sql(f"{cols[0]} % {mask + 1}", f"{cols[1]} % {mask + 1}", bits, "div")
    (
        df.withColumn("_z", F.expr(z))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_binary_files(
    df: DataFrame, out_dir: str, name_col: str, bytes_col: str
) -> None:
    """Distributed binary-object sink: one file per row, named by
    ``name_col``, bytes from ``bytes_col`` — the write half Spark's
    ``binaryFile`` source lacks (it is read-only). Executors write
    their partitions directly (no driver collect), so the sink scales
    with the cluster; names must be unique per row, and writes are
    idempotent (task retries overwrite the same name with the same
    deterministic bytes). Locally ``out_dir`` is a directory; on a
    real deployment it is shared storage, exactly like any file
    sink."""
    import os
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            with open(os.path.join(out_dir, row[name_col]), "wb") as fh:
                fh.write(bytes(row[bytes_col]))

    df.select(name_col, bytes_col).foreachPartition(write_partition)


def pack_binary_objects(
    df: DataFrame,
    out_dir: str,
    name_col: str,
    bytes_col: str,
    target_shard_bytes: int = 128 << 20,
    meta_cols: tuple[str, ...] = (),
) -> int:
    """Container-format batching for small binary objects (VERDICT r6
    item 6): many small blobs → FEW parquet container shards of
    ``(name, *meta_cols, content)``, sized so each shard holds about
    ``target_shard_bytes`` of payload. This is the production fix for
    file-count-bound ingestion (q177's one-.png-per-doc loop at sf1 is
    dominated by per-file listing/open, ~33 s for 60 k objects): a
    downstream decode pass then pays one open per SHARD — thousands of
    blobs per I/O op — and the scan parallelism is parquet's splittable
    row groups rather than the object listing. Returns the shard count.

    Scale shape: ONE O(1)-row aggregate sizes the shard count from the
    real payload volume, then a single hash exchange on ``name_col``
    spreads blobs across shards (statistically even for iid blob
    sizes; pathological single-blob skew is bounded by the largest
    blob, exactly as with any file layout). Executors write their
    shards directly — no driver collect, no per-object filesystem
    round-trips. Parquet IS the container: columnar binary with
    min/max-indexed metadata columns riding alongside, so format
    filters prune whole shards without touching payload bytes."""
    from pyspark.sql import functions as F

    total = (
        df.select(F.sum(F.length(F.col(bytes_col)).cast("bigint"))).first()[0]
        or 0
    )
    shards = max(1, -(-int(total) // int(target_shard_bytes)))
    (
        df.select(
            F.col(name_col).alias("name"),
            *[F.col(c) for c in meta_cols],
            F.col(bytes_col).alias("content"),
        )
        .repartition(shards, "name")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return shards
