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
