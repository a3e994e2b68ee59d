"""Training-data layout operators: sequence packing, seeded global
shuffle, weighted mixture sampling.

These are the ops an LLM pre-training pipeline runs after curation
(reference scope: the reference stages training batches by zipping
positionally ordered frames, `Trainer.scala:195-200`; packing and
shuffling are the scale-out generalization of that batch staging).

Scale design:

- ``with_global_prefix_sum`` is the same two-phase distributed scan as
  ``zip_frames.with_row_index`` (range exchange → O(partitions)
  per-partition totals on the driver → broadcast offsets → local
  window). No single-partition window anywhere — a global
  ``Window.orderBy`` without ``partitionBy`` funnels 100 TB through
  one task and is the classic scale-killer this module avoids.
- ``seeded_shuffle`` derives order from md5(seed, key): deterministic,
  uniformly spreading, engine-portable — and the range exchange on the
  hash IS the shuffle (no extra pass).
- ``mixture_sample`` is a broadcast join against a tiny rates relation
  plus a hash filter: one map-side stage, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mindseye_dataframes_spark.operators.zip_frames import with_row_index


def with_global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_keys: list[str],
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_keys`` order
    (row i gets the sum of values of rows 0..i-1).

    ``order_keys`` must be a unique key (ties have no defined
    position under range partitioning). Distributed scan:

    1. ``repartitionByRange(order_keys)`` + persist (freeze boundary
       sampling — same reasoning as ``with_row_index``),
    2. per-partition totals → driver (O(partitions) rows) → exclusive
       partition offsets broadcast back,
    3. local exclusive window sum within each partition.
    """
    keys = [F.col(k) for k in order_keys]
    if num_partitions is None:
        from mindseye_dataframes_spark.plans.parallelism import (
            default_parallelism,
            scan_partitions,
        )

        inp = scan_partitions(df)
        num_partitions = min(
            default_parallelism(df.sparkSession), max(4, inp * 2)
        )
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        .withColumn("_ps_part", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = (
        ranged.groupBy("_ps_part")
        .agg(F.sum(F.col(value_col)).alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_ps_part"]):
        offsets.append((row["_ps_part"], acc))
        acc += row["t"] or 0
    offsets_df = df.sparkSession.createDataFrame(
        offsets, "_ps_part int, _ps_offset long"
    )
    local = (
        Window.partitionBy("_ps_part")
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn(
            "_ps_local",
            F.coalesce(F.sum(F.col(value_col)).over(local), F.lit(0)).cast("long"),
        )
        .join(F.broadcast(offsets_df), "_ps_part")
        .withColumn(out_col, F.col("_ps_offset") + F.col("_ps_local"))
        .drop("_ps_part", "_ps_local", "_ps_offset")
    )


def pack_sequences(
    df: DataFrame,
    count_col: str,
    order_keys: list[str],
    block_size: int,
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every
    document's tokens in ``order_keys`` order and chop the stream into
    fixed ``block_size`` blocks. Emits per document:

    - ``start_offset``: global token offset of the doc's first token,
    - ``first_block`` / ``last_block``: blocks the doc lands in,
    - ``n_blocks``: how many block boundaries the doc spans.

    The downstream writer groups by block id to emit training rows;
    everything here is the offset assignment, which is the only part
    that needs global coordination.
    """
    out = with_global_prefix_sum(df, count_col, order_keys, out_col="start_offset")
    cnt = F.col(count_col).cast("long")
    start = F.col("start_offset")
    first = F.floor(start / block_size).cast("long")
    # empty docs occupy no block: collapse to the block of start_offset
    last = F.floor((start + F.greatest(cnt, F.lit(1)) - 1) / block_size).cast("long")
    return (
        out.withColumn("first_block", first)
        .withColumn("last_block", last)
        .withColumn("n_blocks", last - first + F.lit(1))
    )


def seeded_shuffle(
    df: DataFrame,
    key_cols: list[str],
    seed: str,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global shuffle: every row gets a dense 0-based
    position ordered by ``md5(seed ':' key...)``. Same (seed, keys) →
    same permutation on any cluster size, any engine (md5 is
    engine-portable — the DuckDB oracle reproduces it verbatim).

    The range exchange on the hash column IS the data shuffle; the
    position assignment reuses the two-phase scan. Epoch re-shuffles
    are just a new seed string.
    """
    hashed = df.withColumn(
        "_shuffle_key",
        F.md5(F.concat_ws(":", F.lit(seed), *[F.col(c).cast("string") for c in key_cols])),
    )
    return with_row_index(hashed, ["_shuffle_key"], index_col=pos_col).drop(
        "_shuffle_key"
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Weighted mixture sampling: keep a deterministic ``rates[g]``
    fraction of each group (data source, language, domain…). Groups
    absent from ``rates`` are dropped — a mixture spec is a whitelist.

    Decision rule: md5-bucket of the row key < rate·buckets, so the
    sample is stable under reruns and composable with other hash
    samples (q75). Plan: broadcast join on the tiny rates relation +
    a map-side filter — no shuffle of the fact table.
    """
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(g, int(round(r * buckets))) for g, r in sorted(rates.items())],
        f"{group_col} string, _keep_below int",
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    return (
        df.join(F.broadcast(rates_df), group_col)
        .withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < F.col("_keep_below"))
        .drop("_keep_below", "_bucket")
    )
