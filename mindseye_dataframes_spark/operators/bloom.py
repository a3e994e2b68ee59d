"""Hand-rolled Bloom-filter semi-join pruning.

Spark's own runtime Bloom pruning (``InjectRuntimeFilter``) only
fires for a narrow shape of selective-join plans, and its
``bloom_filter_agg`` aggregate is not exposed to SQL/DataFrame users
(verified on Spark 4.1: UNRESOLVED_ROUTINE). This operator gives the
same shuffle-volume win explicitly, as plain DataFrame algebra:

* **build**: hash every build-side key into ``n_hashes`` bit
  positions of an ``n_bits`` filter, then fold the positions into
  64-bit words with one ``bit_or`` hash-aggregate — the filter
  materializes as a DataFrame of ``(word_idx, word)`` rows,
  ``n_bits / 64`` rows max, independent of build-side row count.
* **probe**: for each hash, a **broadcast** inner join on
  ``word_idx`` plus a shift-and-mask bit test. A probe row survives
  only if every one of its ``n_hashes`` bits is set. No shuffle of
  the probe side, no fan-out (each join is 1:≤1).

False positives pass the prefilter and die in the exact join that
follows — the operator is performance-only, so results stay exact
and any oracle compares against the plain join.

Scale note (100 TB): with the default 2^22 bits the filter is 64 K
words ≈ 512 KB broadcast — sized for ~4 M build keys at ~2.4 % FPR
(k=2). The knob to turn at larger build sides is ``n_bits``
(broadcast cost grows linearly, still ≪ the shuffle it avoids);
beyond broadcastable sizes, fall back to a plain shuffled semi-join,
which is what the prefilter was saving you from anyway.

Reference parity: the reference engine's scan layer prunes row
groups with key-range statistics only (reference ``README.md``
query-pushdown section); Bloom-based join pruning is part of this
engine's beyond-parity scale surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Distinct seeds make the n_hashes probes independent xxhash64 draws.
_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


@dataclass(frozen=True)
class BloomWords:
    """A built Bloom filter: the words relation plus the geometry it
    was built with. Probing with a DIFFERENT (n_bits, n_hashes) than
    the build silently drops true matches — binding the config to the
    build output makes that misuse unrepresentable."""

    words: DataFrame
    n_bits: int
    n_hashes: int


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """Bit positions for a key: xxhash64 with per-probe seeds, folded
    into [0, n_bits) with pmod (xxhash64 is signed)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEEDS[i])), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int = 1 << 22, n_hashes: int = 2
) -> BloomWords:
    """Aggregate build-side keys into Bloom words ``(word_idx, word)``
    bundled with their geometry.

    One hash-aggregate; output ≤ ``n_bits/64`` rows regardless of
    input size. Absent word_idx rows mean an all-zero word."""
    if not 1 <= n_hashes <= len(_SEEDS):
        raise ValueError(
            f"n_hashes must be in [1, {len(_SEEDS)}] (one independent "
            f"xxhash64 seed per probe), got {n_hashes}"
        )
    if n_bits < 64:
        raise ValueError(f"n_bits must be >= 64 (one word), got {n_bits}")
    pos = _positions(F.col(key_col), n_bits, n_hashes)
    stacked = keys.select(
        F.explode(F.array(*pos)).alias("bit_pos")
    ).select(
        F.expr("bit_pos DIV 64").alias("word_idx"),
        # DataFrame shiftleft() takes only a literal shift count, so
        # the column-shift goes through the SQL expression form
        F.expr("shiftleft(1L, cast(bit_pos % 64 AS INT))").alias("bit"),
    )
    words = stacked.groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
    return BloomWords(words=words, n_bits=n_bits, n_hashes=n_hashes)


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: BloomWords,
) -> DataFrame:
    """Keep only rows of ``df`` whose key *may* be in the filter.

    ``n_hashes`` broadcast inner joins on ``word_idx``; each join is
    at most 1:1 (word_idx is unique in ``words``), so no fan-out and
    no shuffle of ``df``. The bit test reads bit ``pos % 64`` via
    shiftright+mask — arithmetic shift is safe because only bit 0 is
    inspected after the shift."""
    out = df
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    for i, pos in enumerate(_positions(F.col(key_col), n_bits, n_hashes)):
        w = bloom.words.select(
            F.col("word_idx").alias(f"_bw{i}"), F.col("word").alias(f"_wv{i}")
        )
        out = (
            out.withColumn(f"_p{i}", pos)
            .join(
                F.broadcast(w),
                F.expr(f"_p{i} DIV 64") == F.col(f"_bw{i}"),
                "inner",
            )
            .filter(
                F.expr(f"(shiftright(_wv{i}, cast(_p{i} % 64 AS INT)) & 1) = 1")
            )
            .drop(f"_p{i}", f"_bw{i}", f"_wv{i}")
        )
    return out
