"""Edit-distance similarity join via segment blocking (PassJoin-style).

The scale rewrite of a fuzzy string join: a block-quadratic
``levenshtein ≤ k`` comparison (even inside brand blocks, candidates
grow with block²) becomes pigeonhole candidate generation — partition
every string into k+1 segments; if ed(a, b) ≤ k, then b's
segmentation contains at least one segment appearing *exactly* in a,
at a position shifted by at most k. So:

- build side emits its k+1 segments keyed (block, len, seg_idx, text),
- probe side emits substrings for every candidate build-length
  (±k) / segment / shift (±k) — a bounded constant fan-out
  (≤ (k+1)·(2k+1)² = 75 keys at k=2) of narrow rows,
- an equi-join on the segment key yields candidates proportional to
  the number of true near-matches, NOT to block size²,
- the exact thresholded ``levenshtein`` verifies survivors.

All expression-level (codegen substrings, one hash join, no Python).
Candidate generation is a strict superset of the true result (the
pigeonhole lemma guarantees no misses for len ≥ k+1), and the verify
step makes the output exact — proven against the naive theta-join
oracle in q102.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds(i: int, length_expr: str, k: int) -> tuple[str, str]:
    """(start, len) SQL exprs (0-based start) of segment ``i`` of a
    string of length ``length_expr`` split into k+1 even segments —
    the first ``L % (k+1)`` segments get the extra character."""
    n = k + 1
    base = f"({length_expr} div {n})"
    rem = f"({length_expr} % {n})"
    seg_len = f"({base} + (CASE WHEN {i} < {rem} THEN 1 ELSE 0 END))"
    start = f"({i} * {base} + least({i}, {rem}))"
    return start, seg_len


def edit_distance_join(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block_col: str,
    k: int = 2,
) -> DataFrame:
    """All (key_a < key_b) pairs within a block with
    ``levenshtein(text_a, text_b) <= k``. Returns
    (key_a, key_b, name_a, name_b, dist). Strings of length ≥ k+1 go
    through segment blocking; rows with length ≤ k (where the
    pigeonhole lemma can't apply — it needs one char per segment) are
    compared exhaustively in-block and unioned back in, so the result
    is exact for ALL string lengths."""
    n = k + 1
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(text_col).alias("txt"),
        F.col(block_col).alias("blk"),
        F.length(text_col).alias("len"),
    )

    # --- build side: the k+1 actual segments of every string
    seg_structs = []
    for i in range(n):
        start, seg_len = _seg_bounds(i, "len", k)
        seg_structs.append(
            f"named_struct('i', {i}, 'seg', substring(txt, {start} + 1, {seg_len}))"
        )
    build = base.select(
        F.col("key").alias("key_b"),
        F.col("txt").alias("name_b"),
        "blk",
        F.col("len").alias("len_b"),
        F.explode(F.expr(f"array({', '.join(seg_structs)})")).alias("s"),
    ).select(
        "key_b", "name_b", "blk", "len_b",
        F.col("s.i").alias("i"), F.col("s.seg").alias("seg"),
    )

    # --- probe side: substrings for every (build length +dl, segment,
    # shift) combination — constant fan-out, validity-filtered.
    # Two candidate-set reductions (both preserve exactness, proven by
    # the brute-force property test):
    # 1. symmetry: every qualifying pair is found from the shorter (or
    #    equal) side probing the longer — dl ∈ [0, k], not [-k, k];
    # 2. multi-match-aware position filter: it suffices to probe the
    #    FIRST error-free segment of an optimal alignment. Errors
    #    strictly before segment i are then ≥ i (each earlier segment
    #    holds one) and ≥ |sh| (probe substring starts at p_i + sh, so
    #    the prefix alignment's net indel balance is -sh, costing ≥
    #    |sh| errors); the suffix alignment must absorb the remaining
    #    net length change dl + sh, costing ≥ |dl + sh| errors. Total
    #    ≤ k  ⇒  max(i, |sh|) + |dl + sh| ≤ k.
    #    At k=2 this cuts probe fan-out 45 → 18 combos per row
    #    (proven exact against brute force in test_properties.py).
    combos = ", ".join(
        f"named_struct('i', {i}, 'dl', {dl}, 'sh', {sh})"
        for i in range(n)
        for dl in range(0, k + 1)
        for sh in range(-k, k + 1)
        if max(i, abs(sh)) + abs(dl + sh) <= k
    )
    probe = (
        base.select(
            F.col("key").alias("key_a"),
            F.col("txt").alias("name_a"),
            "blk",
            F.col("len").alias("len_a"),
            F.explode(F.expr(f"array({combos})")).alias("c"),
        )
        .withColumn("len_b", F.col("len_a") + F.col("c.dl"))
        .filter(F.col("len_b") >= n)
    )
    # _seg_bounds takes the index textually, so the struct field works
    probe_start, probe_len = _seg_bounds("(c.i)", "len_b", k)  # type: ignore[arg-type]
    probe = (
        probe.withColumn("p", F.expr(probe_start) + F.col("c.sh"))
        .withColumn("sl", F.expr(probe_len))
        .filter((F.col("p") >= 0) & (F.col("p") + F.col("sl") <= F.col("len_a")))
        .select(
            "key_a", "name_a", "blk", "len_b",
            F.col("c.i").alias("i"),
            F.expr("substring(name_a, p + 1, sl)").alias("seg"),
        )
    )

    # dedupe on bare keys (8/16-byte rows), then rejoin the strings —
    # a distinct over the full name pairs would shuffle 4 string
    # columns per candidate instead of two longs.
    #
    # The (len, seg_idx, segment) part of the join key is folded into
    # ONE xxhash64 — the exchanges shuffle (block, long) instead of
    # (block, int, int, string) and the sort-merge compares a single
    # long (measured 3.5 s → 2.7 s for q102 at sf0.1, identical
    # output). Exactness is unconditional, not probabilistic: tuple
    # equality implies hash equality, so every pigeonhole candidate
    # survives (no misses), and a hash collision can only ADD a
    # same-block candidate — which the exact thresholded levenshtein
    # verify either rejects or admits as a genuinely qualifying pair
    # (the output spec is "same-block pairs with ed ≤ k", so any
    # same-block pair passing verify belongs in the result). ``blk``
    # stays an explicit key precisely so no collision can pair rows
    # across blocks.
    candidates = (
        probe.select(
            "key_a", "blk", F.xxhash64("len_b", "i", "seg").alias("hk")
        )
        .join(
            build.select(
                "key_b", "blk", F.xxhash64("len_b", "i", "seg").alias("hk")
            ),
            ["blk", "hk"],
        )
        .filter(F.col("key_a") != F.col("key_b"))
        .select(
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
        )
        .distinct()
    )
    names = base.select("key", "txt")
    segmented = (
        candidates.join(
            names.select(F.col("key").alias("key_a"), F.col("txt").alias("name_a")),
            "key_a",
        )
        .join(
            names.select(F.col("key").alias("key_b"), F.col("txt").alias("name_b")),
            "key_b",
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
    )

    # --- short-string fallback: the pigeonhole lemma needs one char
    # per segment, so pairs where BOTH strings have length <= k never
    # reach the probe (its len_b >= k+1 filter). Pairs with one short
    # and one long side ARE found (the shorter side probes the longer,
    # whose segments are non-empty). Rows with length <= k are a tiny
    # constant-bounded set per block (alphabet^k strings at most), so
    # an exhaustive in-block equi-join on blk is O(short²) per block —
    # negligible at any scale, and disjoint from the segmented path
    # (whose build side always has length >= k+1).
    short = base.filter(F.col("len") <= k)
    short_pairs = (
        short.select(
            F.col("key").alias("key_a"), F.col("txt").alias("name_a"), "blk"
        )
        .join(
            short.select(
                F.col("key").alias("key_b"), F.col("txt").alias("name_b"), "blk"
            ),
            "blk",
        )
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
    )
    return segmented.unionAll(short_pairs)
