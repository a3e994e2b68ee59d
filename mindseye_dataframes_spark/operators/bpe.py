"""Iterative BPE tokenizer training (Sennrich et al. 2016) on the
DataFrame API — the tokenizer-training inner loop run to convergence,
not just its first step (q147 counts the first merge's pairs; this
operator actually applies merges and re-counts).

Scale design — the two standard BPE tricks, both load-bearing at
100 TB:

1. **Train on the distinct-word table, not the corpus.** One
   corpus-wide hash-aggregate produces (word, n_occurrences); every
   merge round after that runs over |vocab| rows with occurrence
   weights. Corpus size never re-enters the loop.
2. **Merges are pure JVM expressions.** Pair counting is
   slice+arrays_zip+explode (codegen), and applying a chosen merge is
   a left-to-right ``F.aggregate`` fold over the symbol array —
   greedy leftmost application, the reference BPE semantics — so no
   Python worker ever sees a row. Each round's driver traffic is ONE
   top-1 row (the argmax pair): O(n_merges) total, parameters not
   data.

Determinism: the argmax pair breaks count ties by (left, right)
lexicographic order, so the learned merge table is a pure function of
the corpus — verified against a from-scratch Python reference in
``tests/test_bpe.py`` (the op is iterative/fold-based, the documented
non-SQL-expressible family, so its driver row is rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _chars(col):
    """Split a word into single-character symbols (unambiguous,
    unlike split(word, '') whose boundary empties differ by engine)."""
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def _apply_merge(syms, left: str, right: str):
    """Greedy leftmost merge of adjacent (left, right) into one symbol
    — a left-to-right fold: append each symbol unless it completes the
    pair with the accumulator's tail, in which case the tail is
    replaced by the fused symbol. Matches reference BPE application
    (after fusing, the new tail may NOT re-fuse with the same pass's
    next symbol unless it itself forms the pair — exactly what the
    fold yields)."""
    fused = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (syms, n_word) rows."""
    sz = F.size("syms")
    return (
        words.filter(sz >= 2)
        .select(
            "n_word",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, sz - 1).alias("l"),
                    F.slice("syms", 2, sz - 1).alias("r"),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("n_word").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 3,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merge_table, words)`` where merge_table rows are
    (step, left, right, n_occurrences-at-selection,
    total_symbols-AFTER-applying-the-step) — the per-step totals are
    the compression curve a tokenizer trainer reports — and ``words``
    is the distinct-word frame with the final ``syms`` segmentation
    applied (for downstream vocab/token stats). The per-step total is
    one O(|vocab|) aggregate returning a single row per round.

    Lineage discipline (the components.py lesson, VERDICT r5 item 4):
    each merge rebinds ``cur`` with another fold on top, so without
    truncation round k's two actions would re-execute all k−1 prior
    folds — O(n²) fold work and an n-deep expression chain at real
    merge counts (10³-10⁴). Every ``checkpoint_every`` rounds ``cur``
    is localCheckpoint-ed (lineage and plan depth reset to a stored
    RDD; between checkpoints at most ``checkpoint_every`` folds
    re-execute — bounded, not growing). The returned frame is
    checkpointed too, so the pinned vocab cache can be released here
    instead of leaking until session end."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
        .select(_chars("word").alias("syms"), "n_word")
        # O(|vocab|) rows: pinning them keeps every merge round off
        # the raw corpus (trick #1 above)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list[tuple[int, str, str, int, int]] = []
    cur = words
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], top[0]["n"]
        cur = cur.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "n_word"
        )
        if step % checkpoint_every == 0:
            # truncate BEFORE the totals action so the materialization
            # job is the only one that replays this window's folds
            cur = cur.localCheckpoint(eager=False)
        total_after = cur.agg(
            F.sum(F.size("syms") * F.col("n_word")).alias("t")
        ).collect()[0]["t"]
        merges.append((step, left, right, int(n), int(total_after)))
    # pin the result off the vocab cache, then release it: the caller
    # gets a bounded-depth frame, not a lease on our persisted RDD
    cur = cur.localCheckpoint(eager=True)
    words.unpersist()
    return merges, cur


def merge_table_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        [
            {
                "step": s,
                "left": l,
                "right": r,
                "merged": l + r,
                "n": n,
                "total_symbols": t,
            }
            for s, l, r, n, t in merges
        ],
        schema=(
            "step INT, left STRING, right STRING, merged STRING,"
            " n BIGINT, total_symbols BIGINT"
        ),
    )
