"""BPE trainer (operators/bpe.py) pinned against a from-scratch
Python reference — merge table and post-merge symbol totals must
match exactly (the op is iterative/fold-based, the documented
non-SQL-expressible family, so this test is its correctness gate)."""

from __future__ import annotations

from collections import Counter

import duckdb


def _ref_bpe(texts: list[str], n_merges: int):
    words: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, n in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
        total_after = sum(len(vocab[w]) * n_w for w, n_w in words.items())
        merges.append((step, left, right, n, total_after))
    total = sum(len(vocab[w]) * n for w, n in words.items())
    return merges, total


def test_bpe_matches_python_reference(spark, sf_dir):
    from mindseye_dataframes_spark.operators.bpe import bpe_train
    from mindseye_dataframes_spark.sources.readers import load_table

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    ref_merges, ref_total = _ref_bpe(texts, 4)

    docs = load_table(spark, sf_dir, "documents")
    merges, words = bpe_train(docs, "text", n_merges=4)
    assert merges == ref_merges
    from pyspark.sql import functions as F

    total = words.agg(
        F.sum(F.size("syms") * F.col("n_word")).alias("t")
    ).collect()[0]["t"]
    assert total == ref_total


def test_bpe_query_shape(spark, sf_dir):
    from mindseye_dataframes_spark.queries import load_all

    df = load_all()["q169_bpe_trainer"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 4
    assert [r["step"] for r in rows] == [1, 2, 3, 4]
    # merges are selected by strictly decreasing-or-equal weighted
    # count (a later merge can't beat an earlier one)
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # the compression curve strictly decreases (each merge round
    # applies at least once), and no step can remove more symbols
    # than its selected pair count (overlaps make it strictly fewer)
    totals = [r["total_symbols"] for r in rows]
    assert totals == sorted(totals, reverse=True) and len(set(totals)) == 4
    for i in range(3):
        assert 0 < totals[i] - totals[i + 1] <= rows[i + 1]["n"]


def test_semdedup_dropped_edge_cases(spark):
    """Zero-norm vectors must not produce NaN similarities (guarded to
    norm 1), singleton clusters drop nothing, and the keep-lowest-id
    rule holds for an exact-duplicate pair."""
    from mindseye_dataframes_spark.operators.clustering import semdedup_dropped

    rows = [
        # cell 0: exact duplicates -> higher id dropped
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        # cell 1: singleton -> nothing dropped
        (3, [0.0, 1.0], 1),
        # cell 2: zero vector + orthogonal-ish vector -> no NaN, no drop
        (4, [0.0, 0.0], 2),
        (5, [0.5, 0.5], 2),
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>, _cell int"
    )
    dropped = semdedup_dropped(df, "vec_id", "embedding", tau=0.9)
    assert dropped.columns == ["_cell", "vec_id"]  # caller's names kept
    got = {(r["_cell"], r["vec_id"]) for r in dropped.collect()}
    assert got == {(0, 2)}

    # generic column names survive too (doc-level caller)
    renamed = df.selectExpr(
        "vec_id AS doc_id", "embedding", "CAST(_cell AS BIGINT) AS bucket"
    )
    d2 = semdedup_dropped(renamed, "doc_id", "embedding", cell_col="bucket", tau=0.9)
    assert d2.columns == ["bucket", "doc_id"]
    assert {(r["bucket"], r["doc_id"]) for r in d2.collect()} == {(0, 2)}


def test_bpe_deep_merge_run_stays_bounded(spark):
    """VERDICT r5 item 4: a 64-merge run must (a) still match the
    Python reference exactly, (b) checkpoint on schedule so no round
    re-executes more than ``checkpoint_every`` folds (the O(n²)
    recompute canary — before the fix, 64 nested interpreted folds
    made analysis alone blow up), and (c) hand back a frame whose plan
    is a stored-RDD scan, not a 64-deep expression chain, with the
    vocab cache released."""
    import time

    from mindseye_dataframes_spark.operators import bpe as bpe_mod
    from tests.test_bpe import _ref_bpe  # self-import keeps names local

    # a corpus rich enough that 64 merges don't run dry
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
        "the five boxing wizards jump quickly",
    ]
    texts = [t for t in base for _ in range(3)]
    ref_merges, ref_total = _ref_bpe(texts, 64)
    assert len(ref_merges) == 64  # corpus really sustains 64 rounds

    docs = spark.createDataFrame([(t,) for t in texts], "text string")

    n_checkpoints = 0
    cls = type(docs)  # the concrete (classic/connect) DataFrame class
    orig = cls.localCheckpoint

    def counting(self, eager=True):
        nonlocal n_checkpoints
        n_checkpoints += 1
        return orig(self, eager=eager)

    cls.localCheckpoint = counting
    try:
        t0 = time.monotonic()
        merges, words = bpe_mod.bpe_train(
            docs, "text", n_merges=64, checkpoint_every=8
        )
        elapsed = time.monotonic() - t0
    finally:
        cls.localCheckpoint = orig

    assert merges == ref_merges
    # 64/8 scheduled truncations + the final pin
    assert n_checkpoints == 64 // 8 + 1
    # generous absolute canary: the pre-fix O(n²) fold recompute blew
    # far past this on the same corpus (interpreted folds re-run
    # 64·65/2 times); linear-with-checkpoints stays well under even
    # when another Spark session shares the host's cores (observed
    # ~125 s with a concurrent bench run — keep the bound above that)
    assert elapsed < 240, f"64-merge run took {elapsed:.0f}s"
    plan = words._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan and "aggregate" not in plan.lower()
    from pyspark.sql import functions as F

    total = words.agg(
        F.sum(F.size("syms") * F.col("n_word")).alias("t")
    ).collect()[0]["t"]
    assert total == ref_total
