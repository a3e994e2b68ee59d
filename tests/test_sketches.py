"""Accuracy contracts for the sketch aggregates (q106/q107) — these
replace the DuckDB oracle, which cannot see engine-specific sketch
state."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries import load_all
from mindseye_dataframes_spark.sources.readers import load_table

REGISTRY = load_all()


def test_approx_percentiles_rank_error_bound(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees rank error
    ≤ n/accuracy; check value-space agreement via the exact values at
    the error-bound rank offsets."""
    approx = {
        r["event_type"]: r["approx_p50_p95_p99"]
        for r in REGISTRY["q106_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    for etype, (p50, p95, p99) in approx.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        tol = max(1, n // 10000 + 1)  # rank tolerance from the accuracy contract
        for q, got in ((0.5, p50), (0.95, p95), (0.99, p99)):
            rank = int(q * n)
            lo = vals[max(0, rank - tol - 1)]
            hi = vals[min(n - 1, rank + tol)]
            assert lo <= got <= hi, (etype, q, got, lo, hi)


def test_hll_rollup_within_error_and_mergeable(spark, sf_dir):
    """Merged daily sketches must estimate within 5% of the exact
    distinct count (lgK=12 → ~1.6% standard error)."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["q107_sketch_rollup"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype in exact:
        rel = abs(approx[etype] - exact[etype]) / max(1, exact[etype])
        assert rel < 0.05, (etype, approx[etype], exact[etype])


def test_rolling_hll_wau_tracks_exact(spark, sf_dir):
    """q156's sketched 7-day actives must stay within 5% of q145's
    exact rewrite on every report day (lgK=12 → ~1.6% standard
    error), and cover the same day set."""
    approx = {
        r["day"]: r["wau7_approx"]
        for r in REGISTRY["q156_rolling_hll_wau"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["day"]: r["wau7"]
        for r in REGISTRY["q145_rolling_active_users"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact) and exact
    for day, want in exact.items():
        got = approx[day]
        assert abs(got - want) <= max(2.0, 0.05 * want), (day, got, want)


def test_pq_ann_recall_vs_exact(spark, sf_dir):
    """q157's PQ top-10 must overlap the exact L2 top-10 (recall@10
    averaged over the 10 queries ≥ 0.5 — 4×16 codebooks on 64 dims
    are a coarse quantizer; the contract pins 'much better than the
    ~2% random baseline', not exactness) and top-1 must be found in
    the PQ top-10 for most queries."""
    import numpy as np

    from mindseye_dataframes_spark.sources.readers import load_table

    got = {}
    for r in REGISTRY["q157_pq_ann_topk"].fn(spark, sf_dir).collect():
        got.setdefault(r["q_id"], []).append(r["c_id"])
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    corpus_ids = sorted(i for i in emb if i >= 10)
    cmat = np.stack([emb[i] for i in corpus_ids])
    recalls, top1_hits = [], 0
    for qid in range(10):
        d = ((cmat - emb[qid]) ** 2).sum(axis=1)
        order = np.lexsort((corpus_ids, d))
        exact10 = [corpus_ids[j] for j in order[:10]]
        recalls.append(len(set(exact10) & set(got[qid])) / 10.0)
        top1_hits += exact10[0] in got[qid]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    assert top1_hits >= 7, top1_hits
