"""Accuracy contracts for the sketch aggregates (q106/q107/q156).

Since round 6 the queries themselves emit driver-hash-checked
accuracy gates (|sketch − exact| ≤ bound as boolean columns); these
tests (a) re-derive the raw sketch estimates independently of the
query plumbing and pin the same bounds, and (b) check the queries'
exact companion columns and gates against ground truth, so a gate
that silently went vacuous (e.g. comparing a column to itself) still
fails here."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries import load_all
from mindseye_dataframes_spark.sources.readers import load_table

REGISTRY = load_all()


def test_approx_percentiles_rank_error_bound(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees rank error
    ≤ n/accuracy; check value-space agreement via the exact values at
    the error-bound rank offsets, on the raw aggregate (independent
    of q106's gate logic)."""
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["ap"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("ap"))
        .collect()
    }
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
    gates = REGISTRY["q106_approx_percentiles"].fn(spark, sf_dir).collect()
    assert gates and all(
        r["p50_ok"] and r["p95_ok"] and r["p99_ok"] for r in gates
    ), gates


def test_hll_rollup_within_error_and_mergeable(spark, sf_dir):
    """Merged daily sketches must estimate within 5% of the exact
    distinct count (lgK=12 → ~1.6% standard error) — re-derived raw,
    then q107's exact column and gate checked against ground truth."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch")
    )
    approx = {
        r["event_type"]: r["a"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype in exact:
        rel = abs(approx[etype] - exact[etype]) / max(1, exact[etype])
        assert rel < 0.05, (etype, approx[etype], exact[etype])
    rows = REGISTRY["q107_sketch_rollup"].fn(spark, sf_dir).collect()
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    assert all(r["approx_ok"] for r in rows), rows


def test_rolling_hll_wau_tracks_exact(spark, sf_dir):
    """q156's exact companion column must equal q145's exact rewrite
    on every report day, and every accuracy gate must hold."""
    got = {
        r["day"]: (r["wau7_exact"], r["approx_ok"])
        for r in REGISTRY["q156_rolling_hll_wau"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["day"]: r["wau7"]
        for r in REGISTRY["q145_rolling_active_users"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(exact) and exact
    for day, want in exact.items():
        wau7_exact, ok = got[day]
        assert wau7_exact == want, (day, wau7_exact, want)
        assert ok, (day, want)


def test_pq_ann_recall_vs_exact(spark, sf_dir):
    """pq_ann_topk's reranked PQ top-10 must overlap the exact L2 top-10
    (recall@10 averaged over the 10 queries ≥ 0.8 — the ADC shortlist
    + exact re-rank measured 1.0 / 0.98 / 0.94 at sf0.001/0.01/0.1;
    code distance alone was 0.62 and DEGRADED to 0.42 at sf0.1, the
    round-6 sf0.1 sweep finding) and top-1 must be found in the PQ
    top-10 for at least 9/10 queries."""
    import numpy as np

    from mindseye_dataframes_spark.sources.readers import load_table

    from mindseye_dataframes_spark.queries.similarity import pq_ann_topk

    got = {}
    for r in pq_ann_topk(spark, sf_dir).collect():
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
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    assert top1_hits >= 9, top1_hits


def test_cms_overcount_within_epsilon_bound(spark, sf_dir):
    """q202's Count-Min estimates obey BOTH published guarantees on
    this dataset: est ≥ exact always (one-sided error — also a hashed
    driver column), and est − exact ≤ ⌈e/w · N⌉ for every audited
    heavy hitter (the ε-bound with d=4 rows; deterministic here given
    the fixed md5 hash family, so a regression in the sketch build —
    wrong row seeds, lost counts, bucket-width drift — fails loudly)."""
    import math

    rows = REGISTRY["q202_count_min_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    from mindseye_dataframes_spark.queries.sketches import _CMS_W
    from mindseye_dataframes_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n_stream = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    bound = math.ceil(math.e / _CMS_W * n_stream)
    for r in rows:
        assert r["never_under"] and r["est_c"] >= r["exact_c"], r
        assert r["est_c"] - r["exact_c"] <= bound, (r, bound)


def test_nb_classifier_model_is_bounded_and_calibrated(spark, sf_dir):
    """q201 invariants that the confusion rollup can't express: the
    output partitions the test split exactly (Σ n_docs = |test docs|),
    predictions and corrects never exceed their group sizes, and every
    per-source mean score sits inside the ppm scale."""
    from mindseye_dataframes_spark.queries.curation import (
        SPLIT_TEST_BUCKETS,
        hash_bucket,
    )
    from mindseye_dataframes_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    rows = REGISTRY["q201_nb_quality_classifier"].fn(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_test = docs.filter(
        hash_bucket("doc_id") < SPLIT_TEST_BUCKETS
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_test
    for r in rows:
        assert 0 <= r["n_pred_pos"] <= r["n_docs"], r
        assert 0 <= r["n_correct"] <= r["n_docs"], r
        assert r["n_pos"] in (0, r["n_docs"]), r  # label is a source fn
        assert 0 <= r["sum_score_ppm"] <= r["n_docs"] * 1_000_000, r


def test_cm_join_size_estimate_bounds(spark, sf_dir):
    """q220's accuracy contract: the CM inner-product estimate never
    undercounts (exact, by construction), and with d=4, w=1024 the
    overcount stays within the ε = e/w Markov bound ε·N_A·N_B for
    this fixed hash family and corpus (deterministic given both)."""
    import math

    from mindseye_dataframes_spark.queries import load_all

    row = load_all()["q220_sketch_join_size"].fn(spark, sf_dir).collect()[0]
    assert row["never_under"]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    na = ev.filter(ev.event_type == "view").count()
    nb = ev.filter(ev.event_type == "purchase").count()
    eps = math.e / 1024
    assert row["est_size"] - row["exact_size"] <= eps * na * nb, (
        row["est_size"], row["exact_size"], na, nb,
    )
