"""Statistical property of q231's priority-sampling estimator
(Duffield–Lund–Thorup): E[Σ_sample max(w, τ)] = Σ_corpus w.

Pure Python, no Spark: replays the exact integer arithmetic of the
query (q_n = (w·2²⁴) DIV (h24+1), τ = min over the top-(k+1)
multiset) across 300 deterministic salts and checks the mean
estimate lands within 3% of the true total — a bound the estimator's
variance comfortably beats at k=40 over this weight spread. The
per-salt draws are md5-seeded, so the test is exactly reproducible.
"""

from __future__ import annotations

import hashlib


def _estimate(weights: list[tuple[int, int]], k: int, salt: str) -> int:
    scored = []
    for doc_id, w in weights:
        h24 = int(
            hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:6], 16
        )
        scored.append(((w * (1 << 24)) // (h24 + 1), doc_id, w))
    scored.sort(key=lambda t: (-t[0], t[1]))
    tau = scored[k][0] if len(scored) > k else 0
    return sum(max(w, tau) for _, _, w in scored[:k])


def test_priority_estimator_is_unbiased():
    # deterministic synthetic corpus: 400 docs, skewed weights
    weights = [
        (i, 40 + (int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 500))
        for i in range(400)
    ]
    total = sum(w for _, w in weights)
    n_salts = 300
    est_mean = (
        sum(_estimate(weights, 40, f"s{j}") for j in range(n_salts)) / n_salts
    )
    assert abs(est_mean - total) <= 0.03 * total, (est_mean, total)


def test_priority_estimator_dominates_weights():
    # ŵ = max(w, τ) ≥ w for every sampled element, and τ equals the
    # (k+1)-th largest priority
    weights = [(i, 10 + i % 7) for i in range(100)]
    est = _estimate(weights, 20, "fixed")
    assert est >= sum(sorted((w for _, w in weights), reverse=True)[:20])


def test_query_emits_tau_zero_on_small_corpus(spark, tmp_path):
    """Engine-path pin of the Duffield-Lund-Thorup τ=0 edge (ADVICE
    r9): with ≤ k docs the whole corpus IS the sample, so τ must be 0
    and every ŵ must equal w exactly — the pre-fix rule (τ = smallest
    sampled priority) biased every estimate upward on small corpora."""
    from mindseye_dataframes_spark.queries import load_all

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, "t" * (10 * (i + 1)), "en", "s", 10 * (i + 1)) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = load_all()["q231_priority_sample"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # all docs sampled
    assert all(r["w_hat"] == r["w"] for r in rows), [
        (r["w"], r["w_hat"]) for r in rows
    ]
