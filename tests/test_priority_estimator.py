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
