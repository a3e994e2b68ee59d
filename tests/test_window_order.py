"""The driver checks only the FIRST 50 entries of queries() — the
registry ordering IS the verification strategy (queries/__init__.py).
These tests pin the round-11 window so a rotation mistake (stale
queries pushed out, rows-only burning slots) fails loudly instead of
silently shrinking coverage.

Round-11 shape (VERDICT r10 item 2): the round-10 driver window
re-proved the full REFRESH_R10 set, the 44 r4-stale rotations, and
the two r10 additions — so STALE_R04 is now empty and the 48 r5-stale
queries (q02–q13 families, last driver-hashed in round 5) ARE the
window: they must all fit, with only this round's refresh set
(REFRESH_R11: q232, re-proving the manifest_segments unification) and
the never-proven q237 ahead of them. Every registered query remains
oracle-bearing.
"""

from __future__ import annotations

from mindseye_dataframes_spark.queries import (
    PROVEN_R02,
    PROVEN_R03,
    PROVEN_R04,
    PROVEN_R05,
    PROVEN_R06,
    PROVEN_R07,
    PROVEN_R09,
    PROVEN_R10,
    REFRESH_R11,
    STALE_R02,
    STALE_R03,
    STALE_R04,
    STALE_R05,
    load_all,
)


def _group(name, qs):
    from mindseye_dataframes_spark.queries import _order_key

    return _order_key((name, qs[name]))[0]


def test_refresh_set_heads_the_window():
    qs = load_all()
    window = list(qs)[:50]
    # the changed-after-check queries occupy the first slots, before
    # anything else — their green rows prove superseded code
    assert set(window[: len(REFRESH_R11)]) == REFRESH_R11


def test_every_registered_query_is_oracle_bearing():
    # q157 (the one by-design rows-only entry) was folded into q162's
    # hashed recall gate in round 8 — VERDICT r7 item 7's "done" state
    qs = load_all()
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    assert not rows_only, f"oracle-less registry entries: {rows_only}"
    assert "q157_pq_ann_topk" not in qs


def test_unproven_and_stale_queries_fit_the_window():
    qs = load_all()
    window = list(qs)[:50]
    # every never-proven oracle query must get a slot this round
    unproven = [
        n
        for n, q in qs.items()
        if q.oracle is not None and n not in window and _group(n, qs) == 1
    ]
    assert not unproven, f"unproven oracle queries outside the window: {unproven}"
    # r2/r3/r4-stale are exhausted after the r6/r9/r10 rotations; the
    # 48-query r5-stale block is the re-verification front (VERDICT
    # r10 item 2: after r11 no query's latest driver row may be older
    # than r6) and must fit entirely unless refresh + new overflow the
    # window
    assert not STALE_R02, "r2-stale should be empty after round 6"
    assert not STALE_R03, "r3-stale should be empty after round 9"
    assert not STALE_R04, "r4-stale should be empty after round 10"
    n_head = len(REFRESH_R11) + sum(1 for n in qs if _group(n, qs) == 1)
    allowed_overflow = max(0, n_head + len(STALE_R05 - REFRESH_R11) - 50)
    missing_stale = (STALE_R05 - REFRESH_R11) - set(window)
    assert len(missing_stale) <= allowed_overflow, (
        f"r5-stale queries rotated out beyond the overflow: {missing_stale}"
    )


def test_proven_sets_cover_only_registered_oracle_queries():
    qs = load_all()
    proven = (
        PROVEN_R02
        | PROVEN_R03
        | PROVEN_R04
        | PROVEN_R05
        | PROVEN_R06
        | PROVEN_R07
        | PROVEN_R09
        | PROVEN_R10
    )
    unknown = proven - set(qs)
    assert not unknown, f"proven sets name unregistered queries: {unknown}"
    rows_only = {n for n in proven if qs[n].oracle is None}
    assert not rows_only, f"proven sets contain oracle-less queries: {rows_only}"


def test_window_is_exactly_refresh_plus_unproven_plus_stalest():
    qs = load_all()
    window = set(list(qs)[:50])
    # no slot may be wasted on a query proven more recently than r5
    # while a staler or unproven one waits outside
    outside = [n for n in qs if n not in window and _group(n, qs) <= 5]
    wasted = [n for n in window if _group(n, qs) > 5]
    assert not (outside and wasted), (
        f"window wastes slots {wasted} while {outside} wait outside"
    )
