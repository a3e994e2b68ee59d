"""The driver checks only the FIRST 50 entries of queries() — the
registry ordering IS the verification strategy (queries/__init__.py).
These tests pin the round-10 window so a rotation mistake (stale
queries pushed out, rows-only burning slots) fails loudly instead of
silently shrinking coverage.

Round-10 shape (VERDICT r9 item 1): the round-9 driver window
re-proved the full REFRESH_R09 set, the 26 r9 additions, and the
entire r3-stale q89–q99 block — so STALE_R03 is now empty and the
44 r4-stale queries (q116–q161 families, last driver-hashed in round
4) ARE the window: they must all fit, with only this round's refresh
set (REFRESH_R10) and never-proven additions ahead of them. q157
stays retired (folded into q162's hashed recall gate), so every
registered query is oracle-bearing and the rows-only group is empty.
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
    REFRESH_R10,
    STALE_R02,
    STALE_R03,
    STALE_R04,
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
    assert set(window[: len(REFRESH_R10)]) == REFRESH_R10


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
    # r2/r3-stale are exhausted after the r6/r9 rotations; the
    # 44-query r4-stale block is the re-verification front (VERDICT r9
    # item 1: after r10 no query's latest driver row may be older than
    # r7) and must fit entirely unless refresh + new overflow the window
    assert not STALE_R02, "r2-stale should be empty after round 6"
    assert not STALE_R03, "r3-stale should be empty after round 9"
    n_head = len(REFRESH_R10) + sum(1 for n in qs if _group(n, qs) == 1)
    allowed_overflow = max(0, n_head + len(STALE_R04 - REFRESH_R10) - 50)
    missing_stale = (STALE_R04 - REFRESH_R10) - set(window)
    assert len(missing_stale) <= allowed_overflow, (
        f"r4-stale queries rotated out beyond the overflow: {missing_stale}"
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
    )
    unknown = proven - set(qs)
    assert not unknown, f"proven sets name unregistered queries: {unknown}"
    rows_only = {n for n in proven if qs[n].oracle is None}
    assert not rows_only, f"proven sets contain oracle-less queries: {rows_only}"


def test_window_is_exactly_refresh_plus_unproven_plus_stalest():
    qs = load_all()
    window = set(list(qs)[:50])
    # no slot may be wasted on a query proven more recently than r4
    # while a staler or unproven one waits outside
    outside = [n for n in qs if n not in window and _group(n, qs) <= 4]
    wasted = [n for n in window if _group(n, qs) > 4]
    assert not (outside and wasted), (
        f"window wastes slots {wasted} while {outside} wait outside"
    )
