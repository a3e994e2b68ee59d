"""The driver checks only the FIRST 50 entries of queries() — the
registry ordering IS the verification strategy (queries/__init__.py).
These tests pin the round-8 window so a rotation mistake (stale
queries pushed out, rows-only burning slots) fails loudly instead of
silently shrinking coverage.

Round-9 shape: the round-8 driver artifacts never arrived, so the
REFRESH_R08 set was never re-proven and stays at the head via
REFRESH_R09 (plus q204, whose base construction was refactored into
the shared ann_incremental_base after its r7 green row). Then the
never-proven oracle queries (the r8 tombstone/compaction additions
and the r9 additions q212-q217), then the ENTIRE r3-stale block
(q89–q99), then the stalest r4 queries fill the remainder. q157
stays retired (folded into q162's hashed recall gate), so every
registered query is oracle-bearing and the rows-only group is
empty."""

from __future__ import annotations

from mindseye_dataframes_spark.queries import (
    PROVEN_R02,
    PROVEN_R03,
    PROVEN_R04,
    PROVEN_R05,
    PROVEN_R06,
    PROVEN_R07,
    REFRESH_R09,
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
    assert set(window[: len(REFRESH_R09)]) == REFRESH_R09


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
    # r2-stale stays exhausted; the r3-stale block (q89–q99, the last
    # r3-proven rows) is the re-verification front and must fit
    # entirely unless refresh + new queries overflow the window
    assert not STALE_R02, "r2-stale should be empty after round 6"
    n_head = len(REFRESH_R09) + sum(1 for n in qs if _group(n, qs) == 1)
    allowed_overflow = max(0, n_head + len(STALE_R03 - REFRESH_R09) - 50)
    missing_stale = (STALE_R03 - REFRESH_R09) - set(window)
    assert len(missing_stale) <= allowed_overflow, (
        f"r3-stale queries rotated out beyond the overflow: {missing_stale}"
    )
    # the r4-stale block fills whatever remains, stalest tier first
    fill = 50 - n_head - (len(STALE_R03 - REFRESH_R09) - len(missing_stale))
    expected_r4_in_window = min(len(STALE_R04 - REFRESH_R09), max(0, fill))
    assert len((STALE_R04 - REFRESH_R09) & set(window)) == expected_r4_in_window, (
        "r4-stale queries missing from the window while fresher ones occupy it"
    )


def test_proven_sets_cover_only_registered_oracle_queries():
    qs = load_all()
    proven = (
        PROVEN_R02 | PROVEN_R03 | PROVEN_R04 | PROVEN_R05 | PROVEN_R06 | PROVEN_R07
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
