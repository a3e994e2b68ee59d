"""The driver checks only the FIRST 50 entries of queries() — the
registry ordering IS the verification strategy (queries/__init__.py).
These tests pin the round-13 window so a rotation mistake (stale
queries pushed out, rows-only burning slots) fails loudly instead of
silently shrinking coverage.

Round-13 shape (VERDICT r12 item 1): the round-12 driver window
re-proved the q237 refresh and the 49 r6-stale rows — so STALE_R06 is
now empty and the 41 r7-stale queries (q158/q162/q167/q188–q207/
q20–q24/q26–q39/q41/q58/q60/q77/q86–q88 families, last driver-hashed
in round 7) are the re-verification front, behind this round's
refresh set (REFRESH_R13: q34's de-cartesianed block-GEMM plan,
q126's degree-oriented 2-path join, and q195's explicitly-sized
state-store drain re-prove at the head) and any never-proven
round-13 additions. Remaining slots fill from the
stalest proven group (r9). Every registered query remains
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
    PROVEN_R11,
    PROVEN_R12,
    REFRESH_R13,
    STALE_R02,
    STALE_R03,
    STALE_R04,
    STALE_R05,
    STALE_R06,
    STALE_R07,
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
    assert set(window[: len(REFRESH_R13)]) == REFRESH_R13


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
    # r2-r6-stale are exhausted after the r6/r9/r10/r11/r12 rotations;
    # the 41-query r7-stale block is the re-verification front (VERDICT
    # r12 item 1: after r13 no query's latest driver row may be older
    # than r9) and must fit entirely unless refresh + new overflow the
    # window
    assert not STALE_R02, "r2-stale should be empty after round 6"
    assert not STALE_R03, "r3-stale should be empty after round 9"
    assert not STALE_R04, "r4-stale should be empty after round 10"
    assert not STALE_R05, "r5-stale should be empty after round 11"
    assert not STALE_R06, "r6-stale should be empty after round 12"
    n_head = len(REFRESH_R13) + sum(1 for n in qs if _group(n, qs) == 1)
    allowed_overflow = max(0, n_head + len(STALE_R07 - REFRESH_R13) - 50)
    missing_stale = (STALE_R07 - REFRESH_R13) - set(window)
    assert len(missing_stale) <= allowed_overflow, (
        f"r7-stale queries rotated out beyond the overflow: {missing_stale}"
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
        | PROVEN_R11
        | PROVEN_R12
    )
    unknown = proven - set(qs)
    assert not unknown, f"proven sets name unregistered queries: {unknown}"
    rows_only = {n for n in proven if qs[n].oracle is None}
    assert not rows_only, f"proven sets contain oracle-less queries: {rows_only}"


def test_readme_query_count():
    """README's architecture block quotes the registry size; a stale
    literal survived two rounds of registry growth (VERDICT r11 item
    4: '232 named queries' at registry 235), so the count is now
    pinned to len(load_all()) — it can't rot without failing here."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as fh:
        text = fh.read()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README no longer states the query count"
    assert int(m.group(1)) == len(load_all()), (
        f"README says {m.group(1)} named queries; registry has "
        f"{len(load_all())} — update README.md"
    )


def test_window_is_exactly_refresh_plus_unproven_plus_stalest():
    qs = load_all()
    window = set(list(qs)[:50])
    # no slot may be wasted on a query proven more recently than r7
    # while a staler or unproven one waits outside
    outside = [n for n in qs if n not in window and _group(n, qs) <= 7]
    wasted = [n for n in window if _group(n, qs) > 7]
    assert not (outside and wasted), (
        f"window wastes slots {wasted} while {outside} wait outside"
    )
