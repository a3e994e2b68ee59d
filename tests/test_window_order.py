"""The driver checks only the FIRST 50 entries of queries() — the
registry ordering IS the verification strategy (queries/__init__.py).
These tests pin the round-6 window so a rotation mistake (stale
queries pushed out, rows-only burning slots) fails loudly instead of
silently shrinking coverage.

Round-6 shape: never-proven oracle queries first (the redesigned
q40/q42/q65 and the sketch accuracy gates), then the 10 round-2-stale
overflow (q75/q76/q78-q85 — unverified since round 2), then the
stalest round-3 block fills the remaining slots (its own overflow
waits for round 7, exactly like the round-2 overflow did)."""

from __future__ import annotations

from mindseye_dataframes_spark.queries import (
    PROVEN_R02,
    PROVEN_R03,
    PROVEN_R04,
    PROVEN_R05,
    STALE_R02,
    STALE_R03,
    load_all,
)


def test_unproven_and_stale_queries_fit_the_window():
    qs = load_all()
    window = list(qs)[:50]
    # every never-proven oracle query must get a slot this round
    unproven = [
        n
        for n, q in qs.items()
        if q.oracle is not None and n not in window and _group(n, qs) == 0
    ]
    assert not unproven, f"unproven oracle queries outside the window: {unproven}"
    # the four-rounds-stale set (green in r2, never since) comes next;
    # when unproven + stale exceed 50 (a round that added many new
    # oracle queries), EXACTLY the overflow may wait — never more
    # (that would mean a fresher query stole a slot)
    n_group0 = sum(1 for n in qs if _group(n, qs) == 0)
    allowed_overflow = max(0, n_group0 + len(STALE_R02) - 50)
    missing_stale = STALE_R02 - set(window)
    assert len(missing_stale) <= allowed_overflow, (
        f"stale-r2 queries rotated out beyond the overflow: {missing_stale}"
    )
    # the r3-stale block fills whatever remains, stalest tier first:
    # no slot may hold an r4/r5-proven query while an r3-stale waits
    fill = 50 - n_group0 - (len(STALE_R02) - len(missing_stale))
    expected_r3_in_window = min(len(STALE_R03), max(0, fill))
    assert len(STALE_R03 & set(window)) == expected_r3_in_window, (
        "r3-stale queries missing from the window while fresher ones occupy it"
    )


def test_rows_only_queries_never_burn_window_slots():
    qs = load_all()
    names = list(qs)
    first_rows_only = next(
        i for i, n in enumerate(names) if qs[n].oracle is None
    )
    assert all(qs[n].oracle is None for n in names[first_rows_only:]), (
        "rows-only queries must sort after every oracle-bearing query"
    )


def test_proven_sets_cover_only_registered_oracle_queries():
    qs = load_all()
    proven = PROVEN_R02 | PROVEN_R03 | PROVEN_R04 | PROVEN_R05
    unknown = proven - set(qs)
    assert not unknown, f"proven sets name unregistered queries: {unknown}"
    rows_only = {n for n in proven if qs[n].oracle is None}
    assert not rows_only, f"proven sets contain oracle-less queries: {rows_only}"


def test_window_is_exactly_unproven_plus_stalest():
    qs = load_all()
    window = set(list(qs)[:50])
    # no slot may be wasted on a query proven more recently than r3
    # while a staler or unproven one waits outside
    outside = [n for n in qs if n not in window and _group(n, qs) <= 3]
    wasted = [n for n in window if _group(n, qs) > 3]
    assert not (outside and wasted), (
        f"window wastes slots {wasted} while {outside} wait outside"
    )


def _group(name, qs):
    from mindseye_dataframes_spark.queries import _order_key

    return _order_key((name, qs[name]))[0]
