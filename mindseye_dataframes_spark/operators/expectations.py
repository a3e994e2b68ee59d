"""Declarative data-quality expectations — one scan, many checks.

The admission gate a training-data pipeline runs before a snapshot is
allowed into the corpus: row-count floors, null-rate ceilings, domain
and range membership, key uniqueness. Every check compiles to an
aggregate expression over ONE pass (a single grouping-free ``agg``),
so the 100 TB cost is exactly one scan regardless of how many checks
are attached — never one job per check. Results come back long-form
``(check, passed, observed)`` so they can be written to an audit
table or asserted in CI.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``observed`` is an aggregate Column (cast to
    BIGINT downstream); ``passed`` is a predicate over that aggregate
    value, expressed as a second aggregate Column."""

    name: str
    observed: Column
    passed: Column


def check_min_rows(n: int) -> Check:
    cnt = F.count(F.lit(1))
    return Check("min_rows", cnt, cnt >= n)


def check_not_null(col: str) -> Check:
    nulls = F.count(F.lit(1)) - F.count(col)
    return Check(f"not_null:{col}", nulls, nulls == 0)


def check_unique(*cols: str) -> Check:
    dupes = F.count(F.lit(1)) - F.countDistinct(*cols)
    return Check(f"unique:{','.join(cols)}", dupes, dupes == 0)


def check_in_range(col: str, lo, hi) -> Check:
    """NULL values PASS this check (the SQL predicate is NULL for NULL
    input, which falls to otherwise(0)) — range membership is a
    statement about present values. Pair with :func:`check_not_null`
    when NULLs themselves are violations; this mirrors SQL CHECK
    constraint semantics, where NULL never violates."""
    out = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    )
    return Check(f"in_range:{col}", out, out == 0)


def check_in_set(col: str, values: list) -> Check:
    """NULL values PASS (see :func:`check_in_range`); add
    :func:`check_not_null` to reject them."""
    out = F.sum(F.when(~F.col(col).isin(values), 1).otherwise(0))
    return Check(f"in_set:{col}", out, out == 0)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregate pass; returns long-form
    (check, passed, observed) ordered by check name."""
    aggs = []
    for c in checks:
        aggs.append(c.observed.cast("long").alias(f"_obs_{c.name}"))
        aggs.append(c.passed.alias(f"_ok_{c.name}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c.name}', `_ok_{c.name}`, `_obs_{c.name}`" for c in checks
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (check, passed, observed)"
            )
        )
        .orderBy("check")
    )
