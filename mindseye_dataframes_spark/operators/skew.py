"""Skew-handling join (SURVEY §7 M6: "salting for skew").

AQE's skew-join handles most runtime skew (enabled in session.py);
``salted_join`` is the explicit fallback for *planned* skew — a known
hot key joining a non-broadcastable right side. The left (skewed)
side gets a random salt in [0, salt); the right side is exploded
``salt``-fold so every (key, salt) pair finds its match. Memory cost:
|R|·salt rows; wins whenever the hottest key exceeds an executor's
share, which is exactly when a plain shuffle join stalls on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with left-side salting. ``on`` columns must exist on
    both sides; the salt column never escapes.

    Right/full outer joins are rejected: the right side is exploded
    ``salt``-fold, so right rows with no left match would surface
    ``salt`` duplicate unmatched rows. Salt the other side instead.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join supports {sorted(_SAFE_HOW)}; for '{how}' swap the "
            "sides (the exploded right side would duplicate unmatched rows)"
        )
    l_salted = left.withColumn(SALT, (F.rand(seed) * salt).cast("int"))
    r_exploded = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_exploded, [*on, SALT], how).drop(SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt: int = 8,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial-aggregate
    on (keys, salt), then merge partials per key. Spark's hash
    aggregate already partial-combines map-side, so this explicit form
    only wins when the MERGE side itself skews (few keys × huge
    cardinality reducers, e.g. exact count-distinct structures); it is
    also the template for custom mergeable states.

    ``aggs`` maps output name → ("sum" | "count" | "min" | "max",
    column). Only merge-associative aggregates are accepted — each
    re-merges exactly under regrouping (use decimal/integer columns
    for sums that must be bit-stable: double re-merge changes
    accumulation order).

    ``salt_from``: a column whose hash provides a DETERMINISTIC salt
    (default: Spark's rand would make plans nondeterministic).
    """
    if salt_from is None:
        raise ValueError("salted_agg needs salt_from for determinism")
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {
        "sum": lambda c: F.sum(c),
        "count": lambda c: F.count(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
    }
    for name, (kind, _) in aggs.items():
        if kind not in _MERGE:
            raise ValueError(f"{name}: '{kind}' is not merge-associative")
    salted = df.withColumn(
        SALT, F.pmod(F.hash(F.col(salt_from)), F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*keys, SALT).agg(
        *[
            _PARTIAL[kind](col).alias(f"_p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[kind](F.col(f"_p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
