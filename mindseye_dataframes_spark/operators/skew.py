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
