"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side (``F.aggregate``/``zip_with`` — whole-stage-codegen
eligible), no Python UDF in the hot path. Accumulation is a
sequential left fold in double precision; DuckDB's
``list_cosine_similarity(CAST(.. AS DOUBLE[]), ..)`` agrees to ~1 ulp,
so oracle-checked outputs rank by ``round(cos, 9)`` with an id
tiebreak instead of comparing raw scores.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with the LEGACY division semantics pinned
    under ANSI mode (Spark 4 default): a zero-norm side yields NaN —
    which both engines order above any threshold — instead of
    DIVIDE_BY_ZERO. The guard matters on the exact re-verify path of
    ``allpairs_cosine_threshold`` (q34), whose zero-norm candidates
    are force-included; NULL vectors still propagate NULL (a NULL
    denominator fails the ``when`` and divides into NULL)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot(a, b) / denom
    )


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance as the canonical left fold — the shared
    engine-parity contract (cast order, fold order) for every exact
    distance baseline (q162's gate, PQ re-rank); round(·, 9) at the
    call site for ranking."""
    return F.aggregate(
        F.zip_with(
            _c(a),
            _c(b),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_ranked(a: Column | str, b: Column | str, digits: int = 9) -> Column:
    """Cosine rounded for cross-engine-stable ranking (see module doc)."""
    return F.round(cosine(a, b), digits)
