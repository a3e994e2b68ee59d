"""Exact (order-independent) aggregation helpers.

Floating-point SUM/AVG results depend on accumulation order, which
differs run-to-run under parallel execution and engine-to-engine
(Spark vs the DuckDB oracle). For hash-checked results we accumulate
in exact decimal arithmetic and only convert to double at the end:
the double→decimal rounding of each input is deterministic (no double
is an exact decimal tie), decimal sums are exact, and decimal→double
conversion is correctly rounded in both engines — so the final double
is bit-identical regardless of partitioning or engine.

This is also the right call at 100 TB: results stay stable across
AQE re-plans, speculative re-execution, and partition-count changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale=4 keeps 4 fractional digits of the synthetic measures (money
# columns have ~2, quantities/discounts ~2-4); precision 18 leaves
# 14 integer digits per input value. Sums widen to precision 38.
PRECISION = 18
SCALE = 4


def dec(col: Column | str, scale: int = SCALE, precision: int = PRECISION) -> Column:
    """Cast to exact decimal for order-independent accumulation.

    Pick the narrowest precision that fits the data: Spark widens
    products by p1+p2+1, so narrow inputs keep a 3-factor product
    under the decimal(38) ceiling (beyond it Spark rounds — which
    would break engine-exactness).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = SCALE) -> Column:
    """Order-independent SUM: exact decimal accumulate → double."""
    return F.sum(dec(col, scale)).cast("double")


# Two engine-exactness traps, learned the hard way (verified against
# DuckDB 1.0 at sf0.01):
#
# 1. decimal→double is only single-rounded while the decimal's
#    UNSCALED value stays below 2^53. Beyond that, DuckDB converts
#    hugeint→double then divides by 10^scale (two roundings) while
#    Java BigDecimal rounds once — off-by-1-ulp mismatches. So pick
#    product scales such that sums keep unscaled < 2^53.
# 2. NEVER rescale a decimal (CAST to lower scale) on the comparison
#    path: decimal values *can* be exact ties at the target scale
#    (unlike doubles), and Spark (HALF_UP) and DuckDB disagree there.
#
# Rule of thumb for this dataset (measures are exactly 2-decimal):
# factors at scale 2 → products at scale ≤6 → sums stay exact and
# well under 2^53 through sf0.1.


def davg(col: Column | str, scale: int = SCALE) -> Column:
    """Order-independent AVG: exact decimal sum / exact count, divided
    as doubles (one correctly-rounded op → engine-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c).cast("double")


def oracle_dsum(expr: str, scale: int = SCALE) -> str:
    """DuckDB-side twin of :func:`dsum` (same decimal lattice)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = SCALE) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )
