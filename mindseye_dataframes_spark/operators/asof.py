"""As-of (temporal) join — §2B "range/as-of" row.

``asof_join(left, right, ...)``: for every left row, attach the most
recent right row of the same key with ``right.ts <= left.ts``
(backward direction, inclusive — the common market-data semantics and
DuckDB's ``ASOF JOIN`` default).

Implementation is the union-marker pattern, chosen for scale: instead
of a range join (quadratic blowup) or per-key collect, both sides are
unioned with a side marker, one shuffle partitions by key, and a
running ``last(payload_struct, ignorenulls=True)`` over (ts, side)
fills each left row with the latest preceding right payload. The fill
is a single STRUCT — never per-column — so the attached payload is
always one real right row, even when some of its fields are NULL
(independent per-column fills would stitch fields from different
rows). Cost: ONE shuffle of |L|+|R| rows — same as a regular join;
works unchanged on a 1000-executor cluster (per-key data never has to
fit anywhere, the window is streaming within partitions).

Right-side rows that tie on (keys, ts) are resolved by ``tiebreak``
(highest wins) so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join. ``payload`` columns from ``right`` are appended
    (renamed with ``suffix`` when they collide), null when no right row
    precedes. Inclusive: right rows at exactly left_ts match.

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``
    tolerance): a preceding right row older than the bound yields NULL
    payload columns, exactly as if no row preceded. Implemented as a
    post-fill predicate on the matched row's own timestamp (carried
    inside the payload struct), so the plan is unchanged — still ONE
    shuffle, no extra join.
    """
    # Tiebreak (one deterministic winner per (keys, ts)) is folded
    # into the FILL window's ordering instead of a separate
    # row_number-dedup pass: the dedup window partitioned by
    # (keys, ts) while the fill partitions by (keys), so the right
    # side paid a second full exchange + sort just to drop tied rows.
    # Ordering the fill by (ts, side, tiebreak) makes the running
    # ``last()`` see the max-tiebreak right row as the LAST row of any
    # tied group — every left row (side=1 sorts after all side=0 rows
    # at equal ts) therefore fills with exactly the row the dedup
    # used to keep. One exchange total, unchanged output (nulls lose
    # the tie in both forms: asc-nulls-first here, desc-nulls-last in
    # the old rank).
    r = right

    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    payload_fields = [F.col(c).alias(out_names[c]) for c in payload]
    if tolerance_seconds is not None:
        # the matched row's own ts rides inside the struct so the
        # staleness bound is checked against the ACTUAL filled row
        payload_fields.append(F.col(right_ts).alias("_asof_matched_ts"))
    payload_struct = F.struct(*payload_fields)
    struct_type = r.select(payload_struct.alias("_asof_payload")).schema[
        "_asof_payload"
    ].dataType

    tie_cols_l: list = []
    tie_cols_r: list = []
    order_cols = ["_asof_ts", "_asof_side"]
    if tiebreak is not None:
        tie_type = r.schema[tiebreak].dataType
        tie_cols_l = [F.lit(None).cast(tie_type).alias("_asof_tie")]
        tie_cols_r = [F.col(tiebreak).alias("_asof_tie")]
        order_cols = ["_asof_ts", "_asof_side", "_asof_tie"]
    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *tie_cols_l,
        F.lit(None).cast(struct_type).alias("_asof_payload"),
    )
    r_marked = r.select(
        *[F.col(k) for k in on],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *tie_cols_r,
        payload_struct.alias("_asof_payload"),
    ).select(
        *left.columns, "_asof_ts", "_asof_side",
        *(["_asof_tie"] if tiebreak is not None else []),
        "_asof_payload",
    )

    unioned = l_marked.unionByName(r_marked)
    # right rows (side=0) sort before left rows at equal ts → inclusive;
    # tied right rows sort ascending by tiebreak so the running last()
    # lands on the highest; the whole payload struct fills atomically
    # (one real right row)
    fill = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left.columns,
        "_asof_side",
        F.last("_asof_payload", ignorenulls=True).over(fill).alias("_asof_payload"),
    )
    out = filled.filter(F.col("_asof_side") == 1)
    if tolerance_seconds is not None:
        fresh = F.unix_micros(F.col(left_ts)) - F.unix_micros(
            F.col("_asof_payload._asof_matched_ts")
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
        return out.select(
            *left.columns,
            *[
                F.when(fresh, F.col(f"_asof_payload.{out_names[c]}"))
                .alias(out_names[c])
                for c in payload
            ],
        )
    return out.select(
        *left.columns,
        *[F.col(f"_asof_payload.{out_names[c]}").alias(out_names[c]) for c in payload],
    )
