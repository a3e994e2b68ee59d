"""MERGE INTO (upsert) as a batch relational operator.

Lakehouse-style CDC apply without a table format: one full-outer join
of base against updates on the key, ``coalesce`` picking the update's
value per column, and an action marker (keep/update/insert) so the
caller can audit the delta. This is exactly the reconciliation shape
a 100 TB snapshot-plus-changelog compaction runs; at scale the join
shuffles both sides by key once (AQE handles skewed hot keys), and
when the update set is small Spark's broadcast threshold turns it
into a map-side merge for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_COL = "action"


def merge_upsert(base: DataFrame, updates: DataFrame, on: list[str]) -> DataFrame:
    """Apply ``updates`` over ``base`` keyed by ``on``: matched rows
    take every update column, unmatched update rows are inserts,
    untouched base rows are kept. Update schema must be a subset of
    the base schema (missing non-key columns inherit base values).
    Adds ``action`` ∈ {keep, update, insert}.
    """
    missing = [c for c in updates.columns if c not in base.columns]
    if missing:
        raise ValueError(f"update columns not in base schema: {missing}")
    u = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns]
    )
    cond = [base[k] == u[f"_u_{k}"] for k in on]
    joined = base.join(u, cond, "full_outer")
    u_key, b_key = F.col(f"_u_{on[0]}"), base[on[0]]
    action = (
        F.when(u_key.isNotNull() & b_key.isNotNull(), F.lit("update"))
        .when(b_key.isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    out_cols = []
    for c in base.columns:
        if f"_u_{c}" in u.columns:
            out_cols.append(F.coalesce(F.col(f"_u_{c}"), base[c]).alias(c))
        else:
            out_cols.append(base[c].alias(c))
    return joined.select(*out_cols, action.alias(ACTION_COL))
