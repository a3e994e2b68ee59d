"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive exact value compare.

We compare EXACTLY (no float tolerance): queries are designed for
engine-exact results (see ``functions/exact.py``), so any drift is a
real determinism bug that would also flip the driver's value-hash.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

from mindseye_dataframes_spark.sources.readers import TABLES


def duckdb_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.isdir(path):
                # Spark-written table = a DIRECTORY of part files
                # (tools/make_benchdata.py output) — DuckDB needs the
                # glob; the driver's single-file drops take the plain
                # path below, unchanged
                path = os.path.join(path, "*.parquet")
            elif not os.path.exists(path):
                continue
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        # The driver fetches oracle results through pandas, where
        # DuckDB HUGEINT (e.g. SUM over integers without an outer
        # CAST) degrades to float64 — fetchall() would hide that by
        # returning exact Python ints. Mirror the degradation so the
        # q25-class of driver-only failures reproduces locally.
        hugeint_cols = {
            r[0]
            for r in con.execute(f"DESCRIBE {sql}").fetchall()
            if r[1].upper() in ("HUGEINT", "UHUGEINT")
        }
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        if hugeint_cols:
            idx = [i for i, c in enumerate(cols) if c in hugeint_cols]
            rows = [
                tuple(
                    float(v) if i in idx and v is not None else v
                    for i, v in enumerate(r)
                )
                for r in rows
            ]
        return cols, rows
    finally:
        con.close()


def _norm(v):
    # int vs float is deliberately NOT unified: the driver's value-hash
    # may distinguish 123 from 123.0, so queries must align dtypes
    # across engines (cast Spark INT ranks to long, floor/ceil to
    # double, DuckDB integer SUMs to BIGINT, …).
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonicalize(cols, rows):
    """Sort columns by name, normalize values, sort rows — the same
    shape the driver hashes."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "query"):
    sp_cols = spark_df.columns
    sp_rows = [tuple(r) for r in spark_df.collect()]
    db_cols, db_rows = duckdb_oracle(oracle_sql, sf_dir)

    sp_cols_c, sp_canon = canonicalize(sp_cols, sp_rows)
    db_cols_c, db_canon = canonicalize(db_cols, db_rows)

    assert sp_cols_c == db_cols_c, (
        f"{name}: column names differ: spark={sp_cols_c} duckdb={db_cols_c}"
    )
    assert len(sp_canon) == len(db_canon), (
        f"{name}: row count differs: spark={len(sp_canon)} duckdb={len(db_canon)}"
    )
    mismatches = [
        (i, s, d) for i, (s, d) in enumerate(zip(sp_canon, db_canon)) if s != d
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(sp_canon)} rows differ; first 3:\n"
        + "\n".join(f"  row {i}:\n    spark : {s}\n    duckdb: {d}" for i, s, d in mismatches[:3])
        + f"\n  (columns: {sp_cols_c})"
    )
