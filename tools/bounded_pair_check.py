"""Aggregate-checksum parity for OUTPUT-BOUND pair queries at big SF.

q120 (SimHash hamming pairs) emits ~N^2/2^16 qualifying pairs once the
corpus dwarfs its 16-bit fingerprint space — ~6.5e8 rows at sf1. The
standard sweep comparison collects the full result to the driver and
dies on spark.driver.maxResultSize (the round-8 sf1 sweep recorded that
honestly: docs/probes/sweep_sf1_0_53.json). The ENGINE path is fine —
candidate generation is an equi-join on (band, value) — so what needs
sf1 evidence is the VALUES, not the materialization. This probe reduces
the identical pair relation to order-insensitive aggregates in BOTH
engines and compares those:

    n_pairs                         exact cardinality
    sum_hamming                     catches any verify-stage drift
    checksum = SUM(md5_32(id_a:id_b:hamming))   (2^32 buckets)
                                    order-insensitive value digest; any
                                    changed/missing/extra pair moves it

Driver state is O(1); Spark runs one partial+final aggregate; DuckDB
replays the same relation + digest. 2^32 buckets keep the BIGINT sum
exact for any corpus under ~2^31 pairs (6.5e8 * 2^32 ~= 2^61.4 < 2^63
— the repo's overflow-ceiling discipline; the first attempt used 2^40
buckets and Spark's sum overflowed at ~7e20, exactly the failure class
this ceiling exists to prevent).

Usage:  python tools/bounded_pair_check.py [sf_dir]
Writes docs/probes/bounded_pairs_<sfname>.json; exits non-zero on any
mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mindseye_dataframes_spark.queries import load_all

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "24")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("bounded-pair-check")
        .getOrCreate()
    )
    reg = load_all()

    # one order-insensitive digest expression, same math both engines:
    # md5 of 'id_a:id_b:hamming' -> first 8 hex chars -> BIGINT (2^32)
    def spark_aggs(df):
        digest = F.expr(
            "CAST(conv(substr(md5(concat_ws(':', id_a, id_b, hamming)), 1, 8),"
            " 16, 10) AS BIGINT)"
        )
        return df.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("hamming").alias("sum_hamming"),
            F.sum(digest).alias("checksum"),
        ).collect()[0]

    oracle_agg_sql = """
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(hamming) AS BIGINT) AS sum_hamming,
           CAST(sum(CAST(('0x' || substr(md5(id_a || ':' || id_b || ':' || hamming), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
    FROM pairs
    """

    name = "q120_simhash_hamming_pairs"
    t0 = time.time()
    srow = spark_aggs(reg[name].fn(spark, sf_dir))
    t_spark = round(time.time() - t0, 1)
    print(f"spark {name}: {srow} ({t_spark}s)", flush=True)

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    doc_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_path):
        # Spark-written table = a DIRECTORY of part files (the
        # tools/make_benchdata.py layout) — DuckDB needs the glob
        doc_path = os.path.join(doc_path, "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_path}')"
    )
    t0 = time.time()
    # the registered oracle ends with ORDER BY id_a, id_b — irrelevant
    # under aggregation and a 6.5e8-row sort on the DuckDB side
    pair_sql = reg[name].oracle.rsplit("ORDER BY", 1)[0]
    orow = con.execute(
        f"WITH pairs AS ({pair_sql}) {oracle_agg_sql}"
    ).fetchone()
    t_duck = round(time.time() - t0, 1)
    print(f"duckdb {name}: {orow} ({t_duck}s)", flush=True)

    got = (int(srow["n_pairs"]), int(srow["sum_hamming"]), int(srow["checksum"]))
    want = (int(orow[0]), int(orow[1]), int(orow[2]))
    ok = got == want
    out = {
        "sf_dir": sf_dir,
        "query": name,
        "spark": {"n_pairs": got[0], "sum_hamming": got[1], "checksum": got[2],
                  "sec": t_spark},
        "duckdb": {"n_pairs": want[0], "sum_hamming": want[1], "checksum": want[2],
                   "sec": t_duck},
        "match": ok,
    }
    sfname = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(repo, "docs", "probes", f"bounded_pairs_{sfname}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("WROTE", path, "MATCH" if ok else "MISMATCH", flush=True)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
