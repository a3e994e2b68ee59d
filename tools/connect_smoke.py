"""Spark Connect smoke: run one query per compat-shim call-site family
under a REAL Connect session and record a probe JSON.

This container cannot run it (no grpcio, installs prohibited — see
docs/probes/connect_smoke.json for the captured failure evidence); on
an unrestricted host:

    pip install 'grpcio>=1.48.1' grpcio-status googleapis-common-protos protobuf
    $SPARK_HOME/sbin/start-connect-server.sh \
        --packages org.apache.spark:spark-connect_2.13:4.1.2
    python tools/connect_smoke.py [sc://localhost:15002] [sf_dir]

The subset covers every compat routing the shim claims to handle:
  q13  — zip_frames boundary cache (semanticHash key) + broadcast shim
  q163 — clustering centroid broadcast
  q78  — featurize modeler parameter broadcast + mapInPandas
  q144 — fingerprint lister (connect_lister binaryFile path)
"""

from __future__ import annotations

import json
import sys
import time

SUBSET = (
    "q13_zip_positional",
    "q163_semdedup",
    "q78_eval_identity",
    "q144_table_fingerprint",
)


def main() -> None:
    remote = sys.argv[1] if len(sys.argv) > 1 else "sc://localhost:15002"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.remote(remote).getOrCreate()
    # prove this is genuinely Connect, not a local fallback
    is_connect = type(spark).__module__.startswith("pyspark.sql.connect")

    from mindseye_dataframes_spark.queries import load_all

    registry = load_all()
    results = {}
    for name in SUBSET:
        t0 = time.perf_counter()
        try:
            n = registry[name].fn(spark, sf_dir).count()
            results[name] = {
                "rows": n,
                "sec": round(time.perf_counter() - t0, 3),
                "err": None,
            }
        except Exception as exc:  # record, keep probing the rest
            results[name] = {
                "rows": None,
                "sec": round(time.perf_counter() - t0, 3),
                "err": f"{type(exc).__name__}: {str(exc)[:300]}",
            }

    probe = {
        "probe": "spark-connect smoke",
        "remote": remote,
        "sf_dir": sf_dir,
        "session_is_connect": is_connect,
        "results": results,
        "ok": is_connect and all(r["err"] is None for r in results.values()),
    }
    out = "docs/probes/connect_smoke_run.json"
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(probe, fh, indent=2)
    print(json.dumps(probe))


if __name__ == "__main__":
    main()
