"""Dump the formatted physical plan of named queries to files.

Usage: python tools/dump_plan.py <suffix> <query> [<query> ...]

Writes plans/$PLAN_ROUND/<query>_<suffix>.txt (PLAN_ROUND defaults to
r14) for each query — the optimization-round evidence files
(before/after plan snapshots). Uses the same warm executePlan path as
tools/explain_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mindseye_dataframes_spark.queries import load_all
    from mindseye_dataframes_spark.session import get_session

    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="dump-plan", cpus=8)
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = (
            df.sparkSession._jsparkSession.sessionState()
            .executePlan(
                df._jdf.queryExecution().logical(),
                df._jdf.queryExecution().mode(),
            )
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
