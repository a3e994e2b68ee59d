"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``mindseye_dataframes_spark.queries``): one entry per implemented
operator from SURVEY.md §2, each with its DuckDB oracle SQL where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mindseye_dataframes_spark.queries import load_all

FLAGSHIP = "q01_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return load_all()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
