"""Map-typed columns + engine-exact statistical aggregates.

q73: MapType construction (`map_from_entries`) and extraction
(`map_keys`/`map_values`) — the map column itself is built in Spark;
the comparison emits its sorted key/value arrays because DuckDB's
client renders MAP values in a different physical shape.

q74: variance / stddev / covariance / correlation derived from exact
decimal moments (count, Σx, Σx², Σxy — the same moment vector the
reference aggregates in `DataframeModeler.scala:84-100`), then
combined in float with an expression written identically in both
engines. Column pairs are chosen so every decimal sum keeps its
unscaled value < 2^53 (see ``functions/exact.py``): quantity and
discount, not extendedprice whose squared sum would overflow the
single-rounding bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table


@query(
    "q73_map_column",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY event_type), ',') AS type_keys,
           array_to_string(list(n ORDER BY event_type), ',') AS type_counts
    FROM c GROUP BY user_id ORDER BY user_id
    """,
    tags=("types", "parity:map-column"),
)
def q73_map_column(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    # arrays serialize to CSV strings: the driver's canonicalizer
    # lexsorts column values and cannot factorize python lists
    return mapped.select(
        "user_id",
        F.array_join(F.map_keys("m"), ",").alias("type_keys"),
        F.array_join(
            F.transform(F.map_values("m"), lambda x: x.cast("string")), ","
        ).alias("type_counts"),
    ).orderBy("user_id")


# identical float combination in both engines: exact decimal moments
# in, deterministic double expression out
_MOMENTS = dict(
    n="CAST(COUNT(*) AS DOUBLE)",
    sx="CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)",
    sxx="CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)",
    sy="CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)",
    syy="CAST(SUM(CAST(l_discount AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE)",
    sxy="CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE)",
)

_STATS_EXPRS = [
    "CAST(COUNT(*) AS BIGINT) AS n",
    "({sx} / {n}) AS mean_qty",
    "(({sxx} - (({sx} * {sx}) / {n})) / {n}) AS var_pop_qty",
    "sqrt((({sxx} - (({sx} * {sx}) / {n})) / {n})) AS std_qty",
    "(({sxy} - (({sx} * {sy}) / {n})) / {n}) AS covar_pop_qd",
    "((({sxy} - (({sx} * {sy}) / {n})) / {n})"
    " / (sqrt((({sxx} - (({sx} * {sx}) / {n})) / {n}))"
    "    * sqrt((({syy} - (({sy} * {sy}) / {n})) / {n})))) AS corr_qd",
]


def _stats_select() -> str:
    return ",\n           ".join(e.format(**_MOMENTS) for e in _STATS_EXPRS)


@query(
    "q74_exact_stats",
    oracle=f"""
    SELECT l_returnflag,
           {_stats_select()}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "parity:var-std-covar-corr"),
)
def q74_exact_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(*[F.expr(e.format(**_MOMENTS)) for e in _STATS_EXPRS])
        .orderBy("l_returnflag")
    )
