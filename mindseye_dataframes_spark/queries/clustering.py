"""q140: engine-exact distributed K-means (2 Lloyd iterations).

The iterative-ML capstone: both engines replay the SAME two
iterations bit-for-bit — deterministic modulo-cell init (q60's
quantizer), squared-L2 assignment as an identical left fold
(q90's pairing), and exact integer-micros centroid means (q114's
pattern). The oracle is the full SQL derivation of both iterations,
so the driver hash-checks an iterative algorithm end-to-end —
not just its final shape.

Scale: per iteration, centroids are O(k·d) driver-side parameters,
assignment is a narrow literal-expression map (zero shuffle), and the
means recompute is one hash-aggregate. Row data never moves except
through that single aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_K = 8

_L2 = (
    "round(list_reduce(list_transform(range(1, len({x}) + 1),"
    " i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])), (a, b) -> a + b), 9)"
)


def _kmeans_oracle() -> str:
    d1 = _L2.format(x="e.v", c="c.v")
    d2 = _L2.format(x="e.v", c="c2.v")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    init AS (
      SELECT CAST(vec_id % {_K} AS INT) AS cell, v FROM (
        SELECT vec_id, v,
               row_number() OVER (PARTITION BY vec_id % {_K} ORDER BY vec_id) AS rn
        FROM e) WHERE rn = 1),
    a1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d1}, c.cell) AS rn
        FROM e CROSS JOIN init c) WHERE rn = 1),
    x AS (
      SELECT cell, CAST(d.dim AS INT) AS dim,
             CAST(round(v[CAST(d.dim AS INT) + 1] * 1000000) AS BIGINT) AS x6
      FROM a1, LATERAL (SELECT unnest(generate_series(0, len(v) - 1)) AS dim) d),
    c2 AS (
      SELECT cell, list(mu ORDER BY dim) AS v FROM (
        SELECT cell, dim,
               CAST(sum(x6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mu
        FROM x GROUP BY cell, dim) GROUP BY cell),
    a2 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c2.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c2.cell) AS rn
        FROM e CROSS JOIN c2) WHERE rn = 1)
    SELECT CAST(cell AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min(vec_id) AS min_vec, max(vec_id) AS max_vec
    FROM a2 GROUP BY cell ORDER BY cluster_id
    """


@query(
    "q140_kmeans_clusters",
    oracle=_kmeans_oracle(),
    tags=("vector", "clustering", "iterative", "north-star"),
)
def q140_kmeans_clusters(spark, sf_dir):
    from mindseye_dataframes_spark.operators.clustering import kmeans_fit_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_assign(emb, "vec_id", "embedding", k=_K, iters=2)
    return (
        assigned.groupBy(F.col("_cell").cast("long").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )
        .orderBy("cluster_id")
    )
