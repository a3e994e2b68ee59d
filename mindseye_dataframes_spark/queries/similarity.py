"""Similarity-search queries (north-star ★): exact cosine top-k and
the LSH-bucketed approximate variant, both deterministic (rank by
rounded score with id tiebreak — see functions/vectors.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    lsh_planes,
)
from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_N_QUERIES = 10
_K = 5


@query(
    "q35_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, e.v), 9) AS cos_r,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(q.v, e.v), 9) DESC,
                                         e.vec_id) AS rank
      FROM q, e
    )
    SELECT query_id, rank, neighbor_id, cos_r
    FROM scored WHERE rank <= {_K}
    ORDER BY query_id, rank
    """,
    tags=("similarity", "parity:cosine-topk"),
    bench=True,
)
def q35_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return cosine_topk(
        queries, corpus, "query_id", "qv", "neighbor_id", "cv", _K
    ).orderBy("query_id", "rank")


def _planes_sql(planes: list[list[float]]) -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in planes
    )
    return f"[{rows}]"


def _ann_oracle() -> str:
    planes = lsh_planes(64, n_planes=8, seed=42)
    terms = []
    for i in range(8):
        plane = "[" + ", ".join(repr(x) for x in lsh_planes(64, 8, 42)[i]) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({plane}::DOUBLE[], v) > 0 THEN {2**i} ELSE 0 END"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    hashed AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    q AS (SELECT vec_id, v, bucket FROM hashed WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.v, c.v), 9) AS cos_r,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(q.v, c.v), 9) DESC,
                                         c.vec_id) AS rank
      FROM q JOIN hashed c USING (bucket)
    )
    SELECT query_id, rank, neighbor_id, cos_r
    FROM scored WHERE rank <= 3
    ORDER BY query_id, rank
    """


@query(
    "q36_ann_lsh_topk",
    oracle=_ann_oracle(),
    tags=("similarity", "parity:ann-lsh"),
)
def q36_ann_lsh_topk(spark, sf_dir):
    """Approximate top-3 via random-hyperplane LSH (8 planes, seed 42).
    The oracle inlines the identical plane literals, so the candidate
    sets — and therefore results — match exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return ann_topk_lsh(
        queries, corpus, "query_id", "qv", "neighbor_id", "cv", k=3,
        n_planes=8, seed=42,
    ).orderBy("query_id", "rank")
