"""Similarity search over embedding columns (north-star §2B ★).

- ``cosine_topk``: exact brute-force top-k — the baseline. Queries are
  broadcast (they're the small side by construction), so the corpus
  never shuffles: scan → per-row k-element heap via window rank.
- ``lsh_signs`` / ``ann_topk_lsh``: random-hyperplane LSH — the scale
  path. Bucket id = sign bits of ``planes · v``; candidates probe only
  their own bucket, turning O(|Q|·|C|) into O(|Q|·|bucket|).

Hyperplanes are derived deterministically from a seed so results are
reproducible and the oracle can inline the same planes as literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mindseye_dataframes_spark.functions.vectors import cosine_ranked, dot


def lsh_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-normal entries)."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_signs(vec: F.Column | str, planes: list[list[float]]) -> F.Column:
    """Bucket id: bit i = 1 iff planes[i]·vec > 0."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(lit_plane, v) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Exact top-k by cosine; rank = (round(cos,9) desc, corpus_id) so
    results are deterministic and engine-comparable."""
    pairs = F.broadcast(queries).crossJoin(corpus)
    scored = pairs.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_ranked(query_vec, corpus_vec).alias("cos_r"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_r").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "cos_r")
    )


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.
    One equi-join on bucket id — no cross product. Recall is tunable
    via n_planes (fewer planes → bigger buckets → higher recall)."""
    probe = corpus.select(F.size(corpus_vec).alias("d")).limit(1).collect()
    if not probe:  # empty corpus → empty result, same as exact top-k
        spark = corpus.sparkSession
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(query_id, queries.schema[query_id].dataType),
                T.StructField("rank", T.IntegerType()),
                T.StructField(corpus_id, corpus.schema[corpus_id].dataType),
                T.StructField("cos_r", T.DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)
    dim = probe[0]["d"]
    planes = lsh_planes(dim, n_planes, seed)
    q = queries.select(
        F.col(query_id), F.col(query_vec), lsh_signs(query_vec, planes).alias("bucket")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(corpus_vec), lsh_signs(corpus_vec, planes).alias("bucket")
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .select(
            F.col(query_id),
            F.col(corpus_id),
            cosine_ranked(query_vec, corpus_vec).alias("cos_r"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_r").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", corpus_id, "cos_r")
    )
