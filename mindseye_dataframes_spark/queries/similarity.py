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


_IVF_CELLS = 16
_IVF_PROBE = 4


def _ivf_oracle(base_pred: str = "TRUE", live_pred: str | None = None) -> str:
    """DuckDB twin of ann_topk_ivf: same modulo centroids, same rounded
    cosine assignment with (sim desc, cell asc) tie-break.
    ``base_pred`` restricts which corpus rows DERIVE the coarse
    quantizer (q204's incremental story: centroids come from the
    standing base, late arrivals only get assigned) — assignment and
    probing always run over the full corpus. ``live_pred`` (over alias
    ``a``, the assigned corpus row) drops rows from the SCORED side
    only (q209's tombstone story: deleted vectors stop being
    neighbors, but the quantizer and the probe routing are untouched);
    None renders byte-identically to the pre-delete oracle."""
    sim = "round(list_cosine_similarity({a}, {b}), 9)"
    live_filter = f"WHERE {live_pred}" if live_pred else ""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cells AS (
      SELECT CAST(vec_id % {_IVF_CELLS} AS INT) AS cell, v
      FROM (
        SELECT vec_id, v,
               row_number() OVER (PARTITION BY vec_id % {_IVF_CELLS} ORDER BY vec_id) AS rn
        FROM e WHERE {base_pred}
      ) WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sim.format(a='e.v', b='c.v')} DESC, c.cell) AS arn
        FROM e CROSS JOIN cells c
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT vec_id, v, cell FROM (
        SELECT q.vec_id, q.v, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sim.format(a='q.v', b='c.v')} DESC, c.cell) AS prn
        FROM e q CROSS JOIN cells c WHERE q.vec_id < {_N_QUERIES}
      ) WHERE prn <= {_IVF_PROBE}
    ),
    scored AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             {sim.format(a='p.v', b='a.v')} AS cos_r,
             row_number() OVER (PARTITION BY p.vec_id
                                ORDER BY {sim.format(a='p.v', b='a.v')} DESC, a.vec_id) AS rank
      FROM probes p JOIN assign a USING (cell) {live_filter}
    )
    SELECT query_id, rank, neighbor_id, cos_r FROM scored WHERE rank <= {_K}
    ORDER BY query_id, rank
    """


@query(
    "q60_ann_ivf_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "parity:ann-ivf"),
)
def q60_ann_ivf_topk(spark, sf_dir):
    """IVF-Flat approximate top-k: 16 deterministic coarse cells, each
    query probes its 4 nearest cells. The corpus-side cell assignment
    is a narrow map (no shuffle); the probe join is an equi-join on
    cell id — the scale path when the corpus is too big to broadcast
    against (complements the LSH variant in q36)."""
    from mindseye_dataframes_spark.operators.similarity import ann_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    return ann_topk_ivf(
        queries, corpus, "query_id", "qv", "neighbor_id", "cv", k=_K,
        n_centroids=_IVF_CELLS, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


@query(
    "q114_embedding_normalize",
    oracle="""
    WITH x AS (
      SELECT vec_id, label, CAST(d.dim AS INT) AS dim,
             CAST(round(CAST(list_extract(embedding, CAST(d.dim AS INT) + 1)
                             AS DOUBLE) * 1000000) AS BIGINT) AS x6
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim) d),
    stats AS (
      SELECT label, dim,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x6) AS DOUBLE) AS s,
             CAST(sum(x6 * x6) AS DOUBLE) AS q
      FROM x GROUP BY label, dim),
    m AS (
      SELECT label, dim, n,
             s / n / 1000000.0 AS mu,
             sqrt(greatest(q / n / 1000000000000.0
                           - (s / n / 1000000.0) * (s / n / 1000000.0), 0)) AS sigma
      FROM stats)
    SELECT x.vec_id, x.label, x.dim,
           CASE WHEN m.sigma > 0
                THEN round((CAST(x.x6 AS DOUBLE) / 1000000.0 - m.mu) / m.sigma, 4) + 0.0
                ELSE 0.0 END AS z
    FROM x JOIN m ON x.label = m.label AND x.dim = m.dim
    ORDER BY x.vec_id, x.dim
    """,
    tags=("vector", "normalize", "north-star"),
)
def q114_embedding_normalize(spark, sf_dir):
    """Per-label, per-dimension z-score normalization of embeddings —
    the feature-standardization pass a training pipeline runs before
    mixing corpora. Engine-exact by construction: inputs quantized to
    integer micros (round-half-away, identical both engines), moments
    accumulated as exact BIGINT sums (|Σx6²| < 2^53 at this scale),
    and the μ/σ/z arithmetic written as the same IEEE double sequence
    on both sides, final round(4). One explode (narrow), one
    hash-aggregate over (label, dim), one broadcast-sized stats join
    — at 100 TB the stats side is always tiny (labels × dims)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "xf"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.round(F.col("xf").cast("double") * 1_000_000).cast("long").alias("x6"),
    )
    stats = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x6").cast("double").alias("s"),
        F.sum(F.col("x6") * F.col("x6")).cast("double").alias("q"),
    )
    mu = F.col("s") / F.col("n") / 1e6
    m = stats.select(
        "label",
        "dim",
        mu.alias("mu"),
        F.sqrt(F.greatest(F.col("q") / F.col("n") / 1e12 - mu * mu, F.lit(0.0))).alias(
            "sigma"
        ),
    )
    return (
        x.join(F.broadcast(m), ["label", "dim"])
        .select(
            "vec_id",
            "label",
            "dim",
            F.when(
                F.col("sigma") > 0,
                # + 0.0 normalizes IEEE -0.0 to +0.0 (Spark's round emits
                # -0.0 for tiny negative z where DuckDB emits +0.0; the
                # driver's value-hash distinguishes the sign bit).
                F.round(
                    (F.col("x6").cast("double") / 1e6 - F.col("mu")) / F.col("sigma"),
                    4,
                )
                + F.lit(0.0),
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
        .orderBy("vec_id", "dim")
    )


def pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN (operators/pq.py): top-10 neighbors
    for the first 10 vectors against the rest of the corpus via
    asymmetric code-distance — the memory-bound third leg of the ANN
    surface (LSH q36, IVF q60).

    Formerly registered as ``q157_pq_ann_topk`` with a rows-only
    check; retired from the registry in round 8 (VERDICT r7 item 7)
    because a top-k LIST over Lloyd codebooks can never carry a hashed
    oracle, and its quality contract is exactly what q162 already
    gates (recall@10 ≥ 0.8 vs exact L2 over the SAME split, SAME
    ``pq_topk_rerank`` call). The surface stays callable here and is
    recall-pinned in tests/test_sketches.py; every registry entry is
    now oracle-bearing."""
    from mindseye_dataframes_spark.operators.pq import pq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    # 32 two-dim sub-quantizers: these embeddings are near-isotropic
    # (PQ's hardest case), so recall needs fine subspaces — measured
    # 0.11 at m=4, 0.62-0.65 at m=32 (recall@10, code distance only)
    # — and the code estimator alone still DEGRADES with corpus size
    # (0.42 at a 2k corpus), so the query runs the production ADC+R
    # shape: 80-candidate PQ shortlist, exact re-rank (recall@10
    # ≥ 0.9 at every test SF — the sf0.1 sweep that caught the
    # degradation is recorded in README)
    return pq_topk_rerank(
        queries, corpus, "q_id", "q_vec", "c_id", "c_vec", dim=64, k=10, m=32
    ).orderBy("q_id", "rank")


@query(
    "q162_pq_recall",
    oracle="""
    SELECT CAST(10 AS INT) AS k,
           CAST(10 AS BIGINT) AS n_queries,
           CAST(true AS BOOLEAN) AS recall_ok
    """,
    tags=("vector", "ann", "pq", "quality"),
)
def q162_pq_recall(spark, sf_dir):
    """ANN quality as a driver-visible row (VERDICT r4 item 4), and —
    since round 8 — the PQ family's ONLY registry entry: the former
    q157 top-k query is folded in here (VERDICT r7 item 7; its list
    output could never carry an oracle, and this gate runs the same
    ``pq_topk_rerank`` call over the same split, so a PQ regression
    that would have garbled q157's lists flips this row red). The
    top-k surface itself stays callable as ``pq_ann_topk`` above. The
    gate: recall@10 of the PQ top-10 against the EXACT distributed L2
    top-10 over the same query/corpus split, reduced to a boolean gate
    (avg recall ≥ 0.5, the bound tests/test_sketches.py pins at both
    SFs — measured 0.62-0.65). The recall computation itself is not
    SQL-expressible (Lloyd codebooks), so the oracle is the constant
    the gate must produce; a PQ quality regression flips recall_ok and
    the driver row goes red, exactly like a correctness failure.
    Gate raised to 0.8 in round 6: the code-distance-only path this
    query originally gated degraded with corpus size (0.42 avg recall
    at sf0.1 — caught by the round-6 full-parity sweep at sf0.1), so
    both q157 and this gate now run the ADC+R re-ranked path
    (operators/pq.py:pq_topk_rerank), measured 1.0 / 0.98 / 0.94 at
    sf0.001/0.01/0.1.

    The exact baseline is q35-shaped: broadcast the 10 queries, scan
    the corpus once unshuffled, L2² per pair via a JVM fold, per-query
    WindowGroupLimit top-10 — no collect of row data anywhere."""
    from mindseye_dataframes_spark.operators.pq import pq_topk_rerank
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    k = 10

    pq = pq_topk_rerank(
        queries, corpus, "q_id", "q_vec", "c_id", "c_vec", dim=64, k=k, m=32
    ).select("q_id", "c_id")

    from mindseye_dataframes_spark.functions.vectors import l2_sq

    d2 = l2_sq("q_vec", "c_vec")
    w = Window.partitionBy("q_id").orderBy(F.round(d2, 9).asc(), F.col("c_id"))
    exact = (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("q_id", "c_id")
    )

    hits = exact.join(pq, ["q_id", "c_id"], "inner").groupBy("q_id").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    per_query = exact.select("q_id").distinct().join(hits, "q_id", "left").select(
        "q_id", (F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(k)).alias("_recall")
    )
    return per_query.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("_recall") >= F.lit(0.8)).alias("recall_ok"),
    )


@query(
    "q172_label_centroid_similarity",
    oracle="""
    WITH x AS (
      SELECT label, CAST(d.dim AS INT) AS dim,
             CAST(round(CAST(list_extract(embedding, CAST(d.dim AS INT) + 1)
                             AS DOUBLE) * 1000000) AS BIGINT) AS x6
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim) d),
    c AS (
      SELECT label, list(mu ORDER BY dim) AS v FROM (
        SELECT label, dim,
               CAST(sum(x6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mu
        FROM x GROUP BY label, dim) GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           round(list_cosine_similarity(a.v, b.v), 9) AS cos_r
    FROM c a JOIN c b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
    tags=("similarity", "vector", "ml-features", "north-star"),
)
def q172_label_centroid_similarity(spark, sf_dir):
    """Class-separability diagnostic in embedding space: the cosine
    between every pair of per-label centroids — labels whose centroids
    sit close are the ones a classifier (or a dedup threshold tuned
    per class) will confuse. Centroid means use the q114/q140
    integer-micros pattern (BIGINT sums, one double divide), so the
    centroids — and the rounded pairwise cosines — are bit-identical
    on both engines.

    Scale: one (label, dim) hash-aggregate over the corpus; the
    centroid frame is |labels| rows, so the pairwise join is
    broadcast-trivial and everything downstream is parameters, not
    data."""
    from mindseye_dataframes_spark.functions.vectors import cosine_ranked

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "label",
        "dim",
        F.round(F.col("xf").cast("double") * 1_000_000).cast("long").alias("x6"),
    )
    c = (
        x.groupBy("label", "dim")
        .agg(
            (
                F.sum("x6").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1e6
            ).alias("mu")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mu")))
                ),
                lambda s: s["mu"],
            ).alias("v")
        )
    )
    a = c.select(F.col("label").alias("label_a"), F.col("v").alias("va"))
    b = c.select(F.col("label").alias("label_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b", cosine_ranked("va", "vb").alias("cos_r")
        )
        .orderBy("label_a", "label_b")
    )


_KNN_N_EVAL = 200
_KNN_K = 10


@query(
    "q184_knn_label_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings),
    q AS (SELECT vec_id, v, label FROM e WHERE vec_id < {_KNN_N_EVAL}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.label AS n_label,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(q.v, c.v), 9) DESC,
                                         c.vec_id) AS rank
      FROM q JOIN e c ON c.vec_id <> q.vec_id
    ),
    votes AS (
      SELECT query_id, true_label, n_label, CAST(COUNT(*) AS BIGINT) AS v
      FROM scored WHERE rank <= {_KNN_K} GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT query_id, true_label, n_label AS pred_label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY v DESC, n_label) AS r
      FROM votes
    )
    SELECT true_label,
           COUNT(*) AS n_eval,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS accuracy_ppm
    FROM pred WHERE r = 1 GROUP BY true_label ORDER BY true_label
    """,
    tags=("similarity", "ml-eval", "parity:knn-eval"),
)
def q184_knn_label_eval(spark, sf_dir):
    """Embedding-quality evaluation by kNN label vote — the standard
    "are these embeddings any good" probe a curation pipeline runs
    before trusting them for SemDeDup/clustering: for each vector in
    a bounded eval split, take the 10 nearest non-self neighbors by
    exact cosine (the q35 scoring contract: round(cos, 9) with
    neighbor-id tiebreak), majority-vote their labels (tie → smallest
    label id), and report per-class accuracy in exact integer ppm.

    Scale shape: the eval split is O(eval) rows and BROADCASTS to the
    corpus, which is scanned once and scored in codegen (q35's
    contract), and the scored tuples pass through the Arrow-batched
    partition-local prune (``cosine_topk_pruned``) so the global rank
    window shuffles ≤ |eval|·k rows per partition instead of
    |eval|·|C| — the exact-top-k shape that survives a 100 TB corpus.
    Neighbor labels join AFTER top-k as a broadcast of the eval-sized
    result against the corpus scan (corpus never shuffles); the vote
    and per-class rollup are O(eval · k). For a corpus-sized query
    set even this is wrong by construction — use the bucketed ANN
    operators (q36/q60) whose candidate sets are bounded per query.
    """
    from pyspark.sql import Window

    from mindseye_dataframes_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_N_EVAL).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    # BLAS candidate generation + exact cosine_ranked re-verify
    # (cosine_topk_gemm, r14): bit-identical to the old pruned path —
    # equality property-pinned — with the |eval|·|C| interpreted fold
    # tree replaced by one matrix multiply per Arrow batch; the
    # self-exclusion pair filter is the tag pair (shared id space)
    top = cosine_topk_gemm(
        q,
        c,
        "query_id",
        "qv",
        "neighbor_id",
        "cv",
        _KNN_K,
        q_tag="query_id",
        c_tag="neighbor_id",
    )
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    true_l = emb.filter(F.col("vec_id") < _KNN_N_EVAL).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    top_l = labels.join(F.broadcast(top), "neighbor_id").join(
        F.broadcast(true_l), "query_id"
    )
    votes = top_l.groupBy("query_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("v")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("n_label")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w_vote))
        .filter(F.col("r") == 1)
        .select("true_label", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .withColumn("accuracy_ppm", F.expr("n_correct * 1000000 DIV n_eval"))
        .orderBy("true_label")
    )


def ann_standing_index(spark, sf_dir):
    """The one-time corpus pass of the standing ANN index (see q192's
    docstring): centroid selection + per-vector cell assignment,
    published/looked-up as two standing tables. Returns ``(cents,
    postings)`` where cents is the O(cells) driver-side centroid list
    and postings is the cell-bucketed DataFrame ``(_cell, neighbor_id,
    cv)``; shared by q192 and the q199 hybrid fusion."""
    import hashlib
    import os

    from mindseye_dataframes_spark.operators.similarity import (
        ivf_centroids,
        _nearest_cells,
    )
    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    fp = dataset_fingerprint(os.path.join(real, "embeddings.parquet"))

    def build_cents():
        cents = ivf_centroids(emb, "vec_id", "embedding", _IVF_CELLS)
        return spark.createDataFrame(
            [(c, v) for c, v in cents], "cell int, v array<double>"
        )

    cents_tbl = standing_table(
        spark, f"msdf_stage_ivfcents_{loc}", fp, build_cents, ["cell"], 1
    )
    cents = sorted(
        (int(r["cell"]), [float(x) for x in r["v"]]) for r in cents_tbl.collect()
    )

    def build_postings():
        return emb.select(
            _nearest_cells("embedding", cents, 1)[0].alias("_cell"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        )

    postings = standing_table(
        spark,
        f"msdf_stage_ivfpost_{loc}",
        fp,
        build_postings,
        ["_cell"],
        16,
        ["_cell", "neighbor_id"],
    )
    return cents, postings


@query(
    "q192_standing_ann_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "lakehouse", "parity:ann-standing"),
)
def q192_standing_ann_topk(spark, sf_dir):
    """q60's IVF-Flat top-k answered from a CROSS-SESSION STANDING
    INDEX: the corpus-side work — centroid selection and the
    per-vector cell assignment, the only passes that touch every
    corpus row — is published once as two standing tables (a k-row
    centroid table and the posting list bucketed by cell,
    ``sources/bucketing.py:standing_table``, corpus-fingerprint
    invalidation), and every later session answers top-k queries by
    reading the postings straight from their bucketed files: zero raw
    corpus scans, zero assignment recompute, and the probe equi-join
    lands on a table already hash-clustered by its join key. The
    oracle is IDENTICAL to q60's — storage must never change the
    answer. This is how a 100 TB embedding corpus actually serves
    ANN: build the index once, refresh on ingest (fingerprint), probe
    forever."""
    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents, postings = ann_standing_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_topk_ivf_postings(
        queries, postings, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_K, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


_HN_N_ANCHORS = 200
_HN_K = 10


@query(
    "q194_hard_negative_mining",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings),
    a AS (SELECT vec_id, v, label FROM e WHERE vec_id < {_HN_N_ANCHORS}),
    scored AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS neighbor_id, c.label AS neg_label,
             round(list_cosine_similarity(a.v, c.v), 9) AS cos_r,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round(list_cosine_similarity(a.v, c.v), 9) DESC,
                                         c.vec_id) AS rank
      FROM a JOIN e c ON c.label <> a.label
    )
    SELECT anchor_id, anchor_label, rank, neighbor_id, neg_label, cos_r
    FROM scored WHERE rank <= {_HN_K}
    ORDER BY anchor_id, rank
    """,
    tags=("similarity", "ml-train", "parity:hard-negatives"),
)
def q194_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training — for each
    anchor in a bounded anchor set, the k corpus vectors MOST cosine-
    similar to it that carry a DIFFERENT label: exactly the negatives
    a contrastive/embedding fine-tune wants in its batches (easy
    negatives teach nothing; these sit right at the decision
    boundary). The label-mismatch predicate is applied BEFORE ranking
    (``pair_filter``) — filtering a top-(k+m) afterwards would
    under-fill anchors whose neighborhoods are positive-dense.

    Scale shape: identical to q184 — anchors broadcast with their
    labels riding along, the corpus is scanned once and scored in
    codegen, the label predicate drops pairs pre-rank, and the
    Arrow-batched partition-local prune (``cosine_topk_pruned``)
    bounds the rank window's shuffle to ≤ |anchors|·k rows per
    partition. Anchor/negative labels re-attach AFTER top-k as
    broadcast joins of the O(|anchors|·k) result — the corpus never
    shuffles and nothing driver-side scales with |corpus|."""
    from mindseye_dataframes_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _HN_N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("av"),
        F.col("label").alias("a_label"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("c_label"),
    )
    # BLAS candidate generation + exact cosine_ranked re-verify
    # (cosine_topk_gemm, r14; equality property-pinned): the label-
    # mismatch predicate is the tag pair, applied pre-rank exactly as
    # the old pair_filter was
    top = cosine_topk_gemm(
        anchors,
        corpus,
        "anchor_id",
        "av",
        "neighbor_id",
        "cv",
        _HN_K,
        q_tag="a_label",
        c_tag="c_label",
    )
    neg_l = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("neg_label")
    )
    anchor_l = emb.filter(F.col("vec_id") < _HN_N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
    )
    return (
        neg_l.join(F.broadcast(top), "neighbor_id")
        .join(F.broadcast(anchor_l), "anchor_id")
        .select(
            "anchor_id", "anchor_label", "rank", "neighbor_id",
            "neg_label", "cos_r",
        )
        .orderBy("anchor_id", "rank")
    )


_RRF_NQ = 3      # fused query ids 0..2 — the q193 BM25 query set's ids
_RRF_DEPTH = 10  # per-system retrieve depth feeding the fusion
_RRF_K = 5
_RRF_C = 60      # the standard RRF constant


def _rrf_oracle() -> str:
    from mindseye_dataframes_spark.queries.text import _BM25_CORE_SQL

    sim = "round(list_cosine_similarity({a}, {b}), 9)"
    return f"""
    WITH {_BM25_CORE_SQL},
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cells AS (
      SELECT CAST(vec_id % {_IVF_CELLS} AS INT) AS cell, v
      FROM (
        SELECT vec_id, v,
               row_number() OVER (PARTITION BY vec_id % {_IVF_CELLS} ORDER BY vec_id) AS rn
        FROM e
      ) WHERE rn = 1
    ),
    assign AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sim.format(a='e.v', b='c.v')} DESC, c.cell) AS arn
        FROM e CROSS JOIN cells c
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT vec_id, v, cell FROM (
        SELECT q.vec_id, q.v, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sim.format(a='q.v', b='c.v')} DESC, c.cell) AS prn
        FROM e q CROSS JOIN cells c WHERE q.vec_id < {_RRF_NQ}
      ) WHERE prn <= {_IVF_PROBE}
    ),
    ann_ranked AS (
      SELECT p.vec_id AS query_id, a.vec_id AS doc_id,
             row_number() OVER (PARTITION BY p.vec_id
                                ORDER BY {sim.format(a='p.v', b='a.v')} DESC, a.vec_id) AS ann_rank
      FROM probes p JOIN assign a USING (cell)
    ),
    u AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, bm_rank AS r
      FROM bm_ranked WHERE bm_rank <= {_RRF_DEPTH}
      UNION ALL
      SELECT CAST(query_id AS BIGINT), doc_id, ann_rank
      FROM ann_ranked WHERE ann_rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(1000000 // ({_RRF_C} + r)) AS BIGINT) AS rrf_ppm,
             CAST(COUNT(*) AS BIGINT) AS n_systems
      FROM u GROUP BY query_id, doc_id
    )
    SELECT query_id, rank, doc_id, rrf_ppm, n_systems FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_ppm DESC, doc_id) AS rank
      FROM fused) WHERE rank <= {_RRF_K}
    ORDER BY query_id, rank
    """


@query(
    "q199_hybrid_rrf_retrieval",
    oracle=_rrf_oracle(),
    tags=("similarity", "retrieval", "lakehouse", "parity:hybrid-rrf"),
)
def q199_hybrid_rrf_retrieval(spark, sf_dir):
    """HYBRID retrieval — reciprocal-rank fusion of the two standing
    indexes: each query runs (a) lexically against the standing BM25
    inverted index (q193's term sets, depth 10) and (b) semantically
    against the standing IVF ANN index (the query doc's embedding,
    depth 10, doc_id == vec_id in the synthetic corpus), and the two
    rankings fuse by integer-exact RRF: score = Σ 1e6 DIV (60 + rank).
    Rank fusion deliberately uses RANKS, not raw scores — BM25 ppm
    and cosine live on incomparable scales, and RRF is the standard
    scale-free combiner. The oracle embeds BOTH proven oracle cores
    (the shared _BM25_CORE_SQL block and q60's IVF CTEs) plus the
    fusion arithmetic, so the driver replays the entire hybrid stack
    end-to-end.

    Scale shape: pure composition of the two standing-index probes —
    each warm probe touches only bucketed index files (pushed
    In-filter / cell equi-join, corpus never re-scanned), and the
    fusion itself is an O(|queries|·depth) aggregate + top-k window
    over candidates only. At 100 TB nothing new moves: hybrid costs
    exactly its two probes."""
    from pyspark.sql import Window

    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )
    from mindseye_dataframes_spark.queries.text import (
        bm25_standing_postings,
        bm25_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents, post = ann_standing_index(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") < _RRF_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ann = ann_topk_ivf_postings(
        qv, post, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_RRF_DEPTH, n_probe=_IVF_PROBE,
    )
    bm = bm25_topk(spark, bm25_standing_postings(spark, sf_dir), _RRF_DEPTH)
    u = bm.select(
        F.col("query_id").cast("long").alias("query_id"), "doc_id", "rank"
    ).unionByName(
        ann.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
    )
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(f"1000000 DIV ({_RRF_C} + rank)"))
        .cast("long")
        .alias("rrf_ppm"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_ppm"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RRF_K)
        .select("query_id", "rank", "doc_id", "rrf_ppm", "n_systems")
        .orderBy("query_id", "rank")
    )


_ANN_BASE_PRED = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 100 >= 10"
)


def ann_incremental_base(spark, sf_dir):
    """The standing BASE half of the incremental-ANN story, shared by
    the batch (q204) and streaming (q212) ingest paths: the coarse
    quantizer is derived ONCE from the base corpus (split_label
    'train', 90% on vec_id) and published as a fingerprint-named
    standing table alongside the cell-bucketed base postings — the
    q192 contract, restricted to the base split. Returns
    (cents: [(cell, vec)] sorted, base_post: DataFrame, emb)."""
    import hashlib
    import os

    from mindseye_dataframes_spark.operators.similarity import (
        _nearest_cells,
        ivf_centroids,
    )
    from mindseye_dataframes_spark.queries.curation import split_label
    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    fp = dataset_fingerprint(os.path.join(real, "embeddings.parquet"))
    split = split_label("vec_id")
    base = emb.filter(split == "train")

    def build_cents():
        cents = ivf_centroids(base, "vec_id", "embedding", _IVF_CELLS)
        return spark.createDataFrame(
            [(c, v) for c, v in cents], "cell int, v array<double>"
        )

    cents_tbl = standing_table(
        spark, f"msdf_stage_ivfinccents_{loc}", fp, build_cents, ["cell"], 1
    )
    cents = sorted(
        (int(r["cell"]), [float(x) for x in r["v"]]) for r in cents_tbl.collect()
    )

    def build_base_postings():
        return base.select(
            _nearest_cells("embedding", cents, 1)[0].alias("_cell"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        )

    base_post = standing_table(
        spark,
        f"msdf_stage_ivfincpost_{loc}",
        fp,
        build_base_postings,
        ["_cell"],
        16,
        ["_cell", "neighbor_id"],
    )
    return cents, base_post, emb


@query(
    "q204_incremental_ann_update",
    oracle=_ivf_oracle(base_pred=_ANN_BASE_PRED),
    tags=("similarity", "incremental", "lakehouse", "parity:ann-incremental"),
)
def q204_incremental_ann_update(spark, sf_dir):
    """INCREMENTAL MAINTENANCE of the standing ANN index — the
    embedding twin of q203's BM25 story, completing the standing-index
    ingest path: the coarse quantizer is derived ONCE from the
    standing BASE corpus (the ``split_label`` 'train' 90% on vec_id —
    the one shared rule) and stays fixed; a late-arriving DELTA batch
    (the 'test' 10%) is assigned to those EXISTING centroids with the
    same narrow-map expression and appended logically to the posting
    list — the standard IVF ingest discipline (assign-on-arrival,
    re-train the quantizer only when the fingerprint rolls). The
    oracle replays quantizer-from-base + assignment-over-everything
    from raw embeddings, pinning that the incrementally maintained
    index answers exactly what a from-scratch assignment under the
    same quantizer would.

    Scale shape, warm: base vectors are never re-read as raw corpus —
    probes hit the cell-bucketed standing postings (the q192 contract);
    only the delta batch pays the assignment map (pure JVM expression
    against O(cells) centroid literals, no shuffle — the new rows
    arrive cell-tagged); the probe equi-join sees base postings
    pre-clustered by its join key and a delta side small by
    definition. Nothing recomputes over the base on ingest
    (base construction shared with q212: ``ann_incremental_base``)."""
    from mindseye_dataframes_spark.operators.similarity import (
        _nearest_cells,
        ann_topk_ivf_postings,
    )
    from mindseye_dataframes_spark.queries.curation import split_label

    cents, base_post, emb = ann_incremental_base(spark, sf_dir)
    split = split_label("vec_id")
    # the late-arriving batch: assigned to the EXISTING quantizer by a
    # narrow map (centroid literals — no join, no shuffle), appended
    delta_post = emb.filter(split == "test").select(
        _nearest_cells("embedding", cents, 1)[0].alias("_cell"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    postings = base_post.unionByName(delta_post)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_topk_ivf_postings(
        queries, postings, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_K, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


# --- q209: tombstone DELETES against the standing ANN index ----------
#
# The takedown batch as a deterministic predicate (every 10th vector,
# ids ending in 7) so the oracle can replay the surviving corpus.
_ANN_TOMB_PRED = "vec_id % 10 = 7"


@query(
    "q209_ann_tombstone_delete",
    oracle=_ivf_oracle(live_pred=f"NOT (a.{_ANN_TOMB_PRED})"),
    tags=("similarity", "incremental", "lakehouse", "parity:ann-tombstone"),
)
def q209_ann_tombstone_delete(spark, sf_dir):
    """TOMBSTONE DELETES against the standing ANN index — the
    eviction half of the index-maintenance story (VERDICT r7 item 8),
    q208's embedding twin: a takedown batch (ids only — ``vec_id % 10
    = 7``) lands as a tombstone side table against the SAME standing
    index q192 serves (same centroid + posting tables, no rebuild, no
    rewrite), and probes answer as if those vectors had never been
    indexed: deleted vectors stop appearing as neighbors while the
    coarse quantizer and the probe's cell routing stay untouched —
    the standard IVF delete discipline (logical tombstones now,
    physical compaction when the fingerprint rolls). The oracle
    replays quantizer-over-everything + scoring-over-survivors from
    raw embeddings, so the driver hashes that logical deletion returns
    exactly what a from-scratch index over the surviving corpus
    (under the same quantizer) would.

    Probe-time mechanics: the tombstone ids BROADCAST-anti-join the
    cell-bucketed postings — a narrow filter, no shuffle, bucketing
    (and therefore the q192 no-exchange probe contract) preserved;
    everything downstream is q192's probe shape unchanged. Nothing
    rescans the corpus and nothing driver-side scales with it."""
    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents, postings = ann_standing_index(spark, sf_dir)
    tomb = emb.filter(F.expr(_ANN_TOMB_PRED)).select(
        F.col("vec_id").alias("neighbor_id")
    )
    live = postings.join(F.broadcast(tomb), "neighbor_id", "left_anti")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_topk_ivf_postings(
        queries, live, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_K, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


@query(
    "q211_ann_compaction",
    oracle=_ivf_oracle(live_pred=f"NOT (a.{_ANN_TOMB_PRED})"),
    tags=("similarity", "incremental", "lakehouse", "parity:ann-compaction"),
)
def q211_ann_compaction(spark, sf_dir):
    """PHYSICAL COMPACTION of q209's tombstoned ANN index — q210's
    embedding twin, closing the delete lifecycle for both index
    families: the cell-bucketed postings are REWRITTEN without the
    tombstoned vectors and published under a derived fingerprint
    (md5(base_fp : tombstone digest), atomic rename, warm no-op on
    re-run), while the centroid table carries over untouched — IVF
    compaction never moves survivors between cells, so the rewrite is
    a pure anti-join filter of the posting lists, bucketing preserved.
    The oracle is IDENTICAL to q209's (quantizer over everything,
    scoring over survivors): one green row pins probe-time deletes,
    this one pins the physical rewrite.

    Scale shape: compaction reads ONLY the standing postings (anti-
    joined against broadcast tombstone ids — narrow, no corpus scan);
    the warm probe is q192's shape with NO tombstone filter anywhere,
    so probes stop paying the anti-join and raw embeddings appear in
    the plan only as the query vectors (pinned in
    tests/test_plans.py)."""
    import hashlib
    import os

    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )
    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents, postings = ann_standing_index(spark, sf_dir)
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    base_fp = dataset_fingerprint(os.path.join(real, "embeddings.parquet"))
    fp2 = hashlib.md5(
        f"{base_fp}:tomb:{_ANN_TOMB_PRED}".encode()
    ).hexdigest()[:16]
    tomb = emb.filter(F.expr(_ANN_TOMB_PRED)).select(
        F.col("vec_id").alias("neighbor_id")
    )
    cpost = standing_table(
        spark,
        f"msdf_stage_ivfcpost_{loc}",
        fp2,
        lambda: postings.join(F.broadcast(tomb), "neighbor_id", "left_anti"),
        ["_cell"],
        16,
        ["_cell", "neighbor_id"],
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_topk_ivf_postings(
        queries, cpost, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_K, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


# --- q214: margin-based bitext candidate mining -----------------------
#
# The CCMatrix/LASER margin criterion (Artetxe & Schwenk 2019): a
# candidate pair (x, y) is accepted when cos(x, y) clearly exceeds the
# LOCAL similarity level around both endpoints — score = cos(x,y) /
# (mean of x's k-NN cosines + mean of y's k-NN cosines)/2 — which
# suppresses hubs (vectors similar to everything) that a raw cosine
# threshold would flood on. The synthetic bilingual split is vec_id
# parity (even = source "language", odd = target).
_BTX_K = 4
_BTX_MAXID = 40  # anchors: even vec_ids below this (a mine batch)
_BTX_TAU_PPM = 1_060_000  # the canonical 1.06 margin gate, in ppm
_BTX_SCALE = 2 * _BTX_K * 1_000_000  # cos·2k·1e6 / (Σfwd + Σbwd)
_BTX_COS_N = (
    "CAST(round(round(list_cosine_similarity({a}, {b}), 9)"
    " * 1000000000) AS BIGINT)"
)


@query(
    "q214_bitext_margin_mining",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    src AS (SELECT * FROM e WHERE vec_id % 2 = 0),
    tgt AS (SELECT * FROM e WHERE vec_id % 2 = 1),
    anchors AS (SELECT * FROM src WHERE vec_id < {_BTX_MAXID}),
    fwd AS (
      SELECT a.vec_id AS src_id, t.vec_id AS tgt_id,
             {_BTX_COS_N.format(a='a.v', b='t.v')} AS cos_n,
             row_number() OVER (PARTITION BY a.vec_id
                ORDER BY round(list_cosine_similarity(a.v, t.v), 9) DESC,
                         t.vec_id) AS rk
      FROM anchors a, tgt t),
    fwd_k AS (SELECT * FROM fwd WHERE rk <= {_BTX_K} AND cos_n > 0),
    sum_fwd AS (SELECT src_id, CAST(sum(cos_n) AS BIGINT) AS sum_fwd_n
                FROM fwd_k GROUP BY src_id),
    cand AS (SELECT DISTINCT tgt_id FROM fwd_k),
    bwd AS (
      SELECT c.tgt_id,
             {_BTX_COS_N.format(a='t.v', b='s.v')} AS cos_n,
             row_number() OVER (PARTITION BY c.tgt_id
                ORDER BY round(list_cosine_similarity(t.v, s.v), 9) DESC,
                         s.vec_id) AS rk
      FROM cand c JOIN tgt t ON t.vec_id = c.tgt_id, src s),
    sum_bwd AS (SELECT tgt_id, CAST(sum(cos_n) AS BIGINT) AS sum_bwd_n
                FROM bwd WHERE rk <= {_BTX_K} AND cos_n > 0 GROUP BY tgt_id),
    scored AS (
      SELECT f.src_id, f.tgt_id,
             f.cos_n * {_BTX_SCALE} // (x.sum_fwd_n + y.sum_bwd_n)
               AS margin_ppm
      FROM fwd_k f
      JOIN sum_fwd x USING (src_id) JOIN sum_bwd y USING (tgt_id)),
    acc AS (
      SELECT src_id, tgt_id, margin_ppm,
             row_number() OVER (PARTITION BY src_id
                ORDER BY margin_ppm DESC, tgt_id) AS rank
      FROM scored WHERE margin_ppm >= {_BTX_TAU_PPM})
    SELECT src_id, tgt_id, margin_ppm, rank FROM acc
    ORDER BY src_id, rank
    """,
    tags=("similarity", "retrieval", "training", "parity:margin-mining"),
)
def q214_bitext_margin_mining(spark, sf_dir):
    """Margin-based parallel-pair mining over embeddings: forward k-NN
    from a bounded anchor batch into the target side, backward k-NN
    for ONLY the surfaced candidates, then the ratio-margin gate
    cos·2k / (Σ_fwd + Σ_bwd) ≥ 1.06. Scores are integer nano-cosines
    (round-9 grid, the q35-proven cross-engine contract) so sums are
    order-independent BIGINTs and the margin replays exactly; the
    cos_n > 0 guard keeps every divisor positive (DuckDB ``//``
    floors, Spark ``DIV`` truncates — they agree only above zero).

    Scale shape: the corpus never shuffles — both k-NN passes are the
    q35 broadcast-queries × stationary-corpus scorer, the backward
    pass touches only the ≤ anchors·k distinct candidates, and the
    margin arithmetic is a candidate-local join of two O(batch)
    aggregates. At 100 TB the brute-force scorer swaps for the
    standing IVF probe (q192) with identical downstream arithmetic
    (`operators/similarity.py:mine_margin_pairs`)."""
    from mindseye_dataframes_spark.operators.similarity import mine_margin_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    anchors = src.filter(F.col("vec_id") < _BTX_MAXID).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("qv")
    )
    targets = tgt.select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("cv")
    )
    sources = src.select(
        F.col("vec_id").alias("nb_id"), F.col("embedding").alias("cv")
    )
    return mine_margin_pairs(
        anchors, targets, sources, _BTX_K, _BTX_TAU_PPM
    ).orderBy("src_id", "rank")


def ann_ingest_batch_fn(post_log: str, cents):
    """foreachBatch body of the streaming ANN ingest (q212): assign
    ONE micro-batch of vectors to the FIXED coarse quantizer (narrow
    centroid-literal expression — no join, no shuffle) and write the
    cell-tagged posting rows to the DETERMINISTIC ``batch=<batchId>``
    path in overwrite mode, so a replayed trigger overwrites its own
    partition instead of double-appending — the same idempotent-path
    exactly-once discipline as q205's BM25 ingest. Module-level so
    tests can drive it directly."""
    from mindseye_dataframes_spark.operators.similarity import _nearest_cells

    def ingest_batch(batch_df, batch_id):
        batch_df.select(
            _nearest_cells("embedding", cents, 1)[0].alias("_cell"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ).write.mode("overwrite").parquet(f"{post_log}/batch={batch_id}")

    return ingest_batch


@query(
    "q212_streaming_ann_ingest",
    oracle=_ivf_oracle(base_pred=_ANN_BASE_PRED),
    tags=("similarity", "incremental", "streaming", "parity:ann-streaming"),
)
def q212_streaming_ann_ingest(spark, sf_dir):
    """STREAMING maintenance of the standing ANN index — q205's
    embedding twin, completing the pair: BOTH standing indexes (BM25
    and IVF-ANN) now have batch-incremental (q203/q204), delete
    (q208/q209), compaction (q210/q211), AND streaming ingest paths.
    q204's delta batch arrives as a STREAM: the 'test' split is staged
    as a many-file drop, consumed over multiple micro-batch triggers,
    and each trigger's foreachBatch assigns ONLY that batch's vectors
    to the FIXED base-trained quantizer (assign-on-arrival) and
    appends cell-tagged postings to an idempotent per-batchId log.
    After the drain, probes answer from standing base postings ∪ the
    streamed posting log, and the oracle replays quantizer-from-base +
    assignment-over-everything from raw embeddings — unordered
    streaming commits must converge to exactly the one-shot answer.

    Scale shape: per trigger the work is one bounded narrow map over
    that batch's vectors (centroid literals — state O(batch), no
    stateful operator, no shuffle); the base postings are never
    re-scanned or re-clustered; the probe is q204's equi-join shape
    over base ∪ log."""
    import shutil

    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )
    from mindseye_dataframes_spark.queries.curation import split_label
    from mindseye_dataframes_spark.sources.staging import (
        read_log_or_empty,
        staging_dir,
    )

    cents, base_post, emb = ann_incremental_base(spark, sf_dir)
    delta = emb.filter(split_label("vec_id") == "test").select(
        "vec_id", "embedding"
    )
    root = staging_dir(spark, "msdf_stream_ann_")
    src = f"{root}/src"
    post_log = f"{root}/postings"
    ckpt = f"{root}/ckpt"
    try:
        delta.repartition(32).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.format("parquet")
            .schema(delta.schema)
            .option("maxFilesPerTrigger", 8)
            .load(src)
        )
        q = (
            stream.writeStream.foreachBatch(ann_ingest_batch_fn(post_log, cents))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("q212 ingest stream did not drain")
        # the batch=<id> layout surfaces as a partition column — keep
        # it out of the probe union (it exists for audit/replay); an
        # empty delta leaves the log path unwritten → base-only probe
        streamed = read_log_or_empty(
            spark, post_log, base_post.select("_cell", "neighbor_id", "cv").schema
        ).select("_cell", "neighbor_id", "cv")
        postings = base_post.unionByName(streamed)
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        out = ann_topk_ivf_postings(
            queries, postings, cents, "query_id", "qv", "neighbor_id", "cv",
            k=_K, n_probe=_IVF_PROBE,
        )
        # pin the result before the staging dirs vanish
        return spark.createDataFrame(out.collect(), schema=out.schema).orderBy(
            "query_id", "rank"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "q218_ann_index_checkpoint",
    oracle=_ivf_oracle(base_pred=_ANN_BASE_PRED),
    tags=("similarity", "incremental", "lakehouse", "parity:ann-checkpoint"),
)
def q218_ann_index_checkpoint(spark, sf_dir):
    """CHECKPOINT ROLL of the streamed ANN posting log into the
    standing base — the lifecycle step that completes the streaming
    story: q212 leaves probes paying base ∪ per-batch-log union
    forever; this query FOLDS the drained log into a NEW standing
    cell-bucketed posting table under a derived fingerprint
    (md5(base_fp : log spec), atomic publish, warm no-op on re-run),
    after which probes read ONE bucketed table with zero log
    awareness — the stream's Delta-style 'compact small files into
    the table' step, done with fingerprint-named parquet. The coarse
    quantizer carries over untouched (fold never reassigns cells), and
    the oracle replays quantizer-from-base + assignment-over-
    everything, pinning that roll-up changes nothing about answers.

    Scale shape: the fold reads base postings + the (small) log once
    and rewrites them bucketed — a bounded maintenance job, not a
    corpus re-scan or re-cluster; the warm probe is exactly q192's
    no-exchange shape over the rolled table."""
    import shutil

    from mindseye_dataframes_spark.sources.staging import staging_dir

    root = staging_dir(spark, "msdf_ann_ckptlog_")
    post_log = f"{root}/postings"
    try:
        ann_ckpt_stage_log(spark, sf_dir, post_log)
        return ann_ckpt_fold(spark, sf_dir, post_log)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def ann_ckpt_stage_log(spark, sf_dir: str, post_log: str) -> None:
    """STAGE half of q218's harness (split so the drain probe pays it
    once per session, VERDICT r9 item 4): the drained ingest log —
    four unordered batches written through q212's idempotent batch fn
    (the post-stream state, sans stream)."""
    from mindseye_dataframes_spark.queries.curation import split_label

    cents, _base_post, emb = ann_incremental_base(spark, sf_dir)
    delta = emb.filter(split_label("vec_id") == "test")
    for b in range(4):
        ann_ingest_batch_fn(post_log, cents)(
            delta.filter(F.col("vec_id") % 4 == b), b
        )


def ann_ckpt_fold(spark, sf_dir: str, post_log: str, salt: str = ""):
    """FOLD half of q218: roll the staged log into the standing
    bucketed posting table and probe it — the maintenance operation
    itself. ``salt`` lets a probe force a FRESH fold per run (it
    feeds the derived fingerprint), instead of measuring the warm
    no-op re-publish."""
    import hashlib
    import os

    from mindseye_dataframes_spark.operators.similarity import (
        ann_topk_ivf_postings,
    )
    from mindseye_dataframes_spark.sources.bucketing import (
        dataset_fingerprint,
        standing_table,
    )
    from mindseye_dataframes_spark.sources.staging import read_log_or_empty

    cents, base_post, emb = ann_incremental_base(spark, sf_dir)
    real = os.path.realpath(sf_dir)
    loc = hashlib.md5(real.encode()).hexdigest()[:8]
    base_fp = dataset_fingerprint(os.path.join(real, "embeddings.parquet"))
    fp2 = hashlib.md5(
        f"{base_fp}:ckpt:test-split{salt}".encode()
    ).hexdigest()[:16]

    streamed = read_log_or_empty(
        spark, post_log, base_post.select("_cell", "neighbor_id", "cv").schema
    ).select("_cell", "neighbor_id", "cv")
    ckpt_post = standing_table(
        spark,
        f"msdf_stage_ivfckptpost_{loc}",
        fp2,
        lambda: base_post.unionByName(streamed),
        ["_cell"],
        16,
        ["_cell", "neighbor_id"],
    )
    # force materialization before the staging log vanishes (a
    # warm re-run never reads it at all)
    ckpt_post.count()
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_topk_ivf_postings(
        queries, ckpt_post, cents, "query_id", "qv", "neighbor_id", "cv",
        k=_K, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


# --- q221: Matryoshka truncation recall curve --------------------------
#
# MRL-style embeddings (Kusupati et al. 2022) promise that a PREFIX of
# the vector is itself a usable embedding; whether that holds for a
# given model/corpus is an empirical curve — recall@k of prefix-dim
# search against full-dim exact search. This is the measurement that
# decides how much of a 100 TB vector corpus you can afford NOT to
# read (a 16-of-64 prefix scan is 4× less I/O and compute).
_MAT_DIMS = (8, 16, 32, 64)
_MAT_FULL = 64


def _mat_topk_sql(dim: int) -> str:
    v = f"v[1:{dim}]"
    return f"""
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(list_cosine_similarity(q.{v}, e.{v}), 9) DESC,
                         e.vec_id) AS rank
      FROM q, e
    """


@query(
    "q221_matryoshka_recall_curve",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < {_N_QUERIES}),
    full_k AS (
      SELECT query_id, neighbor_id FROM ({_mat_topk_sql(_MAT_FULL)})
      WHERE rank <= {_K}),
    hits AS (
      {" UNION ALL ".join(
          f'''SELECT {d} AS dim, CAST(count(*) AS BIGINT) AS hits
          FROM (SELECT query_id, neighbor_id FROM ({_mat_topk_sql(d)})
                WHERE rank <= {_K}) p
          JOIN full_k USING (query_id, neighbor_id)'''
          for d in _MAT_DIMS
      )})
    SELECT CAST(dim AS INT) AS dim, hits,
           hits * 1000000 // {_N_QUERIES * _K} AS recall_ppm
    FROM hits ORDER BY dim
    """,
    tags=("similarity", "embeddings", "parity:matryoshka-recall"),
)
def q221_matryoshka_recall_curve(spark, sf_dir):
    """Prefix-dimension (Matryoshka) retrieval quality curve: exact
    top-{k} by cosine over the FIRST d dims for d ∈ {dims}, scored as
    recall against the full-dim exact top-{k} — the d=64 row is the
    identity sanity row (recall 1.0). All ranking runs on the proven
    round-9 nano-grid with id tie-breaks, and recall is integer ppm
    over a fixed query×k denominator, so DuckDB replays the whole
    curve. The curve answers the 100 TB planning question directly:
    the smallest prefix whose recall clears your bar is the fraction
    of the vector corpus a first-stage scan must read.

    Scale shape: one broadcast-queries × stationary-corpus scoring
    pass per prefix dim (the q35 shape; prefix slice is a narrow
    map), each join against the full-dim set is O(queries·k)."""
    full = None
    per_dim = []
    for d in _MAT_DIMS:
        emb = load_table(spark, sf_dir, "embeddings")
        sl = emb.select(
            F.col("vec_id"), F.slice("embedding", 1, d).alias("pv")
        )
        queries = sl.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("pv").alias("qv")
        )
        corpus = sl.select(
            F.col("vec_id").alias("neighbor_id"), F.col("pv").alias("cv")
        )
        topk = cosine_topk(
            queries, corpus, "query_id", "qv", "neighbor_id", "cv", _K
        ).select("query_id", "neighbor_id")
        if d == _MAT_FULL:
            full = topk
        per_dim.append((d, topk))
    hits = None
    for d, topk in per_dim:
        h = (
            topk.join(full, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(F.lit(d).cast("int").alias("dim"), "hits")
        )
        hits = h if hits is None else hits.unionByName(h)
    return hits.select(
        "dim",
        "hits",
        F.expr(f"hits * 1000000 DIV {_N_QUERIES * _K}").alias("recall_ppm"),
    ).orderBy("dim")


# --- q222: retrieval quality eval (MRR / NDCG@10) ----------------------
#
# Ranking-quality metrics in exact integer micro-units: the log2
# discount table is precomputed as literals (w_i = round(1e6/log2(i+1))
# for i = 1..10) and shared verbatim by both engines, so DCG/IDCG/MRR
# are pure BIGINT arithmetic — no libm call ever runs inside a query.
_EVAL_K = 10
_NDCG_W = [1000000, 630930, 500000, 430677, 386853, 356207, 333333,
           315465, 301030, 289065]
_NDCG_P = [1000000, 1630930, 2130930, 2561607, 2948460, 3304667,
           3638000, 3953465, 4254495, 4543560]


@query(
    "q222_retrieval_quality_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings),
    q AS (SELECT vec_id, v, label FROM e WHERE vec_id < {_N_QUERIES}),
    topk AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               q.label AS qlabel, e.label AS nlabel,
               row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY round(list_cosine_similarity(q.v, e.v), 9) DESC,
                           e.vec_id) AS rank
        FROM q, e
      ) WHERE rank <= {_EVAL_K}),
    rel AS (
      SELECT query_id, rank FROM topk
      WHERE nlabel = qlabel AND neighbor_id <> query_id),
    per_q AS (
      SELECT query_id,
             CAST(1000000 // min(rank) AS BIGINT) AS mrr_u,
             CAST(sum(CASE rank
               {" ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W))}
             END) AS BIGINT) AS dcg_u
      FROM rel GROUP BY query_id),
    cnt AS (
      SELECT q.vec_id AS query_id,
             least(CAST(count(*) AS BIGINT), {_EVAL_K}) AS m
      FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.vec_id
      GROUP BY q.vec_id),
    idcg AS (
      SELECT query_id, CAST(CASE m
        {" ".join(f"WHEN {m + 1} THEN {p}" for m, p in enumerate(_NDCG_P))}
        ELSE 0 END AS BIGINT) AS idcg_u
      FROM cnt)
    SELECT q.vec_id AS query_id,
           COALESCE(p.mrr_u, 0) AS mrr_u,
           CASE WHEN COALESCE(i.idcg_u, 0) > 0
                THEN COALESCE(p.dcg_u, 0) * 1000000 // i.idcg_u
                ELSE 0 END AS ndcg_ppm
    FROM q
    LEFT JOIN per_q p ON p.query_id = q.vec_id
    LEFT JOIN idcg i ON i.query_id = q.vec_id
    ORDER BY query_id
    """,
    tags=("similarity", "embeddings", "eval", "parity:retrieval-quality"),
)
def q222_retrieval_quality_eval(spark, sf_dir):
    """Retrieval-quality evaluation of the exact cosine ranker against
    label relevance (relevant = same ``label``, self excluded): per
    query, MRR in micro-units (1e6 DIV first-relevant rank) and
    NDCG@10 in ppm with the literal integer discount table — the
    metric harness every retrieval change (ANN cells, PQ bits, hybrid
    fusion weights) gets judged by. IDCG caps at min(#relevant, 10)
    per query, so sparse-label corpora (sf0.001) exercise the cap.

    Scale shape: one q35 broadcast-queries × stationary-corpus pass,
    label join against a broadcast O(queries) frame, then O(q·k)
    arithmetic; the per-label corpus counts are one hash aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("nlabel"),
    )
    topk = cosine_topk(
        queries.select("query_id", "qv"), corpus.select("neighbor_id", "cv"),
        "query_id", "qv", "neighbor_id", "cv", _EVAL_K,
    )
    labeled = (
        topk.join(F.broadcast(queries.select("query_id", "qlabel")), "query_id")
        .join(
            corpus.select("neighbor_id", "nlabel"), "neighbor_id"
        )
    )
    rel = labeled.filter(
        (F.col("nlabel") == F.col("qlabel"))
        & (F.col("neighbor_id") != F.col("query_id"))
    )
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    per_q = rel.groupBy("query_id").agg(
        F.expr("CAST(1000000 DIV min(rank) AS BIGINT)").alias("mrr_u"),
        F.sum(F.element_at(w_arr, F.col("rank"))).cast("long").alias("dcg_u"),
    )
    cnt = (
        queries.select("query_id", "qlabel")
        .join(corpus.select("neighbor_id", "nlabel"),
              F.col("nlabel") == F.col("qlabel"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.least(F.count(F.lit(1)), F.lit(_EVAL_K)).alias("m"))
    )
    p_arr = F.array(*[F.lit(p) for p in _NDCG_P])
    idcg = cnt.select(
        "query_id", F.element_at(p_arr, F.col("m").cast("int")).alias("idcg_u")
    )
    return (
        queries.select("query_id")
        .join(per_q, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("mrr_u", F.lit(0)).cast("long").alias("mrr_u"),
            F.when(
                F.coalesce("idcg_u", F.lit(0)) > 0,
                F.expr("COALESCE(dcg_u, 0) * 1000000 DIV idcg_u"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )
