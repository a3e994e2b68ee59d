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

# Integer nano-unit distance rank: floor(d·1e9 + 0.5) over the same
# left fold — plain double IEEE ops, so Spark's expression path, the
# numpy path, and DuckDB quantize the SAME double identically (no
# decimal-HALF_UP vs banker's divergence on half-boundaries).
_L2 = (
    "CAST(floor(list_reduce(list_transform(range(1, len({x}) + 1),"
    " i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])), (a, b) -> a + b)"
    " * 1000000000.0 + 0.5) AS BIGINT)"
)


def _kmeans_ctes() -> str:
    """Shared CTE prefix replaying both Lloyd iterations; ends with
    ``a2(vec_id, v, cell)`` — the final assignment with the vector
    kept so downstream oracles (q163's within-cluster pass) can reuse
    it verbatim."""
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
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c2.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c2.cell) AS rn
        FROM e CROSS JOIN c2) WHERE rn = 1)"""


def _kmeans_oracle() -> str:
    return (
        _kmeans_ctes()
        + """
    SELECT CAST(cell AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min(vec_id) AS min_vec, max(vec_id) AS max_vec
    FROM a2 GROUP BY cell ORDER BY cluster_id
    """
    )


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


_SEMDEDUP_TAU = 0.4


def _semdedup_oracle() -> str:
    return (
        _kmeans_ctes()
        + f""",
    dropped AS (
      SELECT DISTINCT b.vec_id, b.cell
      FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 9) >= {_SEMDEDUP_TAU}),
    drops AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_dropped,
             min(vec_id) AS min_dropped
      FROM dropped GROUP BY cell)
    SELECT CAST(a2.cell AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           COALESCE(any_value(d.n_dropped), 0) AS n_dropped,
           any_value(d.min_dropped) AS min_dropped
    FROM a2 LEFT JOIN drops d ON a2.cell = d.cell
    GROUP BY a2.cell ORDER BY cluster_id
    """
    )


@query(
    "q163_semdedup",
    oracle=_semdedup_oracle(),
    tags=("dedup", "vector", "clustering", "north-star"),
)
def q163_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means over embeddings, then pairwise cosine ONLY
    within each cluster; a row is a duplicate when a lower-id member of
    its cluster is ≥ τ similar (the deterministic greedy keep-lowest
    rule). Reuses q140's engine-exact two-iteration Lloyd assignment —
    the oracle replays clustering AND dedup bit-for-bit.

    Scale shape: the cluster assignment is a narrow map with zero
    shuffle either way — centroid literals below the k·d expression
    ceiling (the plan here at k=8), a broadcast numpy centroid matrix
    + mapInPandas argmin above it (``operators/clustering.py:
    _assign_numpy``, same nano-unit-quantize/tiebreak contract,
    property-pinned)
    — and the vector rides along instead of being re-joined. The
    quadratic pass is confined to single clusters and executed as ONE
    numpy matmul per cell inside ``applyInPandas``
    (``operators/clustering.py:semdedup_dropped`` — measured ~12×
    faster at sf0.1 than the equivalent interpreted HOF pair join),
    which is the entire point of SemDeDup — k grows with the corpus
    (into the 10⁴-10⁵ range the broadcast path exists for) so cluster
    sizes stay bounded and the all-pairs cost is Σ|cluster|² not N².
    Per-cluster stats aggregate map-side before the final O(k)-row
    sort."""
    from mindseye_dataframes_spark.operators.clustering import (
        kmeans_fit_assign,
        semdedup_dropped,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m = kmeans_fit_assign(
        emb, "vec_id", "embedding", k=_K, iters=2, keep=("embedding",)
    )
    dropped = semdedup_dropped(
        m, "vec_id", "embedding", cell_col="_cell", tau=_SEMDEDUP_TAU
    )
    drops = dropped.groupBy(F.col("_cell").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.min("vec_id").alias("min_dropped"),
    )
    return (
        m.groupBy(F.col("_cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(drops, "cell", "left")
        .select(
            F.col("cell").cast("long").alias("cluster_id"),
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            "min_dropped",
        )
        .orderBy("cluster_id")
    )


_TAUS = (0.3, 0.4, 0.5, 0.6, 0.7)


def _tau_curve_oracle() -> str:
    taus_values = ", ".join(f"({t!r})" for t in _TAUS)
    return (
        _kmeans_ctes()
        + f""",
    prs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_cosine_similarity(a.v, b.v), 9) AS sim
      FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    taus(tau) AS (VALUES {taus_values})
    SELECT CAST(tau AS DOUBLE) AS tau,
           CAST((SELECT COUNT(*) FROM prs WHERE sim >= tau) AS BIGINT)
             AS n_pairs,
           CAST((SELECT COUNT(DISTINCT ib) FROM prs WHERE sim >= tau) AS BIGINT)
             AS n_dropped
    FROM taus ORDER BY tau
    """
    )


@query(
    "q189_semdedup_tau_curve",
    oracle=_tau_curve_oracle(),
    tags=("dedup", "vector", "clustering", "curation"),
)
def q189_semdedup_tau_curve(spark, sf_dir):
    """The SemDeDup threshold knob as data: for every candidate τ,
    the within-cluster pair count ≥ τ and the rows the greedy
    keep-lowest rule would drop — the dedup-fraction curve curation
    teams sweep to pick τ (Abbas et al. 2023 §4) before committing to
    a corpus-wide pass. The expensive part (per-cell pairwise cosine)
    is computed ONCE and every τ is evaluated against the same
    in-batch similarity matrix (``operators/clustering.py:
    semdedup_tau_curve``); the oracle replays the full two-iteration
    Lloyd assignment AND the per-τ pair/drop counts from scratch.

    Scale: identical movement to q163 — one hash exchange of
    (id, vec) by cell, Σ|cluster|² matmul bounded by k growing with
    the corpus — but |taus|× cheaper than re-running the pass per τ;
    the post-pass aggregate is O(k·|taus|) rows."""
    from mindseye_dataframes_spark.operators.clustering import (
        kmeans_fit_assign,
        semdedup_tau_curve,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m = kmeans_fit_assign(
        emb, "vec_id", "embedding", k=_K, iters=2, keep=("embedding",)
    )
    return semdedup_tau_curve(m, "vec_id", "embedding", "_cell", _TAUS)


# --- q223: k-center greedy coreset -------------------------------------
#
# Farthest-point (Gonzalez 1985) selection under cosine distance — the
# data-pruning primitive behind coverage-maximizing coreset selection:
# seed with the minimum vec_id, then repeatedly take the point whose
# MAXIMUM similarity to the chosen set is smallest (= farthest point).
# The selection sequence is a deterministic pure function of the data
# (round-9 nano-cosines, vec_id tie-breaks), so the oracle replays all
# k rounds as unrolled CTE blocks — an iterative algorithm value-
# checked end-to-end, like q140's two Lloyd iterations and q169's BPE.
_KC_K = 8
_KC_COS_N = (
    "CAST(round(round(list_cosine_similarity({a}, {b}), 9)"
    " * 1000000000) AS BIGINT)"
)


def _kcenter_oracle() -> str:
    # Every chained CTE is MATERIALIZED: cents{t} is referenced twice
    # per round and chains back to cents1, so DuckDB's default CTE
    # inlining re-evaluates the whole prefix exponentially (measured
    # 301 s at sf0.01 inlined vs 0.07 s materialized, same values).
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        "c1 AS MATERIALIZED (SELECT vec_id, v FROM e"
        " WHERE vec_id = (SELECT min(vec_id) FROM e)),",
        "cents1 AS MATERIALIZED (SELECT vec_id, v FROM c1),",
    ]
    for t in range(2, _KC_K + 1):
        cos_n = _KC_COS_N.format(a="e.v", b="c.v")
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT e.vec_id, max({cos_n}) AS mc"
            f" FROM e CROSS JOIN cents{t - 1} c"
            f" WHERE e.vec_id NOT IN (SELECT vec_id FROM cents{t - 1})"
            f" GROUP BY e.vec_id),"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT e.vec_id, e.v, s{t}.mc"
            f" FROM s{t} JOIN e USING (vec_id)"
            f" ORDER BY s{t}.mc ASC, e.vec_id LIMIT 1),"
        )
        parts.append(
            f"cents{t} AS MATERIALIZED (SELECT vec_id, v FROM cents{t - 1}"
            f" UNION ALL SELECT vec_id, v FROM c{t}),"
        )
    selects = [
        "SELECT 1 AS sel_order, vec_id, CAST(NULL AS BIGINT) AS max_cos_n"
        " FROM c1"
    ] + [
        f"SELECT {t} AS sel_order, vec_id, CAST(mc AS BIGINT) AS max_cos_n"
        f" FROM c{t}"
        for t in range(2, _KC_K + 1)
    ]
    body = "\n".join(parts)  # every part ends ',' — sel AS follows
    return (
        body
        + "\nsel AS ("
        + " UNION ALL ".join(selects)
        + ")\nSELECT CAST(sel_order AS INT) AS sel_order, vec_id, max_cos_n"
        " FROM sel ORDER BY sel_order"
    )


def _kc_round(emb, cent_vecs):
    """One farthest-point round as a DataFrame: narrow map computing
    ``greatest(nano-cos to each chosen center)`` (centers are array
    literals — no join side, no groupBy) + orderBy/limit(1), which
    Spark executes as TakeOrderedAndProject. Plan pinned exchange-free
    in tests/test_plans.py."""
    import math

    from mindseye_dataframes_spark.functions.vectors import dot, norm

    # One norm fold per ROW instead of one per (row, centroid):
    # ``cosine(emb, c)`` evaluates norm(emb) and norm(c) inside every
    # centroid column, and HOF folds are interpreted with no common-
    # subexpression elimination — t centroids cost 3t folds per row.
    # Here the row norm is projected once (_na) and each centroid's
    # norm is a DRIVER-computed literal using the identical left-fold
    # sequence (acc + x·x in element order, then sqrt — the same IEEE
    # ops the JVM fold performs on the literal array), so every cosine
    # is bit-identical to the previous expression, including the
    # zero-denominator NaN guard. (t+1) folds per row; measured
    # 8.2 s → 5.4 s min-of-3 at sf0.1 (noisy host, monotone gain).
    base = emb.filter(
        ~F.col("vec_id").isin([cid for cid, _ in cent_vecs])
    ).select("vec_id", "embedding", norm("embedding").alias("_na"))
    cos_cols = []
    for _, cv in cent_vecs:
        acc = 0.0
        for x in cv:
            acc += float(x) * float(x)
        nc = math.sqrt(acc)
        denom = F.col("_na") * F.lit(nc)
        cosv = F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
            dot("embedding", F.array(*[F.lit(x) for x in cv])) / denom
        )
        cos_cols.append(F.round(F.round(cosv, 9) * 1e9).cast("long"))
    mc = F.greatest(*cos_cols) if len(cos_cols) > 1 else cos_cols[0]
    return (
        base.select("vec_id", "embedding", mc.alias("mc"))
        .orderBy("mc", "vec_id")
        .limit(1)
    )


@query(
    "q223_kcenter_coreset",
    oracle=_kcenter_oracle(),
    tags=("clustering", "curation", "embeddings", "parity:kcenter"),
)
def q223_kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset (8 rounds, cosine distance): the ≤8
    chosen centers live in the driver as array LITERALS, so each
    round is a single narrow map over the stationary cached corpus —
    ``greatest(cos(emb, c1), …, cos(emb, ct))`` per row — followed by
    one TakeOrdered(1) (argmin of max-similarity, vec_id tie-break).
    Zero exchanges per round (no join, no groupBy; plan-pinned in
    tests), O(k) corpus passes total; the driver holds O(k·dim)
    floats. Emits (sel_order, vec_id, max_cos_n) where max_cos_n is
    the selected point's similarity to the set at selection time —
    the coverage-radius curve that tells you how fast the coreset
    saturates the corpus.

    At 100 TB the per-round corpus pass is the cost driver — the
    standard production variant greedily selects from a uniform
    candidate sample instead; the selection calculus is identical,
    so this exact path doubles as its oracle."""
    from pyspark.storagelevel import StorageLevel

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(1, int(seed["vec_id"]), None)]
    cent_vecs = [(int(seed["vec_id"]), [float(x) for x in seed["embedding"]])]
    for t in range(2, _KC_K + 1):
        picked = _kc_round(emb, cent_vecs).collect()[0]
        chosen.append((t, int(picked["vec_id"]), int(picked["mc"])))
        cent_vecs.append(
            (int(picked["vec_id"]), [float(x) for x in picked["embedding"]])
        )
    emb.unpersist()
    return spark.createDataFrame(
        chosen, "sel_order int, vec_id long, max_cos_n long"
    ).orderBy("sel_order")


# --- q225: simplified silhouette ----------------------------------------
#
# Clustering-quality gate for the q140 k-means model: the SIMPLIFIED
# silhouette (Hruschka et al.) replaces classic silhouette's O(N²)
# all-pairs distances with distances to the k trained centroids —
# a_i = distance to the assigned (nearest) centroid, b_i = distance to
# the second-nearest, s_i = (b_i − a_i) / b_i in [0, 1]. Integer
# nano-unit distances (the q140 grid) make s_i ppm-exact BIGINT on
# both engines; the oracle replays both Lloyd iterations via
# _kmeans_ctes() then ranks per-point centroid distances.


def _silhouette_oracle() -> str:
    d2 = _L2.format(x="e.v", c="c2.v")
    return (
        _kmeans_ctes()
        + f""",
    dall AS (
      SELECT e.vec_id, c2.cell, {d2} AS dn FROM e CROSS JOIN c2),
    rk AS (
      SELECT vec_id, cell, dn,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dn, cell) AS rn
      FROM dall),
    ab AS (
      SELECT a.vec_id, a.cell, a.dn AS a_n, b.dn AS b_n
      FROM rk a JOIN rk b ON b.vec_id = a.vec_id AND b.rn = 2
      WHERE a.rn = 1),
    s AS (
      SELECT cell,
             CASE WHEN b_n = 0 THEN 0
                  ELSE CAST(((b_n - a_n) * 1000000) // b_n AS BIGINT)
             END AS s_ppm
      FROM ab)
    SELECT CAST(cell AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(CAST(sum(s_ppm) AS BIGINT) // count(*) AS BIGINT)
             AS mean_sil_ppm,
           CAST(min(s_ppm) AS BIGINT) AS min_sil_ppm,
           CAST(max(s_ppm) AS BIGINT) AS max_sil_ppm
    FROM s GROUP BY cell ORDER BY cluster_id
    """
    )


@query(
    "q225_kmeans_silhouette",
    oracle=_silhouette_oracle(),
    tags=("clustering", "eval", "embeddings", "parity:silhouette"),
)
def q225_kmeans_silhouette(spark, sf_dir):
    """Per-cluster simplified-silhouette stats for the q140 model.
    The k trained centroids are driver-side literals, so the whole
    scoring pass is ONE narrow map — array_sort over k (distance,
    cell) structs gives the assigned cell, a_n (nearest) and b_n
    (second-nearest) in a single expression — followed by one
    hash-aggregate per cluster. Zero joins; row data moves only
    through the k-row aggregate. s_ppm = (b−a)·1e6 DIV b is pure
    BIGINT (b ≥ a ≥ 0), so mean/min/max are engine-exact."""
    from mindseye_dataframes_spark.operators.clustering import (
        _l2_ranked,
        kmeans_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, "vec_id", "embedding", k=_K, iters=2)
    arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    _l2_ranked(F.col("embedding"), cv).alias("dn"),
                    F.lit(int(cell)).cast("int").alias("cell"),
                )
                for cell, cv in cents
            ]
        )
    )
    ab = emb.select(
        "vec_id",
        arr[0]["cell"].alias("cell"),
        arr[0]["dn"].alias("a_n"),
        arr[1]["dn"].alias("b_n"),
    )
    s = ab.select(
        "cell",
        F.expr(
            "CASE WHEN b_n = 0 THEN CAST(0 AS BIGINT)"
            " ELSE ((b_n - a_n) * 1000000) DIV b_n END"
        ).alias("s_ppm"),
    )
    return (
        s.groupBy(F.col("cell").cast("long").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr("sum(s_ppm) DIV count(*)").alias("mean_sil_ppm"),
            F.min("s_ppm").alias("min_sil_ppm"),
            F.max("s_ppm").alias("max_sil_ppm"),
        )
        .orderBy("cluster_id")
    )


# --- q227: cluster-balanced sample ---------------------------------------
#
# Diversity sampling over LEARNED strata: after the q140 k-means fit,
# draw exactly ≤M points per cluster, ranked inside each cluster by
# md5(vec_id) (unbiased, engine-portable, reshuffle-stable — the q124
# idiom, but the strata come from the model, not a label column).
# This is the cluster-balanced selection step of coverage-maximizing
# curation (cf. k-center q223: that maximizes spread point-by-point;
# this caps per-mode mass wholesale) — at 100 TB the window runs at
# cluster granularity, output is bounded by k·M, and nothing global
# ever sorts.

_CB_PER_CELL = 12


def _cb_sample_oracle() -> str:
    return (
        _kmeans_ctes()
        + f""",
    r AS (
      SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell
                                ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                         vec_id) AS rn
      FROM a2)
    SELECT CAST(cell AS BIGINT) AS cluster_id, vec_id,
           CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {_CB_PER_CELL}
    ORDER BY cluster_id, rn
    """
    )


@query(
    "q227_cluster_balanced_sample",
    oracle=_cb_sample_oracle(),
    tags=("clustering", "curation", "sampling", "parity:cluster-sample"),
)
def q227_cluster_balanced_sample(spark, sf_dir):
    """≤12 deterministic picks per learned cluster. Plan: the q140
    assignment (narrow centroid-literal map) + ONE window partitioned
    by cell (hash-partitioned — no single-partition exchange) +
    filter; output bounded by k·M regardless of corpus size."""
    from pyspark.sql import Window

    from mindseye_dataframes_spark.operators.clustering import (
        kmeans_fit_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_assign(emb, "vec_id", "embedding", k=_K, iters=2)
    rn = F.row_number().over(
        Window.partitionBy("_cell").orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        )
    )
    return (
        assigned.select(
            F.col("_cell").cast("long").alias("cluster_id"),
            "vec_id",
            rn.cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= _CB_PER_CELL)
        .orderBy("cluster_id", "rn")
    )
