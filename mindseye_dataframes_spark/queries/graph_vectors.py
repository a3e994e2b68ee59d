"""Graph analytics over the co-purchase relation + embedding
compression (round-4 widening).

q125 co-purchase degrees — build the part↔part "bought together"
graph (distinct part pairs sharing an order) and rank parts by
degree. Edge generation is an in-order self-join (per-order fan-out
is bounded by order size, never corpus-quadratic); degrees are one
hash-aggregate over edge endpoints.

q126 triangle count — triangles in the co-purchase graph via the
oriented 2-path join: edges stored once with pa < pb, paths
(a→b, a→c, b < c) closed by a third equi-join on (b, c). Orientation
makes every triangle counted exactly once and bounds the path join
by the out-degree of the LOWEST vertex — the standard distributed
triangle algorithm (equi-joins only, no cross product).

q127 int8 embedding quantization — symmetric per-vector int8
quantization (scale = max|x| / 127), the storage/serving compression
step of an embedding pipeline. Engine-exact: float→double casts are
exact, scale and x/s are single IEEE ops shared with the oracle, and
both engines round ties away from zero; the reconstruction-error
fold is the same left-to-right sequence on both sides.

q128 PCA projection — distributed principal components
(operators/decomp.py): one partial-moments pass (O(d²) per
partition), driver-side d×d eigensolve, broadcast projection map.
Not SQL-expressible (eigendecomposition), so the driver applies the
rows-only check; numerical parity against a direct numpy PCA is
pinned in tests/test_training_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mindseye_dataframes_spark.queries.registry import query
from mindseye_dataframes_spark.sources.readers import load_table

_EDGES_SQL = """
    li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""


def _edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )


@query(
    "q125_copurchase_degrees",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT p, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT pa AS p FROM e UNION ALL SELECT pb FROM e)
      GROUP BY p)
    SELECT p, degree FROM deg
    ORDER BY degree DESC, p LIMIT 50
    """,
    tags=("graph", "degrees", "north-star"),
)
def q125_copurchase_degrees(spark, sf_dir):
    """Top-50 parts by co-purchase degree. Undirected degree = count
    of both endpoint roles; top-K via TakeOrdered (no global sort)."""
    e = _edges(spark, sf_dir)
    ends = e.select(F.col("pa").alias("p")).unionAll(
        e.select(F.col("pb").alias("p"))
    )
    return (
        ends.groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("degree"), "p")
        .limit(50)
    )


@query(
    "q126_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    tri AS (
      SELECT count(*) AS n FROM e e1
      JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
    """,
    tags=("graph", "triangles", "north-star"),
)
def q126_triangle_count(spark, sf_dir):
    """Exact triangle count via DEGREE-oriented 2-paths (VERDICT r12
    item 5): every edge is directed from its lower-(degree, id)
    endpoint to the higher one, so each vertex's OUT-degree — the
    2-path join's fan-out — is bounded by O(√m) even on skewed
    graphs (a hub of degree D only FANS OUT to neighbors of degree
    ≥ D, of which there are ≤ 2m/D; id-orientation instead leaves a
    low-id hub with out-degree D, making the path join Θ(D²)). The
    orientation DAG gives each triangle exactly one source vertex, so
    joining (u→v, u→w) with the directed closing edge (v→w) counts
    every triangle exactly once. Suri & Vassilvitskii (WWW'11)
    formulation; oracle unchanged — orientation is plan-side only."""
    e = _edges(spark, sf_dir)
    ends = e.select(F.col("pa").alias("p")).unionAll(
        e.select(F.col("pb").alias("p"))
    )
    deg = ends.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    # orient by (degree, id): two shuffle equi-joins tag endpoints
    ed = (
        e.join(deg.select(F.col("p").alias("pa"), F.col("d").alias("da")), "pa")
        .join(deg.select(F.col("p").alias("pb"), F.col("d").alias("db")), "pb")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    # consumed three times (both 2-path sides + the closing edge):
    # persist so the lineitem self-join + degree tagging runs once,
    # not per consumer (the un-persisted plan re-derived the edge
    # relation 8×)
    from pyspark import StorageLevel

    directed = ed.select(
        F.when(lower_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(lower_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = directed.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddst").alias("dv")
    )
    e2 = directed.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddst").alias("dw")
    )
    # unordered {v,w} once: keep the pair in orientation order so the
    # closing edge (v→w) can match a DIRECTED edge exactly
    paths = e1.join(e2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = directed.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    # Bloom-prefilter the 2-paths before their closing-join exchange
    # (guide §3.2 shape): most 2-paths do not close (4.6% do at
    # sf0.1 — 1.9M triangles of 41M paths), yet every one of them was
    # shuffled and sorted into the closing SortMergeJoin. A Bloom
    # filter over xxhash64(src, dst) of the (persisted) edge relation,
    # probed map-side inside the path-join stage, drops non-closing
    # paths BEFORE the exchange. False positives die in the exact
    # equi-join that follows, so the count is unchanged. Sizing is
    # scale-adaptive, not a local-mode constant: the edge count (the
    # persist materialization the plan needs anyway) picks n_bits for
    # ~16 bits/key (FPR ≈ 1.4% at k=2), capped at a broadcastable
    # bitset (2^28 bits = 32 MB of words; beyond that the prefilter
    # is skipped outright — the plan degrades to the plain closing
    # join instead of probing a saturated filter). Measured 8.4 s →
    # 4.8 s at sf0.1 (closing exchange 41M → ~2.5M rows) and 254 s →
    # 104 s at sf1 (12M edges, bitset at the 2^28 cap).
    n_edges = directed.count()  # O(1) to the driver; forces the persist
    if 16 * n_edges <= (1 << 28):
        from mindseye_dataframes_spark.operators.bloom import (
            bloom_build,
            bloom_prefilter,
        )

        n_bits = 1 << max(20, min(28, (16 * n_edges - 1).bit_length()))
        bloom = bloom_build(
            directed.select(F.xxhash64("src", "dst").alias("_ck")),
            "_ck",
            n_bits=n_bits,
        )
        paths = bloom_prefilter(
            paths.withColumn("_ck", F.xxhash64("v", "w")), "_ck", bloom
        ).drop("_ck")
    tri = paths.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # |directed| == |e| (orientation is a bijection); counting the
    # persisted relation avoids re-deriving the lineitem self-join +
    # distinct a second time for the n_edges column
    edges_n = directed.agg(F.count(F.lit(1)).alias("n_edges"))
    return edges_n.crossJoin(tri)


@query(
    "q127_int8_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
          FROM e),
    q AS (SELECT vec_id, v, sc,
                 list_transform(v, x -> CAST(round(x / sc) AS BIGINT)) AS qv
          FROM s WHERE sc > 0)
    SELECT vec_id,
           array_to_string(qv, ',') AS q_csv,
           round(list_reduce(
             list_transform(range(1, len(v) + 1),
                            i -> (v[i] - qv[i] * sc) * (v[i] - qv[i] * sc)),
             (a, x) -> a + x), 9) AS l2_err
    FROM q ORDER BY vec_id
    """,
    tags=("vector", "quantization", "north-star"),
)
def q127_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization + reconstruction error.
    Engine-exact: scale and quotient are single IEEE ops, Spark's
    HALF_UP and DuckDB's half-away agree on every tie (both round away
    from zero), and the error fold is the same left-to-right double
    sequence on both engines (cf. q90's vector HOFs)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sc = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    qv = F.transform(F.col("v"), lambda x: F.round(x / F.col("sc")).cast("long"))
    err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("qv"),
            lambda x, q: (x - q * F.col("sc")) * (x - q * F.col("sc")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", v.alias("v"), sc.alias("sc"))
        .filter(F.col("sc") > 0)
        .withColumn("qv", qv)
        .select(
            "vec_id",
            F.concat_ws(",", F.col("qv")).alias("q_csv"),
            F.round(err, 9).alias("l2_err"),
        )
        .orderBy("vec_id")
    )


@query(
    "q128_pca_projection",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(2 AS INT) AS k,
           true AS centered_ok, true AS var_ordered_ok,
           true AS decorrelated_ok, true AS variance_share_ok
    FROM embeddings
    """,
    tags=("vector", "pca", "north-star"),
)
def q128_pca_projection(spark, sf_dir):
    """Top-2 principal-component projection of the embedding corpus
    (operators/decomp.py), driver-gated on the SPECTRAL CONTRACT the
    eigendecomposition must satisfy (the values themselves are
    sign-ambiguous and not SQL-expressible; numeric parity vs a direct
    numpy PCA is pinned in tests/test_training_ops.py): projections of
    centered data must have ~zero mean, component variances must
    descend, distinct components' projections must be uncorrelated
    (the eigen property), and the top-2 variance share must sit
    between the uniform floor 2/d and the total. A wrong eigensolver,
    a skipped centering, or a non-orthogonal basis flips a gate and
    the driver row goes red."""
    from mindseye_dataframes_spark.operators.decomp import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_project(emb, "vec_id", "embedding", k=2).select(
        F.col("pc")[0].alias("pc1"), F.col("pc")[1].alias("pc2")
    )
    total_var = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.var_samp(F.col("x").cast("double")).alias("v"))
        .agg(F.sum("v").alias("total_var"))
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("pc1").alias("m1"),
        F.avg("pc2").alias("m2"),
        F.var_samp("pc1").alias("v1"),
        F.var_samp("pc2").alias("v2"),
        F.covar_samp("pc1", "pc2").alias("c12"),
    )
    return (
        stats.crossJoin(F.broadcast(total_var))
        .select(
            "n",
            F.lit(2).alias("k"),
            F.expr(
                "abs(m1) <= 1e-6 * sqrt(v1) AND abs(m2) <= 1e-6 * sqrt(v2)"
            ).alias("centered_ok"),
            F.expr("v1 >= v2").alias("var_ordered_ok"),
            F.expr("abs(c12) <= 1e-6 * sqrt(v1 * v2)").alias("decorrelated_ok"),
            F.expr(
                "v1 + v2 <= total_var * 1.000001"
                " AND (v1 + v2) * 32 >= total_var"  # ≥ 2/64 uniform floor
            ).alias("variance_share_ok"),
        )
    )


@query(
    "q146_pagerank_fixed_point",
    oracle=f"""
    WITH {_EDGES_SQL},
    sym AS (SELECT pa AS src, pb AS dst FROM e
            UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM sym GROUP BY src),
    r1 AS (
      SELECT s.dst AS node,
             150000 + (17 * CAST(sum(1000000 // d.degree) AS BIGINT)) // 20 AS r
      FROM sym s JOIN deg d ON d.node = s.src GROUP BY s.dst),
    r2 AS (
      SELECT s.dst AS node,
             150000 + (17 * CAST(sum(p.r // d.degree) AS BIGINT)) // 20 AS r
      FROM sym s JOIN deg d ON d.node = s.src JOIN r1 p ON p.node = s.src
      GROUP BY s.dst)
    SELECT node, CAST(r AS BIGINT) AS rank_fp
    FROM r2 ORDER BY rank_fp DESC, node LIMIT 40
    """,
    tags=("graph", "pagerank", "north-star"),
)
def q146_pagerank_fixed_point(spark, sf_dir):
    """Two power-iteration steps of PageRank over the co-purchase
    graph, in FIXED-POINT micro-rank integers: contrib = r DIV deg,
    new_r = 150000 + (17·Σcontrib) DIV 20 (= damping 0.85 as the
    reduced fraction 17/20, keeping the multiplier small so the
    product stays < 2^63 even with hub sums ~5·10^17). Pure BIGINT
    arithmetic ⇒ bit-identical on every engine and every partition
    order — the reproducibility property float PageRank lacks. Plan
    per iteration: one equi-join (messages) + one hash-aggregate
    (inbox sum) — the standard diameter-bounded distributed shape;
    isolated parts (no edges) are out of the vertex set by
    construction. Top-40 via TakeOrdered, no global sort."""
    sym_a = _edges(spark, sf_dir)
    sym = sym_a.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(sym_a.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    # the degree-tagged outbox is consumed once PER ITERATION (plus
    # deg once more for r0) — unpersisted, each consumer re-derives
    # the lineitem self-join + distinct + degree aggregate (3× here;
    # 2 extra full edge derivations per additional iteration). Persist
    # it: the q126 'directed' precedent. Measured 5.1 s → 4.5 s at
    # sf0.1 (the derivation is ~2 s of the total; iterations dominate).
    from pyspark import StorageLevel

    msgs = sym.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    def iterate(ranks):
        # ranks: (node, r) — join onto the outbox, floor-divide by
        # the sender's degree, sum per receiver
        return (
            msgs.join(ranks, msgs["src"] == ranks["node"])
            .select("dst", F.expr("r DIV degree").alias("contrib"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(150000).cast("long")
                    + F.expr("(17 * sum(contrib)) DIV 20")
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )

    # r0 stays deg-derived: reading distinct senders from the cached
    # 2|E|-row outbox instead re-shuffles the full edge relation for a
    # node-count result — measured a 2-5× sf1 REGRESSION (111 s vs
    # 22 s for this form; the deg aggregate's exchange is the cheaper
    # path to the node set even though it re-derives the edges once)
    r0 = deg.select(
        F.col("src").alias("node"), F.lit(1000000).cast("long").alias("r")
    )
    r2 = iterate(iterate(r0))
    return (
        r2.select("node", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "node")
        .limit(40)
    )
