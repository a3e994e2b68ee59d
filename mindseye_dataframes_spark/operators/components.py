"""Connected components over a pair relation (dedup clustering).

Near-dup pair lists (MinHash-LSH, SimHash, embedding-cosine) are not
directly actionable: keeping "one doc per pair" over-deletes when
A~B and B~C but A!~C. The actionable unit is the transitive-closure
cluster — every doc gets a ``cluster_id`` (the minimum doc id reachable
through dup edges) and curation keeps one representative per cluster.

Algorithm: iterative min-label propagation. Each round every node takes
the minimum label among itself and its neighbors; converged when no
label changes. Rounds needed = graph diameter — for dedup graphs
clusters are tiny (pairs within a near-identical group), so 2-4 rounds
in practice; ``max_iter`` bounds pathological chains. Each round is one
shuffle join + one groupBy on the edge relation — all JVM-side, nothing
collected but the single converged-check count. For planet-scale graphs
with long chains, swap in the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce"), which converges
in O(log n) rounds over the same join primitive.

The loop persists each round's labels and unpersists the previous —
without pinning, Spark would recompute the whole lineage chain every
round, turning O(rounds) work into O(rounds^2); ``localCheckpoint``
every few rounds would additionally truncate the growing plan, but
dedup graphs converge before plan depth matters.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class ComponentsNotConverged(RuntimeError):
    """Raised when label propagation exhausts ``max_iter`` with labels
    still changing — the returned clusters would be silently split."""


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_node: str = "node_id",
    out_component: str = "component_id",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Label every node in ``pairs`` with the min node id of its
    component. Returns ``[out_node, out_component]``, one row per
    distinct node.

    If the graph diameter exceeds ``max_iter`` the labels are only
    partially propagated — long chains would split into several
    cluster ids, i.e. silent over-retention in dedup curation. That
    case now ``raise``s (:class:`ComponentsNotConverged`) by default,
    or warns with ``on_nonconverged="warn"``; raise ``max_iter`` or
    switch to large-star/small-star contraction (docstring above) for
    genuinely long-chained graphs."""
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError("on_nonconverged must be 'raise' or 'warn'")
    half = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # pin the symmetrized pair relation: the node set and the edge set
    # below would otherwise EACH re-evaluate ``pairs`` — for dedup
    # callers that is the whole LSH/verify pipeline, twice
    sym = half.union(
        half.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # self-loops fold "keep own label" into the SAME join that gathers
    # neighbor labels, so each round's plan references the previous
    # round's labels exactly ONCE. The earlier formulation (join for
    # the neighborhood min + coalesce against the old labels) embedded
    # the labels plan twice per round — exponential logical-plan growth
    # that OOMs the driver's analyzer near ~10 rounds even on tiny
    # graphs. With one reference the plan grows linearly, and a
    # periodic localCheckpoint truncates even that.
    nodes = sym.select("s").distinct()
    edges = (
        sym.union(nodes.select("s", F.col("s").alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    labels = nodes.select(
        F.col("s").alias("node"), F.col("s").alias("label")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    changed = 0
    for it in range(max_iter):
        new_labels = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy(edges["s"].alias("node"))
            .agg(F.min("label").alias("label"))
        )
        if (it + 1) % 8 == 0:
            # truncate the linearly-growing plan on long chains
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); clusters are split — "
            "raise max_iter or use star-contraction for long chains"
        )
        if on_nonconverged == "raise":
            sym.unpersist()
            edges.unpersist()
            labels.unpersist()
            raise ComponentsNotConverged(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    # labels was materialized by the convergence count, so the inputs
    # can be released
    sym.unpersist()
    edges.unpersist()
    return labels.select(
        F.col("node").alias(out_node), F.col("label").alias(out_component)
    )


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_node: str = "node_id",
    out_component: str = "component_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14) — the scale path for long-chained graphs.

    Where :func:`connected_components` needs one round per hop of
    graph diameter (a 10k-node chain = 10k shuffle rounds), star
    contraction converges in O(log^2 n) rounds regardless of
    diameter; in practice a 10k chain closes in ~15 rounds. Per
    round: two groupBy/join passes over the edge relation, all
    JVM-side, edge set shrinking monotonically toward a star forest.

    - large-star: every node u links its larger neighbors to
      m(u) = min(N(u) ∪ {u}) — long tails hook onto small labels.
    - small-star: edges oriented large→small; every node u links its
      smaller neighborhood (and itself) to its minimum — flattening
      into stars.

    Convergence detector: (count, sum of xxhash64(edge)) fingerprint
    of the canonical edge set; equal fingerprints in consecutive
    rounds end the loop. A missed change needs a sum-of-hash
    collision across 64 bits — negligible next to hardware error.

    Returns ``[out_node, out_component]``, one row per distinct node
    in ``pairs`` (component id = min node id, same contract as
    :func:`connected_components`).
    """
    half = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # pin the symmetrized relation: ``all_nodes`` and ``edges`` both
    # consume it, and for dedup callers re-evaluating it means running
    # the whole LSH/verify pipeline twice
    sym = half.union(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    all_nodes = sym.select(F.col("u").alias("node")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # canonical undirected edge set, no self-loops
    edges = (
        sym.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a long sum of 64-bit hashes
            # overflows under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = s.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            s.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # e is already oriented u > v (canonical); m(u) = min smaller nbr
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        nbr_links = (
            e.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_links = m.select("u", F.col("m").alias("v"))
        return nbr_links.union(self_links).distinct()

    prev_fp = fingerprint(edges)
    for _ in range(max_iter):
        # each star step references its input 2x, so the logical plan
        # grows 4x per round — localCheckpoint EVERY round (not just
        # periodically) truncates the lineage, or the driver's analyzer
        # heap explodes around round 8 even on toy graphs. The
        # checkpoint also pins the round's edge blocks on executors,
        # so no separate persist is needed; superseded blocks are
        # released by the context cleaner when the handle drops.
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        fp = fingerprint(new_edges)
        edges.unpersist()
        edges = new_edges
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        sym.unpersist()
        all_nodes.unpersist()
        edges.unpersist()
        raise ComponentsNotConverged(
            f"star contraction did not converge in {max_iter} rounds"
        )

    # converged edge set is a star forest oriented child(u) -> root(v)
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("label"))
    out = (
        all_nodes.join(labels, "node", "left")
        .select(
            F.col("node").alias(out_node),
            F.coalesce("label", "node").alias(out_component),
        )
    )
    # materialize before releasing the inputs the plan reads from
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    all_nodes.unpersist()
    edges.unpersist()
    return out
