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
    sym = half.union(half.select(F.col("d").alias("s"), F.col("s").alias("d")))
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
            edges.unpersist()
            labels.unpersist()
            raise ComponentsNotConverged(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    edges.unpersist()
    return labels.select(
        F.col("node").alias(out_node), F.col("label").alias(out_component)
    )
