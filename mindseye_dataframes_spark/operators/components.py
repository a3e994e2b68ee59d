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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_node: str = "node_id",
    out_component: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node in ``pairs`` with the min node id of its
    component. Returns ``[out_node, out_component]``, one row per
    distinct node."""
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = (
        edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    labels = edges.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy(edges["s"].alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
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

    edges.unpersist()
    return labels.select(
        F.col("node").alias(out_node), F.col("label").alias(out_component)
    )
