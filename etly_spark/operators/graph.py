"""Iterative graph operators over pair tables.

``connected_components`` is the clustering primitive behind near-dup
grouping: min-label propagation to *convergence* (not a fixed unroll —
a fixed K silently mislabels any component whose diameter exceeds K).
Each round is one small shuffle over the edge table; ``localCheckpoint``
truncates the growing lineage every round so the loop's cost stays
O(rounds), not O(rounds²) of re-planning. Rounds needed = the largest
distance from any node to its component's minimum-label node, so the
loop exits fast on the shallow clusters dedup actually produces.

Scale: the input is the *verified pair graph* (post LSH + verify), which
is proportional to true-duplicate density — never the corpus. The loop
is the standard Pregel-style pattern: driver controls iteration, data
never leaves the cluster, per-round state is one (node, label) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its connected component. Returns (doc_id, label).

    Iterates min-label propagation until a full round changes no label
    (guaranteed fixpoint: labels are monotone non-increasing and bounded
    below by the component minimum), with ``max_iter`` as a safety rail.
    """
    nodes = (
        pairs.select(F.col(src).alias("doc_id"))
        .unionAll(pairs.select(F.col(dst).alias("doc_id")))
        .distinct()
    )
    # undirected edges + self-loops (a node always sees its own label)
    adj = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .unionAll(nodes.select(F.col("doc_id").alias("u"), F.col("doc_id").alias("v")))
        .persist()
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint()
    try:
        for _ in range(max_iter):
            new_labels = (
                adj.join(labels, adj["v"] == labels["doc_id"])
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .select(F.col("u").alias("doc_id"), "label")
                .localCheckpoint()  # eager: materializes + truncates lineage
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        adj.unpersist()
