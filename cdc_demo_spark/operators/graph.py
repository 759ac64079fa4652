"""Connected components over a pair/edge DataFrame — the step that
turns near-duplicate PAIRS into duplicate CLUSTERS (pick one survivor
per cluster, drop the rest), which is what a corpus dedup pipeline
actually ships.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min label in its closed
neighborhood; stop when no label changes. Rounds needed = graph
diameter — near-dup components are small and dense (dups of the same
document), so this converges in 2-3 rounds in practice. Each round is
one join + one aggregate (two shuffles) on the EDGE list only — node
payloads never move.

At 100 TB scale the same loop holds because the edge list after LSH
banding is ~linear in corpus size; for adversarial long-chain graphs
swap in the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014), which converges in
O(log n) rounds with the same join/agg building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min node id reachable from `id`.

    `nodes` carries every id (isolated docs form their own singleton
    cluster); `edges` is undirected (symmetrized internally). The
    driver loop only checks a convergence COUNT per round — data stays
    distributed; lineage is cut each round with localCheckpoint so the
    plan doesn't grow exponentially across iterations."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).alias("label"))

    for _ in range(max_iter):
        # min label among self + neighbors
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
            .unionByName(labels)
            .groupBy("u")
            .agg(F.min("label").alias("new_label"))
        )
        merged = labels.join(neighbor_labels, "u").localCheckpoint(eager=True)
        changed = merged.filter(F.col("label") != F.col("new_label")).limit(1).count()
        labels = merged.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))
