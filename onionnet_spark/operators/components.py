"""Connected components.

Reference parity: ``onionnet/searcher.py:284-298`` (view_components)
delegates to graph-tool label_components and keeps components above
a size threshold.

Spark-first: hash-min label propagation over the symmetrized edge
list — every node's label converges to the MINIMUM canonical key
('layer:node_id' string) in its weak component. Each iteration is
one shuffle (groupBy node key); iterations needed = graph diameter.
The TPC-H-style reference graphs here are shallow (diameter <= 6).
For high-diameter / power-law graphs at 100 TB the scale path is
alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce"), which converges in
O(log^2 n) — planned R2; the public API stays identical.

Lineage is truncated with localCheckpoint every few rounds —
without it the iterative self-join plan grows exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.core import NODE_KEY, OnionGraph

CHECKPOINT_EVERY = 3


def connected_components(graph: OnionGraph, max_iterations: int = 50) -> DataFrame:
    """Weak connected components.

    Returns DataFrame(layer, node_id, component) where component is
    the min 'layer:node_id' string key in the node's component.
    """
    sym = graph.symmetrized_edges().persist()
    labels = graph.nodes.select(
        "layer", "node_id", graph.node_key_col().alias("component")
    ).persist()
    try:
        for it in range(max_iterations):
            # candidate label for each dst = min label among in-neighbors
            cand = (
                sym.join(
                    labels.select(
                        F.col("layer").alias("src_layer"),
                        F.col("node_id").alias("src_id"),
                        F.col("component").alias("nbr_component"),
                    ),
                    on=["src_layer", "src_id"],
                )
                .groupBy(
                    F.col("dst_layer").alias("layer"), F.col("dst_id").alias("node_id")
                )
                .agg(F.min("nbr_component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(cand, on=NODE_KEY, how="left")
                .select(
                    "layer",
                    "node_id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_component", "component")
                    ).alias("component"),
                )
            )
            if (it + 1) % CHECKPOINT_EVERY == 0:
                new_labels = new_labels.localCheckpoint(eager=False)
            new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), on=NODE_KEY)
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def view_components(
    graph: OnionGraph, size_threshold: int, connectivity: str = "weak"
) -> DataFrame:
    """Components meeting the size threshold (searcher.py:284-298).

    Returns DataFrame(layer, node_id, component, component_size) for
    nodes in qualifying components. Strong connectivity is a planned
    R2 op (forward/backward reachability trim); weak matches the
    reference's directed=False mode.
    """
    if connectivity.lower() == "strong":
        raise NotImplementedError("strong components planned (R2); use 'weak'")
    labels = connected_components(graph)
    sizes = labels.groupBy("component").agg(F.count("*").alias("component_size"))
    return labels.join(
        F.broadcast(sizes.filter(F.col("component_size") >= size_threshold)),
        on="component",
    )
