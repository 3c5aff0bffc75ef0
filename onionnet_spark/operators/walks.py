"""Deterministic random-walk sampling over graphs — the corpus
generator for skip-gram graph embeddings (DeepWalk / node2vec class)
re-expressed as bounded relational iteration.

"Randomness" is a seedless deterministic draw: the neighbor picked at
step t from node v in the walk started at s is
``int(first 6 hex-digit-translated chars of md5(s|v|t)) mod deg(v)``
— reproducible across runs, partitionings, and engines (the DuckDB
oracle replays the identical arithmetic; no RNG state anywhere).

Scale shape: the adjacency list is ranked once (row_number per
source — one shuffle), then each step is one equi-join of the
frontier against it on (node, pick). All walks advance together;
T steps = T joins, not T jobs per walk. Dead ends (out-degree 0)
simply end their walk early, like every practical walker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from onionnet_spark.core import OnionGraph


def _draw(start: Column, cur: Column, step: int) -> Column:
    """Deterministic pseudo-random BIGINT from (start, cur, step)."""
    h = F.md5(F.concat_ws("|", start, cur, F.lit(str(step))))
    return F.substring(
        F.translate(h, "abcdef", "012345"), 1, 6
    ).cast("bigint")


def random_walks(
    graph: OnionGraph,
    walk_len: int = 8,
    start_layer: str | None = None,
) -> DataFrame:
    """One walk per start node, `walk_len` steps (or until a dead
    end). Returns (start_key, step, node_key) rows, step 0 = start.

    Node keys are 'layer:id' strings so the draw hashes a stable
    canonical form.
    """
    key = lambda l, i: F.concat_ws(":", F.col(l), F.col(i))  # noqa: E731
    e = graph.edge_endpoints().select(
        key("src_layer", "src_id").alias("u"),
        key("dst_layer", "dst_id").alias("v"),
    ).distinct()
    w = Window.partitionBy("u").orderBy("v")
    adj = e.withColumn("idx", F.row_number().over(w) - 1).localCheckpoint()
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    starts = graph.nodes
    if start_layer is not None:
        starts = starts.filter(F.col("layer") == start_layer)
    state = starts.select(
        key("layer", "node_id").alias("start"),
        key("layer", "node_id").alias("cur"),
    )
    out = state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    for t in range(1, walk_len + 1):
        state = (
            state.join(deg, state["cur"] == deg["u"])
            .withColumn("pick", _draw(F.col("start"), F.col("cur"), t) % F.col("deg"))
            .select("start", F.col("u").alias("_u"), "pick")
            .join(adj, on=[F.col("_u") == adj["u"], F.col("pick") == adj["idx"]])
            .select("start", F.col("v").alias("cur"))
        )
        out = out.unionByName(
            state.select(
                "start", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center, context) training pairs from walk rows —
    the DeepWalk/node2vec corpus step that turns `random_walks`
    output into word2vec-shaped examples: within each walk, every
    ordered pair of positions at distance 1..window, aggregated to
    (center, context, n) counts.

    One self-join keyed on the walk id (walks are short, so each
    join group is tiny — no skew possible by construction) and one
    count aggregation. Deterministic because the walks are.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select(
        "start", F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = walks.select(
        "start", F.col("step").alias("sb"), F.col("node").alias("context")
    )
    return (
        a.join(b, on="start")
        .filter(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
