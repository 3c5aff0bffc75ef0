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
    # deg and the step states are MATERIALIZED (r10): the returned
    # frame unions all walk_len+1 step states, and without barriers
    # each union branch replays the whole unmaterialized prefix —
    # the starts subtree (which may embed an expensive graph
    # derivation) once per branch and the join chain quadratically
    # (sum over t of t joins). deg is also referenced per step and
    # would re-aggregate the edge set every time.
    deg = adj.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint()
    starts = graph.nodes
    if start_layer is not None:
        starts = starts.filter(F.col("layer") == start_layer)
    state = starts.select(
        key("layer", "node_id").alias("start"),
        key("layer", "node_id").alias("cur"),
    ).localCheckpoint()
    out = state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    for t in range(1, walk_len + 1):
        state = (
            state.join(deg, state["cur"] == deg["u"])
            .withColumn("pick", _draw(F.col("start"), F.col("cur"), t) % F.col("deg"))
            .select("start", F.col("u").alias("_u"), "pick")
            .join(adj, on=[F.col("_u") == adj["u"], F.col("pick") == adj["idx"]])
            .select("start", F.col("v").alias("cur"))
            .localCheckpoint()
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


def node2vec_walks(
    graph: OnionGraph,
    walk_len: int = 6,
    p: float = 4.0,
    q: float = 0.25,
    start_layer: str | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    from (prev, cur) the next neighbor v is drawn with weight
    1/p if v == prev (return), 1 if (prev, v) is an edge (stay
    near), 1/q otherwise (explore) — the p/q dial between BFS-like
    and DFS-like neighborhoods that plain DeepWalk lacks.

    Same determinism contract as random_walks: weights are
    1e6-scaled integers, the step-t draw is the md5(start|cur|t)
    integer mod the walk's total weight, and selection is by
    cumulative-weight interval over neighbors ordered by key — all
    exact integer arithmetic the DuckDB oracle replays verbatim.
    Step 1 is uniform (no prev yet).

    Per step: one equi-join of the frontier against the adjacency
    (plus one broadcast-shaped membership probe of (prev, v) against
    the edge set) and a per-walk window bounded by the current
    node's out-degree. T steps = T joins, all walks advance
    together. Returns (start, step, node).
    """
    wp = int(round(1_000_000 / p))
    wf = int(round(1_000_000 / q))
    key = lambda l, i: F.concat_ws(":", F.col(l), F.col(i))  # noqa: E731
    e = graph.edge_endpoints().select(
        key("src_layer", "src_id").alias("u"),
        key("dst_layer", "dst_id").alias("v"),
    ).distinct().localCheckpoint()
    adj = e
    starts = graph.nodes
    if start_layer is not None:
        starts = starts.filter(F.col("layer") == start_layer)
    state = starts.select(
        key("layer", "node_id").alias("start"),
        key("layer", "node_id").alias("cur"),
    ).withColumn("prev", F.lit(None).cast("string"))
    # only nodes with out-edges can start a walk (matches the oracle,
    # whose s0 is DISTINCT adj sources); materialized so the union
    # branches below don't replay the starts subtree (cf.
    # random_walks — same r10 barrier note)
    state = state.join(
        adj.select(F.col("u").alias("cur")).distinct(), on="cur"
    ).select("start", "cur", "prev").localCheckpoint()
    out = state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    wwin = Window.partitionBy("start").orderBy("v")
    for t in range(1, walk_len + 1):
        nbrs = state.join(adj, state["cur"] == adj["u"]).select(
            "start", "prev", "cur", "v"
        )
        if t == 1:
            nbrs = nbrs.withColumn("w", F.lit(1_000_000).cast("bigint"))
        else:
            near = adj.select(
                F.col("u").alias("prev"), F.col("v"), F.lit(1).alias("_near")
            )
            nbrs = nbrs.join(near, on=["prev", "v"], how="left").withColumn(
                "w",
                F.when(F.col("v") == F.col("prev"), F.lit(wp))
                .when(F.col("_near").isNotNull(), F.lit(1_000_000))
                .otherwise(F.lit(wf))
                .cast("bigint"),
            )
        cum = nbrs.withColumn("cum", F.sum("w").over(
            wwin.rowsBetween(Window.unboundedPreceding, 0)
        )).withColumn("tot", F.sum("w").over(wwin.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )))
        draw = _draw(F.col("start"), F.col("cur"), t) % F.col("tot")
        state = cum.filter(
            (F.col("cum") - F.col("w") <= draw) & (draw < F.col("cum"))
        ).select("start", F.col("cur").alias("prev"), F.col("v").alias("cur"))
        out = out.unionByName(
            state.select(
                "start", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
        if t % 3 == 0:
            state = state.localCheckpoint()
    return out
