"""Property management & export.

Reference parity: ``onionnet/property_manager.py`` (vertex lookup,
get/set property, node labels) and ``onionnet/exporter.py:13-98``
(export vertices/edges with properties).

graph-tool property maps are per-vertex arrays addressed by handle;
relationally a "property" is simply a column, so:
  - get  -> keyed filter (Catalyst turns it into a pushed-down
    point lookup on (layer, node_id)),
  - set  -> a MERGE-shaped left join overwrite,
  - create label -> concat projection,
  - export edges -> two joins to pull src/dst attributes.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onionnet_spark.core import NODE_KEY, OnionGraph


def with_node_labels(graph: OnionGraph, prop_name: str = "node_label") -> OnionGraph:
    """Add 'layer:node_id' label column
    (reference create_node_label_property, property_manager.py:156-177)."""
    if prop_name in graph.nodes.columns:
        return graph
    return OnionGraph(
        graph.nodes.withColumn(prop_name, graph.node_key_col()),
        graph.edges,
        graph.directed,
        edges_unique_undirected=graph.edges_unique_undirected,
    )


def get_node_properties(graph: OnionGraph, layer: str, node_id: str) -> dict[str, Any]:
    """All properties of one node as a dict
    (reference view_node_properties, property_manager.py:102-130).
    Returns {} if the node does not exist (reference prints and
    returns {})."""
    rows = (
        graph.nodes.filter((F.col("layer") == layer) & (F.col("node_id") == str(node_id)))
        .limit(1)
        .collect()
    )
    return rows[0].asDict() if rows else {}


def get_node_properties_by_code(
    graph: OnionGraph, layer_code: int, node_id_code: int
) -> dict[str, Any]:
    """All properties of one node addressed by its ENCODED
    (layer_code, node_id_code) tuple — reference
    get_vertex_by_encoding_tuple (onionnet.py:125,
    property_manager.py:23-45), which indexes
    custom_id_to_vertex_index by the integer code pair.

    Codes here are the deterministic sorted-order dictionary codes
    of encoding.build_dictionary (the Spark replacement for the
    reference's first-seen driver dicts), so the lookup is two
    broadcast-sized dictionary point reads followed by the same
    keyed filter get_node_properties runs. Returns {} when either
    code is unmapped (the reference returns None)."""
    from onionnet_spark.functions.encoding import build_dictionary

    lrow = (
        build_dictionary(graph.nodes, "layer")
        .filter(F.col("code") == int(layer_code))
        .limit(1)
        .collect()
    )
    nrow = (
        build_dictionary(graph.nodes, "node_id")
        .filter(F.col("code") == int(node_id_code))
        .limit(1)
        .collect()
    )
    if not lrow or not nrow:
        return {}
    return get_node_properties(graph, lrow[0]["value"], nrow[0]["value"])


def set_node_property(
    graph: OnionGraph, layer: str, node_id: str, prop_name: str, value: Any
) -> OnionGraph:
    """Set one property on one node (reference set_vertex_property,
    property_manager.py:75-100).

    Implemented as a conditional projection — at scale, point
    mutations batch into an updates DataFrame and MERGE (R2 plans a
    bulk ``merge_node_properties``); the semantics here are the
    reference's one-vertex setter.
    """
    key_match = (F.col("layer") == layer) & (F.col("node_id") == str(node_id))
    if prop_name in graph.nodes.columns:
        nodes = graph.nodes.withColumn(
            prop_name, F.when(key_match, F.lit(value)).otherwise(F.col(prop_name))
        )
    else:
        nodes = graph.nodes.withColumn(
            prop_name, F.when(key_match, F.lit(value))
        )
    return OnionGraph(
        nodes, graph.edges, graph.directed,
        edges_unique_undirected=graph.edges_unique_undirected,
    )


def merge_node_properties(graph: OnionGraph, updates: DataFrame) -> OnionGraph:
    """Bulk property MERGE: the scale path for mutations.

    `updates` carries (layer, node_id, **prop_cols); existing nodes
    get updated values (update wins, NULL update cells leave the old
    value), columns new to the graph are added (NULL elsewhere).
    One left join on the node key — with both sides bucketed or
    co-partitioned on that key the merge is exchange-free. Unknown
    keys in `updates` are ignored (reference setters address
    existing vertices only).
    """
    upd_props = [c for c in updates.columns if c not in NODE_KEY]
    if not upd_props:
        return graph
    u = updates.dropDuplicates(NODE_KEY).select(
        *NODE_KEY, *[F.col(c).alias(f"_upd_{c}") for c in upd_props]
    )
    nodes = graph.nodes.join(u, on=NODE_KEY, how="left")
    for c in upd_props:
        if c in graph.nodes.columns:
            nodes = nodes.withColumn(c, F.coalesce(F.col(f"_upd_{c}"), F.col(c)))
        else:
            nodes = nodes.withColumn(c, F.col(f"_upd_{c}"))
    nodes = nodes.drop(*[f"_upd_{c}" for c in upd_props])
    return OnionGraph(
        nodes, graph.edges, graph.directed,
        edges_unique_undirected=graph.edges_unique_undirected,
    )


def set_edge_property(
    graph: OnionGraph,
    src: tuple[str, str],
    dst: tuple[str, str],
    prop_name: str,
    value: Any,
) -> OnionGraph:
    """Set one property on one edge (edge-dim counterpart of
    set_node_property; reference property maps cover both
    dimensions)."""
    key_match = (
        (F.col("src_layer") == src[0])
        & (F.col("src_id") == str(src[1]))
        & (F.col("dst_layer") == dst[0])
        & (F.col("dst_id") == str(dst[1]))
    )
    if prop_name in graph.edges.columns:
        edges = graph.edges.withColumn(
            prop_name, F.when(key_match, F.lit(value)).otherwise(F.col(prop_name))
        )
    else:
        edges = graph.edges.withColumn(prop_name, F.when(key_match, F.lit(value)))
    return OnionGraph(
        graph.nodes, edges, graph.directed,
        edges_unique_undirected=graph.edges_unique_undirected,
    )


def export_nodes(graph: OnionGraph, prop_names: list[str] | None = None) -> DataFrame:
    """Vertex export (reference export_info mode='v',
    exporter.py:47-52): key columns + requested properties."""
    props = prop_names if prop_names is not None else graph.node_prop_cols()
    return graph.nodes.select(*NODE_KEY, *props)


def export_edges(
    graph: OnionGraph,
    edge_prop_names: list[str] | None = None,
    node_prop_names: list[str] | None = None,
) -> DataFrame:
    """Edge export with src/dst node attributes joined in
    (reference export_info mode='e', exporter.py:53-98, which emits
    source/target ids + edge props).

    node_prop_names additionally denormalizes node properties onto
    each endpoint (columns prefixed src_/dst_).
    """
    eprops = edge_prop_names if edge_prop_names is not None else graph.edge_prop_cols()
    out = graph.edges.select("src_layer", "src_id", "dst_layer", "dst_id", *eprops)
    if node_prop_names:
        src_nodes = graph.nodes.select(
            F.col("layer").alias("src_layer"),
            F.col("node_id").alias("src_id"),
            *[F.col(p).alias(f"src_{p}") for p in node_prop_names],
        )
        dst_nodes = graph.nodes.select(
            F.col("layer").alias("dst_layer"),
            F.col("node_id").alias("dst_id"),
            *[F.col(p).alias(f"dst_{p}") for p in node_prop_names],
        )
        out = out.join(src_nodes, on=["src_layer", "src_id"], how="left").join(
            dst_nodes, on=["dst_layer", "dst_id"], how="left"
        )
    return out


def layout_by_layer(
    graph: OnionGraph, x_spacing: float = 1.0, y_spacing: float = 1.0
) -> DataFrame:
    """Deterministic layered layout coordinates as a DataFrame.

    The data side of the reference's visualisation module
    (onionnet/visualisation.py): one column per layer (x = layer
    rank), nodes stacked within their layer (y = rank of node_id in
    the layer). Rendering itself is a driver/matplotlib concern and
    stays out of the engine; this transform gives any plotting
    front-end stable coordinates.

    x = layer rank comes from the (tiny, broadcast) layer dictionary
    rather than a global unpartitioned window, which would funnel
    every node through one partition at scale; y ranks only shuffle
    within a layer.
    """
    from pyspark.sql import Window

    from onionnet_spark.functions.encoding import build_dictionary

    layer_dict = build_dictionary(graph.nodes, "layer").select(
        F.col("value").alias("layer"), F.col("code").alias("layer_rank")
    )
    within = (
        F.row_number().over(Window.partitionBy("layer").orderBy("node_id")) - 1
    )
    return (
        graph.nodes.join(F.broadcast(layer_dict), on="layer")
        .select(
            "layer",
            "node_id",
            (F.col("layer_rank").cast("double") * x_spacing).alias("x"),
            (within.cast("double") * y_spacing).alias("y"),
        )
    )


_STYLE_TRANSFORMS = {
    "abs": F.abs,
    "sqrt": F.sqrt,
    "log1p": F.log1p,
}


def style_columns(
    graph: OnionGraph,
    size_prop: str,
    color_prop: str,
    size_range: tuple[float, float] = (1.0, 10.0),
    power: float = 1.0,
    transform: str | Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Property-to-size/color mapping: the data side of the
    reference's visualisation helpers (onionnet/visualisation.py
    prop_to_size, :734-790, maps a numeric property to vertex size
    with optional transform_func and power; graph_draw colors by a
    categorical property).

    size  = lo + ((t(v) - mn) / (mx - mn)) ** power * (hi - lo)
            where t = `transform` (named: abs/sqrt/log1p, or any
            Column -> Column callable) applied BEFORE the min/max,
            and (lo, hi) = `size_range`. Constant property ->
            mid-range, like the reference. The reference applies the
            power to the RAW values but interps them against the
            un-powered min/max (np.interp then clamps most of the
            range to `ma`); scaling the NORMALIZED value keeps the
            documented intent — nonlinear emphasis inside the full
            output range — without the clamp artifact.
    color = dense dictionary code of `color_prop` (broadcast dict).

    Cross-engine note: small integer powers are expanded to repeated
    multiplication (correctly-rounded IEEE ops, bit-identical in any
    engine); fractional powers go through pow(), which libm does not
    correctly round — oracles should prefer integer powers.

    Returns (layer, node_id, size, color_code).
    """
    from onionnet_spark.functions.encoding import build_dictionary

    if transform is None:
        tcol = F.col(size_prop)
    elif callable(transform):
        tcol = transform(F.col(size_prop))
    else:
        try:
            tcol = _STYLE_TRANSFORMS[transform](F.col(size_prop))
        except KeyError:
            raise ValueError(
                f"unknown transform {transform!r}; "
                f"named options: {sorted(_STYLE_TRANSFORMS)}"
            ) from None

    base = graph.nodes.withColumn("_tv", tcol)
    stats = base.agg(F.min("_tv").alias("mn"), F.max("_tv").alias("mx"))
    color_dict = build_dictionary(graph.nodes, color_prop).select(
        F.col("value").alias(color_prop), F.col("code").alias("color_code")
    )
    lo, hi = size_range
    span = F.col("mx") - F.col("mn")
    norm = (F.col("_tv") - F.col("mn")) / span
    if float(power) == 1.0:
        powered = norm
    elif float(power).is_integer() and 2 <= int(power) <= 4:
        powered = norm
        for _ in range(int(power) - 1):
            powered = powered * norm
    else:
        powered = F.pow(norm, float(power))
    size = F.when(span > 0, lo + powered * (hi - lo)).otherwise(
        F.lit((lo + hi) / 2.0)
    )
    return (
        base.crossJoin(F.broadcast(stats))
        .join(F.broadcast(color_dict), on=color_prop, how="left")
        .select(
            "layer",
            "node_id",
            F.round(size, 6).alias("size"),
            "color_code",
        )
    )


def bipartite_ordered_layout(
    graph: OnionGraph,
    left_layer: str,
    right_layer: str,
    sort_left_by: str = "node_id",
    vertical_spacing: float = 30.0,
    horizontal_spacing: float = 1.0,
) -> DataFrame:
    """Barycenter bipartite layout: coordinates that make the
    left-right edges as horizontal as possible (the data side of
    reference visualisation.py:539-624 bipartite_ordered_layout).

    1) left side  = nodes of `left_layer`, ranked by `sort_left_by`
       (reference default: vertex id -> our node_id);
    2) right side = nodes of `right_layer`, ranked by the AVERAGE
       left-rank of their neighbors across edges in either direction
       (no-neighbor nodes average 0, like the reference; ties break
       by node_id where the reference's stable sort keeps vertex
       order). Per reference all_neighbors semantics, multi-edges
       count once per edge in the average.
    3) x = 0 (left) / `horizontal_spacing` (right);
       y = rank * `vertical_spacing`.

    Scale shape: the per-side ranks are windows partitioned by layer
    — one partition per side, fine for the rendering-sized graphs a
    layout targets; for a layout over a billion-node side, swap the
    rank for functions.corpus.global_rank's two-phase
    percentile-bucket ranking. The average is an integer-sum /
    count division (correctly-rounded IEEE), so rank order is
    engine-exact.

    Returns (layer, node_id, x, y).
    """
    from pyspark.sql import Window

    left = graph.nodes.filter(F.col("layer") == left_layer)
    right = graph.nodes.filter(F.col("layer") == right_layer)
    lw = Window.partitionBy("layer").orderBy(sort_left_by)
    left_idx = left.select(
        "layer",
        "node_id",
        (F.row_number().over(lw) - 1).cast("bigint").alias("idx"),
    )

    e = graph.edge_endpoints()
    pairs = (
        e.filter(
            (F.col("src_layer") == left_layer)
            & (F.col("dst_layer") == right_layer)
        )
        .select(F.col("src_id").alias("lid"), F.col("dst_id").alias("rid"))
        .unionByName(
            e.filter(
                (F.col("src_layer") == right_layer)
                & (F.col("dst_layer") == left_layer)
            ).select(F.col("dst_id").alias("lid"), F.col("src_id").alias("rid"))
        )
    )
    avg_idx = (
        pairs.join(
            left_idx.select(F.col("node_id").alias("lid"), "idx"), on="lid"
        )
        .groupBy("rid")
        .agg(F.avg("idx").alias("aidx"))
    )
    rw = Window.partitionBy("layer").orderBy("aidx", "node_id")
    right_idx = (
        right.join(
            avg_idx.withColumnRenamed("rid", "node_id"), on="node_id", how="left"
        )
        .withColumn("aidx", F.coalesce("aidx", F.lit(0.0)))
        .select(
            "layer",
            "node_id",
            (F.row_number().over(rw) - 1).cast("bigint").alias("idx"),
        )
    )
    return left_idx.select(
        "layer",
        "node_id",
        F.lit(0.0).alias("x"),
        (F.col("idx") * vertical_spacing).alias("y"),
    ).unionByName(
        right_idx.select(
            "layer",
            "node_id",
            F.lit(float(horizontal_spacing)).alias("x"),
            (F.col("idx") * vertical_spacing).alias("y"),
        )
    )


def annotate_nodes(
    graph: OnionGraph,
    computations: dict[str, Callable[[OnionGraph], DataFrame]],
) -> OnionGraph:
    """Batch property-recompute pipeline: run each analytic against
    the INPUT graph and MERGE its value back as a node property —
    the mutation DSL replacing the reference's per-vertex property
    setter loops (property_manager.py:75-100) with one declarative
    merge per computed column.

    Each computation maps graph -> DataFrame(layer, node_id, value);
    its single value column is renamed to the computation's key. All
    merges are node-key left joins (merge_node_properties), so with
    co-partitioned inputs the whole pipeline is one scan of the node
    table plus the analytics themselves; computations see the
    ORIGINAL graph, never each other's outputs (no hidden ordering).
    """
    out = graph
    for name, fn in computations.items():
        res = fn(graph)
        val_cols = [c for c in res.columns if c not in NODE_KEY]
        if len(val_cols) != 1:
            raise ValueError(
                f"computation {name!r} must return exactly one value "
                f"column besides the node key, got {val_cols}"
            )
        out = merge_node_properties(
            out, res.select(*NODE_KEY, F.col(val_cols[0]).alias(name))
        )
    return out


def export_adjacency(graph: OnionGraph, direction: str = "downstream") -> DataFrame:
    """Adjacency-list export: per node, the SORTED array of its
    'layer:id' neighbor keys plus degree — the CSR-shaped layout a
    GNN data loader or sampling service consumes (one row per node,
    neighbors contiguous, deterministic order).

    One shuffle on the source key; collect_list runs inside the
    aggregation (map-side partials). A hub's array is as big as its
    degree — at 100 TB pair this with a degree cap or the bucketed
    graph layout so one row never exceeds task memory.
    """
    if direction == "sym":
        e = graph.cached_symmetrized()
    else:
        e = graph.cached_endpoints(direction)
    u = F.concat_ws(":", "src_layer", "src_id")
    v = F.concat_ws(":", "dst_layer", "dst_id")
    return (
        e.select(u.alias("node_key"), v.alias("nbr"))
        .groupBy("node_key")
        .agg(
            F.array_sort(F.collect_list("nbr")).alias("neighbors"),
            F.count("*").cast("bigint").alias("degree"),
        )
    )
