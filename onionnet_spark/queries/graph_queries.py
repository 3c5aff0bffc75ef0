"""Graph operator queries (SURVEY §2 #1-22) with DuckDB oracles.

Every query runs the Spark-native operator on the TPC-H multilayer
graph; the oracle recomputes the same answer in pure SQL (recursive
CTEs for traversals, unrolled iterations for PageRank) on the same
parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.core import OnionGraph
from onionnet_spark.functions.encoding import decode_dictionary, encode_dictionary
from onionnet_spark.operators import analytics, components, filters, properties, traversal
from onionnet_spark.queries import register
from onionnet_spark.sources.tpch_graph import build_graph, graph_ctes

import threading

_GRAPH_CACHE: dict[tuple[int, str], OnionGraph] = {}
# one lock for every query-layer memo (r11): queries are built from
# concurrent driver threads (the schema-gate sweep, guide §2.6 job
# overlap), and an unguarded check-then-build would persist duplicate
# graph instances, pinning orphans until session end
_MEMO_LOCK = threading.RLock()


def get_graph(spark: SparkSession, sf_dir: str) -> OnionGraph:
    key = (id(spark), sf_dir)
    with _MEMO_LOCK:
        if key not in _GRAPH_CACHE:
            _GRAPH_CACHE[key] = build_graph(spark, sf_dir).persist()
    return _GRAPH_CACHE[key]


_DERIVED_CACHE: dict[tuple[int, str, str], OnionGraph] = {}


def derived_graph(spark, sf_dir: str, key: str, build) -> OnionGraph:
    """Memoize a query's DERIVED graph (layer view, co-supply
    projection, bipartite cut) per (session, sf_dir): repeat
    executions — bench best-of-2, repeated driver checks in one
    session — reuse the instance's persisted canonical/symmetrized/
    degree views instead of rebuilding them per call. Holding the
    reference here also keeps OnionGraph.__del__'s cache release
    from firing while the registry can still re-serve the graph.
    """
    k = (id(spark), sf_dir, key)
    with _MEMO_LOCK:
        if k not in _DERIVED_CACHE:
            _DERIVED_CACHE[k] = build()
    return _DERIVED_CACHE[k]



def _entity_graph(spark, sf_dir) -> OnionGraph:
    """The memoized 4-layer entity view (region/nation/customer/
    supplier) shared by the whole centrality/community/sketch family
    (r10): before this, each of ~17 queries built its OWN view
    instance, so the instance-scoped persisted caches (symmetrized,
    canonical, degree, int-keyed endpoints) were re-materialized per
    query AND per bench iteration; one shared instance builds each
    cache once per session. Pure view sharing — every query still
    computes its result from the parquet inputs."""
    return derived_graph(
        spark, sf_dir, "eigen_layers",
        lambda: filters.view_layers(
            get_graph(spark, sf_dir),
            ["region", "nation", "customer", "supplier"],
        ),
    )


CTES = graph_ctes()

# --------------------------------------------------------------------------
# Build & properties
# --------------------------------------------------------------------------


@register(
    "graph_build_nodes",
    f"WITH {CTES} SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_nodes "
    "FROM nodes_g GROUP BY layer",
)
def graph_build_nodes(spark, sf_dir):
    return get_graph(spark, sf_dir).layers()


@register(
    "graph_build_edges",
    f"WITH {CTES} SELECT src_layer, dst_layer, etype, "
    "CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges_g "
    "GROUP BY src_layer, dst_layer, etype",
)
def graph_build_edges(spark, sf_dir):
    return (
        get_graph(spark, sf_dir)
        .edges.groupBy("src_layer", "dst_layer", "etype")
        .agg(F.count("*").alias("n_edges"))
    )


@register(
    "encode_layer_dict",
    f"WITH {CTES} SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT)"
    " AS code FROM (SELECT DISTINCT layer AS value FROM nodes_g)",
)
def encode_layer_dict(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    _, dictionary = encode_dictionary(g.nodes, "layer")
    return dictionary


@register(
    "encode_decode_roundtrip",
    f"""WITH {CTES},
    d AS (SELECT value, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT) AS code
          FROM (SELECT DISTINCT name AS value FROM nodes_g WHERE layer = 'orders'))
    SELECT n.node_id, d.code AS name_code, d.value AS name_decoded
    FROM nodes_g n JOIN d ON d.value = n.name WHERE n.layer = 'orders'""",
)
def encode_decode_roundtrip(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    orders = g.nodes.filter(F.col("layer") == "orders")
    encoded, dictionary = encode_dictionary(orders, "name", out_col="name_code")
    decoded = decode_dictionary(encoded, "name_code", dictionary, "name_decoded")
    return decoded.select("node_id", "name_code", "name_decoded")


@register(
    "node_labels",
    f"WITH {CTES} SELECT layer, node_id, layer || ':' || node_id AS node_label "
    "FROM nodes_g WHERE layer = 'nation'",
)
def node_labels(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    labeled = properties.with_node_labels(g)
    return labeled.nodes.filter(F.col("layer") == "nation").select(
        "layer", "node_id", "node_label"
    )


@register(
    "node_properties_lookup",
    f"WITH {CTES} SELECT layer, node_id, name, val FROM nodes_g "
    "WHERE layer = 'customer' AND node_id = '1'",
)
def node_properties_lookup(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    return g.nodes.filter(
        (F.col("layer") == "customer") & (F.col("node_id") == "1")
    ).select("layer", "node_id", "name", "val")


@register(
    "export_edges",
    f"""WITH {CTES}
    SELECT e.src_layer, e.src_id, e.dst_layer, e.dst_id, e.etype, e.weight,
           sn.name AS src_name, dn.name AS dst_name
    FROM edges_g e
    JOIN nodes_g sn ON sn.layer = e.src_layer AND sn.node_id = e.src_id
    JOIN nodes_g dn ON dn.layer = e.dst_layer AND dn.node_id = e.dst_id
    WHERE e.etype = 'in_region'""",
)
def export_edges_q(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    sub = filters.filter_edges(g, F.col("etype") == "in_region")
    return properties.export_edges(sub, ["etype", "weight"], ["name"])


# --------------------------------------------------------------------------
# Traversal
# --------------------------------------------------------------------------


def _bfs_oracle(seed_where: str, direction: str, max_dist: int | None) -> str:
    fwd = direction == "downstream"
    join_on = (
        "e.src_layer = b.layer AND e.src_id = b.node_id"
        if fwd
        else "e.dst_layer = b.layer AND e.dst_id = b.node_id"
    )
    nxt = "e.dst_layer, e.dst_id" if fwd else "e.src_layer, e.src_id"
    depth = f"WHERE b.dist < {max_dist}" if max_dist is not None else ""
    return f"""WITH RECURSIVE {CTES},
    bfs AS (
      SELECT layer, node_id, 0 AS dist FROM nodes_g WHERE {seed_where}
      UNION
      SELECT {nxt}, b.dist + 1 FROM bfs b
      JOIN edges_g e ON {join_on} {depth}
    )
    SELECT layer, node_id, CAST(MIN(dist) AS INT) AS dist
    FROM bfs GROUP BY layer, node_id"""


@register(
    "khop_downstream",
    _bfs_oracle("layer = 'customer' AND node_id = '1'", "downstream", 2),
)
def khop_downstream(spark, sf_dir):
    return traversal.k_hop(get_graph(spark, sf_dir), ("customer", "1"), 2, "downstream")


@register(
    "khop_upstream", _bfs_oracle("layer = 'region' AND node_id = '0'", "upstream", 2)
)
def khop_upstream(spark, sf_dir):
    return traversal.k_hop(get_graph(spark, sf_dir), ("region", "0"), 2, "upstream")


@register(
    "khop_bi",
    f"""WITH RECURSIVE {CTES},
    down AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1 FROM down b
      JOIN edges_g e ON e.src_layer = b.layer AND e.src_id = b.node_id
      WHERE b.dist < 2
    ),
    up AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.src_layer, e.src_id, b.dist + 1 FROM up b
      JOIN edges_g e ON e.dst_layer = b.layer AND e.dst_id = b.node_id
      WHERE b.dist < 2
    )
    SELECT layer, node_id, CAST(MIN(dist) AS INT) AS dist
    FROM (SELECT * FROM down UNION ALL SELECT * FROM up)
    GROUP BY layer, node_id""",
)
def khop_bi(spark, sf_dir):
    return traversal.k_hop(get_graph(spark, sf_dir), ("customer", "1"), 2, "bi")


@register(
    "khop_bi_children",
    f"""WITH RECURSIVE {CTES},
    down AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1 FROM down b
      JOIN edges_g e ON e.src_layer = b.layer AND e.src_id = b.node_id
      WHERE b.dist < 2
    ),
    up AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.src_layer, e.src_id, b.dist + 1 FROM up b
      JOIN edges_g e ON e.dst_layer = b.layer AND e.dst_id = b.node_id
      WHERE b.dist < 2
    ),
    kids AS (
      SELECT e.dst_layer AS layer, e.dst_id AS node_id, u.dist + 1 AS dist
      FROM (SELECT layer, node_id, MIN(dist) AS dist FROM up GROUP BY 1, 2) u
      JOIN edges_g e ON e.src_layer = u.layer AND e.src_id = u.node_id
    )
    SELECT layer, node_id, CAST(MIN(dist) AS INT) AS dist
    FROM (SELECT * FROM down UNION ALL SELECT * FROM up
          UNION ALL SELECT * FROM kids)
    GROUP BY layer, node_id""",
)
def khop_bi_children(spark, sf_dir):
    """Reference search(direction='bi', include_upstream_children=True)
    (searcher.py:212-216): bi ego set widened by the out-neighbors of
    every upstream node."""
    return traversal.k_hop(
        get_graph(spark, sf_dir),
        ("customer", "1"),
        2,
        "bi",
        include_upstream_children=True,
    )


@register(
    "reachability", _bfs_oracle("layer = 'region' AND node_id = '0'", "upstream", None)
)
def reachability(spark, sf_dir):
    return traversal.reachable(get_graph(spark, sf_dir), ("region", "0"), "upstream")


@register(
    "sssp_hops", _bfs_oracle("layer = 'orders' AND node_id = '1'", "downstream", None)
)
def sssp_hops(spark, sf_dir):
    return traversal.reachable(get_graph(spark, sf_dir), ("orders", "1"), "downstream")


@register(
    "on_shortest_path",
    f"""WITH RECURSIVE {CTES},
    fwd AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1 FROM fwd b
      JOIN edges_g e ON e.src_layer = b.layer AND e.src_id = b.node_id
    ),
    d_f AS (SELECT layer, node_id, MIN(dist) AS d_f FROM fwd GROUP BY 1, 2),
    rev AS (
      SELECT layer, node_id, 0 AS dist FROM nodes_g WHERE layer = 'region'
      UNION
      SELECT e.src_layer, e.src_id, b.dist + 1 FROM rev b
      JOIN edges_g e ON e.dst_layer = b.layer AND e.dst_id = b.node_id
    ),
    d_r AS (SELECT layer, node_id, MIN(dist) AS d_r FROM rev GROUP BY 1, 2),
    target_dists AS (
      SELECT DISTINCT d_f AS td FROM d_f WHERE layer = 'region'
    )
    SELECT f.layer, f.node_id, CAST(f.d_f AS INT) AS d_f, CAST(r.d_r AS INT) AS d_r
    FROM d_f f JOIN d_r r ON r.layer = f.layer AND r.node_id = f.node_id
    WHERE f.d_f + r.d_r IN (SELECT td FROM target_dists)""",
)
def on_shortest_path_q(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    targets = [("region", str(i)) for i in range(5)]
    return traversal.on_shortest_path(g, ("customer", "1"), targets)


# --------------------------------------------------------------------------
# Views & filters
# --------------------------------------------------------------------------


@register(
    "view_layers",
    f"""WITH {CTES}
    SELECT e.src_layer, e.src_id, e.dst_layer, e.dst_id FROM edges_g e
    WHERE e.src_layer IN ('customer', 'nation') AND e.dst_layer IN ('customer', 'nation')""",
)
def view_layers_q(spark, sf_dir):
    g = filters.view_layers(get_graph(spark, sf_dir), ["customer", "nation"])
    return g.edge_endpoints()


@register(
    "filter_by_property",
    f"""WITH {CTES}
    SELECT node_id, name, val FROM nodes_g
    WHERE layer = 'customer' AND val >= 9000""",
)
def filter_by_property_q(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    cust = filters.view_layers(g, "customer")
    filtered = filters.filter_view_by_property(cust, "val", 9000.0, ">=", dim="v")
    return filtered.nodes.select("node_id", "name", "val")


@register(
    "filter_edges_prune",
    f"""WITH {CTES},
    fe AS (SELECT * FROM edges_g WHERE etype = 'li_part' AND weight >= 45),
    touched AS (
      SELECT src_layer AS layer, src_id AS node_id FROM fe
      UNION
      SELECT dst_layer, dst_id FROM fe
    )
    SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM touched GROUP BY layer""",
)
def filter_edges_prune_q(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    pred = (F.col("etype") == "li_part") & (F.col("weight") >= 45)
    pruned = filters.filter_edges(g, pred, prune=True)
    return pruned.nodes.groupBy("layer").agg(F.count("*").alias("n_nodes"))


@register(
    "compose_filters",
    f"""WITH {CTES}
    SELECT layer, node_id, val FROM nodes_g
    WHERE (layer = 'customer' AND val >= 8000) OR (layer = 'supplier' AND val >= 5000)""",
)
def compose_filters_q(spark, sf_dir):
    g = get_graph(spark, sf_dir)
    cond = filters.compose_filters(
        [
            filters.compose_filters(
                [F.col("layer") == "customer", F.col("val") >= 8000], "and"
            ),
            filters.compose_filters(
                [F.col("layer") == "supplier", F.col("val") >= 5000], "and"
            ),
        ],
        "or",
    )
    return filters.filter_nodes(g, cond).nodes.select("layer", "node_id", "val")


@register(
    "bipartite_view",
    f"""WITH {CTES},
    cross_e AS (
      SELECT * FROM edges_g
      WHERE (src_layer = 'lineitem' AND dst_layer = 'part')
         OR (src_layer = 'part' AND dst_layer = 'lineitem')
    ),
    touched AS (
      SELECT src_layer AS layer, src_id AS node_id FROM cross_e
      UNION
      SELECT dst_layer, dst_id FROM cross_e
    )
    SELECT layer, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM touched GROUP BY layer""",
)
def bipartite_view_q(spark, sf_dir):
    g = derived_graph(
        spark, sf_dir, "bipartite_li_part",
        # persist: the expensive part is the prune semi-joins over
        # lineitem, not a cached view, so cache the frames themselves
        lambda: filters.bipartite_view(
            get_graph(spark, sf_dir), "lineitem", "part"
        ).persist(),
    )
    return g.nodes.groupBy("layer").agg(F.count("*").alias("n_nodes"))


# --------------------------------------------------------------------------
# Components & analytics
# --------------------------------------------------------------------------

_CC_LAYERS = "('region', 'nation', 'customer')"


@register(
    "components_weak",
    f"""WITH RECURSIVE {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {_CC_LAYERS}),
    es AS (
      SELECT e.src_layer, e.src_id, e.dst_layer, e.dst_id FROM edges_g e
      WHERE e.src_layer IN {_CC_LAYERS} AND e.dst_layer IN {_CC_LAYERS}
    ),
    und AS (
      SELECT src_layer AS al, src_id AS ai, dst_layer AS bl, dst_id AS bi FROM es
      UNION
      SELECT dst_layer, dst_id, src_layer, src_id FROM es
    ),
    reach AS (
      SELECT layer AS sl, node_id AS si, layer, node_id FROM ns
      UNION
      SELECT r.sl, r.si, u.bl, u.bi FROM reach r
      JOIN und u ON u.al = r.layer AND u.ai = r.node_id
    )
    SELECT sl AS layer, si AS node_id, MIN(layer || ':' || node_id) AS component
    FROM reach GROUP BY sl, si""",
)
def components_weak_q(spark, sf_dir):
    g = derived_graph(
        spark, sf_dir, "view_rnc",
        lambda: filters.view_layers(
            get_graph(spark, sf_dir), ["region", "nation", "customer"]
        ),
    )
    return components.connected_components(g)


@register(
    "merge_props",
    f"""WITH {CTES}
    SELECT layer, node_id,
           CASE WHEN layer = 'orders' THEN val * 2 ELSE val END AS val
    FROM nodes_g""",
)
def merge_props_q(spark, sf_dir):
    # bulk MERGE: double `val` on the orders layer; other layers and
    # NULL update cells keep their old values.
    g = get_graph(spark, sf_dir)
    updates = g.nodes.filter(F.col("layer") == "orders").select(
        "layer", "node_id", (F.col("val") * 2).alias("val")
    )
    merged = properties.merge_node_properties(g, updates)
    return merged.nodes.select("layer", "node_id", "val")


@register(
    "sql_surface",
    f"""WITH {CTES}
    SELECT n.layer, CAST(COUNT(DISTINCT n.node_id) AS BIGINT) AS n_nodes,
           CAST(COUNT(e.dst_layer) AS BIGINT) AS n_out_edges
    FROM nodes_g n LEFT JOIN edges_g e
      ON e.src_layer = n.layer AND e.src_id = n.node_id
    GROUP BY n.layer""",
)
def sql_surface_q(spark, sf_dir):
    # the same graph exposed through spark.sql over temp views —
    # DataFrame and SQL programs hit identical Catalyst plans.
    g = get_graph(spark, sf_dir)
    nv, ev = g.create_views()
    return spark.sql(
        f"""SELECT n.layer, CAST(COUNT(DISTINCT n.node_id) AS BIGINT) AS n_nodes,
                   CAST(COUNT(e.dst_layer) AS BIGINT) AS n_out_edges
            FROM {nv} n LEFT JOIN {ev} e
              ON e.src_layer = n.layer AND e.src_id = n.node_id
            GROUP BY n.layer"""
    )


@register(
    "style_columns",
    f"""WITH {CTES},
    stats AS (SELECT MIN(val) AS mn, MAX(val) AS mx FROM nodes_g),
    d AS (SELECT value AS layer, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT) AS color_code
          FROM (SELECT DISTINCT layer AS value FROM nodes_g))
    SELECT n.layer, n.node_id,
           ROUND(CASE WHEN s.mx - s.mn > 0
                      THEN 1.0 + (n.val - s.mn) / (s.mx - s.mn) * 9.0
                      ELSE 5.5 END, 6) AS size,
           d.color_code
    FROM nodes_g n CROSS JOIN stats s JOIN d USING (layer)""",
)
def style_columns_q(spark, sf_dir):
    return properties.style_columns(
        get_graph(spark, sf_dir), size_prop="val", color_prop="layer"
    )


@register(
    "graph_incremental",
    f"""WITH {CTES}
    SELECT layer, node_id, name FROM nodes_g
    WHERE layer IN ('region', 'nation', 'customer')""",
)
def graph_incremental_q(spark, sf_dir):
    # Incremental MERGE growth: base = region+nation; the delta
    # re-adds every nation node with a corrupted name (must be
    # SKIPPED: base wins, reference skip-existing semantics), plus
    # the customer layer and its edges. The oracle is simply the
    # 3-layer node set with ORIGINAL names, so any delta-wins bug
    # hash-mismatches.
    from onionnet_spark.builder import merge_onion
    from onionnet_spark.core import OnionGraph

    g = get_graph(spark, sf_dir)
    base = filters.view_layers(g, ["region", "nation"])
    delta_nodes = (
        g.nodes.filter(F.col("layer") == "nation")
        .withColumn("name", F.concat(F.col("name"), F.lit("_dup")))
        .unionByName(g.nodes.filter(F.col("layer") == "customer"))
    )
    delta_edges = g.edges.filter(
        ((F.col("src_layer") == "customer") & (F.col("dst_layer") == "nation"))
        | ((F.col("src_layer") == "nation") & (F.col("dst_layer") == "region"))
    )
    merged = merge_onion(base, OnionGraph(delta_nodes, delta_edges))
    return merged.nodes.select("layer", "node_id", "name")


@register(
    "layout_by_layer",
    f"""WITH {CTES},
    d AS (SELECT value AS layer, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT) AS lr
          FROM (SELECT DISTINCT layer AS value FROM nodes_g))
    SELECT n.layer, n.node_id,
           CAST(d.lr AS DOUBLE) * 2.0 AS x,
           CAST(ROW_NUMBER() OVER (PARTITION BY n.layer ORDER BY n.node_id) - 1 AS DOUBLE) * 1.0 AS y
    FROM nodes_g n JOIN d USING (layer)""",
)
def layout_by_layer_q(spark, sf_dir):
    return properties.layout_by_layer(get_graph(spark, sf_dir), x_spacing=2.0)


@register(
    "style_columns_power",
    # Every op exact cross-engine: abs, subtraction, one division
    # (correctly-rounded IEEE), norm*norm (power=2 expands to
    # multiplication, never libm pow), *9, +1.
    f"""WITH {CTES},
    t AS (SELECT layer, node_id, ABS(val) AS tv FROM nodes_g),
    stats AS (SELECT MIN(tv) AS mn, MAX(tv) AS mx FROM t),
    d AS (SELECT value AS layer, CAST(ROW_NUMBER() OVER (ORDER BY value) - 1 AS INT) AS color_code
          FROM (SELECT DISTINCT layer AS value FROM nodes_g))
    SELECT n.layer, n.node_id,
           ROUND(CASE WHEN s.mx - s.mn > 0
                      THEN 1.0 + ((n.tv - s.mn) / (s.mx - s.mn))
                               * ((n.tv - s.mn) / (s.mx - s.mn)) * 9.0
                      ELSE 5.5 END, 6) AS size,
           d.color_code
    FROM t n CROSS JOIN stats s JOIN d USING (layer)""",
)
def style_columns_power_q(spark, sf_dir):
    """prop_to_size's power/transform path (reference
    visualisation.py:734): |val| -> min-max -> squared emphasis.
    power=2 exercises the nonlinear branch; abs the transform hook
    (val has negatives, so abs also keeps the domain sane)."""
    return properties.style_columns(
        get_graph(spark, sf_dir),
        size_prop="val",
        color_prop="layer",
        power=2,
        transform="abs",
    )


@register(
    "bipartite_layout",
    f"""WITH {CTES},
    li AS (SELECT node_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY node_id) - 1 AS BIGINT) AS idx
           FROM nodes_g WHERE layer = 'customer'),
    pairs AS (
      SELECT src_id AS lid, dst_id AS rid FROM edges_g
      WHERE src_layer = 'customer' AND dst_layer = 'nation'
      UNION ALL
      SELECT dst_id, src_id FROM edges_g
      WHERE dst_layer = 'customer' AND src_layer = 'nation'),
    av AS (SELECT rid, AVG(li.idx) AS aidx
           FROM pairs JOIN li ON li.node_id = pairs.lid GROUP BY rid),
    rn AS (SELECT n.node_id, COALESCE(av.aidx, 0.0) AS aidx
           FROM nodes_g n LEFT JOIN av ON av.rid = n.node_id
           WHERE n.layer = 'nation'),
    ri AS (SELECT node_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY aidx, node_id) - 1 AS BIGINT) AS idx
           FROM rn)
    SELECT 'customer' AS layer, node_id, 0.0 AS x, idx * 30.0 AS y FROM li
    UNION ALL
    SELECT 'nation' AS layer, node_id, 1.0 AS x, idx * 30.0 AS y FROM ri""",
)
def bipartite_layout_q(spark, sf_dir):
    """Barycenter bipartite layout of the customer-nation cut:
    customers ranked by id on the left, nations ordered by the mean
    left-rank of their customers on the right (reference
    visualisation.py:539-624)."""
    return properties.bipartite_ordered_layout(
        get_graph(spark, sf_dir), left_layer="customer", right_layer="nation"
    )


def _sssp_weighted_oracle(n_steps: int = 8) -> str:
    # unrolled Bellman-Ford: d_{k} = min(d_{k-1}, d_{k-1}+w over
    # reversed edges); 8 steps > the 5-hop layer diameter, so the
    # fixpoint is reached in both engines.
    stages = []
    for i in range(1, n_steps + 1):
        stages.append(
            # MATERIALIZED: each stage references the previous one twice;
            # DuckDB inlines plain CTEs, which would replay the whole
            # chain 2^n times (20s -> 0.2s on this oracle)
            f"""d{i} AS MATERIALIZED (
      SELECT k, MIN(dist) AS dist FROM (
        SELECT k, dist FROM d{i - 1}
        UNION ALL
        SELECT e.d AS k, p.dist + e.w AS dist FROM d{i - 1} p JOIN e ON e.s = p.k
      ) GROUP BY k
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    e AS MATERIALIZED (SELECT dst_layer || ':' || dst_id AS s, src_layer || ':' || src_id AS d,
                 weight AS w FROM edges_g),
    d0 AS (SELECT 'region:0' AS k, CAST(0 AS DOUBLE) AS dist),
    {stage_sql}
    SELECT split_part(k, ':', 1) AS layer, split_part(k, ':', 2) AS node_id,
           ROUND(dist, 6) AS dist
    FROM d{n_steps}"""


def _on_shortest_weighted_oracle(n_steps: int = 8) -> str:
    def bf(prefix: str, edges_cte: str, seeds_sql: str) -> str:
        stages = [f"{prefix}0 AS ({seeds_sql})"]
        for i in range(1, n_steps + 1):
            stages.append(
                f"""{prefix}{i} AS MATERIALIZED (
      SELECT k, MIN(dist) AS dist FROM (
        SELECT k, dist FROM {prefix}{i - 1}
        UNION ALL
        SELECT e.d AS k, p.dist + e.w AS dist
        FROM {prefix}{i - 1} p JOIN {edges_cte} e ON e.s = p.k
      ) GROUP BY k
    )"""
            )
        return ",\n    ".join(stages)

    fwd = bf("f", "ef", "SELECT 'orders:1' AS k, CAST(0 AS DOUBLE) AS dist")
    rev = bf(
        "r",
        "er",
        " UNION ALL ".join(
            f"SELECT 'region:{i}' AS k, CAST(0 AS DOUBLE) AS dist" for i in range(5)
        ),
    )
    lyrs = "('region', 'nation', 'customer', 'orders')"
    return f"""WITH {CTES},
    es AS MATERIALIZED (SELECT * FROM edges_g
           WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    ef AS MATERIALIZED (SELECT src_layer || ':' || src_id AS s, dst_layer || ':' || dst_id AS d,
                  weight AS w FROM es),
    er AS MATERIALIZED (SELECT dst_layer || ':' || dst_id AS s, src_layer || ':' || src_id AS d,
                  weight AS w FROM es),
    {fwd},
    {rev},
    td AS (SELECT DISTINCT ROUND(dist, 6) AS td FROM f{n_steps}
           WHERE split_part(k, ':', 1) = 'region')
    SELECT split_part(f.k, ':', 1) AS layer, split_part(f.k, ':', 2) AS node_id,
           ROUND(f.dist, 6) AS d_f, ROUND(r.dist, 6) AS d_r
    FROM f{n_steps} f JOIN r{n_steps} r ON r.k = f.k
    WHERE ROUND(f.dist + r.dist, 6) IN (SELECT td FROM td)"""


@register("on_shortest_weighted", None)
def on_shortest_weighted_q(spark, sf_dir):
    # restricted to the order->customer->nation->region cone so the
    # reverse fixpoint does not relax the lineitem fan-out; targets =
    # every region (the reference wires ALL targets to one artificial
    # sink, searcher.py:75-86)
    g = filters.view_layers(
        get_graph(spark, sf_dir), ["region", "nation", "customer", "orders"]
    )
    return traversal.on_shortest_path_weighted(
        g, ("orders", "1"), [("region", str(i)) for i in range(5)]
    )


@register("sssp_weighted", None)
def sssp_weighted_q(spark, sf_dir):
    d = traversal.weighted_sssp(get_graph(spark, sf_dir), [("region", "0")], "upstream")
    return d.select("layer", "node_id", F.round("dist", 6).alias("dist"))


@register(
    "components_strong",
    f"""WITH {CTES}
    SELECT layer, node_id, layer || ':' || node_id AS component,
           CAST(1 AS BIGINT) AS component_size
    FROM nodes_g WHERE layer IN ('region', 'nation', 'customer', 'supplier')""",
)
def components_strong_q(spark, sf_dir):
    # The reference-style graph is a DAG (child->parent layer edges),
    # so every SCC is a singleton — which makes the oracle EXACT: any
    # incorrect merge by the trim/color/collect machinery breaks the
    # hash. Cyclic SCCs: components_strong_cyclic below.
    g = _entity_graph(spark, sf_dir)
    return components.view_components(g, 1, "strong")


@register(
    "components_strong_cyclic",
    f"""WITH {CTES},
    sup0 AS (SELECT DISTINCT src_id AS node_id FROM edges_g
             WHERE src_layer = 'supplier' AND dst_layer = 'nation'
               AND dst_id = '0'),
    sz AS (SELECT COUNT(*) + 1 AS s FROM sup0)
    SELECT * FROM (
      SELECT 'nation' AS layer, '0' AS node_id, 'nation:0' AS component,
             CAST((SELECT s FROM sz) AS BIGINT) AS component_size
      UNION ALL
      SELECT 'supplier' AS layer, node_id, 'nation:0' AS component,
             CAST((SELECT s FROM sz) AS BIGINT) AS component_size
      FROM sup0
    ) WHERE component_size >= 2""",
)
def components_strong_cyclic(spark, sf_dir):
    """Strong CC on a graph with a REAL cycle (VERDICT r2 item 6: the
    DAG query exercises only the Trim phase). Adds reverse
    nation-0 -> supplier edges for every supplier in nation 0, making
    {nation:0} ∪ {its suppliers} one non-trivial SCC that the
    FW-BW-Trim color/collect machinery must find exactly; threshold 2
    returns just that component. Oracle: closed-form membership."""
    g = filters.view_layers(get_graph(spark, sf_dir), ["nation", "supplier"])
    e = g.edge_endpoints()
    rev = (
        e.filter(
            (F.col("src_layer") == "supplier")
            & (F.col("dst_layer") == "nation")
            & (F.col("dst_id") == "0")
        )
        .select(
            F.col("dst_layer").alias("src_layer"),
            F.col("dst_id").alias("src_id"),
            F.col("src_layer").alias("dst_layer"),
            F.col("src_id").alias("dst_id"),
        )
    )
    cyc = OnionGraph(g.nodes, e.unionByName(rev))
    return components.view_components(cyc, 2, "strong")


@register(
    "graph_scc_condensation",
    # graph-tool condensation_graph parity. The ring construction
    # (nations of region 0 cycled by sorted node_id) makes ONE
    # multi-node SCC whose members all point at region:0 — so the
    # condensed edge carries a REAL multiplicity (n_edges = ring
    # size), exercising the aggregation, not just the relabeling.
    # Component label = min node key (string min; all ring keys share
    # the 'nation:' prefix so MIN over the ids matches).
    f"""WITH {{CTES}},
    ring AS (SELECT DISTINCT src_id FROM edges_g
             WHERE src_layer = 'nation' AND dst_layer = 'region'
               AND dst_id = '0'),
    rl AS (SELECT 'nation:' || MIN(src_id) AS lbl,
                  COUNT(*) AS rs FROM ring),
    ne AS (SELECT src_id, dst_id FROM edges_g
           WHERE src_layer = 'nation' AND dst_layer = 'region'),
    ce AS (
      SELECT CASE WHEN src_id IN (SELECT src_id FROM ring)
                  THEN (SELECT lbl FROM rl)
                  ELSE 'nation:' || src_id END AS src_component,
             'region:' || dst_id AS dst_component,
             CASE WHEN src_id IN (SELECT src_id FROM ring)
                  THEN (SELECT rs FROM rl) ELSE 1 END AS ssize
      FROM ne)
    SELECT src_component, dst_component,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(MIN(ssize) AS BIGINT) AS src_size,
           CAST(1 AS BIGINT) AS dst_size
    FROM ce GROUP BY src_component, dst_component""".replace(
        "{CTES}", CTES
    ),
)
def graph_scc_condensation_q(spark, sf_dir):
    """Condensation DAG over a graph with a real multi-node SCC: the
    nations of region 0 are cycled into a ring (i -> i+1 by sorted
    node_id, derived from the data), so the condensation must emit
    the ring super-node's edge to region:0 with multiplicity = ring
    size, and every other nation as a singleton. The ring window is
    bounded by |nations of one region| (5 rows) — not a global sort."""
    from pyspark.sql import Window

    g = derived_graph(
        spark, sf_dir, "nation_region_layers",
        lambda: filters.view_layers(
            get_graph(spark, sf_dir), ["nation", "region"]
        ),
    )
    e = g.edge_endpoints()
    r0 = (
        e.filter(
            (F.col("src_layer") == "nation")
            & (F.col("dst_layer") == "region")
            & (F.col("dst_id") == "0")
        )
        .select("src_id")
        .distinct()
    )
    w = Window.orderBy("src_id")  # bounded: nations of ONE region
    ring = (
        r0.select(
            "src_id",
            F.coalesce(
                F.lead("src_id").over(w), F.first("src_id").over(w)
            ).alias("next_id"),
        )
        .select(
            F.lit("nation").alias("src_layer"),
            F.col("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.col("next_id").alias("dst_id"),
        )
    )
    cyc = OnionGraph(g.nodes, e.unionByName(ring, allowMissingColumns=True))
    return components.condensation_graph(cyc)


@register(
    "pagerank",
    None,  # oracle generated below (unrolled iterations)
)
def pagerank_q(spark, sf_dir):
    g = _entity_graph(spark, sf_dir)
    pr = analytics.pagerank(g, n_iterations=5, damping=0.85)
    return pr.select("layer", "node_id", F.round("pagerank", 6).alias("pagerank"))


def _pagerank_oracle(
    n_iter: int = 5, damping: float = 0.85, final_select: str | None = None
) -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    stages = []
    for i in range(1, n_iter + 1):
        stages.append(
            f"""pr{i} AS MATERIALIZED (
      SELECT ns.layer, ns.node_id,
             (1 - {damping}) / (SELECT n FROM nn) + {damping} * COALESCE(c.contrib, 0) AS pr
      FROM ns LEFT JOIN (
        SELECT e.dst_layer AS layer, e.dst_id AS node_id, SUM(p.pr / d.od) AS contrib
        FROM es e
        JOIN pr{i - 1} p ON p.layer = e.src_layer AND p.node_id = e.src_id
        JOIN deg d ON d.src_layer = e.src_layer AND d.src_id = e.src_id
        GROUP BY e.dst_layer, e.dst_id
      ) c ON c.layer = ns.layer AND c.node_id = ns.node_id
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    final = (
        final_select
        or f"SELECT layer, node_id, ROUND(pr, 6) AS pagerank FROM pr{n_iter}"
    )
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (SELECT * FROM edges_g WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    deg AS MATERIALIZED (SELECT src_layer, src_id, COUNT(*) AS od FROM es GROUP BY 1, 2),
    nn AS (SELECT COUNT(*) AS n FROM ns),
    pr0 AS (SELECT layer, node_id, 1.0 / (SELECT n FROM nn) AS pr FROM ns),
    {stage_sql}
    {final}"""


from onionnet_spark.queries import REGISTRY as _REG  # noqa: E402

def components_weak_star_q(spark, sf_dir):
    # same subgraph and output contract as components_weak, computed
    # with the O(log^2 n) large-star/small-star contraction instead
    # of diameter-bound label propagation — both must match the same
    # recursive-CTE oracle.
    g = filters.view_layers(get_graph(spark, sf_dir), ["region", "nation", "customer"])
    return components.connected_components_star(g)


_REG["pagerank"] = (pagerank_q, _pagerank_oracle())
_REG["sssp_weighted"] = (sssp_weighted_q, _sssp_weighted_oracle())
_REG["on_shortest_weighted"] = (on_shortest_weighted_q, _on_shortest_weighted_oracle())
_REG["components_weak_star"] = (components_weak_star_q, _REG["components_weak"][1])


@register(
    "degrees",
    f"""WITH {CTES},
    od AS (SELECT src_layer AS layer, src_id AS node_id, COUNT(*) AS c FROM edges_g GROUP BY 1, 2),
    idg AS (SELECT dst_layer AS layer, dst_id AS node_id, COUNT(*) AS c FROM edges_g GROUP BY 1, 2)
    SELECT n.layer, n.node_id,
           CAST(COALESCE(od.c, 0) AS BIGINT) AS out_degree,
           CAST(COALESCE(idg.c, 0) AS BIGINT) AS in_degree,
           CAST(COALESCE(od.c, 0) + COALESCE(idg.c, 0) AS BIGINT) AS degree
    FROM nodes_g n
    LEFT JOIN od ON od.layer = n.layer AND od.node_id = n.node_id
    LEFT JOIN idg ON idg.layer = n.layer AND idg.node_id = n.node_id""",
)
def degrees_q(spark, sf_dir):
    return analytics.degrees(get_graph(spark, sf_dir))


@register(
    "triangle_count",
    """WITH sp AS (
      SELECT DISTINCT l_partkey AS part, s_nationkey AS nat
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    ),
    e AS (
      SELECT DISTINCT 'nation:' || CAST(a.nat AS VARCHAR) AS a,
                      'nation:' || CAST(b.nat AS VARCHAR) AS b
      FROM sp a JOIN sp b ON a.part = b.part
      WHERE 'nation:' || CAST(a.nat AS VARCHAR) < 'nation:' || CAST(b.nat AS VARCHAR)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
)
def triangle_count_q(spark, sf_dir):
    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    sp = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("part"),
            F.col("s_nationkey").cast("string").alias("nat"),
        )
        .distinct()
    )
    co_edges = (
        sp.alias("a")
        .join(sp.alias("b"), on="part")
        .filter(F.col("a.nat") < F.col("b.nat"))
        .select(
            F.lit("nation").alias("src_layer"),
            F.col("a.nat").alias("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.col("b.nat").alias("dst_id"),
        )
        .distinct()
    )
    nations = t["nation"].select(
        F.lit("nation").alias("layer"), F.col("n_nationkey").cast("string").alias("node_id")
    )
    g = derived_graph(
        spark, sf_dir, "cosupply_nations", lambda: OnionGraph(nations, co_edges)
    )
    return analytics.triangle_count(g)


# --------------------------------------------------------------------------
# Personalized PageRank & k-core (round 2 additions)
# --------------------------------------------------------------------------

# customer seeds: in the child->parent edge orientation customers
# have out-edges (customer -> nation -> region), so seeded mass
# actually propagates; region nodes are sinks and would trap it
_PPR_SEEDS = [("customer", "0"), ("customer", "1"), ("customer", "2")]


@register("graph_ppr", None)  # oracle generated below (unrolled iterations)
def graph_ppr_q(spark, sf_dir):
    g = _entity_graph(spark, sf_dir)
    pr = analytics.personalized_pagerank(
        g, _PPR_SEEDS, n_iterations=5, damping=0.85
    )
    return pr.select("layer", "node_id", F.round("ppr", 6).alias("ppr"))


def _ppr_oracle(n_iter: int = 5, damping: float = 0.85) -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    n_seeds = len(_PPR_SEEDS)
    seeds_sql = " UNION ALL ".join(
        f"SELECT '{l}' AS layer, '{i}' AS node_id" for (l, i) in _PPR_SEEDS
    )
    base = f"((1 - {damping}) / {n_seeds})"
    stages = []
    for i in range(1, n_iter + 1):
        stages.append(
            f"""p{i} AS MATERIALIZED (
      SELECT ns.layer, ns.node_id,
             {base} * (CASE WHEN s.layer IS NOT NULL THEN 1 ELSE 0 END)
               + {damping} * COALESCE(c.contrib, 0) AS pr
      FROM ns
      LEFT JOIN sd s ON s.layer = ns.layer AND s.node_id = ns.node_id
      LEFT JOIN (
        SELECT e.dst_layer AS layer, e.dst_id AS node_id, SUM(p.pr / d.od) AS contrib
        FROM es e
        JOIN p{i - 1} p ON p.layer = e.src_layer AND p.node_id = e.src_id
        JOIN deg d ON d.src_layer = e.src_layer AND d.src_id = e.src_id
        GROUP BY e.dst_layer, e.dst_id
      ) c ON c.layer = ns.layer AND c.node_id = ns.node_id
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (SELECT * FROM edges_g
          WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    deg AS MATERIALIZED (SELECT src_layer, src_id, COUNT(*) AS od FROM es GROUP BY 1, 2),
    sd AS ({seeds_sql}),
    p0 AS (SELECT ns.layer, ns.node_id,
                  CASE WHEN s.layer IS NOT NULL THEN 1.0 / {n_seeds} ELSE 0 END AS pr
           FROM ns LEFT JOIN sd s ON s.layer = ns.layer AND s.node_id = ns.node_id),
    {stage_sql}
    SELECT layer, node_id, ROUND(pr, 6) AS ppr FROM p{n_iter}"""


def _kcore_oracle(k: int = 2, n_stages: int = 12) -> str:
    stages = []
    for i in range(1, n_stages + 1):
        stages.append(
            f"""d{i} AS (SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM e{i - 1} UNION ALL SELECT b FROM e{i - 1}) GROUP BY n),
    k{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {k}),
    e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i - 1} e
      JOIN k{i} x ON x.n = e.a JOIN k{i} y ON y.n = e.b)"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    e0 AS MATERIALIZED (
      SELECT DISTINCT
        LEAST(src_layer || ':' || src_id, dst_layer || ':' || dst_id) AS a,
        GREATEST(src_layer || ':' || src_id, dst_layer || ':' || dst_id) AS b
      FROM edges_g
      WHERE src_layer || ':' || src_id <> dst_layer || ':' || dst_id),
    {stage_sql}
    SELECT split_part(n, ':', 1) AS layer,
           substr(n, length(split_part(n, ':', 1)) + 2) AS node_id,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM (SELECT a AS n FROM e{n_stages} UNION ALL SELECT b FROM e{n_stages})
    GROUP BY n"""


@register("graph_kcore", None)  # oracle attached below (generated)
def graph_kcore_q(spark, sf_dir):
    return analytics.k_core(get_graph(spark, sf_dir), k=2)


_REG["graph_ppr"] = (graph_ppr_q, _ppr_oracle())
_REG["graph_kcore"] = (graph_kcore_q, _kcore_oracle())


@register("graph_communities_lpa", None)  # oracle generated below
def graph_communities_lpa_q(spark, sf_dir):
    from onionnet_spark.operators.components import label_propagation_communities

    g = _entity_graph(spark, sf_dir)
    return label_propagation_communities(g, n_rounds=5)


def _lpa_oracle(n_rounds: int = 5) -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    stages = []
    for i in range(1, n_rounds + 1):
        stages.append(
            f"""cnt{i} AS (
      SELECT s.dst AS key, p.label, COUNT(*) AS c
      FROM sym s JOIN l{i - 1} p ON p.key = s.src
      GROUP BY s.dst, p.label),
    best{i} AS (SELECT key, label AS new_label FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY c DESC, label) AS rn
      FROM cnt{i}) WHERE rn = 1),
    l{i} AS MATERIALIZED (
      SELECT p.key, COALESCE(b.new_label, p.label) AS label
      FROM l{i - 1} p LEFT JOIN best{i} b ON b.key = p.key)"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id, layer || ':' || node_id AS key
           FROM nodes_g WHERE layer IN {lyrs}),
    es AS (SELECT * FROM edges_g
           WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    sym AS MATERIALIZED (
      SELECT DISTINCT src_layer || ':' || src_id AS src,
                      dst_layer || ':' || dst_id AS dst FROM es
      UNION
      SELECT DISTINCT dst_layer || ':' || dst_id, src_layer || ':' || src_id FROM es),
    l0 AS (SELECT key, key AS label FROM ns),
    {stage_sql}
    SELECT ns.layer, ns.node_id, l.label AS community
    FROM ns JOIN l{n_rounds} l ON l.key = ns.key"""


@register(
    "graph_node_jaccard",
    f"""WITH {CTES},
    sym AS (
      SELECT DISTINCT src_layer, src_id, dst_layer, dst_id FROM edges_g
      UNION
      SELECT DISTINCT dst_layer, dst_id, src_layer, src_id FROM edges_g),
    nbr AS (SELECT DISTINCT src_id AS id, dst_layer || ':' || dst_id AS nbr
            FROM sym WHERE src_layer = 'nation'),
    hot AS (SELECT nbr FROM nbr GROUP BY nbr HAVING COUNT(*) > 1000),
    nf AS (SELECT id, nbr FROM nbr WHERE nbr NOT IN (SELECT nbr FROM hot)),
    sizes AS (SELECT id, COUNT(*) AS n FROM nf GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
      FROM nf a JOIN nf b ON a.nbr = b.nbr AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           ROUND(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b""",
)
def graph_node_jaccard_q(spark, sf_dir):
    return analytics.node_jaccard(
        get_graph(spark, sf_dir), layer="nation", min_jaccard=0.0
    )


_REG["graph_communities_lpa"] = (graph_communities_lpa_q, _lpa_oracle())


_BC_SOURCES = [("nation", "0"), ("nation", "12")]


@register("graph_betweenness", None)  # oracle generated below
def graph_betweenness_q(spark, sf_dir):
    g = _entity_graph(spark, sf_dir)
    return analytics.betweenness_sampled(g, _BC_SOURCES, max_depth=6)


def _betweenness_oracle(max_depth: int = 6) -> str:
    """Unrolls Brandes' two phases per sample source: forward BFS
    levels carrying sigma (path counts), then deepest-first delta
    accumulation; MATERIALIZED per stage (several reference the
    previous stage twice)."""
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    parts = []
    unions = []
    for idx, (sl, si) in enumerate(_BC_SOURCES):
        p = f"s{idx}"
        skey = f"{sl}:{si}"
        parts.append(
            f"{p}f0 AS (SELECT '{skey}' AS key, CAST(1 AS DOUBLE) AS sigma)"
        )
        parts.append(f"{p}v0 AS (SELECT key FROM {p}f0)")
        for d in range(1, max_depth + 1):
            parts.append(
                f"""{p}f{d} AS MATERIALIZED (
      SELECT s.dst AS key, SUM(f.sigma) AS sigma
      FROM sym s JOIN {p}f{d - 1} f ON f.key = s.src
      WHERE s.dst NOT IN (SELECT key FROM {p}v{d - 1})
      GROUP BY s.dst)"""
            )
            parts.append(
                f"""{p}v{d} AS MATERIALIZED (
      SELECT key FROM {p}v{d - 1} UNION SELECT key FROM {p}f{d})"""
            )
        parts.append(
            f"""{p}d{max_depth} AS (
      SELECT key, sigma, CAST(0 AS DOUBLE) AS delta FROM {p}f{max_depth})"""
        )
        for d in range(max_depth - 1, -1, -1):
            parts.append(
                f"""{p}d{d} AS MATERIALIZED (
      SELECT f.key, f.sigma, COALESCE(c.delta, 0) AS delta
      FROM {p}f{d} f LEFT JOIN (
        SELECT s.src AS key,
               SUM(f2.sigma / dn.sigma * (1 + dn.delta)) AS delta
        FROM sym s
        JOIN {p}d{d + 1} dn ON dn.key = s.dst
        JOIN {p}f{d} f2 ON f2.key = s.src
        GROUP BY s.src
      ) c ON c.key = f.key)"""
            )
        unions.extend(
            f"SELECT key, delta FROM {p}d{d}" for d in range(1, max_depth + 1)
        )
    stage_sql = ",\n    ".join(parts)
    union_sql = "\n      UNION ALL ".join(unions)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id, layer || ':' || node_id AS key
           FROM nodes_g WHERE layer IN {lyrs}),
    es AS (SELECT * FROM edges_g
           WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    sym AS MATERIALIZED (
      SELECT DISTINCT src_layer || ':' || src_id AS src,
                      dst_layer || ':' || dst_id AS dst FROM es
      UNION
      SELECT DISTINCT dst_layer || ':' || dst_id, src_layer || ':' || src_id FROM es),
    {stage_sql},
    bc AS (SELECT key, SUM(delta) AS bc FROM (
      {union_sql}) GROUP BY key)
    SELECT ns.layer, ns.node_id,
           ROUND(COALESCE(bc.bc, 0), 6) AS betweenness
    FROM ns LEFT JOIN bc ON bc.key = ns.key"""


_REG["graph_betweenness"] = (graph_betweenness_q, _betweenness_oracle())


@register(
    "graph_clustering_coeff",
    # same nation co-occurrence graph as triangle_count; per-node
    # triangle corners + degrees -> cc = 2t / d(d-1)
    """WITH sp AS (
      SELECT DISTINCT l_partkey AS part, s_nationkey AS nat
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    ),
    e AS (
      SELECT DISTINCT 'nation:' || CAST(a.nat AS VARCHAR) AS a,
                      'nation:' || CAST(b.nat AS VARCHAR) AS b
      FROM sp a JOIN sp b ON a.part = b.part
      WHERE 'nation:' || CAST(a.nat AS VARCHAR) < 'nation:' || CAST(b.nat AS VARCHAR)
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT x AS k FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    ),
    tpn AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS t FROM corners GROUP BY k),
    deg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS d FROM (
      SELECT a AS k FROM e UNION ALL SELECT b FROM e) GROUP BY k)
    SELECT 'nation' AS layer, CAST(n.n_nationkey AS VARCHAR) AS node_id,
      COALESCE(deg.d, 0) AS degree,
      COALESCE(tpn.t, 0) AS n_triangles,
      CASE WHEN COALESCE(deg.d, 0) >= 2
           THEN ROUND(2.0 * COALESCE(tpn.t, 0) / (deg.d * (deg.d - 1)), 6)
           ELSE 0.0 END AS clustering_coeff
    FROM nation n
    LEFT JOIN deg ON deg.k = 'nation:' || CAST(n.n_nationkey AS VARCHAR)
    LEFT JOIN tpn ON tpn.k = 'nation:' || CAST(n.n_nationkey AS VARCHAR)""",
)
def graph_clustering_coeff_q(spark, sf_dir):
    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    sp = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("part"),
            F.col("s_nationkey").cast("string").alias("nat"),
        )
        .distinct()
    )
    co_edges = (
        sp.alias("a")
        .join(sp.alias("b"), on="part")
        .filter(F.col("a.nat") < F.col("b.nat"))
        .select(
            F.lit("nation").alias("src_layer"),
            F.col("a.nat").alias("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.col("b.nat").alias("dst_id"),
        )
        .distinct()
    )
    nations = t["nation"].select(
        F.lit("nation").alias("layer"), F.col("n_nationkey").cast("string").alias("node_id")
    )
    g = derived_graph(
        spark, sf_dir, "cosupply_nations", lambda: OnionGraph(nations, co_edges)
    )
    return analytics.local_clustering_coefficient(g)


# --------------------------------------------------------------------------
# ANF neighborhood-function sketch (k-mins), fully deterministic
# --------------------------------------------------------------------------


@register("graph_anf", None)  # oracle generated below (unrolled rounds)
def graph_anf_q(spark, sf_dir):
    # the memoized entity-layer view (shared with eigenvector /
    # hyperanf / anf_growth): its persisted int-keyed edge index and
    # the collision check are built once per session instead of per
    # call (r10 — the per-call rebuild ate the narrow-key win)
    g = _entity_graph(spark, sf_dir)
    return analytics.neighborhood_function_sketch(g, radius=3, k=8)


def _anf_oracle(radius: int = 3, k: int = 8) -> str:
    """Unrolls the k-mins sketch propagation: identical md5-derived
    draws, identical per-round elementwise MIN, identical MLE — a
    full hash-match oracle for an approximate algorithm (the
    APPROXIMATION is deterministic; only its relation to the true
    ball size is statistical)."""
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    mcols = [f"m{j}" for j in range(k)]
    init = ",\n             ".join(
        f"('0x' || substr(md5('{j}|' || layer || ':' || node_id), 1, 8))::BIGINT"
        f" / 4294967296.0 AS m{j}"
        for j in range(k)
    )
    stages = []
    for r in range(1, radius + 1):
        mins = ", ".join(f"MIN({c}) AS {c}" for c in mcols)
        props = ", ".join(f"s.{c}" for c in mcols)
        stages.append(
            f"""s{r} AS MATERIALIZED (
      SELECT layer, node_id, {mins} FROM (
        SELECT * FROM s{r - 1}
        UNION ALL
        SELECT e.src_layer AS layer, e.src_id AS node_id, {props}
        FROM es e JOIN s{r - 1} s
          ON s.layer = e.dst_layer AND s.node_id = e.dst_id
      ) GROUP BY layer, node_id)"""
        )
    stage_sql = ",\n    ".join(stages)
    total = " + ".join(mcols)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (
      SELECT src_layer, src_id, dst_layer, dst_id FROM edges_g
      WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    s0 AS MATERIALIZED (
      SELECT layer, node_id,
             {init}
      FROM ns),
    {stage_sql}
    SELECT layer, node_id, ROUND({float(k)} / ({total}) - 1.0, 6) AS est_ball
    FROM s{radius}"""


_REG["graph_anf"] = (graph_anf_q, _anf_oracle())


# --------------------------------------------------------------------------
# Sampled harmonic closeness (pivot BFS batched in one sweep)
# --------------------------------------------------------------------------

_CLOSENESS_PIVOTS = [("region", "0"), ("region", "1"), ("nation", "5")]


@register(
    "graph_closeness",
    f"""WITH RECURSIVE {CTES},
    bfs(sid, layer, node_id, dist) AS (
      SELECT * FROM (VALUES
        ('region:0', 'region', '0', 0),
        ('region:1', 'region', '1', 0),
        ('nation:5', 'nation', '5', 0)) t(sid, layer, node_id, dist)
      UNION
      SELECT b.sid, e.src_layer, e.src_id, b.dist + 1
      FROM bfs b JOIN edges_g e
        ON e.dst_layer = b.layer AND e.dst_id = b.node_id
    ),
    d AS (SELECT sid, layer, node_id, MIN(dist) AS dist
          FROM bfs GROUP BY 1, 2, 3)
    SELECT n.layer, n.node_id,
      ROUND(COALESCE(SUM(840 // d.dist), 0) / 840.0, 6) AS harmonic
    FROM nodes_g n
    LEFT JOIN d ON d.layer = n.layer AND d.node_id = n.node_id AND d.dist > 0
    GROUP BY n.layer, n.node_id""",
)
def graph_closeness_q(spark, sf_dir):
    return analytics.harmonic_closeness_sampled(
        get_graph(spark, sf_dir), _CLOSENESS_PIVOTS, max_depth=8,
        direction="upstream",
    )


# --------------------------------------------------------------------------
# Batch property recompute pipeline (mutation DSL)
# --------------------------------------------------------------------------


@register("graph_annotate", None)  # oracle generated below
def graph_annotate_q(spark, sf_dir):
    """Recompute degree + pagerank and merge both into the node
    table in one annotate_nodes pipeline; the query exports the
    annotated properties."""
    from onionnet_spark.core import NODE_KEY

    g = _entity_graph(spark, sf_dir)
    ann = properties.annotate_nodes(
        g,
        {
            "ann_degree": lambda gg: analytics.degrees(gg).select(
                *NODE_KEY, F.col("degree").alias("v")
            ),
            "ann_pagerank": lambda gg: analytics.pagerank(gg, 5).select(
                *NODE_KEY, F.round("pagerank", 6).alias("v")
            ),
        },
    )
    return ann.nodes.select("layer", "node_id", "ann_degree", "ann_pagerank")


_REG["graph_annotate"] = (
    graph_annotate_q,
    _pagerank_oracle(
        final_select="""
    , od AS (SELECT src_layer AS layer, src_id AS node_id, COUNT(*) AS c
             FROM es GROUP BY 1, 2)
    , idg AS (SELECT dst_layer AS layer, dst_id AS node_id, COUNT(*) AS c
              FROM es GROUP BY 1, 2)
    SELECT ns.layer, ns.node_id,
           CAST(COALESCE(od.c, 0) + COALESCE(idg.c, 0) AS BIGINT) AS ann_degree,
           ROUND(p.pr, 6) AS ann_pagerank
    FROM ns
    LEFT JOIN od ON od.layer = ns.layer AND od.node_id = ns.node_id
    LEFT JOIN idg ON idg.layer = ns.layer AND idg.node_id = ns.node_id
    JOIN pr5 p ON p.layer = ns.layer AND p.node_id = ns.node_id"""
    ),
)


def _hits_oracle(n_iter: int = 3) -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    stages = []
    for i in range(1, n_iter + 1):
        stages.append(
            f"""a{i} AS MATERIALIZED (
      SELECT e.dst_layer AS layer, e.dst_id AS node_id, SUM(h.h) AS a
      FROM es e JOIN h{i - 1} h
        ON h.layer = e.src_layer AND h.node_id = e.src_id
      GROUP BY 1, 2
    ),
    h{i} AS MATERIALIZED (
      SELECT e.src_layer AS layer, e.src_id AS node_id, SUM(a.a) AS h
      FROM es e JOIN a{i} a
        ON a.layer = e.dst_layer AND a.node_id = e.dst_id
      GROUP BY 1, 2
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (SELECT * FROM edges_g
                        WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    h0 AS (SELECT layer, node_id, 1.0 AS h FROM ns),
    {stage_sql},
    tot AS (SELECT (SELECT SUM(a) FROM a{n_iter}) AS ta,
                   (SELECT SUM(h) FROM h{n_iter}) AS th)
    SELECT ns.layer, ns.node_id,
           ROUND(COALESCE(a.a, 0) / tot.ta, 6) AS authority,
           ROUND(COALESCE(h.h, 0) / tot.th, 6) AS hub
    FROM ns CROSS JOIN tot
    LEFT JOIN a{n_iter} a ON a.layer = ns.layer AND a.node_id = ns.node_id
    LEFT JOIN h{n_iter} h ON h.layer = ns.layer AND h.node_id = ns.node_id"""


def graph_hits_q(spark, sf_dir):
    g = _entity_graph(spark, sf_dir)
    return analytics.hits(g, n_iterations=3)


_REG["graph_hits"] = (graph_hits_q, _hits_oracle())


_KTRUSS_TOPN, _KTRUSS_K, _KTRUSS_ROUNDS = 60, 8, 4


def _ktruss_oracle(topn: int = _KTRUSS_TOPN, k: int = _KTRUSS_K,
                   rounds: int = _KTRUSS_ROUNDS) -> str:
    stages = []
    for i in range(1, rounds + 1):
        stages.append(
            f"""adj{i - 1} AS (SELECT a AS u, b AS v FROM e{i - 1}
                  UNION ALL SELECT b, a FROM e{i - 1}),
    e{i} AS MATERIALIZED (
      SELECT s.a, s.b FROM (
        SELECT e.a, e.b, COUNT(*) AS c
        FROM e{i - 1} e
        JOIN adj{i - 1} x ON x.u = e.a
        JOIN adj{i - 1} y ON y.u = e.b AND y.v = x.v
        GROUP BY e.a, e.b) s
      WHERE s.c >= {k - 2}
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH sp AS (
      SELECT DISTINCT l_partkey AS part, s_nationkey AS nat
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    ),
    pairs AS (
      SELECT 'nation:' || CAST(a.nat AS VARCHAR) AS a,
             'nation:' || CAST(b.nat AS VARCHAR) AS b,
             COUNT(*) AS shared
      FROM sp a JOIN sp b ON a.part = b.part
      WHERE 'nation:' || CAST(a.nat AS VARCHAR)
            < 'nation:' || CAST(b.nat AS VARCHAR)
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (ORDER BY shared DESC, a, b) AS rn
        FROM pairs) r
      WHERE rn <= {topn}
    ),
    {stage_sql},
    adjF AS (SELECT a AS u, b AS v FROM e{rounds}
             UNION ALL SELECT b, a FROM e{rounds}),
    supF AS (
      SELECT e.a, e.b, COUNT(*) AS c
      FROM e{rounds} e
      JOIN adjF x ON x.u = e.a
      JOIN adjF y ON y.u = e.b AND y.v = x.v
      GROUP BY e.a, e.b
    )
    SELECT e.a, e.b, CAST(COALESCE(s.c, 0) AS BIGINT) AS support
    FROM e{rounds} e LEFT JOIN supF s ON s.a = e.a AND s.b = e.b"""


def graph_ktruss_q(spark, sf_dir):
    """k-truss of the nation co-supply graph, sparsified to the
    top-N pairs by shared-part count (a deterministic count-based
    cut — percentile thresholds would drift across SFs). Pair
    derivation is the shared _cosupply_top_pairs helper (VERDICT r3:
    the inlined copy here had started to drift)."""
    return analytics.k_truss(
        _cosupply_top_pairs(spark, sf_dir, _KTRUSS_TOPN),
        k=_KTRUSS_K,
        rounds=_KTRUSS_ROUNDS,
        guard=True,
    )


_REG["graph_ktruss"] = (graph_ktruss_q, _ktruss_oracle())


def _trussness_oracle(
    topn: int = 60, k_max: int = 10, rounds: int = 3
) -> str:
    """Unrolls the full (k, round) truss-peeling schedule: the same
    common-neighbor support join as the k-truss oracle, snapshots
    tagged per k, final label = max k each edge survived."""
    stages = []
    step = 0
    snaps = ["SELECT a, b, 2 AS k FROM t0"]
    for k in range(3, k_max + 1):
        for _ in range(rounds):
            step += 1
            stages.append(
                f"""ta{step - 1} AS (SELECT a AS u, b AS v FROM t{step - 1}
                    UNION ALL SELECT b, a FROM t{step - 1}),
    t{step} AS MATERIALIZED (
      SELECT s.a, s.b FROM (
        SELECT e.a, e.b, COUNT(*) AS c
        FROM t{step - 1} e
        JOIN ta{step - 1} x ON x.u = e.a
        JOIN ta{step - 1} y ON y.u = e.b AND y.v = x.v
        GROUP BY e.a, e.b) s
      WHERE s.c >= {k - 2}
    )"""
            )
        snaps.append(f"SELECT a, b, {k} AS k FROM t{step}")
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n      UNION ALL ".join(snaps)
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    t0 AS MATERIALIZED (SELECT a, b FROM e0),
    {stage_sql}
    SELECT a, b, CAST(MAX(k) AS INT) AS trussness
    FROM ({union_sql}) GROUP BY a, b"""


def graph_trussness_q(spark, sf_dir):
    """Full truss decomposition of the co-supply graph: per-edge
    truss numbers over the fixed (k = 3..10, 3 sweeps) schedule —
    the edge-level analogue of graph_coreness. Parquet-rebased
    checkpointing every 8 sweeps (see trussness docstring)."""
    return analytics.trussness(
        _cosupply_top_pairs(spark, sf_dir, 60), k_max=10, rounds=3,
        guard=True,
    )



_COSUPPLY_CACHE: dict[tuple[int, str, int, bool], DataFrame] = {}


def _cosupply_top_pairs(spark, sf_dir, topn: int, with_weight: bool = False):
    """Memoized canonical (a < b) nation co-supply pairs, top-N by
    shared part count — shared derivation for the k-truss / motif /
    MSF / walks / coreness / bisection family (~20 registry keys).
    r11: the derivation (distinct (part, nation) + part self-join +
    pair aggregate, ~2-5s warm at sf0.1) re-ran inside EVERY caller;
    the <= topn-row result is now localCheckpoint-ed once per
    (session, sf_dir, topn, with_weight) — the same session-scoped
    view-sharing class as `derived_graph` (every query still computes
    its own result from the parquet inputs)."""
    k = (id(spark), sf_dir, topn, with_weight)
    with _MEMO_LOCK:
        if k not in _COSUPPLY_CACHE:
            _COSUPPLY_CACHE[k] = _cosupply_top_pairs_build(
                spark, sf_dir, topn, with_weight
            ).localCheckpoint()
    return _COSUPPLY_CACHE[k]


def _cosupply_top_pairs_build(
    spark, sf_dir, topn: int, with_weight: bool = False
):
    from pyspark.sql import Window

    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    sp = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("part"),
            F.col("s_nationkey").cast("string").alias("nat"),
        )
        .distinct()
    )
    pairs = (
        sp.alias("x")
        .join(sp.alias("y"), on="part")
        .filter(F.col("x.nat") < F.col("y.nat"))
        .groupBy(
            F.concat(F.lit("nation:"), F.col("x.nat")).alias("a"),
            F.concat(F.lit("nation:"), F.col("y.nat")).alias("b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    # unpartitioned Window is BOUNDED: `pairs` has at most
    # |nations|^2 = 625 rows (nation-level co-supply aggregate)
    w = Window.orderBy(F.col("shared").desc(), "a", "b")
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= topn
    )
    return top.select("a", "b", "shared") if with_weight else top.select("a", "b")


_COSUPPLY_SQL = """sp AS (
      SELECT DISTINCT l_partkey AS part, s_nationkey AS nat
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    ),
    cpairs AS (
      SELECT 'nation:' || CAST(a.nat AS VARCHAR) AS a,
             'nation:' || CAST(b.nat AS VARCHAR) AS b,
             COUNT(*) AS shared
      FROM sp a JOIN sp b ON a.part = b.part
      WHERE 'nation:' || CAST(a.nat AS VARCHAR)
            < 'nation:' || CAST(b.nat AS VARCHAR)
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (ORDER BY shared DESC, a, b) AS rn
        FROM cpairs) r
      WHERE rn <= {topn}
    )"""


@register(
    "graph_motif_open_triads",
    f"""WITH {_COSUPPLY_SQL.format(topn=60)},
    adj AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0)
    SELECT DISTINCT w1.u AS a_id, w1.v AS b_id, w2.v AS c_id
    FROM adj w1 JOIN adj w2 ON w2.u = w1.v
    WHERE w1.u < w2.v
      AND NOT EXISTS (SELECT 1 FROM adj x
                      WHERE x.u = w1.u AND x.v = w2.v)""",
)
def graph_motif_open_triads(spark, sf_dir):
    """Open triads (a-b-c with no a-c closure) via the motif matcher
    on the symmetrized top-60 co-supply graph; bindings canonicalized
    a < c. The classic link-prediction candidate set."""
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.operators.motifs import find_motifs

    und = _cosupply_top_pairs(spark, sf_dir, 60)
    edges = und.select(
        F.lit("nation").alias("src_layer"),
        F.col("a").alias("src_id"),
        F.lit("nation").alias("dst_layer"),
        F.col("b").alias("dst_id"),
    ).union(
        und.select(
            F.lit("nation").alias("src_layer"),
            F.col("b").alias("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.col("a").alias("dst_id"),
        )
    )
    nodes = (
        edges.select(F.col("src_layer").alias("layer"), F.col("src_id").alias("node_id"))
        .union(edges.select(F.col("dst_layer"), F.col("dst_id")))
        .distinct()
    )
    g = OnionGraph(nodes, edges.withColumn("etype", F.lit("cosupply")))
    m = find_motifs(g, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    return (
        m.filter(F.col("a_id") < F.col("c_id"))
        .select("a_id", "b_id", "c_id")
        .distinct()
    )


def _cosupply_graph(spark, sf_dir, topn: int):
    """Symmetrized co-supply OnionGraph (both edge directions) from
    the top-N canonical pairs."""
    from onionnet_spark.core import OnionGraph

    # pairs carry 'nation:<id>' strings; strip the prefix so
    # 'layer:node_id' reconstruction (e.g. in walk keys) round-trips
    und = _cosupply_top_pairs(spark, sf_dir, topn).select(
        F.expr("substring(a, 8)").alias("a"), F.expr("substring(b, 8)").alias("b")
    )
    edges = und.select(
        F.lit("nation").alias("src_layer"),
        F.col("a").alias("src_id"),
        F.lit("nation").alias("dst_layer"),
        F.col("b").alias("dst_id"),
    ).union(
        und.select(
            F.lit("nation").alias("src_layer"),
            F.col("b").alias("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.col("a").alias("dst_id"),
        )
    )
    nodes = (
        edges.select(
            F.col("src_layer").alias("layer"), F.col("src_id").alias("node_id")
        )
        .union(edges.select(F.col("dst_layer"), F.col("dst_id")))
        .distinct()
    )
    return OnionGraph(nodes, edges.withColumn("etype", F.lit("cosupply")))


def _walks_oracle(topn: int = 60, walk_len: int = 8) -> str:
    draw = (
        "CAST(substr(translate(md5(s.start || '|' || s.cur || '|' || '{t}'),"
        " 'abcdef', '012345'), 1, 6) AS BIGINT)"
    )
    stages, selects = [], [
        "SELECT start, CAST(0 AS INT) AS step, cur AS node FROM s0"
    ]
    for t in range(1, walk_len + 1):
        stages.append(
            f"""s{t} AS MATERIALIZED (
      SELECT s.start, a.v AS cur
      FROM s{t - 1} s
      JOIN deg d ON d.u = s.cur
      JOIN adj a ON a.u = s.cur
        AND a.idx = {draw.format(t=t)} % d.deg
    )"""
        )
        selects.append(
            f"SELECT start, CAST({t} AS INT) AS step, cur AS node FROM s{t}"
        )
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n    UNION ALL ".join(selects)
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    adjd AS (SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0),
    adj AS MATERIALIZED (
      SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
      FROM adjd),
    deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
                         FROM adj GROUP BY u),
    s0 AS (SELECT DISTINCT u AS start, u AS cur FROM adj),
    {stage_sql}
    {union_sql}"""


@register("graph_random_walks", _walks_oracle())
def graph_random_walks(spark, sf_dir):
    """Deterministic DeepWalk-style walks (len 8) over the
    symmetrized top-60 co-supply graph; draw = md5(start|cur|step)
    mod out-degree, replayed verbatim by the oracle."""
    from onionnet_spark.operators.walks import random_walks

    g = _cosupply_graph(spark, sf_dir, 60)
    w = random_walks(g, walk_len=8)
    # node keys are 'nation:<id>' strings already
    return w.select("start", "step", "node")


def _temporal_edges_sql() -> str:
    return """te AS MATERIALIZED (
      SELECT 'customer:' || CAST(o.o_custkey AS VARCHAR) AS u,
             'supplier:' || CAST(l.l_suppkey AS VARCHAR) AS v,
             o.o_orderdate AS t
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'supplier:' || CAST(l.l_suppkey AS VARCHAR),
             'customer:' || CAST(o.o_custkey AS VARCHAR),
             l.l_shipdate
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )"""


def _temporal_oracle(seed: str = "customer:1", rounds: int = 8) -> str:
    stages = []
    for i in range(1, rounds + 1):
        stages.append(
            f"""b{i} AS MATERIALIZED (
      SELECT node,
             CASE WHEN bool_or(arr IS NULL) THEN NULL
                  ELSE MIN(arr) END AS arrival
      FROM (
        SELECT node, arrival AS arr FROM b{i - 1}
        UNION ALL
        SELECT e.v AS node, MIN(e.t) AS arr
        FROM b{i - 1} b JOIN te e
          ON e.u = b.node AND (b.arrival IS NULL OR e.t >= b.arrival)
        GROUP BY e.v
      ) GROUP BY node
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {_temporal_edges_sql()},
    b0 AS (SELECT '{seed}' AS node, CAST(NULL AS TIMESTAMP) AS arrival),
    {stage_sql}
    SELECT node, arrival FROM b{rounds}"""


@register("graph_temporal_reach", _temporal_oracle())
def graph_temporal_reach(spark, sf_dir):
    """Time-respecting earliest arrival from one seed customer over
    order-placed (o_orderdate) and goods-shipped (l_shipdate)
    interaction edges; the dense-relaxation oracle reaches the same
    fixpoint the frontier-sparse operator converges to."""
    from onionnet_spark.operators.traversal import temporal_earliest_arrival
    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    ol = t["orders"].join(
        t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    fwd = ol.select(
        F.concat(F.lit("customer:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("supplier:"), F.col("l_suppkey").cast("string")).alias("dst"),
        F.col("o_orderdate").alias("ts"),
    )
    bwd = ol.select(
        F.concat(F.lit("supplier:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("customer:"), F.col("o_custkey").cast("string")).alias("dst"),
        F.col("l_shipdate").alias("ts"),
    )
    edges = fwd.unionByName(bwd)
    seed = ol.sparkSession.createDataFrame([("customer:1",)], "node string")
    # depth budget 18 (9 outer rounds x 2 intra-round hops): sf0.1's
    # longer ship-date chains exceeded the 8-round budget that
    # sufficed at sf0.01 (r8 bench sweep). hops_per_round=2 halves
    # the materialization barriers and matches the graph's bipartite
    # alternation (customer->supplier->customer per outer round);
    # the r10 interleaved A/B put it ahead of both 1 hop (more
    # barriers) and 4 hops (deeper intra-round plans): medians
    # 14.7 / 16.3 / 15.2s at sf0.1. The loop still exits early on an
    # empty delta, so small SFs converge in a couple of outer rounds.
    return temporal_earliest_arrival(
        edges, seed, max_rounds=9, hops_per_round=2
    )


def _matching_oracle(topn: int = 60, rounds: int = 5) -> str:
    stages = []
    prev = "ep"
    for i in range(1, rounds + 1):
        stages.append(
            f"""nm{i} AS (
      SELECT node, MIN(pri) AS mp FROM (
        SELECT a AS node, pri FROM {prev}
        UNION ALL SELECT b, pri FROM {prev}) GROUP BY 1
    ),
    m{i} AS MATERIALIZED (
      SELECT e.a, e.b, e.pri FROM {prev} e
      JOIN nm{i} x ON x.node = e.a AND x.mp = e.pri
      JOIN nm{i} y ON y.node = e.b AND y.mp = e.pri
    ),
    e{i} AS MATERIALIZED (
      SELECT e.* FROM {prev} e
      WHERE NOT EXISTS (SELECT 1 FROM m{i} m
                        WHERE m.a IN (e.a, e.b) OR m.b IN (e.a, e.b))
    )"""
        )
        prev = f"e{i}"
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n    UNION ALL ".join(
        f"SELECT a, b FROM m{i}" for i in range(1, rounds + 1)
    )
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    ep AS (SELECT a, b, md5(a || '|' || b) AS pri FROM e0),
    {stage_sql}
    {union_sql}"""


def graph_matching_q(spark, sf_dir):
    return analytics.maximal_matching(
        _cosupply_top_pairs(spark, sf_dir, 60), rounds=5, guard=True
    )


_REG["graph_maximal_matching"] = (graph_matching_q, _matching_oracle())


def _mis_oracle(topn: int = 60, rounds: int = 6) -> str:
    """Unrolls Luby's rounds on the same co-supply graph: per round,
    actives with md5(node) strictly below every active neighbor's
    md5 (or with no active neighbor) join; selected + neighbors
    deactivate."""
    stages = []
    prev_n, prev_e = "n0", "ep"
    for i in range(1, rounds + 1):
        stages.append(
            f"""nm{i} AS (
      SELECT node, MIN(npri) AS mn FROM (
        SELECT a AS node, md5(b) AS npri FROM {prev_e}
        UNION ALL SELECT b, md5(a) FROM {prev_e}) GROUP BY 1
    ),
    s{i} AS MATERIALIZED (
      SELECT n.node FROM {prev_n} n LEFT JOIN nm{i} m USING (node)
      WHERE m.mn IS NULL OR md5(n.node) < m.mn
    ),
    dead{i} AS (
      SELECT node FROM s{i}
      UNION SELECT e.b FROM {prev_e} e JOIN s{i} s ON s.node = e.a
      UNION SELECT e.a FROM {prev_e} e JOIN s{i} s ON s.node = e.b
    ),
    n{i} AS MATERIALIZED (
      SELECT node FROM {prev_n}
      WHERE node NOT IN (SELECT node FROM dead{i})
    ),
    e{i} AS MATERIALIZED (
      SELECT * FROM {prev_e}
      WHERE a IN (SELECT node FROM n{i}) AND b IN (SELECT node FROM n{i})
    )"""
        )
        prev_n, prev_e = f"n{i}", f"e{i}"
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n    UNION ALL ".join(
        f"SELECT node FROM s{i}" for i in range(1, rounds + 1)
    )
    return f"""WITH {CTES},
    raw AS (SELECT src_layer || ':' || src_id AS u,
                   dst_layer || ':' || dst_id AS v
            FROM edges_g
            WHERE src_layer IN ('supplier', 'customer')
              AND dst_layer = 'nation'),
    ep AS (SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM raw),
    n0 AS (SELECT DISTINCT node FROM (
      SELECT a AS node FROM ep UNION ALL SELECT b FROM ep)),
    {stage_sql}
    {union_sql}"""


def graph_mis_q(spark, sf_dir):
    """Luby's maximal independent set over the nation-star graph
    (suppliers and customers joined to their nation) — paired with
    graph_maximal_matching to cover both classic symmetry-breaking
    primitives. The star topology makes the MIS substantial (most
    leaves) while still forcing multi-round deactivation cascades."""
    g = filters.view_layers(
        get_graph(spark, sf_dir), ["nation", "supplier", "customer"]
    )
    e = g.edge_endpoints().select(
        F.concat_ws(":", "src_layer", "src_id").alias("a"),
        F.concat_ws(":", "dst_layer", "dst_id").alias("b"),
    )
    return analytics.maximal_independent_set(e, rounds=6, guard=True)


_REG["graph_mis"] = (graph_mis_q, _mis_oracle())

_REG["graph_trussness"] = (graph_trussness_q, _trussness_oracle())


def _attr_assortativity_oracle(topn: int = 60) -> str:
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    at AS (SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS n,
                  CAST(n_regionkey AS VARCHAR) AS c
           FROM nation),
    lab AS (
      SELECT x.c AS ca, y.c AS cb
      FROM e0 JOIN at x ON x.n = e0.a JOIN at y ON y.n = e0.b),
    ends AS (SELECT ca, cb FROM lab UNION ALL SELECT cb, ca FROM lab),
    mix AS (SELECT ca, cb, COUNT(*) AS m FROM ends GROUP BY ca, cb),
    s AS (
      SELECT (SELECT COALESCE(SUM(m), 0) FROM mix WHERE ca = cb) AS diag,
             (SELECT SUM(ra * ra) FROM (
                SELECT SUM(m) AS ra FROM mix GROUP BY ca)) AS sq,
             (SELECT SUM(m) FROM mix) AS t)
    SELECT CAST(t / 2 AS BIGINT) AS n_edges,
           CAST(diag / 2 AS BIGINT) AS n_same,
           CAST(diag * t - sq AS DOUBLE) / CAST(t * t - sq AS DOUBLE) AS r
    FROM s"""


def graph_attr_assortativity_q(spark, sf_dir):
    """Categorical assortativity of the co-supply graph by REGION:
    do nations co-supply parts predominantly within their own
    region? Newman's trace formula from exact integer edge-end
    counts."""
    from onionnet_spark.sources.tpch_graph import load_tables

    nat = load_tables(spark, sf_dir)["nation"].select(
        F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias(
            "node"
        ),
        F.col("n_regionkey").cast("string").alias("attr"),
    )
    return analytics.attribute_assortativity(
        _cosupply_top_pairs(spark, sf_dir, 60), nat
    )


_REG["graph_attr_assortativity"] = (
    graph_attr_assortativity_q,
    _attr_assortativity_oracle(),
)


def _coloring_oracle(rounds: int = 4) -> str:
    """Unrolls Jones-Plassmann on the nation-star graph: per round,
    uncolored local md5-maxima take the mex of their colored
    neighbors' colors (mex computed positionally over the sorted
    distinct color list — no capped ranges)."""
    stages = []
    prev_u, prev_c = "u0", "c0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""unm{i} AS (
      SELECT e.u AS node, MAX(md5(e.v)) AS mx
      FROM sym e JOIN {prev_u} x ON x.node = e.v GROUP BY e.u
    ),
    s{i} AS MATERIALIZED (
      SELECT n.node FROM {prev_u} n LEFT JOIN unm{i} m USING (node)
      WHERE m.mx IS NULL OR md5(n.node) > m.mx
    ),
    ndc{i} AS (
      SELECT DISTINCT e.u AS node, c.color
      FROM sym e
      JOIN s{i} s ON s.node = e.u
      JOIN {prev_c} c ON c.node = e.v
    ),
    ncl{i} AS (
      SELECT node, list(color ORDER BY color) AS cs
      FROM ndc{i} GROUP BY node
    ),
    mex{i} AS (
      SELECT node, COALESCE(MIN(CASE WHEN x != g - 1 THEN g - 1 END),
                            MAX(g)) AS color
      FROM (SELECT node, generate_subscripts(cs, 1) AS g, unnest(cs) AS x
            FROM ncl{i})
      GROUP BY node
    ),
    a{i} AS MATERIALIZED (
      SELECT s.node, CAST(COALESCE(m.color, 0) AS INT) AS color
      FROM s{i} s LEFT JOIN mex{i} m USING (node)
    ),
    c{i} AS MATERIALIZED (
      SELECT * FROM {prev_c} UNION ALL SELECT * FROM a{i}
    ),
    u{i} AS MATERIALIZED (
      SELECT node FROM {prev_u}
      WHERE node NOT IN (SELECT node FROM s{i})
    )"""
        )
        prev_u, prev_c = f"u{i}", f"c{i}"
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    raw AS (SELECT src_layer || ':' || src_id AS a,
                   dst_layer || ':' || dst_id AS b
            FROM edges_g
            WHERE src_layer IN ('supplier', 'customer')
              AND dst_layer = 'nation'),
    sym AS MATERIALIZED (SELECT a AS u, b AS v FROM raw
                         UNION ALL SELECT b, a FROM raw),
    u0 AS (SELECT DISTINCT u AS node FROM sym),
    c0 AS (SELECT node, color FROM (SELECT '' AS node, 0 AS color) WHERE false),
    {stage_sql}
    SELECT node, color FROM c{rounds}"""


def graph_coloring_q(spark, sf_dir):
    """Jones-Plassmann greedy coloring over the nation-star graph:
    proper by construction (same-round winners are never adjacent),
    colors bounded by max degree + 1."""
    g = filters.view_layers(
        get_graph(spark, sf_dir), ["nation", "supplier", "customer"]
    )
    e = g.edge_endpoints().select(
        F.concat_ws(":", "src_layer", "src_id").alias("a"),
        F.concat_ws(":", "dst_layer", "dst_id").alias("b"),
    )
    return analytics.greedy_coloring(e, rounds=4, guard=True)


_REG["graph_coloring"] = (graph_coloring_q, _coloring_oracle())


@register(
    "graph_label_spread",
    # seed-rooted BFS layering with clamped labels: regions seed
    # their own label, nations adopt in round 1, suppliers/customers
    # in round 2 — each ring's majority is closed-form (one labeled
    # neighbor), so the oracle is pure joins, no unrolling
    f"""WITH {CTES},
    rg AS (SELECT node_id FROM nodes_g WHERE layer = 'region'),
    nat AS (SELECT src_id AS nid, dst_id AS rid FROM edges_g
            WHERE src_layer = 'nation' AND dst_layer = 'region'),
    sc AS (SELECT src_layer AS lyr, src_id AS sid, dst_id AS nid
           FROM edges_g
           WHERE src_layer IN ('supplier', 'customer')
             AND dst_layer = 'nation')
    SELECT 'region' AS layer, node_id, 'R' || node_id AS label,
           CAST(0 AS INT) AS spread_round
    FROM rg
    UNION ALL
    SELECT 'nation', nid, 'R' || rid, CAST(1 AS INT) FROM nat
    UNION ALL
    SELECT lyr, sid, 'R' || n.rid, CAST(2 AS INT)
    FROM sc JOIN nat n USING (nid)""",
)
def graph_label_spread_q(spark, sf_dir):
    """Semi-supervised label spreading: region seeds propagate down
    the layer hierarchy (nation round 1, supplier/customer round 2);
    majority-vote tie-breaking is pytest-gated on conflicting-seed
    toys."""
    g = _entity_graph(spark, sf_dir)
    seeds = g.nodes.filter(F.col("layer") == "region").select(
        "layer", "node_id", F.concat(F.lit("R"), "node_id").alias("label")
    )
    return components.spread_labels(g, seeds, rounds=2)


def _msf_oracle(topn: int = 60) -> str:
    """Verifies the Borůvka output via the Kruskal CUT PROPERTY
    instead of replaying rounds: under the total order
    (shared DESC, ekey ASC) weights are effectively distinct, so the
    maximum-similarity spanning forest is UNIQUE and an edge belongs
    to it iff its endpoints are NOT connected by strictly-preferred
    edges — a per-edge recursive reachability closure."""
    return f"""WITH RECURSIVE {_COSUPPLY_SQL.format(topn=topn)},
    cpairs2 AS (
      SELECT e0.a, e0.b, c.shared FROM e0
      JOIN cpairs c ON c.a = e0.a AND c.b = e0.b
    ),
    ew AS MATERIALIZED (
      SELECT a, b, shared, md5(a || '|' || b) AS ekey,
             ROW_NUMBER() OVER (ORDER BY a, b) AS eid
      FROM cpairs2
    ),
    reach(eid, node) AS (
      SELECT eid, a AS node FROM ew
      UNION
      SELECT r.eid, CASE WHEN g.a = r.node THEN g.b ELSE g.a END
      FROM reach r
      JOIN ew e ON e.eid = r.eid
      JOIN ew g ON (g.a = r.node OR g.b = r.node)
                AND (g.shared > e.shared
                     OR (g.shared = e.shared AND g.ekey < e.ekey))
    )
    SELECT e.a, e.b, CAST(e.shared AS BIGINT) AS shared FROM ew e
    WHERE NOT EXISTS (SELECT 1 FROM reach r
                      WHERE r.eid = e.eid AND r.node = e.b)"""


def graph_msf_q(spark, sf_dir):
    """Maximum-similarity spanning backbone of the nation co-supply
    graph via Borůvka (min spanning forest on negated shared
    counts) — the graph-sparsification step before visualizing or
    clustering a dense similarity graph."""
    pairs = _cosupply_top_pairs(spark, sf_dir, 60, with_weight=True)
    msf = analytics.boruvka_msf(
        pairs.select("a", "b", (-F.col("shared")).alias("w")), rounds=8
    )
    return msf.select(
        "a", "b", (-F.col("w")).cast("bigint").alias("shared")
    )


_REG["graph_msf"] = (graph_msf_q, _msf_oracle())


def _percolation_oracle(ks: tuple[int, ...] = (20, 40, 60)) -> str:
    """Per threshold k: weak CC over the top-k co-supply edges
    (recursive min-label closure seeded from the FIXED top-60 node
    universe, so pruned-away nodes count as singletons), summarized
    to one row."""
    parts = []
    for k in ks:
        parts.append(
            f"""ek{k} AS (SELECT a, b FROM rk WHERE rn <= {k}),
    reach{k} AS (
      SELECT node AS s, node FROM uni
      UNION
      SELECT r.s, CASE WHEN e.a = r.node THEN e.b ELSE e.a END
      FROM reach{k} r JOIN ek{k} e ON r.node IN (e.a, e.b)
    ),
    comp{k} AS (SELECT s, MIN(node) AS c FROM reach{k} GROUP BY s),
    sz{k} AS (SELECT c, COUNT(*) AS n FROM comp{k} GROUP BY c),
    row{k} AS (
      SELECT CAST({k} AS INT) AS threshold_k,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(MAX(n) AS BIGINT) AS largest_size,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons
      FROM sz{k})"""
        )
    stage_sql = ",\n    ".join(parts)
    union_sql = "\n    UNION ALL ".join(f"SELECT * FROM row{k}" for k in ks)
    return f"""WITH RECURSIVE {_COSUPPLY_SQL.format(topn=60)},
    rk AS MATERIALIZED (
      SELECT e0.a, e0.b,
             ROW_NUMBER() OVER (ORDER BY c.shared DESC, e0.a, e0.b) AS rn
      FROM e0 JOIN cpairs c ON c.a = e0.a AND c.b = e0.b
    ),
    uni AS MATERIALIZED (SELECT DISTINCT a AS node FROM rk
                         UNION SELECT b FROM rk),
    {stage_sql}
    {union_sql}"""


def graph_percolation_q(spark, sf_dir):
    """Percolation / fragmentation profile of the co-supply
    similarity graph: weak-component structure as only the top-k
    strongest edges are kept (k = 20, 40, 60) over the fixed top-60
    node universe — the network-robustness readout behind backbone
    extraction. The rank window is bounded by the 60-pair table."""
    from pyspark.sql import Window

    pairs = _cosupply_top_pairs(spark, sf_dir, 60, with_weight=True)
    w = Window.orderBy(F.col("shared").desc(), "a", "b")  # bounded: 60 rows
    ranked = pairs.withColumn("rn", F.row_number().over(w)).localCheckpoint()
    nodes = (
        ranked.select(F.col("a").alias("key"))
        .unionByName(ranked.select(F.col("b").alias("key")))
        .distinct()
        .select(
            F.lit("nation").alias("layer"),
            F.substring("key", 8, 1000).alias("node_id"),
        )
        .localCheckpoint()
    )
    out = None
    for k in (20, 40, 60):
        ek = ranked.filter(F.col("rn") <= k).select(
            F.lit("nation").alias("src_layer"),
            F.substring("a", 8, 1000).alias("src_id"),
            F.lit("nation").alias("dst_layer"),
            F.substring("b", 8, 1000).alias("dst_id"),
        )
        # star contraction (same output contract as
        # connected_components): each of the three tiny fixpoints
        # converges in O(log) rounds at ONE job per round (the
        # signature aggregate doubles as the materialization) where
        # min-label propagation paid diameter rounds at two jobs —
        # at this bounded-60 size the query is pure job overhead
        cc = components.connected_components_star(OnionGraph(nodes, ek))
        row = (
            cc.groupBy("component")
            .agg(F.count("*").alias("n"))
            .agg(
                F.lit(k).cast("int").alias("threshold_k"),
                F.count("*").cast("bigint").alias("n_components"),
                F.max("n").cast("bigint").alias("largest_size"),
                F.sum((F.col("n") == 1).cast("int"))
                .cast("bigint")
                .alias("n_singletons"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_REG["graph_percolation"] = (graph_percolation_q, _percolation_oracle())


def _bisection_oracle(topn: int = 60, iterations: int = 8) -> str:
    """Unrolls the deflated power iteration: per step, w = (c-deg)*v
    + neighbor-sum, then the mean projection n*w - sum(w), then the
    portable floor-rescale (x - ((x % 1000 + 1000) % 1000)) // 1000
    (DuckDB's % / // truncate where Spark floors; the double-mod
    makes both floor, and the division is exact by construction)."""
    stages = []
    prev = "vv0"
    for t in range(1, iterations + 1):
        stages.append(
            f"""w{t} AS MATERIALIZED (
      SELECT d.node,
             ((SELECT c FROM cn) - d.deg) * v.v + COALESCE(s.nsum, 0) AS w
      FROM dg d JOIN {prev} v USING (node)
      LEFT JOIN (SELECT s.a AS node, SUM(x.v) AS nsum
                 FROM sym s JOIN {prev} x ON x.node = s.b
                 GROUP BY 1) s USING (node)
    ),
    p{t} AS MATERIALIZED (
      SELECT node,
             (SELECT n FROM cn) * w - (SELECT SUM(w) FROM w{t}) AS x
      FROM w{t}
    ),
    d{t} AS (
      SELECT GREATEST(1, (MAX(ABS(x)) - MAX(ABS(x)) % 1000000) // 1000000)
               AS d
      FROM p{t}
    ),
    vv{t} AS MATERIALIZED (
      SELECT node,
             CAST((x - ((x % d + d) % d)) // d AS BIGINT) AS v
      FROM p{t}, d{t}
    )"""
        )
        prev = f"vv{t}"
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    sym AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
    dg AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
                        FROM sym GROUP BY 1),
    cn AS (SELECT MAX(deg) + 1 AS c, COUNT(*) AS n FROM dg),
    vv0 AS MATERIALIZED (
      SELECT node,
             CAST(translate(substr(md5(node), 1, 6),
                            'abcdef', '012345') AS BIGINT) - 500000 AS v
      FROM dg),
    {stage_sql}
    SELECT node, v AS fiedler_q,
           CAST(CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS INT)
             AS side
    FROM {prev}"""


def graph_bisection_q(spark, sf_dir):
    """Fiedler-sign spectral bisection of the nation co-supply
    graph: integer-exact deflated power iteration (8 steps), the
    graph-partitioning primitive behind recursive spectral
    partitioners."""
    return analytics.spectral_bisection(
        _cosupply_top_pairs(spark, sf_dir, 60), iterations=8
    )


_REG["graph_spectral_bisection"] = (graph_bisection_q, _bisection_oracle())


@register(
    "graph_assortativity",
    f"""WITH {CTES},
    deg AS MATERIALIZED (
      SELECT layer, node_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT src_layer AS layer, src_id AS node_id FROM edges_g
        UNION ALL SELECT dst_layer, dst_id FROM edges_g)
      GROUP BY 1, 2
    ),
    ann AS (
      SELECT dx.deg AS dx, dy.deg AS dy
      FROM edges_g e
      JOIN deg dx ON dx.layer = e.src_layer AND dx.node_id = e.src_id
      JOIN deg dy ON dy.layer = e.dst_layer AND dy.node_id = e.dst_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dx) AS DOUBLE) AS sx, CAST(SUM(dy) AS DOUBLE) AS sy,
             CAST(SUM(dx * dy) AS DOUBLE) AS sxy,
             CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
             CAST(SUM(dy * dy) AS DOUBLE) AS syy,
             CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM ann
    )
    SELECT n_edges,
           CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                THEN ROUND((n*sxy - sx*sy)
                     / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
           END AS assortativity
    FROM s""",
)
def graph_assortativity(spark, sf_dir):
    return analytics.degree_assortativity(get_graph(spark, sf_dir))


@register(
    "graph_reciprocity",
    f"""WITH {CTES},
    e AS (SELECT DISTINCT src_layer, src_id, dst_layer, dst_id FROM edges_g),
    r AS (
      SELECT COUNT(*) AS n_reciprocal FROM e
      WHERE EXISTS (SELECT 1 FROM e x
                    WHERE x.src_layer = e.dst_layer AND x.src_id = e.dst_id
                      AND x.dst_layer = e.src_layer AND x.dst_id = e.src_id)
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(r.n_reciprocal AS BIGINT) AS n_reciprocal,
           ROUND(r.n_reciprocal * 1.0 / (SELECT COUNT(*) FROM e), 6)
             AS reciprocity
    FROM r""",
)
def graph_reciprocity(spark, sf_dir):
    return analytics.reciprocity(get_graph(spark, sf_dir))


def _modularity_oracle() -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    inner = _lpa_oracle()
    return f"""WITH {CTES},
    lpa AS MATERIALIZED (SELECT * FROM ({inner}) t),
    es2 AS (SELECT * FROM edges_g
            WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    sym2 AS (
      SELECT DISTINCT src_layer, src_id, dst_layer, dst_id FROM es2
      UNION
      SELECT DISTINCT dst_layer, dst_id, src_layer, src_id FROM es2),
    ann AS (
      SELECT ca.community AS cu, cb.community AS cv
      FROM sym2 s
      JOIN lpa ca ON ca.layer = s.src_layer AND ca.node_id = s.src_id
      JOIN lpa cb ON cb.layer = s.dst_layer AND cb.node_id = s.dst_id),
    per_c AS (
      SELECT cu, COUNT(*) AS d_c,
             SUM(CASE WHEN cu = cv THEN 1 ELSE 0 END) AS e_c
      FROM ann GROUP BY cu),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
             CAST(SUM(d_c) AS DOUBLE) AS m2,
             CAST(SUM(e_c) AS DOUBLE) AS e_in,
             CAST(SUM(d_c * d_c) AS DOUBLE) AS d_sq
      FROM per_c)
    SELECT n_communities, ROUND(e_in / m2 - d_sq / (m2 * m2), 6) AS modularity
    FROM t"""


@register("graph_modularity", _modularity_oracle())
def graph_modularity_q(spark, sf_dir):
    """Modularity of the 5-round LPA assignment — the quality metric
    composed over the community operator (same subgraph)."""
    from onionnet_spark.operators.components import label_propagation_communities

    g = _entity_graph(spark, sf_dir)
    return analytics.modularity(g, label_propagation_communities(g, n_rounds=5))


@register(
    "graph_louvain_move",
    f"""WITH {CTES},
    es2 AS (SELECT * FROM edges_g
            WHERE src_layer IN ('region', 'nation', 'customer', 'supplier')
              AND dst_layer IN ('region', 'nation', 'customer', 'supplier')),
    sym AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT src_layer || ':' || src_id AS u,
               dst_layer || ':' || dst_id AS v FROM es2
        UNION ALL
        SELECT dst_layer || ':' || dst_id, src_layer || ':' || src_id
        FROM es2)
      WHERE u <> v),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY u),
    m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS a FROM sym),
    cand AS (
      SELECT s.u, s.v, du.k AS ki, dv.k AS kj,
             (SELECT a FROM m2) - du.k * dv.k AS gain_num
      FROM sym s
      JOIN deg du ON du.u = s.u
      JOIN deg dv ON dv.u = s.v
      WHERE s.v < s.u),
    best AS (
      SELECT u, v, gain_num,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY kj, v) AS rn
      FROM cand WHERE gain_num > 0)
    SELECT n.layer, n.node_id,
           COALESCE(b.v, n.layer || ':' || n.node_id) AS community,
           b.v IS NOT NULL AS moved,
           CAST(COALESCE(b.gain_num, 0) AS BIGINT) AS gain_num
    FROM nodes_g n
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.u = n.layer || ':' || n.node_id
    WHERE n.layer IN ('region', 'nation', 'customer', 'supplier')""",
)
def graph_louvain_move_q(spark, sf_dir):
    """One synchronous Louvain sweep from singletons (distributed
    first phase, smaller-key symmetry break) — integer modularity
    gains, so the move table is engine-exact. Runs on the same
    entity-layer view the LPA/modularity queries use (communities on
    the bipartite order/lineitem tree are not meaningful)."""
    g = _entity_graph(spark, sf_dir)
    return analytics.louvain_move_round(g)


@register(
    "graph_ego_stats",
    f"""WITH {CTES},
    sym AS MATERIALIZED (
      SELECT DISTINCT src_layer AS layer, src_id AS node_id,
             dst_layer AS n_layer, dst_id AS n_id FROM edges_g
      UNION
      SELECT DISTINCT dst_layer, dst_id, src_layer, src_id FROM edges_g),
    deg AS (SELECT layer, node_id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY 1, 2)
    SELECT s.layer, s.node_id,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(COUNT(DISTINCT s.n_layer) AS BIGINT) AS n_neighbor_layers,
           ROUND(SUM(d.deg) * 1.0 / COUNT(*), 6) AS mean_neighbor_degree
    FROM sym s JOIN deg d ON d.layer = s.n_layer AND d.node_id = s.n_id
    GROUP BY s.layer, s.node_id""",
)
def graph_ego_stats(spark, sf_dir):
    return analytics.ego_stats(get_graph(spark, sf_dir))


def _pagerank_weighted_oracle(n_iter: int = 5, damping: float = 0.85) -> str:
    lyrs = "('lineitem', 'orders', 'part', 'supplier')"
    stages = []
    for i in range(1, n_iter + 1):
        stages.append(
            f"""wpr{i} AS MATERIALIZED (
      SELECT ns.layer, ns.node_id,
             (1 - {damping}) / (SELECT n FROM nn) + {damping} * COALESCE(c.contrib, 0) AS pr
      FROM ns LEFT JOIN (
        SELECT e.dst_layer AS layer, e.dst_id AS node_id,
               SUM(p.pr * e.weight / d.wsum) AS contrib
        FROM es e
        JOIN wpr{i - 1} p ON p.layer = e.src_layer AND p.node_id = e.src_id
        JOIN wdeg d ON d.src_layer = e.src_layer AND d.src_id = e.src_id
        GROUP BY e.dst_layer, e.dst_id
      ) c ON c.layer = ns.layer AND c.node_id = ns.node_id
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (SELECT * FROM edges_g
                        WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    wdeg AS MATERIALIZED (SELECT src_layer, src_id, SUM(weight) AS wsum
                          FROM es GROUP BY 1, 2),
    nn AS (SELECT COUNT(*) AS n FROM ns),
    wpr0 AS (SELECT layer, node_id, 1.0 / (SELECT n FROM nn) AS pr FROM ns),
    {stage_sql}
    SELECT layer, node_id, ROUND(pr, 6) AS pagerank FROM wpr{n_iter}"""


def graph_pagerank_weighted_q(spark, sf_dir):
    """Edge-weight-aware PageRank on the fact layers, where
    lineitem's three out-edges carry genuinely different weights
    (extendedprice vs quantity) — exercises the weighted mass split
    the unweighted query can't."""
    g = filters.view_layers(
        get_graph(spark, sf_dir), ["lineitem", "orders", "part", "supplier"]
    )
    pr = analytics.pagerank(g, n_iterations=5, damping=0.85, weight_col="weight")
    return pr.select("layer", "node_id", F.round("pagerank", 6).alias("pagerank"))


_REG["graph_pagerank_weighted"] = (
    graph_pagerank_weighted_q, _pagerank_weighted_oracle()
)


@register(
    "graph_bipartite_projection",
    f"""WITH {CTES},
    inc AS (
      SELECT DISTINCT src_id AS id, dst_id AS via FROM edges_g
      WHERE src_layer = 'customer' AND dst_layer = 'nation'
      UNION
      SELECT DISTINCT dst_id, src_id FROM edges_g
      WHERE dst_layer = 'customer' AND src_layer = 'nation'
    )
    SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM inc a JOIN inc b ON a.via = b.via AND a.id < b.id
    GROUP BY 1, 2""",
)
def graph_bipartite_projection(spark, sf_dir):
    """Customer co-nationality projection: the one-mode co-membership
    graph of the customer-nation bipartite view."""
    return filters.project_bipartite(
        get_graph(spark, sf_dir), layer="customer", via_layer="nation"
    )


def _coreness_oracle(topn: int = 60, k_max: int = 12, rounds_per_k: int = 5) -> str:
    """Unrolled peel with `rounds_per_k` sweeps per phase PLUS a loud
    convergence sentinel: Spark's coreness() now sweeps each phase to
    fixpoint (ADVICE r2: a fixed schedule silently mislabels cascades
    longer than the schedule), so the oracle's schedule must provably
    cover the data. After the last sweep of each phase a check CTE
    emits (node, -k) rows for any node still below degree k — Spark
    never emits negative coreness, so an insufficient schedule
    hash-MISMATCHES instead of silently agreeing."""
    stages, removed_selects = [], []
    prev = "adj0"
    i = 0
    for k in range(1, k_max + 1):
        for _ in range(rounds_per_k):
            i += 1
            stages.append(
                f"""low{i} AS (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) < {k}),
    adj{i} AS MATERIALIZED (
      SELECT * FROM {prev}
      WHERE u NOT IN (SELECT u FROM low{i})
        AND v NOT IN (SELECT u FROM low{i})),
    gone{i} AS (
      SELECT u AS node, CAST({k - 1} AS INT) AS coreness
      FROM (SELECT DISTINCT u FROM {prev})
      WHERE u NOT IN (SELECT DISTINCT u FROM adj{i}))"""
            )
            removed_selects.append(f"SELECT node, coreness FROM gone{i}")
            prev = f"adj{i}"
        stages.append(
            f"""chk{k} AS (
      SELECT u AS node, CAST(-{k} AS INT) AS coreness
      FROM {prev} GROUP BY u HAVING COUNT(*) < {k})"""
        )
        removed_selects.append(f"SELECT node, coreness FROM chk{k}")
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n    UNION ALL ".join(removed_selects)
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    adj0 AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
                          UNION ALL SELECT b, a FROM e0),
    {stage_sql}
    {union_sql}"""


@register("graph_coreness", _coreness_oracle())
def graph_coreness(spark, sf_dir):
    """Core numbers of the top-60 co-supply graph. Spark side peels
    each phase to fixpoint (schedule-independent, exact); the
    unrolled oracle runs 5 sweeps per k with a per-phase convergence
    sentinel that mismatches loudly if 5 were not enough."""
    return analytics.coreness(_cosupply_top_pairs(spark, sf_dir, 60), k_max=12)


def _anf_growth_oracle(max_radius: int = 3) -> str:
    per_r = "\n      UNION ALL ".join(
        f"SELECT {r} AS radius, ROUND(AVG(est_ball), 6) AS mean_ball "
        f"FROM ({_anf_oracle(radius=r)}) t{r}"
        for r in range(1, max_radius + 1)
    )
    return f"""WITH g AS (
      {per_r}
    )
    SELECT radius, mean_ball,
           ROUND(mean_ball / MAX(mean_ball) OVER (), 6) AS frac_of_max
    FROM g"""


def graph_anf_growth_q(spark, sf_dir):
    """Neighborhood-growth profile from the ANF sketch: mean
    estimated ball size at radius 1..3 and its fraction of the
    maximum — the effective-diameter read-out (the smallest radius
    whose fraction clears 0.9). ONE propagation loop serves all
    three radii (r10): the state after r rounds IS the radius-r
    sketch (same deterministic md5 draws, same elementwise MIN), so
    the per-radius read-outs come from the loop's intermediate
    states — 3 rounds total instead of 1 + 2 + 3 — and the profile
    stays exactly replayable (bit-identical to three passes)."""
    from pyspark.sql import Window

    g = _entity_graph(spark, sf_dir)
    rows = None
    for r, sk in enumerate(
        analytics.neighborhood_growth_states(g, max_radius=3, k=8), start=1
    ):
        one = sk.agg(F.round(F.avg("est_ball"), 6).alias("mean_ball")).select(
            F.lit(r).alias("radius"), "mean_ball"
        )
        rows = one if rows is None else rows.unionByName(one)
    w = Window.partitionBy()
    return rows.withColumn(
        "frac_of_max",
        F.round(F.col("mean_ball") / F.max("mean_ball").over(w), 6),
    )


_REG["graph_anf_growth"] = (graph_anf_growth_q, _anf_growth_oracle())


# --------------------------------------------------------------------------
# Round-3 session additions (driver-recorded from r4 on)
# --------------------------------------------------------------------------

def _eigenvector_oracle(n_iter: int = 4) -> str:
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    stages = []
    for i in range(1, n_iter + 1):
        stages.append(
            f"""x{i} AS MATERIALIZED (
      SELECT e.dst_layer AS layer, e.dst_id AS node_id, SUM(p.x) AS x
      FROM sym e
      JOIN x{i - 1} p ON p.layer = e.src_layer AND p.node_id = e.src_id
      GROUP BY 1, 2)"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS (SELECT * FROM edges_g
           WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    sym AS MATERIALIZED (
      SELECT src_layer, src_id, dst_layer, dst_id FROM es
      UNION ALL
      SELECT dst_layer, dst_id, src_layer, src_id FROM es),
    x0 AS (SELECT layer, node_id, 1.0 AS x FROM ns),
    {stage_sql},
    tot AS (SELECT SUM(x) AS tx FROM x{n_iter})
    SELECT n.layer, n.node_id,
           ROUND(COALESCE(p.x, 0) / (SELECT tx FROM tot), 6) AS eigenvector
    FROM ns n LEFT JOIN x{n_iter} p USING (layer, node_id)"""


@register("graph_eigenvector", _eigenvector_oracle())
def graph_eigenvector_q(spark, sf_dir):
    """Power-iteration eigenvector centrality on the undirected view
    of the dimension layers (same subgraph as `pagerank` — hub
    centrality is a dimension-graph question; the fact layers would
    drown it in lineitem degree mass). Integer-exact iterates, one
    final L1 normalize. The layer view is memoized per (session,
    sf_dir) so its persisted symmetrized cache is shared across
    calls."""
    g = derived_graph(
        spark,
        sf_dir,
        "eigen_layers",
        lambda: filters.view_layers(
            get_graph(spark, sf_dir),
            ["region", "nation", "customer", "supplier"],
        ),
    )
    return analytics.eigenvector_centrality(g, n_iterations=4)


def _katz_oracle(n_iter: int = 4, inv_alpha: int = 8) -> str:
    stages = []
    for i in range(1, n_iter + 1):
        seed = inv_alpha ** (i - 1)
        stages.append(
            f"""z{i} AS MATERIALIZED (
      SELECT n.layer, n.node_id, COALESCE(r.z, 0) AS z
      FROM nodes_g n LEFT JOIN (
        SELECT e.dst_layer AS layer, e.dst_id AS node_id,
               SUM(p.z + {seed}.0) AS z
        FROM edges_g e
        JOIN z{i - 1} p ON p.layer = e.src_layer AND p.node_id = e.src_id
        GROUP BY 1, 2
      ) r ON r.layer = n.layer AND r.node_id = n.node_id)"""
        )
    scale = inv_alpha**n_iter
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    z0 AS (SELECT layer, node_id, 0.0 AS z FROM nodes_g),
    {stage_sql}
    SELECT layer, node_id, ROUND(z / {scale}.0, 6) AS katz FROM z{n_iter}"""


@register("graph_katz", _katz_oracle())
def graph_katz_q(spark, sf_dir):
    """Truncated-series Katz centrality (directed in-walks,
    alpha = 1/8) via the scaled-integer recurrence — every iterate a
    whole double, one final division."""
    return analytics.katz_centrality(
        get_graph(spark, sf_dir), n_iterations=4, inv_alpha=8
    )


@register(
    "graph_pseudo_diameter",
    f"""WITH RECURSIVE {CTES},
    sym AS (
      SELECT src_layer, src_id, dst_layer, dst_id FROM edges_g
      UNION ALL
      SELECT dst_layer, dst_id, src_layer, src_id FROM edges_g),
    b1 AS (
      SELECT 'region' AS layer, '0' AS node_id, 0 AS dist
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1 FROM b1 b
      JOIN sym e ON e.src_layer = b.layer AND e.src_id = b.node_id
      WHERE b.dist < 15
    ),
    d1 AS (SELECT layer, node_id, MIN(dist) AS dist FROM b1 GROUP BY 1, 2),
    far1 AS (SELECT layer, node_id FROM d1
             ORDER BY dist DESC, layer, node_id LIMIT 1),
    b2 AS (
      SELECT layer, node_id, 0 AS dist FROM far1
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1 FROM b2 b
      JOIN sym e ON e.src_layer = b.layer AND e.src_id = b.node_id
      WHERE b.dist < 15
    ),
    d2 AS (SELECT layer, node_id, MIN(dist) AS dist FROM b2 GROUP BY 1, 2),
    far2 AS (SELECT layer, node_id, dist FROM d2
             ORDER BY dist DESC, layer, node_id LIMIT 1)
    SELECT 'region' AS start_layer, '0' AS start_id,
           layer AS peak_layer, node_id AS peak_id,
           CAST(dist AS INT) AS pseudo_diameter
    FROM far2""",
)
def graph_pseudo_diameter_q(spark, sf_dir):
    """Double-sweep BFS pseudo-diameter on the undirected view
    (graph-tool `pseudo_diameter` parity, fixed 2 sweeps)."""
    return traversal.pseudo_diameter(
        get_graph(spark, sf_dir), ("region", "0"), n_sweeps=2
    )


def _skipgram_oracle() -> str:
    # MATERIALIZED wrap: the walks closure is an unrolled 8-step CTE
    # chain referenced TWICE below — inlined, DuckDB would replay it
    # per reference (the 2^n lesson from on_shortest_weighted)
    inner = _REG["graph_random_walks"][1]
    return f"""WITH w AS MATERIALIZED ({inner})
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM w a JOIN w b
      ON a.start = b.start AND a.step <> b.step
     AND ABS(a.step - b.step) <= 2
    GROUP BY 1, 2"""


@register("graph_walk_skipgrams", _skipgram_oracle())
def graph_walk_skipgrams_q(spark, sf_dir):
    """Skip-gram (center, context, n) corpus from the deterministic
    DeepWalk walks — the graph-embedding training-data export."""
    from onionnet_spark.operators.walks import random_walks, skipgram_pairs

    g = _cosupply_graph(spark, sf_dir, 60)
    return skipgram_pairs(random_walks(g, walk_len=8), window=2)


@register(
    "graph_adjacency_export",
    f"""WITH {CTES},
    e AS (SELECT src_layer || ':' || src_id AS u,
                 dst_layer || ':' || dst_id AS v
          FROM edges_g)
    SELECT u AS node_key, string_agg(v, ' ' ORDER BY v) AS neighbors,
           CAST(COUNT(*) AS BIGINT) AS degree
    FROM e GROUP BY u""",
)
def graph_adjacency_export_q(spark, sf_dir):
    """CSR-shaped adjacency export (sorted neighbor arrays + degree)
    — the GNN-loader layout. The library API (export_adjacency)
    returns the real array column; the gate surface flattens it to a
    space-joined string because the driver canonicalizer hashes
    scalars only."""
    adj = properties.export_adjacency(get_graph(spark, sf_dir), "downstream")
    return adj.select(
        "node_key",
        F.array_join("neighbors", " ").alias("neighbors"),
        "degree",
    )


# --------------------------------------------------------------------------
# Round 4: feature aggregation, link prediction, degree-tail profile
# --------------------------------------------------------------------------

_CANON_SQL = """canon AS MATERIALIZED (
      SELECT DISTINCT
        LEAST(src_layer || ':' || src_id, dst_layer || ':' || dst_id) AS a,
        GREATEST(src_layer || ':' || src_id, dst_layer || ':' || dst_id) AS b
      FROM edges_g
      WHERE src_layer || ':' || src_id <> dst_layer || ':' || dst_id),
    cdeg AS MATERIALIZED (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM canon UNION ALL SELECT b FROM canon)
      GROUP BY n)"""


@register(
    "graph_neighbor_agg",
    # quantize_scale=100: val is a 2dp money-like property, so the
    # sums run on exact integer cents (double summation order is
    # engine-dependent; integer sums are not)
    f"""WITH {CTES},
    agg AS (
      SELECT e.src_layer AS layer, e.src_id AS node_id,
             CAST(COUNT(*) AS BIGINT) AS n_nbrs,
             SUM(CAST(floor(p.val * 100 + 0.5) AS BIGINT)) AS sq,
             COUNT(p.val) AS nv,
             MIN(p.val) AS min_val, MAX(p.val) AS max_val
      FROM edges_g e
      JOIN nodes_g p ON p.layer = e.dst_layer AND p.node_id = e.dst_id
      GROUP BY 1, 2)
    SELECT n.layer, n.node_id,
           COALESCE(a.n_nbrs, 0) AS n_nbrs,
           ROUND(a.sq / 100.0, 6) AS sum_val,
           ROUND(a.sq / 100.0 / a.nv, 6) AS mean_val,
           a.min_val, a.max_val
    FROM nodes_g n LEFT JOIN agg a
      ON a.layer = n.layer AND a.node_id = n.node_id""",
)
def graph_neighbor_agg_q(spark, sf_dir):
    """One GNN message-passing layer: every node aggregates the
    numeric `val` property of its downstream neighbors."""
    return analytics.neighbor_agg(
        get_graph(spark, sf_dir), prop="val", direction="downstream",
        quantize_scale=100,
    )


@register(
    "graph_link_prediction",
    # supplier-part incidence graph: suppliers pair through shared
    # parts; AA weights are 1e-6-grid integer sums (see operator)
    """WITH sp AS (
      SELECT DISTINCT CAST(l_suppkey AS VARCHAR) AS id,
                      'part:' || CAST(l_partkey AS VARCHAR) AS nbr
      FROM lineitem),
    dfreq AS (SELECT nbr, COUNT(*) AS df FROM sp GROUP BY nbr),
    wtab AS (SELECT nbr, df,
                    CASE WHEN df >= 2
                         THEN CAST(floor(1000000.0 / ln(CAST(df AS DOUBLE))) AS BIGINT)
                         ELSE 0 END AS w_q
             FROM dfreq WHERE df <= 1000),
    nw AS (SELECT sp.id, sp.nbr, w.w_q FROM sp JOIN wtab w ON w.nbr = sp.nbr),
    sizes AS (SELECT id, COUNT(*) AS n FROM nw GROUP BY id),
    pair AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS common, SUM(a.w_q) AS aa_q
      FROM nw a JOIN nw b ON a.nbr = b.nbr AND a.id < b.id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2)
    SELECT id_a, id_b, common,
           ROUND(common / (sa.n + sb.n - common), 6) AS jaccard,
           ROUND(aa_q / 1000000.0, 6) AS adamic_adar
    FROM pair JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b""",
)
def graph_link_prediction_q(spark, sf_dir):
    """Common-neighbors / Jaccard / Adamic-Adar over the
    supplier-part incidence graph: which suppliers stock similar
    part portfolios (>= 2 shared parts)."""
    from onionnet_spark.sources.tpch_graph import load_tables

    li = load_tables(spark, sf_dir)["lineitem"]
    nodes = (
        li.select(
            F.lit("supplier").alias("layer"),
            F.col("l_suppkey").cast("string").alias("node_id"),
        )
        .unionByName(
            li.select(
                F.lit("part").alias("layer"),
                F.col("l_partkey").cast("string").alias("node_id"),
            )
        )
        .distinct()
    )
    edges = li.select(
        F.lit("supplier").alias("src_layer"),
        F.col("l_suppkey").cast("string").alias("src_id"),
        F.lit("part").alias("dst_layer"),
        F.col("l_partkey").cast("string").alias("dst_id"),
    ).distinct()
    g = derived_graph(
        spark, sf_dir, "supplier_part",
        lambda: OnionGraph(nodes, edges).persist(),
    )
    return analytics.link_prediction(g, layer="supplier", min_common=2)


@register(
    "graph_degree_distribution",
    f"""WITH {CTES},
    {_CANON_SQL},
    alln AS (SELECT layer || ':' || node_id AS node FROM nodes_g)
    SELECT CAST(COALESCE(c.d, 0) AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM alln LEFT JOIN cdeg c ON c.n = alln.node
    GROUP BY 1""",
)
def graph_degree_distribution_q(spark, sf_dir):
    """Undirected degree histogram over the full multilayer graph,
    isolated nodes included at degree 0."""
    return analytics.degree_distribution(get_graph(spark, sf_dir))


@register(
    "graph_powerlaw_alpha",
    f"""WITH {CTES},
    {_CANON_SQL},
    t AS (SELECT d FROM cdeg WHERE d >= 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(2 AS INT) AS d_min,
           ROUND(1.0 + COUNT(*)
                 / (SUM(CAST(floor(ln(CAST(d AS DOUBLE) / 1.5) * 1000000) AS BIGINT))
                    / 1000000.0), 6) AS alpha
    FROM t""",
)
def graph_powerlaw_alpha_q(spark, sf_dir):
    """Clauset-Shalizi-Newman continuous-MLE power-law exponent of
    the degree tail (d >= 2), engine-exact via 1e-6-grid integer
    log sums."""
    return analytics.powerlaw_alpha(get_graph(spark, sf_dir), d_min=2)


_RICH_KS = [1, 2, 4, 8, 16, 32]


@register(
    "graph_rich_club",
    f"""WITH {CTES},
    {_CANON_SQL},
    ks AS (SELECT UNNEST({_RICH_KS}) AS k),
    mind AS (
      SELECT LEAST(da.d, db.d) AS mind
      FROM canon e JOIN cdeg da ON da.n = e.a JOIN cdeg db ON db.n = e.b),
    nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
           FROM ks JOIN cdeg ON d > k GROUP BY k),
    ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
           FROM ks JOIN mind ON mind > k GROUP BY k)
    SELECT ks.k, COALESCE(nk.n_nodes, 0) AS n_nodes,
           COALESCE(ek.n_edges, 0) AS n_edges,
           CASE WHEN COALESCE(nk.n_nodes, 0) >= 2
                THEN ROUND(2.0 * COALESCE(ek.n_edges, 0)
                           / (nk.n_nodes * (nk.n_nodes - 1)), 6)
           END AS phi
    FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k""",
)
def graph_rich_club_q(spark, sf_dir):
    """Rich-club coefficient phi(k) for k in {1,2,4,8,16,32}: edge
    density among nodes of undirected degree > k."""
    return analytics.rich_club(get_graph(spark, sf_dir), _RICH_KS)


def _topo_oracle(n_stages: int = 8) -> str:
    """Unrolled longest-path max-relaxation; MATERIALIZED per stage
    (each stage reads the previous one twice)."""
    stages = []
    for i in range(1, n_stages + 1):
        stages.append(
            f"""l{i} AS MATERIALIZED (
      SELECT n, MAX(lv) AS lv FROM (
        SELECT n, lv FROM l{i - 1}
        UNION ALL
        SELECT e.d, p.lv + 1 FROM l{i - 1} p JOIN e ON e.s = p.n
      ) GROUP BY n
    )"""
        )
    stage_sql = ",\n    ".join(stages)
    return f"""WITH {CTES},
    e AS MATERIALIZED (SELECT src_layer || ':' || src_id AS s,
                              dst_layer || ':' || dst_id AS d FROM edges_g),
    l0 AS (SELECT layer || ':' || node_id AS n, 0 AS lv FROM nodes_g),
    {stage_sql}
    SELECT split_part(n, ':', 1) AS layer,
           substr(n, length(split_part(n, ':', 1)) + 2) AS node_id,
           CAST(lv AS INT) AS level
    FROM l{n_stages}"""


@register("graph_topo_levels", _topo_oracle())
def graph_topo_levels_q(spark, sf_dir):
    """Topological generations of the TPC-H multilayer DAG (lineitem
    0 ... region 4): longest-path level per node, cycle-guarded."""
    from onionnet_spark.operators.traversal import topological_levels

    return topological_levels(get_graph(spark, sf_dir))


@register("graph_conductance", None)  # oracle composed below
def graph_conductance_q(spark, sf_dir):
    """Per-community conductance over the LPA communities (same
    layer view, rounds and tie-break as graph_communities_lpa)."""
    from onionnet_spark.operators.components import community_conductance

    g = _entity_graph(spark, sf_dir)
    return community_conductance(g, n_rounds=5)


def _conductance_oracle() -> str:
    # Re-package the full LPA oracle as one nested MATERIALIZED CTE
    # (its own WITH chain stays scoped inside), then aggregate
    # volume / cut / conductance over the SAME distinct
    # directed-symmetric edge set the Spark side uses.
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    return f"""WITH {CTES},
    lpa AS MATERIALIZED ({_lpa_oracle()}),
    es AS (SELECT * FROM edges_g
           WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    sym AS MATERIALIZED (
      SELECT DISTINCT src_layer || ':' || src_id AS src,
                      dst_layer || ':' || dst_id AS dst FROM es
      UNION
      SELECT DISTINCT dst_layer || ':' || dst_id, src_layer || ':' || src_id FROM es),
    lab AS (SELECT layer || ':' || node_id AS key, community FROM lpa),
    joined AS (
      SELECT la.community AS ca, lb.community AS cb
      FROM sym s
      JOIN lab la ON la.key = s.src
      JOIN lab lb ON lb.key = s.dst),
    per AS (
      SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS volume,
             CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT)
               AS cut_edges
      FROM joined GROUP BY ca),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS e2 FROM joined),
    nn AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
           FROM lpa GROUP BY community)
    SELECT nn.community, nn.n_nodes,
           COALESCE(per.volume, 0) AS volume,
           COALESCE(per.cut_edges, 0) AS cut_edges,
           CASE WHEN LEAST(per.volume, tot.e2 - per.volume) > 0
                THEN ROUND(per.cut_edges * 1.0
                           / LEAST(per.volume, tot.e2 - per.volume), 6)
           END AS conductance
    FROM nn LEFT JOIN per ON per.community = nn.community
    CROSS JOIN tot"""


_REG["graph_conductance"] = (graph_conductance_q, _conductance_oracle())


def _node2vec_oracle(
    topn: int = 60, walk_len: int = 6, p: float = 4.0, q: float = 0.25
) -> str:
    wp = int(round(1_000_000 / p))
    wf = int(round(1_000_000 / q))
    draw = (
        "CAST(substr(translate(md5(start || '|' || cur || '|' || '{t}'),"
        " 'abcdef', '012345'), 1, 6) AS BIGINT)"
    )
    stages, selects = [], [
        "SELECT start, CAST(0 AS INT) AS step, cur AS node FROM s0"
    ]
    for t in range(1, walk_len + 1):
        if t == 1:
            weight = "CAST(1000000 AS BIGINT)"
            near_join = ""
        else:
            weight = f"""CASE WHEN a.v = s.prev THEN CAST({wp} AS BIGINT)
                    WHEN en.u IS NOT NULL THEN CAST(1000000 AS BIGINT)
                    ELSE CAST({wf} AS BIGINT) END"""
            near_join = "LEFT JOIN adjd en ON en.u = s.prev AND en.v = a.v"
        stages.append(
            f"""n{t} AS (
      SELECT s.start, s.cur AS prev, a.v, {weight} AS w
      FROM s{t - 1} s
      JOIN adjd a ON a.u = s.cur
      {near_join}),
    c{t} AS (
      SELECT start, prev, v, w, prev AS cur,
             SUM(w) OVER (PARTITION BY start ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY start) AS tot
      FROM n{t}),
    s{t} AS MATERIALIZED (
      SELECT start, prev, v AS cur FROM c{t}
      WHERE cum - w <= {draw.format(t=t)} % tot
        AND {draw.format(t=t)} % tot < cum
    )"""
        )
        selects.append(
            f"SELECT start, CAST({t} AS INT) AS step, cur AS node FROM s{t}"
        )
    stage_sql = ",\n    ".join(stages)
    union_sql = "\n    UNION ALL ".join(selects)
    return f"""WITH {_COSUPPLY_SQL.format(topn=topn)},
    adjd AS MATERIALIZED (SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0),
    s0 AS (SELECT DISTINCT u AS start, u AS cur, CAST(NULL AS VARCHAR) AS prev
           FROM adjd),
    {stage_sql}
    {union_sql}"""


@register("graph_node2vec_walks", _node2vec_oracle())
def graph_node2vec_walks(spark, sf_dir):
    """node2vec second-order biased walks (p=4, q=0.25, len 6) over
    the symmetrized top-60 co-supply graph; integer weights +
    cumulative-interval draw replayed verbatim by the oracle."""
    from onionnet_spark.operators.walks import node2vec_walks

    g = _cosupply_graph(spark, sf_dir, 60)
    return node2vec_walks(g, walk_len=6, p=4.0, q=0.25)


@register(
    "graph_centralization",
    f"""WITH {{ctes}},
    sym AS (
      SELECT DISTINCT src_layer || ':' || src_id AS u,
                      dst_layer || ':' || dst_id AS v FROM edges_g
      UNION
      SELECT DISTINCT dst_layer || ':' || dst_id, src_layer || ':' || src_id
      FROM edges_g),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
    alln AS (
      SELECT layer || ':' || node_id AS key FROM nodes_g),
    degs AS (
      SELECT a.key, COALESCE(deg.d, 0) AS d
      FROM alln a LEFT JOIN deg ON deg.u = a.key),
    st AS (SELECT COUNT(*) AS n, MAX(d) AS dmax, SUM(d) AS dsum FROM degs)
    SELECT CAST(n AS BIGINT) AS n_nodes, CAST(dmax AS BIGINT) AS max_degree,
           CAST(n * dmax - dsum AS BIGINT) AS centralization_num,
           CASE WHEN n > 2
                THEN ROUND(CAST(n * dmax - dsum AS DOUBLE)
                           / ((n - 1.0) * (n - 2.0)), 6)
           END AS centralization
    FROM st""".format(ctes=CTES),
)
def graph_centralization_q(spark, sf_dir):
    """Freeman degree centralization of the full multilayer graph —
    the star-vs-mesh global-structure scalar: sum(dmax - d_i)
    normalized by the star graph's maximum (n-1)(n-2). Degrees come
    from the shared distinct-symmetrized view; isolated nodes count
    with degree 0."""
    g = get_graph(spark, sf_dir)
    sym = g.cached_symmetrized().select(
        F.concat_ws(":", "src_layer", "src_id").alias("u")
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    alln = g.nodes.select(F.concat_ws(":", "layer", "node_id").alias("key"))
    degs = alln.join(deg, alln["key"] == deg["u"], "left").select(
        F.coalesce("d", F.lit(0)).alias("d")
    )
    st = degs.agg(
        F.count("*").alias("n"), F.max("d").alias("dmax"), F.sum("d").alias("dsum")
    )
    return st.select(
        F.col("n").cast("bigint").alias("n_nodes"),
        F.col("dmax").cast("bigint").alias("max_degree"),
        (F.col("n") * F.col("dmax") - F.col("dsum"))
        .cast("bigint")
        .alias("centralization_num"),
        F.when(
            F.col("n") > 2,
            F.round(
                (F.col("n") * F.col("dmax") - F.col("dsum")).cast("double")
                / ((F.col("n") - 1.0) * (F.col("n") - 2.0)),
                6,
            ),
        ).alias("centralization"),
    )


@register(
    "graph_layer_matrix",
    f"""WITH {{ctes}},
    e AS (SELECT src_layer, dst_layer,
                 src_layer || ':' || src_id AS sk,
                 dst_layer || ':' || dst_id AS dk
          FROM edges_g)
    SELECT src_layer, dst_layer, CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_src_nodes,
           CAST(COUNT(DISTINCT dk) AS BIGINT) AS n_dst_nodes
    FROM e GROUP BY src_layer, dst_layer""".format(ctes=CTES),
)
def graph_layer_matrix_q(spark, sf_dir):
    """Layer-connectivity matrix of the multilayer graph — per
    (source layer, destination layer): edge count and distinct
    endpoint counts. The first summary a reference user prints
    after grow_onion (which layers actually talk to which?); one
    aggregation with map-side partials."""
    g = get_graph(spark, sf_dir)
    return g.edge_endpoints().groupBy("src_layer", "dst_layer").agg(
        F.count("*").cast("bigint").alias("n_edges"),
        F.count_distinct(F.concat_ws(":", "src_layer", "src_id"))
        .cast("bigint")
        .alias("n_src_nodes"),
        F.count_distinct(F.concat_ws(":", "dst_layer", "dst_id"))
        .cast("bigint")
        .alias("n_dst_nodes"),
    )


@register(
    "graph_salsa",
    # SALSA's stationary distribution is closed-form (component share
    # x in-degree share), so the oracle needs no power iteration —
    # just weak CC over the hub/authority split graph. Min-label
    # propagation is unrolled 10 MATERIALIZED rounds; split-graph
    # min-label eccentricity is 6 at sf0.01/sf0.001, and a
    # NOT-CONVERGED sentinel row makes any violation a loud row-count
    # mismatch instead of a silent wrong answer. score_ppm is exact
    # integer division on both engines (// here, div in Spark).
    """WITH {ctes},
    es AS MATERIALIZED (
      SELECT 'h:' || src_layer || ':' || src_id AS h,
             'a:' || dst_layer || ':' || dst_id AS a,
             dst_layer, dst_id
      FROM edges_g WHERE src_layer = 'lineitem'),
    und AS MATERIALIZED (
      SELECT h AS u, a AS v FROM es UNION SELECT a, h FROM es),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS n, u AS c FROM und),
    l1 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l0 l
      JOIN und e ON e.u = l.n JOIN l0 r ON r.n = e.v GROUP BY l.n, l.c),
    l2 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l1 l
      JOIN und e ON e.u = l.n JOIN l1 r ON r.n = e.v GROUP BY l.n, l.c),
    l3 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l2 l
      JOIN und e ON e.u = l.n JOIN l2 r ON r.n = e.v GROUP BY l.n, l.c),
    l4 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l3 l
      JOIN und e ON e.u = l.n JOIN l3 r ON r.n = e.v GROUP BY l.n, l.c),
    l5 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l4 l
      JOIN und e ON e.u = l.n JOIN l4 r ON r.n = e.v GROUP BY l.n, l.c),
    l6 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l5 l
      JOIN und e ON e.u = l.n JOIN l5 r ON r.n = e.v GROUP BY l.n, l.c),
    l7 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l6 l
      JOIN und e ON e.u = l.n JOIN l6 r ON r.n = e.v GROUP BY l.n, l.c),
    l8 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l7 l
      JOIN und e ON e.u = l.n JOIN l7 r ON r.n = e.v GROUP BY l.n, l.c),
    l9 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l8 l
      JOIN und e ON e.u = l.n JOIN l8 r ON r.n = e.v GROUP BY l.n, l.c),
    l10 AS MATERIALIZED (
      SELECT l.n, LEAST(l.c, MIN(r.c)) AS c FROM l9 l
      JOIN und e ON e.u = l.n JOIN l9 r ON r.n = e.v GROUP BY l.n, l.c),
    ind AS MATERIALIZED (
      SELECT a AS n, dst_layer, dst_id, CAST(COUNT(*) AS BIGINT) AS indeg
      FROM es GROUP BY 1, 2, 3),
    auth AS (SELECT n, c FROM l10 WHERE n LIKE 'a:%'),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_auth FROM ind),
    comp AS (SELECT a.c, CAST(COUNT(*) AS BIGINT) AS comp_auth,
                    CAST(SUM(i.indeg) AS BIGINT) AS comp_indeg
             FROM auth a JOIN ind i ON i.n = a.n GROUP BY a.c)
    SELECT i.dst_layer AS layer, i.dst_id AS node_id, i.indeg,
           substring(a.c, 3) AS component,
           CAST((1000000 * comp.comp_auth * i.indeg)
                // (tot.n_auth * comp.comp_indeg) AS BIGINT) AS score_ppm
    FROM ind i JOIN auth a ON a.n = i.n
    JOIN comp ON comp.c = a.c CROSS JOIN tot
    UNION ALL
    SELECT 'NOT_CONVERGED', '', 0, '', 0
    WHERE EXISTS (SELECT 1 FROM l10 j JOIN l9 p ON p.n = j.n
                  WHERE p.c <> j.c)""".format(ctes=CTES),
)
def graph_salsa_q(spark, sf_dir):
    """SALSA stationary authority scores over the lineitem ->
    (orders, part, supplier) bipartite slice — iteration-free
    closed form via node-splitting + one weak-CC fixpoint
    (analytics.salsa_scores)."""
    g = get_graph(spark, sf_dir)
    return analytics.salsa_scores(g, hub_layers=["lineitem"])


@register(
    "graph_edge_embeddedness",
    # Embeddedness = per-edge triangle count = |N(u) ∩ N(v)|; an
    # embeddedness-0 edge is a local bridge. Graph: suppliers joined
    # when their shared-part count clears 88% of the global max
    # (data-derived threshold, integer cross-multiplied) — sparse
    # with real triangle structure at sf0.01 (k in 0..11).
    """WITH sp AS (
      SELECT DISTINCT l_partkey AS part, CAST(l_suppkey AS VARCHAR) AS s
      FROM lineitem),
    pairs AS (
      SELECT a.s AS sa, b.s AS sb, COUNT(*) AS ns
      FROM sp a JOIN sp b ON a.part = b.part AND a.s < b.s
      GROUP BY 1, 2),
    mx AS (SELECT MAX(ns) AS m FROM pairs),
    e AS (SELECT sa, sb FROM pairs, mx WHERE 100 * ns >= 88 * m),
    und AS (SELECT sa AS u, sb AS v FROM e UNION ALL SELECT sb, sa FROM e),
    emb AS (
      SELECT e.sa, e.sb, COUNT(av.v) AS k
      FROM e
      LEFT JOIN und au ON au.u = e.sa
      LEFT JOIN und av ON av.u = e.sb AND av.v = au.v
      GROUP BY 1, 2)
    SELECT 'supplier' AS src_layer, sa AS src_id,
           'supplier' AS dst_layer, sb AS dst_id,
           CAST(k AS BIGINT) AS embeddedness
    FROM emb""",
)
def graph_edge_embeddedness_q(spark, sf_dir):
    """Per-edge embeddedness / local-bridge detection on the strong
    co-supply supplier graph (analytics.edge_embeddedness)."""
    from onionnet_spark.sources.tpch_graph import load_tables

    def build():
        t = load_tables(spark, sf_dir)
        sp = t["lineitem"].select(
            F.col("l_partkey").alias("part"),
            F.col("l_suppkey").cast("string").alias("s"),
        ).distinct()
        pairs = (
            sp.alias("a")
            .join(sp.alias("b"), on="part")
            .filter(F.col("a.s") < F.col("b.s"))
            .groupBy(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
            .agg(F.count("*").alias("ns"))
        )
        mx = pairs.agg(F.max("ns").alias("m"))
        edges = (
            pairs.crossJoin(F.broadcast(mx))
            .filter(F.lit(100) * F.col("ns") >= F.lit(88) * F.col("m"))
            .select(
                F.lit("supplier").alias("src_layer"),
                F.col("sa").alias("src_id"),
                F.lit("supplier").alias("dst_layer"),
                F.col("sb").alias("dst_id"),
            )
        )
        suppliers = t["supplier"].select(
            F.lit("supplier").alias("layer"),
            F.col("s_suppkey").cast("string").alias("node_id"),
        )
        # canonical sa < sb pairs, each once: pair-unique, no loops
        return OnionGraph(suppliers, edges, edges_unique_undirected=True)

    g = derived_graph(spark, sf_dir, "cosupply_suppliers_strong", build)
    return analytics.edge_embeddedness(g)


# --------------------------------------------------------------------------
# Round 5: WL refinement + 4-cycle census
# --------------------------------------------------------------------------


def _wl_oracle(rounds: int = 3, topn: int = 60) -> str:
    ctes = [
        _COSUPPLY_SQL.format(topn=topn),
        "adj AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0)",
        "c0 AS (SELECT u, md5(CAST(COUNT(*) AS VARCHAR)) AS c FROM adj GROUP BY u)",
    ]
    prev = "c0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"""n{t} AS (SELECT adj.u, string_agg(x.c, ',' ORDER BY x.c) AS s
       FROM adj JOIN {prev} x ON x.u = adj.v GROUP BY adj.u)"""
        )
        ctes.append(
            f"""c{t} AS (SELECT p.u, md5(p.c || '|' || n{t}.s) AS c
       FROM {prev} p JOIN n{t} ON n{t}.u = p.u)"""
        )
        prev = f"c{t}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT u AS node_id, c AS color FROM {prev}"
    )


@register("graph_wl_colors", _wl_oracle())
def graph_wl_colors_q(spark, sf_dir):
    """1-WL color refinement (3 rounds) on the top-60 co-supply
    graph: canonical structural-role colors per node — the
    isomorphism-test / GNN-expressivity primitive. Oracle unrolls
    the identical hash schedule."""
    from onionnet_spark.operators.analytics import wl_refinement

    return wl_refinement(_cosupply_top_pairs(spark, sf_dir, 60), rounds=3)


@register(
    "graph_square_count",
    f"""WITH {_COSUPPLY_SQL.format(topn=60)},
    adj AS (SELECT a AS ctr, b AS x FROM e0 UNION ALL SELECT b, a FROM e0),
    wd AS (SELECT a1.x AS u, a2.x AS w, COUNT(*) AS c
           FROM adj a1 JOIN adj a2 ON a1.ctr = a2.ctr AND a1.x < a2.x
           GROUP BY a1.x, a2.x)
    SELECT CAST(SUM(c) AS BIGINT) AS n_wedges,
           CAST(SUM(c * (c - 1)) // 4 AS BIGINT) AS n_squares
    FROM wd""",
)
def graph_square_count_q(spark, sf_dir):
    """Global 4-cycle census on the top-60 co-supply graph via
    wedge-endpoint aggregation — the quadrilateral sibling of
    triangle_count (C4 density drives bipartite-ness / redundancy
    signals). Integer-exact: sum(c*(c-1)) div 4."""
    from onionnet_spark.operators.analytics import square_count

    return square_count(_cosupply_top_pairs(spark, sf_dir, 60))


# --------------------------------------------------------------------------
# Round 5: HyperANF (HLL-register neighborhood function), fully deterministic
# --------------------------------------------------------------------------


@register("graph_hyperanf", None)  # oracle generated below (unrolled rounds)
def graph_hyperanf_q(spark, sf_dir):
    """HLL-register ANF (HyperANF proper) on the 4-layer supply
    view — the register-based scale path next to graph_anf's k-mins
    sketch. Deterministic md5 hashing + an integer-exact register
    sum make the approximation itself hash-oracle-able."""
    g = _entity_graph(spark, sf_dir)
    return analytics.hyperanf(g, radius=3, m=64)


def _hyperanf_oracle(radius: int = 3, m: int = 64) -> str:
    """Unrolls the HLL register propagation: identical md5-derived
    (index, rho) draws, per-round elementwise MAX, the exact-BIGINT
    2^(53-M) register sum and the published small-range correction —
    a full hash-match oracle for HyperANF (only the estimate's
    relation to the true ball is statistical)."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    rcols = [f"r{j}" for j in range(m)]
    key = "layer || ':' || node_id"
    init = ",\n             ".join(
        f"CASE WHEN ('0x' || substr(md5({key}), 1, 2))::BIGINT % {m} = {j} "
        f"THEN (CASE WHEN ('0x' || substr(md5({key}), 3, 13))::BIGINT = 0 "
        f"THEN 53 ELSE 53 - length(bin(('0x' || substr(md5({key}), 3, 13))::BIGINT)) END) "
        f"ELSE 0 END AS r{j}"
        for j in range(m)
    )
    stages = []
    for r in range(1, radius + 1):
        maxs = ", ".join(f"MAX({c}) AS {c}" for c in rcols)
        props = ", ".join(f"s.{c}" for c in rcols)
        stages.append(
            f"""h{r} AS MATERIALIZED (
      SELECT layer, node_id, {maxs} FROM (
        SELECT * FROM h{r - 1}
        UNION ALL
        SELECT e.src_layer AS layer, e.src_id AS node_id, {props}
        FROM es e JOIN h{r - 1} s
          ON s.layer = e.dst_layer AND s.node_id = e.dst_id
      ) GROUP BY layer, node_id)"""
        )
    stage_sql = ",\n    ".join(stages)
    inv = " + ".join(f"(1::BIGINT << (53 - {c}))" for c in rcols)
    zeros = " + ".join(f"(CASE WHEN {c} = 0 THEN 1 ELSE 0 END)" for c in rcols)
    num = repr(alpha * m * m * float(2**53))
    return f"""WITH {{ctes}},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (
      SELECT src_layer, src_id, dst_layer, dst_id FROM edges_g
      WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    h0 AS MATERIALIZED (
      SELECT layer, node_id,
             {init}
      FROM ns),
    {stage_sql},
    fin AS (SELECT layer, node_id, {inv} AS inv_sum, {zeros} AS zeros
            FROM h{radius}),
    est AS (SELECT layer, node_id, zeros,
                   {num} / CAST(inv_sum AS DOUBLE) AS raw
            FROM fin)
    SELECT layer, node_id,
           ROUND(CASE WHEN raw < {2.5 * m!r} AND zeros > 0
                      THEN {float(m)!r} * ln({float(m)!r} / zeros)
                      ELSE raw END, 6) AS est_ball
    FROM est""".format(ctes=CTES)


_REG["graph_hyperanf"] = (graph_hyperanf_q, _hyperanf_oracle())


@register(
    "graph_clique4",
    # oracle = the definition: all a<b<c<d with all six edges present
    f"""WITH {_COSUPPLY_SQL.format(topn=60)},
    adj AS (SELECT a, b FROM e0),
    tri AS (SELECT t1.a AS x, t1.b AS y, t2.b AS z
            FROM adj t1 JOIN adj t2 ON t2.a = t1.b
            JOIN adj t3 ON t3.a = t1.a AND t3.b = t2.b),
    k4 AS (SELECT t.x, t.y, t.z, e.b AS w
           FROM tri t JOIN adj e ON e.a = t.z
           WHERE EXISTS (SELECT 1 FROM adj p WHERE p.a = t.x AND p.b = e.b)
             AND EXISTS (SELECT 1 FROM adj q WHERE q.a = t.y AND q.b = e.b))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM k4) AS n_4cliques""",
)
def graph_clique4_q(spark, sf_dir):
    """K4 census on the top-60 co-supply graph via degree-ordered DAG
    extension — the clique-ladder rung above triangle_count. The
    oracle counts sorted 4-tuples straight from the definition, so
    the hash match proves the oriented enumeration exact."""
    from onionnet_spark.operators.analytics import clique4_count

    return clique4_count(_cosupply_top_pairs(spark, sf_dir, 60))


# --------------------------------------------------------------------------
# Round 5: onion decomposition (the namesake structure)
# --------------------------------------------------------------------------


def _onion_oracle(rounds: int = 8, topn: int = 60) -> str:
    """Unrolls the simultaneous-peel rounds: per round a degree
    table over the remaining universe (LEFT JOIN so stripped
    degree-0 nodes count), the ratcheting core value
    k_t = GREATEST(k_{t-1}, MIN(deg)), removal of deg <= k_t with
    (layer, coreness) labels. Empty rounds no-op (MIN coalesces to
    the previous k); a NOT-CONVERGED sentinel row appears if nodes
    survive the whole unroll, so an undersized schedule fails the
    hash LOUDLY instead of truncating silently (fixture peels in 4
    rounds; 8 is double that)."""
    ctes = [
        _COSUPPLY_SQL.format(topn=topn),
        """adj0 AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0)""",
        "n0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM adj0)",
        "k0 AS (SELECT 0 AS k)",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"""d{t} AS MATERIALIZED (
      SELECT n0.n, COALESCE(dd.d, 0) AS d
      FROM n{p} n0 LEFT JOIN (
        SELECT u, COUNT(*) AS d FROM adj{p} GROUP BY u) dd ON dd.u = n0.n)"""
        )
        ctes.append(
            f"""k{t} AS MATERIALIZED (
      SELECT GREATEST((SELECT k FROM k{p}),
                      COALESCE((SELECT MIN(d) FROM d{t}),
                               (SELECT k FROM k{p}))) AS k)"""
        )
        ctes.append(
            f"""o{t} AS MATERIALIZED (
      SELECT n, {t} AS layer, (SELECT k FROM k{t}) AS coreness
      FROM d{t} WHERE d <= (SELECT k FROM k{t}))"""
        )
        ctes.append(
            f"""n{t} AS MATERIALIZED (
      SELECT n FROM d{t} WHERE d > (SELECT k FROM k{t}))"""
        )
        ctes.append(
            f"""adj{t} AS MATERIALIZED (
      SELECT adj.u, adj.v FROM adj{p} adj
      JOIN n{t} x ON x.n = adj.u JOIN n{t} y ON y.n = adj.v)"""
        )
    unions = "\n    UNION ALL ".join(
        f"SELECT n AS node, CAST(layer AS INT) AS layer, "
        f"CAST(coreness AS INT) AS coreness FROM o{t}"
        for t in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    {unions}
    UNION ALL
    SELECT 'NOT-CONVERGED', -1, -1 WHERE EXISTS (SELECT 1 FROM n{rounds})"""
    )


@register("graph_onion_layers", None)  # oracle attached below (generated)
def graph_onion_layers_q(spark, sf_dir):
    """Onion decomposition of the top-60 co-supply graph — the
    namesake structure: (layer, coreness) per node, locating each
    node WITHIN its k-core shell (center vs periphery). Peels in
    simultaneous rounds; the oracle unrolls the identical ratchet."""
    from onionnet_spark.operators.analytics import onion_decomposition

    return onion_decomposition(_cosupply_top_pairs(spark, sf_dir, 60))


_REG["graph_onion_layers"] = (graph_onion_layers_q, _onion_oracle())


@register(
    "graph_link_training_set",
    # positives = the co-supply edges; negatives = md5-selected node
    # pairs with the true edge set ANTI-JOINED away — the standard
    # link-prediction training-table construction (deterministic
    # negative sampling, no RNG): candidate pair (a,b), a<b, enters
    # when md5(a||'~'||b) starts below the rate threshold.
    f"""WITH {_COSUPPLY_SQL.format(topn=60)},
    nodes AS (SELECT DISTINCT n FROM (
        SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)),
    cand AS (
      SELECT x.n AS a, y.n AS b FROM nodes x JOIN nodes y ON x.n < y.n),
    neg AS (
      SELECT a, b FROM cand
      WHERE ('0x' || substr(md5(a || '~' || b), 1, 4))::BIGINT < 19661
        AND NOT EXISTS (SELECT 1 FROM e0 e WHERE e.a = cand.a AND e.b = cand.b))
    SELECT a, b, CAST(1 AS INT) AS label FROM e0
    UNION ALL
    SELECT a, b, CAST(0 AS INT) AS label FROM neg""",
)
def graph_link_training_set_q(spark, sf_dir):
    """Link-prediction training table: true co-supply edges as
    positives plus deterministically hash-sampled NON-edges (~30% of
    candidate pairs, true edges anti-joined away) as negatives — the
    supervised dataset a GNN/logistic link model trains on. At scale
    the candidate space is sampled BEFORE materialization (the hash
    filter pushes into the pair join), never enumerated."""
    pairs = _cosupply_top_pairs(spark, sf_dir, 60).localCheckpoint()
    nodes = (
        pairs.select(F.col("a").alias("n"))
        .unionByName(pairs.select(F.col("b").alias("n")))
        .distinct()
    )
    cand = (
        nodes.select(F.col("n").alias("a"))
        .crossJoin(nodes.select(F.col("n").alias("b")))
        .filter(F.col("a") < F.col("b"))
    )
    sel = F.conv(
        F.substring(F.md5(F.concat_ws("~", "a", "b")), 1, 4), 16, 10
    ).cast("bigint") < 19661
    neg = (
        cand.filter(sel)
        .join(pairs, on=["a", "b"], how="left_anti")
        .select("a", "b", F.lit(0).cast("int").alias("label"))
    )
    pos = pairs.select("a", "b", F.lit(1).cast("int").alias("label"))
    return pos.unionByName(neg)


def _simrank_oracle(rounds: int = 3, c_num: int = 8, c_den: int = 10,
                    topn: int = 60) -> str:
    """Unrolls the integer SimRank recurrence: sparse symmetric score
    table seeded at the diagonal, per round routed through adjacency
    on both endpoints, s' = (c*S) // (den*da*db) in pure BIGINTs —
    the same engine-exact iterate discipline as eigenvector/Katz."""
    ctes = [
        _COSUPPLY_SQL.format(topn=topn),
        """adj AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0)""",
        "dg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM adj GROUP BY u)",
        """s0 AS MATERIALIZED (
      SELECT u AS x, u AS y, CAST(1000000 AS BIGINT) AS s FROM dg)""",
    ]
    prev = "s0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"""c{t} AS MATERIALIZED (
      SELECT a1.u AS x, a2.u AS y, SUM(s.s) AS S
      FROM {prev} s
      JOIN adj a1 ON a1.v = s.x
      JOIN adj a2 ON a2.v = s.y
      WHERE a1.u <> a2.u
      GROUP BY a1.u, a2.u)"""
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
      SELECT u AS x, u AS y, CAST(1000000 AS BIGINT) AS s FROM dg
      UNION ALL
      SELECT c.x, c.y,
             CAST(({c_num} * c.S) // ({c_den} * d1.d * d2.d) AS BIGINT) AS s
      FROM c{t} c JOIN dg d1 ON d1.u = c.x JOIN dg d2 ON d2.u = c.y
      WHERE ({c_num} * c.S) // ({c_den} * d1.d * d2.d) > 0)"""
        )
        prev = f"s{t}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT x AS node_a, y AS node_b, CAST(s AS BIGINT) AS simrank_micro
    FROM {prev} WHERE x < y"""
    )


@register("graph_simrank", None)  # oracle generated above (unrolled rounds)
def graph_simrank_q(spark, sf_dir):
    """SimRank structural similarity (3 integer-exact rounds) on the
    top-60 co-supply graph — neighbors-of-similar-nodes similarity,
    the propagating complement of Jaccard/Adamic-Adar."""
    from onionnet_spark.operators.analytics import simrank

    return simrank(_cosupply_top_pairs(spark, sf_dir, 60), rounds=3)


_REG["graph_simrank"] = (graph_simrank_q, _simrank_oracle())


@register(
    "graph_knn_profile",
    f"""WITH {CTES},
    sym AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT src_layer || ':' || src_id AS u,
               dst_layer || ':' || dst_id AS v FROM edges_g
        UNION ALL
        SELECT dst_layer || ':' || dst_id, src_layer || ':' || src_id
        FROM edges_g)
      WHERE u <> v),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS k FROM sym GROUP BY u)
    SELECT du.k AS degree,
           CAST(COUNT(DISTINCT s.u) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_edge_ends,
           CAST(SUM(dv.k) AS BIGINT) AS sum_nbr_degree,
           ROUND(SUM(dv.k) * 1.0 / COUNT(*), 6) AS knn
    FROM sym s
    JOIN deg du ON du.u = s.u
    JOIN deg dv ON dv.u = s.v
    GROUP BY du.k""",
)
def graph_knn_profile_q(spark, sf_dir):
    """Degree-correlation curve knn(k): mean neighbor degree over
    all edge-ends leaving degree-k nodes — the FULL correlation
    profile behind the scalar assortativity r (rising = assortative
    hubs-with-hubs, falling = disassortative). Exact integer sums,
    one division per degree bucket; two joins against the degree
    table keyed on the node key.

    Both inputs come from the session-shared persisted graph views
    (canonical_edges / canonical_degrees) that every other
    undirected analytic starts from: the distinct (u,v) pair set is
    the canonical a<b edge list emitted in both directions, and the
    distinct-neighbor degree IS the canonical degree — so the 4.8M
    row symmetrize+distinct is computed once per session, not
    re-derived (and double-checkpointed) per call."""
    g = get_graph(spark, sf_dir)
    canon = g.canonical_edges()  # (a, b), a < b, self-loops dropped
    sym = canon.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionByName(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
    deg = g.canonical_degrees()  # (n, d) — distinct-neighbor degree
    du = deg.select(F.col("n").alias("u"), F.col("d").cast("bigint").alias("ku"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").cast("bigint").alias("kv"))
    return (
        sym.join(du, on="u")
        .join(dv, on="v")
        .groupBy(F.col("ku").alias("degree"))
        .agg(
            F.countDistinct("u").cast("bigint").alias("n_nodes"),
            F.count("*").cast("bigint").alias("n_edge_ends"),
            F.sum("kv").cast("bigint").alias("sum_nbr_degree"),
            F.round(F.sum("kv") / F.count("*"), 6).alias("knn"),
        )
    )


@register(
    "graph_bowtie",
    # bow-tie over the entity view augmented with reverse
    # nation:0 -> supplier edges (the components_strong_cyclic
    # construction), so the largest SCC is {nation:0} ∪ its
    # suppliers; reach sets computed by honest recursion over the
    # augmented edge list
    f"""WITH RECURSIVE {CTES},
    lyr AS (SELECT * FROM edges_g
            WHERE src_layer IN ('region','nation','customer','supplier')
              AND dst_layer IN ('region','nation','customer','supplier')),
    tgt AS (SELECT CAST(MIN(CAST(dst_id AS INT)) AS VARCHAR) AS nid
            FROM lyr WHERE src_layer = 'supplier' AND dst_layer = 'nation'),
    aug AS (
      SELECT src_layer, src_id, dst_layer, dst_id FROM lyr
      UNION ALL
      SELECT dst_layer, dst_id, src_layer, src_id FROM lyr
      WHERE src_layer = 'supplier' AND dst_layer = 'nation'
        AND dst_id = (SELECT nid FROM tgt)),
    core AS (
      SELECT 'nation' AS layer, (SELECT nid FROM tgt) AS node_id
      UNION ALL
      SELECT DISTINCT 'supplier', src_id FROM lyr
      WHERE src_layer = 'supplier' AND dst_layer = 'nation'
        AND dst_id = (SELECT nid FROM tgt)),
    down(layer, node_id) AS (
      SELECT layer, node_id FROM core
      UNION
      SELECT e.dst_layer, e.dst_id FROM down d
      JOIN aug e ON e.src_layer = d.layer AND e.src_id = d.node_id),
    up(layer, node_id) AS (
      SELECT layer, node_id FROM core
      UNION
      SELECT e.src_layer, e.src_id FROM up u
      JOIN aug e ON e.dst_layer = u.layer AND e.dst_id = u.node_id)
    SELECT n.layer, n.node_id,
           CASE WHEN c.node_id IS NOT NULL THEN 'core'
                WHEN u.node_id IS NOT NULL THEN 'in'
                WHEN d.node_id IS NOT NULL THEN 'out'
                ELSE 'other' END AS bowtie_class
    FROM nodes_g n
    LEFT JOIN core c ON c.layer = n.layer AND c.node_id = n.node_id
    LEFT JOIN up u ON u.layer = n.layer AND u.node_id = n.node_id
    LEFT JOIN down d ON d.layer = n.layer AND d.node_id = n.node_id
    WHERE n.layer IN ('region','nation','customer','supplier')""",
)
def graph_bowtie_q(spark, sf_dir):
    """Broder bow-tie decomposition over the entity view augmented
    with reverse nation -> supplier edges (a real multi-node SCC,
    the components_strong_cyclic construction, anchored on the
    MIN-id nation that actually HAS suppliers — at sf0.001 nation 0
    has none and the cycle would collapse to a tie over singletons):
    core / in / out / other per node, from the honest SCC labeling
    plus two DataFrame-seeded multi-source BFS runs."""
    g = _entity_graph(spark, sf_dir)
    e = g.edge_endpoints()
    sup_nat = e.filter(
        (F.col("src_layer") == "supplier") & (F.col("dst_layer") == "nation")
    )
    target = str(
        sup_nat.agg(
            F.min(F.col("dst_id").cast("int")).alias("m")
        ).collect()[0]["m"]
    )
    rev = e.filter(
        (F.col("src_layer") == "supplier")
        & (F.col("dst_layer") == "nation")
        & (F.col("dst_id") == target)
    ).select(
        F.col("dst_layer").alias("src_layer"),
        F.col("dst_id").alias("src_id"),
        F.col("src_layer").alias("dst_layer"),
        F.col("src_id").alias("dst_id"),
    )
    cyc = OnionGraph(g.nodes, e.unionByName(rev))
    return analytics.bowtie_structure(cyc)


@register(
    "graph_path_counts",
    # unrolled length-k path DP to region:0 (the DAG depth here is
    # <= 4): pk(v) = sum over edges v->w of p(k-1)(w), integer-exact
    f"""WITH {CTES},
    e AS (SELECT src_layer, src_id, dst_layer, dst_id FROM edges_g),
    p1 AS (SELECT src_layer AS layer, src_id AS node_id,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM e WHERE dst_layer = 'region' AND dst_id = '0'
           GROUP BY 1, 2),
    p2 AS (SELECT e.src_layer AS layer, e.src_id AS node_id,
                  CAST(SUM(p.c) AS BIGINT) AS c
           FROM e JOIN p1 p ON p.layer = e.dst_layer AND p.node_id = e.dst_id
           GROUP BY 1, 2),
    p3 AS (SELECT e.src_layer AS layer, e.src_id AS node_id,
                  CAST(SUM(p.c) AS BIGINT) AS c
           FROM e JOIN p2 p ON p.layer = e.dst_layer AND p.node_id = e.dst_id
           GROUP BY 1, 2),
    p4 AS (SELECT e.src_layer AS layer, e.src_id AS node_id,
                  CAST(SUM(p.c) AS BIGINT) AS c
           FROM e JOIN p3 p ON p.layer = e.dst_layer AND p.node_id = e.dst_id
           GROUP BY 1, 2),
    p5 AS (SELECT e.src_layer AS layer, e.src_id AS node_id,
                  CAST(SUM(p.c) AS BIGINT) AS c
           FROM e JOIN p4 p ON p.layer = e.dst_layer AND p.node_id = e.dst_id
           GROUP BY 1, 2)
    SELECT layer, node_id, CAST(SUM(c) AS BIGINT) AS n_paths
    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
          UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
          UNION ALL SELECT * FROM p5)
    GROUP BY layer, node_id""",
)
def graph_path_counts_q(spark, sf_dir):
    """Distinct-path counts to region:0 (lineage multiplicity): a
    lineitem whose order-customer AND supplier both sit in region 0
    counts 2 derivation chains — the DAG dynamic program behind
    provenance fan-in and BOM explosion."""
    return analytics.count_paths_to(
        get_graph(spark, sf_dir), ("region", "0"), max_len=5
    )


@register(
    "graph_degree_gini",
    # degree-concentration Gini over the undirected canonical degree
    # table — the inequality scalar behind the powerlaw/rich-club
    # readouts; rank * value sums are exact integers
    f"""WITH {CTES},
    sym AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT CASE WHEN src_layer || ':' || src_id < dst_layer || ':' || dst_id
                    THEN src_layer || ':' || src_id
                    ELSE dst_layer || ':' || dst_id END AS u,
               CASE WHEN src_layer || ':' || src_id < dst_layer || ':' || dst_id
                    THEN dst_layer || ':' || dst_id
                    ELSE src_layer || ':' || src_id END AS v
        FROM edges_g)
      WHERE u <> v),
    deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS n FROM sym UNION ALL SELECT v FROM sym) GROUP BY 1),
    rk AS (SELECT n, d, ROW_NUMBER() OVER (ORDER BY d, n) AS rn FROM deg),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
                 CAST(SUM(d) AS DOUBLE) AS sd,
                 CAST(SUM(rn * d) AS DOUBLE) AS srd,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM rk)
    SELECT n_nodes,
           ROUND(2 * srd / (cnt * sd) - (cnt + 1) / cnt, 6) AS gini
    FROM s""",
)
def graph_degree_gini_q(spark, sf_dir):
    """Degree-concentration Gini: how unequally edges are spread
    over nodes — the single-scalar inequality companion to the
    degree-distribution / powerlaw / rich-club heads. Degrees come
    from the session-shared canonical_degrees view; the exact global
    rank is the bucketed two-phase global_rank (no global window);
    rank*degree sums are exact integers folded once into a double."""
    from onionnet_spark.functions.corpus import global_rank

    g = get_graph(spark, sf_dir)
    deg = g.canonical_degrees().select(
        "n", F.col("d").cast("bigint").alias("d")
    )
    ranked = global_rank(deg, "d", "n", n_buckets=16, rank_col="rn")
    s = ranked.agg(
        F.count("*").alias("n_nodes"),
        F.sum("d").alias("sd"),
        F.sum(F.col("rn") * F.col("d")).alias("srd"),
    )
    cnt = F.col("n_nodes").cast("double")
    return s.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.round(
            2.0 * F.col("srd").cast("double")
            / (cnt * F.col("sd").cast("double"))
            - (cnt + 1.0) / cnt,
            6,
        ).alias("gini"),
    )


@register("graph_centrality_spearman", None)  # oracle generated below
def graph_centrality_spearman_q(spark, sf_dir):
    """Spearman rank correlation between degree and PageRank(5)
    over the 4-layer slice — the do-my-centralities-agree QA that
    decides whether the cheap measure (degree) can stand in for the
    expensive one at serving time. Average ranks (standard tie
    handling) are DOUBLED so every cumulant stays an exact BIGINT:
    the doubled average rank of a tie group is 2*cum_count - c + 1,
    computed by one cumulative window over the VALUE grid (pr is
    6dp-rounded -> at most 1e6+1 distinct values; degrees collapse
    to the distinct-degree table, power-law-few in practice), never
    over rows. Pearson on the doubled ranks is one aggregate with a
    single float expression shared with the oracle (r10)."""
    from pyspark.sql import Window

    g = _entity_graph(spark, sf_dir)
    from onionnet_spark.core import NODE_KEY

    deg = analytics.degrees(g).select(
        *NODE_KEY, F.col("degree").cast("bigint").alias("deg")
    )
    pr = analytics.pagerank(g, 5).select(
        *NODE_KEY, F.round("pagerank", 6).alias("pr6")
    )
    m = pr.join(deg, on=list(NODE_KEY)).select("deg", "pr6")

    def doubled_ranks(col: str):
        # bounded: windows run over the per-VALUE aggregate (6dp
        # pagerank grid <= 1e6+1 rows; distinct degrees), the same
        # value-grid class as price_histogram's whitelisted window.
        vals = m.groupBy(col).agg(F.count("*").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return vals.select(
            col,
            (2 * F.sum("c").over(w) - F.col("c") + 1).alias("r2"),
        )

    rx = doubled_ranks("deg").withColumnRenamed("r2", "rx")
    ry = doubled_ranks("pr6").withColumnRenamed("r2", "ry")
    rk = (
        m.join(F.broadcast(rx), "deg")
        .join(F.broadcast(ry), "pr6")
        .select("rx", "ry")
    )
    a = rk.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    return a.select(
        n.cast("bigint").alias("n_nodes"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.lit(1.0)
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


_REG["graph_centrality_spearman"] = (
    graph_centrality_spearman_q,
    _pagerank_oracle(
        final_select="""
    , od AS (SELECT src_layer AS layer, src_id AS node_id, COUNT(*) AS c
             FROM es GROUP BY 1, 2)
    , idg AS (SELECT dst_layer AS layer, dst_id AS node_id, COUNT(*) AS c
              FROM es GROUP BY 1, 2)
    , m AS (
      SELECT CAST(COALESCE(od.c, 0) + COALESCE(idg.c, 0) AS BIGINT) AS deg,
             ROUND(p.pr, 6) AS pr6
      FROM ns
      LEFT JOIN od ON od.layer = ns.layer AND od.node_id = ns.node_id
      LEFT JOIN idg ON idg.layer = ns.layer AND idg.node_id = ns.node_id
      JOIN pr5 p ON p.layer = ns.layer AND p.node_id = ns.node_id)
    , vx AS (SELECT deg, COUNT(*) AS c FROM m GROUP BY 1)
    , vx2 AS (SELECT deg,
                     2 * SUM(c) OVER (ORDER BY deg
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - c + 1 AS rx
              FROM vx)
    , vy AS (SELECT pr6, COUNT(*) AS c FROM m GROUP BY 1)
    , vy2 AS (SELECT pr6,
                     2 * SUM(c) OVER (ORDER BY pr6
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - c + 1 AS ry
              FROM vy)
    , rk AS (SELECT vx2.rx, vy2.ry
             FROM m JOIN vx2 ON vx2.deg = m.deg JOIN vy2 ON vy2.pr6 = m.pr6)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND((COUNT(*) * SUM(rx * ry) - SUM(rx) * SUM(ry))
                 / sqrt((COUNT(*) * SUM(rx * rx) - SUM(rx) * SUM(rx)) * 1.0
                        * (COUNT(*) * SUM(ry * ry) - SUM(ry) * SUM(ry))), 6)
             AS spearman_rho
    FROM rk"""
    ),
)


@register("graph_voterank", None)  # oracle generated below (unrolled rounds)
def graph_voterank_q(spark, sf_dir):
    """VoteRank top-5 influential spreaders over the 4-layer slice
    (analytics.voterank): exact 2m-scaled voting abilities, delta = n
    suppression, deterministic key tie-breaks (r10)."""
    g = _entity_graph(spark, sf_dir)
    return analytics.voterank(g, k=5)


def _voterank_oracle(k: int = 5) -> str:
    """Unrolls k election rounds with the identical 2m-scaled integer
    algebra: va0 = 2m for every node, suppression subtracts exactly n
    (floored at 0), scores are BIGINT neighbor sums, winners break
    ties on the node key — so election order (and therefore every
    subsequent ability table) is bit-identical across engines."""
    lyrs = "('region', 'nation', 'customer', 'supplier')"
    stages = []
    for r in range(1, k + 1):
        p = r - 1
        stages.append(f"""sc{r} AS MATERIALIZED (
      SELECT v.layer, v.node_id,
             CAST(COALESCE(SUM(u.va), 0) AS BIGINT) AS score
      FROM va{p} v
      LEFT JOIN und e ON e.vl = v.layer AND e.vi = v.node_id
      LEFT JOIN va{p} u ON u.layer = e.ul AND u.node_id = e.ui
      WHERE v.el = 0 GROUP BY 1, 2),
    w{r} AS MATERIALIZED (
      SELECT layer, node_id, score FROM sc{r}
      ORDER BY score DESC, layer || ':' || node_id LIMIT 1),
    va{r} AS MATERIALIZED (
      SELECT v.layer, v.node_id,
             CASE WHEN w.layer IS NOT NULL THEN 0
                  WHEN nb.layer IS NOT NULL
                    THEN GREATEST(v.va - (SELECT n FROM nn), 0)
                  ELSE v.va END AS va,
             CASE WHEN w.layer IS NOT NULL THEN 1 ELSE v.el END AS el
      FROM va{p} v
      LEFT JOIN w{r} w ON w.layer = v.layer AND w.node_id = v.node_id
      LEFT JOIN (
        SELECT DISTINCT e.ul AS layer, e.ui AS node_id
        FROM und e JOIN w{r} x ON x.layer = e.vl AND x.node_id = e.vi
      ) nb ON nb.layer = v.layer AND nb.node_id = v.node_id)""")
    stage_sql = ",\n    ".join(stages)
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS rank, layer, node_id, score AS score_scaled FROM w{r}"
        for r in range(1, k + 1)
    )
    return f"""WITH {CTES},
    ns AS (SELECT layer, node_id FROM nodes_g WHERE layer IN {lyrs}),
    es AS MATERIALIZED (
      SELECT src_layer, src_id, dst_layer, dst_id FROM edges_g
      WHERE src_layer IN {lyrs} AND dst_layer IN {lyrs}),
    und AS MATERIALIZED (
      SELECT src_layer AS ul, src_id AS ui, dst_layer AS vl, dst_id AS vi
      FROM es
      UNION
      SELECT dst_layer, dst_id, src_layer, src_id FROM es),
    nn AS (SELECT COUNT(*) AS n FROM ns),
    mm AS (SELECT COUNT(*) AS m2 FROM und),
    va0 AS MATERIALIZED (
      SELECT layer, node_id, (SELECT m2 FROM mm) AS va, 0 AS el FROM ns),
    {stage_sql},
    allw AS ({finals})
    SELECT CAST(rank AS INT) AS rank, layer, node_id,
           CAST(score_scaled AS BIGINT) AS score_scaled,
           ROUND(score_scaled * 1.0 / (SELECT m2 FROM mm), 6) AS score
    FROM allw"""


_REG["graph_voterank"] = (graph_voterank_q, _voterank_oracle())


@register(
    "graph_path_length_stats",
    # Per-pivot shortest-path profile (sampled small-world stats):
    # mean geodesic length, eccentricity, and reach count from each
    # BFS pivot — the classic characteristic-path-length /
    # small-world readout next to graph_closeness (which inverts the
    # same distances into harmonic centrality) and
    # graph_pseudo_diameter (which chases only the max). One batched
    # multi-source BFS; sums and maxima are exact integers, one
    # division per pivot at the end.
    f"""WITH RECURSIVE {CTES},
    bfs(sid, layer, node_id, dist) AS (
      SELECT * FROM (VALUES
        ('region:0', 'region', '0', 0),
        ('region:1', 'region', '1', 0),
        ('nation:5', 'nation', '5', 0)) t(sid, layer, node_id, dist)
      UNION
      SELECT b.sid, e.src_layer, e.src_id, b.dist + 1
      FROM bfs b JOIN edges_g e
        ON e.dst_layer = b.layer AND e.dst_id = b.node_id
      WHERE b.dist < 8
    ),
    d AS (SELECT sid, layer, node_id, MIN(dist) AS dist
          FROM bfs GROUP BY 1, 2, 3)
    SELECT sid AS pivot,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           CAST(MAX(dist) AS INT) AS eccentricity,
           ROUND(SUM(dist) * 1.0 / COUNT(*), 6) AS mean_path_len
    FROM d WHERE dist > 0 GROUP BY sid""",
)
def graph_path_length_stats_q(spark, sf_dir):
    """Sampled characteristic path length: mean geodesic distance,
    eccentricity and reach count per BFS pivot (the small-world
    profile next to graph_closeness / graph_pseudo_diameter). One
    batched multi-source BFS over the same pivots as the closeness
    key; integer sums, one division per pivot (r10)."""
    from onionnet_spark.operators.traversal import multi_source_bfs

    d = multi_source_bfs(
        get_graph(spark, sf_dir),
        _CLOSENESS_PIVOTS,
        direction="upstream",
        max_dist=8,
    )
    return (
        d.filter(F.col("dist") > 0)
        .groupBy(F.col("sid").alias("pivot"))
        .agg(
            F.count("*").cast("bigint").alias("n_reached"),
            F.sum("dist").cast("bigint").alias("sum_dist"),
            F.max("dist").cast("int").alias("eccentricity"),
            F.round(F.sum("dist") * 1.0 / F.count("*"), 6).alias(
                "mean_path_len"
            ),
        )
    )
