"""OnionNet facade: the reference's single-object API surface.

Reference parity: ``onionnet/onionnet.py`` exposes one class wrapping
builder/searcher/property-manager/exporter so a user writes
``net.grow_onion(...); net.search(...); net.export_info('e')``.
This facade keeps those METHOD NAMES over the Spark engine so a
reference user can switch with minimal edits. One deliberate
difference (see core.py): there are no vertex indices in a
distributed graph — every place the reference takes
``start_node_idx`` / ``(layer_code, node_id_int)`` this API takes
the self-describing key tuple ``(layer, node_id)``.

Plot-related parameters (show_plot, graph_draw kwargs) do not exist
here: rendering is out of engine scope (SURVEY §6); use
``layout_by_layer`` / ``style_columns`` to feed any front-end.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame

from onionnet_spark import builder as _builder
from onionnet_spark.core import OnionGraph
from onionnet_spark.operators import filters as _filters
from onionnet_spark.operators import properties as _props
from onionnet_spark.operators import traversal as _traversal
from onionnet_spark.operators.components import view_components as _view_components


class OnionNet:
    """Single-entry API over an OnionGraph (reference onionnet.py)."""

    def __init__(self, graph: OnionGraph | None = None):
        self.graph = graph

    # ---- build (onionnet.py:44-56) -----------------------------------
    def grow_onion(self, df_nodes: DataFrame, df_edges: DataFrame, **kwargs) -> None:
        """First call builds the graph; later calls merge into it
        (reference grow_onion supports repeated growth).

        On the merge path, endpoint validation is deferred to
        merge_onion, which checks against the MERGED node set — a
        delta edge may legitimately reference a node added in an
        earlier call (reference builder.py:219-224 checks the
        accumulated key maps, not just the new batch).
        """
        if self.graph is None:
            self.graph = _builder.grow_onion(df_nodes, df_edges, **kwargs)
        else:
            kwargs.setdefault("validate_endpoints", False)
            new = _builder.grow_onion(df_nodes, df_edges, **kwargs)
            self.graph = _builder.merge_onion(self.graph, new)

    # ---- traversal & views (onionnet.py:58-123) ----------------------
    def search(
        self,
        start_node: tuple[str, str],
        max_dist: int = 5,
        direction: str = "downstream",
        include_upstream_children: bool = False,
    ) -> DataFrame:
        """Reference search (searcher.py:157-242), incl. the bi-mode
        include_upstream_children widening (searcher.py:212-216)."""
        return _traversal.k_hop(
            self._g(),
            start_node,
            max_dist,
            direction,
            include_upstream_children=include_upstream_children,
        )

    def compute_on_shortest(
        self, source: tuple[str, str], targets: list[tuple[str, str]]
    ) -> DataFrame:
        return _traversal.on_shortest_path(self._g(), source, targets)

    def view_layers(self, layer_names: list[str] | str) -> OnionGraph:
        return _filters.view_layers(self._g(), layer_names)

    def view_components(
        self, size_threshold: int, connectivity: str = "strong"
    ) -> DataFrame:
        # reference default is connectivity='strong' (searcher.py:284)
        return _view_components(self._g(), size_threshold, connectivity)

    def filter_view_by_property(
        self,
        prop_name: str,
        target_value: Any,
        comparison: str = "==",
        dim: str = "v",
        prune_isolated: bool = False,
    ) -> OnionGraph:
        return _filters.filter_view_by_property(
            self._g(), prop_name, target_value, comparison, dim, prune_isolated
        )

    def compose_filters(self, conditions: list[Column], mode: str = "and") -> Column:
        return _filters.compose_filters(conditions, mode)

    def create_bipartite_gv(self, layer1: str, layer2: str) -> OnionGraph:
        return _filters.bipartite_view(self._g(), layer1, layer2)

    # ---- properties (onionnet.py:125-180) ----------------------------
    def get_vertex_by_name_tuple(self, layer: str, node_id: str) -> dict[str, Any]:
        return _props.get_node_properties(self._g(), layer, node_id)

    def get_vertex_by_encoding_tuple(
        self, layer_code: int, node_id_code: int
    ) -> dict[str, Any]:
        return _props.get_node_properties_by_code(
            self._g(), layer_code, node_id_code
        )

    def get_vertex_property(self, layer: str, node_id: str, prop_name: str) -> Any:
        return _props.get_node_properties(self._g(), layer, node_id).get(prop_name)

    def set_vertex_property(
        self, layer: str, node_id: str, prop_name: str, value: Any
    ) -> None:
        self.graph = _props.set_node_property(
            self._g(), layer, node_id, prop_name, value
        )

    def view_node_properties_by_names(
        self, layer: str, node_id: str
    ) -> dict[str, Any]:
        return _props.get_node_properties(self._g(), layer, node_id)

    def create_node_label_property(self, prop_name: str = "node_label") -> None:
        self.graph = _props.with_node_labels(self._g(), prop_name)

    # ---- export (exporter.py:13-98) ----------------------------------
    def export_info(
        self, mode: str = "v", prop_names: list[str] | None = None
    ) -> DataFrame:
        if mode == "v":
            return _props.export_nodes(self._g(), prop_names)
        if mode == "e":
            return _props.export_edges(self._g(), prop_names)
        raise ValueError("mode must be 'v' or 'e'")

    def _g(self) -> OnionGraph:
        if self.graph is None:
            raise ValueError("graph not built yet: call grow_onion first")
        return self.graph
