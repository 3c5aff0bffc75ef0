"""Core graph model: a multi-layer graph as a pair of DataFrames.

Reference parity: ``onionnet/core.py:22-111`` (OnionNetGraph) keeps a
graph-tool Graph plus dicts mapping (layer, node_id) <-> vertex index
and dictionary-encodes layers/categorical properties. In a
distributed engine there is no "vertex index"; the node key IS the
pair ``(layer, node_id)`` and every mapping the reference keeps in
Python dicts is either unnecessary (keys are self-describing) or a
first-class DataFrame (dictionary tables, see
``onionnet_spark/functions/encoding.py``).

We deliberately do NOT hash the composite key into a 64-bit int: at
10^10+ nodes a 64-bit hash has non-trivial birthday collision
probability, and Tungsten shuffles composite (string, string) keys
efficiently. The layer column has tiny cardinality so it compresses
to a dictionary page in parquet and broadcasts for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_KEY = ["layer", "node_id"]
EDGE_KEY = ["src_layer", "src_id", "dst_layer", "dst_id"]


class OnionGraph:
    """A multi-layer property graph.

    Attributes:
        nodes: DataFrame with columns ``layer: string, node_id:
            string`` plus arbitrary property columns. One row per
            node; (layer, node_id) unique.
        edges: DataFrame with columns ``src_layer, src_id,
            dst_layer, dst_id`` (strings) plus property columns.
        directed: semantic flag; edges are always stored as
            (src, dst) rows, undirected algorithms symmetrize.
        edges_unique_undirected: builder-asserted invariant — every
            undirected node pair {u, v} (u != v) appears in AT MOST
            ONE edge row, and there are no self-loops. When true the
            undirected views skip their dedup `distinct()`, which at
            full scale is the single biggest exchange in every
            undirected analytic's plan (it shuffles the whole edge
            table to remove nothing). Set it only when the producer
            guarantees the invariant; edge-subset operations (filters,
            induced subgraphs) preserve it, unions/projections do not.
    """

    def __init__(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        directed: bool = True,
        edges_unique_undirected: bool = False,
    ):
        missing_n = set(NODE_KEY) - set(nodes.columns)
        missing_e = set(EDGE_KEY) - set(edges.columns)
        if missing_n:
            raise ValueError(f"nodes missing key columns: {missing_n}")
        if missing_e:
            raise ValueError(f"edges missing key columns: {missing_e}")
        self.nodes = nodes
        self.edges = edges
        self.directed = directed
        self.edges_unique_undirected = edges_unique_undirected
        self._endpoint_cache: dict[str, DataFrame] = {}
        self._layer_names: set[str] | None = None
        # guards EVERY check-then-persist cache builder (r11, ADVICE
        # r10): graph instances are shared session-wide (_entity_graph
        # memo), so concurrent queries racing an unguarded first build
        # would persist two copies of a view and pin the orphan until
        # session end. Re-entrant because builders nest (cached_int_sym
        # -> _int_nodes).
        import threading

        self._cache_lock = threading.RLock()

    def __del__(self):
        # Best-effort release of the per-instance cached views when
        # the graph is garbage-collected: transient graphs (filter
        # views built inside one query) would otherwise pin
        # CacheManager storage until session end. Errors are
        # swallowed — at interpreter shutdown the JVM may already be
        # gone.
        try:
            for df in self._endpoint_cache.values():
                if df is not None:
                    df.unpersist()
        except Exception:
            pass

    # ---- basic accessors -------------------------------------------------
    def node_prop_cols(self) -> list[str]:
        return [c for c in self.nodes.columns if c not in NODE_KEY]

    def edge_prop_cols(self) -> list[str]:
        return [c for c in self.edges.columns if c not in EDGE_KEY]

    def layers(self) -> DataFrame:
        """Distinct layer names with node counts (tiny result)."""
        return self.nodes.groupBy("layer").agg(F.count("*").alias("n_nodes"))

    def layer_names(self) -> set[str]:
        """Distinct layer names, collected once per instance (r10):
        every view_layers build validates its arguments against this
        set, and the session-cached base graph used to pay one full
        nodes aggregation + collect per view construction."""
        if self._layer_names is None:
            self._layer_names = {r["layer"] for r in self.layers().collect()}
        return self._layer_names

    def edge_endpoints(self) -> DataFrame:
        """Edges reduced to their key columns (column-pruned scan)."""
        return self.edges.select(*EDGE_KEY)

    def symmetrized_edges(self) -> DataFrame:
        """Undirected view: each edge emitted in both directions, deduped.

        Under the ``edges_unique_undirected`` invariant the union of
        forward + reversed rows is already duplicate-free, so the
        dedup shuffle is skipped entirely.
        """
        e = self.edge_endpoints()
        rev = e.select(
            F.col("dst_layer").alias("src_layer"),
            F.col("dst_id").alias("src_id"),
            F.col("src_layer").alias("dst_layer"),
            F.col("src_id").alias("dst_id"),
        )
        out = e.unionByName(rev)
        return out if self.edges_unique_undirected else out.distinct()

    def cached_symmetrized(self) -> DataFrame:
        """``symmetrized_edges()``, persisted once per graph instance.

        Every undirected neighborhood analytic (weak CC, LPA,
        node-Jaccard, betweenness, ego stats, closeness) starts from
        exactly this view; sharing one materialization amortizes the
        symmetrize (and, without the uniqueness invariant, its dedup
        exchange) across all of them and across iterations within
        one of them.
        """
        with self._cache_lock:
            if "sym" not in self._endpoint_cache:
                # persist, not a lazy localCheckpoint: tasks probe the
                # block cache BEFORE computing, so multiple uses of
                # this view inside one job share the first
                # materialization (a lazy checkpoint replays the
                # subtree per use — measured 10x slowdown on triangle
                # counting). The session-lifetime CacheManager pin for
                # throwaway graph instances is released by __del__.
                self._endpoint_cache["sym"] = (
                    self.symmetrized_edges().persist()
                )
        return self._endpoint_cache["sym"]

    def cached_int_sym(self) -> tuple[DataFrame, DataFrame] | None:
        """Symmetrized edges re-keyed to 64-bit node ids, for
        whole-graph BFS interiors: (sym_idx(s, d), nodes_idx(layer,
        node_id, idx)), both persisted once per instance.

        The id is xxhash64(layer, node_id) — NOT a dictionary index
        (row_number would serialize through one window task;
        monotonically_increasing_id is recompute-unstable) — and is
        COLLISION-CHECKED once at build: one aggregation compares
        count vs count_distinct over the node table and the method
        returns None on a clash, so callers fall back to the exact
        string-keyed path and results can never be silently merged.
        At bench scale (~10^6 nodes) the clash probability is ~1e-8;
        at the 10^10+ scale where birthday collisions become real
        (the reason core keys are composite strings, see module
        docstring) the check fires and the fallback runs.

        Worth it because a sym-BFS level shuffles and broadcasts the
        frontier expansion keyed by node: an 8-byte long vs two
        strings cuts the exchanged bytes ~3x and the dedup/anti-join
        hash compares to single-word ops.
        """
        with self._cache_lock:
            if "int_sym" not in self._endpoint_cache:
                nidx = self._int_nodes()
                if nidx is None:
                    self._endpoint_cache["int_sym"] = None
                else:
                    e = self.edge_endpoints().select(
                        F.xxhash64("src_layer", "src_id").alias("s"),
                        F.xxhash64("dst_layer", "dst_id").alias("d"),
                    )
                    rev = e.select(
                        F.col("d").alias("s"), F.col("s").alias("d")
                    )
                    sym = e.unionByName(rev)
                    if not self.edges_unique_undirected:
                        sym = sym.distinct()
                    self._endpoint_cache["int_sym"] = sym.persist()
        if self._endpoint_cache["int_sym"] is None:
            return None
        return self._endpoint_cache["int_sym"], self._endpoint_cache["int_nodes"]

    def _int_nodes(self) -> DataFrame | None:
        """The collision-checked xxhash64 node index shared by every
        int-keyed view (cached_int_sym / cached_int_endpoints), or
        None when the 64-bit keying clashes on this node set."""
        with self._cache_lock:
            if "int_nodes" not in self._endpoint_cache:
                nodes_idx = self.nodes.select(
                    "layer", "node_id", F.xxhash64("layer", "node_id").alias("idx")
                ).persist()
                chk = nodes_idx.agg(
                    F.count("*").alias("n"), F.count_distinct("idx").alias("d")
                ).collect()[0]
                if chk["n"] != chk["d"]:
                    nodes_idx.unpersist()
                    self._endpoint_cache["int_nodes"] = None
                else:
                    self._endpoint_cache["int_nodes"] = nodes_idx
        return self._endpoint_cache["int_nodes"]

    def cached_int_endpoints(
        self, direction: str = "downstream"
    ) -> tuple[DataFrame, DataFrame] | None:
        """Directed edge endpoints re-keyed to the collision-checked
        64-bit node ids, oriented for `direction` ('downstream'
        follows src->dst, 'upstream' the reverse): (edges(s, d),
        nodes_idx(layer, node_id, idx)), persisted once per instance.
        None when the keying collided (see cached_int_sym) — callers
        must fall back to the exact string-keyed path.
        """
        if direction not in ("downstream", "upstream"):
            raise ValueError("direction must be 'upstream' or 'downstream'")
        key = f"int_{direction}"
        with self._cache_lock:
            if key not in self._endpoint_cache:
                nidx = self._int_nodes()
                if nidx is None:
                    self._endpoint_cache[key] = None
                else:
                    s, d = (
                        ("src", "dst")
                        if direction == "downstream"
                        else ("dst", "src")
                    )
                    # NOTE (ADVICE r10): the injectivity check in
                    # _int_nodes covers the NODE table; edge endpoints
                    # hash safely because of the OnionGraph builder
                    # invariant that every edge endpoint appears in
                    # graph.nodes (the same referential-integrity
                    # precondition _bfs_int documents). A graph with
                    # dangling endpoints must not use the int views.
                    e = self.edge_endpoints().select(
                        F.xxhash64(f"{s}_layer", f"{s}_id").alias("s"),
                        F.xxhash64(f"{d}_layer", f"{d}_id").alias("d"),
                    )
                    self._endpoint_cache[key] = e.persist()
        if self._endpoint_cache[key] is None:
            return None
        return self._endpoint_cache[key], self._endpoint_cache["int_nodes"]

    def canonical_edges(self) -> DataFrame:
        """Undirected canonical edge list (a, b): 'layer:node_id'
        string keys with a < b, self-loops dropped, one row per
        undirected pair — persisted once per graph instance because
        every pair-oriented analytic (triangles, clustering
        coefficient, k-core, coreness, k-truss, matching) starts
        from exactly this projection. Under the
        ``edges_unique_undirected`` invariant the dedup `distinct()`
        (a full shuffle of the edge table that removes nothing on
        builder output) is skipped.
        """
        with self._cache_lock:
            if "canonical" not in self._endpoint_cache:
                a_key = F.concat_ws(":", "src_layer", "src_id")
                b_key = F.concat_ws(":", "dst_layer", "dst_id")
                e = (
                    self.edge_endpoints()
                    .select(
                        F.when(a_key < b_key, a_key)
                        .otherwise(b_key)
                        .alias("a"),
                        F.when(a_key < b_key, b_key)
                        .otherwise(a_key)
                        .alias("b"),
                    )
                    .filter(F.col("a") != F.col("b"))
                )
                if not self.edges_unique_undirected:
                    e = e.distinct()
                # persist: see cached_symmetrized
                self._endpoint_cache["canonical"] = e.persist()
        return self._endpoint_cache["canonical"]

    def canonical_degrees(self) -> DataFrame:
        """Undirected degree per node key over ``canonical_edges()``:
        DataFrame(n, d). Persisted per instance — the k-core peel
        baseline, triangle orientation, and clustering coefficient
        all start from exactly this aggregation.
        """
        with self._cache_lock:
            if "canonical_deg" not in self._endpoint_cache:
                canon = self.canonical_edges()
                deg = (
                    canon.select(F.col("a").alias("n"))
                    .unionByName(canon.select(F.col("b").alias("n")))
                    .groupBy("n")
                    .agg(F.count("*").alias("d"))
                )
                # persist: see cached_symmetrized
                self._endpoint_cache["canonical_deg"] = deg.persist()
        return self._endpoint_cache["canonical_deg"]

    # ---- invariants ------------------------------------------------------
    def persist(self) -> "OnionGraph":
        self.nodes = self.nodes.persist()
        self.edges = self.edges.persist()
        return self

    def unpersist(self) -> "OnionGraph":
        self.nodes.unpersist()
        self.edges.unpersist()
        for df in self._endpoint_cache.values():
            if df is not None:
                df.unpersist()
        self._endpoint_cache.clear()
        return self

    def counts(self) -> tuple[int, int]:
        return self.nodes.count(), self.edges.count()

    def cached_n_nodes(self) -> int:
        """Node count, computed once per graph instance.

        Iterative operators use it to decide whether node-keyed
        state tables (labels, ranks, contributions — all bounded by
        |V| rows) fit the broadcast budget: under the threshold the
        per-round merge joins build a broadcast hash relation and the
        big cached side (edges) is never exchanged or sorted; over it
        they fall back to shuffle joins. The count itself is one
        cheap job against the (persisted) node table.
        """
        if not hasattr(self, "_n_nodes"):
            self._n_nodes = self.nodes.count()
        return self._n_nodes

    def cached_endpoints(self, direction: str = "downstream") -> DataFrame:
        """Column-pruned edge endpoints oriented for `direction`,
        persisted once per graph instance — iterative traversals
        (BFS levels, both arms of on-shortest-path) re-scan this
        cache instead of re-materializing the projection per call.
        """
        if direction not in ("downstream", "upstream"):
            raise ValueError("direction must be 'upstream' or 'downstream'")
        with self._cache_lock:
            if direction not in self._endpoint_cache:
                e = self.edge_endpoints()
                if direction == "upstream":
                    e = e.select(
                        F.col("dst_layer").alias("src_layer"),
                        F.col("dst_id").alias("src_id"),
                        F.col("src_layer").alias("dst_layer"),
                        F.col("src_id").alias("dst_id"),
                    )
                # persist: see cached_symmetrized
                self._endpoint_cache[direction] = e.persist()
        return self._endpoint_cache[direction]

    def create_views(self, prefix: str = "onion_") -> tuple[str, str]:
        """Expose the graph to the SQL surface: temp views
        '{prefix}nodes' and '{prefix}edges', so any engine operation
        can equally be written as ``spark.sql(...)`` — the DataFrame
        and SQL programs compile to the same Catalyst plans.
        """
        n, e = f"{prefix}nodes", f"{prefix}edges"
        self.nodes.createOrReplaceTempView(n)
        self.edges.createOrReplaceTempView(e)
        return n, e

    def node_key_col(self) -> "F.Column":
        """Canonical single-string node label 'layer:node_id'.

        Mirrors create_node_label_property (reference
        property_manager.py:156-177).
        """
        return F.concat_ws(":", F.col("layer"), F.col("node_id"))
