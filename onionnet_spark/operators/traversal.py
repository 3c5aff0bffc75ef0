"""BFS traversals: k-hop ego search, reachability, on-shortest-path.

Reference parity: ``onionnet/searcher.py``:
  - search (searcher.py:157-242): k-hop ego subgraph in
    'downstream' / 'upstream' / 'bi' direction via graph-tool
    shortest_distance with max_dist.
  - _bfs_traversal (searcher.py:119-155): unbounded reachability.
  - compute_on_shortest (searcher.py:26-117): mark vertices v with
    d_fwd(source, v) + d_rev(v, targets) in {d_fwd(source, t)}.

Spark-first design: BFS is a bounded loop of joins. The frontier is
typically orders of magnitude smaller than the edge list, so each
expansion joins a *broadcast* frontier against the (persisted,
column-pruned) edge endpoints — no shuffle of the big side at all
while the frontier stays under the broadcast threshold; past it we
fall back to a shuffled join keyed on the node key (AQE picks this
up automatically from stats, we also hint explicitly from the known
frontier count, which we materialize anyway for loop control).
Visited-set lineage is truncated with localCheckpoint every few
iterations so plans don't grow exponentially with depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.core import NODE_KEY, OnionGraph

# Frontiers below this row count are broadcast to the edge join.
BROADCAST_FRONTIER_MAX = 2_000_000


def _directed_endpoints(graph: OnionGraph, direction: str) -> DataFrame:
    """Edge endpoints oriented for the requested traversal direction,
    persisted once per graph (core.cached_endpoints).

    'downstream' follows src->dst (out-edges, searcher.py:217-219),
    'upstream' follows dst->src (in-edges, searcher.py:205-211);
    'sym' traverses the undirected (symmetrized) view — both caches
    are persisted once per graph instance.
    """
    if direction == "sym":
        return graph.cached_symmetrized()
    return graph.cached_endpoints(direction)


def _sources_df(spark: SparkSession, sources) -> DataFrame:
    """Seed frame for BFS: either a driver-side list of (layer, id)
    tuples (the ego-search shape) or a DataFrame with (layer,
    node_id) columns — the multi-source-from-a-computed-set shape
    (e.g. 'everything reachable from the giant SCC'), which must
    never round-trip through the driver at scale."""
    if isinstance(sources, DataFrame):
        return sources.select(
            "layer", "node_id", F.lit(0).alias("dist")
        ).localCheckpoint()
    return spark.createDataFrame(
        [(l, str(i), 0) for (l, i) in sources], "layer string, node_id string, dist int"
    )


def bfs_distances(
    graph: OnionGraph,
    sources: list[tuple[str, str]],
    direction: str = "downstream",
    max_dist: int | None = None,
    stop_nodes: list[tuple[str, str]] | None = None,
    dynamic_cap=None,
    found_depths: list[int] | None = None,
    pace=None,
    level_hook=None,
) -> DataFrame:
    """Min hop distance from the source set to every reachable node.

    Returns DataFrame(layer, node_id, dist) including the sources at
    dist 0. Multi-source: dist is the minimum over sources, which is
    exactly the artificial-source construction the reference uses in
    compute_on_shortest (searcher.py:75-86).

    Early termination (VERDICT r2 perf item): ``stop_nodes`` stops
    the expansion once EVERY stop node has been reached — on-shortest
    membership only needs distances up to max(target dists), so
    expanding past the last target's level is wasted work
    (O(ego-radius) rounds instead of O(diameter) on a deep graph).
    If some stop node is unreachable the loop degrades gracefully to
    the normal fixpoint. ``found_depths`` (optional caller-owned
    list) receives the depth at which each stop node was first seen.
    ``dynamic_cap`` is a zero-arg callable polled between levels
    returning None (no cap yet) or an int depth cap — it lets a
    concurrently-running sibling BFS publish its max-target depth
    mid-flight, capping this run without serializing the two.

    ``pace`` is a zero-arg callable polled before each expansion
    returning None (unthrottled) or the deepest level this run may
    currently build. on_shortest_path uses it to keep the reverse
    arm from RACING past the forward arm: no target distance can
    exceed the forward fixpoint depth, so reverse levels beyond the
    forward arm's current depth can never contribute — without
    pacing, the reverse fixpoint (often the whole-graph direction)
    burns large frontier levels that the cap then discards, and
    wall time becomes a thread-scheduling lottery. ``level_hook``
    (called with the new depth after each level materializes) is the
    publishing side of that handshake.
    """
    import time as _time
    spark = graph.nodes.sparkSession
    # Int-keyed interior when the collision-checked 64-bit node
    # keying holds (core.cached_int_*): every frontier, broadcast,
    # dedup and anti-join exchange carries one 8-byte long instead of
    # two strings — the same ~2.5x per-level cut measured on the
    # pseudo-diameter and closeness sweeps. Gated to DEEP UNCAPPED
    # fixpoints from a driver-side seed list (the `reachable` shape):
    # only there do the many narrow levels amortize the one
    # node-index join that maps the result back to strings. Shallow
    # capped sweeps (k_hop), paced/stop-node arms (on_shortest_path)
    # and big DataFrame seed sets (bow-tie) measured NET SLOWER on
    # the int path (r10 session-4 A/B: khop_upstream 1.21->1.57s,
    # on_shortest_path 3.39->4.79s, graph_bowtie 5.12->5.35s, vs
    # reachability 4.88->3.17s, sssp_hops 2.35->1.85s) — they keep
    # the exact string loop below.
    if (
        max_dist is None
        and stop_nodes is None
        and dynamic_cap is None
        and pace is None
        and level_hook is None
        and not isinstance(sources, DataFrame)
    ):
        intp = (
            graph.cached_int_sym()
            if direction == "sym"
            else graph.cached_int_endpoints(direction)
        )
        if intp is not None:
            return _bfs_int(
                graph, intp, sources, direction, max_dist, stop_nodes,
                dynamic_cap, found_depths, pace, level_hook,
            )
    edges = _directed_endpoints(graph, direction)
    # Each level's frontier is eagerly localCheckpoint-ed: ONE job
    # per level materializes it with truncated lineage; the visited
    # set for the anti-join is the union of the cached frontiers
    # (all small), so there is no persist/unpersist churn and no
    # exponentially growing plan. The edge side comes from the
    # graph-level endpoint cache (persisted once per direction).
    from onionnet_spark.operators.ckpt import IterCheckpointer

    # deep BFS (diameter > ~12) would otherwise chain enough
    # localCheckpoints to hit the geometric replay blowup (ckpt.py)
    ck = IterCheckpointer(prefix="onionnet_bfs_")
    frontier = _sources_df(spark, sources).localCheckpoint()
    frontiers = [frontier]
    n_frontier = frontier.count()
    level_counts = [n_frontier]  # parallel to `frontiers`
    n_visited = n_frontier
    depth = 0

    remaining: set[tuple[str, str]] | None = None
    stop_df = None
    if stop_nodes is not None:
        remaining = {(l, str(i)) for (l, i) in stop_nodes}
        # built ONCE: levels are disjoint (anti-join vs visited), so
        # a stop node can hit at most one level — no need to rebuild
        # the probe frame as targets get discovered
        stop_df = F.broadcast(
            spark.createDataFrame(
                sorted(remaining), "layer string, node_id string"
            )
        )

    def _mark_found(level_df: DataFrame, d: int) -> None:
        # tiny job: broadcast the (small) target list against the
        # already-checkpointed level frontier
        if not remaining:
            return
        hits = level_df.join(stop_df, on=NODE_KEY, how="left_semi").select(*NODE_KEY)
        for r in hits.collect():
            remaining.discard((r["layer"], r["node_id"]))
            if found_depths is not None:
                found_depths.append(d)

    if remaining is not None:
        _mark_found(frontier, 0)

    def _capped(d: int) -> bool:
        if max_dist is not None and d >= max_dist:
            return True
        if remaining is not None and not remaining:
            return True  # all stop nodes seen: current depth == max target dist
        if dynamic_cap is not None:
            c = dynamic_cap()
            if c is not None and d >= c:
                return True
        return False

    while n_frontier > 0 and not _capped(depth):
        if pace is not None:
            # hold until the pacing peer has itself reached the level
            # we want to build (or stopped publishing = unthrottled);
            # re-check the cap while waiting so a cap landing during
            # the hold ends the run without one more expansion
            while True:
                allowed = pace()
                if allowed is None or allowed > depth or _capped(depth):
                    break
                _time.sleep(0.02)
            if _capped(depth):
                break
        f = frontier.select(
            F.col("layer").alias("src_layer"), F.col("node_id").alias("src_id")
        )
        if n_frontier <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        if direction == "sym":
            # Undirected BFS invariant: an edge spans at most one
            # level, so an expansion from level d can only re-touch
            # levels d and d-1 — the anti-join needs just the LAST TWO
            # frontiers, not the whole visited set. This keeps the
            # dedup side (and its broadcast) bounded by two level
            # sizes at every depth, where the full-union form paid a
            # growing O(visited) rebuild + driver broadcast per level
            # (the graph_pseudo_diameter constant, VERDICT r8 item 3).
            # Directed BFS keeps the full union: a directed edge can
            # reach arbitrarily earlier levels.
            recent = frontiers[-2:]
            visited_keys = recent[0].select(*NODE_KEY)
            for prev in recent[1:]:
                visited_keys = visited_keys.unionByName(prev.select(*NODE_KEY))
            if sum(level_counts[-2:]) <= BROADCAST_FRONTIER_MAX:
                visited_keys = F.broadcast(visited_keys)
        else:
            visited_keys = frontiers[0].select(*NODE_KEY)
            for prev in frontiers[1:]:
                visited_keys = visited_keys.unionByName(prev.select(*NODE_KEY))
            if n_visited <= BROADCAST_FRONTIER_MAX:
                # the visited side is exactly the frontier levels we
                # already counted: while it fits the broadcast budget
                # the anti-join is shuffle-free (and at toy scale the
                # level loop drops from 2 exchanges to 1)
                visited_keys = F.broadcast(visited_keys)
        # dedup on NODE_KEY (dist is constant this level), so the
        # dedup exchange is hash-partitioned on exactly the
        # anti-join key and gets reused — one shuffle per level
        # instead of two. (Measured r9: anti-joining BEFORE the dedup
        # to shrink the shuffle costs MORE — the broadcast-hash probe
        # over the full 4M-row expansion beats the bytes it saves.)
        nxt = (
            edges.join(f, on=["src_layer", "src_id"])
            .select(
                F.col("dst_layer").alias("layer"),
                F.col("dst_id").alias("node_id"),
                F.lit(depth + 1).alias("dist"),
            )
            .dropDuplicates(NODE_KEY)
            .join(visited_keys, on=NODE_KEY, how="left_anti")
        )
        nxt = ck.cut(nxt)
        depth += 1
        n_frontier = nxt.count()
        n_visited += n_frontier
        if level_hook is not None:
            level_hook(depth)
        if n_frontier:
            frontiers.append(nxt)
            level_counts.append(n_frontier)
            if remaining:
                _mark_found(nxt, depth)
        frontier = nxt
    out = frontiers[0]
    for prev in frontiers[1:]:
        out = out.unionByName(prev)
    return out


def k_hop(
    graph: OnionGraph,
    start: tuple[str, str],
    max_dist: int,
    direction: str = "downstream",
    include_upstream_children: bool = False,
) -> DataFrame:
    """Ego subgraph node set within max_dist hops of start.

    Reference search (searcher.py:157-242). direction='bi' unions
    upstream and downstream reachable sets (searcher.py:222-223);
    dist is then the min of the two directions.

    ``include_upstream_children`` (bi mode only, reference
    searcher.py:212-216): additionally union the OUT-neighbors of
    every upstream node — the reference's "children of ancestors"
    widening. The reference returns membership only; here a
    child-only node carries dist = min over its upstream parents of
    (parent dist + 1), and nodes already reached keep the smaller of
    that and their BFS dist. One extra single-hop join against the
    cached downstream endpoints — no extra BFS fixpoint.
    """
    if include_upstream_children and direction != "bi":
        raise ValueError(
            "include_upstream_children applies only to direction='bi' "
            "(reference searcher.py:212)"
        )
    if direction == "bi":
        down = bfs_distances(graph, [start], "downstream", max_dist)
        up = bfs_distances(graph, [start], "upstream", max_dist)
        parts = down.unionByName(up)
        if include_upstream_children:
            out_edges = _directed_endpoints(graph, "downstream")
            children = (
                out_edges.join(
                    up.select(
                        F.col("layer").alias("src_layer"),
                        F.col("node_id").alias("src_id"),
                        "dist",
                    ),
                    on=["src_layer", "src_id"],
                )
                .select(
                    F.col("dst_layer").alias("layer"),
                    F.col("dst_id").alias("node_id"),
                    (F.col("dist") + F.lit(1)).alias("dist"),
                )
            )
            parts = parts.unionByName(children)
        return parts.groupBy(*NODE_KEY).agg(F.min("dist").alias("dist"))
    return bfs_distances(graph, [start], direction, max_dist)


def reachable(
    graph: OnionGraph, start: tuple[str, str], direction: str = "downstream"
) -> DataFrame:
    """Full reachability fixpoint (reference _bfs_traversal,
    searcher.py:119-155)."""
    return bfs_distances(graph, [start], direction, max_dist=None)


def _bfs_int(
    graph: OnionGraph,
    intp: tuple[DataFrame, DataFrame],
    sources,
    direction: str,
    max_dist: int | None,
    stop_nodes,
    dynamic_cap,
    found_depths,
    pace,
    level_hook,
) -> "DataFrame | None":
    """bfs_distances over the collision-checked int-keyed edge view:
    identical loop structure, stop-node marking, pacing and capping —
    but every level's join/dedup/anti-join keys on one 8-byte long.
    Level 0 is emitted from the caller's string source frame (phantom
    seeds survive exactly like the string path); levels >= 1 map back
    through the node index once, at the end, via the same inner join
    the other int interiors use (_multi_source_bfs_int,
    _sym_bfs_int) — which assumes the OnionGraph invariant that edge
    endpoints appear in graph.nodes, exactly as they do.
    """
    import time as _time

    e_int, nidx = intp
    spark = graph.nodes.sparkSession
    from onionnet_spark.operators.ckpt import IterCheckpointer

    ck = IterCheckpointer(prefix="onionnet_bfs_int_")
    srcs = _sources_df(spark, sources)
    frontier = srcs.select(
        F.xxhash64("layer", "node_id").alias("node"), F.col("dist")
    ).localCheckpoint()
    frontiers = [frontier]
    n_frontier = frontier.count()
    level_counts = [n_frontier]
    n_visited = n_frontier
    depth = 0
    found_local: list[int] = []

    remaining: set[tuple[str, str]] | None = None
    stop_int = None
    if stop_nodes is not None:
        remaining = {(l, str(i)) for (l, i) in stop_nodes}
        stop_strings = spark.createDataFrame(
            sorted(remaining), "layer string, node_id string"
        )
        # probe built once, carrying the stop node's STRING identity
        # alongside its hash so hits report (layer, node_id) without
        # a node-index join; levels are disjoint so each stop node
        # hits at most one level
        stop_int = F.broadcast(
            stop_strings.select(
                "layer", "node_id",
                F.xxhash64("layer", "node_id").alias("node"),
            )
        )
        # depth-0 hits come off the string source frame directly
        hits0 = srcs.join(
            F.broadcast(stop_strings), on=NODE_KEY, how="left_semi"
        ).select(*NODE_KEY)
        for r in hits0.collect():
            remaining.discard((r["layer"], r["node_id"]))
            found_local.append(0)

    def _mark_found(level_df: DataFrame, d: int) -> None:
        if not remaining:
            return
        hits = level_df.join(stop_int, on="node").select("layer", "node_id")
        for r in hits.collect():
            remaining.discard((r["layer"], r["node_id"]))
            found_local.append(d)

    def _capped(d: int) -> bool:
        if max_dist is not None and d >= max_dist:
            return True
        if remaining is not None and not remaining:
            return True
        if dynamic_cap is not None:
            c = dynamic_cap()
            if c is not None and d >= c:
                return True
        return False

    while n_frontier > 0 and not _capped(depth):
        if pace is not None:
            while True:
                allowed = pace()
                if allowed is None or allowed > depth or _capped(depth):
                    break
                _time.sleep(0.02)
            if _capped(depth):
                break
        f = frontier.select(F.col("node").alias("s"))
        if n_frontier <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        if direction == "sym":
            # undirected invariant: dedup against the last TWO
            # frontiers only (see the string loop for the proof)
            recent = frontiers[-2:]
            visited = recent[0].select("node")
            for prev in recent[1:]:
                visited = visited.unionByName(prev.select("node"))
            if sum(level_counts[-2:]) <= BROADCAST_FRONTIER_MAX:
                visited = F.broadcast(visited)
        else:
            visited = frontiers[0].select("node")
            for prev in frontiers[1:]:
                visited = visited.unionByName(prev.select("node"))
            if n_visited <= BROADCAST_FRONTIER_MAX:
                visited = F.broadcast(visited)
        nxt = (
            e_int.join(f, on="s")
            .select(F.col("d").alias("node"), F.lit(depth + 1).alias("dist"))
            .dropDuplicates(["node"])
            .join(visited, on="node", how="left_anti")
        )
        # lazy cut + count = one job per level (see _sym_bfs_int)
        nxt = ck.cut(nxt, eager=False)
        depth += 1
        n_frontier = nxt.count()
        n_visited += n_frontier
        if level_hook is not None:
            level_hook(depth)
        if n_frontier:
            frontiers.append(nxt)
            level_counts.append(n_frontier)
            if remaining:
                _mark_found(nxt, depth)
        frontier = nxt

    deep = None
    for prev in frontiers[1:]:
        deep = prev if deep is None else deep.unionByName(prev)
    if deep is None:
        out = srcs
    else:
        mapped = deep.join(nidx, deep["node"] == nidx["idx"]).select(
            "layer", "node_id", "dist"
        )
        out = srcs.unionByName(mapped)
    if found_depths is not None:
        found_depths.extend(found_local)
    return out


def _sym_bfs_int(
    graph: OnionGraph, seed: tuple[str, str]
) -> "DataFrame | None":
    """Full undirected BFS fixpoint over the int-keyed symmetrized
    view (core.cached_int_sym): DataFrame(node: long, dist: int), or
    None when the 64-bit keying collided and the caller must use the
    exact string-keyed `bfs_distances`.

    Same loop shape as `bfs_distances(direction='sym')` — broadcast
    frontier under the budget, per-level dedup fused with the
    anti-join key, dedup against the last TWO frontiers only (an
    undirected edge spans at most one level) — but every frontier,
    broadcast, and exchange carries one 8-byte long instead of two
    strings, which is where a whole-graph sweep's level cost lives.
    """
    pair = graph.cached_int_sym()
    if pair is None:
        return None
    sym, _ = pair
    spark = graph.nodes.sparkSession
    from onionnet_spark.operators.ckpt import IterCheckpointer

    ck = IterCheckpointer(prefix="onionnet_bfs_int_")
    frontier = (
        spark.createDataFrame([(seed[0], str(seed[1]))], "layer string, node_id string")
        .select(
            F.xxhash64("layer", "node_id").alias("node"),
            F.lit(0).alias("dist"),
        )
        .localCheckpoint()
    )
    frontiers = [frontier]
    level_counts = [frontier.count()]
    n_frontier = level_counts[0]
    depth = 0
    while n_frontier > 0:
        f = frontier.select(F.col("node").alias("s"))
        if n_frontier <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        recent = frontiers[-2:]
        visited = recent[0].select("node")
        for prev in recent[1:]:
            visited = visited.unionByName(prev.select("node"))
        if sum(level_counts[-2:]) <= BROADCAST_FRONTIER_MAX:
            visited = F.broadcast(visited)
        nxt = (
            sym.join(f, on="s")
            .select(F.col("d").alias("node"), F.lit(depth + 1).alias("dist"))
            .dropDuplicates(["node"])
            .join(visited, on="node", how="left_anti")
        )
        # lazy cut: the count below materializes the checkpoint, so
        # each level is ONE job instead of two (r11 — the sweep is
        # level-count x per-job overhead bound, measured 2.3s/level
        # on 10-row late frontiers vs a 0.5s broadcast-probe floor)
        nxt = ck.cut(nxt, eager=False)
        depth += 1
        n_frontier = nxt.count()
        if n_frontier:
            frontiers.append(nxt)
            level_counts.append(n_frontier)
        frontier = nxt
    out = frontiers[0]
    for prev in frontiers[1:]:
        out = out.unionByName(prev)
    return out


def pseudo_diameter(
    graph: OnionGraph, start: tuple[str, str], n_sweeps: int = 2
) -> DataFrame:
    """Pseudo-diameter by iterated double-sweep BFS on the undirected
    view (graph-tool `pseudo_diameter` parity): BFS from `start`,
    jump to the farthest node (ties broken by smallest (layer,
    node_id)), BFS again; the last sweep's eccentricity is a lower
    bound on the true diameter that is exact on trees and near-exact
    in practice. `n_sweeps` is FIXED (default 2, the classic double
    sweep) so the result is engine-reproducible — graph-tool's
    iterate-to-no-improvement variant would make the answer depend
    on BFS tie-breaking.

    Returns one row: (start_layer, start_id, peak_layer, peak_id,
    pseudo_diameter) where peak is the farthest node found by the
    final sweep. Each sweep is the shared frontier-broadcast BFS
    (one shuffle per level, localCheckpoint-flattened plans); the
    per-sweep argmax is a TakeOrdered limit(1) — a scalar fetch, not
    a data collect.
    """
    if n_sweeps < 1:
        raise ValueError(f"n_sweeps must be >= 1, got {n_sweeps}")
    src = (start[0], str(start[1]))
    far = None
    ecc = 0
    # Int-keyed sweeps when the 64-bit node keying is collision-free
    # (cached_int_sym checks; ~2.5x per-level win at sf0.1 — every
    # frontier broadcast and dedup exchange carries an 8-byte long
    # instead of two strings); the per-sweep argmax maps back through
    # the node-index table BEFORE the (dist desc, layer, node_id)
    # tie-break, so the chosen peak — and therefore the result — is
    # identical to the string-keyed path, which remains the fallback.
    int_ready = graph.cached_int_sym() is not None
    for _ in range(n_sweeps):
        if int_ready:
            d_int = _sym_bfs_int(graph, src)
            _, nidx = graph.cached_int_sym()
            # argmax without the full node-index join (r11): take the
            # scalar max dist first, map back ONLY the nodes at that
            # eccentricity (a handful on any real graph), then apply
            # the same (dist desc, layer, node_id) tie-break — among
            # max-dist rows that is exactly the old global argmax.
            mx = d_int.agg(F.max("dist").alias("m")).collect()[0]["m"]
            far_int = d_int.filter(F.col("dist") == mx)
            d = far_int.join(nidx, far_int["node"] == nidx["idx"]).select(
                "layer", "node_id", "dist"
            )
        else:
            d = bfs_distances(graph, [src], direction="sym")
        rows = d.orderBy(F.desc("dist"), "layer", "node_id").limit(1).collect()
        if not rows:
            # phantom seed on the int path (a seed absent from the
            # node table has no index row): eccentricity 0 at itself,
            # matching the string path's seed-only frame
            far, ecc = src, 0
            break
        row = rows[0]
        far, ecc = (row["layer"], row["node_id"]), int(row["dist"])
        src = far
    spark = graph.nodes.sparkSession
    return spark.createDataFrame(
        [(start[0], str(start[1]), far[0], far[1], ecc)],
        "start_layer string, start_id string, peak_layer string, "
        "peak_id string, pseudo_diameter int",
    )


def weighted_sssp(
    graph: OnionGraph,
    sources: list[tuple[str, str]],
    direction: str = "downstream",
    weight_col: str = "weight",
    max_iterations: int = 50,
) -> DataFrame:
    """Single/multi-source shortest WEIGHTED distances (non-negative
    weights) by frontier Bellman-Ford relaxation.

    Extends the reference's hop-count traversals (searcher.py uses
    graph-tool shortest_distance, which also accepts edge weights)
    to weighted edges. Each round relaxes only edges out of nodes
    whose distance improved last round (delta relaxation), so late
    rounds touch a shrinking frontier; the distance map is
    localCheckpoint-ed per round to keep lineage flat. Rounds needed
    = longest shortest-path edge count, NOT graph size.

    Returns DataFrame(layer, node_id, dist: double).
    """
    if direction not in ("downstream", "upstream"):
        raise ValueError("direction must be 'upstream' or 'downstream'")
    e = graph.edges
    if direction == "downstream":
        edges = e.select(
            "src_layer", "src_id", "dst_layer", "dst_id", F.col(weight_col).alias("w")
        )
    else:
        edges = e.select(
            F.col("dst_layer").alias("src_layer"),
            F.col("dst_id").alias("src_id"),
            F.col("src_layer").alias("dst_layer"),
            F.col("src_id").alias("dst_id"),
            F.col(weight_col).alias("w"),
        )
    edges = edges.persist()
    try:
        # Bellman-Ford requires non-negative weights for the delta
        # relaxation to terminate at true shortest distances; verify
        # up-front (one cheap agg over the persisted edges) rather
        # than looping forever or converging to garbage.
        min_w = edges.agg(F.min("w").alias("mw")).collect()[0]["mw"]
        if min_w is not None and min_w < 0:
            raise ValueError(
                f"weighted_sssp requires non-negative edge weights; "
                f"found min weight {min_w}"
            )
        spark = graph.nodes.sparkSession
        dist = (
            spark.createDataFrame(
                [(l, str(i), 0.0) for (l, i) in sources],
                "layer string, node_id string, dist double",
            )
            .localCheckpoint()
        )
        improved = dist
        # one checkpoint + one (metadata-cheap) count per round: the
        # relaxation merges into the distance map with a single FULL
        # OUTER join carrying an 'improved' flag, instead of separate
        # improved-set + anti-join/union rebuild jobs. (An inner+anti
        # delta split that never exchanges `dist` was tried in r10
        # and regressed ~2x: the unmaterialized relaxation
        # aggregation appeared in two branches and was evaluated
        # twice per round.)
        n_improved = dist.count()
        for _ in range(max_iterations):
            f = improved.select(
                F.col("layer").alias("src_layer"),
                F.col("node_id").alias("src_id"),
                "dist",
            )
            if n_improved <= BROADCAST_FRONTIER_MAX:
                f = F.broadcast(f)
            cand = (
                edges.join(f, on=["src_layer", "src_id"])
                .groupBy(
                    F.col("dst_layer").alias("layer"),
                    F.col("dst_id").alias("node_id"),
                )
                .agg(F.min(F.col("dist") + F.col("w")).alias("cand_dist"))
            )
            new_dist = (
                dist.join(cand, on=NODE_KEY, how="full")
                .select(
                    "layer",
                    "node_id",
                    F.least(
                        F.coalesce("dist", "cand_dist"),
                        F.coalesce("cand_dist", "dist"),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.col("cand_dist") < F.col("dist"))
                    ).alias("improved"),
                )
                .localCheckpoint()
            )
            improved = new_dist.filter("improved").drop("improved")
            dist = new_dist.drop("improved")
            n_improved = improved.count()
            if n_improved == 0:
                break
        if n_improved != 0:
            # A non-empty frontier at cap means some shortest path
            # has more than max_iterations edges: the distances in
            # `dist` would be silently too large. Fail loudly.
            raise RuntimeError(
                f"weighted_sssp did not converge within {max_iterations} "
                f"iterations ({n_improved} distances still improving); "
                f"a shortest path exceeds the iteration cap — raise "
                f"max_iterations"
            )
        return dist
    finally:
        edges.unpersist()


def on_shortest_path(
    graph: OnionGraph,
    source: tuple[str, str],
    targets: list[tuple[str, str]],
) -> DataFrame:
    """Nodes lying on some shortest path from source to any target.

    Reference compute_on_shortest (searcher.py:26-117): forward BFS
    from source; reverse BFS from an artificial vertex wired to all
    targets with weight 0 (== multi-source reverse BFS); keep v with
    d_f(v) + d_r(v) ∈ { d_f(t) : t ∈ targets }. We reproduce those
    semantics exactly, including the quirk that d_r is the min over
    ALL targets while membership is tested against the full set of
    target distances.
    """
    # The forward and reverse fixpoints are independent pipelines, so
    # they are submitted from two threads and Spark interleaves their
    # jobs across the executor pool — roughly halving wall time (each
    # BFS level is a small job that underutilizes the cluster alone).
    #
    # Neither BFS needs its full fixpoint: membership requires
    # d_f(v) + d_r(v) == some target distance td <= D where
    # D = max(target dists), so d_f(v) <= D and d_r(v) <= D for every
    # member. The forward run stops itself once all targets are seen
    # (its stopping depth IS D); it publishes D through `cap_state`,
    # and the reverse run polls it between levels so it also stops at
    # D instead of the full reachable fixpoint (VERDICT r2: the
    # difference between O(diameter) and O(ego-radius) rounds).
    from concurrent.futures import ThreadPoolExecutor

    cap_state: dict[str, int | None] = {"cap": None}
    # forward publishes its per-level progress; the reverse arm is
    # PACED to it (never builds level d before forward has) — no
    # target distance can exceed the forward fixpoint depth, so a
    # reverse level deeper than forward's current depth can never
    # contribute and racing ahead only burns the big-direction
    # frontiers the cap then discards (the r05 on_shortest_path
    # regression was exactly this thread-scheduling lottery)
    progress: dict[str, int | bool] = {"depth": 0, "done": False}
    found_depths: list[int] = []

    def _run_forward() -> DataFrame:
        try:
            out = bfs_distances(
                graph,
                [source],
                "downstream",
                stop_nodes=targets,
                found_depths=found_depths,
                level_hook=lambda d: progress.__setitem__("depth", d),
            )
            # max depth among FOUND targets; unreachable targets
            # never contribute to td so they don't raise the cap
            cap_state["cap"] = max(found_depths) if found_depths else 0
            return out
        finally:
            progress["done"] = True

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_fwd = pool.submit(_run_forward)
        f_rev = pool.submit(
            bfs_distances,
            graph,
            targets,
            "upstream",
            dynamic_cap=lambda: cap_state["cap"],
            pace=lambda: None if progress["done"] else progress["depth"],
        )
        fwd = f_fwd.result().withColumnRenamed("dist", "d_f")
        rev = f_rev.result().withColumnRenamed("dist", "d_r")
    target_dists = (
        fwd.join(
            F.broadcast(
                fwd.sparkSession.createDataFrame(
                    [(l, str(i)) for (l, i) in targets], "layer string, node_id string"
                )
            ),
            on=NODE_KEY,
        )
        .select(F.col("d_f").alias("td"))
        .distinct()
    )
    return (
        fwd.join(rev, on=NODE_KEY)
        .withColumn("d_sum", F.col("d_f") + F.col("d_r"))
        .join(F.broadcast(target_dists), F.col("d_sum") == F.col("td"), "left_semi")
        .select("layer", "node_id", "d_f", "d_r")
    )


def on_shortest_path_weighted(
    graph: OnionGraph,
    source: tuple[str, str],
    targets: list[tuple[str, str]],
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted variant of on_shortest_path: nodes v with
    d_f(source, v) + d_r(v, targets) equal to some target's weighted
    distance (reference compute_on_shortest runs over graph-tool
    shortest_distance, which honors edge weights when given).

    Distances come from two concurrent Bellman-Ford fixpoints;
    membership compares ROUNDED (6 dp) sums so float associativity
    cannot flake the equality. Returns (layer, node_id, d_f, d_r).
    """
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_fwd = pool.submit(weighted_sssp, graph, [source], "downstream", weight_col)
        f_rev = pool.submit(weighted_sssp, graph, targets, "upstream", weight_col)
        fwd = f_fwd.result().withColumnRenamed("dist", "d_f")
        rev = f_rev.result().withColumnRenamed("dist", "d_r")
    spark = graph.nodes.sparkSession
    target_df = F.broadcast(
        spark.createDataFrame(
            [(l, str(i)) for (l, i) in targets], "layer string, node_id string"
        )
    )
    target_dists = (
        fwd.join(target_df, on=NODE_KEY)
        .select(F.round("d_f", 6).alias("td"))
        .distinct()
    )
    return (
        fwd.join(rev, on=NODE_KEY)
        .withColumn("d_sum", F.round(F.col("d_f") + F.col("d_r"), 6))
        .join(F.broadcast(target_dists), F.col("d_sum") == F.col("td"), "left_semi")
        .select(
            "layer",
            "node_id",
            F.round("d_f", 6).alias("d_f"),
            F.round("d_r", 6).alias("d_r"),
        )
    )


def multi_source_bfs(
    graph: OnionGraph,
    sources: list[tuple[str, str]],
    direction: str = "downstream",
    max_dist: int | None = None,
) -> DataFrame:
    """Per-source BFS distances for ALL sources in ONE
    level-synchronous sweep: the frontier is keyed by (sid, node),
    so each level is still a single join + dedup + anti-join round
    and the per-level job count is independent of the source count
    (running k separate bfs_distances calls would cost k times the
    scheduling). sid is the source's 'layer:node_id' key.

    Unlike bfs_distances (which MERGES sources into a min-distance
    field), this keeps the per-source distance — the primitive for
    sampled centralities (harmonic closeness, betweenness pivots)
    and landmark distance labelings.

    Returns DataFrame(sid, layer, node_id, dist).
    """
    spark = graph.nodes.sparkSession
    if direction in ("downstream", "upstream"):
        intp = graph.cached_int_endpoints(direction)
        if intp is not None:
            return _multi_source_bfs_int(graph, intp, sources, max_dist)
    edges = _directed_endpoints(graph, direction)
    keys = ["sid", *NODE_KEY]
    frontier = spark.createDataFrame(
        [(f"{l}:{i}", l, str(i), 0) for (l, i) in sources],
        "sid string, layer string, node_id string, dist int",
    ).localCheckpoint()
    frontiers = [frontier]
    n_frontier = frontier.count()
    depth = 0
    while n_frontier > 0 and (max_dist is None or depth < max_dist):
        f = frontier.select(
            "sid",
            F.col("layer").alias("src_layer"),
            F.col("node_id").alias("src_id"),
        )
        if n_frontier <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        visited = frontiers[0].select(*keys)
        for prev in frontiers[1:]:
            visited = visited.unionByName(prev.select(*keys))
        nxt = (
            edges.join(f, on=["src_layer", "src_id"])
            .select(
                "sid",
                F.col("dst_layer").alias("layer"),
                F.col("dst_id").alias("node_id"),
                F.lit(depth + 1).alias("dist"),
            )
            .dropDuplicates(keys)
            .join(visited, on=keys, how="left_anti")
            .localCheckpoint()
        )
        depth += 1
        n_frontier = nxt.count()
        if n_frontier:
            frontiers.append(nxt)
        frontier = nxt
    out = frontiers[0]
    for prev in frontiers[1:]:
        out = out.unionByName(prev)
    return out


def _multi_source_bfs_int(
    graph: OnionGraph,
    intp: tuple[DataFrame, DataFrame],
    sources,
    max_dist: int | None,
) -> DataFrame:
    """multi_source_bfs over the collision-checked int-keyed
    endpoint view: the frontier and the growing visited union carry
    (sid: int, node: long) instead of three strings, which is where
    a k-pivot whole-graph sweep's level cost lives (the visited union
    reaches k x |reach| rows). Output schema and values are
    identical to the string path — sid strings and (layer, node_id)
    are re-attached once, at the end. Duplicate sources collapse to
    one sid exactly like the string path's identical-sid dedup.
    """
    e_int, nidx = intp
    spark = graph.nodes.sparkSession
    from onionnet_spark.operators.ckpt import IterCheckpointer

    uniq = list(dict.fromkeys((l, str(i)) for (l, i) in sources))
    src_map = spark.createDataFrame(
        [(si, l, i) for si, (l, i) in enumerate(uniq)],
        "sid_i int, s_layer string, s_id string",
    )
    ck = IterCheckpointer(prefix="onionnet_msbfs_int_")
    frontier = src_map.select(
        "sid_i",
        F.xxhash64("s_layer", "s_id").alias("node"),
        F.lit(0).alias("dist"),
    ).localCheckpoint()
    keys = ["sid_i", "node"]
    frontiers = [frontier]
    level_counts = [frontier.count()]
    n_frontier = level_counts[0]
    n_visited = n_frontier
    depth = 0
    while n_frontier > 0 and (max_dist is None or depth < max_dist):
        f = frontier.select("sid_i", F.col("node").alias("s"))
        if n_frontier <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        visited = frontiers[0].select(*keys)
        for prev in frontiers[1:]:
            visited = visited.unionByName(prev.select(*keys))
        if n_visited <= BROADCAST_FRONTIER_MAX:
            visited = F.broadcast(visited)
        nxt = (
            e_int.join(f, on="s")
            .select("sid_i", F.col("d").alias("node"), F.lit(depth + 1).alias("dist"))
            .dropDuplicates(keys)
            .join(visited, on=keys, how="left_anti")
        )
        nxt = ck.cut(nxt)
        depth += 1
        n_frontier = nxt.count()
        n_visited += n_frontier
        if n_frontier:
            frontiers.append(nxt)
            level_counts.append(n_frontier)
        frontier = nxt
    out = frontiers[0]
    for prev in frontiers[1:]:
        out = out.unionByName(prev)
    sid_map = F.broadcast(
        src_map.select(
            "sid_i", F.concat_ws(":", "s_layer", "s_id").alias("sid")
        )
    )
    return (
        out.join(nidx, out["node"] == nidx["idx"])
        .join(sid_map, on="sid_i")
        .select("sid", "layer", "node_id", "dist")
    )


def temporal_earliest_arrival(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "ts",
    max_rounds: int = 4,
    hops_per_round: int = 1,
) -> DataFrame:
    """Time-respecting reachability: earliest arrival time at every
    node over paths whose edge timestamps never decrease — an edge
    (u, v, t) is traversable only if you arrived at u by time t.

    Relaxes  arrival(v) = min{ t of (u,v,t) : t >= arrival(u) }
    to fixpoint, frontier-sparse like `weighted_sssp`: only nodes
    whose arrival improved last round join the edge list in the
    next. Sources have arrival NULL (reads as -infinity: all their
    edges qualify) and are never improvable. Rounds are capped at
    `max_rounds` with the same convergence contract as the other
    iterative operators: the loop stops early on an empty frontier,
    and a RuntimeError is raised if the cap is hit while the
    frontier is still non-empty (silent truncation would report
    too-late arrivals).

    Scale shape: per round one equi-join on the source key with the
    temporal filter applied inside the join, then a min-aggregate on
    the destination key — hop-BFS shuffle economics; the frontier
    broadcasts while small under AQE. The per-round merge is
    DELTA-DRIVEN (r9 VERDICT item 3, the k-core delta-ledger shape):
    only the frontier-sized candidate set is materialized each round;
    `best` is never shuffled — improvements are detected by joining
    the small candidate set against it and folded back in with a
    broadcast anti-join + union, checkpointed every few rounds to
    bound lineage. The old full-outer merge re-exchanged (and
    re-materialized) the WHOLE best table every round.

    `hops_per_round` > 1 expands the frontier that many hops INSIDE
    one round (lazy join chain, no barrier between hops) before the
    single delta merge — so an improvement propagates k hops per
    materialization and the round count (the per-round scheduling
    constant dominates at small data; at 100 TB it is the number of
    cluster-wide barriers) drops by ~k. Sound because relaxation is
    monotone label-correcting: an intra-round hop relaxes from a
    CANDIDATE arrival that may be worse than (or tie) the node's
    final best, which can only under-qualify edges — never admit an
    invalid path — and any node whose best actually improves lands
    in the round's delta, so its out-edges are re-relaxed with the
    improved value next round. The fixpoint (empty delta) is
    therefore the same under any hops_per_round; the convergence
    guard caps OUTER rounds, i.e. total depth <= max_rounds *
    hops_per_round.
    """
    e = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.col(ts_col).alias("t"),
    ).localCheckpoint()
    ts_type = e.schema["t"].dataType
    best = sources.select(
        F.col(sources.columns[0]).alias("node"),
        F.lit(None).cast(ts_type).alias("arrival"),
    ).localCheckpoint()
    frontier = best
    n_frontier = best.count()
    for round_no in range(max_rounds + 1):
        hop, per_hop = frontier, []
        for hop_no in range(max(1, hops_per_round)):
            # Broadcast the frontier into the edge join while it fits:
            # the checkpointed edge list is then scanned, never
            # exchanged or sorted, on every hop (without the hint the
            # planner has no stats for either checkpointed side and
            # falls back to a full sort-merge of the edges each hop).
            # Intra-round hops past the first are LAZY (size unknown
            # until the round materializes), so their broadcast is
            # gated on the last measured frontier with fan-out
            # headroom; past the budget the shuffle join returns.
            if hop_no == 0:
                small = n_frontier <= BROADCAST_FRONTIER_MAX
            else:
                small = n_frontier <= BROADCAST_FRONTIER_MAX // 8
            h = F.broadcast(hop) if small else hop
            reached = (
                h.join(e, on=h["node"] == e["u"])
                .filter(
                    F.col("arrival").isNull() | (F.col("t") >= F.col("arrival"))
                )
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("t").alias("arrival"))
            )
            per_hop.append(reached)
            hop = reached
        cands = per_hop[0]
        for nxt in per_hop[1:]:
            cands = cands.unionByName(nxt)
        reached = cands.groupBy("node").agg(F.min("arrival").alias("cand"))
        # improvements only: a candidate survives if its node is new
        # to best (`seen` NULL) or strictly earlier than the current
        # non-NULL arrival (a source's NULL arrival reads as
        # -infinity, never improvable). One left join referencing the
        # round's hop chain exactly ONCE — an inner+anti split that
        # streams `best` was tried in r10 and regressed 2-4x: the
        # unmaterialized hop aggregation appeared in both branches
        # and was evaluated twice per round, which costs far more
        # than this (delta-bounded) exchange of the best table saves.
        # lazy checkpoint + count = ONE Spark job per round (the cut
        # materializes inside the count); an eager cut + isEmpty would
        # schedule two.
        delta = (
            reached.join(
                best.select(
                    "node", F.col("arrival").alias("cur"), F.lit(1).alias("seen")
                ),
                on="node",
                how="left",
            )
            .filter(
                F.col("seen").isNull()
                | (F.col("cur").isNotNull() & (F.col("cand") < F.col("cur")))
            )
            .select("node", F.col("cand").alias("arrival"))
            .localCheckpoint(eager=False)
        )
        n_frontier = delta.count()
        if n_frontier == 0:
            return best
        if round_no == max_rounds:
            raise RuntimeError(
                f"temporal_earliest_arrival did not converge in "
                f"{max_rounds} rounds; raise `max_rounds`"
            )
        # fold the delta in lazily: broadcast anti-join (delta is the
        # small build side) + union — no checkpoint job, no exchange
        # of best; every 4th round the grown lineage gets a lazy cut
        # that materializes inside the next round's delta job.
        best = best.join(
            F.broadcast(delta.select("node")), on="node", how="left_anti"
        ).unionByName(delta)
        if (round_no + 1) % 4 == 0:
            best = best.localCheckpoint(eager=False)
        frontier = delta
    return best


def topological_levels(
    graph: OnionGraph, max_iterations: int = 20, guard: bool = True
) -> DataFrame:
    """Topological generation of every node in a DAG: level(v) =
    length of the LONGEST directed path reaching v (sources sit at
    0) — the layer scheduler's view of an onion graph (everything at
    level k depends only on levels < k), and a cycle detector for
    free: a cycle keeps relaxing forever, so hitting the iteration
    cap with changes still flowing raises (like weighted_sssp's
    convergence guard).

    Frontier-sparse max-relaxation (delta scheduling, the
    weighted_sssp shape): only nodes whose level CHANGED last round
    join the edge list in the next, so each round touches a
    shrinking frontier instead of the whole graph (the dense
    variant re-joined all |E| x |V| every round — 47s -> frontier
    cost at sf0.1, r8 sweep). Monotone relaxation reaches the same
    fixpoint under any schedule. Converges in longest-path-depth
    rounds. Returns (layer, node_id, level).
    """
    e = graph.edge_endpoints().select(
        F.concat_ws(":", "src_layer", "src_id").alias("s"),
        F.concat_ws(":", "dst_layer", "dst_id").alias("d"),
    ).localCheckpoint()
    lv = graph.nodes.select(
        F.concat_ws(":", "layer", "node_id").alias("n"), F.lit(0).alias("level")
    ).localCheckpoint()
    changed = lv  # round 0: every node is newly levelled
    # Frontier/delta tables are broadcast into the round's joins while
    # they fit the budget (they are counted anyway for convergence),
    # so the cached edge list and the level table are scanned — never
    # exchanged or re-sorted — inside the loop. Round 0's frontier is
    # the full node set, so it broadcasts only on small graphs; every
    # later frontier is the (shrinking) improved set.
    n_changed = graph.cached_n_nodes()
    converged = False
    for _ in range(max_iterations):
        f = changed.withColumnRenamed("n", "s")
        if n_changed <= BROADCAST_FRONTIER_MAX:
            f = F.broadcast(f)
        upd = (
            e.join(f, on="s")
            .groupBy(F.col("d").alias("n"))
            .agg((F.max("level") + 1).alias("cand"))
        )
        # upd is bounded by the frontier's out-neighborhood; its own
        # broadcast is gated on the same frontier count (one hop of
        # fan-out stays inside the budget's intent at these sizes —
        # past the threshold the shuffle join takes over anyway).
        if n_changed <= BROADCAST_FRONTIER_MAX:
            upd = F.broadcast(upd)
        imp = (
            upd.join(lv, on="n")
            .filter(F.col("cand") > F.col("level"))
            .select("n", F.col("cand").alias("level"))
            .localCheckpoint()
        )
        n_changed = imp.count()
        if n_changed == 0:
            converged = True
            break
        new = imp.withColumnRenamed("level", "new")
        if n_changed <= BROADCAST_FRONTIER_MAX:
            new = F.broadcast(new)
        lv = (
            lv.join(new, on="n", how="left")
            .select("n", F.coalesce("new", "level").alias("level"))
            .localCheckpoint()
        )
        changed = imp
    if guard and not converged:
        raise RuntimeError(
            f"topological_levels: still relaxing after {max_iterations} "
            "rounds — graph has a cycle or raise max_iterations"
        )
    # key split mirrors the oracle: everything after the FIRST ':'
    # is the node_id (ids may themselves contain ':')
    return lv.select(
        F.split_part(F.col("n"), F.lit(":"), F.lit(1)).alias("layer"),
        F.expr(
            "substring(n, length(split_part(n, ':', 1)) + 2)"
        ).alias("node_id"),
        F.col("level").cast("int").alias("level"),
    )
