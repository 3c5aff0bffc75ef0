"""Traversal operators vs hand-computed answers + DuckDB recursive-CTE oracle."""

import pytest
from pyspark.sql import functions as F

from onionnet_spark.builder import grow_onion
from onionnet_spark.operators.traversal import (
    bfs_distances,
    k_hop,
    on_shortest_path,
    reachable,
)
from onionnet_spark.sources.tpch_graph import graph_ctes

from tests.conftest import duck_to_set, rows_to_set


@pytest.fixture(scope="module")
def tiny_graph(spark):
    # a -> b -> c -> d ; a -> c (shortcut) ; e isolated
    nodes = spark.createDataFrame(
        [("L", x) for x in "abcde"], "layer string, node_id string"
    )
    edges = spark.createDataFrame(
        [("L", "a", "L", "b"), ("L", "b", "L", "c"), ("L", "c", "L", "d"), ("L", "a", "L", "c")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    return grow_onion(nodes, edges)


def test_bfs_tiny_downstream(tiny_graph):
    got = rows_to_set(bfs_distances(tiny_graph, [("L", "a")], "downstream"))
    assert got == {(0, "L", "a"), (1, "L", "b"), (1, "L", "c"), (2, "L", "d")}


def test_bfs_tiny_upstream(tiny_graph):
    got = rows_to_set(bfs_distances(tiny_graph, [("L", "d")], "upstream"))
    assert got == {(0, "L", "d"), (1, "L", "c"), (2, "L", "a"), (2, "L", "b")}


def test_khop_bi_tiny(tiny_graph):
    got = rows_to_set(k_hop(tiny_graph, ("L", "c"), 1, "bi"))
    # downstream: d at 1; upstream: a, b at 1; c itself 0
    assert got == {(0, "L", "c"), (1, "L", "d"), (1, "L", "a"), (1, "L", "b")}


def test_khop_bi_children(spark):
    # p0 -> p1 -> p2 -> p3, plus p1 -> x. bi from p2 with max_dist=1:
    # down {p2, p3}, up {p2, p1}; upstream children adds x (p1's other
    # out-neighbor, dist 1+1=2) — the reference searcher.py:212-216
    # widening. Without the flag x is absent.
    nodes = spark.createDataFrame(
        [("L", n) for n in ["p0", "p1", "p2", "p3", "x"]],
        "layer string, node_id string",
    )
    edges = spark.createDataFrame(
        [("L", "p0", "L", "p1"), ("L", "p1", "L", "p2"),
         ("L", "p2", "L", "p3"), ("L", "p1", "L", "x")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    g = grow_onion(nodes, edges)
    plain = rows_to_set(k_hop(g, ("L", "p2"), 1, "bi"))
    widened = rows_to_set(k_hop(g, ("L", "p2"), 1, "bi",
                                include_upstream_children=True))
    assert plain == {(0, "L", "p2"), (1, "L", "p3"), (1, "L", "p1")}
    assert widened == plain | {(2, "L", "x")}


def test_khop_children_requires_bi(tiny_graph):
    with pytest.raises(ValueError, match="bi"):
        k_hop(tiny_graph, ("L", "a"), 1, "downstream",
              include_upstream_children=True)


def test_on_shortest_tiny(tiny_graph):
    got = rows_to_set(on_shortest_path(tiny_graph, ("L", "a"), [("L", "d")]))
    # shortest a->d is a-c-d (len 2); b has d_f=1, d_r=2 -> 3 not in {2}
    assert {(r[2], r[3]) for r in got} == {("L", "a"), ("L", "c"), ("L", "d")}


def test_bfs_stop_nodes_truncates_at_last_target(spark):
    # deep path p0 -> p1 -> ... -> p9; stopping at {p3} must halt the
    # expansion at depth 3 (the early-termination contract on_shortest
    # relies on), not run to the depth-9 fixpoint
    nodes = spark.createDataFrame(
        [("L", f"p{i}") for i in range(10)], "layer string, node_id string"
    )
    edges = spark.createDataFrame(
        [("L", f"p{i}", "L", f"p{i+1}") for i in range(9)],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    g = grow_onion(nodes, edges)
    depths: list[int] = []
    got = rows_to_set(
        bfs_distances(
            g, [("L", "p0")], "downstream",
            stop_nodes=[("L", "p3")], found_depths=depths,
        )
    )
    assert got == {(i, "L", f"p{i}") for i in range(4)}
    assert depths == [3]


def test_on_shortest_deep_tail_unaffected_by_early_stop(spark):
    # diamond a->{b,c}->d followed by a long tail d->t1->...->t6:
    # early termination must not change membership (a, b, c, d — both
    # b and c lie on a shortest a->d path of length 2)
    tail = [("L", "d", "L", "t1")] + [
        ("L", f"t{i}", "L", f"t{i+1}") for i in range(1, 6)
    ]
    nodes = spark.createDataFrame(
        [("L", x) for x in ["a", "b", "c", "d"] + [f"t{i}" for i in range(1, 7)]],
        "layer string, node_id string",
    )
    edges = spark.createDataFrame(
        [("L", "a", "L", "b"), ("L", "a", "L", "c"),
         ("L", "b", "L", "d"), ("L", "c", "L", "d")] + tail,
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    g = grow_onion(nodes, edges)
    got = rows_to_set(on_shortest_path(g, ("L", "a"), [("L", "d")]))
    assert {(r[2], r[3]) for r in got} == {
        ("L", "a"), ("L", "b"), ("L", "c"), ("L", "d")
    }


def test_khop_upstream_matches_duckdb(tpch_graph, sf_dir):
    got = rows_to_set(k_hop(tpch_graph, ("region", "0"), 2, "upstream"))
    sql = f"""
    WITH RECURSIVE {graph_ctes()},
    bfs AS (
      SELECT 'region' AS layer, '0' AS node_id, 0 AS dist
      UNION
      SELECT e.src_layer, e.src_id, b.dist + 1
      FROM bfs b JOIN edges_g e
        ON e.dst_layer = b.layer AND e.dst_id = b.node_id
      WHERE b.dist < 2
    )
    SELECT layer, node_id, CAST(MIN(dist) AS INT) AS dist
    FROM bfs GROUP BY layer, node_id
    """
    want = duck_to_set(sf_dir, sql)
    assert got == want


def test_reachable_downstream_matches_duckdb(tpch_graph, sf_dir):
    # full downstream fixpoint from customer 1: nation -> region chain
    got = rows_to_set(reachable(tpch_graph, ("customer", "1"), "downstream"))
    sql = f"""
    WITH RECURSIVE {graph_ctes()},
    bfs AS (
      SELECT 'customer' AS layer, '1' AS node_id, 0 AS dist
      UNION
      SELECT e.dst_layer, e.dst_id, b.dist + 1
      FROM bfs b JOIN edges_g e
        ON e.src_layer = b.layer AND e.src_id = b.node_id
    )
    SELECT layer, node_id, CAST(MIN(dist) AS INT) AS dist
    FROM bfs GROUP BY layer, node_id
    """
    want = duck_to_set(sf_dir, sql)
    assert got == want
    assert any(r[1] == "region" for r in got)


def test_weighted_sssp_prefers_cheap_long_path(spark):
    # a->b (w=10) vs a->c->b (w=1+2): weighted dist to b is 3 via c,
    # though the hop-count path is direct.
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.operators.traversal import weighted_sssp

    nodes = spark.createDataFrame(
        [("L", x) for x in "abcd"], "layer string, node_id string"
    )
    edges = spark.createDataFrame(
        [
            ("L", "a", "L", "b", 10.0),
            ("L", "a", "L", "c", 1.0),
            ("L", "c", "L", "b", 2.0),
            ("L", "b", "L", "d", 1.0),
        ],
        "src_layer string, src_id string, dst_layer string, dst_id string, weight double",
    )
    g = OnionGraph(nodes, edges)
    got = {
        (r["node_id"], r["dist"])
        for r in weighted_sssp(g, [("L", "a")], "downstream").collect()
    }
    assert got == {("a", 0.0), ("c", 1.0), ("b", 3.0), ("d", 4.0)}

    up = {
        (r["node_id"], r["dist"])
        for r in weighted_sssp(g, [("L", "d")], "upstream").collect()
    }
    assert up == {("d", 0.0), ("b", 1.0), ("c", 3.0), ("a", 4.0)}


def test_temporal_earliest_arrival_respects_time(spark):
    import datetime

    from onionnet_spark.operators.traversal import temporal_earliest_arrival

    d = lambda n: datetime.datetime(2024, 1, n)  # noqa: E731
    # s -> a at day 5; a -> b at day 3 (BEFORE arrival at a: unusable)
    # and a -> b at day 9 (usable); s -> c at day 1, c -> b at day 2:
    # b's earliest arrival is day 2 via the longer-in-hops path
    edges = spark.createDataFrame(
        [
            ("s", "a", d(5)),
            ("a", "b", d(3)),
            ("a", "b", d(9)),
            ("s", "c", d(1)),
            ("c", "b", d(2)),
        ],
        "src string, dst string, ts timestamp",
    )
    seed = spark.createDataFrame([("s",)], "node string")
    got = {r["node"]: r["arrival"] for r in
           temporal_earliest_arrival(edges, seed, max_rounds=5).collect()}
    assert got["s"] is None           # source = -infinity
    assert got["a"] == d(5)
    assert got["c"] == d(1)
    assert got["b"] == d(2)           # time-respecting, not hop-shortest


def test_temporal_earliest_arrival_cap_raises(spark):
    import datetime

    from onionnet_spark.operators.traversal import temporal_earliest_arrival

    d = lambda n: datetime.datetime(2024, 1, n)  # noqa: E731
    # chain s->x1->x2->x3 needs 3 rounds; cap at 1 must raise
    edges = spark.createDataFrame(
        [("s", "x1", d(1)), ("x1", "x2", d(2)), ("x2", "x3", d(3))],
        "src string, dst string, ts timestamp",
    )
    seed = spark.createDataFrame([("s",)], "node string")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        temporal_earliest_arrival(edges, seed, max_rounds=1)


def test_temporal_earliest_arrival_multihop_rounds_same_fixpoint(spark):
    """hops_per_round expands the frontier inside a round (r10): the
    fixpoint must be identical to 1-hop rounds — intra-round hops
    relax from candidate arrivals that may still improve, which can
    only under-qualify edges, never admit an invalid path; and a
    depth-3 chain must converge within ONE outer round at
    hops_per_round=3 where the 1-hop cap of 1 raises."""
    import datetime

    from onionnet_spark.operators.traversal import temporal_earliest_arrival

    d = lambda n: datetime.datetime(2024, 1, n)  # noqa: E731
    edges = spark.createDataFrame(
        [
            ("s", "a", d(5)),
            ("a", "b", d(3)),
            ("a", "b", d(9)),
            ("s", "c", d(1)),
            ("c", "b", d(2)),
            ("b", "e", d(4)),   # reachable via b@2 only (4 >= 2)
            ("s", "x1", d(1)),
            ("x1", "x2", d(2)),
            ("x2", "x3", d(3)),
        ],
        "src string, dst string, ts timestamp",
    )
    seed = spark.createDataFrame([("s",)], "node string")
    want = {r["node"]: r["arrival"] for r in
            temporal_earliest_arrival(edges, seed, max_rounds=6).collect()}
    got = {r["node"]: r["arrival"] for r in
           temporal_earliest_arrival(
               edges, seed, max_rounds=2, hops_per_round=3
           ).collect()}
    assert got == want
    assert got["x3"] == d(3) and got["e"] == d(4) and got["b"] == d(2)
