"""Facade: the reference's single-object API over the Spark engine."""

import pytest
from pyspark.sql import functions as F

from onionnet_spark.facade import OnionNet


@pytest.fixture()
def net(spark):
    n = OnionNet()
    n.grow_onion(
        spark.createDataFrame(
            [("A", "a", 1.0), ("B", "b", 2.0), ("A", "c", 3.0)],
            "layer string, node_id string, score double",
        ),
        spark.createDataFrame(
            [("A", "a", "B", "b"), ("B", "b", "A", "c")],
            "src_layer string, src_id string, dst_layer string, dst_id string",
        ),
        node_prop_cols=["score"],
    )
    return n


def test_facade_lifecycle(net, spark):
    assert net.graph.counts() == (3, 2)
    # incremental growth merges
    net.grow_onion(
        spark.createDataFrame(
            [("C", "z", 9.0)], "layer string, node_id string, score double"
        ),
        spark.createDataFrame(
            [("A", "c", "C", "z")],
            "src_layer string, src_id string, dst_layer string, dst_id string",
        ),
        node_prop_cols=["score"],
    )
    assert net.graph.counts() == (4, 3)

    hits = {r["node_id"] for r in net.search(("A", "a"), 2).collect()}
    assert hits == {"a", "b", "c"}

    assert net.get_vertex_property("A", "a", "score") == 1.0
    net.set_vertex_property("A", "a", "score", 7.5)
    assert net.get_vertex_property("A", "a", "score") == 7.5
    assert net.view_node_properties_by_names("Z", "404") == {}

    # encoding-tuple lookup (reference onionnet.py:125): codes are
    # the deterministic sorted-order dictionary codes, so layer
    # codes are A=0, B=1, C=2 and node codes a=0, b=1, c=2, z=3
    v = net.get_vertex_by_encoding_tuple(0, 0)
    assert (v["layer"], v["node_id"], v["score"]) == ("A", "a", 7.5)
    v = net.get_vertex_by_encoding_tuple(2, 3)
    assert (v["layer"], v["node_id"]) == ("C", "z")
    assert net.get_vertex_by_encoding_tuple(9, 0) == {}
    # a valid code pair naming a node that doesn't exist (B, z)
    assert net.get_vertex_by_encoding_tuple(1, 3) == {}

    net.create_node_label_property()
    assert "node_label" in net.graph.nodes.columns

    assert net.export_info("v").count() == 4
    assert net.export_info("e").count() == 3
    with pytest.raises(ValueError, match="'v' or 'e'"):
        net.export_info("x")

    bi = net.create_bipartite_gv("A", "B")
    assert bi.edges.count() == 2

    flt = net.filter_view_by_property("score", 2.0, ">=")
    assert flt.nodes.count() == 4  # b, c, z, and a (set to 7.5 above)

    cond = net.compose_filters([F.col("layer") == "A", F.col("score") > 2], "and")
    assert net.graph.nodes.filter(cond).count() == 2  # c, a

    # strong components on a DAG: singletons only
    assert net.view_components(2, "strong").count() == 0
    assert net.view_components(2, "weak").count() > 0


def test_facade_requires_build():
    with pytest.raises(ValueError, match="grow_onion first"):
        OnionNet().search(("A", "a"))
