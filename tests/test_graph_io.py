"""Graph persistence: parquet round-trip, layer pruning, CSV ingest."""

from pyspark.sql import functions as F

from onionnet_spark.sources.graph_io import graph_from_csv, read_graph, write_graph

from tests.conftest import rows_to_set


def test_parquet_roundtrip_and_layer_pruning(spark, tpch_graph, tmp_path):
    path = str(tmp_path / "g")
    write_graph(tpch_graph, path)
    g2 = read_graph(spark, path)
    assert g2.counts() == tpch_graph.counts()
    assert rows_to_set(g2.nodes.select("layer", "node_id")) == rows_to_set(
        tpch_graph.nodes.select("layer", "node_id")
    )
    # layer filter must prune partition directories at scan time
    scan = g2.nodes.filter(F.col("layer") == "nation")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert scan.count() == tpch_graph.nodes.filter(F.col("layer") == "nation").count()
    flat = plan.replace("\n", " ")
    pf = flat.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "nation" in pf[1].split("]", 1)[0], (
        "layer predicate must be a partition filter (directory pruning), "
        "not a post-scan data filter"
    )


def test_graph_from_csv(spark, tmp_path):
    nodes_csv = str(tmp_path / "nodes.csv")
    edges_csv = str(tmp_path / "edges.csv")
    spark.createDataFrame(
        [("A", "1", 0.5), ("A", "2", 1.5), ("B", "3", 2.5), ("B", "3", 2.5)],
        "layer string, node_id string, score double",
    ).coalesce(1).write.option("header", "true").mode("overwrite").csv(nodes_csv)
    spark.createDataFrame(
        [("A", "1", "B", "3"), ("A", "2", "C", "404")],  # second edge dangling
        "src_layer string, src_id string, dst_layer string, dst_id string",
    ).coalesce(1).write.option("header", "true").mode("overwrite").csv(edges_csv)

    g = graph_from_csv(spark, nodes_csv, edges_csv, node_prop_cols=["score"])
    assert g.nodes.count() == 3  # duplicate B:3 deduped
    assert g.edges.count() == 1  # dangling edge dropped
