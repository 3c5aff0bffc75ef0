"""Graph persistence: parquet round-trip and CSV ingestion.

The reference's example workflow ingests edge-list CSVs (the
moreno-sociograms walkthrough in its getting-started notebook) and
holds the graph in RAM; persistence is a pickle of the graph-tool
object. Spark-first, a persisted graph is two parquet datasets:

    <path>/nodes/   partitioned by layer
    <path>/edges/   partitioned by src_layer

Layer-partitioned layout means layer-filtered reads (view_layers,
bipartite_view — the most common access pattern) prune entire
directories before any IO, and a full read is still a plain
columnar scan. Writers default to overwrite for idempotent jobs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from onionnet_spark.builder import grow_onion
from onionnet_spark.core import OnionGraph


def write_graph(graph: OnionGraph, path: str, mode: str = "overwrite") -> None:
    """Persist nodes/ and edges/ parquet datasets under `path`,
    partitioned for layer-pruned reads."""
    graph.nodes.write.mode(mode).partitionBy("layer").parquet(f"{path}/nodes")
    graph.edges.write.mode(mode).partitionBy("src_layer").parquet(f"{path}/edges")


def read_graph(spark: SparkSession, path: str, directed: bool = True) -> OnionGraph:
    """Load a graph written by write_graph. Partition columns come
    back via partition discovery; column order is normalized so a
    round-trip is schema-stable."""
    nodes = spark.read.parquet(f"{path}/nodes")
    edges = spark.read.parquet(f"{path}/edges")
    nodes = nodes.select(
        "layer", "node_id", *[c for c in nodes.columns if c not in ("layer", "node_id")]
    )
    ekey = ["src_layer", "src_id", "dst_layer", "dst_id"]
    edges = edges.select(*ekey, *[c for c in edges.columns if c not in ekey])
    return OnionGraph(nodes, edges, directed=directed)


def graph_from_csv(
    spark: SparkSession,
    nodes_csv: str,
    edges_csv: str,
    node_prop_cols: list[str] | None = None,
    edge_prop_cols: list[str] | None = None,
    delimiter: str = ",",
    **grow_kwargs,
) -> OnionGraph:
    """Ingest node/edge CSVs through the standard grow_onion path
    (validation, dedup, NA handling, endpoint checks) — the Spark
    analogue of the reference's CSV walkthrough.

    Header row required; schema is inferred then keys are cast to
    string (the engine's key type). At scale prefer parquet, but CSV
    ingest is where raw edge dumps enter the system.
    """
    reader = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .option("inferSchema", "true")
    )
    nodes_raw = reader.csv(nodes_csv)
    edges_raw = reader.csv(edges_csv)
    nodes_raw = nodes_raw.withColumn("layer", F.col("layer").cast("string")).withColumn(
        "node_id", F.col("node_id").cast("string")
    )
    for c in ("src_layer", "src_id", "dst_layer", "dst_id"):
        edges_raw = edges_raw.withColumn(c, F.col(c).cast("string"))
    return grow_onion(
        nodes_raw,
        edges_raw,
        node_prop_cols=node_prop_cols,
        edge_prop_cols=edge_prop_cols,
        **grow_kwargs,
    )


def write_graph_bucketed(
    graph: OnionGraph, table_prefix: str, num_buckets: int = 32
) -> None:
    """Persist the graph as BUCKETED catalog tables: nodes bucketed
    on (layer, node_id), edges on (src_layer, src_id).

    This is the extreme-scale layout for graphs whose frontiers
    outgrow the broadcast threshold: a BFS/SSSP expansion join keyed
    on (src_layer, src_id), a bulk property MERGE keyed on the node
    key, or repeated endpoint validations all find the BIG side
    pre-co-located — the scan delivers hash-partitioned buckets, so
    the join plans with no Exchange on the graph side and only the
    (small) frontier/update side moves. tests/test_graph_io.py
    asserts the exchange count drops accordingly.
    """
    from onionnet_spark.sources.bucketed import write_bucketed

    write_bucketed(
        graph.nodes, f"{table_prefix}_nodes", ["layer", "node_id"], num_buckets
    )
    write_bucketed(
        graph.edges, f"{table_prefix}_edges", ["src_layer", "src_id"], num_buckets
    )


def read_graph_bucketed(
    spark: SparkSession, table_prefix: str, directed: bool = True
) -> OnionGraph:
    """Load a graph written by write_graph_bucketed; bucket metadata
    comes from the catalog, so key-joins skip the graph-side
    Exchange."""
    return OnionGraph(
        spark.table(f"{table_prefix}_nodes"),
        spark.table(f"{table_prefix}_edges"),
        directed=directed,
    )
