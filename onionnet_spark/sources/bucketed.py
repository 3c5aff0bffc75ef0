"""Bucketed table write/read: co-located, shuffle-free joins.

At 100 TB the dominant cost of the big-big joins (edges-to-edges in
triangle counting, shingles-to-shingles in dedup) is the shuffle.
Bucketing is the standard Spark answer: write both sides
pre-hash-partitioned on the join key with the SAME bucket count, and
every subsequent equi-join on that key is planned WITHOUT an
Exchange on either side — the scan itself delivers co-located
partitions. This module wraps the write/read pair so operator code
can opt a hot table into bucketed layout once and reuse it across
queries; bench/tests assert the Exchange-free plan.

Bucketed tables go through the session catalog (`saveAsTable`) —
plain `.parquet(path)` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) parquet table.

    Sorting within buckets additionally enables sort-merge joins to
    skip the per-task sort (both sides pre-sorted on disk).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket key skip their Exchange)."""
    return spark.table(table)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True if the executed plan of `joined` contains no shuffle
    Exchange — the co-location check used by tests and bench."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


def write_graph_bucketed(
    graph, table_prefix: str, num_buckets: int = 32, mode: str = "overwrite"
) -> None:
    """Persist a graph with join-aligned bucketing: nodes bucketed
    on (layer, node_id) — the key of every property MERGE / label
    join — and edges bucketed on (src_layer, src_id), the frontier
    and out-degree join key. Any node-keyed update table written
    with the same bucket count joins with NO exchange on either
    side; at 100 TB that removes the node-table shuffle from every
    annotate/merge pass (the hot maintenance loop).
    """
    write_bucketed(
        graph.nodes, f"{table_prefix}_nodes", ["layer", "node_id"],
        num_buckets, mode=mode,
    )
    write_bucketed(
        graph.edges, f"{table_prefix}_edges", ["src_layer", "src_id"],
        num_buckets, mode=mode,
    )


def read_graph_bucketed(spark: SparkSession, table_prefix: str, directed: bool = True):
    from onionnet_spark.core import OnionGraph

    return OnionGraph(
        spark.table(f"{table_prefix}_nodes"),
        spark.table(f"{table_prefix}_edges"),
        directed=directed,
    )
