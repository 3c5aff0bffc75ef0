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
