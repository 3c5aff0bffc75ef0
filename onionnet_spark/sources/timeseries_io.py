"""Hypertable-style time-series persistence: date-partitioned,
time-sorted parquet.

The hypertable idea (chunk by time, order within chunk) maps onto
the lake layout every large event store uses:

    <path>/event_date=YYYY-MM-DD/part-*.parquet

Date partitioning gives partition PRUNING for time-range predicates
(whole directories skipped before any IO — the `PushedFilters` /
`PartitionFilters` split is test-asserted); sorting within files by
(ts) gives min/max row-group statistics that parquet readers use to
skip pages inside a day. At 100 TB this is the difference between
scanning a day and scanning a year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_timeseries(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write date-partitioned, ts-sorted event parquet."""
    (
        events.withColumn("event_date", F.to_date(F.col(ts_col)))
        .repartition("event_date")
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_timeseries(
    spark: SparkSession,
    path: str,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Read back, optionally date-bounded — the bounds hit the
    partition column, so pruning happens at planning time."""
    df = spark.read.parquet(path)
    if start_date is not None:
        df = df.filter(F.col("event_date") >= F.lit(start_date))
    if end_date is not None:
        df = df.filter(F.col("event_date") < F.lit(end_date))
    return df
