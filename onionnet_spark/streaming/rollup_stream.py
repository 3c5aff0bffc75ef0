"""Continuous aggregates: a streaming-maintained time rollup.

TimescaleDB's continuous-aggregate / materialized-rollup pattern on
Structured Streaming: each micro-batch's per-(bucket, key) partial
aggregates MERGE into a maintained rollup store, so the aggregate is
always queryable without rescanning history. Late rows are absorbed
exactly — the merge SUMs partials into existing buckets (counts and
sums are commutative monoids; that is precisely why the maintained
state holds (count, sum) and derives avg at read time, never the
other way around).

Pattern matches the other maintainers (graph_stream/dedup_stream):
``foreachBatch`` + monoid MERGE + ``localCheckpoint`` generations so
lineage never grows across a long-running stream. At scale the
store becomes a Delta/Iceberg MERGE INTO keyed on (bucket, key) and
partitioned by bucket date — the dataflow is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingRollupMaintainer(ReplayGuardMixin):
    """Maintains per-(hour-bucket, event_type) count/sum aggregates
    across micro-batches."""

    def __init__(self, spark, window_len: str = "1 hour"):
        self.window_len = window_len
        self.rollup = spark.createDataFrame(
            [],
            "window_start timestamp, event_type string, "
            "n_events bigint, sum_value double",
        ).localCheckpoint()
        self.n_batches = 0

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        partial = (
            batch_df.groupBy(
                F.window("ts", self.window_len).alias("w"), F.col("event_type")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        old = self.rollup
        merged = (
            old.unionByName(partial)
            .groupBy("window_start", "event_type")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        self.rollup = merged.localCheckpoint()
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """The maintained rollup, rounded for comparison."""
        return self.rollup.select(
            "window_start",
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
