"""Streaming twins of the round-8 daily-series monitors.

State = the per-(event_type, day) count table — a commutative monoid
(counts SUM), so out-of-order and overlapping micro-batches merge
exactly like StreamingRollupMaintainer's continuous aggregate. The
dispersion index (events_poisson_dispersion) and the CUSUM drift
scan (events_cusum_drift) are then pure folds of that tiny state:
the snapshot recomputes them per batch instead of maintaining
incremental moments, because the state itself is day-level bounded
(|types| x |days| rows) — the recompute costs nothing and stays
bit-identical to the batch operators by construction.

Pattern matches the other maintainers (rollup/graph/dedup streams):
``foreachBatch`` + monoid MERGE + ``localCheckpoint`` generations.
At 100 TB the day-count store is a Delta/Iceberg MERGE INTO keyed
on (event_type, day); snapshots read only the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingDailyStatsMaintainer(ReplayGuardMixin):
    """Maintains per-(event_type, day) counts across micro-batches
    and serves dispersion / CUSUM snapshots from that state."""

    def __init__(self, spark):
        self.daily = spark.createDataFrame(
            [], "event_type string, day date, x bigint"
        ).localCheckpoint()
        self.n_batches = 0

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        # foreachBatch is at-least-once: a failed epoch is redelivered
        # with the SAME (monotonic) batch_id, and a count-sum merge is
        # not idempotent — replaying would double-count (ADVICE r8
        # item 4; guard shared via ReplayGuardMixin since r10).
        if self._is_replay(batch_id):
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        partial = batch_df.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        ).agg(F.count("*").cast("bigint").alias("x"))
        self.daily = (
            self.daily.unionByName(partial)
            .groupBy("event_type", "day")
            .agg(F.sum("x").cast("bigint").alias("x"))
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager checkpoint: a merge that died
        # mid-batch must accept the stream's retry, not skip it
        self._mark_applied(batch_id)

    def dispersion_snapshot(self) -> DataFrame:
        """events_poisson_dispersion recomputed from the maintained
        day-count state (same BIGINT-moment expression tree)."""
        m = self.daily.groupBy("event_type").agg(
            F.count("*").alias("t"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
        )
        t, s, ss = F.col("t"), F.col("s"), F.col("ss")
        return m.select(
            "event_type",
            t.cast("bigint").alias("n_days"),
            F.round(s * 1.0 / t, 6).alias("mean_daily"),
            F.round((t * ss - s * s) * 1.0 / (t * s), 6).alias("dispersion"),
            (t * ss - s * s > t * s).alias("overdispersed"),
        )

    def cusum_snapshot(self) -> DataFrame:
        """events_cusum_drift recomputed from the maintained state
        (type-partitioned windows over the bounded daily series)."""
        wt = Window.partitionBy("event_type")
        wcum = wt.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        c = self.daily.select(
            "event_type",
            "day",
            F.sum("x").over(wcum).alias("cum"),
            F.row_number().over(wt.orderBy("day")).alias("i"),
            F.sum("x").over(wt).alias("s"),
            F.count("*").over(wt).alias("t"),
        )
        d = c.select(
            "event_type",
            "day",
            "t",
            (F.col("t") * F.col("cum") - F.col("i") * F.col("s")).alias(
                "dev_scaled"
            ),
        )
        m = d.groupBy("event_type").agg(
            F.max("dev_scaled").alias("max_dev"),
            F.min("dev_scaled").alias("min_dev"),
        )
        return (
            d.join(F.broadcast(m), "event_type")
            .filter(F.col("dev_scaled") == F.col("max_dev"))
            .groupBy(
                "event_type",
                F.col("t").cast("bigint").alias("n_days"),
                F.round(F.col("max_dev") * 1.0 / F.col("t"), 6).alias(
                    "max_cusum"
                ),
                F.round(F.col("min_dev") * 1.0 / F.col("t"), 6).alias(
                    "min_cusum"
                ),
            )
            .agg(F.min("day").alias("peak_day"))
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
