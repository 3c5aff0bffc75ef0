"""Streaming DAU / WAU / MAU maintenance.

The growth dashboard as a continuously-maintained aggregate: each
micro-batch folds its events into the distinct (user, activity-day)
state — the minimal sufficient statistic for every rolling
distinct-actives horizon — and the report is recomputed from that
DAY-level state on demand (users x days rows, decoupled from the
event count, exactly like the batch operator).

Replay equivalence: distinct-set union is a monoid, so ANY batch
split (including out-of-order and duplicate delivery) accumulates
the same state and therefore the same report as batch
``active_users_rolling``. State is pre-partitioned on user so the
per-batch distinct-union shuffles only the batch side; at 100 TB
the state frame becomes a Delta/Iceberg table keyed (user, day)
and the fold a MERGE INTO ... WHEN NOT MATCHED INSERT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingActiveUsers(ReplayGuardMixin):
    def __init__(self, spark: SparkSession):
        self.state = spark.createDataFrame([], "u bigint, d timestamp")
        self.n_batches = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        ud = batch_df.select(
            F.col("user_id").alias("u"),
            F.date_trunc("day", F.col("ts")).alias("d"),
        ).distinct()
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.state = (
            self.state.unionByName(ud)
            .distinct()
            .repartition(nparts, "u")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def report(self) -> DataFrame:
        """DAU/WAU/MAU per day from the maintained state — identical
        dataflow to the batch operator's fan-out stage."""
        span = self.state.select(F.col("d").alias("day")).distinct()
        fan = self.state.select(
            "u", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("off"), "d"
        ).select(
            "u",
            "off",
            F.date_add(F.col("d").cast("date"), F.col("off")).alias("rd"),
        )
        per = fan.groupBy(F.col("rd").alias("day_d")).agg(
            F.count_distinct(F.when(F.col("off") == 0, F.col("u"))).alias("dau"),
            F.count_distinct(F.when(F.col("off") <= 6, F.col("u"))).alias("wau"),
            F.count_distinct("u").alias("mau"),
        )
        return span.join(per, span["day"] == F.col("day_d").cast("timestamp")).select(
            "day",
            F.col("dau").cast("bigint"),
            F.col("wau").cast("bigint"),
            F.col("mau").cast("bigint"),
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
