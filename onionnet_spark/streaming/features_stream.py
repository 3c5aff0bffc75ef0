"""Streaming per-user feature store.

Continuously maintained churn/LTV features — the incremental half of
``events_user_features``. Almost everything is a MONOID (counts and
cent-sums add, first/last seen min/max-merge); the one genuinely
set-valued feature, active_days, keeps a (user, day) distinct table
(bounded by users x active days — exactly the state a real feature
store materializes). The corpus horizon (global max day) is derived
from state at snapshot time, so recency is always relative to
everything ingested.

Replay equivalence: snapshot() == batch events_user_features on the
union of batches, all columns, pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingUserFeatures(ReplayGuardMixin):
    def __init__(self, spark: SparkSession):
        self.agg = spark.createDataFrame(
            [],
            "user_id bigint, n_events bigint, n_purchases bigint, "
            "revenue_cents bigint, n_errors bigint, "
            "first_seen timestamp, last_seen timestamp",
        )
        self.days = spark.createDataFrame([], "user_id bigint, day timestamp")
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
        partial = batch_df.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("long"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("revenue_cents"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        self.agg = (
            self.agg.unionByName(partial)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("n_purchases").cast("bigint").alias("n_purchases"),
                F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
                F.sum("n_errors").cast("bigint").alias("n_errors"),
                F.min("first_seen").alias("first_seen"),
                F.max("last_seen").alias("last_seen"),
            )
            .localCheckpoint()
        )
        self.days = (
            self.days.unionByName(
                batch_df.select(
                    "user_id", F.date_trunc("day", F.col("ts")).alias("day")
                )
            )
            .distinct()
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """Feature table over everything ingested — identical
        schema/values to batch events_user_features."""
        active = self.days.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("active_days")
        )
        gmax = self.days.agg(F.max("day").alias("gmax"))
        return (
            self.agg.join(active, on="user_id")
            .crossJoin(F.broadcast(gmax))
            .select(
                "user_id",
                "n_events",
                "n_purchases",
                "revenue_cents",
                "n_errors",
                "active_days",
                "first_seen",
                "last_seen",
                F.datediff(
                    F.col("gmax"), F.date_trunc("day", F.col("last_seen"))
                )
                .cast("int")
                .alias("recency_days"),
            )
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
