"""Streaming A/B experiment monitor: a continuously-maintained
two-proportion readout.

The batch op (queries/streaming_queries.py events_ab_test) folds a
per-user conversion flag into per-variant counts and a pooled
z-score. The streaming form maintains exactly the state that fold
needs — one row per user (variant, converted-so-far) — and merges
each micro-batch with MAX, a commutative idempotent monoid, so
late/duplicate events can never double-count a conversion and batch
arrival order is irrelevant. The readout is recomputed from the
maintained state on demand (it is a 2-group aggregate of the state,
not streamed itself).

Pattern matches the other maintainers (rollup_stream/dedup_stream):
``foreachBatch`` + monoid MERGE + ``localCheckpoint`` generations so
lineage never grows across a long-running stream. At scale the user
state becomes a Delta/Iceberg MERGE INTO keyed on user_id (hash-
distributed, no skew: one row per user), and the readout query runs
against that table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingABMonitor(ReplayGuardMixin):
    """Maintains per-user (variant, conversion) state and serves the
    pooled two-proportion experiment readout."""

    def __init__(self, spark, conv_event: str = "purchase",
                 min_value: float = 150.0):
        self.conv_event = conv_event
        self.min_value = min_value
        self.users = spark.createDataFrame(
            [], "user_id bigint, variant int, conv int"
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
        partial = batch_df.groupBy("user_id").agg(
            F.max(
                F.when(
                    (F.col("event_type") == self.conv_event)
                    & (F.col("value") >= self.min_value),
                    1,
                ).otherwise(0)
            ).alias("conv")
        ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
        merged = (
            self.users.unionByName(partial.select("user_id", "variant", "conv"))
            .groupBy("user_id", "variant")
            .agg(F.max("conv").alias("conv"))
        )
        self.users = merged.localCheckpoint()
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot_readout(self) -> DataFrame:
        """The experiment readout over the maintained user state —
        the identical fold and float expression tree as the batch
        events_ab_test, so replay == batch bit-for-bit."""
        s = self.users.agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(
                F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)
            ).alias("c_a"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
            F.sum(
                F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)
            ).alias("c_b"),
        )
        p_pool = (F.col("c_a") + F.col("c_b")) * 1.0 / (
            F.col("n_a") + F.col("n_b")
        )
        z = (
            (F.col("c_a") * 1.0 / F.col("n_a")
             - F.col("c_b") * 1.0 / F.col("n_b"))
            / F.sqrt(
                p_pool * (F.lit(1.0) - p_pool)
                * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
            )
        )
        return s.select(
            F.col("n_a").cast("bigint").alias("n_users_a"),
            F.col("c_a").cast("bigint").alias("n_conv_a"),
            F.round(F.col("c_a") * 1.0 / F.col("n_a"), 6).alias("rate_a"),
            F.col("n_b").cast("bigint").alias("n_users_b"),
            F.col("c_b").cast("bigint").alias("n_conv_b"),
            F.round(F.col("c_b") * 1.0 / F.col("n_b"), 6).alias("rate_b"),
            F.when(
                (F.col("c_a") + F.col("c_b") == 0)
                | (F.col("c_a") + F.col("c_b")
                   == F.col("n_a") + F.col("n_b")),
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(z, 6))
            .alias("z_score"),
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
