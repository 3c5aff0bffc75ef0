"""Streaming twin of events_stage_latency (VERDICT r8 item 7): the
funnel-TIMING monitor an online pipeline watches next to conversion
counts.

The batch operator chains three per-user MINs — t_view = first view,
t_click = first click AFTER t_view, t_purchase = first purchase AFTER
t_click — so the naive "min per (user, stage)" state is NOT a monoid:
a late-arriving EARLIER view lowers t_view, which can re-open clicks
that were previously ineligible. The exactly-mergeable state is a
PRUNED per-(user, kind) timestamp set with the invariant

  view:     only the min survives (plain monoid);
  click:    every click <= the CURRENT click answer survives, where
            answer = min{click > t_view} (NULL answer => keep all);
  purchase: every purchase <= the CURRENT purchase answer survives,
            answer = min{purchase > t_click} (NULL => keep all).

Safety: t_view only decreases as batches merge, so the eligible click
set only grows and the click answer only decreases — a click above
the current answer can never become the final answer, hence pruning
it is lossless (same argument one level down for purchases). The
retained set is the min view + the clicks/purchases below the current
answers: in time-ordered arrival that is O(1) per user; even fully
adversarial arrival keeps exactness (the set just prunes later).

Snapshot recomputes the batch expression tree from the state table,
so replay == batch bit-identically. At 100 TB the state lives in a
Delta/Iceberg table MERGEd on (user_id, kind, ts) with the prune as
the MERGE's delete arm; snapshots read only the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin

_KINDS = ("view", "click", "purchase")


class StreamingStageLatencyMaintainer(ReplayGuardMixin):
    """Maintains the pruned per-(user, kind) timestamp state across
    micro-batches and serves events_stage_latency snapshots."""

    def __init__(self, spark):
        self.state = spark.createDataFrame(
            [], "user_id long, kind string, ts timestamp"
        ).localCheckpoint()
        self.n_batches = 0

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        # at-least-once replay guard — shared contract, see
        # ReplayGuardMixin: the union-merge below is not idempotent
        if self._is_replay(batch_id):
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        partial = (
            batch_df.filter(F.col("event_type").isin(*_KINDS))
            .select(
                "user_id",
                F.col("event_type").alias("kind"),
                "ts",
            )
            .distinct()
        )
        merged = self.state.unionByName(partial).distinct()
        # --- prune to the invariant --------------------------------
        tv = (
            merged.filter(F.col("kind") == "view")
            .groupBy("user_id")
            .agg(F.min("ts").alias("tv"))
        )
        clicks = merged.filter(F.col("kind") == "click").join(
            tv, "user_id", "left"
        )
        ca = (
            clicks.filter(F.col("ts") > F.col("tv"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("ca"))
        )
        kept_clicks = (
            clicks.join(ca, "user_id", "left")
            .filter(
                F.col("tv").isNull()
                | F.col("ca").isNull()
                | (F.col("ts") <= F.col("ca"))
            )
            .select("user_id", "kind", "ts")
        )
        purchases = merged.filter(F.col("kind") == "purchase").join(
            ca, "user_id", "left"
        )
        pa = (
            purchases.filter(F.col("ts") > F.col("ca"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("pa"))
        )
        kept_purchases = (
            purchases.join(pa, "user_id", "left")
            .filter(
                F.col("ca").isNull()
                | F.col("pa").isNull()
                | (F.col("ts") <= F.col("pa"))
            )
            .select("user_id", "kind", "ts")
        )
        views = (
            tv.select(
                "user_id", F.lit("view").alias("kind"), F.col("tv").alias("ts")
            )
        )
        self.state = (
            views.unionByName(kept_clicks)
            .unionByName(kept_purchases)
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager checkpoint: a merge that died
        # mid-batch must accept the stream's retry, not skip it
        self._mark_applied(batch_id)

    def latency_snapshot(self) -> DataFrame:
        """events_stage_latency recomputed from the maintained state
        (identical expression tree -> bit-identical output)."""
        s = self.state
        v = (
            s.filter(F.col("kind") == "view")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_view"))
        )
        c = (
            s.filter(F.col("kind") == "click")
            .join(v, "user_id")
            .filter(F.col("ts") > F.col("t_view"))
            .groupBy("user_id", "t_view")
            .agg(F.min("ts").alias("t_click"))
        )
        p = (
            s.filter(F.col("kind") == "purchase")
            .join(c.select("user_id", "t_click"), "user_id")
            .filter(F.col("ts") > F.col("t_click"))
            .groupBy("user_id", "t_click")
            .agg(F.min("ts").alias("t_purchase"))
        )
        sec = lambda a, b: (  # noqa: E731
            F.col(b).cast("long") - F.col(a).cast("long")
        ).cast("bigint")
        lat = c.select(
            F.lit("view_to_click").alias("stage"),
            sec("t_view", "t_click").alias("s"),
        ).unionByName(
            p.select(
                F.lit("click_to_purchase").alias("stage"),
                sec("t_click", "t_purchase").alias("s"),
            )
        )
        return lat.groupBy("stage").agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(F.expr("percentile(s, 0.5)"), 6).alias("p50_sec"),
            F.round(F.expr("percentile(s, 0.9)"), 6).alias("p90_sec"),
            F.round(F.sum("s") * 1.0 / F.count("*"), 6).alias("mean_sec"),
            F.max("s").cast("bigint").alias("max_sec"),
        )

    def attach(self, event_stream: DataFrame, checkpoint_dir: str):
        return (
            event_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
