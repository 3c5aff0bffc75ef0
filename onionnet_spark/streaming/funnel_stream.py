"""Streaming time-bounded funnel: views LEFT-OUTER interval-joined
to same-user purchases within 24 hours.

The batch twin is `events_funnel_windowed` (queries/
streaming_queries.py). The streaming shape is the one outer-join
capability the other maintainers don't exercise: a stream-stream
LEFT OUTER join with an event-time range condition, where the
engine may only emit the null-extended row once the watermark
proves no matching purchase can still arrive — exactly the
"did this view convert?" semantics a funnel needs online.

State/scale: both sides are watermarked; join state is bounded by
(watermark delay + 24h) of events per user, evicted by event time.
The join key is user_id, so state partitions by user — no global
structure, arbitrarily many users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_funnel_pairs(
    views: DataFrame, purchases: DataFrame, horizon: str = "24 HOURS"
) -> DataFrame:
    """(view_id, user_id, view_ts, purchase_ts|null) — every purchase
    of the same user inside (view_ts, view_ts + horizon], plus one
    null-extended row for views the watermark has proven unconverted.
    Works identically on batch frames (the correctness twin) and on
    watermarked streaming frames (where it plans as a stateful outer
    interval join)."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond, "left_outer").select(
        "view_id", "user_id", "view_ts", "purchase_ts"
    )
