"""Streaming twin of events_burst_periods (r9 VERDICT item 8).

Burst flagging is RETROACTIVE state — the same class as the dup-span
maintainer (span_stream.py): the 1.15x threshold compares each day
against the type's FULL-HORIZON mean daily rate, so a late batch that
shifts the mean can re-flag (or un-flag) days delivered many batches
ago, and a new burst day can fuse two previously separate runs into
one. No per-day incremental flag survives that; the correct streaming
shape is the dispersion/CUSUM one — maintain the tiny commutative
day-count monoid (per-(event_type, day) counts, |types| x |days|
rows) and recompute the gaps-and-islands fold per snapshot with the
IDENTICAL expression tree as the batch operator, which makes
replay == batch bit-for-bit by construction.

At 100 TB the day-count store is a Delta/Iceberg MERGE INTO keyed on
(event_type, day); the burst fold reads only the store (bounded by
the calendar, not the event volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onionnet_spark.streaming.dispersion_stream import (
    StreamingDailyStatsMaintainer,
)


class StreamingBurstPeriodsMaintainer(StreamingDailyStatsMaintainer):
    """Maintains per-(event_type, day) counts across micro-batches
    (merge_batch + at-least-once replay guard inherited from the
    daily-stats maintainer) and serves events_burst_periods
    snapshots from that state."""

    def burst_snapshot(self) -> DataFrame:
        """events_burst_periods recomputed from the maintained
        day-count state: exact integer 1.15x threshold against the
        full-horizon mean, then maximal calendar-consecutive runs via
        the day-minus-row_number anchor — the same plan as the batch
        operator over its `daily` aggregate."""
        daily = self.daily.select("event_type", "day", F.col("x").alias("cnt"))
        st = daily.groupBy("event_type").agg(
            F.count("*").alias("n_days"), F.sum("cnt").alias("total")
        )
        b = daily.join(F.broadcast(st), "event_type").filter(
            F.col("cnt") * F.col("n_days") * 100 >= 115 * F.col("total")
        )
        w = Window.partitionBy("event_type").orderBy("day")
        runs = b.select(
            "event_type",
            "day",
            "cnt",
            F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
        )
        return (
            runs.groupBy("event_type", "anchor")
            .agg(
                F.min("day").alias("start_day"),
                F.max("day").alias("end_day"),
                F.count("*").cast("int").alias("n_days"),
                F.max("cnt").cast("bigint").alias("peak_daily"),
                F.sum("cnt").cast("bigint").alias("total_events"),
            )
            .drop("anchor")
        )
