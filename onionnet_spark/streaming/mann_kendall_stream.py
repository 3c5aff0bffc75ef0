"""Streaming twin of events_mann_kendall.

The Mann-Kendall S statistic is PAIRWISE state — every forward day
pair contributes a sign, so a late batch that bumps one day's count
flips the sign of every pair that day participates in, and the tie
correction regroups whenever two days' totals collide or separate.
No incremental S survives that (the same retroactive-state class as
the burst / dup-span maintainers); the correct streaming shape is
the day-count monoid one: maintain per-(event_type, day) counts
(inherited merge_batch + at-least-once replay guard) and recompute
the trend test per snapshot with the IDENTICAL expression tree as
the batch operator — replay == batch bit-for-bit by construction.

At 100 TB the day-count store is a Delta/Iceberg MERGE INTO keyed on
(event_type, day); the pair fold reads only the store (|days|^2
calendar-bounded pairs, never event volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.dispersion_stream import (
    StreamingDailyStatsMaintainer,
)


class StreamingMannKendallMaintainer(StreamingDailyStatsMaintainer):
    """Maintains per-(event_type, day) counts across micro-batches
    and serves events_mann_kendall snapshots from that state."""

    def mann_kendall_snapshot(self) -> DataFrame:
        """events_mann_kendall recomputed from the maintained
        day-count state: collapse types to the total daily series,
        then the same broadcast pair fold / tie-corrected variance /
        continuity-corrected z as the batch operator."""
        daily = self.daily.groupBy("day").agg(
            F.sum("x").cast("bigint").alias("x")
        )
        a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
        b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
        pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s")
        )
        ties = (
            daily.groupBy("x")
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ).alias("tie_term")
            )
        )
        tot = daily.agg(F.count("*").alias("n"))
        j = pairs.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(tot))
        n, s = F.col("n"), F.col("s")
        var18 = n * (n - 1) * (2 * n + 5) - F.coalesce(
            F.col("tie_term"), F.lit(0)
        )
        cont = F.when(s > 0, 1).when(s < 0, -1).otherwise(0)
        return j.select(
            n.cast("bigint").alias("n_days"),
            s.cast("bigint").alias("s_stat"),
            var18.cast("bigint").alias("var18"),
            F.when(
                var18 > 0, F.round((s - cont) / F.sqrt(var18 / 18.0), 6)
            ).alias("z"),
        )
