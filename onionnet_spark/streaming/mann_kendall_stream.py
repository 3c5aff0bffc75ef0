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


class StreamingLjungBoxMaintainer(StreamingDailyStatsMaintainer):
    """Maintains per-(event_type, day) counts across micro-batches
    and serves events_ljung_box snapshots from that state. Like the
    Mann-Kendall twin, the pooled ACF is retroactive (the series
    mean and every lag-k product shift when a late batch lands), so
    the snapshot recomputes the identical expression tree over the
    calendar-bounded day-count monoid."""

    def ljung_box_snapshot(self) -> DataFrame:
        spark = self.daily.sparkSession
        daily = self.daily.groupBy("day").agg(
            F.sum("x").cast("bigint").alias("x")
        )
        tot = daily.agg(
            F.count("*").alias("t"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("ss"),
        )
        lags = spark.range(1, 15).select(F.col("id").cast("int").alias("k"))
        a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
        b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
        pairs = (
            lags.crossJoin(a)
            .join(
                F.broadcast(b),
                F.col("db") == F.date_sub(F.col("da"), F.col("k")),
            )
            .groupBy("k")
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum(F.col("xa") * F.col("xb")).alias("p"),
                F.sum(F.col("xa") + F.col("xb")).alias("q"),
            )
        )
        t, s, ss = F.col("t"), F.col("s"), F.col("ss")
        num = (
            F.col("p") * t * t - s * F.col("q") * t
            + F.col("n_pairs") * s * s
        )
        den = ss * t * t - s * s * t
        rho = num * F.lit(1.0) / den
        terms = (
            pairs.crossJoin(F.broadcast(tot))
            .filter(F.col("n_pairs") > 0)
            .select(
                "k",
                F.floor(F.lit(1e12) * rho * rho / F.col("n_pairs"))
                .cast("bigint")
                .alias("term"),
            )
        )
        ms = spark.createDataFrame([(3,), (7,), (14,)], "m int")
        return (
            F.broadcast(ms)
            .join(terms, F.col("k") <= F.col("m"))
            .crossJoin(F.broadcast(tot))
            .groupBy("m", "t")
            .agg(F.sum("term").alias("term_sum"))
            .select(
                F.col("m").alias("max_lag"),
                t.cast("bigint").alias("n_days"),
                F.col("term_sum").cast("bigint").alias("term_sum_pico"),
                F.round(t * (t + 2) * F.col("term_sum") / 1e12, 6).alias(
                    "q_stat"
                ),
            )
        )
