"""Streaming PSI drift monitor.

Continuously maintained Population Stability Index per group: the
state is the (group, bin) count grid — a few hundred counters
regardless of stream volume (counts are a monoid, so per-batch
partial grids MERGE by addition, the same story as the streaming
Count-Min / rollup maintainers). Bin bounds are FROZEN at
construction (the drift-monitoring contract: bins must not move as
data arrives, otherwise yesterday's shares aren't comparable), which
is also what makes replay exact: snapshot() equals batch
``psi_by_group(df, bounds=(lo, hi))`` on the union of all batches,
pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingPsiMonitor(ReplayGuardMixin):
    def __init__(
        self,
        spark: SparkSession,
        lo: int,
        hi: int,
        value_col: str = "n_chars",
        group_col: str = "source",
        n_bins: int = 10,
    ):
        self.lo, self.hi, self.n_bins = int(lo), int(hi), n_bins
        self.value_col, self.group_col = value_col, group_col
        self.cells = spark.createDataFrame([], "g string, bin int, c bigint")
        self.n_batches = 0

    def _binned(self, batch_df: DataFrame) -> DataFrame:
        span = self.hi - self.lo + 1
        v = F.col(self.value_col).cast("bigint")
        bin_col = (
            F.lit(0)
            if self.hi == self.lo
            else F.greatest(
                F.least(
                    F.floor((v - F.lit(self.lo)) * self.n_bins / F.lit(span)),
                    F.lit(self.n_bins - 1),
                ),
                F.lit(0),
            )
        )
        return batch_df.select(
            F.col(self.group_col).cast("string").alias("g"),
            bin_col.cast("int").alias("bin"),
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        partial = self._binned(batch_df).groupBy("g", "bin").agg(
            F.count("*").cast("bigint").alias("c")
        )
        self.cells = (
            self.cells.unionByName(partial)
            .groupBy("g", "bin")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """PSI per group over everything ingested — same math as
        batch psi_by_group (1e-4 clamp, nano-quantized terms)."""
        cells = self.cells
        g_tot = cells.groupBy("g").agg(F.sum("c").alias("gt"))
        all_cells = cells.groupBy("bin").agg(F.sum("c").alias("ac"))
        all_tot = all_cells.agg(F.sum("ac").alias("at"))
        grid = (
            g_tot.crossJoin(F.broadcast(all_cells.crossJoin(F.broadcast(all_tot))))
            .join(cells, on=["g", "bin"], how="left")
            .select(
                "g",
                "gt",
                F.greatest(
                    F.coalesce(F.col("c"), F.lit(0)) / F.col("gt"), F.lit(1e-4)
                ).alias("pg"),
                F.greatest(F.col("ac") / F.col("at"), F.lit(1e-4)).alias("pa"),
            )
        )
        terms = grid.select(
            "g",
            "gt",
            F.floor(
                (F.col("pg") - F.col("pa")) * F.log(F.col("pg") / F.col("pa")) * 1e9
            )
            .cast("bigint")
            .alias("t"),
        )
        return terms.groupBy(F.col("g").alias(self.group_col)).agg(
            F.first("gt").cast("bigint").alias("n_docs"),
            F.sum("t").cast("bigint").alias("psi_nano"),
            F.round(F.sum("t") / F.lit(1e9), 6).alias("psi"),
        )

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
