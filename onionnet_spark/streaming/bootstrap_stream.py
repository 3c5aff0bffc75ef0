"""Streaming Poisson-bootstrap monitor.

The bootstrap's per-resample (count, sum) pairs are a MONOID — a
row's Poisson multiplicity depends only on (id, resample) hashes, so
per-batch partials merge by addition and the continuously-maintained
CI is exactly the batch answer on everything ingested (replay ==
batch, pytest-pinned). State is n_resamples rows, period. The
streaming shape every metrics pipeline wants: a live standard-error
band on a mean without ever re-touching history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.corpus import poisson_bootstrap

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingBootstrapMonitor(ReplayGuardMixin):
    def __init__(
        self,
        spark: SparkSession,
        value_col: str = "n_chars",
        id_col: str = "doc_id",
        n_resamples: int = 16,
    ):
        self.value_col, self.id_col = value_col, id_col
        self.n_resamples = n_resamples
        self.state = spark.createDataFrame(
            [], "resample int, n_eff bigint, sum_value bigint"
        )
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
        partial = poisson_bootstrap(
            batch_df, self.value_col, self.id_col, self.n_resamples
        ).select("resample", "n_eff", "sum_value")
        self.state = (
            self.state.unionByName(partial)
            .groupBy("resample")
            .agg(
                F.sum("n_eff").cast("bigint").alias("n_eff"),
                F.sum("sum_value").cast("bigint").alias("sum_value"),
            )
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """Per-resample means over everything ingested — identical
        schema/values to batch poisson_bootstrap on the union."""
        return self.state.select(
            "resample",
            "n_eff",
            "sum_value",
            F.round(F.col("sum_value") / F.col("n_eff"), 6).alias("mean_value"),
        )

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
