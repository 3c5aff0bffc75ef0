"""Streaming CDC apply: a continuously-maintained table snapshot.

The Delta/Iceberg streaming-MERGE pattern: each micro-batch of
I(nsert)/U(psert)/D(elete) change rows folds into the maintained
snapshot with last-sequence-wins semantics — the same dataflow as
the batch operator (operators/timeseries.apply_cdc), which is what
the replay-equals-batch pytest gate proves. Deletes must TOMBSTONE
within the maintainer (a later batch can carry an earlier-sequence
change for the same key; dropping the row would resurrect it), so
the maintained state keeps (row, seq, op) per key and `snapshot()`
filters tombstones at read time.

Pattern matches the other maintainers: ``foreachBatch`` + keyed
max_by MERGE + ``localCheckpoint`` generations. At scale the state
is the target table itself (MERGE INTO keyed on the primary key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingCdcMaintainer(ReplayGuardMixin):
    """Maintains the post-CDC snapshot of a keyed table across
    micro-batches of change rows (full records + seq + op)."""

    def __init__(self, base: DataFrame, key_col: str, seq_col: str = "seq",
                 op_col: str = "op"):
        self.key_col = key_col
        self.seq_col = seq_col
        self.op_col = op_col
        self.cols = [c for c in base.columns]
        self.state = base.select(
            *self.cols,
            F.lit(-(1 << 62)).alias("_seq"),
            F.lit("I").alias("_op"),
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
        delta = batch_df.select(
            *self.cols,
            F.col(self.seq_col).cast("long").alias("_seq"),
            F.col(self.op_col).alias("_op"),
        )
        self.state = (
            self.state.unionByName(delta)
            .groupBy(self.key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in self.cols], "_seq", "_op"),
                    F.col("_seq"),
                ).alias("m")
            )
            .select(
                *[F.col(f"m.{c}").alias(c) for c in self.cols],
                F.col("m._seq").alias("_seq"),
                F.col("m._op").alias("_op"),
            )
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """The current table state (tombstones filtered)."""
        return self.state.filter(F.col("_op") != "D").select(*self.cols)

    def attach(self, change_stream: DataFrame, checkpoint_dir: str):
        return (
            change_stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
