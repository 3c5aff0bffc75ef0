"""Checkpoint discipline for long iterative dataflows.

Measured on this Spark build (see trussness): a chain of more than
~12 `localCheckpoint()` generations hits a geometric per-sweep
replay blowup — 0.7s/sweep flat for 12 sweeps, then x4 per sweep —
even though every post-checkpoint plan is a bare LogicalRDD scan
(the SQL-layer truncation is working; the cost re-appears below
it). The reliable truncation for long chains is a REAL materialized
rebase: write the frame to parquet and read it back, which is also
exactly what long iterative jobs do on clusters (a shared-filesystem
checkpoint dir).

`IterCheckpointer.cut(df)` is a drop-in for `df.localCheckpoint()`:
cheap local checkpoints for short chains, an automatic parquet
rebase every `rebase_every` cuts so chains of ANY depth stay flat.
Iterations bounded well under the threshold (fixed small round
counts) don't need this; BFS to unknown depth, fixpoint CC on
high-diameter graphs, and long peel schedules do.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame


class IterCheckpointer:
    """Counts checkpoint generations; every `rebase_every`-th cut is
    a parquet write/read rebase instead of a localCheckpoint."""

    def __init__(
        self,
        rebase_every: int = 10,
        checkpoint_dir: str | None = None,
        prefix: str = "onionnet_iter_",
    ):
        self.rebase_every = rebase_every
        self._dir = checkpoint_dir
        self._prefix = prefix
        self._n = 0

    def cut(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """``eager=False`` defers materialization to the caller's next
        action (r11): loops shaped `nxt = cut(nxt); n = nxt.count()`
        pay one job per level instead of two — the count IS the
        materialization. Only the localCheckpoint arm defers; the
        parquet rebase is a write and stays eager by nature."""
        self._n += 1
        if self.rebase_every and self._n % self.rebase_every == 0:
            if self._dir is None:
                self._dir = tempfile.mkdtemp(prefix=self._prefix)
            path = f"{self._dir}/gen_{self._n}"
            df.write.mode("overwrite").parquet(path)
            return df.sparkSession.read.parquet(path)
        return df.localCheckpoint(eager=eager)
