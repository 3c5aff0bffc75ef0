"""Streaming Count-Min sketch: continuous heavy hitters.

The CMS is a commutative monoid (counter-wise addition), which makes
it THE sketch for streaming maintenance: each micro-batch builds its
own depth x width partial sketch (map-side partial aggregation — at
most depth*width rows leave any task) and the maintainer adds it
into the running sketch. A candidate key set is maintained alongside
(the distinct keys seen, with exact counts for the error audit);
`topk()` probes the merged sketch exactly like the batch operator,
so an id-ordered replay equals batch `count_min_topk` frame-for-frame
(pytest-gated).

At corpus scale the maintained sketch is a few thousand counters
regardless of stream volume — the state-size story exact groupBy
maintenance can't offer; the candidate table is what a production
deployment would bound (e.g. keep only keys whose sketch estimate
clears a floor), noted below rather than silently capped.

Pattern matches the other maintainers (rollup/dedup/ann streams):
``foreachBatch`` + monoid MERGE + ``localCheckpoint`` generations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingCountMin(ReplayGuardMixin):
    """Maintains a Count-Min sketch plus the candidate key table
    across micro-batches; `topk(k)` reproduces batch count_min_topk
    over everything ingested so far."""

    def __init__(self, spark, key_col: str = "key", depth: int = 4, width: int = 64):
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.sketch = spark.createDataFrame(
            [], "i int, b int, c bigint"
        ).localCheckpoint()
        # exact per-key counts ride along for the error audit; a
        # production build would floor this table on the sketch
        # estimate instead of keeping every key
        self.keys = spark.createDataFrame(
            [], "k string, exact bigint"
        ).localCheckpoint()
        self.n_batches = 0

    def _bucket(self, i: int) -> Column:
        fold = F.translate(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("k"))), 1, 6),
            "abcdef",
            "012345",
        )
        return (fold.cast("int") % self.width).alias("b")

    def _hashes(self) -> Column:
        return F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), self._bucket(i))
                    for i in range(self.depth)
                ]
            )
        ).alias("ib")

    def merge_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        rows = batch_df.select(F.col(self.key_col).cast("string").alias("k"))
        partial = (
            rows.select(self._hashes())
            .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        self.sketch = (
            self.sketch.unionByName(partial)
            .groupBy("i", "b")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .localCheckpoint()
        )
        kpart = rows.groupBy("k").agg(F.count("*").cast("bigint").alias("exact"))
        self.keys = (
            self.keys.unionByName(kpart)
            .groupBy("k")
            .agg(F.sum("exact").cast("bigint").alias("exact"))
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def topk(self, k: int = 20) -> DataFrame:
        est = (
            self.keys.select("k", "exact", self._hashes())
            .select(
                "k", "exact", F.col("ib.i").alias("i"), F.col("ib.b").alias("b")
            )
            .join(F.broadcast(self.sketch), on=["i", "b"])
            .groupBy("k", "exact")
            .agg(F.min("c").cast("bigint").alias("est"))
        )
        return (
            est.orderBy(F.desc("est"), "k")
            .limit(k)
            .select(F.col("k").alias("key"), "est", "exact")
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        return (
            stream.writeStream.foreachBatch(self.merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
