"""Streaming corpus-wide line dedup.

The line-granularity twin of chunk_stream: each micro-batch's
non-empty trimmed lines are checked against the corpus-wide set of
line hashes seen so far (and within the batch against each other
with the same (doc_id, line_idx) first-occurrence rule as batch
``dedup.line_dedup``); per-document accounting rows (n_lines,
n_dup_lines, n_kept_chars) are emitted exactly once, in the batch
where the document arrives.

Replay equivalence: for any ID-ORDERED batch split the accumulated
output equals batch `line_dedup` exactly; out-of-order arrival is
first-ARRIVAL-wins (the only causal option). State between batches
= one localCheckpoint-ed frame of distinct seen line hashes,
pre-partitioned on the hash so each batch's probe shuffles only the
batch side — per-batch cost proportional to the batch, never the
corpus. At 100 TB the frame becomes a Delta/Iceberg table and the
append a MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from onionnet_spark.functions.dedup import doc_lines

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingLineDedupMaintainer(ReplayGuardMixin):
    def __init__(self, spark: SparkSession):
        self.seen = spark.createDataFrame([], "lh string")
        self.stats = spark.createDataFrame(
            [],
            "doc_id bigint, n_lines bigint, n_dup_lines bigint, "
            "n_kept_chars bigint",
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
        lines = doc_lines(batch_df).localCheckpoint()
        w = Window.partitionBy("lh").orderBy("id", "li")
        marked = (
            lines.withColumn("rk", F.row_number().over(w))
            .join(self.seen.withColumn("_hit", F.lit(1)), on="lh", how="left")
            .withColumn(
                "is_dup", (F.col("rk") > 1) | F.col("_hit").isNotNull()
            )
        )
        batch_stats = marked.groupBy(F.col("id").alias("doc_id")).agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_lines"),
            F.sum(F.when(~F.col("is_dup"), F.col("ln")).otherwise(0))
            .cast("bigint")
            .alias("n_kept_chars"),
        )
        self.stats = self.stats.unionByName(batch_stats).localCheckpoint()
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.seen = (
            self.seen.unionByName(lines.select("lh").distinct())
            .distinct()
            .repartition(nparts, "lh")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch is accounted against
        the seen-line index, then indexed."""
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
