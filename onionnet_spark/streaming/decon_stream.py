"""Streaming decontamination: benchmark-overlap tracking while the
TRAINING corpus streams in.

The realistic direction at scale: benchmark/test sets are small and
static, the training corpus is huge and arrives continuously. State
is therefore the TEST side — one row per (test doc, shingle-hash
occurrence) with a cumulative hit flag — kept pre-partitioned on the
shingle hash so each micro-batch's distinct-shingle probe shuffles
only the batch. A shingle seen in ANY earlier batch stays hit (the
flag is a monotone OR), so replaying any batch split of the training
corpus yields exactly the batch ``contamination_overlap`` result.

State size is bounded by the test corpus (fixed, small), NOT the
stream — the training shingles are never retained, which is what
makes indefinite streaming viable: per-batch cost is proportional to
the batch, state to the benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.dedup import word_shingles

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingDecontamination(ReplayGuardMixin):
    """Maintains per-test-shingle hit flags against a growing
    training stream; ``snapshot()`` returns the same
    (doc_id, n_shingles, n_hit, overlap) frame as the batch op over
    everything streamed so far.
    """

    def __init__(
        self,
        spark: SparkSession,
        test_df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 5,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        # word_shingles dedups per (doc, shingle) — n_shingles below
        # counts a doc's DISTINCT shingles, matching the batch
        # metric's denominator exactly (both sides share the same
        # shingler, which is what the replay-equality rests on).
        self.test_shingles = (
            word_shingles(test_df, text_col, id_col, n)
            .select("id", F.xxhash64("shingle").alias("shingle"))
            .withColumn("hit", F.lit(False))
            .repartition("shingle")
            .localCheckpoint()
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
        tr = (
            word_shingles(batch_df, self.text_col, self.id_col, self.n)
            .select(F.xxhash64("shingle").alias("shingle"))
            .distinct()
            .withColumn("bhit", F.lit(True))
        )
        self.test_shingles = (
            self.test_shingles.join(tr, on="shingle", how="left")
            .select(
                "id",
                "shingle",
                (F.col("hit") | F.coalesce("bhit", F.lit(False))).alias("hit"),
            )
            .repartition("shingle")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """(doc_id, n_shingles, n_hit, overlap) over the stream so far
        — column-compatible with ``contamination_overlap``."""
        hit_i = F.when(F.col("hit"), F.lit(1)).otherwise(F.lit(0))
        return self.test_shingles.groupBy(
            F.col("id").alias(self.id_col)
        ).agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(hit_i).cast("bigint").alias("n_hit"),
            F.round(F.sum(hit_i) / F.count("*"), 6).alias("overlap"),
        )

    def attach(self, train_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every training micro-batch marks the test
        shingles it contains."""
        return (
            train_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
