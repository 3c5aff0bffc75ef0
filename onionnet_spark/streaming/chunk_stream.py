"""Streaming C4-style duplicate-span removal.

Documents arrive as a stream; each micro-batch's fixed word-window
chunks are checked against the corpus-wide set of chunk hashes seen
so far (and, within the batch, against each other with the same
(doc_id, chunk_idx) first-occurrence rule as the batch operator).
Per-document accounting rows (n_chunks, n_dup_chunks,
n_tokens_kept) are emitted exactly once, in the batch where the
document arrives.

Replay equivalence: for any ID-ORDERED batch split of a corpus the
accumulated output equals batch ``dedup.chunk_dedup`` exactly —
"first occurrence" is the min (doc_id, chunk_idx), and id-ordered
arrival makes arrival order agree with that global order. For
out-of-order arrival the streaming result is first-ARRIVAL-wins
(the only causal option a stream has); the test pins the id-ordered
equivalence.

State between batches = one localCheckpoint-ed frame of distinct
seen chunk hashes, pre-partitioned on the hash so each batch's
probe shuffles only the batch side (per-batch cost proportional to
the batch, never the corpus — same discipline as the MinHash-LSH
index in dedup_stream.py). At 100 TB the frame becomes a
Delta/Iceberg table and the append a MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from onionnet_spark.functions.dedup import doc_chunks

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingChunkDedupMaintainer(ReplayGuardMixin):
    def __init__(self, spark: SparkSession, chunk_words: int = 10):
        self.chunk_words = chunk_words
        self.seen = spark.createDataFrame([], "ch string")
        self.stats = spark.createDataFrame(
            [],
            "doc_id bigint, n_chunks bigint, n_dup_chunks bigint, "
            "n_tokens_kept bigint",
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
        chunked = doc_chunks(batch_df, self.chunk_words).localCheckpoint()
        # within-batch first occurrence, then the index probe: a
        # chunk is a duplicate if an earlier in-batch occurrence OR
        # any prior batch has it. The left join hits only the probe
        # side's buckets (index kept hash-partitioned).
        w = Window.partitionBy("ch").orderBy("id", "ci")
        marked = (
            chunked.withColumn("rk", F.row_number().over(w))
            .join(
                self.seen.withColumn("_hit", F.lit(1)),
                on="ch",
                how="left",
            )
            .withColumn(
                "is_dup",
                (F.col("rk") > 1) | F.col("_hit").isNotNull(),
            )
        )
        batch_stats = marked.groupBy(F.col("id").alias("doc_id")).agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.sum(F.when(~F.col("is_dup"), F.col("clen")).otherwise(0))
            .cast("bigint")
            .alias("n_tokens_kept"),
        )
        self.stats = self.stats.unionByName(batch_stats).localCheckpoint()
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.seen = (
            self.seen.unionByName(chunked.select("ch").distinct())
            .distinct()
            .repartition(nparts, "ch")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch is accounted against
        the seen-chunk index, then indexed."""
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
