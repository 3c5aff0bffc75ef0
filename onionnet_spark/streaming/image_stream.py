"""Streaming perceptual image dedup: continuous dHash index.

Image payloads arrive as a stream; each micro-batch is really
decoded (PNG/baseline JPEG codecs) and dHashed inside mapInPandas,
checked against the corpus-wide index of seen hashes (and, within
the batch, against itself with a smallest-doc_id-first rule), and
appended to the index. Emits per-image rows exactly once:
(doc_id, dhash, is_dup, match_id) under first-arrival-wins: a
prior-batch hit matches the index's first_id (the earlier ARRIVAL,
never the row itself, even for out-of-id-order streams); an
in-batch duplicate matches the batch's smallest doc_id.

Same state discipline as the other maintainers (dedup_stream,
chunk_stream): one localCheckpoint-ed frame of (dhash, min doc_id),
hash-partitioned so each batch's probe shuffles only the batch
side. For id-ordered batch splits the accumulated output equals the
batch computation exactly (first occurrence = min doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from onionnet_spark.functions.multimodal import image_dhash

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingImageDedupMaintainer(ReplayGuardMixin):
    def __init__(self, spark: SparkSession):
        self.index = spark.createDataFrame([], "dhash string, first_id bigint")
        self.results = spark.createDataFrame(
            [], "doc_id bigint, dhash string, is_dup boolean, match_id bigint"
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
        hashed = image_dhash(batch_df).localCheckpoint()
        w = Window.partitionBy("dhash").orderBy("doc_id")
        marked = (
            hashed.withColumn("rk", F.row_number().over(w))
            .withColumn("batch_first", F.min("doc_id").over(w))
            .join(self.index, on="dhash", how="left")
            .select(
                "doc_id",
                "dhash",
                ((F.col("rk") > 1) | F.col("first_id").isNotNull()).alias(
                    "is_dup"
                ),
                # First-arrival-wins: a prior-batch hit (first_id) IS
                # the earlier arrival, even when the in-batch minimum
                # id is smaller (out-of-id-order streams) — least()
                # here could point a row's match at itself.
                F.when(F.col("first_id").isNotNull(), F.col("first_id"))
                .otherwise(
                    F.when(F.col("rk") > 1, F.col("batch_first"))
                )
                .alias("match_id"),
            )
        )
        self.results = self.results.unionByName(marked).localCheckpoint()
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        new_index = hashed.groupBy("dhash").agg(F.min("doc_id").alias("first_id"))
        self.index = (
            self.index.unionByName(new_index)
            .groupBy("dhash")
            .agg(F.min("first_id").alias("first_id"))
            .repartition(nparts, "dhash")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, image_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch is dHashed, deduped
        against the index, then indexed."""
        return (
            image_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
