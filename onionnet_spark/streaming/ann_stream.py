"""Streaming embedding near-duplicate detection: a continuously
maintained hyperplane-LSH vector index.

New embeddings arrive as a stream; each micro-batch probes the
maintained index bucket-locally (every vector has exactly ONE
hyperplane-sign bucket, so a pair collides in at most one bucket and
never needs a distinct), verifies candidates with the exact cosine,
emits qualifying pairs exactly once — in the batch where the LATER
vector arrives — and then joins the index. Replaying any batch split
of a corpus therefore yields exactly the batch
``cosine_near_dup_pairs`` result: bucket membership and cosine are
pairwise facts, independent of arrival order.

Scale shape mirrors StreamingDedupMaintainer: the index is kept
pre-partitioned on the bucket key (the repartition survives
localCheckpoint), so the per-batch probe shuffles only the new batch
— the index side never re-exchanges, keeping per-batch cost
proportional to the batch, not the corpus. At 100 TB the index frame
becomes a Delta/Iceberg table and the append a MERGE INTO; the
dataflow is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.similarity import cosine, lsh_bucket_col

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingAnnIndex(ReplayGuardMixin):
    """Maintains the bucketed vector index and emits verified
    embedding near-dup pairs (id_a, id_b, cosine), id_a < id_b,
    cosine >= threshold, rounded to 6 dp like the batch op.
    """

    def __init__(
        self,
        spark: SparkSession,
        threshold: float = 0.95,
        n_planes: int = 8,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        self.threshold = threshold
        self.n_planes = n_planes
        self.vec_col = vec_col
        self.id_col = id_col
        # v keeps the SOURCE element type (array<float> for the test
        # corpus): the exact-cosine verify must see the same bits the
        # batch op sees, or stream and batch could round differently.
        self.index = spark.createDataFrame(
            [], "id bigint, bucket bigint, v array<float>"
        )
        self.pairs = spark.createDataFrame(
            [], "id_a bigint, id_b bigint, cosine double"
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
        new = (
            batch_df.select(
                F.col(self.id_col).alias("id"), F.col(self.vec_col).alias("v")
            )
            .withColumn("bucket", lsh_bucket_col(F.col("v"), self.n_planes))
            .localCheckpoint()
        )

        def _verified(joined: DataFrame) -> DataFrame:
            return (
                joined.filter(F.col("a.id") != F.col("b.id"))
                .select(
                    F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"),
                    F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
                )
                .filter(F.col("cosine") >= self.threshold)
            )

        # index probe: shuffles only `new` (index pre-partitioned on
        # bucket); new-new self-join covers pairs inside the batch
        # (a.id < b.id keeps each exactly once)
        probe = _verified(new.alias("a").join(self.index.alias("b"), on="bucket"))
        within = _verified(
            new.alias("a")
            .join(new.alias("b"), on="bucket")
            .filter(F.col("a.id") < F.col("b.id"))
        )
        self.pairs = self.pairs.unionByName(probe.unionByName(within)).localCheckpoint()
        self.index = (
            self.index.unionByName(new.select("id", "bucket", "v"))
            .repartition("bucket")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, vec_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch is matched against the
        index, then indexed."""
        return (
            vec_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
