"""Streaming SemDeDup: a continuously maintained cluster-local
semantic-duplicate index over an embedding stream.

New embeddings arrive in micro-batches; each batch is assigned to its
nearest centroid (a FIXED broadcast centroid table — the served-index
pattern: centroids are trained once on a reference corpus, exactly
like the batch ``semantic_dedup``'s label centroids), probed against
the maintained per-cluster index with the same exact-integer cosine
test the batch op uses (den * dot^2 >= num * |a|^2 * |b|^2 on
quantized coordinates), and then added to the index. Every vector —
kept or dropped — joins the index, because duplicate-of is a pairwise
fact against all smaller-id cluster-mates, not just kept ones.

Replaying a corpus in id-ordered batches therefore reproduces the
batch ``semantic_dedup`` rows exactly (dup_of = min smaller-id
duplicate cluster-mate); the pytest gate asserts frame equality.

Scale shape mirrors the other maintainers (dedup_stream, ann_stream):
the index stays pre-partitioned on the cluster key so each batch's
probe shuffles only the batch; centroids are a broadcast |C| x dim
table. At 100 TB the index frame becomes a Delta/Iceberg table and
the append a MERGE INTO — the dataflow is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.similarity import assign_to_centroids

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingSemanticDedupMaintainer(ReplayGuardMixin):
    """Maintains the per-cluster quantized-vector index and emits one
    row per arriving vector: (vec_id, cluster, dup_of, is_kept)."""

    def __init__(
        self,
        spark: SparkSession,
        centroids: DataFrame,
        threshold_num: int = 49,
        threshold_den: int = 400,
        scale: int = 1000,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        self.centroids = centroids.localCheckpoint()
        self.threshold_num = threshold_num
        self.threshold_den = threshold_den
        self.scale = scale
        self.vec_col = vec_col
        self.id_col = id_col
        self.index = spark.createDataFrame(
            [], "id bigint, cluster int, vq array<bigint>, n2 bigint"
        )
        self.rows = spark.createDataFrame(
            [], "vec_id bigint, cluster int, dup_of bigint, is_kept int"
        )
        self.n_batches = 0

    def _dup_candidates(self, a: DataFrame, b: DataFrame) -> DataFrame:
        """(id, dup_of-candidate) pairs: b duplicates a (a.id < b.id),
        same cluster, exact integer cosine >= threshold."""
        dot = F.aggregate(
            F.zip_with(F.col("a.vq"), F.col("b.vq"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return (
            a.alias("a")
            .join(b.alias("b"), on="cluster")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("b.id").alias("id"),
                F.col("a.id").alias("cand"),
                dot.alias("dot"),
                F.col("a.n2").alias("na"),
                F.col("b.n2").alias("nb"),
            )
            .filter(
                (F.col("dot") >= 0)
                & (
                    F.lit(self.threshold_den) * F.col("dot") * F.col("dot")
                    >= F.lit(self.threshold_num) * F.col("na") * F.col("nb")
                )
            )
            .select("id", "cand")
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
        scale = self.scale
        assign = assign_to_centroids(
            batch_df, self.centroids, self.vec_col, self.id_col
        )
        vq = batch_df.select(
            F.col(self.id_col).alias("id"),
            F.transform(
                F.col(self.vec_col),
                lambda x: F.floor(x.cast("double") * scale).cast("bigint"),
            ).alias("vq"),
        ).withColumn(
            "n2",
            F.aggregate("vq", F.lit(0).cast("bigint"), lambda acc, x: acc + x * x),
        )
        new = vq.join(assign, on="id").localCheckpoint()
        dup_of = (
            self._dup_candidates(self.index, new)
            .unionByName(self._dup_candidates(new, new))
            .groupBy("id")
            .agg(F.min("cand").alias("dup_of"))
        )
        out = (
            new.select("id", "cluster")
            .join(dup_of, on="id", how="left")
            .select(
                F.col("id").alias("vec_id"),
                F.col("cluster").cast("int").alias("cluster"),
                "dup_of",
                F.col("dup_of").isNull().cast("int").alias("is_kept"),
            )
        )
        self.rows = self.rows.unionByName(out).localCheckpoint()
        self.index = (
            self.index.unionByName(new.select("id", "cluster", "vq", "n2"))
            .repartition("cluster")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, vec_stream: DataFrame, checkpoint_dir: str):
        return (
            vec_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
