"""Streaming near-duplicate detection: continuous MinHash-LSH.

New documents arrive as a stream; each micro-batch is checked
against every document seen so far (and against itself) using the
SAME band bucketing + exact-Jaccard verify as the batch pair finder,
then its signatures join the index. A pair is emitted exactly once —
in the batch where its LATER document arrives — so replaying any
batch split of a corpus yields exactly the batch
``minhash_lsh_pairs`` result (band collisions and Jaccard are
pairwise facts, independent of arrival order).

State between batches = three localCheckpoint-ed frames (hashed
shingles, band keys, emitted pairs); each generation releases the
previous one, same lineage discipline as StreamingGraphMaintainer.
At 100 TB the index frames become Delta/Iceberg tables and the
append becomes MERGE INTO; the dataflow is unchanged. The candidate
join stays sub-quadratic for the same reason as the batch path:
new docs only meet index rows in their LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.streaming.replay import ReplayGuardMixin

from onionnet_spark.functions.dedup import (
    minhash_band_keys,
    minhash_signatures,
    word_shingles,
)


class StreamingDedupMaintainer(ReplayGuardMixin):
    """Maintains the LSH index and emits verified near-dup pairs.

    Documents carry (doc_id, text); `pairs` accumulates
    (id_a, id_b, jaccard) with id_a < id_b, exact Jaccard >= the
    threshold over the capped shingle space (df cap disabled here:
    a stream can't know final document frequencies; apply a
    stop-shingle list upfront if needed).
    """

    def __init__(
        self,
        spark: SparkSession,
        n: int = 3,
        num_perm: int = 16,
        bands: int = 4,
        threshold: float = 0.5,
    ):
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self.threshold = threshold
        self.shh = spark.createDataFrame([], "id bigint, shingle bigint")
        self.band_keys = spark.createDataFrame(
            [], "id bigint, band int, band_key string"
        )
        self.pairs = spark.createDataFrame(
            [], "id_a bigint, id_b bigint, jaccard double"
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
        sh_new = word_shingles(
            batch_df, "text", "doc_id", self.n
        ).localCheckpoint()
        sigs = minhash_signatures(sh_new, self.num_perm)
        bk_new = minhash_band_keys(sigs, self.num_perm, self.bands).localCheckpoint()
        # candidates must touch >= 1 NEW doc. The index probe and the
        # new-new self-join run SEPARATELY: the index is kept
        # pre-partitioned on the band key (repartition before
        # checkpoint, partitioning survives localCheckpoint), so the
        # probe shuffles only the new batch — the index side never
        # re-exchanges, which is what keeps a long-running stream's
        # per-batch cost proportional to the batch, not the corpus.
        # least/greatest canonicalizes; distinct collapses
        # double-sided new-new matches and multi-band collisions.
        def _canon(joined: DataFrame) -> DataFrame:
            return joined.filter(F.col("a.id") != F.col("b.id")).select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
            )

        cand_old = _canon(
            bk_new.alias("a").join(self.band_keys.alias("b"), on=["band", "band_key"])
        )
        cand_new = _canon(
            bk_new.alias("a").join(bk_new.alias("b"), on=["band", "band_key"])
        )
        cand = cand_old.unionByName(cand_new).distinct()
        shh_new = sh_new.select("id", F.xxhash64("shingle").alias("shingle"))
        shh_all = self.shh.unionByName(shh_new)
        sizes = shh_all.groupBy("id").agg(F.count("*").alias("n_sh"))
        inter = (
            shh_all.select(F.col("id").alias("id_a"), "shingle")
            .join(cand, on="id_a")
            .join(
                shh_all.select(F.col("id").alias("id_b"), "shingle"),
                on=["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
        new_pairs = (
            inter.join(
                sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")),
                "id_a",
            )
            .join(
                sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= self.threshold)
        )
        self.pairs = self.pairs.unionByName(new_pairs).localCheckpoint()
        self.shh = shh_all.localCheckpoint()
        self.band_keys = (
            self.band_keys.unionByName(bk_new)
            .repartition("band", "band_key")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        """Start the stream: every micro-batch is deduped against the
        index, then indexed."""
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
