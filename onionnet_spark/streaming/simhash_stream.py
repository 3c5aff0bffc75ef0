"""Streaming SimHash near-duplicate detection.

The Hamming-banded twin of StreamingDedupMaintainer: each
micro-batch's 32-bit SimHash fingerprints probe the band index for
candidates (batch x index plus batch x batch, never index x index),
verify with bit_count(xor) <= max_hamming, and then join the index.
A pair is emitted exactly once — in the batch where its later
document arrives — so replaying any batch split equals the batch
``simhash_near_pairs`` result (band collisions and Hamming distance
are pairwise facts, independent of arrival order).

State between batches = two localCheckpoint-ed frames: the
fingerprint table and the band table, the latter kept
pre-partitioned on (band, band_val) so a probe shuffles only the
batch side — per-batch cost proportional to the batch, never the
corpus. At 100 TB both frames become Delta/Iceberg tables and the
append a MERGE INTO; the dataflow is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.dedup import simhash

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingSimhashDedup(ReplayGuardMixin):
    def __init__(
        self,
        spark: SparkSession,
        bits: int = 32,
        bands: int = 4,
        max_hamming: int = 3,
    ):
        assert bits % bands == 0 and max_hamming <= bands - 1
        self.bits = bits
        self.bands = bands
        self.max_hamming = max_hamming
        self.fingerprints = spark.createDataFrame([], "id bigint, simhash bigint")
        self.band_index = spark.createDataFrame(
            [], "id bigint, band int, band_val bigint"
        )
        self.pairs = spark.createDataFrame(
            [], "id_a bigint, id_b bigint, hamming int"
        )
        self.n_batches = 0

    def _bands_of(self, sh: DataFrame) -> DataFrame:
        width = self.bits // self.bands
        mask = (1 << width) - 1
        return sh.select(
            "id",
            F.posexplode(
                F.array(
                    *[
                        (
                            F.shiftright(F.col("simhash"), b * width)
                            % F.lit(mask + 1)
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("band", "band_val"),
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
        sh_new = (
            simhash(batch_df, "text", "doc_id", self.bits)
            .select(F.col("doc_id").alias("id"), "simhash")
            .localCheckpoint()
        )
        bnd_new = self._bands_of(sh_new).localCheckpoint()

        def _canon(joined: DataFrame) -> DataFrame:
            return joined.filter(F.col("a.id") != F.col("b.id")).select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
            )

        cand = (
            _canon(
                bnd_new.alias("a").join(
                    self.band_index.alias("b"), on=["band", "band_val"]
                )
            )
            .unionByName(
                _canon(
                    bnd_new.alias("a").join(
                        bnd_new.alias("b"), on=["band", "band_val"]
                    )
                )
            )
            .distinct()
        )
        fp_all = self.fingerprints.unionByName(sh_new)
        new_pairs = (
            cand.join(
                fp_all.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha")),
                on="id_a",
            )
            .join(
                fp_all.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb")),
                on="id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .cast("int")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= self.max_hamming)
        )
        self.pairs = self.pairs.unionByName(new_pairs).localCheckpoint()
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.fingerprints = fp_all.localCheckpoint()
        self.band_index = (
            self.band_index.unionByName(bnd_new)
            .repartition(nparts, "band", "band_val")
            .localCheckpoint()
        )
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
