"""Streaming exact-substring duplication spans.

The sliding-window twin of line/chunk streaming dedup with one twist
that makes it genuinely harder: dup_span semantics mark EVERY
occurrence of a repeated window (including the first), so a later
arrival must RETROACTIVELY upgrade the first occurrence it collides
with. The maintainer therefore keeps, per distinct window hash, its
first occurrence position and a dup flag:

  - batch windows that hit a non-dup seen hash mark themselves AND
    emit the stored first occurrence as newly-duplicated (the flag
    flips so the upgrade happens exactly once);
  - in-batch repeats mark all their positions immediately;
  - per-doc stats are computed from the accumulated duplicated
    POSITION set on demand (`snapshot()`), because they are a
    continuously-revised view, not append-once facts.

Replay equivalence: after any batch split of a corpus, snapshot()
equals batch ``dedup.dup_span_stats`` on the union EXACTLY (pytest-
pinned, including a cross-batch collision that upgrades an earlier
batch's doc). Per-batch cost: one join keyed on the window hash —
the seen index is pre-partitioned on wh so only the batch side
shuffles. State is one row per DISTINCT window hash plus one per
duplicated position; at 100 TB both become Delta/Iceberg tables and
the flag flip a MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onionnet_spark.functions.dedup import normalize_text

from onionnet_spark.streaming.replay import ReplayGuardMixin


class StreamingDupSpanMaintainer(ReplayGuardMixin):
    def __init__(self, spark: SparkSession, w: int = 5):
        self.w = w
        self.spark = spark
        # one row per distinct window hash ever seen
        self.seen = spark.createDataFrame(
            [], "wh string, doc_id bigint, i int, dup boolean"
        )
        # accumulated duplicated positions (doc_id, i)
        self.dup_pos = spark.createDataFrame([], "doc_id bigint, i int")
        # per-doc token counts, recorded once at arrival
        self.doc_tokens = spark.createDataFrame([], "doc_id bigint, n int")
        self.n_batches = 0

    def _windows(self, batch_df: DataFrame) -> tuple[DataFrame, DataFrame]:
        w = self.w
        toks = F.split(
            normalize_text(F.coalesce(F.col("text"), F.lit(""))), " "
        )
        base = batch_df.select(
            F.col("doc_id").cast("bigint").alias("doc_id"), toks.alias("t")
        ).select("doc_id", "t", F.size("t").cast("int").alias("n"))
        positions = F.when(
            F.col("n") >= w, F.sequence(F.lit(1), F.col("n") - F.lit(w - 1))
        ).otherwise(F.array().cast("array<int>"))
        wins = base.select(
            "doc_id", "t", F.explode(positions).alias("i")
        ).select(
            "doc_id",
            F.col("i").cast("int").alias("i"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), F.lit(w)))
            ).alias("wh"),
        )
        return base.select("doc_id", "n"), wins

    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if self._is_replay(batch_id):
            # foreachBatch at-least-once redelivery of an already-
            # applied epoch: the merge below is not (or need not be)
            # idempotent — skip it (ReplayGuardMixin contract)
            return
        if not batch_df.take(1):
            self._mark_applied(batch_id)
            return
        tokens, wins = self._windows(batch_df)
        wins = wins.localCheckpoint()
        # collapse the batch per hash: first position + occurrence count
        batch_first = wins.groupBy("wh").agg(
            F.min_by(F.struct("doc_id", "i"), F.struct("doc_id", "i")).alias(
                "f"
            ),
            F.count("*").alias("c"),
        )
        probed = batch_first.join(
            self.seen.select(
                "wh",
                F.col("doc_id").alias("s_doc"),
                F.col("i").alias("s_i"),
                F.col("dup").alias("s_dup"),
            ),
            on="wh",
            how="left",
        ).localCheckpoint()
        # a batch hash is duplicated if it repeats in-batch or was seen
        dup_hashes = probed.filter(
            (F.col("c") > 1) | F.col("s_doc").isNotNull()
        )
        new_dup_pos = wins.join(
            dup_hashes.select("wh"), on="wh", how="leftsemi"
        ).select("doc_id", "i")
        # retroactive upgrades: stored first occurrences whose flag
        # was still false (their hash just became duplicated)
        upgrades = dup_hashes.filter(
            F.col("s_doc").isNotNull() & ~F.coalesce("s_dup", F.lit(False))
        ).select(F.col("s_doc").alias("doc_id"), F.col("s_i").alias("i"))
        self.dup_pos = (
            self.dup_pos.unionByName(new_dup_pos)
            .unionByName(upgrades)
            .distinct()
            .localCheckpoint()
        )
        # seen-index merge: existing rows keep their first occurrence
        # but flip dup when hit; brand-new hashes enter with the batch
        # first occurrence and dup = (in-batch repeat)
        hit = probed.filter(F.col("s_doc").isNotNull()).select(
            "wh",
            F.col("s_doc").alias("doc_id"),
            F.col("s_i").alias("i"),
            (F.col("s_dup") | F.lit(True)).alias("dup"),
        )
        fresh = probed.filter(F.col("s_doc").isNull()).select(
            "wh",
            F.col("f.doc_id").alias("doc_id"),
            F.col("f.i").alias("i"),
            (F.col("c") > 1).alias("dup"),
        )
        untouched = self.seen.join(batch_first.select("wh"), on="wh", how="left_anti")
        nparts = int(
            batch_df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.seen = (
            untouched.unionByName(hit)
            .unionByName(fresh)
            .repartition(nparts, "wh")
            .localCheckpoint()
        )
        self.doc_tokens = self.doc_tokens.unionByName(tokens).localCheckpoint()
        self.n_batches += 1
        # recorded only AFTER the eager state checkpoint: a merge
        # that died mid-batch must accept the stream's retry
        self._mark_applied(batch_id)

    def snapshot(self) -> DataFrame:
        """Current per-doc span stats over everything ingested —
        identical schema/semantics to batch dup_span_stats."""
        from pyspark.sql import Window

        w = self.w
        ww = Window.partitionBy("doc_id").orderBy("i")
        islands = self.dup_pos.withColumn(
            "brk",
            F.when(
                F.lag("i").over(ww).isNull()
                | (F.col("i") > F.lag("i").over(ww) + F.lit(w)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).withColumn("isle", F.sum("brk").over(ww))
        spans = islands.groupBy("doc_id", "isle").agg(
            F.min("i").alias("s0"), F.max("i").alias("s1")
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.count("*").alias("n_spans"),
            F.sum(F.col("s1") - F.col("s0") + F.lit(w)).alias("dup_tokens"),
        )
        n_dup_w = self.dup_pos.groupBy("doc_id").agg(
            F.count("*").alias("n_dup_windows")
        )
        return (
            self.doc_tokens.join(n_dup_w, on="doc_id", how="left")
            .join(per_doc, on="doc_id", how="left")
            .select(
                "doc_id",
                F.col("n").cast("bigint").alias("n_tokens"),
                F.coalesce("n_dup_windows", F.lit(0))
                .cast("bigint")
                .alias("n_dup_windows"),
                F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
                F.coalesce("dup_tokens", F.lit(0))
                .cast("bigint")
                .alias("dup_tokens"),
                F.round(
                    F.coalesce("dup_tokens", F.lit(0)) / F.col("n"), 6
                ).alias("dup_fraction"),
            )
        )

    def attach(self, doc_stream: DataFrame, checkpoint_dir: str):
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
