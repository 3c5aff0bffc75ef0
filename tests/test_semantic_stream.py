"""StreamingSemanticDedupMaintainer: id-ordered replay must equal the
batch semantic_dedup exactly (dup_of is a pairwise fact against all
smaller-id cluster-mates, independent of the batch split)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_semantic_stream_replay_equals_batch(spark, sf_dir):
    from onionnet_spark.functions.similarity import label_centroids, semantic_dedup
    from onionnet_spark.streaming.semantic_stream import (
        StreamingSemanticDedupMaintainer,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    batch = {tuple(r) for r in semantic_dedup(embs).collect()}
    m = StreamingSemanticDedupMaintainer(spark, label_centroids(embs))
    for lo, hi in ((0, 70), (70, 140), (140, 200)):
        m.process_batch(
            embs.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        )
    stream = {tuple(r) for r in m.rows.collect()}
    assert stream == batch
    assert m.n_batches == 3
    # the gate is non-vacuous: some vectors were actually dropped
    assert any(r[3] == 0 for r in batch)


def test_semantic_stream_cross_batch_duplicate_points_at_index(spark):
    from onionnet_spark.functions.similarity import label_centroids
    from onionnet_spark.streaming.semantic_stream import (
        StreamingSemanticDedupMaintainer,
    )

    ref = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    m = StreamingSemanticDedupMaintainer(spark, label_centroids(ref))
    m.process_batch(
        spark.createDataFrame(
            [(10, [3.0, 0.1])], "vec_id long, embedding array<float>"
        )
    )
    # a later batch brings a near-parallel vector: must dup against
    # the INDEXED vector from the earlier batch
    m.process_batch(
        spark.createDataFrame(
            [(20, [2.9, 0.1])], "vec_id long, embedding array<float>"
        )
    )
    rows = {r["vec_id"]: r for r in m.rows.collect()}
    assert rows[10]["is_kept"] == 1
    assert rows[20]["dup_of"] == 10 and rows[20]["is_kept"] == 0
