"""Round-8 additions: persisted trained codebooks (the served-index
side-table) and the two-phase global_rank_range."""

import pytest
from pyspark.sql import functions as F

from onionnet_spark.functions import similarity
from onionnet_spark.functions.corpus import global_rank_range


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _result_set(df):
    return {tuple(r) for r in df.collect()}


def test_residual_codebooks_persist_and_reload(spark, embs, tmp_path_factory):
    """A cold process must get bit-identical results from the
    persisted codebook side-table: train+persist, evict the
    in-memory memo, re-run (forces the parquet load path), compare;
    and the no-cache training path must agree with both."""
    key = "test-r8-persist-v1"
    fresh = _result_set(
        similarity.ann_ivf_pq_residual_topk(embs, k=3, cache_key=None)
    )
    trained = _result_set(
        similarity.ann_ivf_pq_residual_topk(embs, k=3, cache_key=key)
    )
    # evict the in-memory memo -> the next call must load from disk
    evicted = [
        k for k in similarity._RESIDUAL_TRAIN_CACHE if k[1] == key
    ]
    assert evicted, "cache_key call did not populate the memo"
    for k in evicted:
        similarity._RESIDUAL_TRAIN_CACHE.pop(k)
    import hashlib
    import os

    sig = f"{key}|embedding|vec_id|8|4|8|2|ivfpq_res_v1"
    fp = hashlib.md5(sig.encode()).hexdigest()[:16]
    root = similarity._codebook_store_dir(spark)
    assert os.path.isdir(os.path.join(root, f"{fp}_coarse"))
    assert os.path.isdir(os.path.join(root, f"{fp}_pq"))
    reloaded = _result_set(
        similarity.ann_ivf_pq_residual_topk(embs, k=3, cache_key=key)
    )
    assert trained == reloaded == fresh


def test_corrupt_store_falls_back_to_training(spark, embs):
    """A torn/corrupt side-table must retrain, not crash."""
    import hashlib
    import os

    key = "test-r8-corrupt-v1"
    sig = f"{key}|embedding|vec_id|8|4|8|2|ivfpq_res_v1"
    fp = hashlib.md5(sig.encode()).hexdigest()[:16]
    root = similarity._codebook_store_dir(spark)
    for suffix in ("coarse", "pq"):
        p = os.path.join(root, f"{fp}_{suffix}")
        os.makedirs(p, exist_ok=True)
        open(os.path.join(p, "part-garbage.parquet"), "wb").write(b"xx")
    out = _result_set(
        similarity.ann_ivf_pq_residual_topk(embs, k=3, cache_key=key)
    )
    fresh = _result_set(
        similarity.ann_ivf_pq_residual_topk(embs, k=3, cache_key=None)
    )
    assert out == fresh


def test_global_rank_range_matches_global_row_number(spark):
    """global_rank_range == ROW_NUMBER() OVER (ORDER BY ...) on a
    tie-heavy table (the Zipf c=1 mass case) at several partition
    counts, desc+asc composite order."""
    from pyspark.sql import Window

    rows = [(i % 7, f"k{i:04d}") for i in range(500)]
    df = spark.createDataFrame(rows, "c int, tok string")
    ref = df.withColumn(
        "want",
        F.row_number().over(Window.orderBy(F.desc("c"), "tok")) - 1,
    )
    got = global_rank_range(
        df, [F.desc("c"), F.asc("tok")], rank_col="got", zero_based=True
    )
    bad = (
        ref.join(got, on=["c", "tok"])
        .filter(F.col("want") != F.col("got"))
        .count()
    )
    assert bad == 0


def test_global_rank_range_empty_and_single(spark):
    df = spark.createDataFrame([], "v int, id string")
    assert global_rank_range(df, [F.asc("v"), F.asc("id")]).count() == 0
    one = spark.createDataFrame([(5, "a")], "v int, id string")
    out = global_rank_range(one, [F.asc("v"), F.asc("id")]).collect()
    assert out[0]["rank"] == 1
