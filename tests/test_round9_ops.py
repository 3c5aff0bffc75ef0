"""Round-9 additions: ann_pq_topk's _pqonly served-index side-table
(persist/reload parity + corrupt-store fallback — ADVICE r8 item 2:
the residual variant had these gates, the pq-only one didn't)."""

import pytest

from onionnet_spark.functions import similarity


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _result_set(df):
    return {tuple(r) for r in df.collect()}


def test_pqonly_codebooks_persist_and_reload(spark, embs):
    """A cold process must get bit-identical ann_pq_topk results from
    the persisted _pqonly codebook side-table: train+persist, evict
    the in-memory memo, re-run (forces the parquet load path),
    compare; and the no-cache training path must agree with both."""
    key = "test-r9-pq-persist-v1"
    fresh = _result_set(similarity.ann_pq_topk(embs, k=3, cache_key=None))
    trained = _result_set(similarity.ann_pq_topk(embs, k=3, cache_key=key))
    evicted = [k for k in similarity._PQ_TRAIN_CACHE if k[1] == key]
    assert evicted, "cache_key call did not populate the memo"
    for k in evicted:
        similarity._PQ_TRAIN_CACHE.pop(k)
    import hashlib
    import os

    sig = f"{key}|embedding|vec_id|4|8|2|pq_v1"
    fp = hashlib.md5(sig.encode()).hexdigest()[:16]
    root = similarity._codebook_store_dir(spark)
    assert os.path.isdir(os.path.join(root, f"{fp}_pqonly"))
    reloaded = _result_set(similarity.ann_pq_topk(embs, k=3, cache_key=key))
    assert trained == reloaded == fresh


def test_pqonly_corrupt_store_falls_back_to_training(spark, embs):
    """A torn/corrupt _pqonly side-table must retrain, not crash."""
    import hashlib
    import os

    key = "test-r9-pq-corrupt-v1"
    sig = f"{key}|embedding|vec_id|4|8|2|pq_v1"
    fp = hashlib.md5(sig.encode()).hexdigest()[:16]
    root = similarity._codebook_store_dir(spark)
    p = os.path.join(root, f"{fp}_pqonly")
    os.makedirs(p, exist_ok=True)
    open(os.path.join(p, "part-garbage.parquet"), "wb").write(b"xx")
    out = _result_set(similarity.ann_pq_topk(embs, k=3, cache_key=key))
    fresh = _result_set(similarity.ann_pq_topk(embs, k=3, cache_key=None))
    assert out == fresh
