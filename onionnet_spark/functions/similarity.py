"""Similarity search over embedding columns (array<float>).

Two paths, matching SURVEY §2 #27-28:
  - brute-force cosine top-k: the exact baseline. All-pairs is
    O(n²) but each pair is a JVM-side `aggregate(zip_with(...))`
    dot product inside whole-stage codegen — no Python in the loop.
  - LSH-bucketed (random hyperplanes): the scale path. Hyperplane
    coefficients are derived deterministically from md5 hex (no RNG
    → reproducible across runs/engines); vectors only pair within a
    bucket, turning O(n²) into O(sum of bucket²).

Cosines are computed in double precision and rounded to 6 dp so
engine-order float differences cannot flip the comparison hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for every vector.

    Block-nested-loop with a broadcast candidate matrix: the
    candidate set (id, vector) is collected once, broadcast to every
    executor, and each Arrow batch of queries does one float64
    matrix multiply against it (mapInPandas — vectorized, zero
    per-row Python). This is the standard exact-kNN layout on Spark:
    at 100 TB you tile the candidate side into broadcastable blocks
    and union the per-block top-k; the single-block case is below.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k; ranks
    order by cosine ROUNDED to 6 dp with neighbor_id tie-break, so
    ordering is stable across engines and float summation orders.
    """
    import numpy as np

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat_norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat_norm)

    def score(batches):
        import pandas as pd

        cand_ids = b_ids.value
        cand = b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            cos = np.round(qn @ cand.T, 6)  # (batch, n_candidates)
            qids = pdf[id_col].values
            # Top-k selected HERE, inside the Arrow batch: only
            # batch*k rows leave the UDF, instead of batch*n pairs
            # flowing through a row_number() window shuffle.
            out_q, out_n, out_c, out_r = [], [], [], []
            for row_i, qid in enumerate(qids):
                c = cos[row_i]
                mask = cand_ids != qid
                c, nids = c[mask], cand_ids[mask]
                # order: cosine desc, neighbor_id asc (lexsort: last
                # key is primary) — matches the oracle's ROW_NUMBER.
                order = np.lexsort((nids, -c))[:k]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_n.append(nids[order])
                out_c.append(c[order])
                out_r.append(np.arange(1, len(order) + 1, dtype=np.int32))
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                        "rank": np.concatenate(out_r),
                    }
                )

    return df.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double, rank int"
    )


def _hyperplane_component(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random coefficient in [-1, 1): derived
    from the first 6 hex chars of md5('plane|dim')."""
    h = F.md5(F.concat_ws("|", F.lit(str(plane)), dim_idx.cast("string")))
    v = F.conv(F.substring(h, 1, 6), 16, 10).cast("double")
    return v / F.lit(float(16 ** 6 / 2)) - F.lit(1.0)


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same
    hyperplane-sign bucket. Recall < 1 by design; pair computation
    is bucket-local so cost is sum over buckets of |bucket|²."""
    from pyspark.sql import Window

    def coef_fn(plane: int):
        # NOTE: must be a factory returning a ONE-argument lambda.
        # PySpark infers the lambda arity from the Python signature,
        # so the `lambda i, _p=plane:` default-arg idiom silently
        # becomes an (element, index) lambda and `_p` gets bound to
        # the index Column — str(plane) then hashes a Column repr.
        return lambda i: _hyperplane_component(plane, i)

    def bucket_col(vec: Column) -> Column:
        b = F.lit(0).cast("bigint")
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1),
                        coef_fn(p),
                    ),
                    lambda x, r: x.cast("double") * r,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            b = b + F.when(proj > 0, F.lit(2 ** p).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        return b

    with_bucket = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", bucket_col(F.col("v"))).persist()
    pairs = (
        with_bucket.alias("a")
        .join(with_bucket.alias("b"), on="bucket")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    Candidates come from the hyperplane-LSH buckets (high-cosine
    pairs almost always agree on every plane sign), then the exact
    cosine filters them — the standard candidate-generate/verify
    split that keeps the pair space sub-quadratic at scale. Note the
    LSH stage makes this approximate-recall like every production
    embedding dedup: a near-dup pair split by a plane is missed.
    """
    def coef_fn(plane: int):
        return lambda i: _hyperplane_component(plane, i)

    def bucket_col(vec: Column) -> Column:
        b = F.lit(0).cast("bigint")
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1), coef_fn(p)
                    ),
                    lambda x, r: x.cast("double") * r,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            b = b + F.when(proj > 0, F.lit(2 ** p).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        return b

    with_bucket = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", bucket_col(F.col("v")))
    return (
        with_bucket.alias("a")
        .join(with_bucket.alias("b"), on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ann_ivf_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF-style approximate top-k: inverted-file partitioning by
    nearest centroid, search within the probe cell only (nprobe=1).

    The codebook here is deterministic — the vectors of the
    n_centroids smallest ids — so results are reproducible and
    oracle-checkable; a production build would k-means the codebook
    (same dataflow, different centroid table). Assignment is a
    broadcast cross-join against the K-row centroid table + one
    window argmax; search cost is sum of cell² instead of n².
    """
    from pyspark.sql import Window

    cents = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    scored = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cc", F.round(cosine(F.col("v"), F.col("cv")), 6))
    )
    w_assign = Window.partitionBy("id").orderBy(
        F.col("cc").desc(), F.col("cid").asc()
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("id", "v", F.col("cid").alias("bucket"))
        .persist()
    )
    pairs = (
        assigned.alias("a")
        .join(assigned.alias("b"), on="bucket")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
