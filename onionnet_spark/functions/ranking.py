"""Document ranking: inverted-index term statistics and BM25.

The retrieval surface a training-data pipeline needs for corpus
exploration and query-driven subset selection: build the term
dictionary (df/cf/idf), then rank documents against a term list
with Okapi BM25. Everything is built-in Spark SQL expressions —
tokenize/explode/aggregate run inside whole-stage codegen; the only
shuffles are the (doc, term) reduction and the |terms|-row df
aggregate, which broadcasts back onto the scored side.

Determinism: scores are doubles derived from integer counts
(tf, df, dl, N, sum_dl) — identical in any engine; final scores are
rounded to 6 dp before ranking so summation order can't flip ties,
and ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onionnet_spark.functions.text import tokens_col


def term_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Inverted-index dictionary: per term, document frequency (df),
    collection frequency (cf), and BM25 idf
    ln((N - df + 0.5) / (df + 0.5) + 1).

    Two-phase: (doc, term) partial counts map-side, then one shuffle
    keyed on term. At 100 TB the term key is zipfian — AQE skew
    splitting handles the head terms, and min_df prunes the hapax
    tail before any join that consumes the dictionary.
    """
    pairs = (
        df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
        .select("id", F.explode("t").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = df.count()
    return (
        pairs.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
        )
        .filter(F.col("df") >= min_df)
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
                6,
            ),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag of query terms.

    score(d) = sum over matched terms of
      idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Plan shape: tokens filtered to the query terms BEFORE the
    (doc, term) reduction (the explode emits only matching terms, so
    shuffle volume is matches, not corpus tokens); df is a
    |query_terms|-row aggregate broadcast back; the global top-k is
    orderBy + limit, which Spark plans as TakeOrderedAndProject
    (per-partition heaps, no global sort). Docs matching no term are
    absent, as in any inverted-index engine.
    """
    terms = [t.lower() for t in query_terms]
    base = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    ).withColumn("dl", F.size("t"))
    g = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        base.select(
            "id",
            "dl",
            F.explode(F.filter("t", lambda x: x.isin(terms))).alias("term"),
        )
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(g))
        .groupBy("id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(k)
    )
    # unpartitioned Window is BOUNDED: `scored` is post-limit(k),
    # so the single-partition rank touches at most k rows
    w = Window.orderBy(F.col("bm25").desc(), F.col("id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "bm25", "rank"
    )


def tf_cosine_topk(
    df: DataFrame,
    k: int = 3,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse-vector document similarity search: for every document,
    its `k` most-similar other documents by cosine over raw
    term-frequency vectors, computed with an inverted-index self-join
    (documents meet only through shared terms — the sparse analogue
    of the dense ANN family in functions/similarity.py).

    Engine-exact: tf vectors are integers, so dot products and
    squared norms are exact whole sums in any order; the single
    double division + sqrt at the end is IEEE-identical everywhere,
    rounded to 6 dp before ranking (ties break on neighbor id).

    Scale shape: the join fans out per term as df(term)^2 — zipfian
    head terms are the skew path, and `max_df` drops them from BOTH
    the pairing and the norms (the stop-term cap every all-pairs
    similarity system applies: DIMSUM, prefix filtering). With the
    cap, candidate volume is bounded by max_df * |vocab above the
    cap|; output is always n_docs * k.
    """
    tf = (
        df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
        .select("id", F.explode("t").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    if max_df is not None:
        hot = (
            tf.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("term")
        )
        tf = tf.join(F.broadcast(hot), on="term", how="left_anti")
    # EAGER checkpoint: tf feeds three consumers (norms + both join
    # sides); a lazy checkpoint would replay the tokenize/cap subtree
    # per consumer (the 10x lesson from the symmetrized-edge cache)
    tf = tf.localCheckpoint()
    norms = tf.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    dots = (
        tf.alias("a")
        .join(tf.alias("b"), on="term")
        .filter(F.col("a.id") != F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("query_id"), F.col("b.id").alias("neighbor_id")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    scored = (
        dots.join(norms.select(F.col("id").alias("query_id"),
                               F.col("n2").alias("na")), on="query_id")
        .join(norms.select(F.col("id").alias("neighbor_id"),
                           F.col("n2").alias("nb")), on="neighbor_id")
        .withColumn(
            "cos",
            F.round(
                F.col("dot") / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def tfidf_doc_topk_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k TF-IDF terms — keyword extraction for
    corpus metadata enrichment (the document-driven cousin of the
    query-driven bm25_topk). idf = ln((N+1)/(df+1)) is
    integer-quantized (floor * 1e6) before the tf multiply, so
    scores are exact BIGINTs and the per-doc rank windows (bounded
    by each doc's distinct-term count) have no float ties. Returns
    (doc_id, rank, term, tf, tfidf 6dp).
    """
    from pyspark.sql import Window

    from onionnet_spark.functions.text import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = df.select(F.count("*").alias("n"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.log((F.col("n") + 1).cast("double") / (F.col("df_t") + 1))
            * 1_000_000
        )
        .cast("bigint")
        .alias("idf_q"),
    )
    scored = tf.join(idf, on="term").select(
        "id", "term", "tf", (F.col("tf") * F.col("idf_q")).alias("score_q")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_q").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int"),
            "term",
            F.col("tf").cast("bigint"),
            (F.col("score_q") / 1_000_000.0).alias("tfidf"),
        )
    )
