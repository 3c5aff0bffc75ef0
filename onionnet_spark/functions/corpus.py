"""Corpus composition operators: per-source caps, deterministic
sampling, and sequence packing — the selection / layout steps a
training-data pipeline runs AFTER dedup + quality scoring.

All decisions are pure functions of md5 over stable keys (no RNG, no
row order dependence), so every operator is exactly reproducible
across engines and cluster sizes, and each query has a full DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_source(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `cap` documents per source (domain), selected by
    a deterministic md5 lottery — the standard anti-boilerplate /
    domain-balance step (C4 and RefinedWeb cap per-domain pages so
    one crawler-friendly site can't dominate the mix).

    Rank = row_number over (source, ORDER BY md5(id), id): an
    unbiased, seedless shuffle within each source. The window
    partitions by source, so the single shuffle keys on source;
    a pathologically hot source is still one partition's sort —
    at 100 TB cap hot sources in two phases (per-salt prefilter to
    ~cap rows, then exact rank) before the global pass.

    Returns (id, source, sel_rank) for the kept rows.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(source_col), h.alias("h"))
        .withColumn("sel_rank", F.row_number().over(w))
        .filter(F.col("sel_rank") <= cap)
        .select(id_col, source_col, "sel_rank")
    )


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic corpus subsample: keep a row iff the first 8 hex
    chars of md5(id) fall below fraction * 16^8. Unlike
    DataFrame.sample this is seed-free, stable under repartitioning,
    and reproducible in any engine with md5 — the property that
    matters when a sample must be recomputable months later.

    Pure map-side filter (no shuffle); the filter rate concentrates
    around `fraction` with binomial deviation.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = format(int(fraction * 16**8), "08x")
    return df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < thr
    )


def pack_sequences(
    df: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    id order into a single token stream and cut into fixed
    `context_len` windows (the GPT-style pretraining layout; docs may
    straddle window boundaries). Returns, per document, its place in
    the packed stream:

      (id, n_tokens, start_offset, first_seq, last_seq)

    with first_seq = floor(start/L), last_seq = floor((start+n-1)/L).

    The global prefix sum is computed in TWO PHASES so no single task
    ever sees the whole corpus: range-partition by id and cumsum
    within each partition, then collect only the P per-partition
    totals (P rows — driver-trivial), broadcast the exclusive
    partition offsets back, and add. This is the textbook
    distributed scan; a bare Window.orderBy(id) would move 100 TB
    through one reducer.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    toks = df.select(F.col(id_col).alias("id"), n_tok.alias("n_tokens"))
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = (
        toks.repartitionByRange(nparts, "id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # P per-partition totals -> exclusive running offsets (tiny).
    totals = {
        r["pid"]: r["tot"]
        for r in part.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets, running = [], 0
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += totals[pid]
    off_df = spark.createDataFrame(offsets, "pid int, part_offset bigint")
    w = Window.partitionBy("pid").orderBy("id")
    return (
        part.join(F.broadcast(off_df), on="pid")
        .withColumn(
            "start_offset",
            F.col("part_offset")
            + F.sum("n_tokens").over(w)
            - F.col("n_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("start_offset").cast("bigint").alias("start_offset"),
            F.floor(F.col("start_offset") / context_len).alias("first_seq"),
            F.floor(
                (F.col("start_offset") + F.col("n_tokens") - 1) / context_len
            ).alias("last_seq"),
        )
    )
