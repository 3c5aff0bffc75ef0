"""Z-order (Morton-curve) data layout: multidimensional clustering
for parquet data skipping.

A range-partitioned, sorted write clusters ONE column; filters on a
second column then touch every file. Interleaving the quantized bits
of two columns into a single Morton key and sorting by THAT gives
every file a tight bounding box in BOTH dimensions, so parquet
footer min/max stats prune files/row-groups for 2-D box predicates
— the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything is integer arithmetic on quantized buckets (engine-exact,
DuckDB-replayable); the write path is repartitionByRange on the
z-key (a range shuffle whose sampled boundaries balance output
files) + sortWithinPartitions — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(v: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map v in [lo, hi] onto integer buckets [0, 2^bits): equi-width,
    top value folded into the last bucket, degenerate range -> 0."""
    n = 1 << bits
    width = (hi - lo) / n
    q = F.when(
        width > 0,
        F.least(
            F.lit(n - 1),
            F.greatest(F.lit(0), F.floor((v - lo) / width).cast("int")),
        ),
    ).otherwise(F.lit(0))
    return q


def _interleave(qx: Column, qy: Column, bits: int) -> Column:
    """Morton key: bit j of qx lands at position 2j+1, of qy at 2j.
    Built from shift/and/sum — pure integer ops inside codegen."""
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        z = z + F.shiftleft(
            F.shiftright(qx.cast("bigint"), j).bitwiseAND(F.lit(1)), 2 * j + 1
        )
        z = z + F.shiftleft(
            F.shiftright(qy.cast("bigint"), j).bitwiseAND(F.lit(1)), 2 * j
        )
    return z


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    key_col: str = "zval",
    bounds: "tuple[float, float, float, float] | None" = None,
) -> DataFrame:
    """Append the Morton z-key of (col_x, col_y), quantized to
    2^bits equi-width buckets over each column's observed min/max
    (one broadcast 1-row aggregate — the same job computes both
    bounds; no extra pass). A caller that already holds the bounds
    (lo_x, hi_x, lo_y, hi_y) passes them via ``bounds`` and the
    aggregate + broadcast build are skipped entirely (the quantizer
    then runs on literals — identical IEEE arithmetic)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if bounds is not None:
        lox, hix, loy, hiy = (F.lit(float(v)) for v in bounds)
        qx = _quantize(F.col(col_x).cast("double"), lox, hix, bits)
        qy = _quantize(F.col(col_y).cast("double"), loy, hiy, bits)
        return df.withColumn(key_col, _interleave(qx, qy, bits))
    bounds_df = df.agg(
        F.min(col_x).cast("double").alias("_lox"),
        F.max(col_x).cast("double").alias("_hix"),
        F.min(col_y).cast("double").alias("_loy"),
        F.max(col_y).cast("double").alias("_hiy"),
    )
    with_b = df.crossJoin(F.broadcast(bounds_df))
    qx = _quantize(
        F.col(col_x).cast("double"), F.col("_lox"), F.col("_hix"), bits
    )
    qy = _quantize(
        F.col(col_y).cast("double"), F.col("_loy"), F.col("_hiy"), bits
    )
    return with_b.withColumn(key_col, _interleave(qx, qy, bits)).drop(
        "_lox", "_hix", "_loy", "_hiy"
    )


def hilbert_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 8,
    key_col: str = "hval",
    bounds: "tuple[float, float, float, float] | None" = None,
) -> DataFrame:
    """Append the HILBERT-curve key of (col_x, col_y), quantized to
    2^bits equi-width buckets per column — the stronger sibling of
    `zorder_key`: the Hilbert curve has no long diagonal jumps, so
    file bounding boxes are tighter than Morton's for the same sort
    (this is why Iceberg/DataFusion expose both orders).

    The classic xy2d transform (rotate/flip per bit level) is
    unrolled here into `bits` rounds of pure integer column
    arithmetic — quotient/remainder bit tests and the branch-free
    quadrant form q = 3*rx + ry - 2*rx*ry — so the whole key stays
    inside whole-stage codegen and replays exactly in any engine
    (the oracle unrolls the identical rounds).
    """
    if not 1 <= bits <= 15:
        raise ValueError(f"bits must be in [1, 15], got {bits}")
    keep = df.columns
    if bounds is not None:
        # caller-supplied bounds: skip the aggregate + broadcast (see
        # zorder_key) — the quantizer runs on literals
        lox, hix, loy, hiy = (F.lit(float(v)) for v in bounds)
        cur = df.select(
            *keep,
            _quantize(F.col(col_x).cast("double"), lox, hix, bits)
            .cast("bigint")
            .alias("_hx"),
            _quantize(F.col(col_y).cast("double"), loy, hiy, bits)
            .cast("bigint")
            .alias("_hy"),
            F.lit(0).cast("bigint").alias("_hd"),
        )
    else:
        bounds_df = df.agg(
            F.min(col_x).cast("double").alias("_lox"),
            F.max(col_x).cast("double").alias("_hix"),
            F.min(col_y).cast("double").alias("_loy"),
            F.max(col_y).cast("double").alias("_hiy"),
        )
        cur = df.crossJoin(F.broadcast(bounds_df)).select(
            *keep,
            _quantize(
                F.col(col_x).cast("double"), F.col("_lox"), F.col("_hix"), bits
            )
            .cast("bigint")
            .alias("_hx"),
            _quantize(
                F.col(col_y).cast("double"), F.col("_loy"), F.col("_hiy"), bits
            )
            .cast("bigint")
            .alias("_hy"),
            F.lit(0).cast("bigint").alias("_hd"),
        )
    n_1 = F.lit((1 << bits) - 1).cast("bigint")
    for k in range(bits - 1, -1, -1):
        s = F.lit(1 << k).cast("bigint")
        x, y = F.col("_hx"), F.col("_hy")
        # s is a power of two, so the double division is exact and
        # floor gives the true quotient (values stay < 2^15); each
        # round is its OWN projection with rx/ry materialized first —
        # inlining x/y recursively would grow the expression tree
        # exponentially in `bits` (the first cut of this operator
        # OOM'd the analyzer exactly that way). The flip uses the
        # GRID-wide n-1 (the Wikipedia rot), keeping every
        # intermediate non-negative — an s-1 flip goes negative and
        # trips the floored-vs-truncated `%` divergence between
        # engines.
        cur = cur.select(
            "*",
            (F.floor(x / s).cast("bigint") % 2).alias("_rx"),
            (F.floor(y / s).cast("bigint") % 2).alias("_ry"),
        )
        rx, ry = F.col("_rx"), F.col("_ry")
        fx = rx * (n_1 - y) + (1 - rx) * y
        fy = rx * (n_1 - x) + (1 - rx) * x
        cur = cur.select(
            *keep,
            (ry * x + (1 - ry) * fx).alias("_hx"),
            (ry * y + (1 - ry) * fy).alias("_hy"),
            (F.col("_hd") + s * s * (3 * rx + ry - 2 * rx * ry)).alias("_hd"),
        )
    return cur.select(*keep, F.col("_hd").alias(key_col))


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write `df` as parquet clustered along the (col_x, col_y)
    Morton curve: range-partition on the z-key (sampled boundaries
    -> balanced files, no global sort) and sort within each
    partition, so every output file covers a compact curve segment
    and its footer min/max on BOTH columns is tight. Readers filter
    with ordinary predicates; pruning is free from the stats."""
    keyed = zorder_key(df, col_x, col_y, bits)
    (
        keyed.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows / target_rows_per_file) files — the maintenance job
    every long-lived table needs (streaming sinks and incremental
    appends shed thousands of KB-scale files; scans then pay a
    per-file open/footer cost that dwarfs the data read).

    Row-count-based sizing keeps the policy engine-portable; the
    rewrite is one round-robin repartition (or a range partition on
    `sort_col`, preserving clustering for stats pruning) and a
    single write. At 100 TB you run this per PARTITION DIRECTORY
    (date=.../) so each compaction touches one partition's files,
    not the table. Returns the number of files written.
    """
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
