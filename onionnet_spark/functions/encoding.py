"""Dictionary encoding of categorical columns.

Reference parity: ``onionnet/core.py:71-111`` (_map_layer,
_map_node_id) and ``onionnet/utils.py:53-82``
(map_categorical_property) assign dense integer codes in first-seen
order through driver-side dicts; ``property_manager.py:179-257``
(decode_property_labels) maps codes back to strings.

First-seen order is meaningless (and non-deterministic) in a
distributed engine, so codes are assigned in SORTED value order —
deterministic across runs and cluster sizes. The dictionary table is
tiny by definition (it's a categorical) and is broadcast for both
encode and decode joins: zero shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """Dictionary table: DataFrame(value, code) with dense codes 0..n-1
    assigned in ascending value order (deterministic).

    NO single-task global sort: a bare Window.orderBy would funnel
    every distinct value through one task — harmless for a 7-layer
    dictionary, a one-core wall if a user points this at a
    high-cardinality column. Instead: range-partition the distinct
    values (partition i holds values < partition i+1), rank WITHIN
    each partition in parallel, and add per-partition offsets
    (a tiny P-row cumulative sum, broadcast back). The result is the
    exact global sorted rank, computed shuffle-parallel; output codes
    are identical to the single-task formulation at any partition
    count, because offsets come from actual partition sizes in range
    order, not from the (sampled, nondeterministic) boundaries.
    """
    d = (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .repartitionByRange(F.col("value"))
    )
    ranked = d.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_r", F.row_number().over(Window.partitionBy("_pid").orderBy("value")) - 1
    )
    offsets = (
        ranked.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .select(
            "_pid",
            (
                F.sum("_n").over(
                    # bounded: P partition-count rows, see docstring
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                )
            ).alias("_off"),
        )
        .fillna({"_off": 0})
    )
    return ranked.join(F.broadcast(offsets), on="_pid").select(
        "value", (F.col("_off") + F.col("_r")).cast("int").alias("code")
    )


def encode_dictionary(
    df: DataFrame, col: str, out_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Add ``out_col`` (default '<col>_code') via a broadcast dictionary
    join. Returns (encoded_df, dictionary_df)."""
    out_col = out_col or f"{col}_code"
    dictionary = build_dictionary(df, col)
    encoded = df.join(
        F.broadcast(dictionary.withColumnRenamed("value", col)), on=col, how="left"
    ).withColumnRenamed("code", out_col)
    return encoded, dictionary


def decode_dictionary(
    df: DataFrame,
    code_col: str,
    dictionary: DataFrame,
    out_col: str,
    unknown_label: str | None = "Unknown",
) -> DataFrame:
    """Inverse mapping: join codes back to values.

    Reference parity: decode_property_labels
    (property_manager.py:179-257) maps codes missing from the
    dictionary to the literal 'Unknown'; pass ``unknown_label=None``
    to keep NULLs instead."""
    out = df.join(
        F.broadcast(
            dictionary.select(
                F.col("code").alias(code_col), F.col("value").alias(out_col)
            )
        ),
        on=code_col,
        how="left",
    )
    if unknown_label is not None:
        out = out.withColumn(
            out_col,
            F.when(F.col(code_col).isNotNull() & F.col(out_col).isNull(),
                   F.lit(unknown_label)).otherwise(F.col(out_col)),
        )
    return out
