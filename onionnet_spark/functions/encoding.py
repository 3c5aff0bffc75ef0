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
    assigned in ascending value order (deterministic)."""
    w = Window.orderBy(F.col("value").asc())
    return (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .select("value", (F.row_number().over(w) - 1).cast("int").alias("code"))
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
    df: DataFrame, code_col: str, dictionary: DataFrame, out_col: str
) -> DataFrame:
    """Inverse mapping: join codes back to values
    (reference decode_property_labels, property_manager.py:179-257).
    Unknown codes decode to NULL (reference uses 'Unknown')."""
    return df.join(
        F.broadcast(
            dictionary.select(
                F.col("code").alias(code_col), F.col("value").alias(out_col)
            )
        ),
        on=code_col,
        how="left",
    )
