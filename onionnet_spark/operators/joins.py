"""As-of join: for each left row, the latest right row at or before
its timestamp, per key.

Spark has no built-in as-of join; the naive formulation (range join
+ row_number) explodes to |L|x|R_key| intermediate rows. The
scale-correct pattern is the union-merge: union both sides tagged,
sort within key by (ts, side) — right rows before left rows at
equal ts gives <= semantics — and carry the right side's values
forward with last(..., ignorenulls=True). One shuffle on the key,
zero fan-out, O(n log n) within partitions; AQE handles hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join (backward): latest right row with
    right_ts <= left_ts per `on` key.

    Output: all left columns + right_value_cols renamed with suffix
    + right_ts as f'{right_ts}{suffix}'. Right side should be unique
    per (on, right_ts) for deterministic results (pre-aggregate it).
    """
    left_cols = left.columns
    carry = [c for c in left_cols if c not in on and c != left_ts]
    out_right = [f"{c}{suffix}" for c in right_value_cols] + [f"{right_ts}{suffix}"]

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in carry],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (_side=0) sort before left rows at equal _ts -> '<=' semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *on,
        "_ts",
        "_side",
        *[F.col(c) for c in carry],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_right],
    )
    return filled.filter(F.col("_side") == 1).drop("_side").withColumnRenamed(
        "_ts", left_ts
    )
