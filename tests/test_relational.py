"""Relational operators: as-of join semantics on a tiny known input."""

import datetime

import pytest
from pyspark.sql import functions as F

from onionnet_spark.operators.joins import asof_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "e1"),
         (1, ts("2024-01-01 12:00:00"), "e2"),
         (2, ts("2024-01-01 09:00:00"), "e3")],
        "user long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30:00"), 100),
         (1, ts("2024-01-01 11:00:00"), 200),
         (2, ts("2024-01-01 09:00:00"), 300)],  # equal ts -> matches (<=)
        "user long, ts timestamp, v int",
    )
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_value_cols=["v"], suffix="_r")
    got = {r["tag"]: r["v_r"] for r in out.collect()}
    assert got == {"e1": 100, "e2": 200, "e3": 300}


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 08:00:00"), "early")], "user long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1)], "user long, ts timestamp, v int"
    )
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_value_cols=["v"], suffix="_r").collect()
    assert out[0]["v_r"] is None


def test_fuzzy_join_blocked_semantics(spark):
    from onionnet_spark.operators.joins import fuzzy_self_pairs

    df = spark.createDataFrame(
        [
            (1, "Customer#001"),
            (2, "Customer#002"),   # dist 1 from #001, same block
            (3, "Customer#091"),   # dist 1 from #001? no: '09'!='00' prefix -> other block
            (4, "Xustomer#001"),   # dist 1 from #001 but BLOCKED away (prefix differs)
            (5, "Customer#002"),   # exact dup of 2
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in fuzzy_self_pairs(df, "name", "id", max_dist=1).collect()
    }
    # block strips the last 2 chars -> 'Customer#0' for ids 1,2,3,5.
    # kept: 1-2 (one digit edit), 1-3 (091 vs 001: one substitution),
    # 1-5 (same as 1-2), 2-5 (exact dup). 2-3 and 3-5 are dist 2.
    assert got == {(1, 2, 1), (1, 3, 1), (1, 5, 1), (2, 5, 0)}
    # the cross-prefix near-match is invisible to the block: recall
    # tradeoff is explicit
    assert not any(4 in (a, b) for a, b, _ in got)
