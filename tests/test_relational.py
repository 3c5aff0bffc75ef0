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
