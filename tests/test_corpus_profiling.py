"""Tests for stratified sampling, grouped percentiles, table
profiling, SCD2 intervals, and deterministic random walks."""

import datetime

import pyspark.sql.functions as F

from onionnet_spark.functions import corpus
from onionnet_spark.operators import timeseries


def test_stratified_sample_exact_counts_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.stratified_sample(docs, "source", 10)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(10, totals[src])
    ids = {r["doc_id"] for r in out.collect()}
    again = {r["doc_id"] for r in
             corpus.stratified_sample(docs.repartition(7), "source", 10).collect()}
    assert ids == again  # seedless lottery is partitioning-stable


def test_grouped_percentiles_known_values(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0)],
        "g string, v double",
    )
    out = {r["g"]: r for r in
           corpus.grouped_percentiles(df, "g", "v", [0.5]).collect()}
    assert out["a"]["p50"] == 50.5  # interpolated median of 1..100
    assert out["a"]["n"] == 100
    assert out["b"]["p50"] == 5.0


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a int, b string"
    )
    prof = {r["column"]: r for r in corpus.profile_table(df).collect()}
    assert prof["a"]["n_null"] == 1
    assert prof["a"]["n_distinct"] == 3
    assert prof["a"]["min_value"] == "1" and prof["a"]["max_value"] == "3"
    assert prof["b"]["n_null"] == 1
    assert prof["b"]["n_distinct"] == 2


def test_scd2_intervals_chain(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + datetime.timedelta(hours=1), 7, "click", 2.0, "{}"),
        (3, t0 + datetime.timedelta(hours=2), 7, "purchase", 3.0, "{}"),
        (4, t0, 8, "view", 9.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = timeseries.scd2_intervals(events).collect()
    u7 = sorted([r for r in out if r["user_id"] == 7],
                key=lambda r: r["valid_from"])
    # versions chain: each valid_to equals the next valid_from
    assert [r["event_type"] for r in u7] == ["view", "click", "purchase"]
    assert u7[0]["valid_to"] == u7[1]["valid_from"]
    assert u7[1]["valid_to"] == u7[2]["valid_from"]
    assert (u7[0]["is_current"], u7[2]["is_current"]) == (0, 1)
    u8 = [r for r in out if r["user_id"] == 8]
    assert len(u8) == 1 and u8[0]["is_current"] == 1


def test_random_walks_deterministic_and_edge_following(spark):
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.operators.walks import random_walks

    edges = spark.createDataFrame(
        [("L", s, "L", d, "t") for s, d in
         [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]],
        "src_layer string, src_id string, dst_layer string, dst_id string, "
        "etype string",
    )
    nodes = (
        edges.select(F.col("src_layer").alias("layer"),
                     F.col("src_id").alias("node_id"))
        .union(edges.select("dst_layer", "dst_id")).distinct()
    )
    g = OnionGraph(nodes, edges)
    out = random_walks(g, walk_len=5).collect()
    adj = {"L:a": {"L:b"}, "L:b": {"L:c", "L:a"}, "L:c": {"L:a"}}
    walks = {}
    for r in out:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    assert set(walks) == {"L:a", "L:b", "L:c"}
    for start, steps in walks.items():
        assert steps[0] == start
        assert len(steps) == 6  # no dead ends in this graph
        for t in range(1, 6):
            assert steps[t] in adj[steps[t - 1]]
    rerun = {(r["start"], r["step"], r["node"])
             for r in random_walks(g, walk_len=5).collect()}
    assert rerun == {(r["start"], r["step"], r["node"]) for r in out}


def test_numeric_histogram_buckets_cover_all_rows(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(100)], "v double"
    )
    out = sorted(
        (r["bucket"], r["n"], r["bucket_lo"], r["bucket_hi"])
        for r in corpus.numeric_histogram(df, "v", n_buckets=10).collect()
    )
    assert [b for b, *_ in out] == list(range(10))
    assert sum(n for _, n, *_ in out) == 100
    # max value folds into the top bucket
    assert out[-1][1] == 10


def test_column_correlations_known(spark):
    rows = [(float(i), 2.0 * i + 1.0, float(100 - i)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["r"] for r in
           corpus.column_correlations(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0      # perfectly linear
    assert out[("x", "z")] == -1.0     # perfectly anti-linear
    const = spark.createDataFrame([(1.0, 5.0)] * 4, "a double, b double")
    r = corpus.column_correlations(const, ["a", "b"]).collect()
    assert all(row["r"] is None for row in r)  # zero variance -> NULL


def test_numeric_histogram_explicit_bounds_exclude_outliers(spark):
    # ADVICE r2: values below lo used to get NEGATIVE bucket indices
    # and values above hi folded into the top bucket; both are now
    # excluded. hi itself still folds closed-right into the top bucket.
    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 9.99, 10, 15, 25, 39.9, 40, 40.01, 99]],
        "v double",
    )
    out = {r["bucket"]: r["n"]
           for r in corpus.numeric_histogram(
               df, "v", n_buckets=6, lo=10, hi=40).collect()}
    # kept: 10 (b0), 15 (b1), 25 (b3), 39.9 (b5), 40 (b5 closed-right)
    assert out == {0: 1, 1: 1, 3: 1, 5: 2}
    assert all(0 <= b < 6 for b in out)


def test_column_correlations_pairwise_null_deletion(spark):
    # ADVICE r2: a shared count(*) with NULL-skipping sums skewed r
    # for any column with NULLs. y is NULL on odd rows; the (x, y)
    # correlation must equal the correlation over even rows only —
    # which is exactly 1.0 here (y = 2x on even rows), while a
    # mismatched-n formula gives garbage.
    rows = [(float(i), 2.0 * i if i % 2 == 0 else None, float(3 * i))
            for i in range(40)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r["r"] for r in
           corpus.column_correlations(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("y", "z")] == 1.0   # both linear in i on even rows
    assert out[("x", "z")] == 1.0


def test_numeric_histogram_degenerate_range(spark):
    df = spark.createDataFrame([(5.0,)] * 7, "v double")
    out = corpus.numeric_histogram(df, "v", n_buckets=4).collect()
    assert len(out) == 1 and out[0]["bucket"] == 0 and out[0]["n"] == 7


def test_global_rank_matches_single_window(spark):
    from pyspark.sql import Window

    # values with heavy ties across bucket boundaries
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 3, 3, 8, 1, 3, 8, 5, 1, 9] * 20)],
        "id long, v double",
    )
    got = {r["id"]: r["rank"] for r in
           corpus.global_rank(df, "v", "id", n_buckets=4).collect()}
    w = Window.orderBy("v", "id")
    want = {r["id"]: r["rk"] for r in
            df.withColumn("rk", F.row_number().over(w)).collect()}
    assert got == want


def test_global_rank_plan_has_no_single_partition_window(spark):
    # the within-bucket window must be partitioned (no "moving all
    # data to a single partition" shape in the final plan)
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    out = corpus.global_rank(df, "v", "id", n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    # every Window over the data carries a partition spec; the only
    # unpartitioned window is over the 8-row bucket-size table
    assert got_plan_ok(plan)


def got_plan_ok(plan: str) -> bool:
    # main-data window must show partitionBy _bkt
    return "windowspecdefinition(_bkt" in plan or "_bkt" in plan


def test_column_correlations_single_column_is_empty(spark):
    from onionnet_spark.functions.corpus import column_correlations

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    assert column_correlations(df, ["x"]).count() == 0
    assert column_correlations(df, []).count() == 0
