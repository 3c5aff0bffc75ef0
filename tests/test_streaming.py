"""Structured Streaming: the same transforms run as real streams.

Strategy: replay the sf0.001 events table as a file stream (multiple
micro-batches via maxFilesPerTrigger), run the windowed aggregation
with a watermark, and check the completed results equal the batch
run of the identical transform.
"""

import pytest
from pyspark.sql import functions as F

from onionnet_spark.sources.tpch_graph import load_tables
from onionnet_spark.streaming import events as ev


@pytest.fixture(scope="module")
def events_df(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"].persist()


def _run_stream_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark, events_df):
    stream = ev.stream_from_batch(spark, events_df, partitions=4)
    agg = ev.tumbling_counts(stream.withWatermark("ts", "1 hour"))
    got = _run_stream_to_memory(spark, agg, "t_tumbling")
    want = ev.tumbling_counts(events_df)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_sessionize_runs(spark, events_df):
    stream = ev.stream_from_batch(spark, events_df, partitions=2)
    sess = ev.streaming_sessionize(stream)
    q = (
        sess.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_events) FROM t_sessions").collect()[0][0]
    assert got == events_df.count()


def test_streaming_dedup_within_watermark(spark, events_df):
    dup = events_df.unionByName(events_df.limit(50))
    stream = ev.stream_from_batch(spark, dup, partitions=2)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) FROM t_dedup").collect()[0][0]
    assert n == events_df.count()


def test_stateful_user_stats_matches_batch(spark, events_df):
    # run the applyInPandasWithState op over a multi-micro-batch
    # replay; the LAST update per user must equal the batch totals.
    from onionnet_spark.streaming.events import (
        stateful_user_stats,
        stream_from_batch,
    )

    stream = stream_from_batch(spark, events_df, partitions=3)
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName("stateful_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_df = spark.sql(
        """SELECT user_id, n_events, sum_value FROM (
             SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n_events DESC) AS rn
             FROM stateful_stats) WHERE rn = 1"""
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in got_df.collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events_df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, events_df):
    # the canonical stream-stream join: each click joined to the
    # same user's purchases within the following 10 minutes, both
    # sides watermarked; completed result must equal the batch join
    clicks_b = events_df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purch_b = events_df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in clicks_b.join(purch_b, cond).collect()
    }

    clicks_s = (
        ev.stream_from_batch(spark, events_df, partitions=2)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purch_s = (
        ev.stream_from_batch(spark, events_df, partitions=2)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks_s.join(purch_s, cond)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT click_id, purchase_id FROM t_ssj").collect()
    }
    assert got == want and len(want) > 0


def test_streaming_heavy_hitters_exact_under_capacity(spark, events_df):
    # distinct users fit within capacity -> space-saving is exact:
    # the FINAL emission per event_type must equal the batch top-5
    from pyspark.sql import Window

    stream = ev.stream_from_batch(spark, events_df, partitions=3)
    q = (
        ev.streaming_heavy_hitters(stream, capacity=10_000, emit_k=5)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emission per key = rows whose est_count set matches the
    # final state; reconstruct by taking, per (event_type, rank), the
    # max est_count ever emitted (counts only grow)
    got_df = spark.sql(
        """SELECT event_type, user_id, est_count, rank FROM (
             SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type, rank ORDER BY est_count DESC) AS rn
             FROM t_hh) WHERE rn = 1"""
    )
    got = {
        (r["event_type"], r["rank"]): (r["user_id"], r["est_count"])
        for r in got_df.collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc()
    )
    want_df = (
        events_df.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    want = {
        (r["event_type"], r["rank"]): (r["user_id"], r["n"])
        for r in want_df.collect()
    }
    # counts must agree exactly; user choice may differ on count ties
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], (k, got[k], want[k])


def test_approx_distinct_within_rsd(spark, events_df):
    # the HLL scale path must stay within its advertised error bound
    # of the exact twin (3 sigma at rsd=0.05 -> 15%)
    exact = {
        r["day"]: r["n_users"]
        for r in ev.daily_distinct_users(events_df).collect()
    }
    approx = {
        r["day"]: r["n_users_approx"]
        for r in ev.daily_distinct_users_approx(events_df, rsd=0.05).collect()
    }
    assert exact.keys() == approx.keys()
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(3, 0.15 * n), (day, n, approx[day])


def test_streaming_graph_chaos_multibatch(spark, tmp_path):
    # out-of-order + cross-batch duplicate edges over MANY micro
    # batches must converge to exactly the one-shot batch build
    import random

    from onionnet_spark.builder import grow_onion
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.streaming.graph_stream import StreamingGraphMaintainer

    rng = random.Random(7)
    uniq = [
        ("L%d" % (i % 3), str(i), "L%d" % ((i + 1) % 3), str(i + 1), float(i % 10))
        for i in range(60)
    ]
    # duplicates of ~half the edges, identical props (so batch and
    # streaming dedup deterministically agree), shuffled out of order
    rows = uniq + [uniq[i] for i in range(0, 60, 2)]
    rng.shuffle(rows)
    schema = (
        "src_layer string, src_id string, dst_layer string, dst_id string, w double"
    )
    edges = spark.createDataFrame(rows, schema)

    def node_side(e):
        return (
            e.selectExpr("src_layer AS layer", "src_id AS node_id")
            .unionByName(e.selectExpr("dst_layer AS layer", "dst_id AS node_id"))
        )

    want = grow_onion(node_side(edges), edges, edge_prop_cols=["w"])

    base = OnionGraph(
        spark.createDataFrame([], "layer string, node_id string"),
        spark.createDataFrame([], schema),
    )
    m = StreamingGraphMaintainer(base)
    d = str(tmp_path / "chaos_edges")
    edges.repartition(6).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(edges.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = m.attach(stream, str(tmp_path / "chaos_ckpt"))
    q.awaitTermination(180)

    assert m.n_batches >= 4  # genuinely incremental
    got_nodes = {(r["layer"], r["node_id"]) for r in m.graph.nodes.collect()}
    want_nodes = {(r["layer"], r["node_id"]) for r in want.nodes.collect()}
    assert got_nodes == want_nodes
    got_edges = {
        (r["src_layer"], r["src_id"], r["dst_layer"], r["dst_id"], r["w"])
        for r in m.graph.edges.collect()
    }
    want_edges = {
        (r["src_layer"], r["src_id"], r["dst_layer"], r["dst_id"], r["w"])
        for r in want.edges.collect()
    }
    assert got_edges == want_edges
    assert len(got_edges) == 60  # all duplicates collapsed


def test_streaming_graph_maintenance(spark, tmp_path):
    # replay an edge stream in micro-batches; the maintained graph
    # must equal the single-shot batch build over the same edges.
    from onionnet_spark.builder import grow_onion
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.streaming.graph_stream import StreamingGraphMaintainer

    edges = spark.createDataFrame(
        [
            ("A", "1", "B", "2"),
            ("A", "1", "B", "3"),
            ("B", "2", "C", "4"),
            ("A", "1", "B", "2"),  # duplicate -> must stay deduped
            ("C", "4", "C", "5"),
        ],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    base = OnionGraph(
        spark.createDataFrame([("A", "1")], "layer string, node_id string"),
        spark.createDataFrame(
            [], "src_layer string, src_id string, dst_layer string, dst_id string"
        ),
    )
    m = StreamingGraphMaintainer(base)

    d = str(tmp_path / "edges")
    edges.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(edges.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert m.n_batches >= 2  # genuinely incremental
    want_nodes = {("A", "1"), ("B", "2"), ("B", "3"), ("C", "4"), ("C", "5")}
    got_nodes = {(r["layer"], r["node_id"]) for r in m.graph.nodes.collect()}
    assert got_nodes == want_nodes
    got_edges = {
        (r["src_layer"], r["src_id"], r["dst_layer"], r["dst_id"])
        for r in m.graph.edges.collect()
    }
    assert got_edges == {
        ("A", "1", "B", "2"),
        ("A", "1", "B", "3"),
        ("B", "2", "C", "4"),
        ("C", "4", "C", "5"),
    }


def test_streaming_dedup_matches_batch(spark, tmp_path):
    # replay the document corpus as a real file stream; the union of
    # per-batch emitted pairs must equal the one-shot batch LSH pairs
    from onionnet_spark.functions.dedup import minhash_lsh_pairs
    from onionnet_spark.streaming.dedup_stream import StreamingDedupMaintainer

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    batch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, salt_verify=0).collect()
    }
    assert batch  # the corpus must actually contain near-dups

    d = str(tmp_path / "docs")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    m = StreamingDedupMaintainer(spark, threshold=0.5)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert m.n_batches >= 3  # genuinely incremental
    streamed = {
        (r["id_a"], r["id_b"], r["jaccard"]) for r in m.pairs.collect()
    }
    assert streamed == batch
    # no pair is ever emitted twice
    assert m.pairs.count() == m.pairs.distinct().count()


def test_streaming_rollup_maintainer_matches_batch(spark, events_df, tmp_path):
    # replay the events table as a multi-batch file stream; the
    # maintained continuous aggregate must equal the one-shot batch
    # rollup exactly (monoid merge absorbs out-of-order batches)
    from onionnet_spark.streaming.rollup_stream import StreamingRollupMaintainer

    m = StreamingRollupMaintainer(spark)
    stream = ev.stream_from_batch(spark, events_df, partitions=5)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2  # genuinely incremental
    got = sorted(map(tuple, m.snapshot().collect()))
    want = sorted(map(tuple, ev.tumbling_counts(events_df).collect()))
    assert got == want


def test_transform_with_state_matches_batch(spark, events_df, tmp_path):
    # transformWithStateInPandas: the LAST emission per user over a
    # multi-batch replay must equal the batch aggregate (all
    # accumulators commutative -> arrival order irrelevant).
    # The TWS driver worker needs protobuf, absent in this
    # container — skip (not xfail: the operator itself is exercised
    # wherever the dependency exists).
    pytest.importorskip("google.protobuf.descriptor")
    from onionnet_spark.streaming.twstate import user_profile_stream

    stream = ev.stream_from_batch(spark, events_df, partitions=3)
    out = user_profile_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_twstate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import pyspark.sql.functions as F

    got = (
        spark.sql(
            """SELECT user_id, n_events, max_value, n_types FROM (
                 SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM t_twstate) WHERE rn = 1"""
        )
        .collect()
    )
    want = {
        r["user_id"]: r
        for r in events_df.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        w = want[r["user_id"]]
        assert (r["n_events"], r["n_types"]) == (w["n_events"], w["n_types"])
        assert abs(r["max_value"] - w["max_value"]) < 1e-9


def test_streaming_anomaly_detection_matches_batch(spark, events_df, tmp_path):
    # continuous aggregate (1-day buckets) + z-score snapshot ==
    # batch anomaly_days: streaming analytics composition
    from onionnet_spark.operators.timeseries import (
        anomaly_days,
        zscore_outlier_days,
    )
    from onionnet_spark.streaming.rollup_stream import StreamingRollupMaintainer

    m = StreamingRollupMaintainer(spark, window_len="1 day")
    stream = ev.stream_from_batch(spark, events_df, partitions=4)
    q = m.attach(stream, str(tmp_path / "ck"))
    q.awaitTermination(120)
    daily = m.rollup.select(
        F.col("window_start").alias("day"),
        F.col("event_type").alias("key"),
        F.col("n_events").alias("n"),
    )
    got = sorted(map(tuple, zscore_outlier_days(daily, 1.5).collect()))
    want = sorted(map(tuple, anomaly_days(events_df, z_threshold=1.5).collect()))
    assert got == want and len(got) > 0


def test_watermark_append_mode_semantics(spark, tmp_path):
    # append-mode tumbling agg with a 10-minute watermark over a
    # 2-batch file replay. Documents the REAL watermark contract
    # (verified on Spark 4.1): windows emit exactly once when the
    # watermark passes their end; unclosed windows never emit; and
    # the lateness guarantee is ONE-DIRECTIONAL — a beyond-watermark
    # straggler "may or may not be dropped" (SS guide): state
    # cleanup is guaranteed, strict drop is not (here the hour-9 row
    # arrives after the watermark passed its window yet still
    # aggregates, because no prior state existed to have been
    # evicted).
    import datetime
    import time

    d = str(tmp_path / "files")

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mod-times => deterministic order

    t = lambda h, m: datetime.datetime(2024, 3, 1, h, m)  # noqa: E731
    write_batch([(i, t(10, 15), 1, "view", 1.0, "{}") for i in range(3)]
                + [(9, t(12, 0), 1, "view", 1.0, "{}")])
    write_batch([(100, t(9, 30), 1, "view", 1.0, "{}"),   # late: dropped
                 (101, t(12, 30), 1, "view", 1.0, "{}")])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    agg = ev.tumbling_counts(stream.withWatermark("ts", "10 minutes"))
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["window_start"].hour: r["n_events"]
        for r in spark.sql("SELECT * FROM t_wm").collect()
    }
    assert rows.get(10) == 3      # closed by the watermark, emitted once
    assert 12 not in rows         # never closed: never emitted
    # the straggler may aggregate (fresh state) — both outcomes
    # conform; what is GUARANTEED is it can never double-emit
    assert rows.get(9) in (None, 1)


def test_stream_static_enrichment_matches_batch(spark, events_df, sf_dir, tmp_path):
    # stream-static join: the streaming side enriches against a
    # static dimension snapshot (planned as a broadcast per
    # micro-batch); result must equal the batch join
    cust = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = ev.stream_from_batch(spark, events_df, partitions=3)
    enriched = (
        stream.join(cust, on="user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sv"))
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_enrich").collect()))
    want = sorted(
        map(
            tuple,
            events_df.join(cust, on="user_id")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sv"))
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_streaming_ann_index_matches_batch(spark, tmp_path):
    # replay the embedding table as a multi-batch file stream; the
    # union of per-batch emitted pairs must equal the one-shot batch
    # cosine_near_dup_pairs result (same planes, same threshold)
    from onionnet_spark.functions.similarity import cosine_near_dup_pairs
    from onionnet_spark.streaming.ann_stream import StreamingAnnIndex

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    batch = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in cosine_near_dup_pairs(emb, threshold=0.4, n_planes=4).collect()
    }
    assert batch  # the corpus must actually contain near-dup vectors

    d = str(tmp_path / "emb")
    emb.repartition(4).write.mode("overwrite").parquet(d)
    m = StreamingAnnIndex(spark, threshold=0.4, n_planes=4)
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert m.n_batches >= 3  # genuinely incremental
    streamed = {
        (r["id_a"], r["id_b"], r["cosine"]) for r in m.pairs.collect()
    }
    assert streamed == batch
    # no pair is ever emitted twice
    assert m.pairs.count() == m.pairs.distinct().count()


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    # stream the TRAINING corpus in batches against a static test
    # set; the snapshot must equal the one-shot batch overlap metric
    from onionnet_spark.functions.dedup import contamination_overlap
    from onionnet_spark.streaming.decon_stream import StreamingDecontamination

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    test = docs.filter("doc_id < 40")
    train = docs.filter("doc_id >= 40")
    want = sorted(
        map(tuple, contamination_overlap(train, test, n=3).collect())
    )
    assert any(r[2] > 0 for r in want)  # some overlap actually exists

    d = str(tmp_path / "train")
    train.repartition(4).write.mode("overwrite").parquet(d)
    m = StreamingDecontamination(spark, test, n=3)
    stream = (
        spark.readStream.schema(train.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert m.n_batches >= 3
    got = sorted(map(tuple, m.snapshot().collect()))
    assert got == want


def test_streaming_chunk_dedup_matches_batch_for_ordered_split(spark):
    # id-ordered 3-batch replay must equal batch chunk_dedup exactly
    # (first-occurrence = min (doc_id, chunk_idx) agrees with arrival)
    from onionnet_spark.functions.dedup import chunk_dedup
    from onionnet_spark.streaming.chunk_stream import StreamingChunkDedupMaintainer

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    want = sorted(map(tuple, chunk_dedup(docs, chunk_words=5).collect()))
    m = StreamingChunkDedupMaintainer(spark, chunk_words=5)
    for lo, hi in [(0, 150), (150, 300), (300, 10**9)]:
        m.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    assert m.n_batches == 3
    got = sorted(map(tuple, m.stats.collect()))
    assert got == want
    # duplicates must actually occur, or the test is vacuous
    assert sum(t[2] for t in got) > 0


def test_streaming_image_dedup_matches_batch_for_ordered_split(spark):
    from onionnet_spark.functions import multimodal
    from onionnet_spark.streaming.image_stream import StreamingImageDedupMaintainer

    # payload per id from the synth generator, with FORCED duplicates:
    # ids 0..29 map to pattern id % 10, so every image has 3 copies
    ids = spark.range(30).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10).alias("pat")
    )
    payload = (
        multimodal.synth_png_payload(
            ids.select(F.col("pat").alias("doc_id")).distinct()
        )
        .withColumnRenamed("doc_id", "pat")
        .join(ids, on="pat")
        .select("doc_id", "payload")
    )
    payload = payload.localCheckpoint()

    # batch truth: first doc per dhash wins
    from pyspark.sql import Window

    hashed = multimodal.image_dhash(payload)
    w = Window.partitionBy("dhash")
    want = sorted(
        (r["doc_id"], r["dhash"], r["is_dup"], r["match_id"])
        for r in hashed.withColumn("first_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "dhash",
            (F.col("doc_id") != F.col("first_id")).alias("is_dup"),
            F.when(F.col("doc_id") != F.col("first_id"), F.col("first_id"))
            .alias("match_id"),
        )
        .collect()
    )

    m = StreamingImageDedupMaintainer(spark)
    for lo, hi in [(0, 10), (10, 20), (20, 99)]:
        m.process_batch(
            payload.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    assert m.n_batches == 3
    got = sorted(
        (r["doc_id"], r["dhash"], r["is_dup"], r["match_id"])
        for r in m.results.collect()
    )
    assert got == want
    # cross-batch duplicates must occur: ids 10..29 duplicate 0..9
    # (>= because tiny synth patterns can also collide perceptually
    # WITHIN the base batch — observed: 2 of the 10 share a dHash)
    assert sum(1 for t in got if t[2]) >= 20


def test_streaming_count_min_matches_batch(spark, events_df, tmp_path):
    # the CMS is a counter-wise monoid: a multi-batch replay's merged
    # sketch must reproduce batch count_min_topk EXACTLY (same
    # deterministic hashes, same estimates — not just same ranking)
    from onionnet_spark.functions.corpus import count_min_topk
    from onionnet_spark.streaming.cms_stream import StreamingCountMin

    m = StreamingCountMin(spark, key_col="event_type", depth=3, width=8)
    stream = ev.stream_from_batch(spark, events_df, partitions=4)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2  # genuinely incremental
    got = [tuple(r) for r in m.topk(10).collect()]
    want = [
        tuple(r)
        for r in count_min_topk(
            events_df, "event_type", depth=3, width=8, k=10
        ).collect()
    ]
    assert got == want
    for _key, est, exact in got:
        assert est >= exact


def test_streaming_cdc_maintainer_matches_batch(spark, tmp_path):
    # replay a changelog in micro-batches; the maintained snapshot
    # must equal the one-shot batch apply_cdc — including a delete
    # arriving in an EARLIER batch than a lower-seq update for the
    # same key (the tombstone case)
    from onionnet_spark.operators.timeseries import apply_cdc
    from onionnet_spark.streaming.cdc_stream import StreamingCdcMaintainer

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [(1, "x1", 10, "U"), (1, "x2", 20, "U"), (2, "d", 30, "D"),
         (21, "new", 5, "I"), (3, "late", 1, "U"), (2, "zombie", 15, "U"),
         (22, "i", 2, "I"), (22, "i", 9, "D")],
        ["k", "v", "seq", "op"],
    )
    m = StreamingCdcMaintainer(base, "k", "seq", "op")
    stream = ev.stream_from_batch(spark, changes, partitions=4)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2
    got = sorted(map(tuple, m.snapshot().collect()))
    want = sorted(map(tuple, apply_cdc(base, changes, "k", "seq").collect()))
    assert got == want
    # the zombie update (seq 15 < delete seq 30) must NOT resurrect k=2
    assert not any(k == 2 for k, _ in got)


def test_streaming_windowed_funnel_outer_join_matches_batch(spark, events_df):
    """Stream-stream LEFT OUTER interval join (the funnel 'did this
    view convert?' shape): completed output must equal the batch
    left join — including null-extended unconverted views, which the
    engine may emit only after the watermark passes."""
    from onionnet_spark.streaming.funnel_stream import windowed_funnel_pairs

    views_b = events_df.filter(F.col("event_type") == "view")
    purch_b = events_df.filter(F.col("event_type") == "purchase")
    want = {
        (r["view_id"], r["purchase_ts"])
        for r in windowed_funnel_pairs(views_b, purch_b).collect()
    }

    views_s = (
        ev.stream_from_batch(spark, events_df, partitions=2)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
    )
    purch_s = (
        ev.stream_from_batch(spark, events_df, partitions=2)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
    )
    q = (
        windowed_funnel_pairs(views_s, purch_s)
        .writeStream.format("memory")
        .queryName("t_funnel_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["view_id"], r["purchase_ts"])
        for r in spark.sql(
            "SELECT view_id, purchase_ts FROM t_funnel_outer"
        ).collect()
    }
    # bounded replay: the final watermark can leave the LAST views'
    # null-extension unemitted (no later event advances the clock);
    # every emitted row must be correct and the matched subset total
    matched_want = {t for t in want if t[1] is not None}
    matched_got = {t for t in got if t[1] is not None}
    assert matched_got == matched_want and len(matched_want) > 0
    # null-extended rows: everything emitted is a true non-converter
    null_got = {t[0] for t in got if t[1] is None}
    null_want = {t[0] for t in want if t[1] is None}
    assert null_got <= null_want
    assert got <= want


def test_streaming_ab_monitor_matches_batch(spark, events_df, sf_dir, tmp_path):
    # continuously maintained per-user conversion state -> the
    # snapshot readout must equal the one-shot batch events_ab_test
    # exactly (MAX merge is idempotent, so replay order and duplicate
    # deliveries cannot change the counts or the z-score)
    from onionnet_spark.queries.streaming_queries import events_ab_test
    from onionnet_spark.streaming.ab_stream import StreamingABMonitor

    m = StreamingABMonitor(spark)
    stream = ev.stream_from_batch(spark, events_df, partitions=5)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2  # genuinely incremental
    got = [tuple(r) for r in m.snapshot_readout().collect()]
    want = [
        tuple(r)
        for r in events_ab_test(spark, sf_dir).collect()
    ]
    assert got == want


def test_streaming_daily_stats_matches_batch_monitors(
    spark, events_df, sf_dir, tmp_path
):
    """Round-8 twins: the maintained day-count state, replayed as a
    multi-batch file stream, must serve dispersion and CUSUM
    snapshots identical to the batch operators (count state is a
    commutative monoid; snapshots share the exact expression
    trees)."""
    from onionnet_spark.queries.streaming_queries import (
        events_cusum_drift,
        events_poisson_dispersion,
    )
    from onionnet_spark.streaming.dispersion_stream import (
        StreamingDailyStatsMaintainer,
    )

    m = StreamingDailyStatsMaintainer(spark)
    stream = ev.stream_from_batch(spark, events_df, partitions=4)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2  # genuinely incremental
    sf = sf_dir
    got_d = sorted(map(tuple, m.dispersion_snapshot().collect()))
    want_d = sorted(map(tuple, events_poisson_dispersion(spark, sf).collect()))
    assert got_d == want_d
    got_c = sorted(map(tuple, m.cusum_snapshot().collect()))
    want_c = sorted(map(tuple, events_cusum_drift(spark, sf).collect()))
    assert got_c == want_c


def test_streaming_daily_stats_skips_replayed_batch(spark):
    """foreachBatch is at-least-once: redelivering a batch_id must be
    a no-op (ADVICE r8 item 4 — the count merge alone would
    double-count), while the next NEW batch_id still applies."""
    from onionnet_spark.streaming.dispersion_stream import (
        StreamingDailyStatsMaintainer,
    )

    m = StreamingDailyStatsMaintainer(spark)
    b0 = spark.createDataFrame(
        [("click", "2024-01-01 10:00:00"), ("click", "2024-01-01 11:00:00")],
        "event_type string, ts string",
    ).select("event_type", F.col("ts").cast("timestamp"))
    m.merge_batch(b0, batch_id=0)
    m.merge_batch(b0, batch_id=0)  # replayed epoch: must be skipped
    assert [tuple(r) for r in m.daily.collect()][0][2] == 2
    b1 = spark.createDataFrame(
        [("click", "2024-01-02 09:00:00")], "event_type string, ts string"
    ).select("event_type", F.col("ts").cast("timestamp"))
    m.merge_batch(b1, batch_id=1)
    assert m.daily.count() == 2 and m.n_batches == 2


def test_streaming_stage_latency_matches_batch(
    spark, events_df, sf_dir, tmp_path
):
    """Round-9 twin (VERDICT r8 item 7): the pruned per-(user, kind)
    timestamp state, replayed as a multi-batch file stream, must
    serve an events_stage_latency snapshot identical to the batch
    operator. The prune keeps only the min view plus clicks /
    purchases at or below the current stage answers — exact under
    ANY batch split because stage answers only decrease as earlier
    events merge in."""
    from onionnet_spark.queries.streaming_queries import events_stage_latency
    from onionnet_spark.streaming.latency_stream import (
        StreamingStageLatencyMaintainer,
    )

    m = StreamingStageLatencyMaintainer(spark)
    stream = ev.stream_from_batch(spark, events_df, partitions=4)
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert m.n_batches >= 2  # genuinely incremental
    got = sorted(map(tuple, m.latency_snapshot().collect()))
    want = sorted(map(tuple, events_stage_latency(spark, sf_dir).collect()))
    assert got == want
    # the prune must keep state tiny: at most the min view + a short
    # eligible prefix per (user, kind), never the raw event volume
    assert m.state.count() < events_df.count()


def test_streaming_stage_latency_reopened_click_exactness(spark):
    """Adversarial arrival: a LATE EARLIER view must re-open a click
    that an earlier batch made ineligible (the reason min-per-stage
    state alone is not a monoid)."""
    from onionnet_spark.streaming.latency_stream import (
        StreamingStageLatencyMaintainer,
    )

    def ev_df(rows):
        return spark.createDataFrame(
            [(int(u), k, t) for (u, k, t) in rows],
            "user_id long, event_type string, ts string",
        ).select("user_id", "event_type", F.col("ts").cast("timestamp"))

    m = StreamingStageLatencyMaintainer(spark)
    # batch 0: view at 10:00, click at 09:00 (ineligible), click 11:00
    m.merge_batch(
        ev_df(
            [
                (1, "view", "2024-01-01 10:00:00"),
                (1, "click", "2024-01-01 09:00:00"),
                (1, "click", "2024-01-01 11:00:00"),
            ]
        ),
        batch_id=0,
    )
    # batch 1: a LATE view at 08:00 — the 09:00 click becomes the
    # answer (latency 3600s), not the 11:00 one
    m.merge_batch(ev_df([(1, "view", "2024-01-01 08:00:00")]), batch_id=1)
    rows = {r["stage"]: r for r in m.latency_snapshot().collect()}
    assert rows["view_to_click"]["n_users"] == 1
    assert rows["view_to_click"]["max_sec"] == 3600
