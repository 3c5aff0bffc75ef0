"""Property-based cross-checks: Spark operators vs tiny pure-Python
reference implementations on hypothesis-generated inputs — a third
verification axis next to the DuckDB oracles (independent SQL) and
the example-based tests (hand-computed expectations).

Each strategy generates SMALL inputs (Spark job latency dominates),
with max_examples tuned so the whole module stays under a minute.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

node_ids = st.integers(min_value=0, max_value=11)
edge_lists = st.lists(
    st.tuples(node_ids, node_ids), min_size=0, max_size=24, unique=True
)


def _graph_of(spark, edges):
    from onionnet_spark.core import OnionGraph

    nodes = sorted({u for e in edges for u in e} | {0})
    ndf = spark.createDataFrame(
        [("l", str(n)) for n in nodes], "layer string, node_id string"
    )
    edf = spark.createDataFrame(
        [("l", str(u), "l", str(v)) for (u, v) in edges] or [("l", "0", "l", "0")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    if not edges:
        edf = edf.limit(0)
    return OnionGraph(ndf, edf), nodes


def _union_find_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return {frozenset(g) for g in groups.values()}


@given(edge_lists)
@SET
def test_connected_components_matches_union_find(spark, edges):
    from onionnet_spark.operators.components import connected_components

    g, nodes = _graph_of(spark, edges)
    got_rows = connected_components(g).collect()
    groups = {}
    for r in got_rows:
        groups.setdefault(r["component"], set()).add(int(r["node_id"]))
    assert {frozenset(v) for v in groups.values()} == _union_find_components(
        nodes, edges
    )


def _naive_k_core(nodes, edges, k):
    und = {frozenset((u, v)) for (u, v) in edges if u != v}
    alive = set(nodes)
    while True:
        deg = {n: 0 for n in alive}
        for e in und:
            a, b = tuple(e)
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {n for n in alive if deg[n] < k}
        if not drop:
            return {n: d for n, d in deg.items() if d >= k or (k == 0)}
        alive -= drop


@given(edge_lists, st.integers(min_value=1, max_value=4))
@SET
def test_k_core_matches_naive_peel(spark, edges, k):
    from onionnet_spark.operators.analytics import k_core

    g, nodes = _graph_of(spark, edges)
    got = {
        int(r["node_id"]): r["core_degree"] for r in k_core(g, k=k).collect()
    }
    want = _naive_k_core(nodes, edges, k)
    # naive returns remaining degree for members of the k-core
    want = {n: d for n, d in want.items() if d >= k}
    assert got == want


def _naive_triangles(edges):
    und = {frozenset((u, v)) for (u, v) in edges if u != v}
    adj = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    ns = sorted(adj)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if b not in adj[a]:
                continue
            for c in ns:
                if c > b and c in adj[a] and c in adj[b]:
                    count += 1
    return count


@given(edge_lists)
@SET
def test_triangle_count_matches_naive(spark, edges):
    from onionnet_spark.operators.analytics import triangle_count

    g, _ = _graph_of(spark, edges)
    assert triangle_count(g).collect()[0][0] == _naive_triangles(edges)


texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=10
)


@given(texts)
@SET
def test_exact_dedup_matches_dict_grouping(spark, docs):
    import re

    from onionnet_spark.functions.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_duplicates(df).collect()}
    by_text = {}
    for i, t in enumerate(docs):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        by_text.setdefault(norm, []).append(i)
    want = {}
    for ids in by_text.values():
        for i in ids:
            want[i] = (min(ids), len(ids))
    assert got == want


doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=40), min_size=1, max_size=10
)


@given(docs=doc_texts, w=st.integers(min_value=1, max_value=4))
@SET
def test_chunk_dedup_matches_serial_reference(spark, docs, w):
    import re

    from onionnet_spark.functions.dedup import chunk_dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["n_tokens_kept"])
        for r in chunk_dedup(df, chunk_words=w).collect()
    }

    seen: set[str] = set()
    want = {}
    for i, t in enumerate(docs):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        chunks = [toks[j : j + w] for j in range(0, len(toks), w)]
        dup = kept = 0
        for c in chunks:
            key = " ".join(c)
            if key in seen:
                dup += 1
            else:
                seen.add(key)
                kept += len(c)
        want[i] = (len(chunks), dup, kept)
    assert got == want


@given(
    n_docs=st.integers(min_value=1, max_value=25),
    n_shards=st.integers(min_value=1, max_value=7),
)
@SET
def test_shuffle_shards_is_a_balanced_permutation(spark, n_docs, n_shards):
    from pyspark.sql import functions as F

    from onionnet_spark.functions.corpus import shuffle_shards

    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(df, n_shards=n_shards, seed="p").collect()
    assert len(out) == n_docs
    # (shard, pos) pairs form exactly the round-robin deal of 0..n-1
    dealt = sorted((r["shard"], r["pos_in_shard"]) for r in out)
    assert dealt == sorted((p % n_shards, p // n_shards) for p in range(n_docs))


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    ),
    bits=st.integers(min_value=1, max_value=6),
)
@SET
def test_zorder_key_bounds_and_quadrant_order(spark, vals, bits):
    from onionnet_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(vals)],
        "id long, x double, y double",
    )
    rows = zorder_key(df, "x", "y", bits=bits).collect()
    zmax = 1 << (2 * bits)
    assert all(0 <= r["zval"] < zmax for r in rows)
    # the min-corner point always gets z = 0, the max corner the max
    # occupied cell's key; and z is monotone under quadrant
    # refinement: points in the low-low half-plane of both dims sort
    # before the high-high corner point
    xs = [x for x, _ in vals]
    ys = [y for _, y in vals]
    by_id = {r["id"]: r["zval"] for r in rows}
    i_min = next(
        i for i, (x, y) in enumerate(vals) if x == min(xs) and y == min(ys)
    ) if any(x == min(xs) and y == min(ys) for x, y in vals) else None
    if i_min is not None:
        assert by_id[i_min] == 0
