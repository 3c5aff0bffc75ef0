"""Property-based cross-checks: Spark operators vs tiny pure-Python
reference implementations on hypothesis-generated inputs — a third
verification axis next to the DuckDB oracles (independent SQL) and
the example-based tests (hand-computed expectations).

Each strategy generates SMALL inputs (Spark job latency dominates),
with max_examples tuned so the whole module stays under a minute.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

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


# --------------------------------------------------------- rolling features

ts_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # user
        st.integers(min_value=0, max_value=20 * 86400),  # epoch offset
        st.integers(min_value=-5000, max_value=5000),  # value millis
    ),
    min_size=1,
    max_size=20,
)


@SET
@given(ts_events)
def test_rolling_features_matches_python(spark, rows):
    from onionnet_spark.operators.timeseries import rolling_features

    base = 1_700_000_000
    data = [
        (i, base + off, u, v / 1000.0) for i, (u, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(i, u, float(e), val) for (i, e, u, val) in data],
        "event_id long, user_id long, ts double, value double",
    ).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    got = {
        r["event_id"]: (r["gap_s"], r["cnt_w"], r["sum_w"])
        for r in rolling_features(df).collect()
    }
    W = 7 * 86400
    for eid, epoch, user, val in data:
        mine = [(e2, i2) for (i2, e2, u2, _) in data if u2 == user]
        prev = [e2 for (e2, i2) in mine if (e2, i2) < (epoch, eid)]
        gap = epoch - max(prev) if prev else None
        in_w = [
            (i2, v2)
            for (i2, e2, u2, v2) in data
            if u2 == user and epoch - W <= e2 <= epoch
        ]
        cnt = len(in_w)
        sw = round(sum(int(v2 * 1e6 // 1) for _, v2 in in_w) / 1e6, 6)
        g_gap, g_cnt, g_sum = got[eid]
        assert g_gap == gap and g_cnt == cnt
        assert abs(g_sum - sw) < 2e-6


# --------------------------------------------------------- c4 line filter

doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab .!?\"\n")), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=4,
)


@SET
@given(doc_texts)
def test_c4_line_filter_matches_python(spark, texts):
    import hashlib
    import re

    from onionnet_spark.functions.text import c4_line_filter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    for i, t in enumerate(texts):
        lines = [ln.strip() for ln in t.split("\n")]
        lines = [ln for ln in lines if ln]
        if not lines:
            assert i not in got
            continue
        keep = [
            ln
            for ln in lines
            if re.search(r'[.!?"]$', ln) and len(re.split(r"\s+", ln)) >= 3
        ]
        clean = "\n".join(keep)
        r = got[i]
        assert r["n_kept"] == len(keep)
        assert r["n_dropped"] == len(lines) - len(keep)
        assert r["clean_len"] == len(clean)
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.integers(min_value=1, max_value=4),
            st.binary(max_size=24),
        ),
        max_size=5,
    ),
    st.binary(max_size=16),
)
def test_split_png_stream_roundtrip(pngs, trailing):
    """Any concatenation of valid PNGs — each with arbitrary bytes
    (including the 8-byte signature) planted inside its IDAT — must
    split back into exactly the original frames; arbitrary trailing
    garbage is dropped, never misattributed."""
    import struct
    import zlib

    from onionnet_spark.functions.multimodal import _split_png_stream

    sig = b"\x89PNG\r\n\x1a\n"

    def mk(w, h, extra):
        def chunk(ctype, data):
            c = struct.pack(">I", len(data)) + ctype + data
            return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
        return (
            sig
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw) + extra)
            + chunk(b"IEND", b"")
        )

    frames = [mk(w, h, sig + extra) for w, h, extra in pngs]
    stream = b"".join(frames)
    if not trailing.startswith(sig):
        stream += trailing  # garbage tail: must be dropped
    assert _split_png_stream(stream) == frames


@SET
@given(
    st.lists(
        st.floats(
            min_value=-2.0, max_value=2.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=32,
    )
)
def test_np_round_half_away_matches_decimal(xs):
    """The numpy kernel rounding must equal decimal ROUND_HALF_UP at
    6 places for every representable input (the SQL ROUND contract)."""
    import decimal

    import numpy as np

    from onionnet_spark.functions.similarity import _np_round_half_away

    got = _np_round_half_away(np.array(xs, dtype=np.float64), 6)
    for x, g in zip(xs, got.tolist()):
        want = float(
            decimal.Decimal(repr(x * 1e6))
            .to_integral_value(rounding=decimal.ROUND_HALF_UP)
        ) / 1e6
        assert g == want, (x, g, want)


@SET
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    flavor=st.sampled_from(["random", "flat", "gradient", "sparse"]),
)
def test_qoi_roundtrip_lossless(h, w, ch, seed, flavor):
    """QOI is lossless for EVERY uint8 image: decode(encode(x)) == x
    across random noise (RGB verbatim ops), flat fields (max-length
    runs), gradients (DIFF/LUMA deltas incl. mod-256 wraparound) and
    sparse palettes (INDEX cache hits), both 3- and 4-channel."""
    import numpy as np

    from onionnet_spark.functions.qoi import decode_qoi, encode_qoi

    rng = np.random.RandomState(seed)
    if flavor == "random":
        img = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    elif flavor == "flat":
        img = np.full((h, w, ch), rng.randint(0, 256), np.uint8)
    elif flavor == "gradient":
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        k = np.arange(ch)[None, None, :]
        img = ((r * rng.randint(1, 5) + c + k * 7) % 256).astype(np.uint8)
    else:  # sparse palette: few colors, many cache hits
        palette = rng.randint(0, 256, (4, ch), dtype=np.uint8)
        idx = rng.randint(0, 4, (h, w))
        img = palette[idx]
    out = decode_qoi(encode_qoi(img))
    assert out.shape == img.shape
    assert (out == img).all()
