"""Property-style invariants (SURVEY §5c) with hypothesis.

Each property runs few examples (Spark round-trip per example is
expensive); the strategies are biased toward collisions (small
alphabets) so dedup/encoding actually exercise their grouping paths.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=12
)


@given(texts)
@settings(**SETTINGS)
def test_exact_dedup_partitions_ids(spark, ts):
    from onionnet_spark.functions.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
    )
    rows = exact_duplicates(df).collect()
    # every id appears exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(len(ts)))
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical_id"], []).append(r)
    for canon, members in by_canon.items():
        ids = [m["doc_id"] for m in members]
        # canonical is the min of its group and a member of it
        assert canon == min(ids)
        # group_size is consistent across the group
        assert {m["group_size"] for m in members} == {len(ids)}


@given(st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_encode_decode_roundtrip_identity(spark, vals):
    from onionnet_spark.functions.encoding import (
        decode_dictionary,
        encode_dictionary,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    encoded, dictionary = encode_dictionary(df, "v", out_col="code")
    decoded = decode_dictionary(encoded, "code", dictionary, "v_back")
    assert all(r["v"] == r["v_back"] for r in decoded.collect())
    # codes are dense 0..k-1 over the distinct values
    codes = sorted(r["code"] for r in dictionary.collect())
    assert codes == list(range(len(set(vals))))


@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_bfs_distance_is_true_min_hops(spark, edge_list):
    from onionnet_spark.core import OnionGraph
    from onionnet_spark.operators.traversal import bfs_distances

    nodes = spark.createDataFrame(
        [("L", str(i)) for i in range(8)], "layer string, node_id string"
    )
    edges = spark.createDataFrame(
        [("L", str(a), "L", str(b)) for a, b in edge_list] or [("L", "0", "L", "0")],
        "src_layer string, src_id string, dst_layer string, dst_id string",
    )
    got = {
        int(r["node_id"]): r["dist"]
        for r in bfs_distances(OnionGraph(nodes, edges), [("L", "0")]).collect()
    }
    # reference BFS in plain python
    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
    want, frontier, d = {0: 0}, {0}, 0
    while frontier:
        d += 1
        nxt = {v for u in frontier for v in adj.get(u, ()) if v not in want}
        for v in nxt:
            want[v] = d
        frontier = nxt
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=20),     # day offset
            st.sampled_from(["view", "click"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_scd2_tiles_timeline(spark, evs):
    import datetime

    from onionnet_spark.operators.timeseries import scd2_intervals

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=d), u, t, 1.0, "{}")
        for i, (u, d, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = scd2_intervals(df).collect()
    assert len(out) == len(rows)  # every update opens a version
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for _, versions in by_user.items():
        versions.sort(key=lambda r: (r["valid_from"], r["valid_to"] is None))
        # intervals chain with no gaps/overlaps; exactly one current
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.sampled_from(["view", "click"]),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_gapfill_dense_and_consistent(spark, evs):
    import datetime

    from onionnet_spark.operators.timeseries import gapfill_daily_locf

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=d), 1, t, 1.0, "{}")
        for i, (d, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = gapfill_daily_locf(df).collect()
    span_days = max(d for d, _ in evs) - min(d for d, _ in evs) + 1
    n_types = len({t for _, t in evs})
    # dense calendar: |span| x |keys| rows exactly
    assert len(out) == span_days * n_types
    # event totals survive the fill
    assert sum(r["n_events"] for r in out) == len(rows)
    # gap rows are exactly the zero-count rows
    assert all((r["n_events"] == 0) == (r["is_gap"] == 1) for r in out)
