"""Registry invariants: duplicate-key guard and driver-window rotation.

The driver records correctness for only the first 50 registered
queries per round, so load_all()'s ordering IS the evidence plan;
and round 2 shipped a silently-overwritten duplicate registration
(graph_pagerank_weighted), which the guard now makes impossible.
"""

import json
import os

import pytest

from onionnet_spark import queries as q


def test_duplicate_registration_raises():
    reg = q._Registry()
    fn_a = lambda spark, sf: None  # noqa: E731
    fn_b = lambda spark, sf: None  # noqa: E731
    reg["k"] = (fn_a, None)
    with pytest.raises(ValueError, match="duplicate query registration"):
        reg["k"] = (fn_b, "SELECT 1")


def test_oracle_attachment_to_same_fn_allowed():
    reg = q._Registry()
    fn = lambda spark, sf: None  # noqa: E731
    reg["k"] = (fn, None)
    reg["k"] = (fn, "SELECT 1")  # the two-step generated-oracle pattern
    assert reg["k"][1] == "SELECT 1"


def test_load_all_is_registry_superset_and_ordered():
    reg = q.load_all()
    assert set(reg) == set(q.REGISTRY)
    # round-4 priority: backlog keys (born after r3's window filled)
    # and round-4 additions register first, so the driver finally
    # records them; everything already green in r01-r03 rotates behind
    present_priority = [
        k for k in q._R4_BACKLOG + q._R4_NEW if k in reg
    ]
    assert list(reg)[: len(present_priority)] == present_priority


def test_r4_window_covers_never_checked_keys():
    """Evidence-plan invariants (VERDICT r3 next-round item 1): every
    driver-window slot is spent on a key with NO recorded CORRECTNESS
    row in r01-r03 (none wasted on re-checking), until the
    never-checked pool is exhausted — nothing falls through
    silently."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
    ):
        path = os.path.join(root, fname)
        if os.path.exists(path):
            checked |= set(json.load(open(path)))
    reg = q.load_all()
    never = {k for k in reg if k not in checked}
    first = list(reg)[: min(50, len(never))]
    wasted = [k for k in first if k not in never]
    assert not wasted, f"window slots spent on already-checked keys: {wasted}"
    # keys past the 50-slot window are structural once the round's
    # window fills; each one must be EXPLICITLY queued for the next
    # round's rotation (the _R4_BACKLOG pattern) — nothing falls
    # through silently
    overflow = [k for k in never if k not in set(first)]
    queued = set(q._R5_BACKLOG) | set(q._R6_BACKLOG)
    unqueued = [k for k in overflow if k not in queued]
    assert not unqueued, (
        f"never-checked keys neither in the window nor queued in "
        f"_R5_BACKLOG/_R6_BACKLOG: {unqueued}"
    )


def test_every_oracle_parses_and_binds_in_duckdb():
    """EXPLAIN every oracle against the real table schemas: catches
    SQL typos, unbound columns, and dialect slips in one pass
    without executing anything expensive."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for name, (_fn, sql) in q.load_all().items():
        if sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad
