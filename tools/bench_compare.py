"""Diff two bench JSON files: per-query deltas, sorted by change.

Usage: python tools/bench_compare.py BENCH_r02.json BENCH_r03.json
Accepts either the driver's wrapper format ({"tail": ..., nested
JSON line}) or bench.py's raw one-line JSON.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper: the bench line is embedded in "tail"
    for line in d.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                inner = json.loads(line)
                if "queries" in inner:
                    return inner
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no bench queries found")


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    if len(argv) != 2:
        raise SystemExit(__doc__)
    a, b = load(argv[0]), load(argv[1])
    # Ambient-load gate (VERDICT r8 item 5): a ratio against a
    # load-polluted artifact is noise, not a regression signal.
    for path, d in ((argv[0], a), (argv[1], b)):
        if d.get("ambient") and not force:
            raise SystemExit(
                f"{path}: stamped ambient=true (1-min load "
                f"{d.get('load_1min_start')} at start) — refusing to "
                "ratio-compare a load-polluted run; pass --force to "
                "override"
            )
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(set(qa) | set(qb)):
        va, vb = qa.get(k), qb.get(k)
        if va is None or vb is None:
            rows.append((float("inf"), k, va, vb, None))
        else:
            rows.append((vb / va if va else float("inf"), k, va, vb, vb - va))
    rows.sort(key=lambda r: -(r[0] if r[0] != float("inf") else 1e9))
    print(f"{'query':32} {'old':>8} {'new':>8} {'ratio':>7}")
    for ratio, k, va, vb, _ in rows:
        if va is None:
            print(f"{k:32} {'—':>8} {vb:8.2f}   (new)")
        elif vb is None:
            print(f"{k:32} {va:8.2f} {'—':>8}   (removed)")
        else:
            print(f"{k:32} {va:8.2f} {vb:8.2f} {ratio:6.2f}x")
    ta = sum(v for v in qa.values())
    tb = sum(v for v in qb.values())
    both = set(qa) & set(qb)
    ca = sum(qa[k] for k in both)
    cb = sum(qb[k] for k in both)
    print(f"\ntotals: {ta:.1f}s -> {tb:.1f}s; comparable subset "
          f"({len(both)} queries): {ca:.1f}s -> {cb:.1f}s "
          f"({cb / ca if ca else 0:.2f}x)")


if __name__ == "__main__":
    main()
