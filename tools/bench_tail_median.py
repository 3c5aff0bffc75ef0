"""Cross-run per-key medians for the bench TAIL (single-shot keys).

The TAIL runs each key ONCE per bench, so any single artifact's tail
figure carries the box's full ambient variance (r10 calibration:
graph_ego_stats read 44.2s in one run and 6.2s in the next with no
code change). The only honest tail comparison is therefore the
per-key MEDIAN across several complete runs, which this tool prints,
plus the min (the least-polluted observation) and the spread ratio
(max/min — a large ratio means the key's figure is noise-dominated
and should not gate a regression call on its own).

Usage:
  python tools/bench_tail_median.py RUN1.json RUN2.json [RUN3.json ...]

Accepts the same formats as bench_compare.py (raw bench.py line or
the driver wrapper). Keys missing from some runs are reported over
the runs that have them.
"""

from __future__ import annotations

import statistics
import sys

from bench_compare import load  # same-format loader


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    runs = [load(p) for p in sys.argv[1:]]
    tails = [r.get("tail", {}) for r in runs]
    keys = sorted({k for t in tails for k in t})
    rows = []
    for k in keys:
        vals = [t[k] for t in tails if k in t]
        rows.append(
            (
                statistics.median(vals),
                min(vals),
                (max(vals) / min(vals)) if min(vals) > 0 else float("inf"),
                len(vals),
                k,
            )
        )
    rows.sort(reverse=True)
    print(f"{'median':>8} {'min':>8} {'spread':>7} {'n':>2}  key")
    for med, mn, spread, n, k in rows:
        flag = "  NOISY" if spread > 3 else ""
        print(f"{med:8.2f} {mn:8.2f} {spread:6.1f}x {n:2d}  {k}{flag}")
    med_total = sum(r[0] for r in rows)
    min_total = sum(r[1] for r in rows)
    print(f"\nmedian-total {med_total:.1f}s   min-total {min_total:.1f}s "
          f"over {len(rows)} keys / {len(runs)} runs")


if __name__ == "__main__":
    main()
