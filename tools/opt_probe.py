"""Optimization-round probe: isolate queries with the noop sink.

Times each named registry key with `df.write.format("noop")` (eager
full-column materialization, guide §1.4) instead of bench.py's
`.count()` so the computation is measured without column-pruning
shortcuts. Reps are INTERLEAVED round-robin across the requested
keys (rep 0 of every key, then rep 1, ...) so ambient drift on this
box pollutes all keys equally rather than whichever ran last; use
an A/B pair of keys (or two worktrees) for change comparisons.

Usage:
  python tools/opt_probe.py [--reps 3] [--explain DIR] [--noop|--count] key...

--explain DIR additionally writes DIR/<key>.txt with
`.explain("formatted")` output (the plans/r10 evidence files).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from onionnet_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="DIR")
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench methodology) instead of noop")
    ap.add_argument("keys", nargs="+")
    ns = ap.parse_args()

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0
    print(f"# load_1min_start={load1} sf_dir={SF_DIR}", file=sys.stderr)

    spark = get_spark("onionnet-opt-probe")
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()

    if ns.explain:
        os.makedirs(ns.explain, exist_ok=True)
        for k in ns.keys:
            df = qs[k](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(ns.explain, f"{k}.txt"), "w") as f:
                f.write(txt)
            print(f"# wrote {ns.explain}/{k}.txt", file=sys.stderr)

    times: dict[str, list[float]] = {k: [] for k in ns.keys}
    for rep in range(ns.reps):
        for k in ns.keys:
            spark.sparkContext.setJobDescription(f"probe:{k}#rep{rep}")
            t0 = time.time()
            df = qs[k](spark, SF_DIR)
            if ns.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[k].append(round(dt, 3))
            print(f"# rep{rep} {k}: {dt:.2f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    out = {}
    for k, ts in times.items():
        out[k] = {
            "reps": ts,
            "min": min(ts),
            "median": statistics.median(ts),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
