"""One-shot timing sweep of every registry key NOT in bench.HEADLINE.

VERDICT r7 item 6: 119/354 keys are benched; a regression in an
un-benched operator is invisible round-over-round. This sweep runs
each un-benched key once at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints a sorted timing table so everything >= the cutoff (0.5s) can
be promoted into bench.py's HEADLINE list.

Usage: python tools/bench_sweep.py [--cutoff 0.5]
Writes /tmp/bench_sweep.json and prints the promotion list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from onionnet_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # argparse, not positional string-matching: '--cutoff 1' used to
    # compare tokens against str(1.0)=='1.0', leaking '1' into `only`
    # (ADVICE r8 item 3).
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cutoff", type=float, default=0.5)
    ap.add_argument("only", nargs="*", help="specific keys to sweep")
    ns = ap.parse_args()
    cutoff = ns.cutoff
    only = ns.only

    spark = get_spark("onionnet-bench-sweep")
    qs = entrymod.queries()
    benched = set(bench.HEADLINE)
    targets = only or [k for k in qs if k not in benched]

    # Same warm-up as bench.py so the first key isn't charged for
    # session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(targets):
        t0 = time.time()
        try:
            n = qs[name](spark, SF_DIR).count()
        except Exception as e:  # noqa: BLE001 - sweep must finish
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"# [{i+1}/{len(targets)}] {name}: ERROR {errors[name]}",
                  file=sys.stderr)
            continue
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        print(f"# [{i+1}/{len(targets)}] {name}: {dt:.2f}s rows={n}",
              file=sys.stderr)

    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    promote = [k for k, v in ranked if v >= cutoff]
    payload = {
        "sf_dir": SF_DIR,
        "cutoff": cutoff,
        "n_swept": len(timings),
        "total_sec": round(sum(timings.values()), 1),
        "promote": promote,
        "errors": errors,
        "timings": dict(ranked),
    }
    with open("/tmp/bench_sweep.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("n_swept", "total_sec", "cutoff", "promote", "errors")}))
    spark.stop()


if __name__ == "__main__":
    main()
