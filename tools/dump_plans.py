"""Dump `.explain("formatted")` for registry keys without executing.

Usage: python tools/dump_plans.py OUTDIR SUFFIX key...
Writes OUTDIR/<key>_<SUFFIX>.txt. Plans are built against
$SPARK_GRAFT_SF_DIR (default sf0.1) — plan shape only, no action runs
(iterative operators still run their internal convergence jobs while
building the final DataFrame; that is inherent to their structure).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from onionnet_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("onionnet-dump-plans")
    qs = entrymod.queries()
    for k in keys:
        df = qs[k](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
