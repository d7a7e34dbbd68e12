#!/usr/bin/env python
"""Capture ``explain('formatted')`` for named queries into plans/<tag>/.

Usage::

    python examples/capture_plans.py --tag r16 --suffix before name [name ...]

Writes ``plans/<tag>/<name>_<suffix>.txt`` with the formatted physical
plan of the DataFrame each registered query returns, using the same
engine session as bench.py (get_spark), at $SPARK_GRAFT_SF_DIR.

Queries that run actions while building (streaming entries, multi-commit
machinery) still capture the plan of their FINAL returned frame — for
them the interesting plans are the per-phase jobs, which the profiler
(examples/perf_profile.py) attributes instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.queries import all_queries
from reflex_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in args.names:
        df = queries[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
