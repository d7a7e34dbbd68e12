#!/usr/bin/env python
"""Per-job wall-clock attribution for one registered query (guide §1).

Runs ``queries[name](spark, sf_dir)`` followed by the noop-sink write
under Spark event logging, then parses the event log and prints every
job with its duration, description, stage count and the heavyweight
stage metrics (input bytes, shuffle read/write bytes, task count) —
the local-mode stand-in for the Spark UI's Jobs/Stages pages.

Usage::

    python examples/perf_profile.py [--sf DIR] [--warm] name [name ...]

``--warm`` runs each query once untimed first (bench.py's warmup
protocol) so the profiled run is the steady-state one the bench times.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reflex_spark.queries import all_queries
from reflex_spark.session import get_spark


def summarize(log_dir: str, t_start_ms: float) -> list[dict]:
    """Parse every app event log under log_dir into job rows."""
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for fn in files:
            if fn.startswith(".") or "appstatus" in fn:
                continue
            paths.append(os.path.join(root, fn))
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    if ev["Submission Time"] < t_start_ms:
                        continue
                    jobs[ev["Job ID"]] = {
                        "job": ev["Job ID"],
                        "t0": ev["Submission Time"],
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )[:110],
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    }
                elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    acc = {
                        a["Name"]: a.get("Value", 0)
                        for a in si.get("Accumulables", [])
                    }
                    stage_info[si["Stage ID"]] = {
                        "tasks": si.get("Number of Tasks", 0),
                        "input": acc.get("internal.metrics.input.bytesRead", 0),
                        "sh_r": acc.get(
                            "internal.metrics.shuffle.read.remoteBytesRead", 0
                        )
                        + acc.get(
                            "internal.metrics.shuffle.read.localBytesRead", 0
                        ),
                        "sh_w": acc.get(
                            "internal.metrics.shuffle.write.bytesWritten", 0
                        ),
                        "ms": (si.get("Completion Time", 0) or 0)
                        - (si.get("Submission Time", 0) or 0),
                    }
    rows = []
    prev_t1: float | None = None
    for j in sorted(jobs.values(), key=lambda r: r["t0"]):
        if "t1" not in j:
            continue
        stgs = [stage_info.get(s) for s in j["stages"]]
        stgs = [s for s in stgs if s]
        gap = 0.0 if prev_t1 is None else max(0.0, (j["t0"] - prev_t1) / 1e3)
        prev_t1 = j["t1"]
        rows.append(
            {
                "gap_before": round(gap, 3),
                "job": j["job"],
                "sec": round((j["t1"] - j["t0"]) / 1e3, 3),
                "n_stages": len(j["stages"]),
                "tasks": sum(s["tasks"] for s in stgs),
                "input_mb": round(sum(s["input"] for s in stgs) / 1e6, 1),
                "shuffle_mb": round(
                    sum(s["sh_r"] + s["sh_w"] for s in stgs) / 2e6, 1
                ),
                "desc": j["desc"],
            }
        )
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--warm", action="store_true")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="perf_profile_evlog_")
    spark = get_spark(
        app_name="perf_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            # tiny write buffer + no compression so the in-progress log is
            # parseable immediately after each query without stopping the
            # session (Spark 4 defaults to a rolling zstd v2 layout)
            "spark.eventLog.buffer.kb": "1k",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    try:
        for name in args.names:
            if args.warm:
                df = queries[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()
            t_wall0 = time.perf_counter()
            t0_ms = time.time() * 1e3
            df = queries[name](spark, args.sf)
            t_build = time.perf_counter() - t_wall0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t_wall0
            spark.catalog.clearCache()
            # flush the event log by asking the listener bus to drain
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
            rows = summarize(log_dir, t0_ms)
            jobs_sec = sum(r["sec"] for r in rows)
            print(f"\n=== {name}: total {t_total:.2f}s "
                  f"(build {t_build:.2f}s, jobs {jobs_sec:.2f}s over "
                  f"{len(rows)} jobs, gaps {t_total - jobs_sec:.2f}s) ===")
            for r in rows:
                print(
                    f"  job {r['job']:>4} {r['sec']:7.3f}s "
                    f"gap={r['gap_before']:6.3f}s "
                    f"stages={r['n_stages']:<3} tasks={r['tasks']:<5} "
                    f"in={r['input_mb']:>8.1f}MB sh={r['shuffle_mb']:>8.1f}MB  "
                    f"{r['desc']}"
                )
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
