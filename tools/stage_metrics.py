#!/usr/bin/env python3
"""Deterministic per-query cost metrics via the Spark UI REST API.

Wall-clock on a noisy shared box cannot resolve <2x changes; stage-level
counters can. For each named query this runs ONE noop-sink execution with
the UI enabled and reports, summed over all completed stages:

  tasks       — total task count (scheduling overhead proxy)
  input_gb    — bytes read from storage (re-execution of scans shows here)
  shuffle_gb  — shuffle read bytes (exchange volume)
  cpu_sec     — executor CPU time (contention-resistant compute cost)
  run_sec     — executor run time (wall-ish, noise-inflated)

Usage: python tools/stage_metrics.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pramen_spark.queries.catalog import QUERIES  # noqa: E402
from pramen_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    spark = build_session(
        app_name="pramen_stage_metrics",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}"

    def stages():
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(QUERIES["record_count"].build(spark, args.sf))  # warm-up

    out: dict[str, dict] = {}
    for name in args.queries:
        spark.catalog.clearCache()
        seen = {(s["stageId"], s["attemptId"]) for s in stages()}
        spark.sparkContext.setJobDescription(name)
        force(QUERIES[name].build(spark, args.sf))
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if (s["stageId"], s["attemptId"]) not in seen]
        m = {
            "stages": len(new),
            "tasks": sum(s["numCompleteTasks"] for s in new),
            "input_gb": round(sum(s["inputBytes"] for s in new) / 1e9, 3),
            "shuffle_gb": round(sum(s["shuffleReadBytes"] for s in new) / 1e9, 3),
            "cpu_sec": round(sum(s["executorCpuTime"] for s in new) / 1e9, 2),
            "run_sec": round(sum(s["executorRunTime"] for s in new) / 1e3, 2),
        }
        out[name] = m
        print(f"{name}: {m}", flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
