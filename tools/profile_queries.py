#!/usr/bin/env python3
"""Isolated per-query profiler for the optimization rounds (guide §1).

For each named query: run `reps` noop-sink executions (median reported),
and optionally dump `.explain(mode)` to a file. Unlike bench.py this
times ONE query at a time with a labelled job, so the number is the
query's own cost, not a suite interleaving.

Usage:
  python tools/profile_queries.py [--sf DIR] [--reps N] [--plans OUTDIR]
                                  [--suffix TAG] query [query ...]
  python tools/profile_queries.py --top N   # N slowest from the canonical bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pramen_spark.queries.catalog import QUERIES  # noqa: E402
from pramen_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               "bench_full", "bench_r14_full.json")) as f:
            canon = json.load(f)["queries"]
        names = [n for n, _ in sorted(canon.items(), key=lambda kv: -kv[1])[: args.top]]

    spark = build_session(app_name="pramen_profile")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # warm-up: JVM + parquet footers
    force(QUERIES["record_count"].build(spark, args.sf))

    out: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        times = []
        for r in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            force(spec.build(spark, args.sf))
            times.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        s = sorted(times)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        out[name] = {"median": round(med, 4), "reps": times}
        print(f"{med:8.3f}  {name}  {times}", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.build(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
