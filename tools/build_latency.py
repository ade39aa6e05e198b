#!/usr/bin/env python3
"""Per-query PLAN-BUILD latency probe (guide §7.3: planning time is real).

The bench's timed region includes DataFrame construction: py4j round
trips, analysis, and any driver-side gates a query runs at build time.
This tool times spec.build(...) alone (no action) for every catalog
query, twice, reporting the SECOND build (warm JVM, warm footers) so
one-off session costs don't masquerade as per-query build latency.

Usage: python tools/build_latency.py [--sf DIR] [--json-out F] [query ...]
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
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    names = list(args.queries) or list(QUERIES)
    spark = build_session(app_name="pramen_build_latency")
    # warm-up: session, parquet footers, py4j
    QUERIES["record_count"].build(spark, args.sf)

    out: dict[str, float] = {}
    for name in names:
        spec = QUERIES[name]
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.build(spark, args.sf)
            dt = time.perf_counter() - t0
            best = dt  # keep the LAST (warm) build
        out[name] = round(best, 4)
        print(f"{best:8.3f}  {name}", flush=True)
    total = round(sum(out.values()), 2)
    print(f"# total build latency: {total}s over {len(out)} queries")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
