#!/usr/bin/env python3
"""Diagnose the r8->r9 small-query median drift (VERDICT r9 ask #5):
per-query medians over the 222 common queries showed a 1.109x median
ratio while the TOTALS were flat (1.012x) — i.e. the small end got
uniformly ~10% slower. Hypothesis: session fixed cost / box conditions,
not plan regressions (none of the affected plans changed in round 9).

Method: take the N smallest-median common queries from the r8 artifact,
re-run them standalone on a quiet box (noop sink, interleaved reps,
per-rep cache hygiene like bench.py), and compare this run's medians to
the committed artifacts.

CAVEAT (learned round 10, see bench_full/DRIFT_r10.md): a standalone
subset run is NOT the bench.py harness — sub-0.3 s medians swing +-40%
with cache-manager/GC state alone (per-query vs per-rep clearing over a
30-query subset measured 1.065 vs 1.425 against the same baseline on
the same quiet box). Treat this tool as a quick probe; the committed
full-bench artifacts compared round-over-round are the primary signal
for small-query drift.

Usage: python tools/diag_drift.py [sf_dir] [n_queries] [reps] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pramen_spark.queries.catalog import QUERIES
from pramen_spark.session import build_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_path = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(REPO, "bench_full", "drift_diag_r10.json")
    )
    with open(os.path.join(REPO, "bench_full", "bench_r8_full.json")) as f:
        r8 = json.load(f)["queries"]
    with open(os.path.join(REPO, "bench_full", "bench_r9_full.json")) as f:
        r9 = json.load(f)["queries"]
    common = [q for q in r8 if q in r9 and q in QUERIES]
    # the drift lives at the small end: sample the N smallest r8 medians
    sample = sorted(common, key=lambda q: r8[q])[:n_queries]

    spark = build_session(app_name="diag_drift")
    QUERIES["record_count"].build(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    raw: dict[str, list[float]] = {q: [] for q in sample}
    for _ in range(reps):  # interleaved like bench.py
        for q in sample:
            t0 = time.perf_counter()
            QUERIES[q].build(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            raw[q].append(round(time.perf_counter() - t0, 4))
        # cache hygiene PER REP, exactly like bench.py — the artifacts
        # being compared against were measured with intra-rep cache
        # reuse, so clearing per query would inflate the ratios
        spark.catalog.clearCache()

    rows = {}
    for q in sample:
        now = statistics.median(raw[q])
        rows[q] = {
            "r8": r8[q],
            "r9": r9[q],
            "now": round(now, 4),
            "r9_over_r8": round(r9[q] / r8[q], 3),
            "now_over_r8": round(now / r8[q], 3),
            "reps": raw[q],
        }
    med = lambda key: round(  # noqa: E731
        statistics.median(rows[q][key] for q in sample), 3
    )
    payload = {
        "metric": "small_query_drift_diag",
        "sf_dir": sf_dir,
        "n_queries": n_queries,
        "reps": reps,
        "median_ratio_r9_over_r8": med("r9_over_r8"),
        "median_ratio_now_over_r8": med("now_over_r8"),
        "queries": rows,
    }
    # same overwrite policy as bench.py: a re-run must not clobber the
    # committed artifact unless explicitly asked
    from benchlib import resolve_artifact_path

    out_path = resolve_artifact_path(out_path)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    print(
        json.dumps(
            {
                "median_ratio_r9_over_r8": payload["median_ratio_r9_over_r8"],
                "median_ratio_now_over_r8": payload["median_ratio_now_over_r8"],
            }
        )
    )


if __name__ == "__main__":
    main()
