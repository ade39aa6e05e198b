#!/usr/bin/env python3
"""Benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write (full computation, no driver
transfer).  Each query runs $SPARK_GRAFT_BENCH_REPS times (default 5) and
the reported time is the per-query MEDIAN, so one co-tenant hiccup or JIT
warm-up does not masquerade as a plan regression; per-rep raw times are
included under "reps"."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pramen_spark.queries.catalog import QUERIES
from pramen_spark.session import build_session

# Headline policy (explicit, round 9): EVERY catalog query is benched —
# HEADLINE is derived from the catalog registry in catalog order, so a new
# query cannot silently escape round-over-round performance tracking.  The
# committed bench_full/ artifact is pinned to this set by a pytest guard
# (tests/test_bench_artifact.py): changing the headline without recording a
# full bench run fails the suite.
HEADLINE = list(QUERIES)


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 5 interleaved reps by default: this box has ±10-15% run-to-run noise,
    # and 3 reps cannot resolve sub-25% regressions (round-6 lesson)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(app_name="pramen_spark_bench")

    # Warm up the JVM + parquet footers so per-query numbers measure the
    # queries, not session startup.
    force(QUERIES["record_count"].build(spark, sf_dir))

    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # rep-major order: all queries once, then again — so a transient
    # machine-load spike hits one rep of many queries (median absorbs it)
    # instead of all reps of one query
    for _ in range(reps):
        for name in HEADLINE:
            spec = QUERIES[name]
            t0 = time.perf_counter()
            force(spec.build(spark, sf_dir))
            raw[name].append(round(time.perf_counter() - t0, 4))
        # Cache hygiene is PER REP, not per query: a rep measures one pass
        # over the whole suite, the way a production pipeline runs it — so
        # the shingle-hash stage minhash_dedup caches is legitimately
        # served to ngram_jaccard_pairs / dedup_clusters inside the same
        # rep (CacheManager matches their canonicalized plans), exactly
        # like a persisted shingle table shared across pipeline steps at
        # 100 TB. Clearing between reps still guarantees every rep starts
        # cold and measures real computation, never a previous rep's cache.
        spark.catalog.clearCache()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(median(ts), 4) for name, ts in raw.items()}
    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": raw,
        "sf": sf,
    }

    # The driver records only a 2 KB stdout tail in BENCH_r{N}.json, which
    # truncates the medians/reps dicts — so round-over-round comparisons
    # need the FULL result as a committed repo artifact. Infer the round
    # from the driver's own BENCH_r files (this run feeds r = max + 1) and
    # write bench_full/bench_r{N}_full.json alongside the stdout line.
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        # A re-run AFTER the driver has written this round's BENCH_rN.json
        # would mislabel the artifact as round N+1 — let the operator pin
        # the round explicitly and only fall back to max+1 inference.
        env_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND", "")
        if env_round.isdigit():
            n = int(env_round)
        else:
            rounds = [
                int(m.group(1))
                for f in os.listdir(repo)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            n = (max(rounds) if rounds else 0) + 1
        full_dir = os.path.join(repo, "bench_full")
        os.makedirs(full_dir, exist_ok=True)
        full = dict(
            payload,
            env={
                "sf_dir": sf_dir,
                "reps": reps,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
                "spark_version": spark.version,
            },
        )
        # Overwrite protection: the canonical quiet-box artifact is
        # committed once per round; re-runs (e.g. the driver's own bench)
        # land on a free _rerunN sibling instead — see benchlib.
        from benchlib import resolve_artifact_path

        target = resolve_artifact_path(
            os.path.join(full_dir, f"bench_r{n}_full.json")
        )
        with open(target, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # never let artifact persistence break the bench line

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
