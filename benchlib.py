"""Shared bench-artifact path policy (one copy — bench.py and the
tools/ measurement scripts all import this).

A committed quiet-box artifact must never be clobbered by a later run:
unless SPARK_GRAFT_BENCH_COMMIT=1 explicitly targets the canonical
path, a re-run lands on the first free numbered _rerun sibling
(_rerun, _rerun2, ...). Rerun siblings are normally gitignored
(bench_full/*_rerun*.json); a specific one can still be force-added
when it is evidence worth keeping (round 10 committed one as the
measured noise-band record)."""

from __future__ import annotations

import os


def resolve_artifact_path(path: str) -> str:
    """Return ``path`` if it is free or SPARK_GRAFT_BENCH_COMMIT=1 is
    set; otherwise the first free ``_rerunN`` sibling."""
    if not os.path.exists(path) or os.environ.get(
        "SPARK_GRAFT_BENCH_COMMIT", ""
    ) == "1":
        return path
    root, ext = os.path.splitext(path)
    k = 1
    while True:
        out = f"{root}_rerun{ext}" if k == 1 else f"{root}_rerun{k}{ext}"
        if not os.path.exists(out):
            return out
        k += 1
