"""Query catalog facade: re-exports the registry built by the per-domain
modules under ``pramen_spark/queries/`` (split from a 14.7k-line monolith
in round 9) and applies the driver correctness-window ordering.

Import side effects are the registration mechanism: each submodule import
below registers its queries into the shared ``QUERIES`` dict (defined in
``base.py``) via the ``@query`` decorator, in the exact order of the
original monolith, so the post-sort driver window is byte-stable across
the refactor.
"""

from __future__ import annotations

from pramen_spark.queries.base import (  # noqa: F401  (public re-exports)
    QUERIES,
    QuerySpec,
    load_documents_spread,
    load_events,
    load_table,
    query,
)

# Registration order = original chronological order — do not reorder.
from pramen_spark.queries import core as _core  # noqa: F401,E402
from pramen_spark.queries import tpch_extended as _tpch  # noqa: F401,E402
from pramen_spark.queries import ops_graph as _ops  # noqa: F401,E402
from pramen_spark.queries import curation_advanced as _cur  # noqa: F401,E402
from pramen_spark.queries import business as _biz  # noqa: F401,E402
from pramen_spark.queries import stats_quality as _stats  # noqa: F401,E402
from pramen_spark.queries import kpi as _kpi  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver correctness-window ordering — SELF-ROTATING from round 12.
#
# The driver's per-round correctness gate checks the FIRST 50 entries of
# ``QUERIES`` in iteration order. Restructured in round 12 (VERDICT r11
# ask #1): the old fixed tiers (11 §2 gates + 22 TPC-H) had been green in
# EVERY driver window since round 6 while holding 33 of the 50 slots, so
# at 17 first-time rows per round the never-driver-checked backlog
# (168 of 314 after r11) would have taken ~10 more rounds to drain.
#
# The window is now COMPUTED at import time from the committed
# CORRECTNESS_r*.json records (the drain state is already in the repo —
# no manual rotation edits, no stale-count comments):
#
#   tier S — a 10-slot ROTATING SENTINEL (4 §2 gates + 6 TPC-H), cyclic
#     slices of the fixed orders below advanced by the number of rounds
#     completed since the restructure epoch, so every gate re-audits
#     every ~3 rounds (ceil(11/4)) and every TPC-H shape every ~4
#     (ceil(22/6)). Round 12 (11 committed records) takes gates[0:4] +
#     tpch[0:6]; round 13 takes gates[4:8] + tpch[6:12]; wrapping.
#     Out-of-sentinel gates/TPC-H stay oracle-checked every round by
#     tools/check_oracle.py + pytest's full-catalog sweep.
#
#   tier B — 40 slots ordered by LEAST-RECENTLY-DRIVER-CHECKED first
#     (never-checked sorts before everything; ties broken by
#     registration order), with ``DEBUT_QUEUE`` names leading while they
#     are still unchecked. This drains the never-checked backlog at
#     40/round (~168 at r12 -> zero in ~4 rounds) and then degrades
#     gracefully into a full re-audit rotation: once everything has a
#     row, the window cycles through the whole catalog oldest-row-first.
#
# Everything below the 50-entry window keeps the prior ordering rule:
# oracle-checked queries before rows-only ones, stable by registration
# order, and any query not named falls into its tier automatically —
# adding a new query never silently drops an audited one out of order.
# ---------------------------------------------------------------------------

import glob as _glob
import json as _json
import os as _os
import re as _re

# Fixed rotation orders for the sentinel (do not reorder; the cyclic
# slice arithmetic depends on these being stable).
_SENTINEL_S2_GATES = [
    "projection", "schema_transform", "filter_macro", "infodate_injection",
    "batchid_injection", "column_sanitation", "record_count",
    "date_range_read", "latest_partition", "incremental_offset",
    "offset_minmax",
]
_SENTINEL_TPCH = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_revenue_forecast",
    "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_by_linestatus",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q20_promotable_suppliers", "q21_waiting_suppliers",
    "q22_dormant_customers",
]

# Newly-shipped operators jump the tier-B queue until their first driver
# row lands (the r10->r11 debut precedent, now automatic): append a new
# query's name here when adding it to the catalog; it silently drops out
# of the window once any CORRECTNESS record contains it.
DEBUT_QUEUE = [
    "image_pixel_stats_jpeg",
    "bpe_encode_large_ruleset",
    "audio_sample_stats_adpcm",
    # r13: never driver-checked AND its output serialization changed
    # (array postings -> comma-joined scalar, VERDICT r12 #2) — needs its
    # first driver row now, not when the backlog drain reaches it
    "posting_lists_documents",
]

_ROTATION_EPOCH = 11  # committed records when the self-rotating window shipped
_WINDOW_SIZE = 50
_SENTINEL_GATES_PER_ROUND = 4
_SENTINEL_TPCH_PER_ROUND = 6

_REPO_DIR = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def _row_is_green(row) -> bool:
    """A driver row counts as CHECKED only when it is fully green:
    rows/schema/hash all true and no error. Err rows (e.g. the r12
    ``quantize_embeddings_int8`` canonicalizer crash) and partial rows
    must NOT advance ``last_checked`` — otherwise a failure sorts to the
    back of the re-audit queue and hides for ~8 rounds (VERDICT r12 #3)."""
    return (
        isinstance(row, dict)
        and not row.get("err")
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def driver_check_history(repo_dir: str = _REPO_DIR, max_round: int | None = None):
    """Read the committed CORRECTNESS_r*.json records: returns
    ``(rounds_completed, last_green, failed)`` where ``last_green`` maps
    each query to the latest round with a FULLY GREEN row and ``failed``
    maps queries whose LATEST row is not green to that round — those
    must re-enter the very next window. Unreadable records are skipped —
    the window degrades to treating their queries as unchecked, which
    only re-audits them sooner. ``max_round`` truncates the history (for
    tests that pin a past round's window shape against a frozen
    expectation without breaking when newer records land)."""
    last_green: dict = {}
    last_seen: dict = {}
    rounds = [0]
    for path in sorted(
        _glob.glob(_os.path.join(repo_dir, "CORRECTNESS_r*.json"))
    ):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if max_round is not None and n > max_round:
            continue
        try:
            with open(path) as f:
                data = _json.load(f)
        except (OSError, ValueError):
            continue
        queries = data.get("queries", data)
        if not isinstance(queries, dict):
            continue
        rounds.append(n)
        for name, row in queries.items():
            last_seen[name] = max(last_seen.get(name, 0), n)
            if _row_is_green(row):
                last_green[name] = max(last_green.get(name, 0), n)
    failed = {
        name: r
        for name, r in last_seen.items()
        if last_green.get(name, 0) < r
    }
    return max(rounds), last_green, failed


def build_driver_window(
    registration_order,
    specs,
    rounds_completed: int,
    last_checked: dict,
    failed: dict | None = None,
):
    """The 50-name driver window for the NEXT gate run (pure function of
    the committed check history — unit-tested for future rotations).
    ``failed`` queries (latest driver row not fully green) lead tier B,
    ahead of even the debuts: a red row re-audits NEXT round, always."""

    def cyc(lst, start, k):
        return [lst[(start + j) % len(lst)] for j in range(k)]

    i = max(0, rounds_completed - _ROTATION_EPOCH)
    window = cyc(
        _SENTINEL_S2_GATES,
        (_SENTINEL_GATES_PER_ROUND * i) % len(_SENTINEL_S2_GATES),
        _SENTINEL_GATES_PER_ROUND,
    ) + cyc(
        _SENTINEL_TPCH,
        (_SENTINEL_TPCH_PER_ROUND * i) % len(_SENTINEL_TPCH),
        _SENTINEL_TPCH_PER_ROUND,
    )
    taken = set(window)
    reg_index = {n: j for j, n in enumerate(registration_order)}

    def take(name):
        if len(window) >= _WINDOW_SIZE or name in taken:
            return
        if name not in reg_index or specs[name].oracle is None:
            return
        window.append(name)
        taken.add(name)

    for name in sorted(failed or {}, key=lambda n: reg_index.get(n, 1 << 30)):
        take(name)
    for name in DEBUT_QUEUE:
        if name not in last_checked:
            take(name)
    remaining = sorted(
        (
            n
            for n in registration_order
            if n not in taken and specs[n].oracle is not None
        ),
        key=lambda n: (last_checked.get(n, 0), reg_index[n]),
    )
    window += remaining[: _WINDOW_SIZE - len(window)]
    return window


# Pre-sort registration order: build_driver_window's tie-break depends on
# it, and tests recompute the live window from it (the post-sort QUERIES
# iteration order no longer reflects registration).
REGISTRATION_ORDER = list(QUERIES)

_ROUNDS_COMPLETED, _LAST_CHECKED, _FAILED = driver_check_history()
_DRIVER_WINDOW_PRIORITY = build_driver_window(
    REGISTRATION_ORDER, QUERIES, _ROUNDS_COMPLETED, _LAST_CHECKED, _FAILED
)


def _query_order(item):
    name, spec = item
    if name in _DRIVER_WINDOW_PRIORITY:
        return (0, _DRIVER_WINDOW_PRIORITY.index(name))
    # oracle-checked queries before rows-only ones; stable otherwise
    return (1 if spec.oracle is not None else 2, 0)


_sorted = dict(sorted(QUERIES.items(), key=lambda kv: (_query_order(kv),)))
QUERIES.clear()
QUERIES.update(_sorted)
