"""Guards for the round-9 catalog split: the per-domain modules under
``pramen_spark/queries/`` must register exactly the monolith's query set,
with the driver correctness window (first 50 entries of ``QUERIES`` in
iteration order) byte-stable, and the committed full-bench artifact must
cover the entire bench headline (no silent bench-coverage drift)."""

import json
import os
import re

from pramen_spark.queries.catalog import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver checks the FIRST 50 entries in iteration order. Round 12
# restructured the window (VERDICT r11 ask #1): a 10-slot rotating
# sentinel (4 §2 gates + 6 TPC-H) plus 40 never-driver-checked backlog
# queries. Freeze the sentinel slice for this round; the backlog tier is
# guarded structurally (never-checked against committed CORRECTNESS
# records) rather than by name, so next round's refill only needs the
# catalog edit.
DRIVER_SENTINEL_R12 = [
    "projection", "schema_transform", "filter_macro", "infodate_injection",
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_revenue_forecast",
]


def _ever_driver_checked():
    """Union of query names with a row in any committed CORRECTNESS_r*
    record — the definition of 'driver-checked' the window drains."""
    import glob

    checked = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        queries = data.get("queries", data)
        if isinstance(queries, dict):
            checked.update(queries.keys())
    return checked


class TestCatalogSplit:
    def test_catalog_has_all_queries(self):
        assert len(QUERIES) >= 303

    def test_driver_window_sentinel(self):
        names = list(QUERIES)
        assert names[: len(DRIVER_SENTINEL_R12)] == DRIVER_SENTINEL_R12

    def test_window_backlog_tier_is_never_driver_checked(self):
        # slots 10..49 must drain the backlog: every entry lacks a row
        # in every committed CORRECTNESS record at the time the window
        # was built. Entries gain rows when THIS round's record lands,
        # so exempt names once they appear in a record newer than the
        # window (the rotation comment in catalog.py tracks the count).
        names = list(QUERIES)[10:50]
        checked = _ever_driver_checked()
        stale = [n for n in names if n in checked]
        # r12 window was built against records r01..r11; r12+ records
        # legitimately add rows for these same names
        latest = max(
            int(m.group(1))
            for f in os.listdir(REPO)
            if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
        )
        if latest <= 11:
            assert not stale, stale

    def test_window_is_oracle_checked(self):
        # every query in the audited 50-entry window must have an oracle
        for name in list(QUERIES)[:50]:
            assert QUERIES[name].oracle is not None, name


class TestSelfRotatingWindow:
    """The window is computed from committed CORRECTNESS records
    (catalog.py::build_driver_window) — pin the FUTURE rotation behavior
    now with synthetic histories so a silent arithmetic change fails
    here, not in a driver round."""

    def _reg(self):
        from pramen_spark.queries import catalog as C

        return list(QUERIES), QUERIES, C

    def test_round12_shape(self):
        reg, specs, C = self._reg()
        _, last = C.driver_check_history()
        w = C.build_driver_window(reg, specs, 11, last)
        assert len(w) == 50 and len(set(w)) == 50
        assert w[:10] == DRIVER_SENTINEL_R12
        # debuts lead tier B while unchecked
        assert w[10:13] == [
            "image_pixel_stats_jpeg",
            "bpe_encode_large_ruleset",
            "audio_sample_stats_adpcm",
        ]

    def test_round13_advances_sentinel_and_drains_backlog(self):
        reg, specs, C = self._reg()
        _, last = C.driver_check_history()
        r12w = C.build_driver_window(reg, specs, 11, last)
        last13 = dict(last)
        for n in r12w[10:]:
            last13[n] = 12  # this round's gate drained them
        w = C.build_driver_window(reg, specs, 12, last13)
        assert w[:4] == [
            "batchid_injection", "column_sanitation", "record_count",
            "date_range_read",
        ]
        assert w[4:10] == [
            "q7_volume_shipping", "q8_market_share",
            "q9_product_type_profit", "q10_returned_items",
            "q11_important_parts", "q12_priority_by_linestatus",
        ]
        # tier B keeps draining never-checked queries, no repeats of the
        # freshly-drained ones
        assert not (set(w[10:]) & set(r12w[10:]))
        assert all(n not in last13 for n in w[10:])

    def test_sentinel_slices_wrap_and_cover_everything(self):
        reg, specs, C = self._reg()
        gates_seen, tpch_seen = set(), set()
        for r in range(11, 11 + 12):
            w = C.build_driver_window(reg, specs, r, {})
            gates_seen.update(w[:4])
            tpch_seen.update(w[4:10])
        from pramen_spark.queries.catalog import (
            _SENTINEL_S2_GATES,
            _SENTINEL_TPCH,
        )
        assert gates_seen == set(_SENTINEL_S2_GATES)
        assert tpch_seen == set(_SENTINEL_TPCH)

    def test_steady_state_reaudits_oldest_rows_first(self):
        reg, specs, C = self._reg()
        last = {n: 7 for n in reg}
        stale = [n for n in reg if specs[n].oracle is not None][:45]
        for n in stale:
            last[n] = 3  # oldest driver rows
        w = C.build_driver_window(reg, specs, 20, last)
        # tier B = exactly the 40 stalest non-sentinel queries
        assert all(last[n] == 3 for n in w[10:])

    def test_history_reader_skips_corrupt_records(self, tmp_path):
        from pramen_spark.queries import catalog as C

        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"queries": {"projection": {"ok": True}}})
        )
        (tmp_path / "CORRECTNESS_r02.json").write_text("{ not json")
        (tmp_path / "CORRECTNESS_r03.json").write_text(
            json.dumps({"queries": {"q1_pricing_summary": {"ok": True}}})
        )
        rounds, last = C.driver_check_history(str(tmp_path))
        # the corrupt r02 is skipped; its round number never counts
        assert rounds == 3
        assert last == {"projection": 1, "q1_pricing_summary": 3}
        # empty dir: zero rounds, no history — window degrades to slice 0
        rounds0, last0 = C.driver_check_history(str(tmp_path / "nope"))
        assert rounds0 == 0 and last0 == {}

    def test_checked_debut_drops_out_of_the_queue(self):
        reg, specs, C = self._reg()
        last = {"image_pixel_stats_jpeg": 12, "bpe_encode_large_ruleset": 12}
        w = C.build_driver_window(reg, specs, 12, last)
        assert "image_pixel_stats_jpeg" not in w[10:12]
        assert w[10] == "audio_sample_stats_adpcm"  # still unchecked: leads

    def test_submodules_register_disjoint_sets(self):
        # each query is registered exactly once (the registry would silently
        # keep the last registration on a duplicate name)
        import pramen_spark.queries.base as base

        assert len(base.QUERIES) == len(QUERIES)


class TestBenchArtifactCurrent:
    """A headline change without a recorded full-bench run fails fast
    (VERDICT r8 hygiene finding: the refreshed artifact sat uncommitted)."""

    def _latest_artifact(self):
        d = os.path.join(REPO, "bench_full")
        rounds = [
            (int(m.group(1)), f)
            for f in os.listdir(d)
            if (m := re.match(r"bench_r(\d+)_full\.json$", f))
        ]
        assert rounds, "no committed bench_full artifact"
        _, fname = max(rounds)
        with open(os.path.join(d, fname)) as fh:
            return json.load(fh)

    def test_artifact_covers_headline(self):
        import bench

        art = self._latest_artifact()
        missing = [q for q in bench.HEADLINE if q not in art["queries"]]
        assert not missing, (
            f"{len(missing)} headline queries missing from the committed "
            f"bench artifact (run bench.py and commit bench_full/): "
            f"{missing[:10]}"
        )
