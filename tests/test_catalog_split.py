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


def _ever_driver_checked(max_round=None):
    """Union of query names with a row in any committed CORRECTNESS_r*
    record (up to ``max_round``) — the definition of 'driver-checked'
    the window drains."""
    import glob

    checked = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if max_round is not None and m and int(m.group(1)) > max_round:
            continue
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
        # The live iteration-order head must equal the window recomputed
        # from the live committed history (pure function) — proves the
        # import-time sort applied the self-rotating window, whatever
        # round the tree is at. (The r12 frozen-literal version of this
        # test broke the moment CORRECTNESS_r12.json landed: VERDICT r12
        # ask #1. Round-pinned shapes now live in TestSelfRotatingWindow
        # with max_round-truncated histories.)
        from pramen_spark.queries import catalog as C

        rounds, last, failed = C.driver_check_history()
        expected = C.build_driver_window(
            C.REGISTRATION_ORDER, QUERIES, rounds, last, failed
        )
        assert list(QUERIES)[:50] == expected

    def test_window_backlog_tier_is_never_driver_checked(self):
        # Tier B (slots 10..49) drains the backlog: against the history
        # TRUNCATED at r11 (frozen — newer records can't invalidate the
        # expectation, the r12 lesson), every entry either re-audits a
        # FAILURE (had rows but never a fully-green one) or has no row
        # in any record at all.
        from pramen_spark.queries import catalog as C

        rounds, last, failed = C.driver_check_history(max_round=11)
        w = C.build_driver_window(
            C.REGISTRATION_ORDER, QUERIES, rounds, last, failed
        )
        checked = _ever_driver_checked(max_round=11)
        stale = [n for n in w[10:50] if n in checked and n not in failed]
        assert not stale, stale

    def test_debut_queue_names_exist(self):
        # build_driver_window silently skips unknown names — a typo'd
        # debut would never get its first driver row
        from pramen_spark.queries.catalog import DEBUT_QUEUE

        unknown = [n for n in DEBUT_QUEUE if n not in QUERIES]
        assert not unknown, unknown

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

        return C.REGISTRATION_ORDER, QUERIES, C

    def test_round12_shape(self):
        # Frozen r12 expectation against the history TRUNCATED at r11 —
        # stable no matter how many newer records land in the tree.
        # (Under the r13 failure tier, the four r04-era rows-only names
        # whose latest row was never fully green now precede the debuts;
        # the driver's ACTUAL r12 window predated that tier.)
        reg, specs, C = self._reg()
        rounds, last, failed = C.driver_check_history(max_round=11)
        assert rounds == 11
        w = C.build_driver_window(reg, specs, rounds, last, failed)
        assert len(w) == 50 and len(set(w)) == 50
        assert w[:10] == DRIVER_SENTINEL_R12
        # failures first (latest row not fully green), then the debuts
        assert w[10:14] == [
            "simhash_fingerprints", "similarity_ivf_topk",
            "simhash_near_dups", "multimodal_features",
        ]
        assert w[14:17] == [
            "image_pixel_stats_jpeg",
            "bpe_encode_large_ruleset",
            "audio_sample_stats_adpcm",
        ]

    def test_round13_advances_sentinel_and_drains_backlog(self):
        reg, specs, C = self._reg()
        _, last, failed = C.driver_check_history(max_round=11)
        r12w = C.build_driver_window(reg, specs, 11, last, failed)
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

        green = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "err": None,
        }
        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"queries": {"projection": green}})
        )
        (tmp_path / "CORRECTNESS_r02.json").write_text("{ not json")
        (tmp_path / "CORRECTNESS_r03.json").write_text(
            json.dumps({"queries": {"q1_pricing_summary": green}})
        )
        rounds, last, failed = C.driver_check_history(str(tmp_path))
        # the corrupt r02 is skipped; its round number never counts
        assert rounds == 3
        assert last == {"projection": 1, "q1_pricing_summary": 3}
        assert failed == {}
        # empty dir: zero rounds, no history — window degrades to slice 0
        rounds0, last0, failed0 = C.driver_check_history(str(tmp_path / "nope"))
        assert rounds0 == 0 and last0 == {} and failed0 == {}

    def test_err_row_does_not_count_as_checked(self, tmp_path):
        # VERDICT r12 #3: an err/partial row must NOT advance
        # last_checked — it lands in `failed` instead, so the query
        # re-audits NEXT round rather than sinking to the queue's back.
        from pramen_spark.queries import catalog as C

        green = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "err": None,
        }
        red = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "err": "TypeError: unhashable type: 'list'",
        }
        hash_red = {
            "rows_match": True, "schema_match": True, "hash_match": False,
            "err": None,
        }
        (tmp_path / "CORRECTNESS_r11.json").write_text(json.dumps(
            {"queries": {"projection": green, "tfidf_top_terms": green}}
        ))
        (tmp_path / "CORRECTNESS_r12.json").write_text(json.dumps(
            {"queries": {
                "projection": green,
                "quantize_embeddings_int8": red,
                "tfidf_top_terms": hash_red,
            }}
        ))
        rounds, last, failed = C.driver_check_history(str(tmp_path))
        assert rounds == 12
        assert last == {"projection": 12, "tfidf_top_terms": 11}
        assert failed == {
            "quantize_embeddings_int8": 12, "tfidf_top_terms": 12,
        }
        # ...and the failures lead the NEXT window's tier B, ahead of
        # debuts and the never-checked backlog
        reg, specs, C = self._reg()
        w = C.build_driver_window(reg, specs, rounds, last, failed)
        expect = sorted(
            failed, key=lambda n: reg.index(n)
        )
        assert w[10:12] == expect
        # a later green row clears the failure
        (tmp_path / "CORRECTNESS_r13.json").write_text(json.dumps(
            {"queries": {"quantize_embeddings_int8": green,
                         "tfidf_top_terms": green}}
        ))
        _, last2, failed2 = C.driver_check_history(str(tmp_path))
        assert failed2 == {}
        assert last2["quantize_embeddings_int8"] == 13

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
