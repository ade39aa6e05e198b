"""Physical-plan regression tests: the properties that make the engine
scale (filter pushdown, column pruning, broadcast of small sides,
whole-stage codegen) are asserted on the formatted plans of key catalog
queries, so a refactor that silently degrades a plan fails CI — not just
the 100 TB deployment.

Plans are captured at sf0.001; plan SHAPE is scale-invariant for these
assertions (AQE may coalesce partitions but does not remove pushdowns,
pruning, or broadcast hints)."""

import re

import pytest

from pramen_spark.queries.catalog import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].build(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPlanShapes:
    def test_q6_filters_pushed_to_scan(self, spark, sf_dir):
        """q6's date/discount/quantity predicates must reach the parquet
        scan as PushedFilters, not run as a post-scan Filter only."""
        plan = plan_of(spark, sf_dir, "q6_revenue_forecast")
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m, plan
        assert "l_shipdate" in m.group(1) or "l_discount" in m.group(1), m.group(1)

    def test_q3_broadcasts_customer_filter_side(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "q3_shipping_priority")
        assert "BroadcastHashJoin" in plan, plan

    def test_q5_dims_broadcast(self, spark, sf_dir):
        """region/nation are dimension tables: every join against them
        must be broadcast, never a shuffle join."""
        plan = plan_of(spark, sf_dir, "q5_local_supplier")
        assert plan.count("BroadcastHashJoin") >= 2, plan

    def test_curate_corpus_prunes_columns(self, spark, sf_dir):
        """The flagship's base scan must read (doc_id, source) only —
        raw text must not move past the first projections."""
        plan = plan_of(spark, sf_dir, "curate_corpus")
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert any(
            "doc_id" in s and "source" in s and "text" not in s for s in schemas
        ), schemas

    def test_projection_reads_only_selected_columns(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "projection")
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas and all("c_comment" not in s for s in schemas), schemas

    def test_text_ops_are_codegen_only(self, spark, sf_dir):
        """Pure column-expression text ops: no exchange (shuffle), no
        Python evaluation, and the pipeline is whole-stage-codegen'd
        (formatted explain marks codegen nodes with a '* ' prefix)."""
        for name in ("text_quality", "text_repetition", "doc_fingerprint", "lang_id",
                     "quality_classifier"):
            plan = plan_of(spark, sf_dir, name)
            assert "Exchange" not in plan, (name, plan)
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
            assert re.search(r"\* \w", plan), (name, plan)

    def test_substring_dedup_no_text_self_join(self, spark, sf_dir):
        """Duplicate-span detection must never self-join raw text: the
        only join is the aggregated marked-positions set joined back to
        the docs (broadcast-able), and the row path stays JVM-side."""
        plan = plan_of(spark, sf_dir, "substring_dedup_documents")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
        assert len(joins) == 1, joins
        # two data shuffles (gram window + per-doc mark agg) plus the
        # spread_input repartition inherited by both scan branches at
        # test scale (spread is a no-op at real scale: inputs arrive in
        # >= parallelism splits); the join side is a broadcast, never
        # another corpus-keyed exchange
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_cosine_topk_has_no_python(self, spark, sf_dir):
        """Brute-force scoring is JVM-side (aggregate/zip_with): Python
        appears nowhere in the exact similarity path."""
        plan = plan_of(spark, sf_dir, "similarity_cosine_topk")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_q7_date_pushdown_and_dims_broadcast(self, spark, sf_dir):
        """q7's ship-date bounds must reach the lineitem scan, and the
        nation-filtered supplier/customer sides must broadcast."""
        plan = plan_of(spark, sf_dir, "q7_volume_shipping")
        pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
        assert "GreaterThanOrEqual(l_shipdate" in pushed, pushed
        assert plan.count("BroadcastHashJoin") >= 2, plan

    def test_q21_windows_share_one_orderkey_shuffle(self, spark, sf_dir):
        """Both per-order window aggregates (n_supp, n_late_supp) must
        reuse a single hashpartitioning(l_orderkey) exchange — the
        decorrelated EXISTS/NOT EXISTS reads lineitem once. The final
        top-20 must be a TakeOrdered, not a global sort."""
        plan = plan_of(spark, sf_dir, "q21_waiting_suppliers")
        assert len(re.findall(r"hashpartitioning\(l_orderkey", plan)) == 1, plan
        assert "TakeOrderedAndProject" in plan, plan

    def test_q17_per_part_threshold_broadcast(self, spark, sf_dir):
        """The decorrelated 0.2*AVG threshold join must broadcast both
        small sides (filtered part dim, per-part aggregate) — no
        shuffle join against lineitem."""
        plan = plan_of(spark, sf_dir, "q17_small_quantity_revenue")
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "SortMergeJoin" not in plan, plan

    def test_q2_broadcast_only_and_takeordered(self, spark, sf_dir):
        """q2's decorrelated MIN: every join against lineitem must be
        broadcast (part filter, supplier dim, per-part best), the part
        filter must reach the scan, and the top-100 must be TakeOrdered."""
        plan = plan_of(spark, sf_dir, "q2_min_cost_supplier")
        assert "SortMergeJoin" not in plan, plan
        pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
        assert "EqualTo(p_type,LARGE)" in pushed, pushed
        assert "TakeOrderedAndProject" in plan, plan

    def test_q20_single_lineitem_pass(self, spark, sf_dir):
        """q20's nested-aggregate IN reads lineitem ONCE (the literal TPC-H
        formulation reads it twice): one parquet scan of lineitem, no
        shuffle joins, and the widget LIKE pushed to the part scan."""
        plan = plan_of(spark, sf_dir, "q20_promotable_suppliers")
        assert plan.count("lineitem.parquet") == 1, plan
        assert "SortMergeJoin" not in plan, plan
        pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
        assert "StringContains(p_name,widget)" in pushed, pushed

    def test_q15_no_global_window(self, spark, sf_dir):
        """The scalar MAX is a broadcast 1-row aggregate, never a global
        window (a partitionBy()-less Window funnels the whole per-supplier
        set through one task); the revenue shuffle is planned for reuse
        between the rev branch and its max."""
        plan = plan_of(spark, sf_dir, "q15_top_supplier")
        assert "Window" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan

    def test_q15_single_lineitem_scan_at_runtime(self, spark, sf_dir):
        """The max branch must REUSE the revenue shuffle (AQE stage reuse
        needs canonically identical subtrees — the explicit isnotnull on
        l_suppkey keeps them identical), so lineitem is scanned once, not
        once per branch: the difference between 1× and 2× the dominant
        scan at 100 TB."""
        df = QUERIES["q15_top_supplier"].build(spark, sf_dir)
        df.collect()
        final = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        ).split("== Initial Plan ==")[0]
        assert "ReusedExchange" in final, final
        assert final.count("lineitem.parquet") == 1, final

    def test_dedup_exact_single_shuffle(self, spark, sf_dir):
        """Exact dedup is one hash aggregation: exactly one exchange node
        (each node appears once as '(n) Exchange' in the detail section),
        keyed on the content hash."""
        plan = plan_of(spark, sf_dir, "dedup_exact")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


class TestPlanInventoryCurrent:
    def test_plans_md_covers_every_catalog_query(self):
        """The plan inventory is the review artifact for scale audits and
        must never lag the catalog (the round-7 hygiene miss: 5 queries
        shipped without PLANS.md rows). A catalog commit that skips
        `python tools/plan_audit.py` fails here."""
        import os
        import re

        plans_path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
        with open(plans_path) as f:
            txt = f.read()
        audited = set(re.findall(r"^\| (\w+) \| \d", txt, flags=re.M))
        catalog = set(QUERIES)
        missing = sorted(catalog - audited)
        stale = sorted(audited - catalog)
        assert not missing, f"queries missing from PLANS.md (rerun tools/plan_audit.py): {missing}"
        assert not stale, f"PLANS.md rows for queries no longer in the catalog: {stale}"


class TestDriverSessionCompat:
    """Regression gate for environment drift in the DRIVER-owned session
    (the round-4 breakage: PySpark 4.1 started inferring tz-less parquet
    timestamps as TIMESTAMP_NTZ and every ``unix_micros`` call site failed
    analysis). These tests run the catalog against a session configured
    like a fresh driver default — NTZ inference ON, non-UTC timezone — so
    the next Spark-default shift fails here first, not in CORRECTNESS."""

    @pytest.fixture(scope="class")
    def driver_like(self, spark):
        """A sibling session (shared JVM, independent session conf) with
        driver-default parquet inference and a deliberately non-UTC
        timezone; pin_utc in the load path must neutralize the latter."""
        s = spark.newSession()
        s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        s.conf.set("spark.sql.session.timeZone", "America/New_York")
        return s

    def test_all_catalog_queries_analyze(self, driver_like, sf_dir):
        """Plan-only sweep: every registered query must pass analysis
        (schema resolution) under driver-default inference. Catches
        DATATYPE_MISMATCH-class drift across the whole catalog in one
        test without executing anything."""
        failures = {}
        for name, spec in QUERIES.items():
            try:
                spec.build(driver_like, sf_dir).schema
            except Exception as e:  # noqa: BLE001 - collecting all failures
                failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
        assert not failures, failures

    def test_epochs_are_utc_on_non_utc_host(self, driver_like, sf_dir):
        """NTZ wall-clock values must be interpreted as UTC instants even
        when the session starts on a non-UTC timezone (the load path pins
        UTC): epoch extraction must agree with DuckDB's epoch_us."""
        import duckdb

        df = QUERIES["event_gaps_leadlag"].build(driver_like, sf_dir)
        got = {r.event_id: r.ts_us for r in df.orderBy("event_id").limit(5).collect()}
        want = dict(
            duckdb.sql(
                f"SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) FROM "
                f"read_parquet('{sf_dir}/events.parquet') ORDER BY event_id LIMIT 5"
            ).fetchall()
        )
        assert got == want


class TestNewOperatorPlans:
    """Plan-shape guarantees for the round-5/6 curation operators: the
    scan-speed ops must stay exchange-free, and line dedup's frequency
    filter join strategy is the planner's choice, never a forced hint."""

    def test_redact_pii_is_shuffle_free(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "redact_pii_documents")
        assert not re.findall(r"\(\d+\) Exchange", plan), plan

    def test_gopher_filter_is_shuffle_free(self, spark, sf_dir):
        # all 9 rules in one whole-stage-codegen projection, no Python
        plan = plan_of(spark, sf_dir, "gopher_quality_filter")
        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_canonical_url_dedup_single_shuffle(self, spark, sf_dir):
        # canonicalization is a projection; only the count shuffles
        plan = plan_of(spark, sf_dir, "canonical_url_dedup")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan

    def test_mixture_weights_broadcast_scalar(self, spark, sf_dir):
        # one map-side-combined per-source agg + a broadcast 1-row budget;
        # never a global window or a shuffled scalar join
        plan = plan_of(spark, sf_dir, "mixture_weights")
        assert "Window" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan

    def test_chunking_is_shuffle_free(self, spark, sf_dir):
        plan = plan_of(spark, sf_dir, "chunk_documents")
        assert not re.findall(r"\(\d+\) Exchange", plan), plan

    def test_line_dedup_boilerplate_join_is_not_forced_broadcast(self, spark, sf_dir):
        # The boilerplate-set join must carry NO broadcast hint: at 100 TB
        # the over-threshold line-hash set is unbounded and a forced
        # broadcast would blow the 8 GB broadcast cap / driver memory. The
        # planner (autoBroadcastJoinThreshold + AQE) picks the strategy —
        # either is acceptable, but the join must be present and planned.
        plan = plan_of(spark, sf_dir, "line_dedup_documents")
        assert re.search(
            r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan
        ), plan
        # the single-pass flag-and-aggregate shape: frequency count,
        # per-doc rebuild, and (if the planner picks a shuffle join) the
        # join's own exchanges — the three-scan anti/semi/agg form shows
        # strictly more exchanges than this bound
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 5, plan

    def test_domain_histogram_two_phase_distinct(self, spark, sf_dir):
        # count + countDistinct in one agg is Spark's canonical two-phase
        # distinct plan: exactly 2 exchanges, no more
        plan = plan_of(spark, sf_dir, "domain_histogram_documents")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan

    def test_paragraph_dedup_hash_partitioned_window(self, spark, sf_dir):
        # keep-first ranking must window over the paragraph HASH (a
        # hashpartitioning exchange on _h), never a single-partition
        # global window; rebuild adds the one groupBy(doc_id) exchange
        plan = plan_of(spark, sf_dir, "paragraph_dedup_documents")
        assert "Window" in plan, plan
        assert re.search(r"hashpartitioning\(_h", plan), plan
        assert "SinglePartition" not in plan, plan

    def test_char_lm_model_is_broadcast(self, spark, sf_dir):
        # the bigram model and the vocab scalar are broadcast to the
        # scoring join; the corpus-wide explode must not be shuffled raw
        # (only compact (id, bigram, cnt) and model-side aggregates move)
        plan = plan_of(spark, sf_dir, "char_lm_quality")
        assert "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_shard_assignment_single_aggregation(self, spark, sf_dir):
        # shard id is a narrow projection; the audit is one
        # map-side-combined groupBy -> exactly 1 exchange
        plan = plan_of(spark, sf_dir, "shard_assignment")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan

    def test_winnow_single_exchange(self, spark, sf_dir):
        # winnowing's per-doc ordered window is the only exchange; the
        # follow-up per-doc aggregate must reuse its hashpartitioning —
        # and only 8-byte hashes shuffle, never gram text
        plan = plan_of(spark, sf_dir, "winnow_fingerprint_documents")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "SinglePartition" not in plan, plan

    def test_bm25_stats_broadcast_no_cartesian(self, spark, sf_dir):
        # df_t (<= |query| rows) and (N, avgdl) are broadcast; the 1-row
        # stats crossJoin must plan as a broadcast loop join, never a
        # CartesianProduct; nothing drops to Python
        plan = plan_of(spark, sf_dir, "bm25_relevance_documents")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_profile_single_aggregation_job(self, spark, sf_dir):
        # every column's null/distinct/min/max comes from ONE aggregate:
        # the plan may Expand for the distincts but must contain exactly
        # one scan of the table and no join
        plan = plan_of(spark, sf_dir, "profile_documents_table")
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
        assert "Join" not in plan, plan

    def test_cohort_retention_no_self_join(self, spark, sf_dir):
        # cohort day comes from a per-user window, not a join of events
        # against its own per-user minimum
        plan = plan_of(spark, sf_dir, "cohort_retention_events")
        assert "Join" not in plan, plan
        assert "Window" in plan, plan

    def test_apply_cdc_snapshot_anti_join_only(self, spark, sf_dir):
        # the snapshot side is touched by exactly one LEFT ANTI join; the
        # row_number window runs over the change batch only, and nothing
        # drops to Python
        plan = plan_of(spark, sf_dir, "apply_cdc_orders")
        assert "LeftAnti" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_scd2_windows_share_one_exchange(self, spark, sf_dir):
        # change detection (lag) and interval closing (lead) partition by
        # the same key: one exchange, two in-partition sorts, no join
        plan = plan_of(spark, sf_dir, "scd2_customer_status")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert "Join" not in plan, plan

    def test_reconcile_aggregates_before_join(self, spark, sf_dir):
        # each side collapses to <= num_buckets rows BEFORE the compare:
        # the full-outer join must sit above two aggregates, and no more
        # than the two per-side agg exchanges plus the bucket-join
        # exchange pair appear
        plan = plan_of(spark, sf_dir, "reconcile_orders_copy")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_quantize_is_shuffle_free_projection(self, spark, sf_dir):
        # int8 quantization is a pure codegen map over the vectors
        plan = plan_of(spark, sf_dir, "quantize_embeddings_int8")
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    def test_weighted_sample_grouped_no_single_partition(self, spark, sf_dir):
        # per-language top-k windows over lang partitions; nothing global
        plan = plan_of(spark, sf_dir, "weighted_sample_documents")
        assert "SinglePartition" not in plan, plan

    def test_curriculum_global_no_single_partition_window(self, spark, sf_dir):
        # the global curriculum must never sort the corpus in one task:
        # boundary pass is a 1-row aggregate, assignment is a broadcast
        # comparison — no Window node at all
        plan = plan_of(spark, sf_dir, "curriculum_global_documents")
        assert "Window" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan

    def test_salted_agg_two_phase_exchange(self, spark, sf_dir):
        # the skew remedy's signature plan: partial aggregate exchanged on
        # (key, _salt) — the hot key spreads over the salt space — then the
        # tiny merge exchanged on the key alone; exactly two exchanges
        plan = plan_of(spark, sf_dir, "salted_agg_lineitem")
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("_salt" in p and "skew_key" in p for p in parts), parts
        assert any("_salt" not in p and "skew_key" in p for p in parts), parts
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan

    def test_trend_two_aggregations_no_join(self, spark, sf_dir):
        # OLS from covariance aggregates: two map-side-combined groupBys,
        # no join, nothing in Python
        plan = plan_of(spark, sf_dir, "trend_slope_daily")
        assert "Join" not in plan, plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
