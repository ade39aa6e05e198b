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
