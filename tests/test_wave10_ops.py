"""Unit tests for the round-8 wave-10 operators: count-min sketch,
trailing-window distinct, top-k recall, Poisson-bootstrap CI, and BPE
merge-candidate counting."""

import datetime

import pytest

from pyspark.sql import functions as F


class TestCountMinSketch:
    def test_estimate_never_undercounts_and_is_tight_when_sparse(self, spark):
        from pramen_spark.operators.sketches import cms_build, cms_estimate

        rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "k string")
        sk = cms_build(df, "k", width=256, depth=4)
        keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
        got = {
            r["k"]: r["est"]
            for r in cms_estimate(sk, keys, "k", width=256, depth=4).collect()
        }
        # 3 keys in a 256-wide sketch: no collisions, estimates exact
        assert got == {"a": 10, "b": 3, "c": 1}

    def test_missing_key_estimates_zero(self, spark):
        from pramen_spark.operators.sketches import cms_build, cms_estimate

        df = spark.createDataFrame([("a",)] * 5, "k string")
        sk = cms_build(df, "k", width=256, depth=4)
        keys = spark.createDataFrame([("zzz",)], "k string")
        est = cms_estimate(sk, keys, "k", width=256, depth=4).collect()[0]
        assert est["est"] == 0

    def test_sketch_size_is_bounded(self, spark):
        from pramen_spark.operators.sketches import cms_build

        df = spark.createDataFrame([(str(i % 97),) for i in range(2000)], "k string")
        sk = cms_build(df, "k", width=64, depth=3)
        assert sk.count() <= 64 * 3
        # total mass per depth row equals the input row count
        per_row = {r["row_i"]: r["s"] for r in sk.groupBy("row_i").agg(F.sum("n").alias("s")).collect()}
        assert per_row == {0: 2000, 1: 2000, 2: 2000}

    def test_sketches_merge_by_cell_sum(self, spark):
        from pramen_spark.operators.sketches import cms_build, cms_estimate

        d1 = spark.createDataFrame([("a",)] * 4, "k string")
        d2 = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "k string")
        merged = (
            cms_build(d1, "k", width=128, depth=3)
            .unionByName(cms_build(d2, "k", width=128, depth=3))
            .groupBy("row_i", "col")
            .agg(F.sum("n").alias("n"))
        )
        keys = spark.createDataFrame([("a",), ("b",)], "k string")
        got = {
            r["k"]: r["est"]
            for r in cms_estimate(merged, keys, "k", width=128, depth=3).collect()
        }
        assert got == {"a": 10, "b": 2}


class TestTrailingDistinct:
    def _df(self, spark, rows):
        data = [(datetime.datetime(2024, 1, d, 12), u) for d, u in rows]
        return spark.createDataFrame(data, "ts timestamp, user_id long")

    def test_window_accumulates_and_dedups(self, spark):
        from pramen_spark.operators.timegrid import trailing_distinct

        df = self._df(spark, [(1, 100), (2, 100), (2, 200), (5, 300)])
        got = {
            str(r["day"]): r["active_7d"]
            for r in trailing_distinct(df, "ts", "user_id", 7).collect()
        }
        # day 2 window covers days 1-2: users {100, 200}; day 5 covers
        # 1-5: {100, 200, 300}; only days present in data are reported
        assert got == {"2024-01-01": 1, "2024-01-02": 2, "2024-01-05": 3}

    def test_old_days_age_out(self, spark):
        from pramen_spark.operators.timegrid import trailing_distinct

        df = self._df(spark, [(1, 100), (10, 200)])
        got = {
            str(r["day"]): r["active_7d"]
            for r in trailing_distinct(df, "ts", "user_id", 7).collect()
        }
        assert got["2024-01-10"] == 1  # day 1 is outside [4, 10]

    def test_window_days_parameter(self, spark):
        from pramen_spark.operators.timegrid import trailing_distinct

        df = self._df(spark, [(1, 100), (10, 200)])
        got = {
            str(r["day"]): r["active_10d"]
            for r in trailing_distinct(df, "ts", "user_id", 10).collect()
        }
        assert got["2024-01-10"] == 2


class TestTopkRecall:
    def test_overlap_and_recall(self, spark):
        from pramen_spark.operators.similarity import topk_recall

        exact = spark.createDataFrame(
            [(1, v) for v in (10, 11, 12)] + [(2, v) for v in (20, 21, 22)],
            "query_id long, vec_id long",
        )
        approx = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 99), (2, 77), (2, 88), (2, 99)],
            "query_id long, vec_id long",
        )
        got = {
            r["query_id"]: (r["n_overlap"], r["recall_at_3"])
            for r in topk_recall(approx, exact, k=3).collect()
        }
        assert got[1] == (2, pytest.approx(0.6667, abs=1e-4))
        assert got[2] == (0, 0.0)


class TestBootstrapMeanCi:
    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        from pramen_spark.operators.sampling import bootstrap_mean_ci

        df = spark.createDataFrame(
            [(i, float(i % 20)) for i in range(400)], "id long, v double"
        )
        a = bootstrap_mean_ci(df, "v", "id").collect()[0]
        b = bootstrap_mean_ci(df, "v", "id").collect()[0]
        assert a["n_rows"] == 400 and a["n_boot"] == 50
        assert a["ci_lo"] < a["mean_value"] < a["ci_hi"]
        assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])
        # sd ~ 5.77/sqrt(400) ~ 0.29: the 95% band is within ~4 se
        assert a["ci_hi"] - a["ci_lo"] < 4 * 0.29
        assert a["mean_value"] == pytest.approx(9.5)

    def test_seed_changes_interval(self, spark):
        from pramen_spark.operators.sampling import bootstrap_mean_ci

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id long, v double"
        )
        a = bootstrap_mean_ci(df, "v", "id", seed="s1").collect()[0]
        b = bootstrap_mean_ci(df, "v", "id", seed="s2").collect()[0]
        assert (a["ci_lo"], a["ci_hi"]) != (b["ci_lo"], b["ci_hi"])

    def test_poisson_weights_distribution(self, spark):
        from pramen_spark.operators.sampling import _hash_unit, _poisson_weight

        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        w = df.select(_poisson_weight(_hash_unit("id")).alias("w"))
        stats = w.agg(
            F.avg("w").alias("m"), F.sum((F.col("w") == 0).cast("int")).alias("z")
        ).collect()[0]
        # Poisson(1): mean 1, P(0) = e^-1 ~ 0.368
        assert stats["m"] == pytest.approx(1.0, abs=0.05)
        assert stats["z"] / 5000 == pytest.approx(0.368, abs=0.03)


class TestBpeMergeCandidates:
    def test_pairs_weighted_by_word_frequency(self, spark):
        from pramen_spark.operators.text import bpe_merge_candidates

        df = spark.createDataFrame(
            [(1, "low low low lower")], "doc_id long, text string"
        )
        got = {
            r["pair"]: r["weight"]
            for r in bpe_merge_candidates(df, top_n=10).collect()
        }
        # 'lo' and 'ow' appear in 'low' (x3) and 'lower' (x1) = 4 each;
        # 'we','er' only in 'lower'
        assert got["lo"] == 4 and got["ow"] == 4
        assert got["we"] == 1 and got["er"] == 1

    def test_pair_multiplicity_within_word(self, spark):
        from pramen_spark.operators.text import bpe_merge_candidates

        df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
        got = {
            r["pair"]: r["weight"]
            for r in bpe_merge_candidates(df, top_n=5).collect()
        }
        assert got == {"aa": 2}  # positions 1-2 and 2-3

    def test_single_char_words_ignored(self, spark):
        from pramen_spark.operators.text import bpe_merge_candidates

        df = spark.createDataFrame([(1, "a b c ab")], "doc_id long, text string")
        got = {
            r["pair"]: r["weight"]
            for r in bpe_merge_candidates(df, top_n=5).collect()
        }
        assert got == {"ab": 1}
