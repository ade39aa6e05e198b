"""Unit tests for the round-8 wave-27 operator: term growth (the
other wave-27 queries are pure compositions covered by their oracle
rows)."""

import math

import pytest

from pyspark.sql import functions as F


class TestTermGrowth:
    def test_growth_direction_and_smoothing(self, spark):
        from pramen_spark.operators.text import term_growth

        # even doc_ids = half 1, odd = half 2
        rows = [
            (0, "old old stuff"),
            (2, "old thing"),
            (4, "old thing"),
            (1, "new thing"),
            (3, "new thing"),
            (5, "new stuff"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r for r in
               term_growth(df, min_df=2).collect()}
        # 'old' df: 3 in half1, 0 in half2 -> negative growth
        assert out["old"]["df_1"] == 3 and out["old"]["df_2"] == 0
        assert out["old"]["growth"] < 0
        # 'new': 0 -> 3: positive, symmetric magnitude
        assert out["new"]["growth"] > 0
        assert out["new"]["growth"] == pytest.approx(
            -out["old"]["growth"], abs=1e-6
        )
        # 'thing' balanced 2 vs 2: growth 0
        assert out["thing"]["growth"] == 0.0

    def test_exact_log_odds(self, spark):
        from pramen_spark.operators.text import term_growth

        rows = [(0, "a"), (2, "a"), (1, "a b"), (3, "b")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r for r in term_growth(df, min_df=1).collect()}
        # n1 = 2, n2 = 2; 'a': df1 2, df2 1
        expect = math.log((1 + 1) / (2 + 2)) - math.log((2 + 1) / (2 + 2))
        assert out["a"]["growth"] == pytest.approx(round(expect, 6), abs=1e-6)

    def test_min_df_filter(self, spark):
        from pramen_spark.operators.text import term_growth

        rows = [(0, "common rare"), (1, "common")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        toks = {r["token"] for r in term_growth(df, min_df=2).collect()}
        assert toks == {"common"}

    def test_per_doc_dedup(self, spark):
        from pramen_spark.operators.text import term_growth

        df = spark.createDataFrame(
            [(0, "echo echo"), (1, "echo")], "doc_id long, text string"
        )
        r = term_growth(df, min_df=1).collect()[0]
        assert r["df_1"] == 1 and r["df_2"] == 1
