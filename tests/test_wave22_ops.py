"""Unit tests for the round-8 wave-22 operators: Cohen's kappa,
token fertility, PII rate report."""

import pytest

from pyspark.sql import functions as F


class TestCohensKappa:
    def test_perfect_agreement(self, spark):
        from pramen_spark.operators.evalmetrics import cohens_kappa

        rows = [("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")]
        df = spark.createDataFrame(rows, "x string, y string")
        r = cohens_kappa(df, "x", "y").collect()[0]
        assert r["po"] == 1.0 and r["kappa"] == 1.0

    def test_hand_computed(self, spark):
        from pramen_spark.operators.evalmetrics import cohens_kappa

        # classic 2x2: a-a 20, a-b 5, b-a 10, b-b 15 (n=50)
        rows = (
            [("a", "a")] * 20 + [("a", "b")] * 5
            + [("b", "a")] * 10 + [("b", "b")] * 15
        )
        df = spark.createDataFrame(rows, "x string, y string")
        r = cohens_kappa(df, "x", "y").collect()[0]
        # po = 35/50 = 0.7 ; pe = (25*30 + 25*20)/2500 = 0.5
        assert r["po"] == 0.7 and r["pe"] == 0.5
        assert r["kappa"] == pytest.approx(0.4)

    def test_constant_labels_null(self, spark):
        from pramen_spark.operators.evalmetrics import cohens_kappa

        df = spark.createDataFrame(
            [("a", "a"), ("a", "a")], "x string, y string"
        )
        r = cohens_kappa(df, "x", "y").collect()[0]
        assert r["pe"] == 1.0 and r["kappa"] is None


class TestTokenFertility:
    def test_exact_ratio(self, spark):
        from pramen_spark.operators.text import token_fertility

        rows = [("en", "ab cd"), ("en", "efg"), ("de", "Donau dampf")]
        df = spark.createDataFrame(rows, "lang string, text string")
        out = {r["grp"]: r for r in token_fertility(df).collect()}
        # en: chars 5+3 = 8, tokens 2+1 = 3
        assert out["en"]["n_chars"] == 8 and out["en"]["n_tokens"] == 3
        assert out["en"]["chars_per_token"] == pytest.approx(
            round(8 / 3, 6)
        )
        assert out["de"]["n_docs"] == 1

    def test_blank_docs_dropped(self, spark):
        from pramen_spark.operators.text import token_fertility

        df = spark.createDataFrame(
            [("en", "  "), ("en", "x")], "lang string, text string"
        )
        out = token_fertility(df).collect()
        assert len(out) == 1 and out[0]["n_docs"] == 1


class TestPiiRate:
    def test_rates_and_spans(self, spark):
        from pramen_spark.operators.text import pii_rate

        rows = [
            ("s1", "mail me a@b.com and c@d.org"),   # 2 email spans
            ("s1", "clean text"),
            ("s2", "host 10.0.0.1"),
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        out = {r["grp"]: r for r in pii_rate(df, "source").collect()}
        s1 = out["s1"]
        assert s1["docs_email"] == 1 and s1["spans_email"] == 2
        assert s1["rate_email"] == 0.5
        assert s1["docs_ipv4"] == 0
        s2 = out["s2"]
        assert s2["docs_ipv4"] == 1 and s2["rate_ipv4"] == 1.0

    def test_phone_and_ssn_disjoint(self, spark):
        from pramen_spark.operators.text import pii_rate

        df = spark.createDataFrame(
            [("s", "call (555) 123-4567 ssn 123-45-6789")],
            "source string, text string",
        )
        r = pii_rate(df, "source").collect()[0]
        assert r["spans_phone"] == 1
        assert r["spans_ssn"] == 1
