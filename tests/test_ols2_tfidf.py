"""Round-9 wave: two-regressor OLS and sparse TF-IDF cosine pairs."""

import pytest
from pyspark.sql import functions as F

from pramen_spark.operators.drift import ols2_fit
from pramen_spark.operators.text import tfidf_cosine_pairs


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    s = build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )
    yield s


class TestOls2:
    def test_recovers_exact_plane(self, spark):
        # y = 2 + 3*x1 - 1.5*x2 with no noise -> exact recovery, r2 = 1
        rows = [
            (float(a), float(b), 2.0 + 3.0 * a - 1.5 * b)
            for a in range(10)
            for b in range(7)
        ]
        df = spark.createDataFrame(rows, ["x1", "x2", "y"])
        r = ols2_fit(df, F.col("x1"), F.col("x2"), F.col("y")).collect()[0]
        assert r["n"] == 70
        assert abs(r["b0"] - 2.0) < 1e-6
        assert abs(r["b1"] - 3.0) < 1e-6
        assert abs(r["b2"] + 1.5) < 1e-6
        assert abs(r["r2"] - 1.0) < 1e-6

    def test_collinear_regressors_yield_null(self, spark):
        rows = [(float(a), 2.0 * a, float(a)) for a in range(10)]
        df = spark.createDataFrame(rows, ["x1", "x2", "y"])
        r = ols2_fit(df, F.col("x1"), F.col("x2"), F.col("y")).collect()[0]
        assert r["b1"] is None and r["b2"] is None  # singular system

    def test_separates_correlated_drivers(self, spark):
        import random

        rng = random.Random(5)
        rows = []
        for _ in range(500):
            x1 = rng.uniform(0, 10)
            x2 = 0.5 * x1 + rng.uniform(0, 5)  # correlated with x1
            rows.append((x1, x2, 1.0 + 2.0 * x1 + 4.0 * x2))
        df = spark.createDataFrame(rows, ["x1", "x2", "y"])
        r = ols2_fit(df, F.col("x1"), F.col("x2"), F.col("y")).collect()[0]
        # a single-feature fit of y on x1 would blend in x2's effect;
        # the two-regressor fit separates them exactly
        assert abs(r["b1"] - 2.0) < 1e-4
        assert abs(r["b2"] - 4.0) < 1e-4


class TestTfidfCosinePairs:
    def _docs(self, spark):
        rows = [
            (1, "quantum entanglement superposition decoherence"),
            (2, "quantum entanglement superposition collapse"),
            (3, "football match referee goal"),
            (4, "the the the the the"),  # only a ubiquitous token
            (5, "football match referee goal"),  # exact dup of 3
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_rare_vocabulary_similarity(self, spark):
        out = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                self._docs(spark), max_token_docfreq=3, min_sim=0.1
            ).collect()
        }
        assert out[(3, 5)] == 1.0  # identical docs -> exact 1 after norm
        assert out[(1, 2)] > 0.5  # share 3 of 4 rare tokens
        assert not any(4 in p for p in out)  # no rare token at all

    def test_docfreq_cap_is_recall_envelope(self, spark):
        # with cap 1 every shared token is over-cap -> no pairs at all
        out = tfidf_cosine_pairs(
            self._docs(spark), max_token_docfreq=1, min_sim=0.0
        ).collect()
        assert out == []
