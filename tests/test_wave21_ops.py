"""Unit tests for the round-8 wave-21 operators: Simpson diversity,
decayed value, duplicate-transaction screen, token nPMI, growth
accounting."""

import math

import pytest

from pyspark.sql import functions as F


class TestSimpsonDiversity:
    def test_exact_values(self, spark):
        from pramen_spark.operators.features import simpson_diversity

        rows = (
            [(1, "a")] * 2 + [(1, "b")] * 2   # 2+2: D = 1 - (2+2)/12 = 2/3
            + [(2, "a")] * 3                   # monotype: D = 0
            + [(3, "a")]                       # single obs: NULL
        )
        df = spark.createDataFrame(rows, "u long, t string")
        out = {r["entity"]: r for r in
               simpson_diversity(df, "u", "t").collect()}
        assert out[1]["simpson_d"] == pytest.approx(round(2 / 3, 6))
        assert out[1]["richness"] == 2 and out[1]["n_obs"] == 4
        assert out[2]["simpson_d"] == 0.0
        assert out[3]["simpson_d"] is None


class TestDecayedValue:
    def test_exact_halving(self, spark):
        from pramen_spark.operators.features import decayed_value

        rows = [
            (1, "2024-01-31", 100.0),  # age 0 -> weight 1
            (1, "2024-01-10", 100.0),  # age 21 -> k=3 -> 1/8
            (2, "2024-01-31", 40.0),   # horizon day, weight 1
        ]
        df = spark.createDataFrame(rows, "c long, d string, v double")
        out = {r["entity"]: r for r in decayed_value(
            df, "c", "d", F.col("v"), half_life_days=7
        ).collect()}
        assert out[1]["raw_value"] == 200.0
        assert out[1]["decayed_value"] == pytest.approx(100.0 + 12.5)
        assert out[2]["decayed_value"] == 40.0

    def test_ancient_weights_zero(self, spark):
        from pramen_spark.operators.features import decayed_value

        rows = [(1, "2024-01-01", 100.0), (1, "1724-01-01", 100.0)]
        df = spark.createDataFrame(rows, "c long, d string, v double")
        r = decayed_value(df, "c", "d", F.col("v"), half_life_days=1).collect()[0]
        # 300-year-old txn: k >> 62 -> exactly zero contribution
        assert r["decayed_value"] == 100.0 and r["raw_value"] == 200.0


class TestDuplicateTransactionScreen:
    def test_burst_flags_adjacent_pairs(self, spark):
        from pramen_spark.operators.validation import (
            duplicate_transaction_screen,
        )

        rows = [
            (1, 9.99, "2024-01-01", 10),
            (1, 9.99, "2024-01-03", 11),
            (1, 9.99, "2024-01-20", 12),   # gap 17 > 7: not flagged
            (2, 9.99, "2024-01-01", 20),   # different entity
            (1, 5.00, "2024-01-01", 30),   # different amount
        ]
        df = spark.createDataFrame(rows, "e long, amt double, d string, id long")
        out = duplicate_transaction_screen(
            df, "e", "amt", "d", "id", window_days=7
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["first_id"], r["second_id"], r["gap_days"]) == (10, 11, 2)

    def test_same_day_tiebreak(self, spark):
        from pramen_spark.operators.validation import (
            duplicate_transaction_screen,
        )

        rows = [(1, 2.0, "2024-01-01", 7), (1, 2.0, "2024-01-01", 3)]
        df = spark.createDataFrame(rows, "e long, amt double, d string, id long")
        r = duplicate_transaction_screen(
            df, "e", "amt", "d", "id", window_days=7
        ).collect()[0]
        assert (r["first_id"], r["second_id"], r["gap_days"]) == (3, 7, 0)


class TestTokenNpmi:
    def test_perfect_collocation(self, spark):
        from pramen_spark.operators.itemsets import token_npmi

        # "new york" always together in half the docs -> npmi = 1
        rows = [(1, "new york"), (2, "new york"), (3, "boston"), (4, "boston")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["item_a"], r["item_b"]): r
               for r in token_npmi(df, min_support=0.1).collect()}
        r = out[("new", "york")]
        assert r["pair_count"] == 2 and r["support"] == 0.5
        # pmi = ln(0.5 / (0.5*0.5)) = ln 2 ; npmi = ln2 / -ln(0.5) = 1
        assert r["pmi"] == pytest.approx(round(math.log(2), 6))
        assert r["npmi"] == pytest.approx(1.0)

    def test_independent_pair_zero_pmi(self, spark):
        from pramen_spark.operators.itemsets import token_npmi

        # a in all docs, b in all docs -> P(ab)=P(a)P(b) -> pmi 0
        rows = [(i, "a b") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = token_npmi(df, min_support=0.1).collect()[0]
        assert r["pmi"] == 0.0
        # support = 1 -> -ln(support) = 0 -> npmi NULL
        assert r["npmi"] is None


class TestGrowthAccounting:
    def test_identity_and_churn(self, spark):
        from pramen_spark.operators.sequences import growth_accounting

        day = 86_400_000_000
        rows = [
            (1, 0), (1, 1 * day), (1, 2 * day),    # active days 0,1,2
            (2, 0), (2, 2 * day),                   # skips day 1
            (3, 1 * day),                           # new day 1, churns
        ]
        df = spark.createDataFrame(rows, "user_id long, us long").select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts")
        )
        out = {str(r["day"]): r for r in
               growth_accounting(df, "user_id", "ts").collect()}
        d0 = out["1970-01-01"]
        assert (d0["dau"], d0["n_new"]) == (2, 2)
        d1 = out["1970-01-02"]
        assert d1["n_new"] == 1 and d1["n_retained"] == 1
        assert d1["n_churned"] == 1  # user 2 dark on day 1
        d2 = out["1970-01-03"]
        assert d2["n_resurrected"] == 1  # user 2 returns
        assert d2["n_churned"] == 1      # user 3 gone after day 1
        for r in out.values():  # the accounting identity
            assert r["dau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
