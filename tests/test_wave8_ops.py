"""Unit tests for the round-8 wave-8 operators: bloom-pruned joins,
market-basket association pairs, the k-anonymity audit, and per-document
token entropy."""

import math

import pytest

from pyspark.sql import functions as F


class TestBloomPruneJoin:
    def test_bitmap_contains_all_keys_and_prunes(self, spark):
        from pramen_spark.operators.joins import bloom_bitmap, bloom_prune

        dim = spark.createDataFrame([(k,) for k in (3, 7, 11)], "k long")
        fact = spark.createDataFrame([(k,) for k in range(1000)], "k long")
        bm = bloom_bitmap(dim, "k")
        kept = {r["k"] for r in bloom_prune(fact, "k", bm).collect()}
        # no false negatives, and the 16 KiB bitmap over 3 keys prunes
        # essentially everything (expected FP rate ~(3*3/131072)^3)
        assert {3, 7, 11} <= kept
        assert len(kept) < 50

    def test_join_equals_plain_join(self, spark):
        from pramen_spark.operators.joins import bloom_prune_join

        dim = spark.createDataFrame(
            [(i, f"d{i}") for i in range(0, 100, 7)], "k long, name string"
        )
        fact = spark.createDataFrame(
            [(i % 100, i) for i in range(500)], "k long, v long"
        )
        got = sorted(
            (r["v"], r["name"])
            for r in bloom_prune_join(fact, dim, "k", "k").collect()
        )
        want = sorted(
            (r["v"], r["name"])
            for r in fact.join(dim, "k").collect()
        )
        assert got == want

    def test_rejects_outer_joins(self, spark):
        from pramen_spark.operators.joins import bloom_prune_join

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="inner/semi"):
            bloom_prune_join(df, df, "k", "k", how="left")

    def test_probe_stays_jvm_side(self, spark):
        from pramen_spark.operators.joins import bloom_bitmap, bloom_prune

        dim = spark.createDataFrame([(1,)], "k long")
        fact = spark.createDataFrame([(1,), (2,)], "k long")
        plan = bloom_prune(
            fact, "k", bloom_bitmap(dim, "k")
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_false_positive_rate_formula(self):
        from pramen_spark.operators.joins import false_positive_rate

        # k=3, n=1000, m=131072: (1 - e^{-3000/131072})^3
        want = (1.0 - math.exp(-3000.0 / 131072.0)) ** 3
        assert false_positive_rate(1000) == pytest.approx(want)
        assert false_positive_rate(10) < 1e-8


class TestBasketPairs:
    def _pairs(self, spark, baskets, min_support=0.0):
        from pramen_spark.operators.itemsets import basket_pairs

        rows = [(b, i) for b, items in baskets for i in items]
        df = spark.createDataFrame(rows, "basket long, item string")
        out = basket_pairs(df, "basket", "item", min_support=min_support)
        return {(r["item_a"], r["item_b"]): r for r in out.collect()}

    def test_counts_support_confidence_lift(self, spark):
        # a,b together in 2 of 4 baskets; a in 3, b in 2
        got = self._pairs(
            spark,
            [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["a"]), (4, ["c"])],
        )
        r = got[("a", "b")]
        assert r["pair_count"] == 2
        assert r["support"] == pytest.approx(0.5)
        assert r["confidence_a_to_b"] == pytest.approx(2 / 3)
        assert r["confidence_b_to_a"] == pytest.approx(1.0)
        assert r["lift"] == pytest.approx((2 * 4) / (3 * 2))

    def test_multiplicity_ignored(self, spark):
        # duplicate items inside one basket count once (presence, not qty)
        got = self._pairs(spark, [(1, ["a", "a", "b"]), (2, ["a", "b", "b"])])
        assert got[("a", "b")]["pair_count"] == 2
        assert got[("a", "b")]["support"] == pytest.approx(1.0)

    def test_apriori_min_support_prunes_items(self, spark):
        got = self._pairs(
            spark,
            [(i, ["hot", "rare" if i == 0 else "warm"]) for i in range(10)],
            min_support=0.2,
        )
        # 'rare' (support 0.1) never reaches the pair join
        assert ("hot", "rare") not in got
        assert got[("hot", "warm")]["pair_count"] == 9


class TestKAnonymityAudit:
    def test_group_size_profile(self, spark):
        from pramen_spark.operators.validation import k_anonymity_audit

        rows = (
            [("US", "a")] * 6 + [("US", "b")] * 2 + [("DE", "a")] * 1
        )
        df = spark.createDataFrame(rows, "country string, seg string")
        got = {
            r["group_size"]: r
            for r in k_anonymity_audit(df, ["country", "seg"], k=5).collect()
        }
        assert got[6]["n_groups"] == 1 and got[6]["below_k"] is False
        assert got[2]["n_groups"] == 1 and got[2]["below_k"] is True
        assert got[1]["n_groups"] == 1 and got[1]["below_k"] is True
        assert sum(r["n_rows"] for r in got.values()) == len(rows)

    def test_k_anonymity_level_is_min_size(self, spark):
        from pramen_spark.operators.validation import k_anonymity_audit

        df = spark.createDataFrame(
            [("x", i % 3) for i in range(9)], "a string, b long"
        )
        out = k_anonymity_audit(df, ["a", "b"], k=3).collect()
        assert min(r["group_size"] for r in out) == 3
        assert all(r["below_k"] is False for r in out)


class TestTokenEntropy:
    def _run(self, spark, text):
        from pramen_spark.operators.text import token_entropy

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = token_entropy(df).collect()
        return rows[0] if rows else None

    def test_uniform_distribution_max_entropy(self, spark):
        r = self._run(spark, "a b c d")
        assert r["n_tokens"] == 4 and r["n_types"] == 4
        assert r["entropy"] == pytest.approx(2.0)
        assert r["norm_entropy"] == pytest.approx(1.0)

    def test_single_type_zero_entropy_null_norm(self, spark):
        r = self._run(spark, "spam spam spam")
        assert r["entropy"] == pytest.approx(0.0)
        assert r["norm_entropy"] is None

    def test_skewed_matches_formula(self, spark):
        # counts {a:3, b:1}: H = log2(4) - (3*log2 3 + 0)/4
        r = self._run(spark, "a a a b")
        want = 2.0 - (3 * math.log2(3)) / 4.0
        assert r["entropy"] == pytest.approx(want, abs=1e-6)

    def test_tokenizer_case_and_punct(self, spark):
        # "The the, THE!" is one type repeated three times
        r = self._run(spark, "The the, THE!")
        assert r["n_tokens"] == 3 and r["n_types"] == 1

    def test_empty_document_drops_out(self, spark):
        assert self._run(spark, "...") is None
