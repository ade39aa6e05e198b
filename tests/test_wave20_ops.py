"""Unit tests for the round-8 wave-20 operators: price-volume bridge,
ABC classification, basket-size distribution, segment migration,
reactivations."""

import pytest

from pyspark.sql import functions as F


class TestPvmBridge:
    def test_effects_telescope(self, spark):
        from pramen_spark.operators.finance import pvm_bridge

        # brand X: 1996 -> 10 units @ 2.0 = 20; 1997 -> 15 units @ 3.0 = 45
        rows = [
            ("X", 1996, 10.0, 20.0),
            ("X", 1997, 15.0, 45.0),
            ("Y", 1996, 5.0, 5.0),  # absent in 1997 -> dropped
        ]
        df = spark.createDataFrame(
            rows, "brand string, yr int, qty double, amt double"
        )
        out = pvm_bridge(
            df, "brand", F.col("yr"), 1996, 1997, "qty",
            F.col("amt").cast("decimal(18,2)"),
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["grp"] == "X"
        # volume: (15-10)*2 = 10 ; price: (3-2)*15 = 15 ; total = 25
        assert r["volume_effect"] == 10.0
        assert r["price_effect"] == 15.0
        assert r["volume_effect"] + r["price_effect"] == pytest.approx(
            r["rev_b"] - r["rev_a"]
        )


class TestAbcClassification:
    def test_breakpoints(self, spark):
        from pramen_spark.operators.finance import abc_classification

        # values 50, 30, 15, 5 (total 100): cum shares 0.5, 0.8, 0.95, 1.0
        rows = [("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["abc_class"]: r for r in abc_classification(
            df, "k", F.col("v").cast("decimal(18,2)")
        ).collect()}
        assert out["A"]["n_keys"] == 2 and out["A"]["value"] == 80.0
        assert out["B"]["n_keys"] == 1 and out["B"]["share"] == 0.15
        assert out["C"]["n_keys"] == 1 and out["C"]["value"] == 5.0

    def test_tie_determinism(self, spark):
        from pramen_spark.operators.finance import abc_classification

        # equal values: order falls back to key asc; classes stable
        rows = [("k1", 10.0), ("k2", 10.0), ("k3", 10.0), ("k4", 10.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = {r["abc_class"]: r["n_keys"] for r in abc_classification(
            df, "k", F.col("v").cast("decimal(18,2)")
        ).collect()}
        # cum shares 0.25 0.5 0.75 1.0 -> A,A,A,C (0.75<=0.8; 1.0>0.95)
        assert out == {"A": 3, "C": 1}


class TestBasketSizeDistribution:
    def test_histogram(self, spark):
        from pramen_spark.operators.itemsets import basket_size_distribution

        rows = [(1,), (1,), (1,), (2,), (2,), (3,), (4,)]
        df = spark.createDataFrame(rows, "basket long")
        out = {r["basket_size"]: r for r in
               basket_size_distribution(df, "basket").collect()}
        assert out[3]["n_baskets"] == 1
        assert out[2]["n_baskets"] == 1
        assert out[1]["n_baskets"] == 2
        assert out[1]["share"] == 0.5


class TestSegmentMigration:
    def test_matrix_with_absent(self, spark):
        from pramen_spark.operators.features import segment_migration

        rows = [
            # ent 1: only period 1 -> churn row (seg_from>0, seg_to=0)
            (1, 1, 100.0),
            # ent 2: both periods
            (2, 1, 10.0), (2, 2, 10.0),
            # ent 3: only period 2 -> acquisition row
            (3, 2, 99.0),
        ]
        df = spark.createDataFrame(rows, "ent long, per int, v double")
        out = {(r["seg_from"], r["seg_to"]): r["n_entities"]
               for r in segment_migration(
                   df, "ent", F.col("per"),
                   F.col("v").cast("decimal(18,2)"), n_segments=2,
               ).collect()}
        assert sum(out.values()) == 3
        assert any(k[1] == 0 for k in out)  # a churn cell exists
        assert any(k[0] == 0 for k in out)  # an acquisition cell exists


class TestReactivations:
    def test_threshold(self, spark):
        from pramen_spark.operators.sequences import reactivations

        day = 86_400_000_000
        rows = [
            (1, 0), (1, 1 * day), (1, 10 * day),  # gap 9 -> reactivation
            (2, 0), (2, 2 * day),                  # gap 2 -> not with k=2
        ]
        df = spark.createDataFrame(rows, "user_id long, us long").select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts")
        )
        out = {str(r["day"]): r["n_reactivated"]
               for r in reactivations(df, "user_id", "ts",
                                      dormancy_days=2).collect()}
        assert out == {"1970-01-11": 1}

    def test_multiple_same_day(self, spark):
        from pramen_spark.operators.sequences import reactivations

        day = 86_400_000_000
        rows = [(1, 0), (1, 9 * day), (2, 0), (2, 9 * day)]
        df = spark.createDataFrame(rows, "user_id long, us long").select(
            "user_id", F.timestamp_micros(F.col("us")).alias("ts")
        )
        out = reactivations(df, "user_id", "ts", dormancy_days=3).collect()
        assert len(out) == 1 and out[0]["n_reactivated"] == 2
