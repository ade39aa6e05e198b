"""Skew-action operators (operators/skew.py): salted aggregation and the
salt-replicated join must be RESULT-invariant to salting — the salt only
moves where partials are computed — and recommend_salts must turn the
key_skew_profile measurement into a sane decision."""

import pytest
from pyspark.sql import functions as F

from pramen_spark.operators.skew import recommend_salts, salted_agg, salted_join


def skewed_df(spark, n=2000, hot_share=10):
    """key 0 holds ~1/hot_share of all rows; the rest spread uniformly."""
    return (
        spark.range(n)
        .select(
            F.when(F.col("id") % hot_share == 0, F.lit(0))
            .otherwise((F.col("id") % 97) + 1)
            .alias("k"),
            (F.col("id") % 13).cast("long").alias("v"),
            (F.col("id") % 7).cast("double").alias("w"),
        )
    )


class TestSaltedAgg:
    def test_salted_equals_unsalted(self, spark):
        df = skewed_df(spark)
        plain = (
            df.groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("v").alias("sum_v"),
                F.min("v").alias("min_v"),
                F.max("w").alias("max_w"),
            )
        )
        salted = salted_agg(
            df, ["k"], sum_cols=["v"], min_cols=["v"], max_cols=["w"], n_salts=16
        ).select("k", "n_rows", "sum_v", "min_v", "max_w")
        assert sorted(plain.collect()) == sorted(salted.collect())

    @pytest.mark.parametrize("n_salts", [1, 2, 64])
    def test_invariant_to_salt_count(self, spark, n_salts):
        df = skewed_df(spark, n=500)
        got = salted_agg(df, ["k"], sum_cols=["v"], n_salts=n_salts)
        base = salted_agg(df, ["k"], sum_cols=["v"], n_salts=5)
        assert sorted(got.collect()) == sorted(base.collect())

    def test_multi_group_cols(self, spark):
        df = skewed_df(spark).withColumn("g", F.col("v") % 2)
        plain = df.groupBy("k", "g").agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        salted = salted_agg(df, ["k", "g"], n_salts=8)
        assert sorted(plain.collect()) == sorted(salted.collect())

    def test_rejects_bad_salt_count(self, spark):
        with pytest.raises(ValueError, match="n_salts"):
            salted_agg(skewed_df(spark, n=10), ["k"], n_salts=0)

    def test_two_phase_plan(self, spark):
        import re

        df = skewed_df(spark, n=100)
        agg = salted_agg(df, ["k"], sum_cols=["v"], n_salts=4)
        plan = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("_salt" in p for p in parts), parts
        assert any("_salt" not in p and "k#" in p for p in parts), parts


class TestSaltedJoin:
    def test_inner_equals_plain(self, spark):
        df = skewed_df(spark)
        dim = df.groupBy("k").agg(F.sum("v").alias("s"))
        plain = df.join(dim, "k").select("k", "v", "s")
        salted = salted_join(df, dim, ["k"], n_salts=8).select("k", "v", "s")
        assert sorted(plain.collect()) == sorted(salted.collect())

    def test_left_keeps_unmatched(self, spark):
        df = skewed_df(spark, n=200)
        dim = (
            df.groupBy("k")
            .agg(F.sum("v").alias("s"))
            .filter(F.col("k") % 2 == 0)  # half the keys have no dim row
        )
        plain = df.join(dim, "k", "left").select("k", "v", "s")
        salted = salted_join(df, dim, ["k"], n_salts=4, how="left").select(
            "k", "v", "s"
        )
        assert sorted(plain.collect(), key=str) == sorted(
            salted.collect(), key=str
        )

    def test_rejects_outer_joins(self, spark):
        df = skewed_df(spark, n=10)
        for how in ("right", "full", "left_semi", "left_anti"):
            with pytest.raises(ValueError, match="inner/left"):
                salted_join(df, df, ["k"], how=how)

    def test_join_runs_on_salt_key(self, spark):
        import re

        df = skewed_df(spark, n=300)
        dim = df.groupBy("k").agg(F.sum("v").alias("s"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = salted_join(df, dim, ["k"], n_salts=4)
            plan = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "formatted"
            )
            # the join's required distribution must include the salt: the
            # hot key's probe rows land on n_salts reducers, not one
            assert re.search(r"Left keys \[2\]: \[k#\d+L?, _salt#\d+\]", plan), plan
            assert re.search(r"hashpartitioning\(k#\d+L?, _salt#\d+", plan), plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestRecommendSalts:
    def test_no_salting_on_uniform_key(self, spark):
        df = spark.range(1000).select((F.col("id") % 50).alias("k"))
        assert recommend_salts(df, "k") == 1

    def test_salts_grow_with_skew(self, spark):
        df = skewed_df(spark, n=3000, hot_share=5)  # hot key ~20% of rows
        n = recommend_salts(df, "k")
        assert n > 1
        hotter = skewed_df(spark, n=3000, hot_share=2)  # hot key ~50%
        assert recommend_salts(hotter, "k") >= n

    def test_clamped_to_max(self, spark):
        df = spark.range(2000).select(
            F.when(F.col("id") < 1990, F.lit(0)).otherwise(F.col("id")).alias("k")
        )
        assert recommend_salts(df, "k", max_salts=16) == 16
