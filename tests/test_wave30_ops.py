"""Unit tests for the round-8 wave-30 operator: grouped Gini (the
other wave-30 queries are pure compositions covered by their oracle
rows)."""

import pytest

from pyspark.sql import functions as F


class TestGiniByGroup:
    def test_equal_vs_concentrated(self, spark):
        from pramen_spark.operators.evalmetrics import gini_by_group

        rows = (
            # group 'flat': everyone equal -> gini 0 (up to 1/n term)
            [("flat", i, 10.0) for i in range(1, 5)]
            # group 'mono': one entity holds everything
            + [("mono", 1, 100.0), ("mono", 2, 0.0),
               ("mono", 3, 0.0), ("mono", 4, 0.0)]
        )
        df = spark.createDataFrame(rows, "g string, id long, x double")
        out = {r["grp"]: r for r in
               gini_by_group(df, "g", "x", "id").collect()}
        assert out["flat"]["gini"] == 0.0
        # n=4, all mass at rank 4: G = 2*4/4 - 5/4 = 0.75
        assert out["mono"]["gini"] == pytest.approx(0.75)
        assert out["mono"]["total"] == 100.0

    def test_matches_global_gini_on_single_group(self, spark):
        from pramen_spark.operators.evalmetrics import gini, gini_by_group

        rows = [(i, float(i * i)) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "id long, x double")
        g_global = gini(df, "x", "id").collect()[0]["gini"]
        df2 = df.withColumn("g", F.lit("only"))
        g_grouped = gini_by_group(df2, "g", "x", "id").collect()[0]["gini"]
        assert g_grouped == g_global
