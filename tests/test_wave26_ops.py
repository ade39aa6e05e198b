"""Unit tests for the round-8 wave-26 operators: lateness profile and
near-zero-variance screen."""

import pytest

from pyspark.sql import functions as F


class TestLatenessProfile:
    def _df(self, spark, rows):
        # rows: (user, arrival_order, ts_us)
        return spark.createDataFrame(
            rows, "u long, arr long, us long"
        ).select("u", "arr", F.timestamp_micros(F.col("us")).alias("ts"))

    def test_in_order_stream_no_lateness(self, spark):
        from pramen_spark.streaming.stream import lateness_profile

        rows = [(1, i, i * 1_000_000) for i in range(5)]
        r = lateness_profile(
            self._df(spark, rows), "u", "ts", "arr"
        ).collect()[0]
        assert r["n"] == 4  # first arrival has no watermark
        assert r["n_late"] == 0 and r["late_share"] == 0.0
        assert r["max_s"] == 0.0

    def test_late_event_measured(self, spark):
        from pramen_spark.streaming.stream import lateness_profile

        # arrival order 0,1,2 but event times 10s, 20s, then 5s (15s late)
        rows = [(1, 0, 10_000_000), (1, 1, 20_000_000), (1, 2, 5_000_000)]
        r = lateness_profile(
            self._df(spark, rows), "u", "ts", "arr"
        ).collect()[0]
        assert r["n"] == 2 and r["n_late"] == 1
        assert r["max_s"] == 15.0
        assert r["late_share"] == 0.5

    def test_per_key_watermarks_independent(self, spark):
        from pramen_spark.streaming.stream import lateness_profile

        # user 2's early timestamps are NOT late vs user 1's watermark
        rows = [(1, 0, 100_000_000), (1, 1, 200_000_000),
                (2, 0, 1_000_000), (2, 1, 2_000_000)]
        r = lateness_profile(
            self._df(spark, rows), "u", "ts", "arr"
        ).collect()[0]
        assert r["n_late"] == 0


class TestNzvScreen:
    def test_constant_and_varied(self, spark):
        from pramen_spark.operators.validation import nzv_screen

        rows = [(1.0, float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "c double, v double")
        out = {r["col_name"]: r for r in nzv_screen(df, ["c", "v"]).collect()}
        assert out["c"]["mode_share"] == 1.0
        assert out["c"]["n_distinct"] == 1
        assert out["c"]["mode_value"] == 1.0
        assert out["v"]["mode_share"] == 0.1
        assert out["v"]["distinct_ratio"] == 1.0

    def test_mode_tiebreak_deterministic(self, spark):
        from pramen_spark.operators.validation import nzv_screen

        # two values tied at count 2: larger value wins the struct max
        rows = [(3.0,), (3.0,), (7.0,), (7.0,)]
        df = spark.createDataFrame(rows, "x double")
        r = nzv_screen(df, ["x"]).collect()[0]
        assert r["mode_value"] == 7.0 and r["mode_share"] == 0.5
