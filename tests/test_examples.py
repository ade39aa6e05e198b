"""The examples/ configs must run verbatim (token-substituted) — docs that
execute, so the published examples cannot rot."""

import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _materialize(name, tmp_path, tokens):
    text = open(os.path.join(EXAMPLES, name)).read()
    for k, v in tokens.items():
        text = text.replace(k, v)
    assert "%" + "MS_RAW" + "%" not in text
    path = str(tmp_path / name)
    with open(path, "w") as f:
        f.write(text)
    return path


class TestExamples:
    def test_daily_ingestion_example(self, spark, tmp_path, sf_dir):
        from pramen_spark.cli import main
        from pramen_spark.queries.catalog import load_events

        landing = str(tmp_path / "landing")
        load_events(spark, sf_dir).limit(200).write.parquet(landing)
        conf = _materialize(
            "daily_ingestion.conf",
            tmp_path,
            {
                "%BOOKKEEPING%": str(tmp_path / "bk"),
                "%MS_RAW%": str(tmp_path / "ms_raw"),
                "%MS_OUT%": str(tmp_path / "ms_out"),
                "%CSV_OUT%": str(tmp_path / "csv"),
                "%LANDING%": landing,
            },
        )
        assert main(["--workflow", conf, "--date", "2024-01-10"]) == 0
        out = spark.read.parquet(str(tmp_path / "ms_out"))
        assert out.count() > 0
        assert "value_usd" in out.columns
        assert out.filter("event_type = 'error'").count() == 0
        csvs = [f for f in os.listdir(str(tmp_path / "csv")) if f.endswith(".csv")]
        assert csvs

    def test_corpus_curation_example(self, spark, tmp_path, sf_dir):
        from pramen_spark.cli import main

        dumps = str(tmp_path / "dumps")
        spark.read.parquet(f"{sf_dir}/documents.parquet").write.parquet(dumps)
        conf = _materialize(
            "corpus_curation.conf",
            tmp_path,
            {
                "%BOOKKEEPING%": str(tmp_path / "bk"),
                "%MS_RAW%": str(tmp_path / "ms_raw"),
                "%MS_OUT%": str(tmp_path / "ms_out"),
                "%DUMPS%": dumps,
                "%SHARDS%": str(tmp_path / "shards"),
            },
        )
        sys.path.insert(0, EXAMPLES)
        try:
            assert main(["--workflow", conf, "--date", "2024-01-10"]) == 0
        finally:
            sys.path.remove(EXAMPLES)
        out = spark.read.parquet(str(tmp_path / "ms_out"))
        n_in = spark.read.parquet(dumps).count()
        n_out = out.count()
        assert 0 < n_out <= n_in  # gates + dedup only ever shrink
        assert "n_pii_total" in out.columns and "quality_score" in out.columns
        assert "pramen_info_date" in out.columns
        # the sharded export carries exactly the curated corpus
        shards = spark.read.parquet(
            str(tmp_path / "shards" / "documents_curated" / "2024-01-10")
        )
        assert shards.count() == n_out
        assert shards.select("shard_id").distinct().count() == 4

    def test_cdc_ingestion_example(self, spark, tmp_path, sf_dir):
        from pramen_spark.cli import main
        import pyspark.sql.functions as F

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        ).limit(500)
        snap_landing = str(tmp_path / "snap_landing")
        orders.write.parquet(snap_landing)
        # change batch: update every 5th price, delete every 7th key
        upd = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ).withColumn("op", F.lit("U")).withColumn("seq", F.lit(1))
        dels = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "op", F.lit("D")
        ).withColumn("seq", F.lit(2))
        changes_landing = str(tmp_path / "changes_landing")
        upd.unionByName(dels).write.parquet(changes_landing)

        conf = _materialize(
            "cdc_ingestion.conf",
            tmp_path,
            {
                "%BOOKKEEPING%": str(tmp_path / "bk"),
                "%MS_SNAP%": str(tmp_path / "ms_snap"),
                "%MS_CHANGES%": str(tmp_path / "ms_changes"),
                "%MS_CURRENT%": str(tmp_path / "ms_current"),
                "%MS_HISTORY%": str(tmp_path / "ms_history"),
                "%SNAP_LANDING%": snap_landing,
                "%CHANGES_LANDING%": changes_landing,
            },
        )
        sys.path.insert(0, EXAMPLES)
        try:
            assert main(["--workflow", conf, "--date", "2024-01-10"]) == 0
        finally:
            sys.path.remove(EXAMPLES)

        current = spark.read.parquet(str(tmp_path / "ms_current"))
        # deletes removed (delete beats the %35 update), updates applied
        assert current.filter(F.col("o_orderkey") % 7 == 0).count() == 0
        survivors_updated = current.filter(
            (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0)
        ).count()
        assert survivors_updated > 0
        merged_keys = {r.o_orderkey for r in current.select("o_orderkey").collect()}
        want_keys = {
            r.o_orderkey
            for r in orders.filter(F.col("o_orderkey") % 7 != 0).collect()
        }
        assert merged_keys == want_keys

        history = spark.read.parquet(str(tmp_path / "ms_history"))
        assert {"o_custkey", "o_orderstatus", "effective_from",
                "effective_to", "is_current"} <= set(history.columns)
        # every key has exactly one current version
        per_key = history.filter("is_current").groupBy("o_custkey").count()
        assert per_key.filter("count != 1").count() == 0

    def test_skew_guarded_aggregation_example(self, spark, tmp_path, sf_dir):
        from pyspark.sql import functions as F

        from pramen_spark.cli import main

        # skewed landing data: one bot user dominates the key histogram
        landing = str(tmp_path / "landing")
        rows = [(0, float(i % 7)) for i in range(4000)] + [
            (u, float(u)) for u in range(1, 21) for _ in range(10)
        ]
        spark.createDataFrame(rows, ["user_id", "value"]).write.parquet(landing)
        conf = _materialize(
            "skew_guarded_aggregation.conf",
            tmp_path,
            {
                "%BOOKKEEPING%": str(tmp_path / "bk"),
                "%MS_RAW%": str(tmp_path / "ms_raw"),
                "%MS_OUT%": str(tmp_path / "ms_out"),
                "%LANDING%": landing,
            },
        )
        assert main(["--workflow", conf, "--date", "2024-01-10"]) == 0
        out = spark.read.parquet(str(tmp_path / "ms_out"))
        got = {
            r["user_id"]: (r["n_rows"], r["sum_value"]) for r in out.collect()
        }
        assert got[0] == (4000, sum(float(i % 7) for i in range(4000)))
        assert got[5] == (10, 50.0)
        assert len(got) == 21
