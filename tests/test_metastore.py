"""Metastore persistence round-trips (reference semantics:
MetastorePersistenceParquet.scala:55-207, MetastoreImpl.scala:92-129,
TransientTableManager.scala:26-90)."""

import datetime as dt
import os

import pytest

from pramen_spark.config.models import CachePolicy, DataFormat, PartitionInfo, TableConfig
from pramen_spark.metastore.metastore import Metastore

D = dt.date


def mk_df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


@pytest.fixture()
def ms(spark, tmp_path):
    t1 = TableConfig(name="table1", format=DataFormat.parquet(str(tmp_path / "table1")))
    t2 = TableConfig(name="trans1", format=DataFormat.transient(CachePolicy.NO_CACHE))
    return Metastore(spark, [t1, t2], temp_dir=str(tmp_path / "tmp"))


class TestParquetRoundTrip:
    def test_write_read_one_date(self, spark, ms):
        res = ms.save_table("table1", mk_df(spark, [(1, "a"), (2, "b")]), D(2022, 1, 1))
        assert res.records == 2
        out = ms.get_table("table1", D(2022, 1, 1), D(2022, 1, 1))
        assert out.count() == 2
        assert "pramen_info_date" in out.columns
        assert {r["pramen_info_date"] for r in out.collect()} == {D(2022, 1, 1)}

    def test_partition_dir_layout(self, spark, ms, tmp_path):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        assert os.path.isdir(str(tmp_path / "table1" / "pramen_info_date=2022-01-01"))

    def test_overwrite_partition_is_idempotent(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a"), (2, "b")]), D(2022, 1, 1))
        ms.save_table("table1", mk_df(spark, [(3, "c")]), D(2022, 1, 1))
        out = ms.get_table("table1", D(2022, 1, 1), D(2022, 1, 1))
        assert [r["id"] for r in out.collect()] == [3]

    def test_range_read(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        ms.save_table("table1", mk_df(spark, [(2, "b")]), D(2022, 1, 2))
        ms.save_table("table1", mk_df(spark, [(3, "c")]), D(2022, 1, 3))
        out = ms.get_table("table1", D(2022, 1, 1), D(2022, 1, 2))
        assert sorted(r["id"] for r in out.collect()) == [1, 2]
        assert ms.get_table("table1").count() == 3

    def test_get_latest(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        ms.save_table("table1", mk_df(spark, [(2, "b")]), D(2022, 1, 5))
        assert ms.get_latest_available_date("table1") == D(2022, 1, 5)
        assert ms.get_latest_available_date("table1", until=D(2022, 1, 4)) == D(2022, 1, 1)
        out = ms.get_latest("table1", until=D(2022, 1, 4))
        assert [r["id"] for r in out.collect()] == [1]

    def test_info_date_column_replaced_not_duplicated(self, spark, ms):
        df = mk_df(spark, [(1, "a")]).withColumn("pramen_info_date", __import__("pyspark").sql.functions.lit("1990-01-01").cast("date"))
        ms.save_table("table1", df, D(2022, 1, 1))
        out = ms.get_table("table1", D(2022, 1, 1), D(2022, 1, 1))
        assert out.columns.count("pramen_info_date") == 1
        assert {r["pramen_info_date"] for r in out.collect()} == {D(2022, 1, 1)}

    def test_explicit_repartition(self, spark, tmp_path):
        cfg = TableConfig(
            name="t",
            format=DataFormat.parquet(
                str(tmp_path / "t"), partition_info=PartitionInfo.explicit(3)
            ),
        )
        ms2 = Metastore(spark, [cfg])
        ms2.save_table("t", mk_df(spark, [(i, str(i)) for i in range(100)]), D(2022, 1, 1))
        part_dir = str(tmp_path / "t" / "pramen_info_date=2022-01-01")
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        assert len(files) == 3


class TestTransient:
    def test_round_trip(self, spark, ms):
        ms.save_table("trans1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        out = ms.get_table("trans1", D(2022, 1, 1), D(2022, 1, 1))
        assert out.count() == 1

    def test_range_union(self, spark, ms):
        ms.save_table("trans1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        ms.save_table("trans1", mk_df(spark, [(2, "b")]), D(2022, 1, 2))
        out = ms.get_table("trans1", D(2022, 1, 1), D(2022, 1, 2))
        assert out.count() == 2


class TestReaderScoping:
    def test_scope_enforced(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        reader = ms.get_reader(["table1"], D(2022, 1, 2))
        assert reader.get_table("table1").count() == 1
        with pytest.raises(PermissionError):
            reader.get_table("trans1")

    def test_no_future_peek_by_default(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        ms.save_table("table1", mk_df(spark, [(2, "b")]), D(2022, 1, 5))
        reader = ms.get_reader(["table1"], D(2022, 1, 2))
        assert reader.get_table("table1").count() == 1


class TestMetadataManager:
    def test_get_set_delete(self):
        from pramen_spark.metastore.metadata import MetadataManager

        mm = MetadataManager()
        assert not mm.is_persistent
        assert mm.get_metadata("t", D(2022, 1, 1), "k") is None
        mm.set_metadata("t", D(2022, 1, 1), "k", "v1")
        mm.set_metadata("T", D(2022, 1, 1), "k2", "v2")  # case-insensitive table
        assert mm.get_metadata("t", D(2022, 1, 1), "k").value == "v1"
        all_kv = mm.get_metadata("t", D(2022, 1, 1))
        assert {k: v.value for k, v in all_kv.items()} == {"k": "v1", "k2": "v2"}
        # other dates are isolated partitions
        assert mm.get_metadata("t", D(2022, 1, 2)) == {}
        mm.delete_metadata("t", D(2022, 1, 1), "k")
        assert mm.get_metadata("t", D(2022, 1, 1), "k") is None
        mm.delete_metadata("t", D(2022, 1, 1))
        assert mm.get_metadata("t", D(2022, 1, 1)) == {}

    def test_json_persistence_roundtrip(self, tmp_path):
        from pramen_spark.metastore.metadata import MetadataManager

        path = str(tmp_path / "meta.json")
        mm = MetadataManager(path)
        assert mm.is_persistent
        mm.set_metadata("tbl", D(2022, 3, 1), "source_count", "123")
        mm2 = MetadataManager(path)
        got = mm2.get_metadata("tbl", D(2022, 3, 1), "source_count")
        assert got.value == "123" and got.last_updated > 0

    def test_exposed_on_reader(self, spark, ms):
        ms.save_table("table1", mk_df(spark, [(1, "a")]), D(2022, 1, 1))
        reader = ms.get_reader(["table1"], D(2022, 1, 1))
        reader.metadata_manager.set_metadata("table1", D(2022, 1, 1), "note", "x")
        assert ms.metadata_manager.get_metadata(
            "table1", D(2022, 1, 1), "note").value == "x"


class TestFormatGating:
    def test_delta_gated_when_unavailable(self, spark, tmp_path):
        from pramen_spark.metastore.persistence import (
            _delta_available,
            persistence_for,
        )

        cfg = TableConfig(name="d", format=DataFormat.delta(str(tmp_path / "d")))
        if _delta_available(spark):
            assert persistence_for(spark, cfg) is not None
        else:
            with pytest.raises(RuntimeError, match="delta-spark"):
                persistence_for(spark, cfg)

    def test_iceberg_gated_when_unavailable(self, spark):
        from pramen_spark.metastore.persistence import (
            iceberg_available,
            persistence_for,
        )

        cfg = TableConfig(name="i", format=DataFormat.iceberg("local.db.t"))
        if iceberg_available(spark):
            assert persistence_for(spark, cfg) is not None
        else:
            with pytest.raises(RuntimeError, match="[Ii]ceberg"):
                persistence_for(spark, cfg)
