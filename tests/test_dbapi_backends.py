"""RDBMS (DBAPI/sqlite3) bookkeeper, journal, and offset ledger —
reference BookkeeperJdbc.scala / JournalJdbc.scala / OffsetManagerJdbc.scala
— plus the config-driven incremental ingestion wiring that uses them."""

import datetime as dt
import json

import pytest

from pramen_spark.offsets.ledger import OffsetTransaction
from pramen_spark.runner.bookkeeper import JournalEntry
from pramen_spark.runner.dbapi_bookkeeper import (
    DbApiBookkeeper,
    DbApiConnection,
    DbApiJournal,
    DbApiOffsetLedger,
)
from pramen_spark.sql.generators import OffsetType, OffsetValue

D = dt.date(2024, 1, 10)


@pytest.fixture()
def db(tmp_path):
    return DbApiConnection(sqlite_path=str(tmp_path / "bk.db"))


class TestDbApiBookkeeper:
    def test_roundtrip(self, tmp_path, db):
        bk = DbApiBookkeeper(db)
        bk.set_record_count("t", D, 100, 90, 1.0, 2.0, batch_id=7)
        bk.save_schema("t", D, json.dumps({"type": "struct", "fields": []}))

        reopened = DbApiBookkeeper(DbApiConnection(sqlite_path=str(tmp_path / "bk.db")))
        chunk = reopened.get_latest_data_chunk("t", D)
        assert chunk is not None and chunk.batch_id == 7
        assert reopened.get_latest_schema("t") == {"type": "struct", "fields": []}

    def test_refresh_sees_other_driver(self, tmp_path):
        path = str(tmp_path / "bk.db")
        a = DbApiBookkeeper(DbApiConnection(sqlite_path=path))
        b = DbApiBookkeeper(DbApiConnection(sqlite_path=path))
        a.set_record_count("t", D, 10, 10, 1.0, 2.0)
        assert b.get_latest_processed_date("t") is None
        b.refresh()
        assert b.get_latest_processed_date("t") == D


class TestDbApiJournal:
    def test_roundtrip_and_range(self, db):
        j = DbApiJournal(db)
        j.add(JournalEntry("a", D.isoformat(), "Succeeded", 9.0, 10.0, records=5))
        j.add(JournalEntry("b", D.isoformat(), "Failed", 19.0, 20.0, records=0, error="x"))
        got = j.get_entries(15.0, 25.0)
        assert [e.table_name for e in got] == ["b"] and got[0].error == "x"

    def test_other_driver_visible(self, tmp_path):
        path = str(tmp_path / "bk.db")
        a = DbApiJournal(DbApiConnection(sqlite_path=path))
        b = DbApiJournal(DbApiConnection(sqlite_path=path))
        a.add(JournalEntry("t", D.isoformat(), "Succeeded", 1.0, 2.0))
        assert [e.table_name for e in b.get_entries(0.0, 5.0)] == ["t"]


class TestDbApiOffsetLedger:
    def test_start_commit_rollback(self, db):
        ledger = DbApiOffsetLedger(db)
        tx = ledger.start_write("t", D, 1, OffsetType.INTEGRAL)
        assert len(ledger.get_uncommitted("t")) == 1
        ledger.commit(tx, OffsetValue.integral(0), OffsetValue.integral(99))
        assert ledger.get_uncommitted("t") == []
        latest = ledger.get_max_info_date_and_offset("t")
        assert latest is not None and latest[2].value == 99

        tx2 = ledger.start_write("t", D, 2, OffsetType.INTEGRAL)
        ledger.rollback(tx2)
        assert len(ledger.get_offsets("t")) == 1

    def test_committed_is_final_on_key_reuse(self, db):
        ledger = DbApiOffsetLedger(db)
        tx = ledger.start_write("t", D, 7, OffsetType.INTEGRAL)
        ledger.commit(tx, OffsetValue.integral(1), OffsetValue.integral(9))
        tx2 = ledger.start_write("t", D, 7, OffsetType.INTEGRAL)
        ledger.rollback(tx2)
        latest = ledger.get_max_info_date_and_offset("t")
        assert latest is not None and latest[2].value == 9

    def test_double_commit_rejected(self, db):
        ledger = DbApiOffsetLedger(db)
        tx = ledger.start_write("t", D, 1, OffsetType.INTEGRAL)
        ledger.commit(tx, OffsetValue.integral(1), OffsetValue.integral(2))
        with pytest.raises(KeyError):
            ledger.commit(tx, OffsetValue.integral(1), OffsetValue.integral(2))
        with pytest.raises(KeyError):
            ledger.rollback(tx)

    def test_concurrent_driver_visibility(self, tmp_path):
        path = str(tmp_path / "bk.db")
        a = DbApiOffsetLedger(DbApiConnection(sqlite_path=path))
        b = DbApiOffsetLedger(DbApiConnection(sqlite_path=path))
        tx = a.start_write("t", D, 1, OffsetType.INTEGRAL)
        a.commit(tx, OffsetValue.integral(1), OffsetValue.integral(42))
        latest = b.get_max_info_date_and_offset("t")
        assert latest is not None and latest[2].value == 42

    def test_datetime_offsets(self, db):
        ledger = DbApiOffsetLedger(db)
        ts0 = dt.datetime(2024, 1, 10, 8, 0, tzinfo=dt.timezone.utc)
        ts1 = dt.datetime(2024, 1, 10, 9, 30, tzinfo=dt.timezone.utc)
        tx = ledger.start_write("t", D, 1, OffsetType.DATETIME)
        ledger.commit(tx, OffsetValue.datetime(ts0), OffsetValue.datetime(ts1))
        latest = ledger.get_max_info_date_and_offset("t")
        assert latest[1].value == ts0 and latest[2].value == ts1


class TestConfigDrivenIncremental:
    def test_incremental_schedule_builds_offset_job(self, spark, tmp_path):
        """A config with schedule=incremental + offset.column must produce
        an IncrementalIngestionJob wired to the given ledger, and running it
        twice ingests each source row exactly once."""
        from pyspark.sql import functions as F

        from pramen_spark.config.loader import build_jobs, load_workflow
        from pramen_spark.metastore.metastore import Metastore
        from pramen_spark.runner.bookkeeper import Bookkeeper
        from pramen_spark.runner.incremental import IncrementalIngestionJob
        from pramen_spark.runner.task_runner import RunStatus, TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef, TaskRunReason

        src_path = str(tmp_path / "src")
        spark.range(50).select(F.col("id").alias("event_id")).write.parquet(src_path)
        conf = {
            "pramen": {
                "pipeline.name": "p",
                "metastore": {
                    "tables": [
                        {
                            "name": "ev",
                            "format": "parquet",
                            "path": str(tmp_path / "ev"),
                            "save.mode": "append",
                        }
                    ]
                },
                "sources": [
                    {
                        "name": "files",
                        "factory.class": "spark",
                        "format": "parquet",
                        "offset.column": "event_id",
                        "has.information.date.column": False,
                    }
                ],
                "operations": [
                    {
                        "name": "ing",
                        "type": "ingestion",
                        "source": "files",
                        "schedule": {"type": "incremental"},
                        "tables": [
                            {"input.path": src_path, "output.metastore.table": "ev"}
                        ],
                    }
                ],
            }
        }
        wf = load_workflow(conf)
        ms = Metastore(spark, wf.tables)
        bk = Bookkeeper()
        ledger = DbApiOffsetLedger(DbApiConnection(sqlite_path=str(tmp_path / "bk.db")))
        jobs = build_jobs(spark, wf, ms, bk, ledger=ledger)
        assert len(jobs) == 1 and isinstance(jobs[0], IncrementalIngestionJob)

        r = TaskRunner(bk, batch_id=1).run_task(jobs[0], TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert ms.get_table("ev", D, D).count() == 50
        latest = ledger.get_max_info_date_and_offset("ev")
        assert latest is not None and latest[2].value == 49

        # second run: no new source rows -> nothing appended, offset unchanged
        r2 = TaskRunner(bk, batch_id=2).run_task(jobs[0], TaskPreDef(D, TaskRunReason.NEW))
        assert ms.get_table("ev", D, D).count() == 50
        assert ledger.get_max_info_date_and_offset("ev")[2].value == 49
