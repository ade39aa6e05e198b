"""Operational machinery tests: lazy transient jobs, notifications,
hive/catalog sync, kafka offset rendering + serialization, enceladus-style
data-lake sink."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from pramen_spark.config.models import (
    CachePolicy,
    DataFormat,
    OperationDef,
    Schedule,
    TableConfig,
)
from pramen_spark.metastore.metastore import Metastore
from pramen_spark.runner.bookkeeper import Bookkeeper
from pramen_spark.runner.jobs import PythonFunctionJob
from pramen_spark.runner.task_runner import RunStatus, TaskResult
from pramen_spark.scheduling.strategies import TaskRunReason

D = dt.date(2024, 1, 10)


class TestLazyTransientJobs:
    def test_lazy_job_runs_on_first_read_only(self, spark, tmp_path):
        runs = []

        def produce(reader, info_date):
            runs.append(info_date)
            return spark.range(5).select(F.col("id"), F.lit(str(info_date)).alias("d"))

        ms = Metastore(
            spark,
            [TableConfig(name="lazy_t", format=DataFormat.transient(lazy=True),
                         info_date_column="")],
        )
        job = PythonFunctionJob(
            OperationDef(name="lazy", kind="transformation", output_table="lazy_t"),
            ms, Bookkeeper(), ms.table_config("lazy_t"), produce,
        )
        ms.transient_jobs.register_job(job)

        assert runs == []  # nothing ran yet
        df1 = ms.get_table("lazy_t", D, D)
        assert df1.count() == 5
        assert runs == [D]
        df2 = ms.get_table("lazy_t", D, D)  # shared, not re-run
        assert df2.count() == 5
        assert runs == [D]

    def test_lazy_requires_closed_range(self, spark):
        ms = Metastore(
            spark,
            [TableConfig(name="lazy_t2", format=DataFormat.transient(lazy=True),
                         info_date_column="")],
        )
        job = PythonFunctionJob(
            OperationDef(name="lazy2", kind="transformation", output_table="lazy_t2"),
            ms, Bookkeeper(), ms.table_config("lazy_t2"),
            lambda r, d: None,
        )
        ms.transient_jobs.register_job(job)
        with pytest.raises(ValueError, match="closed date range"):
            ms.get_table("lazy_t2", None, D)

    def test_runner_registers_lazy_jobs_instead_of_scheduling(self, spark):
        from pramen_spark.runner.runner import PipelineRunner
        from pramen_spark.scheduling.strategies import ScheduleParams

        ms = Metastore(
            spark,
            [TableConfig(name="lazy_t3", format=DataFormat.transient(lazy=True),
                         info_date_column="")],
        )
        bk = Bookkeeper()
        runs = []
        job = PythonFunctionJob(
            OperationDef(name="lazy3", kind="transformation", output_table="lazy_t3"),
            ms, bk, ms.table_config("lazy_t3"),
            lambda r, d: (runs.append(d), spark.range(1))[1],
        )
        runner = PipelineRunner(ms, bk)
        result = runner.run([job], ScheduleParams(run_date=D))
        assert result.results == []  # lazy job not executed eagerly
        assert runs == []
        assert ms.transient_jobs.has_job("lazy_t3")


class TestNotificationBuilder:
    def _results(self):
        return [
            TaskResult("job_a", "table_a", D, RunStatus.SUCCEEDED,
                       TaskRunReason.NEW, records=1000000, elapsed_sec=100.0),
            TaskResult("job_b", "table_b", D, RunStatus.FAILED,
                       TaskRunReason.NEW, error="boom <tag>"),
        ]

    def test_throughput_and_text(self):
        from pramen_spark.notify import NotificationConfig, PipelineNotificationBuilder

        b = PipelineNotificationBuilder(NotificationConfig(pipeline_name="p1"))
        results = self._results()
        assert b.throughput_rps(results[0]) == 10000
        assert b.throughput_rps(results[1]) is None
        text = b.build_text(results)
        assert "1 succeeded, 1 failed, 2 total" in text
        assert "rps=10000" in text

    def test_throughput_suppressed_below_floors(self):
        """PipelineNotificationBuilderHtml.scala:39-40,529: sub-minute or
        sub-1000-record tasks show a blank throughput cell."""
        from pramen_spark.notify import PipelineNotificationBuilder

        b = PipelineNotificationBuilder()
        fast = TaskResult("j", "t", D, RunStatus.SUCCEEDED,
                          TaskRunReason.NEW, records=100000, elapsed_sec=10.0)
        tiny = TaskResult("j", "t", D, RunStatus.SUCCEEDED,
                          TaskRunReason.NEW, records=999, elapsed_sec=120.0)
        assert b.throughput_rps(fast) is None
        assert b.throughput_rps(tiny) is None

    def test_html_report_escapes_and_colors(self, tmp_path):
        from pramen_spark.notify import NotificationConfig, PipelineNotificationBuilder

        b = PipelineNotificationBuilder(
            NotificationConfig(warn_throughput_rps=20000, good_throughput_rps=50000)
        )
        html_out = b.build_html(self._results())
        assert "boom &lt;tag&gt;" in html_out  # escaped
        assert "#9c5700" in html_out  # 10000 rps < warn threshold
        path = b.write_html(self._results(), str(tmp_path / "report.html"))
        assert os.path.getsize(path) > 0


class TestHiveSync:
    def test_sync_catalog_roundtrip(self, spark, tmp_path):
        from pramen_spark.metastore.hive import create_table_ddl, sync_catalog

        path = str(tmp_path / "hive_t")
        cfg = TableConfig(name="hive_t", format=DataFormat.parquet(path))
        ms = Metastore(spark, [cfg])
        df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
        ms.save_table("hive_t", df, D)
        ms.save_table("hive_t", df, D + dt.timedelta(days=1))

        name = sync_catalog(spark, cfg)
        try:
            got = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0]["n"]
            assert got == 20
            parts = spark.sql(f"SHOW PARTITIONS {name}").collect()
            assert len(parts) == 2
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")

        ddl = create_table_ddl(cfg, df.schema)
        assert ddl[0].startswith("DROP TABLE IF EXISTS")
        assert "CREATE EXTERNAL TABLE" in ddl[1]
        assert "PARTITIONED BY (`pramen_info_date` DATE)" in ddl[1]
        assert ddl[2].startswith("MSCK REPAIR TABLE")

    def test_sync_repairs_in_place_unless_forced(self, spark, tmp_path):
        """Existing catalog tables are repaired (new partitions picked up)
        without a drop; --force-recreate-hive-tables drops + recreates so a
        schema change is reflected (CmdLineConfig.scala)."""
        from pramen_spark.metastore.hive import sync_catalog

        path = str(tmp_path / "hive_r")
        cfg = TableConfig(name="hive_r", format=DataFormat.parquet(path))
        ms = Metastore(spark, [cfg])
        df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))
        ms.save_table("hive_r", df, D)
        name = sync_catalog(spark, cfg)
        try:
            assert len(spark.sql(f"SHOW PARTITIONS {name}").collect()) == 1
            # a new partition arrives; re-sync must pick it up without drop
            ms.save_table("hive_r", df, D + dt.timedelta(days=1))
            assert sync_catalog(spark, cfg) == name
            assert len(spark.sql(f"SHOW PARTITIONS {name}").collect()) == 2
            # schema widens: repair-in-place keeps the old column set ...
            df2 = df.withColumn("extra", F.lit("x"))
            ms.save_table("hive_r", df2, D + dt.timedelta(days=2))
            sync_catalog(spark, cfg)
            assert "extra" not in spark.table(name).columns
            # ... force_recreate picks the new column up
            sync_catalog(spark, cfg, force_recreate=True)
            assert "extra" in spark.table(name).columns
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_cli_flag_and_loader_keys(self, tmp_path):
        from pramen_spark.cli import parse_args
        from pramen_spark.config.loader import load_workflow

        args = parse_args(["--workflow", "w.conf", "--force-recreate-hive-tables"])
        assert args.force_recreate_hive_tables is True
        args = parse_args(["--workflow", "w.conf"])
        assert args.force_recreate_hive_tables is False

        conf = {
            "pramen": {"pipeline.name": "p"},
            "pramen.metastore": {
                "tables": [
                    {
                        "name": "t1",
                        "format": "parquet",
                        "path": str(tmp_path / "t1"),
                        "hive.table": "t1_hive",
                        "hive.database": "bi",
                    }
                ]
            },
            "pipeline": {"operations": []},
        }
        p = tmp_path / "w.json"
        p.write_text(json.dumps(conf))
        wf = load_workflow(str(p))
        assert wf.tables[0].hive_table == "t1_hive"
        assert wf.tables[0].hive_database == "bi"


class TestKafka:
    def test_offsets_json_rendering(self):
        from pramen_spark.sources.kafka_source import (
            EARLIEST,
            LATEST,
            kafka_offsets_json,
            next_offsets,
        )

        j = kafka_offsets_json("topic1", {0: 100, 1: 250})
        assert json.loads(j) == {"topic1": {"0": 100, "1": 250}}
        assert kafka_offsets_json("t", {0: EARLIEST}) == '{"t":{"0":-2}}'
        assert kafka_offsets_json("t", {0: LATEST}) == '{"t":{"0":-1}}'
        assert next_offsets({0: 100, 1: 250}) == {0: 101, 1: 251}
        assert next_offsets(None) == {}

    def test_serialize_for_kafka_json(self, spark):
        from pramen_spark.sinks.kafka_sink import serialize_for_kafka

        df = spark.range(3).select(F.col("id"), F.lit("x").alias("s"))
        out = serialize_for_kafka(df, "json", key_column="id")
        assert out.columns == ["key", "value"]
        rows = out.collect()
        v = json.loads(bytes(rows[0]["value"]).decode())
        assert v == {"id": 0, "s": "x"}
        assert bytes(rows[0]["key"]).decode() == "0"

    def test_kafka_read_gated_without_connector(self, spark):
        from pramen_spark.sources.kafka_source import KafkaSource, kafka_available

        src = KafkaSource(spark, {"kafka.bootstrap.servers": "none:9092",
                                  "topic": "t", "schema": "id long"})
        if not kafka_available(spark):
            with pytest.raises(RuntimeError, match="spark-sql-kafka"):
                src.get_data({}, D, D)


class TestEnceladusSink:
    def test_layout_version_and_info_file(self, spark, tmp_path):
        from pramen_spark.sinks.enceladus_sink import EnceladusSink

        base = str(tmp_path / "lake")
        sink = EnceladusSink(spark, {"path": base, "format": "parquet"})
        df = spark.range(7).select(F.col("id"))

        n = sink.send(df, "tbl", D, {})
        assert n == 7
        v1 = os.path.join(base, "2024/01/10/v1")
        assert os.path.isdir(v1)
        info = json.load(open(os.path.join(v1, "_INFO")))
        assert info["metadata"]["version"] == 1
        assert info["metadata"]["informationDate"] == "10-01-2024"
        assert info["checkpoints"][0]["controls"][0]["controlValue"] == "7"
        assert spark.read.parquet(v1).count() == 7

        # second send for the same date auto-bumps to v2
        sink.send(df, "tbl", D, {})
        assert os.path.isdir(os.path.join(base, "2024/01/10/v2"))

    def test_publish_copy(self, spark, tmp_path):
        from pramen_spark.sinks.enceladus_sink import EnceladusSink

        base, pub = str(tmp_path / "raw"), str(tmp_path / "publish")
        sink = EnceladusSink(
            spark, {"path": base, "format": "parquet", "publish.base.path": pub}
        )
        sink.send(spark.range(3), "tbl", D, {})
        assert spark.read.parquet(os.path.join(pub, "2024/01/10/v1")).count() == 3


class TestStandardizationSink:
    def test_raw_and_publish_layers(self, spark, tmp_path):
        from pramen_spark.sinks.standardization_sink import StandardizationSink

        raw, pub = str(tmp_path / "raw"), str(tmp_path / "publish")
        sink = StandardizationSink(spark, {"raw.format": "json"})
        df = spark.range(5).select(F.col("id"))

        n = sink.send(df, "tbl", D, {
            "raw.base.path": raw, "publish.base.path": pub, "info.version": 2,
        })
        assert n == 5
        raw_dir = os.path.join(raw, "2024/01/10/v2")
        pub_dir = os.path.join(
            pub, "enceladus_info_date=2024-01-10/enceladus_info_version=2")
        assert os.path.isdir(raw_dir) and os.path.isdir(pub_dir)
        # raw layer keeps source columns only (partition cols dropped)
        raw_df = spark.read.json(raw_dir)
        assert set(raw_df.columns) == {"id", "enceladus_info_date_string"}
        # publish layer: standardization columns minus the partition-path cols
        pub_df = spark.read.parquet(pub_dir)
        assert "enceladus_info_date_string" in pub_df.columns
        assert pub_df.count() == 5
        info = json.load(open(os.path.join(pub_dir, "_INFO")))
        names = [c["name"] for c in info["checkpoints"]]
        assert "Standardization Finish" in names
        assert json.load(open(os.path.join(raw_dir, "_INFO")))["metadata"]["version"] == 2

    def test_publish_only_unversioned_pattern(self, spark, tmp_path):
        from pramen_spark.sinks.standardization_sink import StandardizationSink

        pub = str(tmp_path / "publish")
        sink = StandardizationSink(spark, {
            "publish.partition.pattern": "{info_date_column}={year}-{month}-{day}",
        })
        n = sink.send(spark.range(4), "tbl", D, {"publish.base.path": pub})
        assert n == 4
        pub_dir = os.path.join(pub, "enceladus_info_date=2024-01-10")
        pub_df = spark.read.parquet(pub_dir)
        # version column kept in data when the layout is not versioned
        assert "enceladus_info_version" in pub_df.columns
        assert pub_df.select("enceladus_info_version").distinct().collect()[0][0] == 1

    def test_config_loader_alias(self):
        from pramen_spark.config.loader import _SINK_FACTORIES

        assert "standardization" in _SINK_FACTORIES


class TestTransferJob:
    def test_source_to_sink_direct(self, spark, tmp_path):
        from pramen_spark.runner.jobs import TransferJob
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef
        from pramen_spark.sinks.enceladus_sink import EnceladusSink
        from pramen_spark.sources.spark_source import SparkSource

        src_path = str(tmp_path / "src")
        spark.range(9).write.parquet(src_path)
        ms = Metastore(spark, [TableConfig(
            name="src->lake", format=DataFormat.null(), info_date_column="")])
        sink = EnceladusSink(spark, {"path": str(tmp_path / "lake"), "format": "parquet"})
        source = SparkSource(spark, {"format": "parquet",
                                     "has.information.date.column": False})
        job = TransferJob(
            OperationDef(name="xfer", kind="transfer", output_table="src->lake"),
            ms, Bookkeeper(), ms.table_config("src->lake"),
            source, {"path": src_path}, sink,
        )
        r = TaskRunner(Bookkeeper()).run_task(job, TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert r.records == 9
        assert spark.read.parquet(str(tmp_path / "lake/2024/01/10/v1")).count() == 9


class TestTaskRetries:
    def test_retries_until_success(self, spark):
        from pramen_spark.runner.jobs import PythonFunctionJob
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        ms = Metastore(spark, [TableConfig(
            name="retry_t", format=DataFormat.transient(), info_date_column="")])
        attempts = []

        def flaky(reader, info_date):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("transient failure")
            return spark.range(2)

        job = PythonFunctionJob(
            OperationDef(name="flaky", kind="transformation", output_table="retry_t",
                         options={"max.attempts": 3}),
            ms, Bookkeeper(), ms.table_config("retry_t"), flaky,
        )
        r = TaskRunner(Bookkeeper()).run_task(job, TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert len(attempts) == 3
        assert any("attempt 3/3" in w for w in r.warnings)

    def test_fails_after_max_attempts(self, spark):
        from pramen_spark.runner.jobs import PythonFunctionJob
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        ms = Metastore(spark, [TableConfig(
            name="retry_f", format=DataFormat.transient(), info_date_column="")])
        attempts = []

        def always_fails(reader, info_date):
            attempts.append(1)
            raise RuntimeError("permanent failure")

        job = PythonFunctionJob(
            OperationDef(name="dead", kind="transformation", output_table="retry_f",
                         options={"max.attempts": 2}),
            ms, Bookkeeper(), ms.table_config("retry_f"), always_fails,
        )
        r = TaskRunner(Bookkeeper()).run_task(job, TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.FAILED
        assert len(attempts) == 2


class TestResourcePool:
    def test_weighted_acquire_release(self):
        import threading
        import time as _time

        from pramen_spark.runner.runner import ResourcePool

        pool = ResourcePool(4)
        order = []

        def heavy():
            n = pool.acquire(4)
            order.append("heavy_in")
            _time.sleep(0.05)
            order.append("heavy_out")
            pool.release(n)

        def light():
            n = pool.acquire(1)
            order.append("light")
            pool.release(n)

        t1 = threading.Thread(target=heavy)
        t1.start()
        _time.sleep(0.01)
        t2 = threading.Thread(target=light)
        t2.start()
        t1.join(); t2.join()
        # the exclusive job finished before the light one could enter
        assert order.index("heavy_out") < order.index("light")

    def test_weight_clamped_to_total(self):
        from pramen_spark.runner.runner import ResourcePool

        pool = ResourcePool(2)
        held = pool.acquire(100)
        assert held == 2
        pool.release(held)


class TestFileTokenLock:
    def test_exclusive_acquire_and_release(self, tmp_path):
        from pramen_spark.runner.bookkeeper import FileTokenLock

        lock = FileTokenLock(str(tmp_path / "locks"))
        assert lock.acquire("tbl:2024-01-10", timeout=1)
        assert not lock.acquire("tbl:2024-01-10", timeout=0.3)
        lock.release("tbl:2024-01-10")
        assert lock.acquire("tbl:2024-01-10", timeout=1)
        lock.release("tbl:2024-01-10")

    def test_stale_lock_broken(self, tmp_path):
        import os
        import time as _time

        from pramen_spark.runner.bookkeeper import FileTokenLock

        lock = FileTokenLock(str(tmp_path / "locks"), ttl_sec=0.2)
        assert lock.acquire("t:d", timeout=1)
        _time.sleep(0.3)
        # a second owner breaks the stale lock
        assert lock.acquire("t:d", timeout=1)

    def test_token_sanitized_to_filename(self, tmp_path):
        from pramen_spark.runner.bookkeeper import FileTokenLock

        lock = FileTokenLock(str(tmp_path / "locks"))
        assert lock.acquire("weird/token with:stuff", timeout=1)
        lock.release("weird/token with:stuff")

    def test_release_without_hold_is_noop(self, tmp_path):
        """A process that never acquired must not unlink another's lock."""
        from pramen_spark.runner.bookkeeper import FileTokenLock

        a = FileTokenLock(str(tmp_path / "locks"))
        b = FileTokenLock(str(tmp_path / "locks"))
        assert a.acquire("t:d", timeout=1)
        b.release("t:d")  # b never held it
        assert not b.acquire("t:d", timeout=0.3)  # a still holds
        a.release("t:d")
        assert b.acquire("t:d", timeout=1)
        b.release("t:d")

    def test_release_after_displacement_keeps_usurper_lock(self, tmp_path):
        """If our lock file was displaced (stale-break race) and re-created by
        another owner, our release() must leave the usurper's lock alone."""
        import os

        from pramen_spark.runner.bookkeeper import FileTokenLock

        a = FileTokenLock(str(tmp_path / "locks"))
        b = FileTokenLock(str(tmp_path / "locks"))
        assert a.acquire("t:d", timeout=1)
        # simulate displacement: b's owner token now occupies the path
        path = a._path("t:d")
        os.unlink(path)
        assert b.acquire("t:d", timeout=1)
        a.release("t:d")  # detects foreign owner token, no-op
        assert os.path.exists(path)
        assert not a.acquire("t:d", timeout=0.3)  # b's lock survives
        b.release("t:d")


class TestEmailNotification:
    def _fake_smtp(self, record):
        class FakeSMTP:
            def __init__(self, host, port):
                record["host"], record["port"] = host, port

            def starttls(self):
                record["starttls"] = True

            def login(self, user, password):
                record["login"] = (user, password)

            def sendmail(self, from_addr, to_addrs, payload):
                record["from"], record["to"], record["payload"] = from_addr, to_addrs, payload

            def quit(self):
                record["quit"] = True

        return FakeSMTP

    def test_multipart_message_sent(self):
        from email import message_from_string

        from pramen_spark.notify.email import AttachedFile, EmailConfig, EmailSender

        record = {}
        cfg = EmailConfig.from_flat({
            "smtp.host": "smtp.example.com", "smtp.port": "2525",
            "send.from": "pipeline@example.com",
            "send.to": "ops@example.com; outside@other.org",
            "allowed.domains": "example.com",
        })
        sender = EmailSender(cfg, smtp_factory=self._fake_smtp(record))
        ok = sender.send("pipeline done", "<html><b>report</b></html>",
                         files=[AttachedFile("report.html", b"<html/>")])
        assert ok
        assert record["host"] == "smtp.example.com" and record["port"] == 2525
        assert record["to"] == ["ops@example.com"]  # other.org filtered out
        msg = message_from_string(record["payload"])
        assert msg.is_multipart()
        parts = list(msg.walk())
        html_parts = [p for p in parts if p.get_content_type() == "text/html"]
        att_parts = [p for p in parts if p.get_filename() == "report.html"]
        assert len(html_parts) == 1 and "report" in html_parts[0].get_payload(decode=True).decode()
        assert len(att_parts) == 1
        assert msg["Subject"] == "pipeline done" and record["quit"]

    def test_no_host_returns_false(self):
        from pramen_spark.notify.email import EmailConfig, EmailSender

        cfg = EmailConfig.from_flat({"send.to": "x@example.com"})
        assert EmailSender(cfg).send("s", "<p/>") is False

    def test_failures_recipients_and_auth(self):
        from pramen_spark.notify.email import EmailConfig, EmailSender

        record = {}
        cfg = EmailConfig.from_flat({
            "smtp.host": "h", "smtp.port": "25",
            "smtp.starttls.enable": "true",
            "smtp.auth.user": "u", "smtp.auth.password": "p",
            "send.from": "f@e.com", "send.to": "ok@e.com",
            "send.failures.to": "oncall@e.com",
        })
        sender = EmailSender(cfg, smtp_factory=self._fake_smtp(record))
        assert sender.send("s", "<p/>", pipeline_failed=True)
        assert record["to"] == ["oncall@e.com"]
        assert record["starttls"] and record["login"] == ("u", "p")

    def test_transport_error_swallowed(self):
        from pramen_spark.notify.email import EmailConfig, EmailSender

        def bad_factory(host, port):
            raise ConnectionRefusedError("no server")

        cfg = EmailConfig.from_flat({"smtp.host": "h", "send.from": "f@e.com",
                                     "send.to": "t@e.com"})
        assert EmailSender(cfg, smtp_factory=bad_factory).send("s", "<p/>") is False


class TestExecutionWatchdog:
    def _slow_job(self, spark, tmp_path, delay_sec, options):
        import time as _time

        from pramen_spark.runner.jobs import Job

        ms = Metastore(
            spark,
            [TableConfig(name="wd_out",
                         format=DataFormat.parquet(str(tmp_path / "wd_out")),
                         info_date_start=dt.date(2024, 1, 1))],
        )

        class SlowJob(Job):
            def run(self, info_date):
                _time.sleep(delay_sec)
                return spark.range(3).select(F.col("id").alias("v"))

        op = OperationDef(name="slow", kind="transformation", output_table="wd_out",
                          schedule=Schedule.parse("daily"), options=options)
        return SlowJob(op, ms, Bookkeeper(), ms.table_config("wd_out"))

    def test_warn_threshold_adds_warning(self, spark, tmp_path):
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._slow_job(spark, tmp_path, 0.3,
                             {"warn.maximum.execution.time.seconds": "0.1"})
        r = TaskRunner(Bookkeeper()).run_task(
            job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert any("warn.maximum.execution.time.seconds" in w for w in r.warnings), r.warnings

    def test_kill_threshold_fails_task(self, spark, tmp_path):
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._slow_job(spark, tmp_path, 30,
                             {"kill.maximum.execution.time.seconds": "0.5"})
        r = TaskRunner(Bookkeeper()).run_task(
            job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r.status == RunStatus.FAILED
        assert "Killed" in r.error and "kill.maximum.execution.time.seconds" in r.error

    def test_fast_job_unaffected(self, spark, tmp_path):
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._slow_job(spark, tmp_path, 0.0,
                             {"warn.maximum.execution.time.seconds": "600",
                              "kill.maximum.execution.time.seconds": "600"})
        r = TaskRunner(Bookkeeper()).run_task(
            job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert r.warnings == []

    def test_watchdog_worker_thread_exits_cleanly(self, spark, tmp_path):
        """PySpark 4 removed ``SparkContext.clearJobGroup`` (SPARK-44101);
        the watchdog worker must detach its job group without raising — a
        dying worker thread is silent in production but means any code
        joined on its state after the clear never runs."""
        import threading

        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        hooked = []
        orig_hook = threading.excepthook
        threading.excepthook = lambda args: hooked.append(args)
        try:
            job = self._slow_job(spark, tmp_path, 0.0,
                                 {"kill.maximum.execution.time.seconds": "600"})
            r = TaskRunner(Bookkeeper()).run_task(
                job, TaskPreDef(dt.date(2024, 1, 12), TaskRunReason.NEW))
            assert r.status == RunStatus.SUCCEEDED, r.error
        finally:
            threading.excepthook = orig_hook
        assert hooked == [], [repr(a.exc_value) for a in hooked]

    def test_kill_cancels_spark_action(self, spark, tmp_path):
        """The watchdog must CANCEL the abandoned attempt's Spark job group:
        an in-flight action may not keep writing concurrently with a retry
        or another driver."""
        import time as _time

        from pramen_spark.runner.jobs import Job
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        ms = Metastore(
            spark,
            [TableConfig(name="wd_out2",
                         format=DataFormat.parquet(str(tmp_path / "wd_out2")),
                         info_date_start=dt.date(2024, 1, 1))],
        )

        class SparkBusyJob(Job):
            def run(self, info_date):
                sleepy = F.udf(lambda x: (_time.sleep(0.5), x)[1], "long")
                return spark.range(64).repartition(8).select(sleepy(F.col("id")).alias("v"))

        op = OperationDef(name="busy", kind="transformation", output_table="wd_out2",
                          schedule=Schedule.parse("daily"),
                          options={"kill.maximum.execution.time.seconds": "1"})
        job = SparkBusyJob(op, ms, Bookkeeper(), ms.table_config("wd_out2"))
        r = TaskRunner(Bookkeeper()).run_task(
            job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r.status == RunStatus.FAILED and "Killed" in r.error
        # the cancelled action must drain — no active Spark jobs hanging on
        tracker = spark.sparkContext.statusTracker()
        deadline = _time.time() + 20
        while _time.time() < deadline and tracker.getActiveJobsIds():
            _time.sleep(0.2)
        assert not tracker.getActiveJobsIds()


class TestFileLockedTaskRunner:
    """File locks wired into TaskRunner: two 'drivers' (separate lock
    instances over a shared lock dir) racing on the same (table, info date) —
    exactly one writes; --skip-locked skips truthfully (reference:
    TokenLockHadoopPath + TaskRunnerBase lock acquisition)."""

    def _make_job(self, spark, tmp_path, delay_sec=0.0):
        import time as _time

        from pramen_spark.config.models import (DataFormat, OperationDef,
                                                Schedule, TableConfig)
        from pramen_spark.metastore.metastore import Metastore
        from pramen_spark.runner.jobs import Job

        ms = Metastore(
            spark,
            [TableConfig(name="locked_out",
                         format=DataFormat.parquet(str(tmp_path / "locked_out")),
                         info_date_start=dt.date(2024, 1, 1))],
        )

        class SlowJob(Job):
            def run(self, info_date):
                if delay_sec:
                    _time.sleep(delay_sec)
                return spark.range(10).select(F.col("id").alias("v"))

        op = OperationDef(name="slow", kind="transformation",
                          output_table="locked_out", schedule=Schedule.parse("daily"))
        return ms, SlowJob(op, ms, Bookkeeper(), ms.table_config("locked_out"))

    def test_skip_locked_skips_truthfully(self, spark, tmp_path):
        from pramen_spark.runner.bookkeeper import Bookkeeper, FileTokenLock
        from pramen_spark.runner.task_runner import RunStatus, TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef, TaskRunReason

        ms, job = self._make_job(spark, tmp_path)
        lock_dir = str(tmp_path / "locks")
        other = FileTokenLock(lock_dir)
        assert other.acquire("locked_out:2024-01-10", timeout=1)  # "another run"
        runner = TaskRunner(Bookkeeper(), skip_locked=True,
                            lock=FileTokenLock(lock_dir))
        r = runner.run_task(job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r.status == RunStatus.SKIPPED and "locked" in r.error
        other.release("locked_out:2024-01-10")
        r2 = runner.run_task(job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))
        assert r2.status == RunStatus.SUCCEEDED, r2.error

    def test_concurrent_runners_exactly_one_writes(self, spark, tmp_path):
        import threading

        from pramen_spark.runner.bookkeeper import Bookkeeper, FileTokenLock
        from pramen_spark.runner.task_runner import RunStatus, TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef, TaskRunReason

        ms, job = self._make_job(spark, tmp_path, delay_sec=1.0)
        lock_dir = str(tmp_path / "locks")
        results = {}
        barrier = threading.Barrier(2)

        def drive(name):
            runner = TaskRunner(Bookkeeper(), skip_locked=True,
                                lock=FileTokenLock(lock_dir))
            barrier.wait()
            results[name] = runner.run_task(
                job, TaskPreDef(dt.date(2024, 1, 10), TaskRunReason.NEW))

        threads = [threading.Thread(target=drive, args=(n,)) for n in ("a", "b")]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        statuses = sorted(r.status for r in results.values())
        assert statuses == [RunStatus.SKIPPED, RunStatus.SUCCEEDED], {
            k: (v.status, v.error) for k, v in results.items()}
        assert ms.get_table("locked_out", dt.date(2024, 1, 10),
                            dt.date(2024, 1, 10)).count() == 10


class TestRawFileSource:
    def test_date_token_glob(self, spark, tmp_path):
        from pramen_spark.sources.raw_file_source import RawFileSource, render_date_pattern

        for day in ("2024-01-10", "2024-01-11", "2024-01-12"):
            d = tmp_path / f"in_{day}"
            d.mkdir()
            (d / "a.csv").write_text("x")
            (d / "b.csv").write_text("y")
        assert render_date_pattern("/x/in_{{yyyy-MM-dd}}/*.csv", D) == "/x/in_2024-01-10/*.csv"

        src = RawFileSource(spark, {})
        out = src.get_data(
            {"path": str(tmp_path / "in_{{yyyy-MM-dd}}" / "*.csv")},
            D, D + dt.timedelta(days=1),
        )
        rows = out.collect()
        assert out.columns == ["path", "file_name"]
        assert len(rows) == 4  # 2 files x 2 days in range, 3rd day excluded
        assert src.get_record_count(
            {"path": str(tmp_path / "in_{{yyyy-MM-dd}}" / "*.csv")}, D, D
        ) == 2

    def test_plain_directory_listing(self, spark, tmp_path):
        from pramen_spark.sources.raw_file_source import RawFileSource

        d = tmp_path / "plain"
        d.mkdir()
        (d / "f1.bin").write_text("1")
        (d / "f2.bin").write_text("2")
        src = RawFileSource(spark, {})
        rows = src.get_data(str(d), D, D).collect()
        assert {r["file_name"] for r in rows} == {"f1.bin", "f2.bin"}


class TestLocalSparkSource:
    def _mk_files(self, tmp_path):
        src = tmp_path / "landing"
        src.mkdir()
        (src / "a.csv").write_text("id,name\n1,x\n2,y\n")
        (src / "b.csv").write_text("id,name\n3,z\n")
        (src / "skip.txt").write_text("not,csv\n")
        (src / ".hidden.csv").write_text("id,name\n9,h\n")
        sub = src / "sub"
        sub.mkdir()
        (sub / "c.csv").write_text("id,name\n4,w\n")
        return src

    def test_copies_matching_files_and_reads(self, spark, tmp_path):
        import datetime as dt

        from pramen_spark.sources.local_spark_source import LocalSparkSource

        src = self._mk_files(tmp_path)
        source = LocalSparkSource(
            spark,
            {
                "temp.hadoop.path": str(tmp_path / "staging"),
                "file.name.pattern": "*.csv",
                "format": "csv",
                "option.header": "true",
                "option.inferSchema": "true",
            },
        )
        df = source.get_data(str(src), dt.date(2024, 1, 1), dt.date(2024, 1, 1))
        # non-recursive: a.csv + b.csv only; hidden + .txt + sub/ excluded
        assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
        assert not source.has_info_date_column()
        source.close()
        import os

        assert not os.path.isdir(source.temp_hadoop_path) or not os.listdir(
            source.temp_hadoop_path
        )

    def test_recursive_pattern(self, spark, tmp_path):
        import datetime as dt

        from pramen_spark.sources.local_spark_source import LocalSparkSource

        src = self._mk_files(tmp_path)
        source = LocalSparkSource(
            spark,
            {
                "temp.hadoop.path": str(tmp_path / "staging"),
                "file.name.pattern": "*.csv",
                "recursive": "true",
                "format": "csv",
                "option.header": "true",
                "option.inferSchema": "true",
            },
        )
        df = source.get_data(str(src), dt.date(2024, 1, 1), dt.date(2024, 1, 1))
        assert sorted(r["id"] for r in df.collect()) == [1, 2, 3, 4]
        source.close()

    def test_incremental_unsupported(self, spark, tmp_path):
        import pytest as _pytest

        from pramen_spark.sources.local_spark_source import LocalSparkSource

        source = LocalSparkSource(spark, {"temp.hadoop.path": str(tmp_path / "st")})
        with _pytest.raises(NotImplementedError):
            source.get_data_incremental("x", None, None, None)


class TestConversionTransformer:
    def _metastore(self, spark, tmp_path):
        from pramen_spark.config.models import DataFormat, TableConfig
        from pramen_spark.metastore.metastore import Metastore

        raw = TableConfig(name="files_raw", format=DataFormat.raw(str(tmp_path / "raw")))
        return Metastore(spark, [raw], temp_dir=str(tmp_path / "tmp"))

    def test_converts_raw_csv_listing(self, spark, tmp_path):
        import datetime as dt

        from pramen_spark.api import ConversionTransformer

        day = dt.date(2024, 1, 5)
        src = tmp_path / "in"
        src.mkdir()
        (src / "p1.csv").write_text("id,val\n1,10\n2,20\n")
        (src / "p2.csv").write_text("id,val\n3,30\n")
        ms = self._metastore(spark, tmp_path)
        listing = spark.createDataFrame(
            [(str(src / "p1.csv"), "p1.csv"), (str(src / "p2.csv"), "p2.csv")],
            "path string, file_name string",
        )
        ms.save_table("files_raw", listing, day)

        reader = ms.get_reader(["files_raw"], day)
        tr = ConversionTransformer()
        opts = {
            "input.table": "files_raw",
            "input.format": "csv",
            "header": "true",
            "inferSchema": "true",
        }
        assert tr.validate(reader, day, opts).is_ready
        out = tr.run(reader, day, opts)
        assert sorted((r["id"], r["val"]) for r in out.collect()) == [
            (1, 10),
            (2, 20),
            (3, 30),
        ]

    def test_skips_when_no_files(self, spark, tmp_path):
        import datetime as dt

        from pramen_spark.api import ConversionTransformer

        ms = self._metastore(spark, tmp_path)
        reader = ms.get_reader(["files_raw"], dt.date(2024, 1, 6))
        reason = ConversionTransformer().validate(
            reader, dt.date(2024, 1, 6), {"input.table": "files_raw", "input.format": "csv"}
        )
        assert reason.kind == "skip"

    def test_missing_options_raise(self, spark, tmp_path):
        import datetime as dt

        import pytest as _pytest

        from pramen_spark.api import ConversionTransformer

        ms = self._metastore(spark, tmp_path)
        reader = ms.get_reader(["files_raw"], dt.date(2024, 1, 6))
        with _pytest.raises(ValueError, match="input.format"):
            ConversionTransformer().validate(reader, dt.date(2024, 1, 6), {"input.table": "t"})


class TestSkipLockedAndUndercover:
    def _job(self, spark, name="lk_t"):
        from pramen_spark.runner.jobs import PythonFunctionJob

        ms = Metastore(
            spark,
            [TableConfig(name=name, format=DataFormat.transient(), info_date_column="")],
        )
        return PythonFunctionJob(
            OperationDef(name="op_" + name, kind="transformation", output_table=name),
            ms,
            Bookkeeper(),
            ms.table_config(name),
            lambda reader, info_date: spark.range(5),
        )

    def test_skip_locked_skips_held_lock(self, spark):
        from pramen_spark.runner.bookkeeper import TokenLock
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._job(spark, "lk_skip")
        token = f"lk_skip:{D.isoformat()}"
        assert TokenLock.acquire(token, 1)
        try:
            r = TaskRunner(Bookkeeper(), skip_locked=True).run_task(
                job, TaskPreDef(D, TaskRunReason.NEW)
            )
            assert r.status == RunStatus.SKIPPED
            assert "locked" in (r.error or "")
        finally:
            TokenLock.release(token)
        # without skip_locked a held lock is a failure (after timeout)
        assert TokenLock.acquire(token, 1)
        try:
            r = TaskRunner(Bookkeeper(), lock_timeout_sec=0.2).run_task(
                job, TaskPreDef(D, TaskRunReason.NEW)
            )
            assert r.status == RunStatus.FAILED
        finally:
            TokenLock.release(token)

    def test_undercover_leaves_no_records(self, spark):
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._job(spark, "lk_under")
        bk = Bookkeeper()
        runner = TaskRunner(bk, undercover=True)
        r = runner.run_task(job, TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert bk.get_latest_processed_date("lk_under") is None
        assert bk.get_latest_schema("lk_under", D) is None
        assert runner.journal.entries == []

    def test_normal_mode_records(self, spark):
        from pramen_spark.runner.task_runner import TaskRunner
        from pramen_spark.scheduling.strategies import TaskPreDef

        job = self._job(spark, "lk_norm")
        bk = Bookkeeper()
        runner = TaskRunner(bk)
        r = runner.run_task(job, TaskPreDef(D, TaskRunReason.NEW))
        assert r.status == RunStatus.SUCCEEDED, r.error
        assert bk.get_latest_processed_date("lk_norm") == D
        assert len(runner.journal.entries) == 1
