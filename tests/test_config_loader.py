"""Config loading tests: HOCON-subset parser, workflow key mapping, and a
config-driven end-to-end pipeline run through the CLI entry point."""

import datetime as dt
import json
import os

import pytest

from pramen_spark.config import hocon
from pramen_spark.config.loader import build_jobs, load_workflow, parse_table_config
from pramen_spark.config.models import CachePolicy, FormatKind, ScheduleKind

D = dt.date(2024, 1, 10)


class TestHoconParser:
    def test_scalars_and_nesting(self):
        conf = hocon.loads(
            """
            # comment
            pramen {
              pipeline.name = "my pipeline"   // inline comment
              parallel.tasks = 3
              enabled = true
              ratio = 0.5
              nothing = null
            }
            """
        )
        p = conf["pramen"]
        assert p["pipeline"]["name"] == "my pipeline"
        assert p["parallel"]["tasks"] == 3
        assert p["enabled"] is True
        assert p["ratio"] == 0.5
        assert p["nothing"] is None

    def test_arrays_of_objects_and_unquoted(self):
        conf = hocon.loads(
            """
            tables = [
              { name = t1, format = parquet, path = /data/t1 },
              {
                name = t2
                format = delta
              }
            ]
            days = [ 1, 2, 7 ]
            """
        )
        assert conf["tables"][0] == {"name": "t1", "format": "parquet", "path": "/data/t1"}
        assert conf["tables"][1]["format"] == "delta"
        assert conf["days"] == [1, 2, 7]

    def test_object_merge(self):
        conf = hocon.loads("a { x = 1 }\na { y = 2 }")
        assert conf["a"] == {"x": 1, "y": 2}

    def test_key_value_colon_and_braces_without_eq(self):
        conf = hocon.loads('a: 1\nb { c: "two" }')
        assert conf == {"a": 1, "b": {"c": "two"}}

    def test_unsupported_features_rejected(self):
        with pytest.raises(ValueError, match="include"):
            hocon.loads('include "other.conf"')
        with pytest.raises(ValueError, match="substitution"):
            hocon.loads("a = ${b}")


class TestTableConfigParsing:
    def test_parquet_with_partitioning(self):
        t = parse_table_config(
            {
                "name": "t1",
                "format": "parquet",
                "path": "/data/t1",
                "records": {"per": {"partition": 1000000}},
                "information": {"date": {"column": "info_d", "start": "2023-05-01"}},
                "track": {"days": 4},
            }
        )
        assert t.format.kind == FormatKind.PARQUET
        assert t.format.partition_info.records_per_partition == 1000000
        assert t.info_date_column == "info_d"
        assert t.info_date_start == dt.date(2023, 5, 1)
        assert t.track_days == 4

    def test_transient_with_cache_policy(self):
        t = parse_table_config({"name": "t", "format": "transient",
                                "cache": {"policy": "cache"}})
        assert t.format.is_lazy
        assert t.format.cache_policy == CachePolicy.CACHE


WORKFLOW = """
pramen {
  pipeline.name = "e2e test pipeline"
  parallel.tasks = 2

  metastore {
    tables = [
      { name = "src_table", format = "parquet", path = "%SRC%" },
      { name = "out_table", format = "parquet", path = "%OUT%" }
    ]
  }

  sources = [
    {
      name = "file_source"
      factory.class = "SparkSource"
      format = "parquet"
      has.information.date.column = false
    }
  ]

  sinks = [
    {
      name = "csv_out"
      factory.class = "local_csv"
      path = "%CSV%"
    }
  ]

  operations = [
    {
      name = "ingest"
      type = "ingestion"
      schedule.type = "daily"
      source = "file_source"
      tables = [
        { input.path = "%RAWDATA%", output.metastore.table = "src_table" }
      ]
    },
    {
      name = "identity"
      type = "transformation"
      class = "IdentityTransformer"
      schedule.type = "daily"
      output.table = "out_table"
      dependencies = [
        { tables = [ "src_table" ], date.from = "@infoDate" }
      ]
      option { input.table = "src_table" }
      transformations = [
        { col = "doubled", expr = "v * 2" }
      ]
      filters = [ "v >= 2" ]
    }
  ]
}
"""


class TestWorkflowEndToEnd:
    def test_load_and_run(self, spark, tmp_path):
        raw = str(tmp_path / "raw")
        spark.range(5).selectExpr("id", "id + 1 AS v").write.parquet(raw)
        text = (
            WORKFLOW.replace("%SRC%", str(tmp_path / "ms_src"))
            .replace("%OUT%", str(tmp_path / "ms_out"))
            .replace("%CSV%", str(tmp_path / "csv"))
            .replace("%RAWDATA%", raw)
        )
        conf_path = str(tmp_path / "pipeline.conf")
        with open(conf_path, "w") as f:
            f.write(text)

        wf = load_workflow(conf_path)
        assert wf.pipeline_name == "e2e test pipeline"
        assert [t.name for t in wf.tables] == ["src_table", "out_table"]
        assert wf.sources["file_source"].factory.endswith("SparkSource")
        assert wf.operations[1]["schedule"]["type"] == "daily"

        from pramen_spark.cli import main

        report = str(tmp_path / "report.html")
        code = main([
            "--workflow", conf_path, "--date", "2024-01-10",
            "--notification-file", report,
        ])
        assert code == 0
        out = spark.read.parquet(str(tmp_path / "ms_out"))
        rows = out.orderBy("id").collect()
        # filter v >= 2 dropped id=0 (v=1); doubled = v * 2
        assert [r["id"] for r in rows] == [1, 2, 3, 4]
        assert [r["doubled"] for r in rows] == [4, 6, 8, 10]
        assert "pramen_info_date" in out.columns
        assert os.path.getsize(report) > 0

    def test_dry_run_and_ops_filter(self, spark, tmp_path):
        raw = str(tmp_path / "raw")
        spark.range(3).selectExpr("id", "id AS v").write.parquet(raw)
        text = (
            WORKFLOW.replace("%SRC%", str(tmp_path / "ms_src"))
            .replace("%OUT%", str(tmp_path / "ms_out"))
            .replace("%CSV%", str(tmp_path / "csv"))
            .replace("%RAWDATA%", raw)
        )
        conf_path = str(tmp_path / "pipeline.conf")
        with open(conf_path, "w") as f:
            f.write(text)
        from pramen_spark.cli import main

        assert main(["--workflow", conf_path, "--date", "2024-01-10", "--dry-run"]) == 0

    def test_json_workflow_also_loads(self, tmp_path):
        conf = {
            "pramen": {
                "pipeline": {"name": "jsonpipe"},
                "metastore": {"tables": [
                    {"name": "t", "format": "parquet", "path": "/tmp/x"}
                ]},
                "operations": [],
            }
        }
        path = str(tmp_path / "wf.json")
        with open(path, "w") as f:
            json.dump(conf, f)
        wf = load_workflow(path)
        assert wf.pipeline_name == "jsonpipe"
        assert wf.tables[0].name == "t"


class TestExpectationsConfig:
    def test_expectations_parse_into_operation(self, tmp_path):
        conf = """
pramen {
  pipeline.name = "exp"
  bookkeeping.path = "%BK%"
  metastore { tables = [ { name = "t", format = "parquet", path = "%P%" } ] }
  sources = [ { name = "s", factory.class = "SparkSource", format = "parquet",
                has.information.date.column = false } ]
  operations = [
    {
      name = "ingest"
      type = "ingestion"
      schedule.type = "daily"
      source = "s"
      expectation.action = "warn"
      expectations = [
        { name = "id_ok", kind = "not_null", col = "id" },
        { name = "n_range", kind = "in_range", col = "n", lo = 0, hi = 10 }
      ]
      tables = [ { input.path = "%IN%", output.metastore.table = "t" } ]
    }
  ]
}
""".replace("%BK%", str(tmp_path / "bk")).replace("%P%", str(tmp_path / "p")).replace(
            "%IN%", str(tmp_path / "in")
        )
        path = str(tmp_path / "wf.conf")
        with open(path, "w") as f:
            f.write(conf)
        from pramen_spark.config.loader import _operation_def

        wf = load_workflow(path)
        raw = wf.operations[0]
        op = _operation_def(
            raw, "ingestion", "", "t", [], raw["tables"][0]
        )
        assert op.expectations_action == "warn"
        assert [e["name"] for e in op.expectations] == ["id_ok", "n_range"]
        assert op.expectations[1]["lo"] == 0 and op.expectations[1]["hi"] == 10
