"""Workflow config loading: HOCON/JSON file -> models -> jobs.

Maps the reference's workflow key structure (README.md `pramen.*` keys;
PipelineDef at core/.../pipeline/PipelineDef.scala:20-49, OperationDef
parsing at OperationDef.fromConfig:87-140, OperationSplitter.createJobs at
core/.../pipeline/OperationSplitter.scala:43-66) onto this engine's
models. One Job is created per (operation x table), exactly like the
reference's splitter.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import SparkSession

from pramen_spark.api import Sink, Source, Transformer, load_class
from pramen_spark.config import hocon
from pramen_spark.config.models import (
    CachePolicy,
    DataFormat,
    FormatKind,
    MetastoreDependency,
    OperationDef,
    PartitionInfo,
    Schedule,
    TableConfig,
    TransformExpr,
)
from pramen_spark.metastore.metastore import Metastore
from pramen_spark.runner.bookkeeper import Bookkeeper
from pramen_spark.runner.jobs import IngestionJob, Job, SinkJob, TransformationJob

# reference factory classes -> our implementations
_SOURCE_FACTORIES = {
    "sparksource": "pramen_spark.sources.spark_source.SparkSource",
    "spark": "pramen_spark.sources.spark_source.SparkSource",
    "jdbcsource": "pramen_spark.sources.jdbc_source.JdbcSource",
    "jdbc": "pramen_spark.sources.jdbc_source.JdbcSource",
    "jdbcnative": "pramen_spark.sources.jdbc_native_source.JdbcNativeSource",
    "jdbc_native": "pramen_spark.sources.jdbc_native_source.JdbcNativeSource",
    "rawfilesource": "pramen_spark.sources.raw_file_source.RawFileSource",
    "raw": "pramen_spark.sources.raw_file_source.RawFileSource",
    "kafkaavrosource": "pramen_spark.sources.kafka_source.KafkaSource",
    "kafkasource": "pramen_spark.sources.kafka_source.KafkaSource",
    "kafka": "pramen_spark.sources.kafka_source.KafkaSource",
    "localsparksource": "pramen_spark.sources.local_spark_source.LocalSparkSource",
    "local_spark": "pramen_spark.sources.local_spark_source.LocalSparkSource",
}
_SINK_FACTORIES = {
    "sparksink": "pramen_spark.sinks.spark_sink.SparkSink",
    "spark": "pramen_spark.sinks.spark_sink.SparkSink",
    "localcsvsink": "pramen_spark.sinks.local_csv_sink.LocalCsvSink",
    "local_csv": "pramen_spark.sinks.local_csv_sink.LocalCsvSink",
    "cmdlinesink": "pramen_spark.sinks.cmd_line_sink.CmdLineSink",
    "cmd_line": "pramen_spark.sinks.cmd_line_sink.CmdLineSink",
    "kafkaavrosink": "pramen_spark.sinks.kafka_sink.KafkaSink",
    "kafkasink": "pramen_spark.sinks.kafka_sink.KafkaSink",
    "kafka": "pramen_spark.sinks.kafka_sink.KafkaSink",
    "enceladussink": "pramen_spark.sinks.enceladus_sink.EnceladusSink",
    "enceladus": "pramen_spark.sinks.enceladus_sink.EnceladusSink",
    "standardizationsink": "pramen_spark.sinks.standardization_sink.StandardizationSink",
    "standardization": "pramen_spark.sinks.standardization_sink.StandardizationSink",
    "dataframesink": "pramen_spark.sinks.spark_sink.SparkSink",
    "shardsink": "pramen_spark.sinks.shard_sink.ShardSink",
    "shard": "pramen_spark.sinks.shard_sink.ShardSink",
}
_TRANSFORMER_ALIASES = {
    "identitytransformer": "pramen_spark.api.IdentityTransformer",
    "conversiontransformer": "pramen_spark.api.ConversionTransformer",
}


def _resolve_factory(name: str, table: Dict[str, str]) -> str:
    """Map a reference factory class / shorthand to our class path."""
    simple = name.rsplit(".", 1)[-1].lower()
    return table.get(simple, table.get(name.lower(), name))


@dataclass
class ChannelDef:
    name: str
    factory: str
    options: Dict[str, Any] = field(default_factory=dict)


@dataclass
class WorkflowDef:
    pipeline_name: str = "pipeline"
    environment: str = "local"
    parallel_tasks: int = 4
    bookkeeping_path: Optional[str] = None
    bookkeeping_format: str = "text"  # text (JSONL) | parquet | delta
    # RDBMS backends (BookkeeperJdbc/JournalJdbc/OffsetManagerJdbc): stdlib
    # sqlite3 via a path, anything else via a DBAPI connection factory
    bookkeeping_jdbc_sqlite: Optional[str] = None
    bookkeeping_jdbc_factory: Optional[str] = None
    lock_dir: Optional[str] = None  # pramen.lock.dir -> cross-process file locks
    mail_config: Dict[str, Any] = field(default_factory=dict)  # flat mail.* keys
    temp_dir: Optional[str] = None
    tables: List[TableConfig] = field(default_factory=list)
    sources: Dict[str, ChannelDef] = field(default_factory=dict)
    sinks: Dict[str, ChannelDef] = field(default_factory=dict)
    operations: List[Dict[str, Any]] = field(default_factory=list)
    spark_conf: Dict[str, str] = field(default_factory=dict)
    notification_targets: List[Dict[str, Any]] = field(default_factory=list)
    startup_hook_class: Optional[str] = None
    shutdown_hook_class: Optional[str] = None


def _get(d: Dict[str, Any], *keys: str, default: Any = None) -> Any:
    """Fetch a possibly-dotted key: _get(x, "information.date.column")
    looks up x["information"]["date"]["column"] and the flat spelling."""
    for key in keys:
        if key in d:
            return d[key]
        cur: Any = d
        ok = True
        for part in key.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                ok = False
                break
        if ok:
            return cur
    return default


def parse_table_config(spec: Dict[str, Any]) -> TableConfig:
    fmt_name = str(_get(spec, "format", default="parquet")).lower()
    cache_policy = CachePolicy(str(_get(spec, "cache.policy", default="no_cache")).lower())
    if fmt_name == "parquet":
        fmt = DataFormat.parquet(_get(spec, "path"))
    elif fmt_name == "delta":
        fmt = DataFormat.delta(path=_get(spec, "path"), table=_get(spec, "table"))
    elif fmt_name == "iceberg":
        fmt = DataFormat.iceberg(_get(spec, "table"), _get(spec, "location", "path"))
    elif fmt_name == "raw":
        fmt = DataFormat.raw(_get(spec, "path"))
    elif fmt_name == "transient":
        fmt = DataFormat.transient(cache_policy, lazy=True)
    elif fmt_name == "transient_eager":
        fmt = DataFormat.transient(cache_policy, lazy=False)
    elif fmt_name == "null":
        fmt = DataFormat.null()
    else:
        raise ValueError(f"Unknown metastore format '{fmt_name}'")
    rpp = _get(spec, "records.per.partition")
    npart = _get(spec, "number.of.partitions")
    if rpp or npart:
        fmt = DataFormat(
            fmt.kind,
            path=fmt.path,
            table=fmt.table,
            cache_policy=fmt.cache_policy,
            partition_info=PartitionInfo(
                kind="explicit" if npart else "per_record_count",
                records_per_partition=int(rpp) if rpp else None,
                num_partitions=int(npart) if npart else None,
                prefer_coalesce=bool(_get(spec, "prefer.coalesce", default=False)),
            ),
        )
    start = _get(spec, "information.date.start")
    kwargs: Dict[str, Any] = {}
    if start:
        kwargs["info_date_start"] = _dt.date.fromisoformat(str(start))
    idc = _get(spec, "information.date.column")
    if idc is not None:
        kwargs["info_date_column"] = idc
    idf = _get(spec, "information.date.format")
    if idf is not None:
        kwargs["info_date_format"] = idf
    return TableConfig(
        name=spec["name"],
        format=fmt,
        description=_get(spec, "description", default=""),
        track_days=int(_get(spec, "track.days", default=0)),
        backfill_days=int(_get(spec, "backfill.days", default=0)),
        save_mode=_get(spec, "save.mode"),
        read_options=dict(_get(spec, "read.option", default={}) or {}),
        write_options=dict(_get(spec, "write.option", default={}) or {}),
        hive_table=_get(spec, "hive.table"),
        hive_database=_get(spec, "hive.database"),
        **kwargs,
    )


def _parse_channels(specs: Sequence[Dict[str, Any]], factories: Dict[str, str]) -> Dict[str, ChannelDef]:
    out: Dict[str, ChannelDef] = {}
    for spec in specs or []:
        name = spec["name"]
        factory = _resolve_factory(
            str(_get(spec, "factory.class", default=name)), factories
        )
        options = {
            k: v
            for k, v in _flatten(spec).items()
            if k not in ("name", "factory.class")
        }
        # use.jdbc.native (README:652-655): route the source through the
        # DBAPI-native reader instead of the Spark JDBC connector
        if (
            factory == "pramen_spark.sources.jdbc_source.JdbcSource"
            and str(options.get("use.jdbc.native", "false")).lower() == "true"
        ):
            factory = "pramen_spark.sources.jdbc_native_source.JdbcNativeSource"
        out[name] = ChannelDef(name=name, factory=factory, options=options)
    return out


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, f"{key}."))
        else:
            out[key] = v
    return out


def load_workflow(source: str | Dict[str, Any]) -> WorkflowDef:
    conf = hocon.load(source) if isinstance(source, str) else source
    p = conf.get("pramen", {})
    wf = WorkflowDef(
        pipeline_name=_get(p, "pipeline.name", default="pipeline"),
        environment=_get(p, "environment.name", default="local"),
        parallel_tasks=int(_get(p, "parallel.tasks", default=4)),
        bookkeeping_path=_get(p, "bookkeeping.location", "bookkeeping.jdbc.url"),
        bookkeeping_format=str(
            _get(p, "bookkeeping.hadoop.format", default="text")
        ).lower(),
        bookkeeping_jdbc_sqlite=_get(p, "bookkeeping.jdbc.sqlite.path"),
        bookkeeping_jdbc_factory=_get(p, "bookkeeping.jdbc.connection.factory"),
        temp_dir=_get(p, "temporary.directory"),
        lock_dir=_get(p, "lock.dir"),
    )
    wf.tables = [
        parse_table_config(t) for t in _get(p, "metastore.tables", default=[]) or []
    ]
    wf.sources = _parse_channels(p.get("sources", []), _SOURCE_FACTORIES)
    wf.sinks = _parse_channels(p.get("sinks", []), _SINK_FACTORIES)
    wf.operations = list(p.get("operations", []) or [])
    wf.spark_conf = {
        str(k): str(v) for k, v in _flatten(_get(p, "spark.conf", default={}) or {}).items()
    }
    # pramen.notification.targets + pramen.hook.{startup,shutdown}.class
    # (HookConfig.scala STARTUP_HOOK_CLASS_KEY / SHUTDOWN_HOOK_CLASS_KEY)
    wf.notification_targets = list(_get(p, "notification.targets", default=[]) or [])
    wf.startup_hook_class = _get(p, "hook.startup.class")
    wf.shutdown_hook_class = _get(p, "hook.shutdown.class")
    # mail.* lives at the config root like the reference (Keys.scala:30-33,
    # Sendable.scala reads the flat mail.smtp.* subtree)
    wf.mail_config = _flatten(conf.get("mail", {}) or {})
    return wf


def _parse_dependencies(spec: Sequence[Dict[str, Any]]) -> List[MetastoreDependency]:
    deps = []
    for d in spec or []:
        deps.append(
            MetastoreDependency(
                tables=tuple(d.get("tables", ())),
                date_from_expr=_get(d, "date.from", default="@infoDate"),
                date_until_expr=_get(d, "date.to", "date.until"),
                trigger_updates=bool(_get(d, "trigger.updates", default=False)),
                is_optional=bool(d.get("optional", False)),
                is_passive=bool(d.get("passive", False)),
            )
        )
    return deps


def _parse_transformations(spec: Sequence[Dict[str, Any]]) -> List[TransformExpr]:
    return [
        TransformExpr(column=t["col"], expression=t.get("expr"), comment=t.get("comment"))
        for t in spec or []
    ]


def _operation_def(
    op: Dict[str, Any],
    kind: str,
    name_suffix: str,
    output_table: str,
    input_tables: Sequence[str],
    table_spec: Dict[str, Any],
) -> OperationDef:
    options = {
        k: v for k, v in _flatten(table_spec).items()
        if not k.startswith(("input.", "output.", "transformations", "filters", "columns", "date."))
    }
    options.update(_flatten(_get(op, "option", default={}) or {}))
    for key in ("date.from", "date.to"):
        v = _get(table_spec, key)
        if v is not None:
            options[key] = v
    sched = _get(op, "schedule", default="daily")
    if isinstance(sched, dict):
        sched = _flatten(sched)  # nested {"days": {"of": {"week": ...}}} -> "days.of.week"
    return OperationDef(
        name=f"{op.get('name', kind)}{name_suffix}",
        kind=kind,
        schedule=Schedule.parse(sched),
        output_table=output_table,
        input_tables=tuple(input_tables),
        dependencies=tuple(_parse_dependencies(op.get("dependencies", []))),
        info_date_expression=_get(op, "info.date.expr"),
        transformations=tuple(
            _parse_transformations(
                table_spec.get("transformations", op.get("transformations", []))
            )
        ),
        filters=tuple(table_spec.get("filters", op.get("filters", ()) or ())),
        columns=tuple(table_spec.get("columns", op.get("columns", ()) or ())),
        options=options,
        spark_config={
            str(k): str(v)
            for k, v in _flatten(_get(op, "spark.config", default={}) or {}).items()
        },
        processing_timestamp_column=_get(op, "processing.timestamp.column"),
        notification_targets=tuple(_get(op, "notification.targets", default=()) or ()),
        expectations=tuple(
            {str(k): v for k, v in _flatten(e).items()}
            for e in (op.get("expectations", ()) or ())
        ),
        expectations_action=str(
            _get(op, "expectation.action", default="fail") or "fail"
        ),
        # ``skew.guard { key = ..., action = agg|join, group.cols = [...] }``
        # — dotted HOCON keys normalize to the underscore names
        # operators/skew.py::apply_skew_guard takes (group.cols ->
        # group_cols, max.salts -> max_salts, right.table -> right_table).
        skew_guard=(
            {
                str(k).replace(".", "_"): v
                for k, v in _flatten(_get(op, "skew.guard", default=None)).items()
            }
            if _get(op, "skew.guard", default=None)
            else None
        ),
    )


def build_jobs(
    spark: SparkSession,
    wf: WorkflowDef,
    metastore: Metastore,
    bookkeeper: Bookkeeper,
    ledger=None,
) -> List[Job]:
    """OperationSplitter.createJobs equivalent: one Job per (operation x
    table).  ``ledger`` is the offset ledger used by incremental-scheduled
    ingestion operations; defaults to an in-memory ledger."""
    jobs: List[Job] = []
    for op in wf.operations:
        op_type = str(op.get("type", "transformation")).lower()
        if bool(op.get("disabled", False)):
            continue
        if op_type == "ingestion":
            src_def = wf.sources[op["source"]]
            src_cls = load_class(src_def.factory)
            for tbl in op.get("tables", []):
                # table-level source option overrides (SourceManager merge)
                overrides = _flatten(tbl.get("source", {}) or {})
                merged_opts = {**src_def.options, **overrides}
                source: Source = src_cls(spark, merged_opts)
                out_name = _get(tbl, "output.metastore.table", "output.table")
                query = {
                    k.split(".", 1)[1]: v
                    for k, v in _flatten(tbl).items()
                    if k.startswith("input.")
                }
                odef = _operation_def(op, "ingestion", f":{out_name}", out_name, (), tbl)
                if (
                    odef.schedule.kind.value == "incremental"
                    and "offset.column" in merged_opts
                ):
                    # incremental schedule + offset config -> offset-tracked
                    # ingestion (IncrementalIngestionJob.scala:60-300)
                    from pramen_spark.offsets.ledger import OffsetLedger
                    from pramen_spark.runner.incremental import IncrementalIngestionJob
                    from pramen_spark.sql.generators import OffsetType

                    jobs.append(
                        IncrementalIngestionJob(
                            odef, metastore, bookkeeper,
                            metastore.table_config(out_name), source, query,
                            ledger if ledger is not None else OffsetLedger(),
                            merged_opts["offset.column"],
                            OffsetType(merged_opts.get("offset.type", "integral")),
                        )
                    )
                else:
                    jobs.append(
                        IngestionJob(
                            odef, metastore, bookkeeper,
                            metastore.table_config(out_name), source, query,
                        )
                    )
        elif op_type in ("transformation", "python_transformation"):
            cls_name = _resolve_factory(str(op.get("class")), _TRANSFORMER_ALIASES)
            transformer: Transformer = load_class(cls_name)()
            out_name = _get(op, "output.table")
            input_tables = [t for d in op.get("dependencies", []) for t in d.get("tables", [])]
            opt_input = _get(op, "option.input.table")
            if opt_input and opt_input not in input_tables:
                input_tables.append(opt_input)
            odef = _operation_def(op, "transformation", "", out_name, input_tables, {})
            jobs.append(
                TransformationJob(
                    odef, metastore, bookkeeper,
                    metastore.table_config(out_name), transformer,
                )
            )
        elif op_type == "sink":
            sink_def = wf.sinks[op["sink"]]
            sink_cls = load_class(sink_def.factory)
            for tbl in op.get("tables", []):
                overrides = _flatten(tbl.get("sink", {}) or {})
                sink: Sink = sink_cls(spark, {**sink_def.options, **overrides})
                in_name = _get(tbl, "input.metastore.table", "input.table")
                virtual_name = f"{in_name}->{sink_def.name}"
                if virtual_name.lower() not in metastore.tables:
                    metastore.add_table(
                        TableConfig(name=virtual_name, format=DataFormat.null())
                    )
                odef = _operation_def(
                    op, "sink", f":{virtual_name}", virtual_name, (in_name,), tbl
                )
                jobs.append(
                    SinkJob(
                        odef, metastore, bookkeeper,
                        metastore.table_config(virtual_name), sink, in_name,
                    )
                )
        else:
            raise ValueError(f"Unknown operation type '{op_type}'")
    return jobs
