"""Public user API: the extension points a pipeline author implements.

Mirrors the reference's ``pramen/api`` traits:
- ``Transformer``  <- api/.../Transformer.scala:23-75 (validate/run/postProcess)
- ``Source``       <- api/.../Source.scala (getRecordCount/getData contract)
- ``Sink``         <- api/.../Sink.scala (connect/send/close)
- ``Reason``       <- api/.../Reason.scala (Ready/NotReady/Skip/Warning)

Classes are referenced from config by ``module.ClassName`` strings and
instantiated via importlib (reference uses Java reflection —
core/.../utils/ClassLoaderUtils.scala).
"""

from __future__ import annotations

import datetime as _dt
import importlib
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from pramen_spark.metastore.metastore import MetastoreReader


@dataclass(frozen=True)
class Reason:
    """Validation outcome."""

    kind: str  # ready | not_ready | skip | warning
    message: str = ""
    warnings: Sequence[str] = ()

    @staticmethod
    def ready(*warnings: str) -> "Reason":
        return Reason("ready", warnings=tuple(warnings))

    @staticmethod
    def not_ready(message: str) -> "Reason":
        return Reason("not_ready", message)

    @staticmethod
    def skip(message: str) -> "Reason":
        return Reason("skip", message)

    @property
    def is_ready(self) -> bool:
        return self.kind == "ready"


class Transformer:
    """User transformation: receives a scoped metastore reader and the info
    date; returns the output DataFrame. Runs inside the driver process; the
    returned DataFrame is a lazy Catalyst plan, so all heavy lifting stays
    distributed."""

    def __init__(self, options: Optional[Dict[str, Any]] = None):
        self.options = dict(options or {})

    def validate(
        self, metastore: MetastoreReader, info_date: _dt.date, options: Dict[str, Any]
    ) -> Reason:
        return Reason.ready()

    def run(
        self,
        metastore: MetastoreReader,
        info_date: _dt.date,
        options: Dict[str, Any],
    ) -> DataFrame:
        raise NotImplementedError

    def post_process(
        self, metastore: MetastoreReader, info_date: _dt.date, options: Dict[str, Any]
    ) -> None:
        pass


class Source:
    """Batch source: produces a DataFrame for a date range or offset range."""

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        self.spark = spark
        self.options = dict(options or {})

    def has_info_date_column(self) -> bool:
        return True

    def get_record_count(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> int:
        return self.get_data(query, date_from, date_to).count()

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        raise NotImplementedError

    def get_data_incremental(
        self,
        query: Any,
        info_date: Optional[_dt.date],
        offset_from: Optional[Any],
        offset_to: Optional[Any],
    ) -> DataFrame:
        raise NotImplementedError

    def close(self) -> None:
        pass


class Sink:
    """Output channel: receives the decorated DataFrame for one info date."""

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        self.spark = spark
        self.options = dict(options or {})

    def connect(self) -> None:
        pass

    def send(
        self,
        df: DataFrame,
        table_name: str,
        info_date: _dt.date,
        options: Dict[str, Any],
    ) -> int:
        """Returns the number of records sent."""
        raise NotImplementedError

    def close(self) -> None:
        pass


def load_class(class_name: str):
    """``module.ClassName`` -> class object (reference:
    core/.../utils/ClassLoaderUtils.scala)."""
    module_name, _, cls = class_name.rpartition(".")
    if not module_name:
        raise ValueError(f"Class name '{class_name}' must be fully qualified (module.Class)")
    mod = importlib.import_module(module_name)
    return getattr(mod, cls)


class IdentityTransformer(Transformer):
    """Copies an input table; used for republishing
    (core/.../transformers/IdentityTransformer.scala:59-92)."""

    def validate(self, metastore, info_date, options) -> Reason:
        if "input.table" not in options and "table" not in options:
            return Reason.not_ready("Option 'input.table' is not defined")
        return Reason.ready()

    def run(self, metastore, info_date, options) -> DataFrame:
        table = options.get("input.table", options.get("table"))
        empty_ok = str(options.get("empty.allowed", "true")).lower() == "true"
        df = metastore.get_table(table, info_date, info_date)
        if not empty_ok and len(df.take(1)) == 0:
            raise RuntimeError(f"Input table '{table}' is empty for {info_date}")
        return df


class ConversionTransformer(Transformer):
    """Converts a 'raw'-format metastore table (a DataFrame of file paths)
    into a tabular DataFrame by Spark-reading the listed files, so a
    downstream parquet/delta metastore table can persist it
    (core/.../transformers/ConversionTransformer.scala).

    Options:
    - ``input.table`` (mandatory): raw-format table with [path, file_name]
    - ``input.format`` (mandatory): csv/json/... for the listed files
    - ``use.file.list``: read exact files (default true) vs their parent dirs
    - any other option (e.g. ``header``, ``delimiter``) goes to the reader

    Scale: only the file *list* (metadata, not data) is collected to the
    driver; the read itself is a distributed multi-file Spark scan."""

    RESERVED = {"input.table", "input.format", "use.file.list"}

    def validate(self, metastore, info_date, options) -> Reason:
        missing = [k for k in ("input.table", "input.format") if k not in options]
        if missing:
            raise ValueError(
                f"Missing mandatory keys for ConversionTransformer: {', '.join(missing)}"
            )
        files = metastore.get_table(options["input.table"], info_date, info_date)
        if len(files.take(1)) == 0:
            return Reason.skip(f"No new files to convert for {info_date}")
        return Reason.ready()

    def run(self, metastore, info_date, options) -> DataFrame:
        files = metastore.get_table(options["input.table"], info_date, info_date)
        paths = [r["path"] for r in files.select("path").collect()]
        use_file_list = str(options.get("use.file.list", "true")).lower() == "true"
        if not use_file_list:
            import os as _os

            paths = sorted({_os.path.dirname(p) for p in paths})
        reader = metastore.spark.read.format(options["input.format"])
        for k, v in options.items():
            if k not in self.RESERVED:
                reader = reader.option(k, v)
        return reader.load(paths)
