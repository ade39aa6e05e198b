"""Local (edge-node) file source: copies files from the local filesystem to
a temporary Hadoop-visible directory, then Spark-reads them there.

Reference: core/.../source/LocalSparkSource.scala:30-116. Spark executors
cannot see the driver/edge node's local disk on a real cluster, so files
must be staged into a distributed filesystem first; this source wraps
``SparkSource`` with that copy step.

Scale notes: the copy runs on the driver (as in the reference — edge-node
files are small config/landing drops, not big data); everything after the
copy is a normal distributed Spark read. The temp dir is unique per
connection, so parallel pipelines never collide, and ``close()`` removes it.
"""

from __future__ import annotations

import datetime as _dt
import fnmatch
import os
import shutil
import uuid
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from pramen_spark.api import Source
from pramen_spark.sources.spark_source import SparkSource


class LocalSparkSource(Source):
    """Options:
    - ``temp.hadoop.path`` (mandatory): staging dir visible to executors
    - ``file.name.pattern``: glob for file names (default ``*``)
    - ``recursive``: descend into subdirectories (default false)
    - all ``SparkSource`` options (``format``, ``schema``, ``option.*``, ...)
      apply to the read of the staged copy
    """

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        super().__init__(spark, options)
        if "temp.hadoop.path" not in self.options:
            raise ValueError("LocalSparkSource requires option 'temp.hadoop.path'")
        self.temp_hadoop_path = str(self.options["temp.hadoop.path"])
        self.file_name_pattern = str(self.options.get("file.name.pattern", "*"))
        self.recursive = str(self.options.get("recursive", "false")).lower() == "true"
        self._inner = SparkSource(spark, options)
        self._temp_base: Optional[str] = None

    # the staged copy has no info-date column semantics of its own
    def has_info_date_column(self) -> bool:
        return False

    def connect(self) -> None:
        if self._temp_base is None:
            self._temp_base = os.path.join(
                self.temp_hadoop_path, f"local_spark_source_{uuid.uuid4().hex[:12]}"
            )
            os.makedirs(self._temp_base, exist_ok=True)

    def close(self) -> None:
        if self._temp_base is not None and os.path.isdir(self._temp_base):
            shutil.rmtree(self._temp_base, ignore_errors=True)
        self._temp_base = None

    def _list_local_files(self, local_path: str) -> List[str]:
        """Non-hidden files under ``local_path`` matching the name pattern
        (reference: FsTraverserLocal, includeHiddenFiles=false)."""
        matches: List[str] = []
        if os.path.isfile(local_path):
            return [local_path]
        for root, dirs, files in os.walk(local_path):
            dirs[:] = [d for d in sorted(dirs) if not d.startswith(".")] if self.recursive else []
            for f in sorted(files):
                if f.startswith("."):
                    continue
                if fnmatch.fnmatch(f, self.file_name_pattern):
                    matches.append(os.path.join(root, f))
        return matches

    def copy_files_to_temp_dir(self, local_path: str) -> str:
        """Stage matching files into a fresh subdir of the temp base; returns
        the staged dir path (one dir per get_data call, as in the reference's
        per-query getTempPath)."""
        self.connect()
        assert self._temp_base is not None
        staged = os.path.join(self._temp_base, uuid.uuid4().hex[:12])
        os.makedirs(staged, exist_ok=True)
        for src in self._list_local_files(local_path):
            shutil.copy2(src, os.path.join(staged, os.path.basename(src)))
        return staged

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        path = query["path"] if isinstance(query, dict) else str(query)
        staged = self.copy_files_to_temp_dir(path)
        return self._inner.get_data({"path": staged}, date_from, date_to)

    def get_data_incremental(self, query, info_date, offset_from, offset_to) -> DataFrame:
        raise NotImplementedError(
            "LocalSparkSource does not support incremental reads "
            "(reference: LocalSparkSource.scala getDataIncremental = ???)"
        )
