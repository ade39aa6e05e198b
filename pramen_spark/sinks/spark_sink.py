"""Generic Spark sink: ``df.write.format(F).mode(M).partitionBy(...)``
with output repartitioning.

Reference: core/.../sink/SparkSink.scala:127-180 (records.per.partition
sizing at SparkSink.scala:53-54).
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any, Dict

from pyspark.sql import DataFrame

from pramen_spark.api import Sink


class SparkSink(Sink):
    """Options:
    - ``format`` (default parquet), ``mode`` (default overwrite)
    - ``path`` or ``table``
    - ``partition.by``: comma-separated partition columns
    - ``number.of.partitions`` or ``records.per.partition``
    - ``save.empty`` (default true)
    - any ``option.*``: writer options
    """

    def send(self, df: DataFrame, table_name: str, info_date: _dt.date, options: Dict[str, Any]) -> int:
        opts = {**self.options, **options}
        fmt = opts.get("format", "parquet")
        mode = opts.get("mode", "overwrite")
        count = df.count()

        if count == 0 and str(opts.get("save.empty", "true")).lower() != "true":
            return 0

        n_partitions = opts.get("number.of.partitions")
        rpp = opts.get("records.per.partition")
        if n_partitions is not None:
            df = df.repartition(int(n_partitions))
        elif rpp is not None:
            df = df.repartition(max(1, math.ceil(count / int(rpp))))

        writer = df.write.format(fmt).mode(mode)
        if opts.get("partition.by"):
            cols = [c.strip() for c in str(opts["partition.by"]).split(",") if c.strip()]
            writer = writer.partitionBy(*cols)
        for k, v in opts.items():
            if k.startswith("option."):
                writer = writer.option(k[len("option.") :], v)

        if "path" in opts:
            path = opts["path"]
            if str(opts.get("partition.by.info.date", "false")).lower() == "true":
                path = f"{path}/{info_date.isoformat()}"
            writer.save(path)
        elif "table" in opts:
            writer.saveAsTable(opts["table"])
        else:
            raise ValueError("SparkSink requires 'path' or 'table' option")
        return count
