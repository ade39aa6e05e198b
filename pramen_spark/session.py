"""SparkSession builder tuned for the engine.

Scale posture: AQE on (runtime re-plan + skew-join handling), shuffle
partitions sized to the local core count (on a real cluster this is set per
deployment or left to AQE coalescing), Arrow enabled for the Pandas-UDF
paths, UTC session timezone for deterministic date semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pramen_spark",
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Split small files across cores at scan time (no shuffle): the
        # default 4 MiB openCostInBytes makes Spark lump a sub-128MB file
        # into ONE scan partition, serializing CPU-heavy per-row work
        # (shingling, tokenization) on a single core. maxSplitBytes =
        # min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores)), so
        # a small openCost lets the per-core math win; at cluster scale the
        # many-files case dominates and this setting is neutral.
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
