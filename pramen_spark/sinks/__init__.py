from pramen_spark.sinks.spark_sink import SparkSink
from pramen_spark.sinks.local_csv_sink import LocalCsvSink
from pramen_spark.sinks.cmd_line_sink import CmdLineSink
from pramen_spark.sinks.shard_sink import ShardSink, write_training_shards

__all__ = [
    "SparkSink",
    "LocalCsvSink",
    "CmdLineSink",
    "ShardSink",
    "write_training_shards",
]
