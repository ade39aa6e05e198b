from pramen_spark.sinks.spark_sink import SparkSink
from pramen_spark.sinks.local_csv_sink import LocalCsvSink
from pramen_spark.sinks.cmd_line_sink import CmdLineSink

__all__ = ["SparkSink", "LocalCsvSink", "CmdLineSink"]
