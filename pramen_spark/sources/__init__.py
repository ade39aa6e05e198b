from pramen_spark.sources.spark_source import SparkSource
from pramen_spark.sources.raw_file_source import RawFileSource
from pramen_spark.sources.jdbc_source import JdbcSource
from pramen_spark.sources.local_spark_source import LocalSparkSource

__all__ = ["SparkSource", "RawFileSource", "JdbcSource", "LocalSparkSource"]
