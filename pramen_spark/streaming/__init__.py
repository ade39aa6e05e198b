from pramen_spark.streaming.stream import (
    metastore_foreach_batch_sink,
    read_file_stream,
    sessionize,
    windowed_aggregation,
)

__all__ = [
    "metastore_foreach_batch_sink",
    "read_file_stream",
    "sessionize",
    "windowed_aggregation",
]
