from pramen_spark.runner.bookkeeper import Bookkeeper, DataChunk, Journal, JsonBookkeeper
from pramen_spark.runner.jobs import (
    IngestionJob,
    Job,
    JobPreRunResult,
    JobPreRunStatus,
    PythonFunctionJob,
    SinkJob,
    TransformationJob,
)
from pramen_spark.runner.runner import DependencyResolver, PipelineResult, PipelineRunner
from pramen_spark.runner.spark_bookkeeper import SparkBookkeeper, SparkJournal
from pramen_spark.runner.task_runner import RunStatus, TaskResult, TaskRunner

__all__ = [
    "Bookkeeper",
    "DataChunk",
    "DependencyResolver",
    "IngestionJob",
    "Job",
    "JobPreRunResult",
    "JobPreRunStatus",
    "Journal",
    "JsonBookkeeper",
    "PipelineResult",
    "PipelineRunner",
    "PythonFunctionJob",
    "RunStatus",
    "SinkJob",
    "SparkBookkeeper",
    "SparkJournal",
    "TaskResult",
    "TaskRunner",
    "TransformationJob",
]
