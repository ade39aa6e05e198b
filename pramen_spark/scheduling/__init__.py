from pramen_spark.scheduling.strategies import (
    RunMode,
    ScheduleParams,
    ScheduleStrategyIncremental,
    ScheduleStrategySourcing,
    TaskPreDef,
    TaskRunReason,
    evaluate_run_date,
    get_info_date_range,
)

__all__ = [
    "RunMode",
    "ScheduleParams",
    "ScheduleStrategyIncremental",
    "ScheduleStrategySourcing",
    "TaskPreDef",
    "TaskRunReason",
    "evaluate_run_date",
    "get_info_date_range",
]
