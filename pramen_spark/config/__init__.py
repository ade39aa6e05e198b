from pramen_spark.config.models import (
    CachePolicy,
    DataFormat,
    FieldChange,
    MetastoreDependency,
    OperationDef,
    PartitionInfo,
    PartitionScheme,
    Schedule,
    TableConfig,
)

__all__ = [
    "CachePolicy",
    "DataFormat",
    "FieldChange",
    "MetastoreDependency",
    "OperationDef",
    "PartitionInfo",
    "PartitionScheme",
    "Schedule",
    "TableConfig",
]
