from pramen_spark.sql.generators import (
    OffsetInfo,
    OffsetValue,
    QuotingPolicy,
    SqlColumnType,
    SqlConfig,
    SqlGenerator,
    generator_for_driver,
    generator_for_vendor,
)

__all__ = [
    "OffsetInfo",
    "OffsetValue",
    "QuotingPolicy",
    "SqlColumnType",
    "SqlConfig",
    "SqlGenerator",
    "generator_for_driver",
    "generator_for_vendor",
]
