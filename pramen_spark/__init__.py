"""pramen_spark — a PySpark-native, configuration-driven batch data-pipeline
and analytics engine with the capabilities of AbsaOSS/pramen.

Architecture is Spark-first: metastore tables are date-partitioned
Parquet/Delta datasets read and written through the DataFrame API, all
row-level operators are Catalyst expressions (``F.expr``), and large-scale
extensions (dedup, similarity search, text analysis) are built from
DataFrame primitives with Pandas-UDF fallbacks only where necessary.

Reference behavior is documented per-module with file:line citations into
the reference repo (see SURVEY.md).
"""

__version__ = "0.1.0"

from pramen_spark.dsl.dateexpr import DateExprEvaluator, eval_date_expr
from pramen_spark.config.models import (
    DataFormat,
    PartitionInfo,
    PartitionScheme,
    Schedule,
    TableConfig,
)
from pramen_spark.metastore.metastore import Metastore, MetastoreReader

__all__ = [
    "DateExprEvaluator",
    "eval_date_expr",
    "DataFormat",
    "PartitionInfo",
    "PartitionScheme",
    "Schedule",
    "TableConfig",
    "Metastore",
    "MetastoreReader",
]
