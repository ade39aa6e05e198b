from pramen_spark.offsets.ledger import OffsetLedger, OffsetRecord, OffsetTransaction
from pramen_spark.offsets.spark_ledger import SparkOffsetLedger

__all__ = ["OffsetLedger", "OffsetRecord", "OffsetTransaction", "SparkOffsetLedger"]
