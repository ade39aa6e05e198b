from pramen_spark.offsets.ledger import OffsetLedger, OffsetRecord, OffsetTransaction

__all__ = ["OffsetLedger", "OffsetRecord", "OffsetTransaction"]
