from pramen_spark.metastore.metastore import Metastore, MetastoreReader
from pramen_spark.metastore.persistence import (
    MetastorePersistence,
    ParquetPersistence,
    TransientTableManager,
)

__all__ = [
    "Metastore",
    "MetastoreReader",
    "MetastorePersistence",
    "ParquetPersistence",
    "TransientTableManager",
]
