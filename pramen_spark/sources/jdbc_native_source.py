"""JDBC native source: dialect SQL executed over a raw DBAPI connection.

Reference: core/.../reader/TableReaderJdbcNative.scala:30-158 +
utils/JdbcNativeUtils.scala — the reader that runs the generated (or
user-supplied) SQL over a plain JDBC connection and builds the DataFrame
from the result set itself, for statements the Spark JDBC reader cannot
express (vendor-specific SQL, non-SELECT statements returning cursors,
drivers too quirky for the ``dbtable`` subquery wrapping).

Python-side the connection is any DBAPI 2.0 driver: the stdlib
``sqlite3`` works out of the box (``sqlite.path`` option) and anything
else plugs in via ``connection.factory`` ("pkg.module:callable" returning
an open connection).

Scale note: like the reference, a native read materializes through ONE
connection on the driver, then parallelizes via ``createDataFrame`` —
it is the escape hatch for control-plane and medium result sets, not the
bulk path (that is ``JdbcSource``, where Spark's JDBC reader partitions
the read).  ``fetch.size`` bounds driver memory per batch.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pramen_spark.sources.jdbc_source import JdbcSource


def _infer_field(values: List[Any]) -> T.DataType:
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, bytes):
            return T.BinaryType()
        if isinstance(v, _dt.datetime):
            return T.TimestampType()
        if isinstance(v, _dt.date):
            return T.DateType()
        return T.StringType()
    return T.StringType()


class JdbcNativeSource(JdbcSource):
    """Options (in addition to ``JdbcSource``'s dialect/pushdown options):

    - ``connection.factory``: "pkg.module.callable" -> DBAPI connection
    - ``sqlite.path``: shortcut for the stdlib sqlite3 backend
    - ``fetch.size``: rows per cursor.fetchmany batch (default 10000)
    - ``sql``-typed queries may use ``@infoDateBegin`` / ``@infoDateEnd`` /
      ``@infoDate`` tokens, substituted as quoted ISO dates
      (TableReaderJdbcNative.applyInfoDateExpressionToQuery)
    """

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        super().__init__(spark, options)
        self._conn = None

    # --- connection ---

    def _connect(self):
        if self._conn is not None:
            return self._conn
        factory = self.options.get("connection.factory")
        if factory:
            from pramen_spark.api import load_class

            self._conn = load_class(factory)()
        elif "sqlite.path" in self.options:
            import sqlite3

            self._conn = sqlite3.connect(self.options["sqlite.path"])
        else:
            raise ValueError(
                "JdbcNativeSource needs 'connection.factory' or 'sqlite.path'"
            )
        return self._conn

    def close(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None

    # --- execution over DBAPI ---

    def _run_query(self, sql: str) -> DataFrame:
        cur = self._connect().cursor()
        cur.execute(sql)
        names = [d[0] for d in cur.description]
        fetch_size = int(self.options.get("fetch.size", 10_000))
        rows: List[tuple] = []
        while True:
            batch = cur.fetchmany(fetch_size)
            if not batch:
                break
            rows.extend(tuple(r) for r in batch)
        cur.close()
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        schema = T.StructType(
            [T.StructField(n, _infer_field(list(vals)), True) for n, vals in zip(names, cols)]
        )
        return self.spark.createDataFrame(rows, schema=schema)

    @staticmethod
    def _substitute_dates(sql: str, date_from: _dt.date, date_to: _dt.date) -> str:
        # longest token first: @infoDateBegin must not be clobbered by @infoDate
        return (
            sql.replace("@infoDateBegin", f"'{date_from.isoformat()}'")
            .replace("@infoDateEnd", f"'{date_to.isoformat()}'")
            .replace("@infoDate", f"'{date_to.isoformat()}'")
        )

    # --- Source protocol ---

    def has_info_date_column(self) -> bool:
        return bool(self.options.get("has.information.date.column", True))

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        if isinstance(query, dict) and "sql" in query:
            return self._run_query(self._substitute_dates(query["sql"], date_from, date_to))
        table = query["table"] if isinstance(query, dict) else str(query)
        return self._run_query(self.build_data_sql(table, date_from, date_to))

    def get_record_count(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> int:
        if isinstance(query, dict) and "sql" in query:
            sql = self._substitute_dates(query["sql"], date_from, date_to)
            wrapped = f"SELECT COUNT(*) FROM ({sql}) AS q"  # JdbcSparkUtils.getSchemaQuery-style wrap
            cur = self._connect().cursor()
            cur.execute(wrapped)
            n = cur.fetchone()[0]
            cur.close()
            return int(n)
        table = query["table"] if isinstance(query, dict) else str(query)
        cur = self._connect().cursor()
        cur.execute(self.build_count_sql(table, date_from, date_to))
        n = cur.fetchone()[0]
        cur.close()
        return int(n)

    def get_data_incremental(self, query, info_date, offset_from, offset_to) -> DataFrame:
        if isinstance(query, dict) and "sql" in query:
            raise ValueError(
                "Incremental ingestion needs a 'table' query for the native reader "
                "(TableReaderJdbcNative.getIncrementalData)"
            )
        table = query["table"] if isinstance(query, dict) else str(query)
        return self._run_query(
            self.build_incremental_sql(
                table,
                info_date,
                self._as_offset_value(offset_from),
                self._as_offset_value(offset_to),
            )
        )
