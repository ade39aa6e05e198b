"""JDBC source: dialect SQL generation + Spark JDBC reader.

Reference: core/.../reader/TableReaderJdbc.scala:58-138 (getData pushes the
date-range WHERE into the generated SQL; the query is wrapped as a
subquery in Spark's ``dbtable``), count queries TableReaderJdbc.scala:40-56.

The generated SQL ships the predicate to the RDBMS — only the requested
date/offset slice crosses the wire, regardless of what Catalyst can push
through a subquery. Parallel reads use Spark's partitionColumn options
passed verbatim.

This container has no database drivers, so this class is exercised by
unit tests on the generated SQL plus a fake executor; on a real deployment
it runs unchanged against any JDBC URL.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from pramen_spark.api import Source
from pramen_spark.sql.generators import (
    OffsetValue,
    SqlConfig,
    SqlGenerator,
    generator_for_driver,
    generator_for_vendor,
)


class JdbcSource(Source):
    """Options:
    - ``url``, ``driver``, ``user``, ``password``: JDBC connectivity
    - ``vendor``: dialect name (overrides driver-class detection)
    - ``information.date.column`` / ``information.date.type`` /
      ``information.date.app.format``: pushdown config
    - ``limit.records``: optional row limit pushdown
    - ``columns``: column projection pushed into the SELECT
    - any ``option.*``: passed to the Spark JDBC reader (fetchsize, ...)
    """

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        super().__init__(spark, options)
        from pramen_spark.sql.generators import OffsetInfo, OffsetType, QuotingPolicy, SqlColumnType

        sql_config = SqlConfig(
            info_date_column=self.options.get("information.date.column", "info_date"),
            info_date_type=SqlColumnType(self.options.get("information.date.type", "date")),
            date_format_app=self.options.get("information.date.app.format", "yyyy-MM-dd"),
            identifier_quoting_policy=QuotingPolicy(
                self.options.get("identifier.quoting.policy", "auto")
            ),
            offset_info=(
                OffsetInfo(
                    self.options["offset.column"],
                    OffsetType(self.options.get("offset.type", "integral")),
                )
                if "offset.column" in self.options
                else None
            ),
        )
        if "vendor" in self.options:
            self.generator: SqlGenerator = generator_for_vendor(self.options["vendor"], sql_config)
        else:
            self.generator = generator_for_driver(self.options.get("driver", ""), sql_config)

    # --- SQL building (unit-testable without a database) ---

    def build_data_sql(self, table: str, date_from: _dt.date, date_to: _dt.date) -> str:
        columns = self.options.get("columns", ())
        limit = self.options.get("limit.records")
        limit = int(limit) if limit is not None else None
        if self.options.get("has.information.date.column", True):
            return self.generator.get_data_query_range(table, date_from, date_to, columns, limit)
        return self.generator.get_data_query(table, columns, limit)

    def build_count_sql(self, table: str, date_from: _dt.date, date_to: _dt.date) -> str:
        if self.options.get("has.information.date.column", True):
            return self.generator.get_count_query(table, date_from, date_to)
        return self.generator.get_count_query(table)

    def build_incremental_sql(
        self,
        table: str,
        info_date: Optional[_dt.date],
        offset_from: Optional[OffsetValue],
        offset_to: Optional[OffsetValue],
    ) -> str:
        return self.generator.get_data_query_incremental(
            table, info_date, offset_from, offset_to, self.options.get("columns", ())
        )

    # --- execution through the Spark JDBC reader ---

    def _jdbc_read(self, sql: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.options["url"])
            .option("dbtable", self.generator.get_dtable(sql))
        )
        for key in ("driver", "user", "password"):
            if key in self.options:
                reader = reader.option(key, self.options[key])
        for k, v in self.options.items():
            if k.startswith("option."):
                reader = reader.option(k[len("option.") :], v)
        return reader.load()

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        table = query["table"] if isinstance(query, dict) else str(query)
        return self._jdbc_read(self.build_data_sql(table, date_from, date_to))

    def get_record_count(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> int:
        table = query["table"] if isinstance(query, dict) else str(query)
        df = self._jdbc_read(self.build_count_sql(table, date_from, date_to))
        return int(df.collect()[0][0])

    def _as_offset_value(self, v) -> Optional[OffsetValue]:
        """Accept OffsetValue (the standard contract) or a raw value."""
        from pramen_spark.sql.generators import OffsetType

        if v is None or isinstance(v, OffsetValue):
            return v
        offset_type = OffsetType(self.options.get("offset.type", "integral"))
        if offset_type == OffsetType.DATETIME:
            # raw numerics/strings are epoch millis (matching the ledger's
            # decode_offset encoding); anything else would crash later in
            # the generator's timestamp formatting
            if isinstance(v, _dt.datetime):
                return OffsetValue.datetime(v)
            if isinstance(v, (int, float)) or (isinstance(v, str) and v.lstrip("-").isdigit()):
                return OffsetValue.datetime(
                    _dt.datetime.fromtimestamp(int(v) / 1000.0, tz=_dt.timezone.utc)
                )
            raise TypeError(
                f"offset.type=datetime needs a datetime or epoch-millis value; "
                f"got {v!r} ({type(v).__name__})"
            )
        if offset_type == OffsetType.INTEGRAL:
            return OffsetValue.integral(int(v))
        return OffsetValue.string(str(v))

    def get_data_incremental(self, query, info_date, offset_from, offset_to) -> DataFrame:
        table = query["table"] if isinstance(query, dict) else str(query)
        return self._jdbc_read(
            self.build_incremental_sql(
                table,
                info_date,
                self._as_offset_value(offset_from),
                self._as_offset_value(offset_to),
            )
        )
