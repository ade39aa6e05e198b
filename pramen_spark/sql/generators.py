"""JDBC SQL generation: dialect-aware pushdown of date-range, offset,
count, limit, and schema-probe queries.

This layer exists because Catalyst does NOT push custom date/offset
predicates through JDBC subqueries with per-dialect literal syntax — the
generated SQL string goes into ``spark.read.jdbc(dbtable=f"({sql}) t")``
and the RDBMS only ships the requested slice.

Behavioral parity target (SQL strings match the reference):
  api/.../sql/SqlGenerator.scala:29-132, SqlGeneratorBase.scala:93-141,150-237
  core/.../sql/SqlGeneratorGeneric.scala, ...PostgreSQL, ...MySQL,
  ...Oracle (ROWNUM, half-open interval), ...Microsoft (TOP n, NOLOCK,
  CONVERT), ...HsqlDb (TO_DATE), loader core/.../sql/SqlGeneratorLoader.scala:44-58
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from enum import Enum
from typing import Dict, List, Optional, Sequence, Type

MAX_STRING_OFFSET_CHARACTERS = 512
FORBIDDEN_CHARACTERS = ";'\\"
NORMAL_CHARACTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_."


class SqlColumnType(str, Enum):
    """Info-date column type at the source (api/.../sql/SqlColumnType.scala)."""

    DATE = "date"
    DATETIME = "datetime"
    STRING = "string"
    NUMBER = "number"


class QuotingPolicy(str, Enum):
    AUTO = "auto"
    ALWAYS = "always"
    NEVER = "never"


class OffsetType(str, Enum):
    DATETIME = "datetime"
    INTEGRAL = "integral"
    STRING = "string"


@dataclass(frozen=True)
class OffsetValue:
    """Tagged offset value (api/.../offset/OffsetValue.scala)."""

    type: OffsetType
    value: object  # datetime for DATETIME, int for INTEGRAL, str for STRING

    @staticmethod
    def datetime(v: _dt.datetime) -> "OffsetValue":
        return OffsetValue(OffsetType.DATETIME, v)

    @staticmethod
    def integral(v: int) -> "OffsetValue":
        return OffsetValue(OffsetType.INTEGRAL, v)

    @staticmethod
    def string(v: str) -> "OffsetValue":
        return OffsetValue(OffsetType.STRING, v)


def offset_raw_value(v):
    """Unwrap an OffsetValue to its raw value; pass raw values through.

    Source.get_data_incremental receives OffsetValue objects end-to-end
    (reference: IncrementalIngestionJob.scala getData); sources that filter
    DataFrame-side (Spark/Kafka) unwrap with this helper, while JDBC sources
    keep the tagged value for dialect-aware SQL rendering.
    """
    return v.value if isinstance(v, OffsetValue) else v


@dataclass(frozen=True)
class OffsetInfo:
    offset_column: str
    offset_type: OffsetType = OffsetType.INTEGRAL


@dataclass
class SqlConfig:
    """api/.../sql/SqlConfig.scala:24-30."""

    info_date_column: str = "info_date"
    info_date_type: SqlColumnType = SqlColumnType.DATE
    date_format_app: str = "yyyy-MM-dd"
    offset_info: Optional[OffsetInfo] = None
    server_time_zone: str = "UTC"
    identifier_quoting_policy: QuotingPolicy = QuotingPolicy.AUTO


def _format_java_date(d: _dt.date, pattern: str) -> str:
    from pramen_spark.dsl.interpolate import format_date_java

    return format_date_java(d, pattern)


def _format_ts_millis(ts: _dt.datetime, server_time_zone: str = "UTC") -> str:
    """yyyy-MM-dd HH:mm:ss.SSS (SqlGeneratorBase.scala:33). A tz-aware
    instant is rendered as the SERVER's wall-clock time (the reference's
    ``LocalDateTime.ofInstant(ts, sqlConfig.serverTimeZone)``, e.g.
    SqlGeneratorGeneric.scala:100 — the database compares offset
    predicates in its own zone); naive datetimes pass through as-is."""
    if ts.tzinfo is not None:
        from zoneinfo import ZoneInfo

        ts = ts.astimezone(ZoneInfo(server_time_zone)).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%d %H:%M:%S.") + f"{ts.microsecond // 1000:03d}"


class SqlGenerator:
    """Base dialect: ANSI double-quote quoting, ``LIMIT n``,
    inclusive date interval, ``date'...'`` literals."""

    begin_escape = '"'
    end_escape = '"'

    def __init__(self, config: SqlConfig | None = None):
        self.config = config or SqlConfig()

    # --- identifiers --------------------------------------------------

    def validate_identifier(self, identifier: str) -> None:
        for c in identifier:
            if c in FORBIDDEN_CHARACTERS or ord(c) < 32:
                raise ValueError(
                    f"The character '{c}' (0x{ord(c):02X}) cannot be used as part of "
                    f"column name in '{identifier}'."
                )

    def split_complex_identifier(self, identifier: str) -> List[str]:
        s = identifier.strip()
        if not s:
            raise ValueError(f"Found an empty table name or column name ('{identifier}').")
        parts: List[str] = []
        cur: List[str] = []
        in_quotes = False
        for c in s:
            if c == self.begin_escape and self.begin_escape == self.end_escape:
                in_quotes = not in_quotes
                cur.append(c)
            elif c == self.begin_escape and not in_quotes:
                in_quotes = True
                cur.append(c)
            elif c == self.end_escape and in_quotes:
                in_quotes = False
                cur.append(c)
            elif c == "." and not in_quotes:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(c)
        parts.append("".join(cur))
        return parts

    def quote_single(self, identifier: str) -> str:
        if identifier.startswith(self.begin_escape) and identifier.endswith(self.end_escape):
            return identifier
        return f"{self.begin_escape}{identifier}{self.end_escape}"

    def unquote_single(self, identifier: str) -> str:
        if (
            identifier.startswith(self.begin_escape)
            and identifier.endswith(self.end_escape)
            and len(identifier) > 2
        ):
            return identifier[1:-1]
        return identifier

    def quote(self, identifier: str) -> str:
        self.validate_identifier(identifier)
        return ".".join(self.quote_single(p) for p in self.split_complex_identifier(identifier))

    def unquote(self, identifier: str) -> str:
        self.validate_identifier(identifier)
        return ".".join(self.unquote_single(p) for p in self.split_complex_identifier(identifier))

    def needs_escaping(self, identifier: str) -> bool:
        policy = self.config.identifier_quoting_policy
        if policy == QuotingPolicy.ALWAYS:
            return True
        if policy == QuotingPolicy.NEVER:
            return False
        return not all(c in NORMAL_CHARACTERS for c in identifier)

    def escape(self, identifier: str) -> str:
        return self.quote(identifier) if self.needs_escaping(identifier) else identifier

    # --- pieces -------------------------------------------------------

    def column_expr(self, columns: Sequence[str]) -> str:
        if not columns:
            return "*"
        return ", ".join(self.escape(c) for c in columns)

    @property
    def info_date_column(self) -> str:
        return self.escape(self.config.info_date_column)

    def alias_expression(self, expression: str, alias: str) -> str:
        return f"{expression} AS {self.escape(alias)}"

    def date_literal(self, date: _dt.date) -> str:
        t = self.config.info_date_type
        if t in (SqlColumnType.DATE, SqlColumnType.DATETIME):
            return f"date'{date.isoformat()}'"
        if t == SqlColumnType.STRING:
            return f"'{_format_java_date(date, self.config.date_format_app)}'"
        return _format_java_date(date, self.config.date_format_app)

    def _adjusted_info_date_column(self) -> str:
        if self.config.info_date_type == SqlColumnType.DATETIME:
            return f"CAST({self.info_date_column} AS DATE)"
        return self.info_date_column

    def get_where(self, date_begin: _dt.date, date_end: _dt.date) -> str:
        begin_lit = self.date_literal(date_begin)
        end_lit = self.date_literal(date_end)
        col = self._adjusted_info_date_column()
        if begin_lit == end_lit:
            return f"{col} = {begin_lit}"
        return f"{col} >= {begin_lit} AND {col} <= {end_lit}"

    def limit_suffix(self, limit: Optional[int]) -> str:
        return f" LIMIT {limit}" if limit is not None else ""

    # --- queries ------------------------------------------------------

    def get_dtable(self, sql: str) -> str:
        """Wrap arbitrary SQL so it can be used as Spark's ``dbtable``."""
        return f"({sql}) AS t" if " " in sql else sql

    def get_data_query(
        self, table_name: str, columns: Sequence[str] = (), limit: Optional[int] = None
    ) -> str:
        return (
            f"SELECT {self.column_expr(columns)} FROM {self.escape(table_name)}"
            f"{self.limit_suffix(limit)}"
        )

    def get_data_query_range(
        self,
        table_name: str,
        date_begin: _dt.date,
        date_end: _dt.date,
        columns: Sequence[str] = (),
        limit: Optional[int] = None,
    ) -> str:
        where = self.get_where(date_begin, date_end)
        return (
            f"SELECT {self.column_expr(columns)} FROM {self.escape(table_name)}"
            f" WHERE {where}{self.limit_suffix(limit)}"
        )

    def get_count_query(
        self,
        table_name: str,
        date_begin: Optional[_dt.date] = None,
        date_end: Optional[_dt.date] = None,
    ) -> str:
        if date_begin is None:
            return f"SELECT COUNT(*) AS CNT FROM {self.escape(table_name)}"
        where = self.get_where(date_begin, date_end if date_end else date_begin)
        return f"SELECT COUNT(*) AS CNT FROM {self.escape(table_name)} WHERE {where}"

    def get_count_query_for_sql(self, filtered_sql: str) -> str:
        return f"SELECT COUNT(*) FROM ({filtered_sql}) query"

    def get_schema_query(self, table_name: str, columns: Sequence[str] = ()) -> str:
        return f"{self.get_data_query(table_name, columns)} WHERE 0=1"

    # --- incremental --------------------------------------------------

    def validate_offset_value(self, offset: OffsetValue) -> None:
        if offset.type == OffsetType.STRING:
            s = str(offset.value)
            if "'" in s:
                raise ValueError(
                    f"Offset value '{s}' contains a single quote character, which is not supported."
                )
            if len(s) > MAX_STRING_OFFSET_CHARACTERS:
                raise ValueError(
                    f"Offset value '{s}' is bigger than {MAX_STRING_OFFSET_CHARACTERS} bytes"
                )

    def offset_where_condition(self, column: str, condition: str, offset: OffsetValue) -> str:
        if offset.type == OffsetType.DATETIME:
            return (
                f"{column} {condition} "
                f"'{_format_ts_millis(offset.value, self.config.server_time_zone)}'"
            )
        if offset.type == OffsetType.INTEGRAL:
            return f"{column} {condition} {offset.value}"
        if offset.type == OffsetType.STRING:
            return f"{column} {condition} '{offset.value}'"
        raise ValueError(f"Offset type [{offset.type}] is not supported by {type(self).__name__}.")

    def offset_where_clause(
        self, offset_from: Optional[OffsetValue], offset_to: Optional[OffsetValue]
    ) -> str:
        assert self.config.offset_info is not None
        col = self.escape(self.config.offset_info.offset_column)
        if offset_from is not None and offset_to is not None:
            self.validate_offset_value(offset_from)
            self.validate_offset_value(offset_to)
            return (
                f"{self.offset_where_condition(col, '>=', offset_from)} AND "
                f"{self.offset_where_condition(col, '<=', offset_to)}"
            )
        if offset_from is not None:
            self.validate_offset_value(offset_from)
            return self.offset_where_condition(col, ">", offset_from)
        if offset_to is not None:
            self.validate_offset_value(offset_to)
            return self.offset_where_condition(col, "<=", offset_to)
        return ""

    def get_data_query_incremental(
        self,
        table_name: str,
        only_for_info_date: Optional[_dt.date],
        offset_from: Optional[OffsetValue],
        offset_to: Optional[OffsetValue],
        columns: Sequence[str] = (),
    ) -> str:
        if self.config.offset_info is None:
            raise ValueError(
                f"Offset information is not configured for database table: {table_name}."
            )
        if only_for_info_date is not None:
            base = self.get_data_query_range(
                table_name, only_for_info_date, only_for_info_date, columns
            )
        else:
            base = self.get_data_query(table_name, columns)
        where = self.offset_where_clause(offset_from, offset_to)
        if not where:
            return base
        joiner = "AND" if only_for_info_date is not None else "WHERE"
        return f"{base} {joiner} {where}"


class SqlGeneratorGeneric(SqlGenerator):
    pass


class SqlGeneratorPostgreSQL(SqlGenerator):
    """Also used for Redshift (SqlGeneratorLoader.scala:44-58)."""

    def get_dtable(self, sql: str) -> str:
        return f"({sql}) t" if " " in sql else sql

    def get_count_query(self, table_name, date_begin=None, date_end=None):
        if date_begin is None:
            return f"SELECT COUNT(*) FROM {self.escape(table_name)}"
        where = self.get_where(date_begin, date_end if date_end else date_begin)
        return f"SELECT COUNT(*) FROM {self.escape(table_name)} WHERE {where}"

    def date_literal(self, date: _dt.date) -> str:
        t = self.config.info_date_type
        if t == SqlColumnType.DATE:
            return f"date'{date.isoformat()}'"
        if t == SqlColumnType.DATETIME:
            return f"'{date.isoformat()}'"
        if t == SqlColumnType.STRING:
            return f"'{_format_java_date(date, self.config.date_format_app)}'"
        return _format_java_date(date, self.config.date_format_app)

    def get_where(self, date_begin: _dt.date, date_end: _dt.date) -> str:
        col = self.info_date_column
        if self.config.info_date_type == SqlColumnType.DATETIME:
            next_day = date_end + _dt.timedelta(days=1)
            return f"{col} >= '{date_begin.isoformat()}' AND {col} < '{next_day.isoformat()}'"
        begin_lit = self.date_literal(date_begin)
        end_lit = self.date_literal(date_end)
        if begin_lit == end_lit:
            return f"{col} = {begin_lit}"
        return f"{col} >= {begin_lit} AND {col} <= {end_lit}"


class SqlGeneratorMySQL(SqlGenerator):
    begin_escape = "`"
    end_escape = "`"

    def get_dtable(self, sql: str) -> str:
        return f"({sql}) t" if " " in sql else sql

    def get_count_query(self, table_name, date_begin=None, date_end=None):
        if date_begin is None:
            return f"SELECT COUNT(*) FROM {self.escape(table_name)}"
        where = self.get_where(date_begin, date_end if date_end else date_begin)
        return f"SELECT COUNT(*) FROM {self.escape(table_name)} WHERE {where}"

    def date_literal(self, date: _dt.date) -> str:
        t = self.config.info_date_type
        if t in (SqlColumnType.DATE, SqlColumnType.DATETIME):
            return f"'{date.isoformat()}'"
        if t == SqlColumnType.STRING:
            return f"'{_format_java_date(date, self.config.date_format_app)}'"
        return _format_java_date(date, self.config.date_format_app)

    def get_where(self, date_begin: _dt.date, date_end: _dt.date) -> str:
        col = self.info_date_column
        if self.config.info_date_type == SqlColumnType.DATETIME:
            next_day = date_end + _dt.timedelta(days=1)
            return (
                f"{col} >= '{date_begin.isoformat()} 00:00:00' AND "
                f"{col} < '{next_day.isoformat()} 00:00:00'"
            )
        begin_lit = self.date_literal(date_begin)
        end_lit = self.date_literal(date_end)
        if begin_lit == end_lit:
            return f"{col} = {begin_lit}"
        return f"{col} >= {begin_lit} AND {col} <= {end_lit}"


class SqlGeneratorOracle(SqlGenerator):
    """ROWNUM limits, half-open date interval (SqlGeneratorOracle.scala:60-66)."""

    def get_dtable(self, sql: str) -> str:
        return f"({sql})" if " " in sql else sql

    def alias_expression(self, expression: str, alias: str) -> str:
        return f"{expression} {self.escape(alias)}"

    def get_count_query(self, table_name, date_begin=None, date_end=None):
        if date_begin is None:
            return f"SELECT COUNT(*) FROM {self.escape(table_name)}"
        where = self.get_where(date_begin, date_end if date_end else date_begin)
        return f"SELECT COUNT(*) FROM {self.escape(table_name)} WHERE {where}"

    def get_where(self, date_begin: _dt.date, date_end: _dt.date) -> str:
        if date_end < date_begin:
            raise ValueError(f"infoDateEnd [{date_end}] must be >= infoDateBegin [{date_begin}]")
        begin_lit = self.date_literal(date_begin)
        end_lit = self.date_literal(date_end + _dt.timedelta(days=1))
        col = self.info_date_column
        return f"{col} >= {begin_lit} AND {col} < {end_lit}"

    def get_data_query(self, table_name, columns=(), limit=None):
        lim = f" WHERE ROWNUM <= {limit}" if limit is not None else ""
        return f"SELECT {self.column_expr(columns)} FROM {self.escape(table_name)}{lim}"

    def get_data_query_range(self, table_name, date_begin, date_end, columns=(), limit=None):
        where = self.get_where(date_begin, date_end)
        lim = f" AND ROWNUM <= {limit}" if limit is not None else ""
        return (
            f"SELECT {self.column_expr(columns)} FROM {self.escape(table_name)}"
            f" WHERE {where}{lim}"
        )

    def offset_where_condition(self, column, condition, offset):
        if offset.type == OffsetType.DATETIME:
            return (
                f"{column} {condition} TIMESTAMP "
                f"'{_format_ts_millis(offset.value, self.config.server_time_zone)}'"
            )
        return super().offset_where_condition(column, condition, offset)


class SqlGeneratorMicrosoft(SqlGenerator):
    """TOP n limits, WITH (NOLOCK) scan hints, CONVERT(DATE, ..., 23)
    literals (SqlGeneratorMicrosoft.scala:53-199)."""

    begin_escape = "["
    end_escape = "]"
    ISO_FORMAT_REF = 23

    def get_dtable(self, sql: str) -> str:
        return f"({sql}) AS tbl" if " " in sql else sql

    def date_literal(self, date: _dt.date) -> str:
        t = self.config.info_date_type
        iso = date.isoformat()
        if t in (SqlColumnType.DATE, SqlColumnType.DATETIME):
            return f"CONVERT(DATE, '{iso}', {self.ISO_FORMAT_REF})"
        if t == SqlColumnType.STRING:
            if self._is_iso():
                return f"CONVERT(DATE, '{iso}', {self.ISO_FORMAT_REF})"
            return f"'{_format_java_date(date, self.config.date_format_app)}'"
        return _format_java_date(date, self.config.date_format_app)

    def _is_iso(self) -> bool:
        return self.config.date_format_app == "yyyy-MM-dd"

    def get_where(self, date_begin: _dt.date, date_end: _dt.date) -> str:
        begin_lit = self.date_literal(date_begin)
        end_lit = self.date_literal(date_end)
        col = self.info_date_column
        if self.config.info_date_type == SqlColumnType.DATETIME:
            col = f"CONVERT(DATE, {col}, {self.ISO_FORMAT_REF})"
        elif self.config.info_date_type == SqlColumnType.STRING and self._is_iso():
            col = f"TRY_CONVERT(DATE, {col}, {self.ISO_FORMAT_REF})"
        if begin_lit == end_lit:
            return f"{col} = {begin_lit}"
        return f"{col} >= {begin_lit} AND {col} <= {end_lit}"

    def _top(self, limit: Optional[int]) -> str:
        return f"TOP {limit} " if limit is not None else ""

    def get_data_query(self, table_name, columns=(), limit=None):
        return (
            f"SELECT {self._top(limit)}{self.column_expr(columns)} "
            f"FROM {self.escape(table_name)} WITH (NOLOCK)"
        )

    def get_data_query_range(self, table_name, date_begin, date_end, columns=(), limit=None):
        where = self.get_where(date_begin, date_end)
        return (
            f"SELECT {self._top(limit)}{self.column_expr(columns)} "
            f"FROM {self.escape(table_name)} WITH (NOLOCK) WHERE {where}"
        )

    def get_count_query(self, table_name, date_begin=None, date_end=None):
        cnt = self.alias_expression("COUNT_BIG(*)", "CNT")
        if date_begin is None:
            return f"SELECT {cnt} FROM {self.escape(table_name)} WITH (NOLOCK)"
        where = self.get_where(date_begin, date_end if date_end else date_begin)
        return f"SELECT {cnt} FROM {self.escape(table_name)} WITH (NOLOCK) WHERE {where}"

    def get_count_query_for_sql(self, filtered_sql: str) -> str:
        return f"SELECT COUNT_BIG(*) FROM ({filtered_sql}) AS query"


class SqlGeneratorHsqlDb(SqlGenerator):
    def date_literal(self, date: _dt.date) -> str:
        t = self.config.info_date_type
        if t in (SqlColumnType.DATE, SqlColumnType.DATETIME):
            return f"TO_DATE('{date.isoformat()}', 'YYYY-MM-DD')"
        if t == SqlColumnType.STRING:
            return f"'{_format_java_date(date, self.config.date_format_app)}'"
        return _format_java_date(date, self.config.date_format_app)

    def offset_where_condition(self, column, condition, offset):
        if offset.type == OffsetType.DATETIME:
            return (
                f"{column} {condition} TIMESTAMP "
                f"'{_format_ts_millis(offset.value, self.config.server_time_zone)}'"
            )
        return super().offset_where_condition(column, condition, offset)


class SqlGeneratorDb2(SqlGenerator):
    pass


class SqlGeneratorDenodo(SqlGenerator):
    pass


class SqlGeneratorHive(SqlGenerator):
    begin_escape = "`"
    end_escape = "`"


class SqlGeneratorDatabricks(SqlGeneratorHive):
    pass


class SqlGeneratorSas(SqlGenerator):
    """SAS via MVADriver: identifiers quoted with 'name'n syntax."""

    def quote_single(self, identifier: str) -> str:
        if identifier.startswith("'") and identifier.endswith("'n"):
            return identifier
        return f"'{identifier}'n"

    def unquote_single(self, identifier: str) -> str:
        if identifier.startswith("'") and identifier.endswith("'n") and len(identifier) > 3:
            return identifier[1:-2]
        return identifier


# driver-class -> dialect (core/.../sql/SqlGeneratorLoader.scala:44-58)
_DRIVER_MAP: Dict[str, Type[SqlGenerator]] = {
    "org.postgresql.Driver": SqlGeneratorPostgreSQL,
    "com.amazon.redshift.jdbc42.Driver": SqlGeneratorPostgreSQL,
    "com.mysql.cj.jdbc.Driver": SqlGeneratorMySQL,
    "com.mysql.jdbc.Driver": SqlGeneratorMySQL,
    "org.mariadb.jdbc.Driver": SqlGeneratorMySQL,
    "oracle.jdbc.OracleDriver": SqlGeneratorOracle,
    "com.microsoft.sqlserver.jdbc.SQLServerDriver": SqlGeneratorMicrosoft,
    "net.sourceforge.jtds.jdbc.Driver": SqlGeneratorMicrosoft,
    "org.hsqldb.jdbc.JDBCDriver": SqlGeneratorHsqlDb,
    "com.ibm.db2.jcc.DB2Driver": SqlGeneratorDb2,
    "com.denodo.vdp.jdbc.Driver": SqlGeneratorDenodo,
    "org.apache.hive.jdbc.HiveDriver": SqlGeneratorHive,
    "com.simba.spark.jdbc.Driver": SqlGeneratorDatabricks,
    "com.databricks.client.jdbc.Driver": SqlGeneratorDatabricks,
    "com.sas.rio.MVADriver": SqlGeneratorSas,
}

_VENDOR_MAP: Dict[str, Type[SqlGenerator]] = {
    "generic": SqlGeneratorGeneric,
    "postgresql": SqlGeneratorPostgreSQL,
    "redshift": SqlGeneratorPostgreSQL,
    "mysql": SqlGeneratorMySQL,
    "mariadb": SqlGeneratorMySQL,
    "oracle": SqlGeneratorOracle,
    "microsoft": SqlGeneratorMicrosoft,
    "sqlserver": SqlGeneratorMicrosoft,
    "hsqldb": SqlGeneratorHsqlDb,
    "db2": SqlGeneratorDb2,
    "denodo": SqlGeneratorDenodo,
    "hive": SqlGeneratorHive,
    "databricks": SqlGeneratorDatabricks,
    "sas": SqlGeneratorSas,
}


def generator_for_driver(driver_class: str, config: SqlConfig | None = None) -> SqlGenerator:
    cls = _DRIVER_MAP.get(driver_class, SqlGeneratorGeneric)
    return cls(config)


def generator_for_vendor(vendor: str, config: SqlConfig | None = None) -> SqlGenerator:
    cls = _VENDOR_MAP.get(vendor.lower())
    if cls is None:
        raise ValueError(f"Unknown SQL dialect vendor: {vendor}")
    return cls(config)
