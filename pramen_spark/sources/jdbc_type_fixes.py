"""JDBC ingestion type corrections: schema fixes for RDBMS quirks.

Relational databases hand Spark schemas with well-known warts; the
reference fixes them at read time and this module is the PySpark-native
equivalent, as pure StructType / column-expression transforms (no
connections, fully unit-testable):

- ``get_corrected_decimals_schema`` — Oracle-style ``NUMBER`` columns
  arrive as wide decimals: no-scale decimals become int/long, scale > 18
  is clamped to ``decimal(38, 18)``, and databases that report precision
  as the INTEGRAL digit count (so precision < scale is possible) get
  ``precision + scale``. Emitted as a Spark JDBC ``customSchema`` option
  string so the fix applies inside the JVM reader itself.
  Reference: core/.../utils/JdbcSparkUtils.scala:273-310.
- ``convert_timestamps_to_dates`` — cast every TimestampType column to
  DateType (``save.timestamps.as.dates``).
  Reference: JdbcSparkUtils.scala:236-256.
- ``add_metadata_from_fields`` / ``field_metadata_from_description`` —
  attach ``maxLength`` metadata to VARCHAR(n)-backed string columns from
  driver-level field metadata (DBAPI ``cursor.description`` plays the
  role of JDBC ``ResultSetMetaData``). Reference:
  JdbcSparkUtils.scala:34-82,319-332.
- ``add_column_descriptions`` — attach ``comment`` metadata from a
  column->description map (the reference reads ``REMARKS`` from JDBC
  database metadata). Reference: JdbcSparkUtils.scala:96-135.
- ``sanitize_datetime_columns`` — clamp date/timestamp values to the
  0001-01-01 .. 9999-12-31 range so downstream Parquet/Hive readers do
  not choke on sentinel dates like 99999-12-31. Reference:
  utils/impl/ResultSetToRowIterator.scala:372-399,415-427 and
  README.md:636-638 (``sanitize.datetime``). The reference clamps
  row-by-row inside its hand-rolled JDBC iterator (its only hand-rolled
  value path); our Spark-first equivalent is a codegen'd column
  expression on the Spark-reader path — which in PySpark is also the
  only path that CAN produce out-of-range values, since Python
  ``datetime`` objects are bounded to years 1..9999 by construction.
- ``get_schema_query`` — turn a data query into a 0-row schema probe.
  Reference: JdbcSparkUtils.scala:198-204.

All transforms stay JVM-side (schema strings, ``select`` with aliases,
``when`` expressions) — no RDD round-trips, no Python UDFs — so they are
free at any scale.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import List, Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAXIMUM_VARCHAR_LENGTH = 8192
MAXIMUM_UUID_LENGTH = 50

MAX_LENGTH_METADATA_KEY = "maxLength"
COMMENT_METADATA_KEY = "comment"

# Spark-compatible safe range (ResultSetToRowIterator.scala:415-427; the
# reference's max timestamp is 23:59:59.999 after millisecond truncation,
# ours keeps Spark's microsecond resolution)
MIN_SAFE_DATE = _dt.date(1, 1, 1)
MAX_SAFE_DATE = _dt.date(9999, 12, 31)
MIN_SAFE_TIMESTAMP = "0001-01-01 00:00:00"
MAX_SAFE_TIMESTAMP = "9999-12-31 23:59:59.999999"


@dataclass(frozen=True)
class JdbcFieldMetadata:
    """Driver-level field description (JdbcSparkUtils.scala:319-332 /
    utils/impl/JdbcFieldMetadata.scala), populated from DBAPI
    ``cursor.description`` on the Python side."""

    name: str
    label: str = ""
    sql_type: int = 0
    sql_type_name: str = ""
    display_size: int = 0
    precision: int = 0
    scale: int = 0
    nullable: bool = True

    @property
    def effective_name(self) -> str:
        return self.name if self.name else self.label


def _escape_column(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def get_corrected_decimals_schema(
    schema: T.StructType, fix_precision: bool = False
) -> Optional[str]:
    """Build a Spark JDBC ``customSchema`` option string correcting
    decimal columns, or None when nothing needs fixing
    (JdbcSparkUtils.scala:273-310):

    - scale == 0, precision <= 9  -> integer
    - scale == 0, precision <= 18 -> long
    - scale > 18                  -> decimal(38, 18)
    - ``fix_precision``: the database reported precision as the count of
      INTEGRAL digits (so "precision 5, scale 8" means 13 total) ->
      decimal(min(precision + scale, 38), scale), only when that widens.
    """
    parts: List[str] = []
    for field in schema.fields:
        dt = field.dataType
        if not isinstance(dt, T.DecimalType):
            continue
        esc = _escape_column(field.name)
        if dt.scale == 0 and dt.precision <= 9:
            parts.append(f"{esc} integer")
        elif dt.scale == 0 and dt.precision <= 18:
            parts.append(f"{esc} long")
        elif dt.scale > 18:
            parts.append(f"{esc} decimal(38, 18)")
        elif fix_precision and dt.scale > 0:
            fixed_precision = min(dt.precision + dt.scale, 38)
            if fixed_precision > dt.precision:
                parts.append(f"{esc} decimal({fixed_precision}, {dt.scale})")
    return ", ".join(parts) if parts else None


def convert_timestamps_to_dates(df: DataFrame) -> DataFrame:
    """Cast every TimestampType column to DateType, keeping names and
    order; returns the SAME DataFrame object when there is nothing to
    convert (JdbcSparkUtils.scala:236-256)."""
    if not any(isinstance(f.dataType, T.TimestampType) for f in df.schema.fields):
        return df
    cols = [
        df[f.name].cast(T.DateType()).alias(f.name)
        if isinstance(f.dataType, T.TimestampType)
        else df[f.name]
        for f in df.schema.fields
    ]
    return df.select(*cols)


def add_metadata_from_fields(
    schema: T.StructType, fields: Sequence[JdbcFieldMetadata]
) -> T.StructType:
    """Add ``maxLength`` metadata to string columns backed by VARCHAR(n)
    (JdbcSparkUtils.scala:48-82). Existing metadata entries survive.

    uuid columns get a fixed max length of 50; lengths of 0 (unknown) or
    >= 8192 (CLOB-ish) are left unannotated.
    """
    by_name = {f.effective_name.lower(): f for f in fields}
    new_fields = []
    for field in schema.fields:
        meta = by_name.get(field.name.lower())
        if isinstance(field.dataType, T.StringType) and meta is not None:
            if meta.sql_type_name.lower() == "uuid":
                max_length = MAXIMUM_UUID_LENGTH
            else:
                max_length = max(meta.display_size, meta.precision)
            if 0 < max_length < MAXIMUM_VARCHAR_LENGTH:
                merged = dict(field.metadata)
                merged[MAX_LENGTH_METADATA_KEY] = int(max_length)
                field = T.StructField(field.name, field.dataType, field.nullable, merged)
        new_fields.append(field)
    return T.StructType(new_fields)


def field_metadata_from_description(description) -> List[JdbcFieldMetadata]:
    """Map a DBAPI 2.0 ``cursor.description`` (7-sequences of name,
    type_code, display_size, internal_size, precision, scale, null_ok)
    to the internal field-metadata model. Drivers that report None for
    the size fields (sqlite3) simply yield no maxLength annotations."""
    out: List[JdbcFieldMetadata] = []
    for d in description or ():
        name, type_code = d[0], d[1]
        display_size = d[2] if len(d) > 2 and d[2] else 0
        internal_size = d[3] if len(d) > 3 and d[3] else 0
        precision = d[4] if len(d) > 4 and d[4] else 0
        scale = d[5] if len(d) > 5 and d[5] else 0
        null_ok = d[6] if len(d) > 6 and d[6] is not None else True
        out.append(
            JdbcFieldMetadata(
                name=str(name).strip(),
                label=str(name).strip(),
                sql_type_name=str(type_code) if type_code is not None else "",
                display_size=int(display_size or internal_size),
                precision=int(precision),
                scale=int(scale),
                nullable=bool(null_ok),
            )
        )
    return out


def add_column_descriptions(
    schema: T.StructType, comments: Mapping[str, str]
) -> T.StructType:
    """Add ``comment`` metadata from a case-insensitive column->description
    map (JdbcSparkUtils.scala:96-135 reads these from JDBC database
    metadata ``REMARKS``; callers supply whatever their driver exposes).
    Existing metadata entries survive."""
    by_name = {k.lower(): v for k, v in comments.items() if v is not None}
    new_fields = []
    for field in schema.fields:
        desc = by_name.get(field.name.lower())
        if desc is not None:
            merged = dict(field.metadata)
            merged[COMMENT_METADATA_KEY] = desc
            field = T.StructField(field.name, field.dataType, field.nullable, merged)
        new_fields.append(field)
    return T.StructType(new_fields)


def apply_schema_metadata(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Re-attach the (metadata-enriched) schema to a DataFrame without an
    RDD round-trip: a projection with per-column metadata aliases stays
    entirely JVM-side (the reference's ``createDataFrame(df.rdd, schema)``
    would serialize every row through Python in PySpark)."""
    return df.select(
        *[
            df[f.name].alias(f.name, metadata=dict(f.metadata))
            for f in schema.fields
        ]
    )


def sanitize_datetime_columns(df: DataFrame) -> DataFrame:
    """Clamp every date/timestamp column into
    0001-01-01 .. 9999-12-31 (README.md:636-638 ``sanitize.datetime``;
    ResultSetToRowIterator.scala:372-399). NULLs pass through untouched;
    returns the SAME DataFrame object when no date/timestamp columns
    exist. Codegen'd ``when`` expressions — no shuffle, no Python."""
    has_dt = any(
        isinstance(f.dataType, (T.DateType, T.TimestampType)) for f in df.schema.fields
    )
    if not has_dt:
        return df
    # string-cast literals: py4j's java.sql.Date conversion rejects
    # year-1 Python dates, the SQL cast does not
    date_lo = F.lit(MIN_SAFE_DATE.isoformat()).cast("date")
    date_hi = F.lit(MAX_SAFE_DATE.isoformat()).cast("date")
    ts_lo = F.lit(MIN_SAFE_TIMESTAMP).cast("timestamp")
    ts_hi = F.lit(MAX_SAFE_TIMESTAMP).cast("timestamp")
    cols = []
    for f in df.schema.fields:
        c = df[f.name]
        if isinstance(f.dataType, T.DateType):
            c = (
                F.when(c < date_lo, date_lo)
                .when(c > date_hi, date_hi)
                .otherwise(c)
                .alias(f.name, metadata=dict(f.metadata))
            )
        elif isinstance(f.dataType, T.TimestampType):
            c = (
                F.when(c < ts_lo, ts_lo)
                .when(c > ts_hi, ts_hi)
                .otherwise(c)
                .alias(f.name, metadata=dict(f.metadata))
            )
        cols.append(c)
    return df.select(*cols)


def get_schema_query(sql: str) -> str:
    """Turn a data query into a 0-row probe for schema/metadata reads
    (JdbcSparkUtils.scala:198-204)."""
    if " where " in sql.lower():
        return sql + " AND 0=1"
    return sql + " WHERE 0=1"
