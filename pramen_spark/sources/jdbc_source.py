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

    Type-correction options (sources/jdbc_type_fixes.py; reference
    TableReaderJdbc.scala:164-199 + README.md:636-706):
    - ``correct.decimals.in.schema`` (default false): fix NUMBER-style
      decimals (no-scale -> int/long, scale>18 -> decimal(38,18)) via a
      ``customSchema`` re-read
    - ``correct.decimals.fix.precision`` (default false): also widen
      precision when the db reports integral digits only
    - ``save.timestamps.as.dates`` (default false): cast timestamp
      columns to dates
    - ``sanitize.datetime`` (default true): clamp date/timestamp values
      to 0001-01-01 .. 9999-12-31
    - ``enable.schema.metadata`` (default false): annotate VARCHAR(n)
      columns with ``maxLength`` metadata via a 0-row schema probe over
      a DBAPI ``metadata.connection.factory``
    - ``special.characters.in.column.names``: characters replaced by
      '_' in column names after a decimals-corrected read
    """

    def __init__(self, spark: SparkSession, options: Optional[Dict[str, Any]] = None):
        super().__init__(spark, options)
        # HOCON layout parity: the reference nests connectivity under the
        # source's jdbc{} block (JdbcConfig.scala:54-115), which the config
        # loader flattens to 'jdbc.url', 'jdbc.driver', 'jdbc.sanitize.
        # datetime', ... — alias the bare keys this class reads, explicit
        # bare options winning over the prefixed form.
        for k, v in list(self.options.items()):
            if k.startswith("jdbc."):
                bare = k[len("jdbc.") :]
                if bare == "connection.primary.url":
                    bare = "url"
                self.options.setdefault(bare, v)
        from pramen_spark.sql.generators import OffsetInfo, OffsetType, QuotingPolicy, SqlColumnType

        def first_opt(*keys, default=None):
            for k in keys:
                if k in self.options:
                    return self.options[k]
            return default

        # the reference's README spells the info-date block
        # `information.date { column, date.type, date.app.format }`
        # (flattening to information.date.date.*), while its example
        # configs use information.date.format — accept every spelling
        sql_config = SqlConfig(
            info_date_column=self.options.get("information.date.column", "info_date"),
            info_date_type=SqlColumnType(
                first_opt(
                    "information.date.type",
                    "information.date.date.type",
                    default="date",
                )
            ),
            date_format_app=first_opt(
                "information.date.app.format",
                "information.date.date.app.format",
                "information.date.format",
                default="yyyy-MM-dd",
            ),
            identifier_quoting_policy=QuotingPolicy(
                self.options.get("identifier.quoting.policy", "auto")
            ),
            # README:724-726: the database server's timezone, used when
            # rendering datetime offset predicates as server wall-clock
            server_time_zone=self.options.get("server.timezone", "UTC"),
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

    def _opt_bool(self, key: str, default: bool) -> bool:
        v = self.options.get(key)
        if v is None:
            return default
        return str(v).lower() == "true"

    def _jdbc_reader_options(self, sql: str) -> Dict[str, Any]:
        opts: Dict[str, Any] = {
            "url": self.options["url"],
            "dbtable": self.generator.get_dtable(sql),
        }
        for key in ("driver", "user", "password"):
            if key in self.options:
                opts[key] = self.options[key]
        for k, v in self.options.items():
            if k.startswith("option."):
                opts[k[len("option.") :]] = v
        return opts

    def _url_pool(self) -> list:
        """Primary URL + numbered ``fallback.url.N`` options, in order
        (JdbcUrlSelectorImpl.scala:54-69; README.md:617-620)."""
        urls = [self.options["url"]] if "url" in self.options else []
        numbered = sorted(
            (int(k.rsplit(".", 1)[1]), v)
            for k, v in self.options.items()
            if k.startswith("fallback.url.") and k.rsplit(".", 1)[1].isdigit()
        )
        urls += [v for _, v in numbered]
        return urls

    def _with_url_retry(self, attempt_fn):
        """Run ``attempt_fn(url)`` rotating through the URL pool on
        failure, up to ``retries`` total attempts (default: one per URL —
        TableReaderJdbcBase.getWithRetry; 'retries = 1' means a single
        attempt, per README.md:626-628)."""
        urls = self._url_pool()
        if not urls:
            return attempt_fn(self.options.get("url", ""))
        r = self.options.get("retries")
        attempts = max(int(r), 1) if r is not None else len(urls)
        last_err: Optional[Exception] = None
        for i in range(attempts):
            try:
                return attempt_fn(urls[i % len(urls)])
            except Exception as e:  # noqa: BLE001 — driver errors vary by vendor
                last_err = e
        raise last_err

    def _jdbc_read(self, sql: str, is_data_query: bool = True) -> DataFrame:
        from pramen_spark.operators.rowlevel import SPECIAL_CHARACTERS, sanitize_df_columns
        from pramen_spark.sources.jdbc_type_fixes import get_corrected_decimals_schema

        opts = self._jdbc_reader_options(sql)

        def _load(url):
            o = dict(opts, url=url)
            return self.spark.read.format("jdbc").options(**o).load(), o

        df, opts = self._with_url_retry(_load)

        correct_decimals = self._opt_bool("correct.decimals.in.schema", False)
        fix_precision = self._opt_bool("correct.decimals.fix.precision", False)
        if correct_decimals or fix_precision:
            # TableReaderJdbc.scala:164-177: re-read with a corrected
            # customSchema so the fix applies inside the JVM reader (the
            # first read only fetched the schema — lazy, no data moved)
            custom = get_corrected_decimals_schema(df.schema, fix_precision)
            if custom is not None:
                df = (
                    self.spark.read.format("jdbc")
                    .options(**opts)
                    .option("customSchema", custom)
                    .load()
                )
            if is_data_query:
                df = sanitize_df_columns(
                    df,
                    self.options.get(
                        "special.characters.in.column.names", SPECIAL_CHARACTERS
                    ),
                )
        return self._post_read(df, is_data_query, sql)

    def _post_read(self, df: DataFrame, is_data_query: bool, sql: str) -> DataFrame:
        """Shared post-read decorations (also used by the DBAPI-native
        subclass): datetime sanitation, timestamp->date conversion,
        maxLength schema metadata."""
        from pramen_spark.sources.jdbc_type_fixes import (
            convert_timestamps_to_dates,
            sanitize_datetime_columns,
        )

        if is_data_query and self._opt_bool("sanitize.datetime", True):
            df = sanitize_datetime_columns(df)
        if self._opt_bool("save.timestamps.as.dates", False):
            df = convert_timestamps_to_dates(df)
        if is_data_query and self._opt_bool("enable.schema.metadata", False):
            df = self._apply_jdbc_schema_metadata(df, sql)
        return df

    def _apply_jdbc_schema_metadata(self, df: DataFrame, sql: str) -> DataFrame:
        """Annotate VARCHAR(n)-backed string columns with ``maxLength``
        metadata via a 0-row probe (TableReaderJdbc.scala:183-199). The
        Spark JDBC reader exposes no driver metadata to Python, so the
        probe runs over a DBAPI connection from
        ``metadata.connection.factory``; without one this is a no-op."""
        factory = self.options.get("metadata.connection.factory")
        if not factory:
            return df
        from pramen_spark.api import load_class
        from pramen_spark.sources.jdbc_type_fixes import (
            add_metadata_from_fields,
            apply_schema_metadata,
            field_metadata_from_description,
            get_schema_query,
        )

        conn = load_class(factory)()
        try:
            cur = conn.cursor()
            cur.execute(get_schema_query(sql))
            fields = field_metadata_from_description(cur.description)
            cur.close()
        finally:
            conn.close()
        new_schema = add_metadata_from_fields(df.schema, fields)
        if new_schema == df.schema:
            return df
        return apply_schema_metadata(df, new_schema)

    def get_data(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> DataFrame:
        table = query["table"] if isinstance(query, dict) else str(query)
        return self._jdbc_read(self.build_data_sql(table, date_from, date_to))

    def get_record_count(self, query: Any, date_from: _dt.date, date_to: _dt.date) -> int:
        table = query["table"] if isinstance(query, dict) else str(query)
        df = self._jdbc_read(
            self.build_count_sql(table, date_from, date_to), is_data_query=False
        )
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
