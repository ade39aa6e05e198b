"""JDBC ingestion type corrections (sources/jdbc_type_fixes.py).

Mirrors the reference suite core/src/test/.../utils/JdbcSparkUtilsSuite
.scala case-by-case (decimal->int, decimal->long, too-big scale, invalid
precision, precision with small scale, no-op), plus the sanitize.datetime
clamp (ResultSetToRowIterator.scala:372-399) and the option wiring through
both JDBC sources via the sqlite3 DBAPI bridge."""

import datetime as dt
import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pramen_spark.sources.jdbc_type_fixes import (
    JdbcFieldMetadata,
    add_column_descriptions,
    add_metadata_from_fields,
    apply_schema_metadata,
    convert_timestamps_to_dates,
    field_metadata_from_description,
    get_corrected_decimals_schema,
    get_schema_query,
    sanitize_datetime_columns,
)


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


class TestCorrectedDecimalsSchema:
    """JdbcSparkUtilsSuite.scala "getCorrectedDecimalsSchema" block."""

    def test_decimal_to_int(self):
        s = _schema(("value", T.DecimalType(9, 0)))
        assert get_corrected_decimals_schema(s) == "`value` integer"

    def test_decimal_to_long(self):
        s = _schema(("value", T.DecimalType(18, 0)))
        assert get_corrected_decimals_schema(s) == "`value` long"

    def test_too_big_scale(self):
        s = _schema(("value", T.DecimalType(38, 20)))
        assert get_corrected_decimals_schema(s) == "`value` decimal(38, 18)"

    def test_invalid_precision(self):
        # scale 20 > 18 wins over the fix-precision branch
        s = _schema(("value", T.DecimalType(28, 20)))
        assert (
            get_corrected_decimals_schema(s, fix_precision=True)
            == "`value` decimal(38, 18)"
        )

    def test_invalid_precision_with_small_scale(self):
        s = _schema(("value", T.DecimalType(30, 16)))
        assert (
            get_corrected_decimals_schema(s, fix_precision=True)
            == "`value` decimal(38, 16)"
        )

    def test_fix_precision_noop_when_already_wide(self):
        # precision + scale <= precision never happens, but a decimal
        # whose widened precision does not exceed the original is kept
        s = _schema(("value", T.DecimalType(38, 10)))
        assert get_corrected_decimals_schema(s, fix_precision=True) is None

    def test_ok_field_untouched(self):
        s = _schema(("value", T.IntegerType()))
        assert get_corrected_decimals_schema(s, fix_precision=True) is None

    def test_no_fix_precision_keeps_fractional_decimals(self):
        s = _schema(("value", T.DecimalType(14, 4)))
        assert get_corrected_decimals_schema(s, fix_precision=False) is None

    def test_multiple_columns_and_backtick_escape(self):
        s = _schema(
            ("a", T.DecimalType(5, 0)),
            ("we`ird", T.DecimalType(18, 0)),
            ("ok", T.StringType()),
        )
        assert (
            get_corrected_decimals_schema(s)
            == "`a` integer, `we``ird` long"
        )


class TestConvertTimestampsToDates:
    def test_converts_only_timestamps(self, spark):
        df = spark.createDataFrame(
            [(1649319691, "2022-01-18"), (1649318691, "2022-02-28")],
            "long long, str string",
        ).withColumn("date", F.col("str").cast("date")).withColumn(
            "ts", F.timestamp_seconds(F.col("long"))
        )
        out = convert_timestamps_to_dates(df)
        kinds = dict(out.dtypes)
        assert kinds == {
            "long": "bigint",
            "str": "string",
            "date": "date",
            "ts": "date",
        }
        got = {r["str"]: r["ts"] for r in out.collect()}
        assert got["2022-01-18"] == dt.date(2022, 4, 7)

    def test_noop_returns_same_object(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        assert convert_timestamps_to_dates(df) is df


class TestMaxLengthMetadata:
    """JdbcSparkUtilsSuite.scala "addMetadataFromJdbc" block: VARCHAR(50)
    gets maxLength, CLOB-sized and non-string fields do not, existing
    metadata survives."""

    FIELDS = [
        JdbcFieldMetadata("ID", sql_type_name="INTEGER", precision=10),
        JdbcFieldMetadata("NAME", sql_type_name="VARCHAR", display_size=50, precision=50),
        JdbcFieldMetadata("DESCRIPTION", sql_type_name="CLOB", display_size=100000),
        JdbcFieldMetadata("EMAIL", sql_type_name="VARCHAR", precision=50),
        JdbcFieldMetadata("FOUNDED", sql_type_name="DATE", display_size=10),
        JdbcFieldMetadata("TOKEN", sql_type_name="uuid", display_size=36),
    ]

    def test_varchar_columns_annotated(self):
        schema = T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("name", T.StringType(), True, {"test_metadata": 0}),
                T.StructField("description", T.StringType()),
                T.StructField("email", T.StringType()),
                T.StructField("founded", T.DateType()),
                T.StructField("token", T.StringType()),
            ]
        )
        out = add_metadata_from_fields(schema, self.FIELDS)
        assert out["name"].metadata == {"test_metadata": 0, "maxLength": 50}
        assert "maxLength" not in out["description"].metadata  # >= 8192
        assert out["email"].metadata == {"maxLength": 50}
        assert out["founded"].metadata == {}  # not a string column
        assert out["token"].metadata == {"maxLength": 50}  # uuid cap
        assert out["id"].metadata == {}

    def test_from_dbapi_description(self):
        desc = (
            ("name", "VARCHAR", 50, 50, None, None, 1),
            ("qty", "NUMERIC", None, None, 10, 2, 0),
            ("blobby", None, None, None, None, None, None),
        )
        fields = field_metadata_from_description(desc)
        assert fields[0].display_size == 50 and fields[0].nullable
        assert fields[1].precision == 10 and fields[1].scale == 2
        assert not fields[1].nullable
        assert fields[2].sql_type_name == "" and fields[2].nullable
        schema = _schema(("name", T.StringType()), ("qty", T.StringType()),
                         ("blobby", T.StringType()))
        out = add_metadata_from_fields(schema, fields)
        assert out["name"].metadata == {"maxLength": 50}
        # NUMERIC precision applies only to string columns mapped from it
        assert out["qty"].metadata == {"maxLength": 10}
        assert out["blobby"].metadata == {}


class TestColumnDescriptions:
    def test_comments_added_case_insensitive(self):
        schema = T.StructType(
            [
                T.StructField("ID", T.IntegerType(), True, {"maxLength": 5}),
                T.StructField("name", T.StringType()),
            ]
        )
        out = add_column_descriptions(
            schema, {"id": "This is the record id", "NAME": "This is company name"}
        )
        assert out["ID"].metadata == {
            "maxLength": 5,
            "comment": "This is the record id",
        }
        assert out["name"].metadata == {"comment": "This is company name"}

    def test_apply_schema_metadata_stays_jvm_side(self, spark):
        df = spark.createDataFrame([(1, "a")], "id int, name string")
        schema = add_column_descriptions(df.schema, {"name": "the name"})
        out = apply_schema_metadata(df, schema)
        assert out.schema["name"].metadata == {"comment": "the name"}
        assert [tuple(r) for r in out.collect()] == [(1, "a")]
        # no Python stages: the plan is a pure projection over the scan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestSanitizeDatetime:
    def test_clamps_out_of_range_timestamps(self, spark):
        df = spark.createDataFrame(
            [(1,)], "id int"
        ).select(
            "id",
            F.lit("0000-12-31 23:59:59").cast("timestamp").alias("lo"),
            F.lit("+99999-01-01 00:00:00").cast("timestamp").alias("hi"),
            F.lit("2024-05-06 07:08:09").cast("timestamp").alias("ok"),
            F.lit(None).cast("timestamp").alias("nil"),
        )
        # sanity, JVM-side (Python datetime cannot even hold these):
        # Spark really does store out-of-range values before the clamp
        years = df.select(F.year("lo").alias("y0"), F.year("hi").alias("y1")).collect()[0]
        assert years["y0"] == 0 and years["y1"] == 99999
        # compare JVM-side: CPython's fromtimestamp cannot round-trip the
        # exact 0001-01-01 boundary, and the clamp's purpose (Parquet/Hive
        # storage safety) is JVM-side anyway
        s = sanitize_datetime_columns(df)
        out = s.select(
            *[F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(c)
              for c in ("lo", "hi", "ok", "nil")]
        ).collect()[0]
        assert out["lo"] == "0001-01-01 00:00:00.000000"
        assert out["hi"] == "9999-12-31 23:59:59.999999"
        assert out["ok"] == "2024-05-06 07:08:09.000000"
        assert out["nil"] is None

    def test_clamps_dates_and_keeps_metadata(self, spark):
        df = spark.createDataFrame([(1,)], "id int").select(
            "id",
            F.lit("+12345-06-07").cast("date").alias("d", metadata={"maxLength": 10}),
        )
        out = sanitize_datetime_columns(df)
        row = out.collect()[0]
        assert row["d"] == dt.date(9999, 12, 31)
        assert out.schema["d"].metadata == {"maxLength": 10}

    def test_noop_without_datetime_columns(self, spark):
        df = spark.createDataFrame([(1, "x")], "id int, s string")
        assert sanitize_datetime_columns(df) is df


class TestSchemaQuery:
    def test_plain_select(self):
        assert get_schema_query("SELECT * FROM t") == "SELECT * FROM t WHERE 0=1"

    def test_with_where(self):
        assert (
            get_schema_query("SELECT * FROM t WHERE a=1")
            == "SELECT * FROM t WHERE a=1 AND 0=1"
        )


# --- option wiring through the sqlite3 DBAPI bridge ---

D0, D1 = dt.date(2024, 1, 10), dt.date(2024, 1, 11)

_METADATA_DB_PATH = None


def open_metadata_db():
    return sqlite3.connect(_METADATA_DB_PATH)


@pytest.fixture()
def tsdb(tmp_path):
    path = str(tmp_path / "ts.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE ev (id INTEGER, info_date TEXT, when_ts TIMESTAMP)")
    conn.executemany(
        "INSERT INTO ev VALUES (?, ?, ?)",
        [
            (1, "2024-01-10", "2024-01-10 11:22:33"),
            (2, "2024-01-11", "2024-01-11 04:05:06"),
        ],
    )
    conn.commit()
    conn.close()
    return path


class TestNativeSourceOptionWiring:
    def _source(self, spark, path, **extra):
        from pramen_spark.sources.jdbc_native_source import JdbcNativeSource

        return JdbcNativeSource(
            spark,
            {
                "sqlite.path": path,
                "vendor": "generic",
                "information.date.column": "info_date",
                "information.date.type": "string",
                # sqlite returns TIMESTAMP columns as strings by default;
                # parse them via SQL so the bridge sees datetimes
                **extra,
            },
        )

    def test_save_timestamps_as_dates(self, spark, tsdb):
        import tests.test_jdbc_type_fixes as me

        me._METADATA_DB_PATH = tsdb

        class _Factory:
            pass

        # detect_types makes sqlite3 hand back datetime objects
        def factory():
            return sqlite3.connect(
                tsdb, detect_types=sqlite3.PARSE_DECLTYPES, check_same_thread=False
            )

        me.open_metadata_db_detect = factory
        src = self._source(
            spark,
            tsdb,
            **{
                "connection.factory": "tests.test_jdbc_type_fixes.open_metadata_db_detect",
                "save.timestamps.as.dates": "true",
            },
        )
        del src.options["sqlite.path"]
        df = src.get_data({"table": "ev"}, D0, D1)
        kinds = dict(df.dtypes)
        assert kinds["when_ts"] == "date"
        got = {r["id"]: r["when_ts"] for r in df.collect()}
        assert got[1] == dt.date(2024, 1, 10)
        src.close()

    def test_enable_schema_metadata_no_crash_on_sqlite(self, spark, tsdb):
        # sqlite reports None sizes -> no maxLength, no crash
        src = self._source(spark, tsdb, **{"enable.schema.metadata": "true"})
        df = src.get_data({"table": "ev"}, D0, D1)
        assert all(f.metadata == {} for f in df.schema.fields)
        src.close()

    def test_enable_schema_metadata_annotates_via_fake_driver(self, spark):
        """A DBAPI driver that reports sizes (as psycopg2/cx_Oracle do)
        yields maxLength annotations through the native path."""
        from pramen_spark.sources.jdbc_native_source import JdbcNativeSource

        class FakeCursor:
            description = (
                ("id", "INTEGER", None, None, 10, 0, 0),
                ("name", "VARCHAR", 50, 50, None, None, 1),
            )

            def execute(self, sql):
                self._rows = [(1, "alpha"), (2, "beta")]

            def fetchmany(self, n):
                rows, self._rows = self._rows, []
                return rows

            def close(self):
                pass

        class FakeConn:
            def cursor(self):
                return FakeCursor()

            def close(self):
                pass

        import tests.test_jdbc_type_fixes as me

        me.open_fake_conn = lambda: FakeConn()
        src = JdbcNativeSource(
            spark,
            {
                "connection.factory": "tests.test_jdbc_type_fixes.open_fake_conn",
                "vendor": "generic",
                "has.information.date.column": False,
                "enable.schema.metadata": "true",
            },
        )
        df = src.get_data({"table": "whatever"}, D0, D1)
        assert df.schema["name"].metadata == {"maxLength": 50}
        assert df.schema["id"].metadata == {}
        src.close()


class TestSparkSourceMetadataProbe:
    def test_metadata_probe_via_dbapi_factory(self, spark, tsdb, tmp_path):
        """The Spark JDBC reader path cannot run here (no JDBC driver),
        but its metadata probe is a standalone method exercised with a
        DBAPI factory + an already-loaded DataFrame."""
        import tests.test_jdbc_type_fixes as me
        from pramen_spark.sources.jdbc_source import JdbcSource

        path = str(tmp_path / "m.db")
        conn = sqlite3.connect(path)
        conn.execute("CREATE TABLE t (a TEXT)")
        conn.commit()
        conn.close()
        me._METADATA_DB_PATH = path

        src = JdbcSource(
            spark,
            {
                "url": "jdbc:sqlite:unused",
                "vendor": "generic",
                "enable.schema.metadata": "true",
                "metadata.connection.factory": "tests.test_jdbc_type_fixes.open_metadata_db",
            },
        )
        df = spark.createDataFrame([("x",)], "a string")
        out = src._apply_jdbc_schema_metadata(df, "SELECT a FROM t")
        # sqlite gives no sizes: schema unchanged, same object returned
        assert out is df

    def test_post_read_applies_sanitize_and_ts_conversion(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(
            spark,
            {
                "url": "jdbc:x",
                "vendor": "generic",
                "save.timestamps.as.dates": "true",
            },
        )
        df = spark.createDataFrame([(1,)], "id int").select(
            "id", F.lit("+12345-01-01 00:00:00").cast("timestamp").alias("ts")
        )
        out = src._post_read(df, is_data_query=True, sql="SELECT 1")
        row = out.collect()[0]
        # clamp first (9999-12-31 23:59:59.999999), then cast to date
        assert row["ts"] == dt.date(9999, 12, 31)
        assert dict(out.dtypes)["ts"] == "date"

    def test_sanitize_can_be_disabled(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(
            spark,
            {"url": "jdbc:x", "vendor": "generic", "sanitize.datetime": "false"},
        )
        df = spark.createDataFrame([(1,)], "id int").select(
            "id", F.lit("+12345-01-01").cast("date").alias("d")
        )
        out = src._post_read(df, is_data_query=True, sql="SELECT 1")
        # JVM-side check: a year-12345 date cannot exist in Python, which
        # is exactly why sanitize.datetime defaults to ON
        assert out.select(F.year("d")).collect()[0][0] == 12345


class TestJdbcPrefixAliasing:
    """The reference nests connectivity under the source's jdbc{} block;
    the config loader flattens it to 'jdbc.*' keys. The source must read
    them as if un-prefixed (JdbcConfig.scala:54-115)."""

    def test_prefixed_options_aliased(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource
        from pramen_spark.sql.generators import SqlGeneratorPostgreSQL

        src = JdbcSource(
            spark,
            {
                "jdbc.driver": "org.postgresql.Driver",
                "jdbc.connection.primary.url": "jdbc:postgresql://h:5432/db",
                "jdbc.user": "u",
                "jdbc.sanitize.datetime": "false",
            },
        )
        assert isinstance(src.generator, SqlGeneratorPostgreSQL)
        assert src.options["url"] == "jdbc:postgresql://h:5432/db"
        assert src._opt_bool("sanitize.datetime", True) is False
        opts = src._jdbc_reader_options("SELECT 1")
        assert opts["driver"] == "org.postgresql.Driver"
        assert opts["user"] == "u"

    def test_bare_option_wins_over_prefixed(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(
            spark,
            {"url": "jdbc:one", "jdbc.url": "jdbc:two", "vendor": "generic"},
        )
        assert src.options["url"] == "jdbc:one"


class TestUrlFallbackRetry:
    """URL pool + retries (JdbcUrlSelectorImpl.scala:54-69,
    TableReaderJdbcBase.getWithRetry): the read rotates through primary +
    fallback.url.N on failure, one attempt per URL by default;
    'retries = 1' means a single attempt."""

    def _source(self, spark, **opts):
        from pramen_spark.sources.jdbc_source import JdbcSource

        return JdbcSource(
            spark,
            {"url": "jdbc:primary", "vendor": "generic",
             "fallback.url.2": "jdbc:fb2", "fallback.url.1": "jdbc:fb1",
             **opts},
        )

    def test_pool_order(self, spark):
        src = self._source(spark)
        assert src._url_pool() == ["jdbc:primary", "jdbc:fb1", "jdbc:fb2"]

    def test_rotates_until_success(self, spark):
        src = self._source(spark)
        tried = []

        def attempt(url):
            tried.append(url)
            if url != "jdbc:fb2":
                raise RuntimeError(f"down: {url}")
            return "ok"

        assert src._with_url_retry(attempt) == "ok"
        assert tried == ["jdbc:primary", "jdbc:fb1", "jdbc:fb2"]

    def test_default_attempts_one_per_url(self, spark):
        src = self._source(spark)
        tried = []

        def attempt(url):
            tried.append(url)
            raise RuntimeError("always down")

        with pytest.raises(RuntimeError, match="always down"):
            src._with_url_retry(attempt)
        assert len(tried) == 3

    def test_retries_one_means_single_attempt(self, spark):
        src = self._source(spark, retries=1)
        tried = []

        def attempt(url):
            tried.append(url)
            raise RuntimeError("down")

        with pytest.raises(RuntimeError):
            src._with_url_retry(attempt)
        assert tried == ["jdbc:primary"]

    def test_retries_wrap_around_pool(self, spark):
        src = self._source(spark, retries=5)
        tried = []

        def attempt(url):
            tried.append(url)
            raise RuntimeError("down")

        with pytest.raises(RuntimeError):
            src._with_url_retry(attempt)
        assert tried == ["jdbc:primary", "jdbc:fb1", "jdbc:fb2",
                         "jdbc:primary", "jdbc:fb1"]


class TestInfoDateKeySpellings:
    """The reference README nests the info-date block as
    information.date { column, date.type, date.app.format } (flattening
    to information.date.date.*), while its example configs spell
    information.date.format — every spelling must configure the source."""

    def test_readme_nested_spelling(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource
        from pramen_spark.sql.generators import SqlColumnType

        src = JdbcSource(
            spark,
            {"url": "jdbc:x", "vendor": "generic",
             "information.date.column": "snap",
             "information.date.date.type": "string",
             "information.date.date.app.format": "yyyyMMdd"},
        )
        assert src.generator.config.info_date_type == SqlColumnType.STRING
        assert src.generator.config.date_format_app == "yyyyMMdd"
        assert src.generator.config.info_date_column == "snap"

    def test_example_config_spelling_and_precedence(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(
            spark,
            {"url": "jdbc:x", "vendor": "generic",
             "information.date.format": "MM/dd/yyyy",
             # the canonical key wins over the alias when both exist
             "information.date.app.format": "yyyy-MM-dd"},
        )
        assert src.generator.config.date_format_app == "yyyy-MM-dd"


class TestCorrectedSchemaStringParses:
    """Property: every customSchema string the corrector emits must be
    accepted by Spark's own DDL schema parser (it is passed verbatim to
    the JDBC reader's customSchema option), and the corrected type must
    match the rule table for any (precision, scale) the wire can carry."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=38),
                st.integers(min_value=0, max_value=38),
            ),
            min_size=1,
            max_size=6,
        ),
        st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_emitted_string_is_spark_parseable(self, spark, precs, fix):
        from pyspark.sql.types import _parse_datatype_string

        fields = []
        for i, (p, s) in enumerate(precs):
            if s > p:  # DecimalType requires scale <= precision in PySpark;
                p, s = s, s  # the "bogus metadata" shapes arrive pre-clamped
            fields.append((f"c{i}", T.DecimalType(p, s)))
        schema = _schema(*fields)
        custom = get_corrected_decimals_schema(schema, fix_precision=fix)
        if custom is None:
            return
        parsed = _parse_datatype_string(custom)
        # each corrected column obeys the rule table
        by_name = {f.name: f.dataType for f in parsed.fields}
        for name, dt in by_name.items():
            src = schema[name].dataType
            if src.scale == 0 and src.precision <= 9:
                assert dt == T.IntegerType()
            elif src.scale == 0 and src.precision <= 18:
                assert dt == T.LongType()
            elif src.scale > 18:
                assert dt == T.DecimalType(38, 18)
            else:
                assert fix and isinstance(dt, T.DecimalType)
                assert dt.scale == src.scale
                assert dt.precision == min(src.precision + src.scale, 38)
