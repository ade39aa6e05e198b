"""Golden-string tests for the JDBC SQL generation layer (reference:
core/.../sql/SqlGenerator*.scala suites)."""

import datetime as dt

import pytest

from pramen_spark.sql.generators import (
    OffsetInfo,
    OffsetType,
    OffsetValue,
    QuotingPolicy,
    SqlColumnType,
    SqlConfig,
    SqlGeneratorGeneric,
    SqlGeneratorHsqlDb,
    SqlGeneratorMicrosoft,
    SqlGeneratorMySQL,
    SqlGeneratorOracle,
    SqlGeneratorPostgreSQL,
    generator_for_driver,
    generator_for_vendor,
)

D1 = dt.date(2022, 2, 18)
D2 = dt.date(2022, 2, 20)


def cfg(**kw):
    base = dict(info_date_column="info_date", info_date_type=SqlColumnType.DATE)
    base.update(kw)
    return SqlConfig(**base)


class TestGeneric:
    g = SqlGeneratorGeneric(cfg())

    def test_data_query(self):
        assert self.g.get_data_query("company") == "SELECT * FROM company"

    def test_data_query_columns_limit(self):
        assert (
            self.g.get_data_query("company", ["a", "b"], 10)
            == "SELECT a, b FROM company LIMIT 10"
        )

    def test_data_query_range(self):
        assert self.g.get_data_query_range("company", D1, D2) == (
            "SELECT * FROM company WHERE info_date >= date'2022-02-18'"
            " AND info_date <= date'2022-02-20'"
        )

    def test_data_query_single_date(self):
        assert self.g.get_data_query_range("company", D1, D1) == (
            "SELECT * FROM company WHERE info_date = date'2022-02-18'"
        )

    def test_count_query(self):
        assert self.g.get_count_query("company") == "SELECT COUNT(*) AS CNT FROM company"

    def test_schema_query(self):
        assert self.g.get_schema_query("company") == "SELECT * FROM company WHERE 0=1"

    def test_dtable(self):
        assert self.g.get_dtable("SELECT * FROM x") == "(SELECT * FROM x) AS t"
        assert self.g.get_dtable("company") == "company"

    def test_string_info_date(self):
        g = SqlGeneratorGeneric(cfg(info_date_type=SqlColumnType.STRING, date_format_app="yyyyMMdd"))
        assert g.get_where(D1, D1) == "info_date = '20220218'"

    def test_number_info_date(self):
        g = SqlGeneratorGeneric(cfg(info_date_type=SqlColumnType.NUMBER, date_format_app="yyyyMMdd"))
        assert g.get_where(D1, D2) == "info_date >= 20220218 AND info_date <= 20220220"

    def test_datetime_info_date_casts(self):
        g = SqlGeneratorGeneric(cfg(info_date_type=SqlColumnType.DATETIME))
        assert g.get_where(D1, D1) == "CAST(info_date AS DATE) = date'2022-02-18'"


class TestPostgreSQL:
    def test_datetime_half_open(self):
        g = SqlGeneratorPostgreSQL(cfg(info_date_type=SqlColumnType.DATETIME))
        assert g.get_where(D1, D2) == (
            "info_date >= '2022-02-18' AND info_date < '2022-02-21'"
        )

    def test_count(self):
        g = SqlGeneratorPostgreSQL(cfg())
        assert g.get_count_query("company") == "SELECT COUNT(*) FROM company"

    def test_dtable(self):
        assert SqlGeneratorPostgreSQL(cfg()).get_dtable("SELECT 1") == "(SELECT 1) t"


class TestMySQL:
    def test_quoting(self):
        g = SqlGeneratorMySQL(cfg(identifier_quoting_policy=QuotingPolicy.ALWAYS))
        assert g.get_data_query("db.company") == "SELECT * FROM `db`.`company`"

    def test_datetime_half_open_with_time(self):
        g = SqlGeneratorMySQL(cfg(info_date_type=SqlColumnType.DATETIME))
        assert g.get_where(D1, D2) == (
            "info_date >= '2022-02-18 00:00:00' AND info_date < '2022-02-21 00:00:00'"
        )

    def test_date_literal_plain_quotes(self):
        g = SqlGeneratorMySQL(cfg())
        assert g.get_where(D1, D1) == "info_date = '2022-02-18'"


class TestOracle:
    g = SqlGeneratorOracle(cfg())

    def test_half_open_interval(self):
        assert self.g.get_where(D1, D2) == (
            "info_date >= date'2022-02-18' AND info_date < date'2022-02-21'"
        )

    def test_rownum_limit_no_where(self):
        assert self.g.get_data_query("company", limit=10) == (
            "SELECT * FROM company WHERE ROWNUM <= 10"
        )

    def test_rownum_limit_with_where(self):
        q = self.g.get_data_query_range("company", D1, D1, limit=5)
        assert q.endswith("AND ROWNUM <= 5")

    def test_invalid_range(self):
        with pytest.raises(ValueError):
            self.g.get_where(D2, D1)

    def test_alias_no_as(self):
        assert self.g.alias_expression("COUNT(*)", "CNT") == "COUNT(*) CNT"


class TestMicrosoft:
    g = SqlGeneratorMicrosoft(cfg())

    def test_top_and_nolock(self):
        assert self.g.get_data_query("company", ["a"], 7) == (
            "SELECT TOP 7 a FROM company WITH (NOLOCK)"
        )

    def test_convert_date_literal(self):
        assert self.g.get_where(D1, D1) == (
            "info_date = CONVERT(DATE, '2022-02-18', 23)"
        )

    def test_datetime_column_convert(self):
        g = SqlGeneratorMicrosoft(cfg(info_date_type=SqlColumnType.DATETIME))
        assert g.get_where(D1, D1) == (
            "CONVERT(DATE, info_date, 23) = CONVERT(DATE, '2022-02-18', 23)"
        )

    def test_string_iso_try_convert(self):
        g = SqlGeneratorMicrosoft(cfg(info_date_type=SqlColumnType.STRING))
        assert g.get_where(D1, D1) == (
            "TRY_CONVERT(DATE, info_date, 23) = CONVERT(DATE, '2022-02-18', 23)"
        )

    def test_count_big(self):
        assert self.g.get_count_query("company") == (
            "SELECT COUNT_BIG(*) AS CNT FROM company WITH (NOLOCK)"
        )

    def test_bracket_quoting(self):
        g = SqlGeneratorMicrosoft(cfg(identifier_quoting_policy=QuotingPolicy.ALWAYS))
        assert g.quote("dbo.my table") == "[dbo].[my table]"


class TestHsqlDb:
    def test_to_date_literal(self):
        g = SqlGeneratorHsqlDb(cfg())
        assert g.get_where(D1, D1) == "info_date = TO_DATE('2022-02-18', 'YYYY-MM-DD')"


class TestIncremental:
    def mk(self, gen_cls=SqlGeneratorGeneric):
        return gen_cls(
            cfg(offset_info=OffsetInfo("id", OffsetType.INTEGRAL))
        )

    def test_from_only_strict(self):
        g = self.mk()
        q = g.get_data_query_incremental("t", None, OffsetValue.integral(100), None)
        assert q == "SELECT * FROM t WHERE id > 100"

    def test_from_to_inclusive(self):
        g = self.mk()
        q = g.get_data_query_incremental(
            "t", None, OffsetValue.integral(100), OffsetValue.integral(200)
        )
        assert q == "SELECT * FROM t WHERE id >= 100 AND id <= 200"

    def test_with_info_date(self):
        g = self.mk()
        q = g.get_data_query_incremental("t", D1, OffsetValue.integral(5), None)
        assert q == "SELECT * FROM t WHERE info_date = date'2022-02-18' AND id > 5"

    def test_datetime_offset_literal(self):
        g = self.mk()
        ts = dt.datetime(2022, 2, 18, 10, 11, 12, 345000)
        q = g.get_data_query_incremental("t", None, OffsetValue.datetime(ts), None)
        assert q == "SELECT * FROM t WHERE id > '2022-02-18 10:11:12.345'"

    def test_oracle_timestamp_keyword(self):
        g = self.mk(SqlGeneratorOracle)
        ts = dt.datetime(2022, 2, 18, 10, 11, 12, 345000)
        q = g.get_data_query_incremental("t", None, OffsetValue.datetime(ts), None)
        assert "TIMESTAMP '2022-02-18 10:11:12.345'" in q

    def test_string_offset_validation(self):
        g = self.mk()
        with pytest.raises(ValueError):
            g.get_data_query_incremental("t", None, OffsetValue.string("a'b"), None)

    def test_no_offset_info_error(self):
        g = SqlGeneratorGeneric(cfg())
        with pytest.raises(ValueError):
            g.get_data_query_incremental("t", None, OffsetValue.integral(1), None)


class TestQuotingAndValidation:
    def test_forbidden_chars(self):
        g = SqlGeneratorGeneric(cfg())
        with pytest.raises(ValueError):
            g.quote("bad;name")

    def test_auto_quoting(self):
        g = SqlGeneratorGeneric(cfg())
        assert g.escape("normal_name") == "normal_name"
        assert g.escape("with space") == '"with space"'

    def test_never_policy(self):
        g = SqlGeneratorGeneric(cfg(identifier_quoting_policy=QuotingPolicy.NEVER))
        assert g.escape("with space") == "with space"

    def test_already_quoted_passthrough(self):
        g = SqlGeneratorGeneric(cfg(identifier_quoting_policy=QuotingPolicy.ALWAYS))
        assert g.quote('"already"') == '"already"'

    def test_complex_identifier_with_quoted_dot(self):
        g = SqlGeneratorGeneric(cfg(identifier_quoting_policy=QuotingPolicy.ALWAYS))
        assert g.quote('schema."tab.le"') == '"schema"."tab.le"'


class TestLoader:
    def test_driver_mapping(self):
        assert isinstance(generator_for_driver("org.postgresql.Driver"), SqlGeneratorPostgreSQL)
        assert isinstance(generator_for_driver("oracle.jdbc.OracleDriver"), SqlGeneratorOracle)
        assert isinstance(
            generator_for_driver("com.microsoft.sqlserver.jdbc.SQLServerDriver"),
            SqlGeneratorMicrosoft,
        )
        assert isinstance(generator_for_driver("unknown.Driver"), SqlGeneratorGeneric)

    def test_vendor_mapping(self):
        assert isinstance(generator_for_vendor("mysql"), SqlGeneratorMySQL)
        with pytest.raises(ValueError):
            generator_for_vendor("nosuchdb")

    def test_sas_quoting(self):
        g = generator_for_vendor("sas", cfg(identifier_quoting_policy=QuotingPolicy.ALWAYS))
        assert g.quote("col name") == "'col name'n"


class TestServerTimezone:
    """server.timezone (README:724-726): a tz-aware datetime offset is
    rendered as the SERVER's wall-clock time in the generated predicate
    (the reference's LocalDateTime.ofInstant(ts, serverTimeZone),
    SqlGeneratorGeneric.scala:100); naive datetimes pass through."""

    def test_aware_offset_rendered_in_server_zone(self):
        import datetime as dt

        from pramen_spark.sql.generators import (
            OffsetInfo,
            OffsetType,
            OffsetValue,
            SqlConfig,
            SqlGeneratorGeneric,
        )

        cfg = SqlConfig(
            offset_info=OffsetInfo("updated_at", OffsetType.DATETIME),
            server_time_zone="Africa/Johannesburg",  # UTC+2, no DST
        )
        gen = SqlGeneratorGeneric(cfg)
        utc_midnight = dt.datetime(2024, 3, 10, 0, 0, 0, tzinfo=dt.timezone.utc)
        cond = gen.offset_where_condition(
            "updated_at", ">", OffsetValue.datetime(utc_midnight)
        )
        assert "'2024-03-10 02:00:00.000'" in cond

    def test_naive_offset_unchanged(self):
        import datetime as dt

        from pramen_spark.sql.generators import (
            OffsetInfo,
            OffsetType,
            OffsetValue,
            SqlConfig,
            SqlGeneratorGeneric,
        )

        cfg = SqlConfig(
            offset_info=OffsetInfo("updated_at", OffsetType.DATETIME),
            server_time_zone="Africa/Johannesburg",
        )
        gen = SqlGeneratorGeneric(cfg)
        naive = dt.datetime(2024, 3, 10, 5, 6, 7, 123000)
        cond = gen.offset_where_condition(
            "updated_at", ">", OffsetValue.datetime(naive)
        )
        assert "'2024-03-10 05:06:07.123'" in cond

    def test_source_option_wires_through(self, spark):
        from pramen_spark.sources.jdbc_source import JdbcSource

        src = JdbcSource(
            spark,
            {"url": "jdbc:x", "vendor": "generic",
             "server.timezone": "Africa/Johannesburg"},
        )
        assert src.generator.config.server_time_zone == "Africa/Johannesburg"
