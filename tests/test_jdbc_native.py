"""JDBC native source over a real DBAPI backend (stdlib sqlite3) —
reference TableReaderJdbcNative.scala:30-158: dialect-generated and
user-supplied SQL executed on a raw connection, DataFrame built from the
result set."""

import datetime as dt
import sqlite3

import pytest

from pramen_spark.sources.jdbc_native_source import JdbcNativeSource
from pramen_spark.sql.generators import OffsetValue

D0, D1 = dt.date(2024, 1, 10), dt.date(2024, 1, 11)


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "native.db")
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE sales (id INTEGER, info_date TEXT, amount REAL, note TEXT)"
    )
    rows = [
        (1, "2024-01-10", 10.5, "a"),
        (2, "2024-01-10", 20.0, None),
        (3, "2024-01-11", 7.25, "c"),
        (4, "2024-01-12", 1.0, "d"),
    ]
    conn.executemany("INSERT INTO sales VALUES (?, ?, ?, ?)", rows)
    conn.commit()
    conn.close()
    return path


def make_source(spark, db, **extra):
    opts = {
        "sqlite.path": db,
        "vendor": "generic",
        "information.date.column": "info_date",
        "information.date.type": "string",
        **extra,
    }
    return JdbcNativeSource(spark, opts)


class TestJdbcNativeSource:
    def test_table_date_range(self, spark, db):
        src = make_source(spark, db)
        df = src.get_data({"table": "sales"}, D0, D1)
        got = sorted(r["id"] for r in df.collect())
        assert got == [1, 2, 3]
        # types inferred from the DBAPI rows
        kinds = dict(df.dtypes)
        assert kinds["id"] == "bigint" and kinds["amount"] == "double"
        assert kinds["note"] == "string"
        src.close()

    def test_sql_with_date_tokens(self, spark, db):
        src = make_source(spark, db)
        q = {
            "sql": "SELECT id, amount FROM sales "
                   "WHERE info_date BETWEEN @infoDateBegin AND @infoDateEnd"
        }
        df = src.get_data(q, D0, D0)
        assert sorted(r["id"] for r in df.collect()) == [1, 2]
        assert src.get_record_count(q, D0, D1) == 3
        src.close()

    def test_record_count_for_table(self, spark, db):
        src = make_source(spark, db)
        assert src.get_record_count({"table": "sales"}, D0, D0) == 2
        src.close()

    def test_incremental_by_offset(self, spark, db):
        src = make_source(
            spark, db,
            **{"offset.column": "id", "has.information.date.column": False},
        )
        df = src.get_data_incremental(
            {"table": "sales"}, None, OffsetValue.integral(2), None
        )
        assert sorted(r["id"] for r in df.collect()) == [3, 4]
        # closed interval rerun form
        df2 = src.get_data_incremental(
            {"table": "sales"}, None, OffsetValue.integral(1), OffsetValue.integral(3)
        )
        assert sorted(r["id"] for r in df2.collect()) == [1, 2, 3]
        src.close()

    def test_incremental_rejects_sql_query(self, spark, db):
        src = make_source(spark, db, **{"offset.column": "id"})
        with pytest.raises(ValueError):
            src.get_data_incremental({"sql": "SELECT 1"}, None, None, None)
        src.close()

    def test_empty_result(self, spark, db):
        src = make_source(spark, db)
        df = src.get_data({"table": "sales"}, dt.date(2030, 1, 1), dt.date(2030, 1, 2))
        assert df.count() == 0
        assert df.columns == ["id", "info_date", "amount", "note"]
        src.close()

    def test_connection_factory(self, spark, db, monkeypatch):
        import tests.test_jdbc_native as me

        me._FACTORY_DB = db  # module-level hook for load_class
        src = JdbcNativeSource(
            spark,
            {
                "connection.factory": "tests.test_jdbc_native.open_test_db",
                "vendor": "generic",
                "information.date.column": "info_date",
                "information.date.type": "string",
            },
        )
        assert src.get_record_count({"table": "sales"}, D0, D0) == 2
        src.close()

    def test_mixed_and_exotic_types_coerced(self, spark, db):
        """sqlite dynamic typing: an int-then-float column promotes to
        double; a column mixing text and numbers falls back to string with
        values coerced (the DBAPI contract makes Decimals/uuids possible —
        they must not crash createDataFrame's verifier)."""
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE mixed (id INTEGER, v, w)")
        conn.executemany(
            "INSERT INTO mixed VALUES (?, ?, ?)",
            [(1, 10, "a"), (2, 2.5, 7), (3, None, None)],
        )
        conn.commit()
        conn.close()
        src = make_source(spark, db)
        df = src._run_query("SELECT * FROM mixed")
        kinds = dict(df.dtypes)
        assert kinds["v"] == "double" and kinds["w"] == "string"
        rows = {r["id"]: (r["v"], r["w"]) for r in df.collect()}
        assert rows[1] == (10.0, "a") and rows[2] == (2.5, "7")
        assert rows[3] == (None, None)
        src.close()

    def test_thread_safety(self, spark, db):
        """Task attempts run on varying threads (runner pool + watchdog):
        concurrent queries through one source must serialize, not crash."""
        import concurrent.futures

        src = make_source(spark, db)
        src.get_record_count({"table": "sales"}, D0, D0)  # open on this thread
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            counts = list(
                pool.map(
                    lambda _: src.get_record_count({"table": "sales"}, D0, D1), range(8)
                )
            )
        assert counts == [3] * 8
        src.close()

    def test_all_null_column_defaults_to_string(self, spark, db):
        conn = sqlite3.connect(db)
        conn.execute("UPDATE sales SET note = NULL")
        conn.commit()
        conn.close()
        src = make_source(spark, db)
        df = src.get_data({"table": "sales"}, D0, D1)
        assert dict(df.dtypes)["note"] == "string"
        src.close()


_FACTORY_DB = None


def open_test_db():
    return sqlite3.connect(_FACTORY_DB)


class TestDecimalInference:
    """DECIMAL columns from a DBAPI driver become real DecimalType columns
    with value-derived precision/scale (the reference derives them from
    JDBC metadata, ResultSetToRowIterator.scala:245-255); the
    incorrect.decimals.as.string escape hatch survives for broken
    drivers."""

    def _fake_source(self, spark, rows, **opts):
        import tests.test_jdbc_native as me

        class FakeCursor:
            description = tuple((f"c{i}", None, None, None, None, None, 1)
                                for i in range(len(rows[0]))) if rows else ()

            def execute(self, sql):
                self._rows = list(rows)

            def fetchmany(self, n):
                out, self._rows = self._rows, []
                return out

            def close(self):
                pass

        class FakeConn:
            def cursor(self):
                return FakeCursor()

            def close(self):
                pass

        me._fake_conn = lambda: FakeConn()
        return JdbcNativeSource(
            spark,
            {"connection.factory": "tests.test_jdbc_native._fake_conn",
             "vendor": "generic", "has.information.date.column": False,
             **opts},
        )

    def test_pure_decimal_column(self, spark):
        from decimal import Decimal

        src = self._fake_source(
            spark, [(Decimal("12.34"),), (Decimal("5.6"),), (None,)]
        )
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "decimal(4,2)"
        got = sorted(v for (v,) in df.collect() if v is not None)
        assert got == [Decimal("5.60"), Decimal("12.34")]

    def test_int_decimal_promotion(self, spark):
        from decimal import Decimal

        src = self._fake_source(spark, [(100,), (Decimal("2.5"),)])
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "decimal(4,1)"
        assert sorted(v for (v,) in df.collect()) == [
            Decimal("2.5"), Decimal("100.0")
        ]

    def test_decimal_float_promotes_to_double(self, spark):
        from decimal import Decimal

        src = self._fake_source(spark, [(Decimal("2.5"),), (1.25,)])
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "double"

    def test_oversized_decimal_falls_back(self, spark):
        from decimal import Decimal

        wide = Decimal("1." + "1" * 30)  # 1 + 30 digits: fits decimal(31,30)
        src = self._fake_source(spark, [(wide,)])
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "decimal(31,30)"
        # 25 integral digits + scale 20 = 45 > 38, and the integral part
        # alone exceeds decimal(38,18)'s 20 digits: unfittable -> string
        huge = Decimal("1" * 25 + "." + "5" * 20)
        src2 = self._fake_source(spark, [(huge,)])
        df2 = src2._run_query("SELECT 1")
        assert dict(df2.dtypes)["c0"] == "string"

    def test_incorrect_decimals_as_string(self, spark):
        from decimal import Decimal

        # 21 integral digits + scale 18 > 38: default falls to (38,18)
        # only when int part fits 20 digits; here it does (19 digits)
        v = Decimal("1234567890123456789." + "9" * 25)
        src = self._fake_source(spark, [(v,)])
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "decimal(38,18)"
        src2 = self._fake_source(
            spark, [(v,)], **{"incorrect.decimals.as.string": "true"}
        )
        df2 = src2._run_query("SELECT 1")
        assert dict(df2.dtypes)["c0"] == "string"

    def test_nan_decimal_is_string(self, spark):
        from decimal import Decimal

        src = self._fake_source(spark, [(Decimal("NaN"),), (Decimal("1.5"),)])
        df = src._run_query("SELECT 1")
        assert dict(df.dtypes)["c0"] == "string"
