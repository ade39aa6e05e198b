"""Row-level operator tests (reference semantics:
TaskRunnerBase.scala:365-463, SparkUtils.scala:112,200,280-331)."""

import datetime as dt

from pyspark.sql import types as T

from pramen_spark.config.models import TransformExpr
from pramen_spark.operators.rowlevel import (
    add_batch_id,
    add_info_date,
    apply_decorations,
    apply_filters,
    apply_projection,
    apply_transformations,
    compare_schemas,
    sanitize_column_name,
    sanitize_df_columns,
)

D = dt.date


def make_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, D(2022, 1, 1)), (2, "b", 20.0, D(2022, 1, 2)), (3, "c", 30.0, D(2022, 1, 2))],
        "id long, name string, amount double, d date",
    )


class TestProjection:
    def test_subset_and_order(self, spark):
        df = apply_projection(make_df(spark), ["name", "id"])
        assert df.columns == ["name", "id"]

    def test_empty_noop(self, spark):
        df = make_df(spark)
        assert apply_projection(df, []).columns == df.columns


class TestTransformations:
    def test_add_column(self, spark):
        df = apply_transformations(make_df(spark), [TransformExpr("doubled", "amount * 2")])
        rows = {r["id"]: r["doubled"] for r in df.collect()}
        assert rows == {1: 20.0, 2: 40.0, 3: 60.0}

    def test_replace_column(self, spark):
        df = apply_transformations(make_df(spark), [TransformExpr("name", "upper(name)")])
        assert {r["name"] for r in df.collect()} == {"A", "B", "C"}

    def test_drop_with_empty_expr(self, spark):
        df = apply_transformations(make_df(spark), [TransformExpr("amount", "")])
        assert "amount" not in df.columns

    def test_drop_keyword(self, spark):
        df = apply_transformations(make_df(spark), [TransformExpr("amount", "drop")])
        assert "amount" not in df.columns

    def test_comment_metadata(self, spark):
        df = apply_transformations(
            make_df(spark), [TransformExpr("x", "id + 1", comment="the id plus one")]
        )
        field = df.schema["x"]
        assert field.metadata.get("comment") == "the id plus one"


class TestFilters:
    def test_plain_filter(self, spark):
        df = apply_filters(make_df(spark), ["amount > 15"], D(2022, 1, 2))
        assert df.count() == 2

    def test_info_date_macro(self, spark):
        df = apply_filters(make_df(spark), ["d = @infoDate"], D(2022, 1, 2))
        assert df.count() == 2

    def test_formatted_macro(self, spark):
        df = apply_filters(
            make_df(spark), ["date_format(d, 'yyyyMM') = '@infoDate%yyyyMM%'"], D(2022, 1, 15)
        )
        assert df.count() == 3

    def test_date_from_to(self, spark):
        df = apply_filters(
            make_df(spark),
            ["d >= @dateFrom AND d <= @dateTo"],
            D(2022, 1, 2),
            date_from=D(2022, 1, 2),
            date_to=D(2022, 1, 2),
        )
        assert df.count() == 2

    def test_expression_macro(self, spark):
        df = apply_filters(make_df(spark), ["d = date'@{@infoDate - 1}'"], D(2022, 1, 3))
        assert df.count() == 2


class TestInjections:
    def test_info_date(self, spark):
        df = add_info_date(make_df(spark), "pramen_info_date", D(2022, 5, 1))
        assert df.schema["pramen_info_date"].dataType == T.DateType()
        assert {r["pramen_info_date"] for r in df.collect()} == {D(2022, 5, 1)}

    def test_info_date_replaces_existing(self, spark):
        df = add_info_date(make_df(spark), "d", D(2022, 5, 1))
        assert {r["d"] for r in df.collect()} == {D(2022, 5, 1)}

    def test_batch_id(self, spark):
        df = add_batch_id(make_df(spark), "pramen_batchid", 1234567)
        assert {r["pramen_batchid"] for r in df.collect()} == {1234567}


class TestSanitize:
    def test_name(self):
        assert sanitize_column_name("a b:c+d") == "a_b_c_d"
        assert sanitize_column_name("x(y)[z]") == "x_y__z_"
        assert sanitize_column_name("ok_name1") == "ok_name1"

    def test_df(self, spark):
        df = make_df(spark).withColumnRenamed("name", "the name (clean)")
        out = sanitize_df_columns(df)
        assert "the_name__clean_" in out.columns


class TestSchemaCompare:
    def test_diff(self):
        old = T.StructType(
            [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
        )
        new = T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())]
        )
        changes = compare_schemas(old, new)
        kinds = {(c.kind.value, c.column) for c in changes}
        assert kinds == {("changed_type", "a"), ("new", "c"), ("deleted", "b")}

    def test_identical(self):
        s = T.StructType([T.StructField("a", T.IntegerType())])
        assert compare_schemas(s, s) == []


class TestDecorationPipeline:
    def test_full_order(self, spark):
        df = apply_decorations(
            make_df(spark),
            info_date=D(2022, 1, 2),
            info_date_column="pramen_info_date",
            batch_id_column="pramen_batchid",
            batch_id=99,
            transformations=[TransformExpr("net", "amount * 0.9")],
            filters=["d = @infoDate"],
            columns=["id", "net", "pramen_info_date", "pramen_batchid"],
        )
        rows = df.collect()
        assert df.columns == ["id", "net", "pramen_info_date", "pramen_batchid"]
        assert len(rows) == 2
        assert all(r["pramen_batchid"] == 99 for r in rows)
