"""Date-expression DSL parity tests (reference semantics:
DateExpressionEvaluator.scala:94-230, README.md:3677-3703)."""

import datetime as dt

import pytest

from pramen_spark.dsl.dateexpr import DateExprEvaluator, DateExprException, eval_date_expr
from pramen_spark.dsl.interpolate import format_date_java, replace_formatted_date_expression

D = dt.date


def ev(expr, **vars_):
    return eval_date_expr(expr, **vars_)


class TestArithmetic:
    def test_var_minus_days(self):
        assert ev("@runDate - 1", runDate=D(2022, 1, 10)) == D(2022, 1, 9)

    def test_var_plus_days(self):
        assert ev("@runDate + 3", runDate=D(2022, 1, 30)) == D(2022, 2, 2)

    def test_int_arithmetic(self):
        assert ev("2 + 3 - 1") == 4

    def test_date_literal(self):
        assert ev("2022-05-15") == D(2022, 5, 15)

    def test_quoted_date_literal(self):
        assert ev("'2022-05-15' + 1") == D(2022, 5, 16)

    def test_chained(self):
        assert ev("@d - 1 - 1", d=D(2022, 1, 3)) == D(2022, 1, 1)

    def test_parens(self):
        assert ev("@d - (1 + 1)", d=D(2022, 1, 3)) == D(2022, 1, 1)

    def test_two_dates_error(self):
        with pytest.raises(DateExprException):
            ev("@a + @b", a=D(2022, 1, 1), b=D(2022, 1, 2))

    def test_unset_variable(self):
        with pytest.raises(DateExprException):
            ev("@nope + 1")

    def test_empty(self):
        with pytest.raises(DateExprException):
            ev("")


class TestFunctions:
    d = D(2022, 8, 17)  # a Wednesday

    def test_month_of(self):
        assert ev("monthOf(@d)", d=self.d) == 8

    def test_year_of(self):
        assert ev("yearOf(@d)", d=self.d) == 2022

    def test_year_month_of(self):
        assert ev("yearMonthOf(@d)", d=self.d) == "2022-08"

    def test_day_of_month(self):
        assert ev("dayOfMonth(@d)", d=self.d) == 17

    def test_day_of_week(self):
        assert ev("dayOfWeek(@d)", d=self.d) == 3  # ISO Wednesday

    def test_plus_minus_days(self):
        assert ev("plusDays(@d, 10)", d=self.d) == D(2022, 8, 27)
        assert ev("minusDays(@d, 17)", d=self.d) == D(2022, 7, 31)

    def test_plus_minus_weeks(self):
        assert ev("plusWeeks(@d, 2)", d=self.d) == D(2022, 8, 31)
        assert ev("minusWeeks(@d, 3)", d=self.d) == D(2022, 7, 27)

    def test_plus_minus_months_clamping(self):
        assert ev("plusMonths(@d, 1)", d=D(2022, 1, 31)) == D(2022, 2, 28)
        assert ev("minusMonths(@d, 1)", d=D(2022, 3, 31)) == D(2022, 2, 28)
        assert ev("plusMonths(@d, 1)", d=D(2020, 1, 31)) == D(2020, 2, 29)  # leap

    def test_begin_end_of_month(self):
        assert ev("beginOfMonth(@d)", d=self.d) == D(2022, 8, 1)
        assert ev("endOfMonth(@d)", d=self.d) == D(2022, 8, 31)
        assert ev("endOfMonth(@d)", d=D(2022, 2, 10)) == D(2022, 2, 28)
        assert ev("endOfMonth(@d)", d=D(2020, 2, 10)) == D(2020, 2, 29)

    def test_last_day_of_month(self):
        # most recent date <= d whose day-of-month is N
        assert ev("lastDayOfMonth(@d, 15)", d=self.d) == D(2022, 8, 15)
        assert ev("lastDayOfMonth(@d, 20)", d=self.d) == D(2022, 7, 20)

    def test_last_weekdays(self):
        assert ev("lastMonday(@d)", d=self.d) == D(2022, 8, 15)
        assert ev("lastWednesday(@d)", d=self.d) == self.d  # same day counts
        assert ev("lastSunday(@d)", d=self.d) == D(2022, 8, 14)
        assert ev("lastSaturday(@d)", d=self.d) == D(2022, 8, 13)

    def test_nested(self):
        assert ev("beginOfMonth(minusMonths(@d, 1))", d=self.d) == D(2022, 7, 1)
        assert ev("lastSunday(beginOfMonth(@d))", d=self.d) == D(2022, 7, 31)

    def test_function_plus_offset(self):
        assert ev("beginOfMonth(@d) - 1", d=self.d) == D(2022, 7, 31)

    def test_unknown_function(self):
        with pytest.raises(DateExprException):
            ev("noSuchFn(@d)", d=self.d)

    def test_wrong_arity(self):
        with pytest.raises(DateExprException):
            ev("plusDays(@d)", d=self.d)

    def test_type_errors(self):
        with pytest.raises(DateExprException):
            ev("monthOf(5)")


class TestEvaluatorApi:
    def test_eval_date_and_int(self):
        e = DateExprEvaluator({"runDate": D(2022, 3, 1)})
        assert e.eval_date("@runDate") == D(2022, 3, 1)
        assert e.eval_int("monthOf(@runDate)") == 3
        with pytest.raises(DateExprException):
            e.eval_int("@runDate")


class TestInterpolation:
    def test_format_date_java(self):
        d = D(2022, 8, 7)
        assert format_date_java(d, "yyyy-MM-dd") == "2022-08-07"
        assert format_date_java(d, "yyyyMMdd") == "20220807"
        assert format_date_java(d, "yyyy/MM") == "2022/08"
        assert format_date_java(d, "d M yyyy") == "7 8 2022"

    def test_plain_var(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        assert (
            replace_formatted_date_expression("date = '@infoDate'", e) == "date = '2022-01-15'"
        )

    def test_formatted_var(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        assert replace_formatted_date_expression("snap = @infoDate%yyyyMM%", e) == "snap = 202201"

    def test_expression(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        out = replace_formatted_date_expression("d = '@{@infoDate - 1}'", e)
        assert out == "d = '2022-01-14'"

    def test_formatted_expression(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        out = replace_formatted_date_expression("m = @{beginOfMonth(@infoDate)}%yyyy-MM-dd%", e)
        assert out == "m = 2022-01-01"

    def test_unknown_var_left_verbatim(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        assert replace_formatted_date_expression("x = @unknown", e) == "x = @unknown"

    def test_sql_like_percent_not_mangled(self):
        e = DateExprEvaluator({"infoDate": D(2022, 1, 15)})
        assert (
            replace_formatted_date_expression("name LIKE '%abc%'", e) == "name LIKE '%abc%'"
        )
