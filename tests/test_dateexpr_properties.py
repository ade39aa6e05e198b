"""Property-based tests for the date-expression DSL (hypothesis).

The reference has no property tests; these pin the algebraic invariants
of the evaluator (DateExpressionEvaluator.scala semantics) across the
whole input space rather than hand-picked examples."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from pramen_spark.dsl.dateexpr import eval_date_expr

DATES = st.dates(min_value=dt.date(1900, 1, 2), max_value=dt.date(2199, 12, 30))
SMALL = st.integers(min_value=0, max_value=3650)
MONTHS = st.integers(min_value=0, max_value=240)
WEEKDAY_FN = {
    1: "lastMonday", 2: "lastTuesday", 3: "lastWednesday", 4: "lastThursday",
    5: "lastFriday", 6: "lastSaturday", 7: "lastSunday",
}


@settings(max_examples=200)
@given(d=DATES, n=SMALL)
def test_plus_minus_days_inverse(d, n):
    assert eval_date_expr(f"minusDays(plusDays(@d, {n}), {n})", d=d) == d
    assert eval_date_expr(f"@d + {n} - {n}", d=d) == d


@settings(max_examples=200)
@given(d=DATES, n=SMALL)
def test_arithmetic_matches_timedelta(d, n):
    assert eval_date_expr(f"@d + {n}", d=d) == d + dt.timedelta(days=n)
    assert eval_date_expr(f"@d - {n}", d=d) == d - dt.timedelta(days=n)


@settings(max_examples=200)
@given(d=DATES, n=st.integers(min_value=0, max_value=520))
def test_weeks_are_seven_days(d, n):
    assert eval_date_expr(f"plusWeeks(@d, {n})", d=d) == d + dt.timedelta(weeks=n)
    assert eval_date_expr(f"minusWeeks(@d, {n})", d=d) == d - dt.timedelta(weeks=n)


@settings(max_examples=200)
@given(d=DATES)
def test_begin_end_of_month_bracket(d):
    begin = eval_date_expr("beginOfMonth(@d)", d=d)
    end = eval_date_expr("endOfMonth(@d)", d=d)
    assert begin.day == 1
    assert begin <= d <= end
    assert (begin.year, begin.month) == (d.year, d.month) == (end.year, end.month)
    assert (end + dt.timedelta(days=1)).day == 1


@settings(max_examples=200)
@given(d=DATES, n=MONTHS)
def test_plus_months_keeps_day_or_clamps(d, n):
    out = eval_date_expr(f"plusMonths(@d, {n})", d=d)
    total = d.year * 12 + (d.month - 1) + n
    assert (out.year, out.month) == (total // 12, total % 12 + 1)
    assert out.day == min(d.day, eval_date_expr("endOfMonth(@o)", o=out).day)


@settings(max_examples=200)
@given(d=DATES, wd=st.integers(min_value=1, max_value=7))
def test_last_weekday_is_most_recent(d, wd):
    out = eval_date_expr(f"{WEEKDAY_FN[wd]}(@d)", d=d)
    assert out.isoweekday() == wd
    assert dt.timedelta(0) <= d - out <= dt.timedelta(days=6)


@settings(max_examples=200)
@given(d=DATES)
def test_accessors_consistent(d):
    assert eval_date_expr("monthOf(@d)", d=d) == d.month
    assert eval_date_expr("yearOf(@d)", d=d) == d.year
    assert eval_date_expr("dayOfMonth(@d)", d=d) == d.day
    assert eval_date_expr("dayOfWeek(@d)", d=d) == d.isoweekday()
    assert eval_date_expr("yearMonthOf(@d)", d=d) == f"{d.year:04d}-{d.month:02d}"


@settings(max_examples=100)
@given(d=DATES, a=st.integers(min_value=0, max_value=100), b=st.integers(min_value=0, max_value=100))
def test_nested_composition_associates(d, a, b):
    lhs = eval_date_expr(f"plusDays(plusDays(@d, {a}), {b})", d=d)
    rhs = eval_date_expr(f"plusDays(@d, {a + b})", d=d)
    assert lhs == rhs == eval_date_expr(f"@d + {a} + {b}", d=d)
