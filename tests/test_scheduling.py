"""Schedule / day-selection strategy tests (reference:
ScheduleStrategySourcing/Incremental/Utils)."""

import datetime as dt

from pramen_spark.config.models import Schedule
from pramen_spark.runner.bookkeeper import Bookkeeper
from pramen_spark.scheduling.strategies import (
    RunMode,
    ScheduleParams,
    ScheduleStrategyIncremental,
    ScheduleStrategySourcing,
    TaskRunReason,
    evaluate_run_date,
    get_info_date_range,
    get_next_expected_info_date,
)

D = dt.date
DAILY = Schedule.parse("daily")
WEEKLY_SUN = Schedule.parse({"type": "weekly", "days.of.week": [7]})
MONTHLY_1 = Schedule.parse({"type": "monthly", "days.of.month": [1]})
MONTHLY_LAST = Schedule.parse({"type": "monthly", "days.of.month": ["last"]})


def bk_with(table, *dates):
    bk = Bookkeeper()
    for d in dates:
        bk.set_record_count(table, d, 10, 10, 0.0, 1.0)
    return bk


class TestSchedulePredicates:
    def test_daily(self):
        assert DAILY.is_enabled(D(2022, 8, 15))

    def test_weekly(self):
        assert WEEKLY_SUN.is_enabled(D(2022, 8, 14))  # a Sunday
        assert not WEEKLY_SUN.is_enabled(D(2022, 8, 15))

    def test_monthly(self):
        assert MONTHLY_1.is_enabled(D(2022, 8, 1))
        assert not MONTHLY_1.is_enabled(D(2022, 8, 2))

    def test_monthly_last(self):
        assert MONTHLY_LAST.is_enabled(D(2022, 8, 31))
        assert MONTHLY_LAST.is_enabled(D(2022, 2, 28))
        assert MONTHLY_LAST.is_enabled(D(2020, 2, 29))
        assert not MONTHLY_LAST.is_enabled(D(2020, 2, 28))

    def test_monthly_negative(self):
        s = Schedule.parse({"type": "monthly", "days.of.month": [-2]})
        assert s.is_enabled(D(2022, 8, 30))
        assert not s.is_enabled(D(2022, 8, 31))


class TestInfoDateRange:
    def test_daily_identity(self):
        rng = get_info_date_range(D(2022, 1, 1), D(2022, 1, 3), "@runDate", DAILY)
        assert rng == [D(2022, 1, 1), D(2022, 1, 2), D(2022, 1, 3)]

    def test_weekly_dedup(self):
        rng = get_info_date_range(D(2022, 8, 8), D(2022, 8, 21), "lastSunday(@runDate)", WEEKLY_SUN)
        assert rng == [D(2022, 8, 14), D(2022, 8, 21)]

    def test_empty_when_inverted(self):
        assert get_info_date_range(D(2022, 1, 3), D(2022, 1, 1), "@runDate", DAILY) == []


class TestNextExpectedInfoDate:
    def test_daily(self):
        assert get_next_expected_info_date(D(2022, 1, 5), "@runDate - 1", DAILY) == D(2022, 1, 6)

    def test_weekly(self):
        # last processed Sunday-based info date; next comes a week later
        assert get_next_expected_info_date(D(2022, 8, 14), "@runDate", WEEKLY_SUN) == D(2022, 8, 21)


class TestSourcingNormal:
    def test_first_run_catchup(self):
        # no bookkeeping -> late days from initial sourcing date + new day
        strat = ScheduleStrategySourcing(has_info_date_column=True)
        days = strat.get_days_to_run(
            "t",
            Bookkeeper(),
            "@runDate",
            DAILY,
            ScheduleParams.normal(D(2022, 1, 10)),
            initial_sourcing_date_expr="@runDate - 3",
        )
        assert [t.info_date for t in days] == [
            D(2022, 1, 7), D(2022, 1, 8), D(2022, 1, 9), D(2022, 1, 10),
        ]
        assert days[0].reason == TaskRunReason.LATE
        assert days[-1].reason == TaskRunReason.NEW

    def test_up_to_date_runs_only_new(self):
        bk = bk_with("t", D(2022, 1, 9))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert [t.info_date for t in days] == [D(2022, 1, 10)]
        assert days[0].reason == TaskRunReason.NEW

    def test_already_ran_today_skips(self):
        bk = bk_with("t", D(2022, 1, 10))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert days == []

    def test_track_days_rerun_window(self):
        bk = bk_with("t", D(2022, 1, 9))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY,
            ScheduleParams.normal(D(2022, 1, 10), track_days=3),
        )
        # tracked: run dates 08..09 -> info dates 08, 09 (late) + new 10
        assert [t.info_date for t in days] == [D(2022, 1, 8), D(2022, 1, 9), D(2022, 1, 10)]

    def test_backfill_missing_gaps(self):
        bk = bk_with("t", D(2022, 1, 6), D(2022, 1, 8), D(2022, 1, 9))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY,
            ScheduleParams.normal(D(2022, 1, 10), backfill_days=5),
            initial_sourcing_date_expr="@runDate",
        )
        # backfill window [06..09]; 07 is missing
        infos = [t.info_date for t in days]
        assert D(2022, 1, 7) in infos
        assert D(2022, 1, 10) in infos
        assert D(2022, 1, 8) not in infos

    def test_weekly_info_date_expr(self):
        strat = ScheduleStrategySourcing(True)
        bk = bk_with("t", D(2022, 8, 7))
        days = strat.get_days_to_run(
            "t", bk, "lastSunday(@runDate)", WEEKLY_SUN,
            ScheduleParams.normal(D(2022, 8, 21)),
        )
        # missed Sunday 14th is late, 21st is new
        assert [t.info_date for t in days] == [D(2022, 8, 14), D(2022, 8, 21)]

    def test_minimum_date_skips(self):
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY,
            ScheduleParams.normal(D(2022, 1, 10)),
            initial_sourcing_date_expr="@runDate - 5",
            minimum_date=D(2022, 1, 8),
        )
        skipped = [t for t in days if t.reason == TaskRunReason.SKIP]
        active = [t for t in days if t.reason != TaskRunReason.SKIP]
        assert {t.info_date for t in skipped} == {D(2022, 1, 5), D(2022, 1, 6), D(2022, 1, 7)}
        assert [t.info_date for t in active] == [D(2022, 1, 8), D(2022, 1, 9), D(2022, 1, 10)]


class TestSourcingRerunHistorical:
    def test_rerun_existing(self):
        bk = bk_with("t", D(2022, 1, 5))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY, ScheduleParams.rerun(D(2022, 1, 5))
        )
        assert days == [] or days[0].reason == TaskRunReason.RERUN

    def test_rerun_never_ran_is_new(self):
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY, ScheduleParams.rerun(D(2022, 1, 5))
        )
        assert days[0].reason == TaskRunReason.NEW

    def test_historical_fill_gaps(self):
        bk = bk_with("t", D(2022, 1, 2))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY,
            ScheduleParams.historical(D(2022, 1, 1), D(2022, 1, 3), mode=RunMode.SKIP_ALREADY_RAN),
        )
        assert [t.info_date for t in days] == [D(2022, 1, 1), D(2022, 1, 3)]

    def test_historical_check_updates(self):
        bk = bk_with("t", D(2022, 1, 2))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY,
            ScheduleParams.historical(D(2022, 1, 1), D(2022, 1, 3), mode=RunMode.CHECK_UPDATES),
        )
        reasons = {t.info_date: t.reason for t in days}
        assert reasons[D(2022, 1, 2)] == TaskRunReason.UPDATE
        assert reasons[D(2022, 1, 1)] == TaskRunReason.NEW

    def test_historical_force(self):
        bk = bk_with("t", D(2022, 1, 2))
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", bk, "@runDate", DAILY,
            ScheduleParams.historical(D(2022, 1, 1), D(2022, 1, 2), mode=RunMode.FORCE),
        )
        assert {t.reason for t in days} == {TaskRunReason.NEW, TaskRunReason.RERUN}

    def test_historical_inverse_order(self):
        strat = ScheduleStrategySourcing(True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY,
            ScheduleParams.historical(
                D(2022, 1, 1), D(2022, 1, 3), inverse_date_order=True
            ),
        )
        assert [t.info_date for t in days] == [D(2022, 1, 3), D(2022, 1, 2), D(2022, 1, 1)]


class TestIncremental:
    def test_first_run(self):
        strat = ScheduleStrategyIncremental(None, True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert [t.info_date for t in days] == [D(2022, 1, 10)]

    def test_behind_runs_yesterday_and_today(self):
        strat = ScheduleStrategyIncremental(D(2022, 1, 8), True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert [t.info_date for t in days] == [D(2022, 1, 9), D(2022, 1, 10)]

    def test_catchup_with_infinite_track(self):
        strat = ScheduleStrategyIncremental(D(2022, 1, 5), True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY,
            ScheduleParams.normal(D(2022, 1, 10), track_days=-1),
        )
        infos = [t.info_date for t in days]
        # late: 05..08, new: 09, 10
        assert infos == [
            D(2022, 1, 5), D(2022, 1, 6), D(2022, 1, 7), D(2022, 1, 8),
            D(2022, 1, 9), D(2022, 1, 10),
        ]
        assert days[0].reason == TaskRunReason.LATE
        assert days[-1].reason == TaskRunReason.NEW

    def test_no_catchup_without_track_days(self):
        strat = ScheduleStrategyIncremental(D(2022, 1, 5), True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY,
            ScheduleParams.normal(D(2022, 1, 10), track_days=0),
        )
        # only yesterday + today as new; the gap is not caught up
        assert [t.info_date for t in days] == [D(2022, 1, 9), D(2022, 1, 10)]

    def test_up_to_date(self):
        strat = ScheduleStrategyIncremental(D(2022, 1, 10), True)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert [t.info_date for t in days] == [D(2022, 1, 10)]

    def test_no_info_date_column_future_noop(self):
        strat = ScheduleStrategyIncremental(D(2022, 1, 11), False)
        days = strat.get_days_to_run(
            "t", Bookkeeper(), "@runDate", DAILY, ScheduleParams.normal(D(2022, 1, 10))
        )
        assert days == []


class TestEvaluateRunDate:
    def test_expressions(self):
        assert evaluate_run_date(D(2022, 1, 10), "@runDate - 1") == D(2022, 1, 9)
        assert evaluate_run_date(D(2022, 8, 17), "lastSunday(@runDate)") == D(2022, 8, 14)
        assert evaluate_run_date(D(2022, 8, 17), "beginOfMonth(@runDate)") == D(2022, 8, 1)
