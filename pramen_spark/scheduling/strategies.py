"""Day-selection (schedule) strategies: which information dates a job must
run for, given the run date, the schedule, bookkeeping state, and run mode.

Behavioral parity targets:
- normal/late/backfill/new selection:
  core/.../runner/splitter/ScheduleStrategySourcing.scala:55-146
- incremental {yesterday, today} + catch-up:
  core/.../runner/splitter/ScheduleStrategyIncremental.scala:29-124
- shared utils (getNew/getLate/getRerun/getHistorical/getInfoDateRange/
  getNextExpectedInfoDate/filterOutPastMinimumDates):
  core/.../runner/splitter/ScheduleStrategyUtils.scala:47-315
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from enum import Enum
from typing import List, Optional, Sequence

from pramen_spark.config.models import Schedule
from pramen_spark.dsl.dateexpr import DateExprEvaluator
from pramen_spark.runner.bookkeeper import Bookkeeper

_ONE_DAY = _dt.timedelta(days=1)


class TaskRunReason(str, Enum):
    NEW = "new"
    LATE = "late"
    RERUN = "rerun"
    UPDATE = "update"
    SKIP = "skip"


class RunMode(str, Enum):
    """--run-mode fill_gaps|check_updates|force (cmd/CmdLineConfig.scala)."""

    SKIP_ALREADY_RAN = "fill_gaps"
    CHECK_UPDATES = "check_updates"
    FORCE = "force"


@dataclass(frozen=True)
class TaskPreDef:
    info_date: _dt.date
    reason: TaskRunReason
    skip_note: str = ""


@dataclass(frozen=True)
class ScheduleParams:
    """Normal / Rerun / Historical run parameters."""

    kind: str = "normal"  # normal | rerun | historical
    run_date: Optional[_dt.date] = None
    # -1 = late-based catch-up enabled (reference.conf:86 backfill.days = -1)
    backfill_days: int = -1
    track_days: int = 0
    delay_days: int = 0
    new_only: bool = False
    late_only: bool = False
    date_from: Optional[_dt.date] = None
    date_to: Optional[_dt.date] = None
    inverse_date_order: bool = False
    mode: RunMode = RunMode.CHECK_UPDATES

    @staticmethod
    def normal(run_date: _dt.date, **kw) -> "ScheduleParams":
        return ScheduleParams(kind="normal", run_date=run_date, **kw)

    @staticmethod
    def rerun(run_date: _dt.date) -> "ScheduleParams":
        return ScheduleParams(kind="rerun", run_date=run_date)

    @staticmethod
    def historical(
        date_from: _dt.date,
        date_to: _dt.date,
        mode: RunMode = RunMode.CHECK_UPDATES,
        inverse_date_order: bool = False,
    ) -> "ScheduleParams":
        return ScheduleParams(
            kind="historical",
            date_from=date_from,
            date_to=date_to,
            mode=mode,
            inverse_date_order=inverse_date_order,
        )


def evaluate_run_date(run_date: _dt.date, expression: str) -> _dt.date:
    """info date = f(run date) (ScheduleStrategyUtils.evaluateRunDate:238-249)."""
    ev = DateExprEvaluator({"runDate": run_date, "date": run_date})
    return ev.eval_date(expression)


def evaluate_from_info_date(info_date: _dt.date, expression: str) -> _dt.date:
    ev = DateExprEvaluator({"infoDate": info_date})
    return ev.eval_date(expression)


def get_info_date_range(
    date_from: _dt.date, date_to: _dt.date, info_date_expression: str, schedule: Schedule
) -> List[_dt.date]:
    """Distinct info dates produced by enabled run dates in [from, to]
    (ScheduleStrategyUtils.getInfoDateRange:205-236)."""
    if date_from > date_to:
        return []
    out: List[_dt.date] = []
    seen = set()
    d = date_from
    while d <= date_to:
        if schedule.is_enabled(d):
            info_date = evaluate_run_date(d, info_date_expression)
            if info_date not in seen:
                seen.add(info_date)
                out.append(info_date)
        d += _ONE_DAY
    return out


def get_next_expected_info_date(
    info_date: _dt.date, info_date_expression: str, schedule: Schedule
) -> _dt.date:
    """First info date strictly after *info_date* produced by walking run
    dates forward (ScheduleStrategyUtils.getNextExpectedInfoDate:284-315)."""
    max_iterations = 100
    current_info = info_date
    current_run = info_date
    fallback = info_date + _ONE_DAY
    iterations = 0
    while current_info <= info_date:
        iterations += 1
        current_run += _ONE_DAY
        if schedule.is_enabled(current_run):
            new_info = evaluate_run_date(current_run, info_date_expression)
            if new_info < current_info:
                return fallback
            current_info = new_info
        if iterations >= max_iterations:
            return fallback
    return current_info


def filter_out_past_minimum_dates(
    dates: List[TaskPreDef], minimum_date: _dt.date
) -> List[TaskPreDef]:
    day_before = minimum_date - _ONE_DAY
    out = []
    for t in dates:
        if t.info_date > day_before:
            out.append(t)
        else:
            out.append(
                TaskPreDef(
                    t.info_date,
                    TaskRunReason.SKIP,
                    skip_note=(
                        f"The task date '{t.info_date}' is older than the minimum date "
                        f"'{day_before}'."
                    ),
                )
            )
    return out


def get_rerun(
    table: str,
    run_date: _dt.date,
    schedule: Schedule,
    info_date_expression: str,
    bookkeeper: Bookkeeper,
) -> List[TaskPreDef]:
    if not schedule.is_enabled(run_date):
        return []
    info_date = evaluate_run_date(run_date, info_date_expression)
    if bookkeeper.get_latest_data_chunk(table, info_date) is not None:
        return [TaskPreDef(info_date, TaskRunReason.RERUN)]
    return [TaskPreDef(info_date, TaskRunReason.NEW)]


def get_new(
    run_date: _dt.date, schedule: Schedule, info_date_expression: str
) -> Optional[TaskPreDef]:
    if schedule.is_enabled(run_date):
        return TaskPreDef(evaluate_run_date(run_date, info_date_expression), TaskRunReason.NEW)
    return None


def get_late(
    table: str,
    run_date: _dt.date,
    schedule: Schedule,
    info_date_expression: str,
    initial_date_expr: str,
    last_processed: Optional[_dt.date],
) -> List[TaskPreDef]:
    """Catch-up dates strictly before the current run date
    (ScheduleStrategyUtils.getLate:97-137)."""
    last_info_date = evaluate_run_date(run_date - _ONE_DAY, info_date_expression)
    if last_processed is not None:
        next_expected = get_next_expected_info_date(last_processed, info_date_expression, schedule)
        if next_expected <= last_info_date:
            rng = get_info_date_range(
                next_expected, run_date - _ONE_DAY, info_date_expression, schedule
            )
            return [TaskPreDef(d, TaskRunReason.LATE) for d in rng]
        return []
    initial_date = evaluate_run_date(run_date, initial_date_expr)
    if initial_date <= last_info_date:
        rng = get_info_date_range(initial_date, run_date - _ONE_DAY, info_date_expression, schedule)
        return [TaskPreDef(d, TaskRunReason.LATE) for d in rng]
    return []


def get_historical(
    table: str,
    date_from: _dt.date,
    date_to: _dt.date,
    schedule: Schedule,
    mode: RunMode,
    info_date_expression: str,
    minimum_date: _dt.date,
    inverse_date_order: bool,
    bookkeeper: Bookkeeper,
) -> List[TaskPreDef]:
    potential = get_info_date_range(date_from, date_to, info_date_expression, schedule)
    task_reason = TaskRunReason.RERUN if mode == RunMode.FORCE else TaskRunReason.UPDATE
    out: List[TaskPreDef] = []
    for d in potential:
        count = bookkeeper.get_data_chunks_count(table, d, d)
        if mode == RunMode.SKIP_ALREADY_RAN:
            if count == 0:
                out.append(TaskPreDef(d, TaskRunReason.NEW))
        else:
            out.append(TaskPreDef(d, task_reason if count > 0 else TaskRunReason.NEW))
    if inverse_date_order:
        out.reverse()
    return filter_out_past_minimum_dates(out, minimum_date)


class ScheduleStrategySourcing:
    """Normal run = tracked (re-run window) + backfill (bookkeeping gaps) +
    late (catch-up) + new days (ScheduleStrategySourcing.scala:55-146)."""

    def __init__(self, has_info_date_column: bool = True):
        self.has_info_date_column = has_info_date_column

    def get_days_to_run(
        self,
        output_table: str,
        bookkeeper: Bookkeeper,
        info_date_expression: str,
        schedule: Schedule,
        params: ScheduleParams,
        initial_sourcing_date_expr: str = "@runDate - 7",
        minimum_date: _dt.date = _dt.date(2000, 1, 1),
    ) -> List[TaskPreDef]:
        if params.kind == "rerun":
            dates = get_rerun(
                output_table, params.run_date, schedule, info_date_expression, bookkeeper
            )
        elif params.kind == "historical":
            return get_historical(
                output_table,
                params.date_from,
                params.date_to,
                schedule,
                params.mode,
                info_date_expression,
                minimum_date,
                params.inverse_date_order,
                bookkeeper,
            )
        else:
            dates = self._normal(
                output_table,
                bookkeeper,
                info_date_expression,
                schedule,
                params,
                initial_sourcing_date_expr,
            )
        return filter_out_past_minimum_dates(dates, minimum_date)

    def _normal(
        self,
        output_table: str,
        bookkeeper: Bookkeeper,
        info_date_expression: str,
        schedule: Schedule,
        params: ScheduleParams,
        initial_sourcing_date_expr: str,
    ) -> List[TaskPreDef]:
        run_date = params.run_date
        assert run_date is not None
        delay = params.delay_days
        track = params.track_days
        backfill = params.backfill_days
        info_date = evaluate_run_date(run_date, info_date_expression)

        tracked: List[TaskPreDef] = []
        if not params.late_only and not params.new_only and track > 0:
            rng = get_info_date_range(
                run_date - _dt.timedelta(days=delay + track - 1),
                run_date - _dt.timedelta(days=delay + 1),
                info_date_expression,
                schedule,
            )
            tracked = [TaskPreDef(d, TaskRunReason.LATE) for d in rng]

        last_processed = bookkeeper.get_latest_processed_date(output_table, info_date)

        if params.late_only:
            backfill_days_to_check = max(backfill, track)
            backfill_dates = self._backfill(
                output_table, run_date, backfill_days_to_check, 0, schedule,
                initial_sourcing_date_expr, bookkeeper,
            )
        else:
            backfill_dates = self._backfill(
                output_table, run_date, backfill, track, schedule,
                initial_sourcing_date_expr, bookkeeper,
            )
        backfill_tasks = [TaskPreDef(d, TaskRunReason.LATE) for d in backfill_dates]

        new_days_orig: List[TaskPreDef] = []
        if not params.late_only:
            t = get_new(run_date - _dt.timedelta(days=delay), schedule, info_date_expression)
            if t is not None:
                new_days_orig = [t]

        if last_processed is not None and track <= 0:
            new_days = [t for t in new_days_orig if t.info_date > last_processed]
        else:
            new_days = new_days_orig

        late_days_orig: List[TaskPreDef] = []
        if not params.new_only and (backfill == -1 or last_processed is None):
            late_days_orig = get_late(
                output_table,
                run_date - _dt.timedelta(days=delay),
                schedule,
                info_date_expression,
                initial_sourcing_date_expr,
                last_processed,
            )

        if self.has_info_date_column:
            late_days = late_days_orig
        else:
            late_days = [] if new_days else late_days_orig[-1:]

        combined = backfill_tasks + tracked + late_days + new_days
        seen = {}
        for t in combined:
            seen.setdefault(t.info_date, t)
        return sorted(seen.values(), key=lambda t: t.info_date)

    @staticmethod
    def _backfill(
        output_table: str,
        run_date: _dt.date,
        backfill_days: int,
        track_days: int,
        schedule: Schedule,
        initial_sourcing_date_expr: str,
        bookkeeper: Bookkeeper,
    ) -> List[_dt.date]:
        """Missing (per bookkeeping) dates in the backfill window
        (ScheduleStrategySourcing.getBackFillDays:118-146)."""
        if backfill_days <= 0 or (backfill_days > 0 and track_days > backfill_days):
            return []
        backfill_start = run_date - _dt.timedelta(days=backfill_days - 1)
        if backfill_start == run_date:
            return []
        track_behind = track_days - 1 if track_days > 0 else 0
        backfill_end = run_date - _dt.timedelta(days=track_behind)  # exclusive
        if backfill_end <= backfill_start:
            return []
        potential = get_info_date_range(
            backfill_start, backfill_end - _ONE_DAY, initial_sourcing_date_expr, schedule
        )
        if not potential:
            return potential
        availability = bookkeeper.get_data_availability(
            output_table, backfill_start, backfill_end - _ONE_DAY
        )
        return [d for d in potential if d not in availability]


class ScheduleStrategyIncremental:
    """Incremental: {yesterday, today} new days + late catch-up window
    (ScheduleStrategyIncremental.scala:29-124)."""

    def __init__(self, last_info_date_processed: Optional[_dt.date], has_info_date_column: bool):
        self.last_info_date = last_info_date_processed
        self.has_info_date_column = has_info_date_column

    def get_days_to_run(
        self,
        output_table: str,
        bookkeeper: Bookkeeper,
        info_date_expression: str,
        schedule: Schedule,
        params: ScheduleParams,
        initial_sourcing_date_expr: str = "@runDate",
        minimum_date: _dt.date = _dt.date(2000, 1, 1),
    ) -> List[TaskPreDef]:
        if params.kind == "rerun":
            info_date = evaluate_run_date(params.run_date, info_date_expression)
            dates = [TaskPreDef(info_date, TaskRunReason.RERUN)]
        elif params.kind == "historical":
            return get_historical(
                output_table, params.date_from, params.date_to, schedule, params.mode,
                info_date_expression, minimum_date, params.inverse_date_order, bookkeeper,
            )
        else:
            info_date = evaluate_run_date(params.run_date, info_date_expression)
            if self.has_info_date_column:
                if self.last_info_date is not None:
                    if self.last_info_date < info_date:
                        new_days = [
                            TaskPreDef(info_date - _ONE_DAY, TaskRunReason.NEW),
                            TaskPreDef(info_date, TaskRunReason.NEW),
                        ]
                    else:
                        new_days = [TaskPreDef(info_date, TaskRunReason.NEW)]
                    late_days = self._late_days(info_date, self.last_info_date, params.track_days)
                    if params.new_only:
                        dates = new_days
                    elif params.late_only:
                        dates = late_days
                    else:
                        dates = late_days + new_days
                else:
                    dates = [TaskPreDef(info_date, TaskRunReason.NEW)]
            else:
                if self.last_info_date is not None and self.last_info_date > info_date:
                    dates = []
                else:
                    dates = [TaskPreDef(info_date, TaskRunReason.NEW)]
        return filter_out_past_minimum_dates(dates, minimum_date)

    @staticmethod
    def _late_days(
        info_date: _dt.date, last_info_date: _dt.date, track_days: int
    ) -> List[TaskPreDef]:
        """ScheduleStrategyIncremental.getLateDays:93-124. The previous day
        counts as new in incremental mode, hence the extra -1 days."""
        last_new_date = info_date - _ONE_DAY
        if last_info_date >= last_new_date:
            return []
        if track_days > 1:
            track_date = last_new_date - _dt.timedelta(days=track_days - 1)
            start_date = track_date if track_date > last_info_date else last_info_date
        elif track_days < 0:
            start_date = last_info_date
        else:
            start_date = last_new_date
        potential = get_info_date_range(
            start_date, last_new_date - _ONE_DAY, "@runDate", Schedule.parse("incremental")
        )
        return [TaskPreDef(d, TaskRunReason.LATE) for d in potential]
