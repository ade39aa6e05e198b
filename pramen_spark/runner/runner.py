"""Pipeline orchestration: dependency resolution + parallel job execution.

Reference mapping:
- DAG resolution / cycle & missing-table validation:
  core/.../runner/orchestrator/DependencyResolverImpl.scala,
  OrchestratorImpl.runJobs (OrchestratorImpl.scala:57-140)
- Parallel execution with a fixed worker pool:
  core/.../runner/jobrunner/ConcurrentJobRunnerImpl.scala:39-76
- Dependency date-range checks per task:
  core/.../pipeline/JobBase.scala:62-130

A job becomes runnable when every producer of its input tables has
finished; tasks (info dates) of one job run sequentially in date order
(self-dependence), different jobs run in parallel up to ``parallel_tasks``.
"""

from __future__ import annotations

import datetime as _dt
import logging
import threading
import time
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set

from pramen_spark.config.models import ScheduleKind
from pramen_spark.metastore.metastore import Metastore
from pramen_spark.runner.bookkeeper import Bookkeeper, Journal
from pramen_spark.runner.jobs import Job
from pramen_spark.runner.task_runner import RunStatus, TaskResult, TaskRunner
from pramen_spark.scheduling.strategies import (
    ScheduleParams,
    ScheduleStrategyIncremental,
    ScheduleStrategySourcing,
    TaskPreDef,
    TaskRunReason,
    evaluate_from_info_date,
)


log = logging.getLogger(__name__)


class DependencyResolver:
    """Topological availability of jobs keyed on output tables."""

    def __init__(self, jobs: Sequence[Job]):
        self.jobs = list(jobs)
        self.producers: Dict[str, Job] = {}
        for j in self.jobs:
            name = j.output_table.name.lower()
            if name in self.producers:
                raise ValueError(f"Multiple jobs produce table '{name}'")
            self.producers[name] = j
        self._validate()

    def _upstream_tables(self, job: Job) -> Set[str]:
        tables = {t.lower() for t in job.operation.input_tables}
        for dep in job.operation.dependencies:
            tables.update(t.lower() for t in dep.tables)
        return tables

    def upstream_jobs(self, job: Job) -> List[Job]:
        return [
            self.producers[t]
            for t in sorted(self._upstream_tables(job))
            if t in self.producers and self.producers[t] is not job
        ]

    def _validate(self) -> None:
        # cycle detection (DependencyResolverImpl: validation)
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {id(j): WHITE for j in self.jobs}

        def visit(j: Job, stack: List[str]) -> None:
            color[id(j)] = GRAY
            for up in self.upstream_jobs(j):
                if color[id(up)] == GRAY:
                    cycle = " -> ".join(stack + [up.output_table.name])
                    raise ValueError(f"Dependency cycle detected: {cycle}")
                if color[id(up)] == WHITE:
                    visit(up, stack + [up.output_table.name])
            color[id(j)] = BLACK

        for j in self.jobs:
            if color[id(j)] == WHITE:
                visit(j, [j.output_table.name])


class ResourcePool:
    """Weighted thread-resource semaphore
    (core/.../runner/task/TaskRunnerMultithreaded.scala:41-75): a job
    declaring ``consume.threads = n`` holds n of the pool's
    ``parallel.tasks`` permits while it runs; ``allow.parallel = false``
    jobs take the whole pool (exclusive run)."""

    def __init__(self, total: int):
        self.total = max(1, total)
        self._avail = self.total
        self._cv = threading.Condition()

    def acquire(self, n: int) -> int:
        n = min(max(1, n), self.total)
        with self._cv:
            while self._avail < n:
                self._cv.wait()
            self._avail -= n
        return n

    def release(self, n: int) -> None:
        with self._cv:
            self._avail += n
            self._cv.notify_all()


@dataclass
class PipelineResult:
    results: List[TaskResult] = field(default_factory=list)

    @property
    def succeeded(self) -> int:
        return sum(1 for r in self.results if r.status == RunStatus.SUCCEEDED)

    @property
    def failed(self) -> int:
        return sum(1 for r in self.results if r.is_failure)

    @property
    def exit_code(self) -> int:
        return 2 if self.failed else 0


class PipelineRunner:
    def __init__(
        self,
        metastore: Metastore,
        bookkeeper: Bookkeeper,
        journal: Optional[Journal] = None,
        parallel_tasks: int = 4,
        batch_id: Optional[int] = None,
        skip_locked: bool = False,
        undercover: bool = False,
        notification_targets: Optional[Sequence] = None,
        named_targets: Optional[Dict[str, object]] = None,
        hook_config=None,
        pipeline_info=None,
        lock=None,
    ):
        self.metastore = metastore
        self.bookkeeper = bookkeeper
        self.journal = journal or Journal()
        self.parallel_tasks = parallel_tasks
        self.notification_targets = list(notification_targets or [])
        self.named_targets = dict(named_targets or {})
        self.hook_config = hook_config
        self.pipeline_info = pipeline_info
        self._pool_resources = ResourcePool(parallel_tasks)
        self.task_runner = TaskRunner(
            bookkeeper,
            self.journal,
            batch_id=batch_id,
            skip_locked=skip_locked,
            undercover=undercover,
            lock=lock,
        )

    # --- dependency availability (JobBase.scala:62-130) ---

    def _check_dependencies(self, job: Job, info_date: _dt.date) -> Optional[str]:
        for dep in job.operation.dependencies:
            if dep.is_passive:
                continue
            date_from = evaluate_from_info_date(info_date, dep.date_from_expr)
            date_until = (
                evaluate_from_info_date(info_date, dep.date_until_expr)
                if dep.date_until_expr
                else None
            )
            for table in dep.tables:
                available = self.bookkeeper.get_data_chunks_count(table, date_from, date_until) > 0
                if not available:
                    # fall back to actual storage (tables may pre-exist bookkeeping)
                    try:
                        available = self.metastore.is_data_available(table, date_from, date_until)
                    except KeyError:
                        available = False
                if not available and not dep.is_optional:
                    rng = f"from {date_from}" + (f" to {date_until}" if date_until else "")
                    return f"Dependency not satisfied: table '{table}' has no data {rng}"
        return None

    def _strategy_for(self, job: Job):
        if job.operation.schedule.kind == ScheduleKind.INCREMENTAL:
            last = self.bookkeeper.get_latest_processed_date(job.output_table.name)
            return ScheduleStrategyIncremental(last, True)
        return ScheduleStrategySourcing(True)

    def _run_job(self, job: Job, params: ScheduleParams) -> List[TaskResult]:
        weight = (
            self._pool_resources.total
            if not job.operation.allow_parallel
            else job.operation.consume_threads
        )
        held = self._pool_resources.acquire(weight)
        try:
            return self._run_job_tasks(job, params)
        finally:
            self._pool_resources.release(held)

    def _run_job_tasks(self, job: Job, params: ScheduleParams) -> List[TaskResult]:
        strategy = self._strategy_for(job)
        days = strategy.get_days_to_run(
            job.output_table.name,
            self.bookkeeper,
            job.operation.info_date_expression or "@runDate",
            job.operation.schedule,
            params,
            initial_sourcing_date_expr=job.operation.options.get(
                "initial.sourcing.date.expr", "@runDate"
            ),
            minimum_date=job.output_table.info_date_start,
        )
        results: List[TaskResult] = []
        for task in days:
            if task.reason != TaskRunReason.SKIP:
                dep_error = self._check_dependencies(job, task.info_date)
                if dep_error:
                    results.append(
                        TaskResult(
                            job_name=job.name,
                            table_name=job.output_table.name,
                            info_date=task.info_date,
                            status=RunStatus.VALIDATION_FAILED,
                            reason=task.reason,
                            error=dep_error,
                        )
                    )
                    continue
            results.append(self.task_runner.run_task(job, task))
        return results

    def _notify_tasks(self, job: Job, results: Sequence["TaskResult"]) -> None:
        """Per-task notification targets (api/.../NotificationTarget.scala);
        unnamed runner-level targets get every task, named targets only the
        operations that list them (TaskRunnerBase.scala:560 dispatches per
        job.notificationTargets). Target errors are warnings, never task
        failures."""
        from pramen_spark.notify.targets import NotificationTarget, PipelineInfo

        info = self.pipeline_info or PipelineInfo()
        targets = list(self.notification_targets)
        for name in getattr(job.operation, "notification_targets", ()) or ():
            t = self.named_targets.get(name)
            if t is None:
                log.warning("Operation %s names unknown notification target '%s'",
                            job.operation.name, name)
            else:
                targets.append(t)
        for target in targets:
            if not isinstance(target, NotificationTarget):
                continue
            for r in results:
                try:
                    target.send_notification(info, r)
                except Exception as e:  # noqa: BLE001
                    log.warning("Notification target %s failed: %s", target, e)

    def _notify_pipeline(self, out: PipelineResult) -> None:
        from pramen_spark.notify.targets import PipelineInfo, PipelineNotificationTarget

        info = self.pipeline_info or PipelineInfo()
        info.finished_at = time.time()
        info.exit_code = out.exit_code
        targets = list(self.notification_targets)
        targets.extend(t for t in self.named_targets.values() if t not in targets)
        for target in targets:
            if not isinstance(target, PipelineNotificationTarget):
                continue
            try:
                target.send_notification(info, out.results)
            except Exception as e:  # noqa: BLE001
                log.warning("Pipeline notification target %s failed: %s", target, e)

    def run(self, jobs: Sequence[Job], params: ScheduleParams) -> PipelineResult:
        if self.hook_config is not None:
            # AppRunner.scala:80: startup hook failure aborts the pipeline
            self.hook_config.run_startup_hook()
        try:
            out = self._run_dag(jobs, params)
        finally:
            if self.hook_config is not None:
                self.hook_config.run_shutdown_hook()
        self._notify_pipeline(out)
        return out

    def _run_dag(self, jobs: Sequence[Job], params: ScheduleParams) -> PipelineResult:
        # lazy transient outputs are not scheduled: their jobs register with
        # the TransientJobManager and run on first consumer read
        # (reference: TransientJobManager / OperationSplitter lazy handling)
        eager_jobs: List[Job] = []
        for job in jobs:
            if job.output_table.format.is_lazy:
                self.metastore.transient_jobs.register_job(job)
            else:
                eager_jobs.append(job)
        jobs = eager_jobs
        resolver = DependencyResolver(jobs)
        pending: List[Job] = list(jobs)
        done: Dict[int, bool] = {}  # id(job) -> had_failures
        out = PipelineResult()
        lock = threading.Lock()

        def runnable(job: Job) -> bool:
            return all(id(u) in done for u in resolver.upstream_jobs(job))

        def upstream_failed(job: Job) -> bool:
            return any(done.get(id(u), False) for u in resolver.upstream_jobs(job))

        with ThreadPoolExecutor(max_workers=self.parallel_tasks) as pool:
            futures: Dict[Future, Job] = {}
            while pending or futures:
                progressed = False
                for job in list(pending):
                    if not runnable(job):
                        continue
                    pending.remove(job)
                    progressed = True
                    if upstream_failed(job):
                        with lock:
                            done[id(job)] = True
                            out.results.append(
                                TaskResult(
                                    job_name=job.name,
                                    table_name=job.output_table.name,
                                    info_date=params.run_date or _dt.date.today(),
                                    status=RunStatus.NOT_RAN,
                                    reason=TaskRunReason.SKIP,
                                    error="Upstream job failed",
                                )
                            )
                        continue
                    futures[pool.submit(self._run_job, job, params)] = job
                if not futures:
                    if pending and not progressed:
                        raise RuntimeError(
                            "Deadlock in pipeline scheduling: "
                            + ", ".join(j.name for j in pending)
                        )
                    continue
                finished, _ = wait(list(futures), return_when=FIRST_COMPLETED)
                for fut in finished:
                    job = futures.pop(fut)
                    try:
                        results = fut.result()
                    except Exception as e:  # job-level crash
                        results = [
                            TaskResult(
                                job_name=job.name,
                                table_name=job.output_table.name,
                                info_date=params.run_date or _dt.date.today(),
                                status=RunStatus.FAILED,
                                reason=TaskRunReason.NEW,
                                error=str(e),
                            )
                        ]
                    with lock:
                        out.results.extend(results)
                        done[id(job)] = any(r.is_failure for r in results)
                    self._notify_tasks(job, results)
        return out
