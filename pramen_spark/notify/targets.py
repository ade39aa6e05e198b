"""Notification targets and startup/shutdown hooks — the reference's
pluggable post-task / post-pipeline callbacks.

Reference:
- api/.../NotificationTarget.scala — per-task ``sendNotification(pipelineInfo,
  taskResult)``;
- api/.../PipelineNotificationTarget.scala — pipeline-level
  ``sendNotification(pipelineInfo, tasksCompleted, customNotification)``;
- core/.../app/config/HookConfig.scala — ``pramen.hook.startup.class`` /
  ``pramen.hook.shutdown.class`` Runnables executed around the pipeline
  (AppRunner.scala:80-81, PipelineStateImpl.runCustomShutdownHook).

Targets are plain Python classes loaded by entry-point string
(``module.Class``), mirroring the reference's reflection factories.
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from pramen_spark.runner.task_runner import RunStatus, TaskResult

log = logging.getLogger(__name__)


@dataclass
class PipelineInfo:
    """api/.../PipelineInfo.scala: identity + timing of the current run."""

    pipeline_name: str = "pipeline"
    environment: str = "local"
    run_date: Optional[_dt.date] = None
    started_at: float = field(default_factory=time.time)
    finished_at: Optional[float] = None
    exit_code: int = 0


class NotificationTarget:
    """Per-task notification channel (api/.../NotificationTarget.scala).

    Subclasses override :meth:`send_notification`; ``connect``/``close``
    bracket the pipeline run like source/sink channels.
    """

    def __init__(self, options: Optional[Dict[str, Any]] = None):
        self.options = dict(options or {})

    def connect(self) -> None:
        pass

    def send_notification(self, pipeline_info: PipelineInfo, task: TaskResult) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class PipelineNotificationTarget:
    """Pipeline-completion channel (api/.../PipelineNotificationTarget.scala)."""

    def __init__(self, options: Optional[Dict[str, Any]] = None):
        self.options = dict(options or {})

    def send_notification(
        self,
        pipeline_info: PipelineInfo,
        tasks_completed: Sequence[TaskResult],
        custom_notification: Optional[Dict[str, Any]] = None,
    ) -> None:
        raise NotImplementedError


def _task_record(task: TaskResult) -> Dict[str, Any]:
    return {
        "job": task.job_name,
        "table": task.table_name,
        "info_date": task.info_date.isoformat() if task.info_date else None,
        "status": task.status.value if isinstance(task.status, RunStatus) else str(task.status),
        "records": task.records,
        "elapsed_s": task.elapsed_sec,
        "error": task.error,
    }


class FileNotificationTarget(NotificationTarget, PipelineNotificationTarget):
    """Built-in target: appends one JSON line per task (and a pipeline
    summary line) to ``options['path']`` — the file-based stand-in for the
    reference's email/HTTP targets, usable for run auditing."""

    def send_notification(self, pipeline_info, task, custom_notification=None):
        if isinstance(task, TaskResult):  # per-task form
            rec = {"kind": "task", "pipeline": pipeline_info.pipeline_name,
                   **_task_record(task)}
        else:  # pipeline form: task is the list of results
            results = list(task)
            rec = {
                "kind": "pipeline",
                "pipeline": pipeline_info.pipeline_name,
                "environment": pipeline_info.environment,
                "exit_code": pipeline_info.exit_code,
                "tasks": [_task_record(t) for t in results],
            }
        with open(self.options["path"], "a") as f:
            f.write(json.dumps(rec) + "\n")


class LoggingNotificationTarget(NotificationTarget, PipelineNotificationTarget):
    """Built-in target: logs task/pipeline completion (the default when no
    email infra exists; mirrors the reference's console summary)."""

    def send_notification(self, pipeline_info, task, custom_notification=None):
        if isinstance(task, TaskResult):
            log.info("[%s] task %s (%s) -> %s", pipeline_info.pipeline_name,
                     task.job_name, task.info_date, task.status)
        else:
            results = list(task)
            failed = sum(1 for t in results if t.is_failure)
            log.info("[%s] pipeline finished: %d tasks, %d failed",
                     pipeline_info.pipeline_name, len(results), failed)


@dataclass
class HookConfig:
    """core/.../app/config/HookConfig.scala: optional startup/shutdown
    runnables named by ``pramen.hook.startup.class`` /
    ``pramen.hook.shutdown.class``. Instantiation errors surface at
    startup-hook time (the reference defers Failure the same way)."""

    startup_class: Optional[str] = None
    shutdown_class: Optional[str] = None

    def _run(self, class_name: str, stage: str) -> None:
        from pramen_spark.api import load_class

        hook = load_class(class_name)()
        log.info("Running the %s hook %s...", stage, class_name)
        hook.run()

    def run_startup_hook(self) -> None:
        if self.startup_class:
            self._run(self.startup_class, "startup")

    def run_shutdown_hook(self) -> None:
        if self.shutdown_class:
            self._run(self.shutdown_class, "shutdown")


def load_notification_targets(
    specs: Sequence[Dict[str, Any]],
) -> List[NotificationTarget]:
    """``pramen.notification.targets = [{factory.class = ..., ...opts}]`` →
    instances (reference: NotificationTargetManager + reflection factory)."""
    from pramen_spark.api import load_class
    from pramen_spark.config.loader import _get

    targets: List[NotificationTarget] = []
    for spec in specs or []:
        factory = _get(spec, "factory.class", "factory", default=None)
        if not factory:
            raise ValueError(f"notification target needs factory.class: {spec}")
        opts = {k: v for k, v in spec.items()
                if k not in ("factory.class", "factory", "name")}
        targets.append(load_class(factory)(opts))
    return targets


def split_targets(specs: Sequence[Dict[str, Any]]):
    """Split configured targets into (unnamed, named-by-name). Named targets
    receive only tasks of operations listing them under
    ``notification.targets`` (OperationDef.scala NOTIFICATION_TARGETS_KEY);
    unnamed ones receive everything."""
    unnamed_specs = [s for s in specs or [] if not s.get("name")]
    named_specs = {s["name"]: s for s in specs or [] if s.get("name")}
    unnamed = load_notification_targets(unnamed_specs)
    named = {
        name: load_notification_targets([spec])[0]
        for name, spec in named_specs.items()
    }
    return unnamed, named
