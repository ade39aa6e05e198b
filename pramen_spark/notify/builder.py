"""Pipeline completion notifications.

Reference: core/.../notify/pipeline/PipelineNotificationBuilderHtml.scala —
an HTML report of per-task results with record counts, elapsed time and
throughput (records/s, :516-562), colored by the configured warn/good
thresholds (`pramen.warn.throughput.rps` / `pramen.good.throughput.rps`,
core/.../config/Keys.scala:27-28), plus schema-change and failure
sections. Email transport is deployment-specific; here the report is
rendered to a string and optionally written to a file — a custom
notification target can deliver it anywhere (api/.../NotificationTarget).
"""

from __future__ import annotations

import datetime as _dt
import html
from dataclasses import dataclass
from typing import List, Optional, Sequence

from pramen_spark.runner.task_runner import RunStatus, TaskResult


@dataclass
class NotificationConfig:
    warn_throughput_rps: Optional[int] = None
    good_throughput_rps: Optional[int] = None
    pipeline_name: str = "pipeline"
    environment: str = "local"


_STATUS_STYLE = {
    RunStatus.SUCCEEDED: "background-color:#c6efce",
    RunStatus.SKIPPED: "background-color:#eeeeee",
    RunStatus.NOT_RAN: "background-color:#eeeeee",
}


class PipelineNotificationBuilder:
    # suppression floors (PipelineNotificationBuilderHtml.scala:39-40):
    # sub-minute or sub-1000-record tasks give noisy rates, so the report
    # shows a blank throughput cell for them
    MIN_RPS_JOB_DURATION_SECONDS = 60
    MIN_RPS_RECORDS = 1000

    def __init__(self, config: NotificationConfig | None = None):
        self.config = config or NotificationConfig()

    # --- pieces ---

    @classmethod
    def throughput_rps(cls, result: TaskResult) -> Optional[int]:
        """records / task-seconds, or None below the suppression floors
        (PipelineNotificationBuilderHtml:516-540)."""
        if (
            result.elapsed_sec <= cls.MIN_RPS_JOB_DURATION_SECONDS
            or result.records < cls.MIN_RPS_RECORDS
        ):
            return None
        return int(result.records / result.elapsed_sec)

    def _throughput_style(self, rps: Optional[int]) -> str:
        if rps is None:
            return ""
        if self.config.good_throughput_rps and rps >= self.config.good_throughput_rps:
            return "color:#006100"
        if self.config.warn_throughput_rps and rps < self.config.warn_throughput_rps:
            return "color:#9c5700"
        return ""

    # --- plain-text summary (log-friendly) ---

    def build_text(self, results: Sequence[TaskResult]) -> str:
        lines = [
            f"Pipeline '{self.config.pipeline_name}' ({self.config.environment}) finished: "
            f"{sum(1 for r in results if r.status == RunStatus.SUCCEEDED)} succeeded, "
            f"{sum(1 for r in results if r.is_failure)} failed, "
            f"{len(results)} total"
        ]
        for r in results:
            rps = self.throughput_rps(r)
            lines.append(
                f"  {r.table_name} {r.info_date} {r.status.value}"
                f" records={r.records} elapsed={r.elapsed_sec:.1f}s"
                + (f" rps={rps}" if rps is not None else "")
                + (f" ERROR: {r.error}" if r.error else "")
            )
            for ch in r.schema_changes:
                lines.append(f"    schema change: {ch}")
        return "\n".join(lines)

    # --- HTML report ---

    def build_html(self, results: Sequence[TaskResult]) -> str:
        rows: List[str] = []
        for r in results:
            rps = self.throughput_rps(r)
            status_style = _STATUS_STYLE.get(
                r.status, "background-color:#ffc7ce" if r.is_failure else ""
            )
            rows.append(
                "<tr>"
                f"<td>{html.escape(r.job_name)}</td>"
                f"<td>{html.escape(r.table_name)}</td>"
                f"<td>{r.info_date.isoformat()}</td>"
                f'<td style="{status_style}">{html.escape(r.status.value)}</td>'
                f'<td style="text-align:right">{r.records}</td>'
                f'<td style="text-align:right">{r.elapsed_sec:.1f}</td>'
                f'<td style="text-align:right;{self._throughput_style(rps)}">'
                f'{rps if rps is not None else ""}</td>'
                f"<td>{html.escape(r.error or '')}</td>"
                "</tr>"
            )
        schema_rows = [
            f"<li>{html.escape(r.table_name)} {r.info_date}: {html.escape(str(ch))}</li>"
            for r in results
            for ch in r.schema_changes
        ]
        warn_rows = [
            f"<li>{html.escape(r.table_name)} {r.info_date}: {html.escape(w)}</li>"
            for r in results
            for w in r.warnings
        ]
        return (
            "<html><body>"
            f"<h2>Pipeline '{html.escape(self.config.pipeline_name)}' "
            f"({html.escape(self.config.environment)}) "
            f"&mdash; {_dt.datetime.now().isoformat(timespec='seconds')}</h2>"
            "<table border='1' cellpadding='4' cellspacing='0'>"
            "<tr><th>Job</th><th>Table</th><th>Info date</th><th>Status</th>"
            "<th>Records</th><th>Elapsed (s)</th><th>Throughput (r/s)</th>"
            "<th>Error</th></tr>"
            + "".join(rows)
            + "</table>"
            + (f"<h3>Schema changes</h3><ul>{''.join(schema_rows)}</ul>" if schema_rows else "")
            + (f"<h3>Warnings</h3><ul>{''.join(warn_rows)}</ul>" if warn_rows else "")
            + "</body></html>"
        )

    def write_html(self, results: Sequence[TaskResult], path: str) -> str:
        content = self.build_html(results)
        with open(path, "w") as f:
            f.write(content)
        return path
