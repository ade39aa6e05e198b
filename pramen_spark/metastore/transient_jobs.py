"""Lazy transient tables: on-demand job execution with cross-consumer
sharing.

Reference: core/.../metastore/peristence/TransientJobManager.scala (lazy
``Transient`` format jobs run only when a consumer asks for their output;
results are shared between consumers via the transient table manager).

Spark-first design: the producing job's output is a lazy DataFrame plan
anyway; "materialization" here means running the job's run/decoration
protocol once per (table, info date) and registering the resulting
DataFrame under the table's cache policy. Re-entrant requests for the same
date get the registered DataFrame — the job never runs twice.
"""

from __future__ import annotations

import datetime as _dt
import threading
from typing import Dict, List, Optional

from pyspark.sql import DataFrame

from pramen_spark.config.models import CachePolicy


class TransientJobManager:
    """Registry of producing jobs for lazy transient tables.

    Jobs register via ``register_job``; the metastore calls
    ``materialize`` when a consumer reads a lazy table whose data for the
    requested date is not yet in the transient store.
    """

    def __init__(self, metastore):
        self._metastore = metastore
        self._jobs: Dict[str, object] = {}
        # per-(table,date) locks so two consumers never run the same job
        # concurrently (reference: TransientJobManager synchronizes runs)
        self._locks: Dict[tuple, threading.Lock] = {}
        self._guard = threading.Lock()

    def register_job(self, job) -> None:
        name = job.output_table.name.lower()
        if name in self._jobs and self._jobs[name] is not job:
            raise ValueError(f"Multiple lazy jobs registered for table '{name}'")
        self._jobs[name] = job

    def has_job(self, table_name: str) -> bool:
        return table_name.lower() in self._jobs

    def _lock_for(self, key: tuple) -> threading.Lock:
        with self._guard:
            if key not in self._locks:
                self._locks[key] = threading.Lock()
            return self._locks[key]

    def materialize(self, table_name: str, info_date: _dt.date) -> Optional[DataFrame]:
        """Run the producing job for one info date (once); returns the
        registered DataFrame or None when the job yields no data."""
        key = (table_name.lower(), info_date.isoformat())
        store = self._metastore.transient
        with self._lock_for(key):
            if store.has_table(table_name, info_date):
                return store.get_table(table_name, info_date)
            job = self._jobs.get(table_name.lower())
            if job is None:
                return None
            df = job.run(info_date)
            if df is None:
                return None
            from pramen_spark.operators.rowlevel import apply_decorations

            op = job.operation
            df = apply_decorations(
                df,
                info_date=info_date,
                info_date_column=job.output_table.info_date_column or None,
                processing_timestamp_column=op.processing_timestamp_column,
                transformations=op.transformations,
                filters=op.filters,
                columns=op.columns,
                sanitize_columns=True,
            )
            policy = job.output_table.format.cache_policy or CachePolicy.NO_CACHE
            store.add_table(table_name, info_date, df, policy)
            return store.get_table(table_name, info_date)

    def materialize_range(
        self,
        table_name: str,
        date_from: Optional[_dt.date],
        date_to: Optional[_dt.date],
    ) -> List[DataFrame]:
        """Materialize every date of a closed range (bounded; lazy tables
        are consumed for specific dates, not open scans)."""
        if date_from is None or date_to is None:
            raise ValueError(
                f"Lazy transient table '{table_name}' needs a closed date range "
                f"(got {date_from}..{date_to})"
            )
        if (date_to - date_from).days > 1000:
            raise ValueError(
                f"Refusing to lazily materialize {table_name} over "
                f"{(date_to - date_from).days} days"
            )
        out: List[DataFrame] = []
        d = date_from
        while d <= date_to:
            df = self.materialize(table_name, d)
            if df is not None:
                out.append(df)
            d += _dt.timedelta(days=1)
        return out
