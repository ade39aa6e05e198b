"""Offset ledger for incremental (exactly-once-ish) processing.

Protocol (reference core/.../bookkeeper/OffsetManager.scala:36-91):

1. ``start_write(table, info_date, batch_id)`` opens an uncommitted
   transaction *before* any data is written.
2. After the write succeeds and min/max offsets of the written slice are
   known, ``commit(transaction, min, max)`` finalizes it.
3. On failure, ``rollback(transaction)`` removes it.
4. A later run finding uncommitted transactions must delete the orphan
   rows of that batch id from storage, then roll the transaction back
   (core/.../pipeline/IncrementalIngestionJob.scala:242-297) — see
   ``get_uncommitted``.

Offset types and their normalized string encodings follow
api/.../offset/OffsetType.scala:23-59 (datetime = epoch millis).
The backend is a JSON-lines file; the interface maps 1:1 onto a Delta
table for cluster deployments.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import threading
import time
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional, Tuple

from pramen_spark.sql.generators import OffsetType, OffsetValue


def encode_offset(v: OffsetValue) -> str:
    if v.type == OffsetType.DATETIME:
        ts: _dt.datetime = v.value  # type: ignore[assignment]
        millis = int(ts.timestamp() * 1000)
        return str(millis)
    return str(v.value)


def decode_offset(offset_type: OffsetType, s: str) -> OffsetValue:
    if offset_type == OffsetType.DATETIME:
        return OffsetValue.datetime(
            _dt.datetime.fromtimestamp(int(s) / 1000.0, tz=_dt.timezone.utc)
        )
    if offset_type == OffsetType.INTEGRAL:
        return OffsetValue.integral(int(s))
    return OffsetValue.string(s)


@dataclass
class OffsetRecord:
    table_name: str
    info_date: str
    offset_type: str
    batch_id: int
    created_at: float
    committed_at: Optional[float] = None
    min_offset: Optional[str] = None
    max_offset: Optional[str] = None

    @property
    def is_committed(self) -> bool:
        return self.committed_at is not None


@dataclass(frozen=True)
class OffsetTransaction:
    table_name: str
    info_date: str
    batch_id: int


class OffsetLedger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._records: List[OffsetRecord] = []
        self._lock = threading.Lock()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            if os.path.exists(path):
                self._replay()

    def _replay(self) -> None:
        events: List[dict] = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    events.append(json.loads(line))
        self._records = _fold_events(events)

    def _append(self, op: str, rec: dict) -> None:
        if self.path:
            rec = dict(rec)
            rec["op"] = op
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    # --- protocol ---

    def start_write(
        self, table: str, info_date: _dt.date, batch_id: int, offset_type: OffsetType
    ) -> OffsetTransaction:
        rec = OffsetRecord(
            table_name=table,
            info_date=info_date.isoformat(),
            offset_type=offset_type.value,
            batch_id=batch_id,
            created_at=time.time(),
        )
        with self._lock:
            # a re-start of a never-finished tx supersedes the stale open
            # record: two open records for one key would double-repair
            self._records = [
                r
                for r in self._records
                if not (
                    r.table_name == table
                    and r.info_date == rec.info_date
                    and r.batch_id == batch_id
                    and not r.is_committed
                )
            ]
            self._records.append(rec)
            self._append("start", asdict(rec))
        return OffsetTransaction(table, info_date.isoformat(), batch_id)

    def _find(self, tx: OffsetTransaction) -> OffsetRecord:
        """The OPEN (uncommitted) record of this transaction key. A committed
        record is final — commit/rollback must never touch it, even when a
        later transaction reuses the same (table, date, batch) key."""
        found = None
        for rec in self._records:
            if (
                rec.table_name == tx.table_name
                and rec.info_date == tx.info_date
                and rec.batch_id == tx.batch_id
                and not rec.is_committed
            ):
                found = rec  # newest open record with the key wins
        if found is None:
            raise KeyError(f"No open offset transaction for {tx}")
        return found

    def commit(self, tx: OffsetTransaction, min_offset: OffsetValue, max_offset: OffsetValue) -> None:
        with self._lock:
            rec = self._find(tx)
            rec.committed_at = time.time()
            rec.min_offset = encode_offset(min_offset)
            rec.max_offset = encode_offset(max_offset)
            self._append(
                "commit",
                {
                    "table_name": rec.table_name,
                    "info_date": rec.info_date,
                    "batch_id": rec.batch_id,
                    "committed_at": rec.committed_at,
                    "min_offset": rec.min_offset,
                    "max_offset": rec.max_offset,
                },
            )

    def rollback(self, tx: OffsetTransaction) -> None:
        with self._lock:
            rec = self._find(tx)
            self._records.remove(rec)
            self._append(
                "rollback",
                {"table_name": rec.table_name, "info_date": rec.info_date, "batch_id": rec.batch_id},
            )

    # --- queries ---

    def get_offsets(self, table: str, info_date: Optional[_dt.date] = None) -> List[OffsetRecord]:
        return [
            r
            for r in self._records
            if r.table_name == table
            and (info_date is None or r.info_date == info_date.isoformat())
        ]

    def get_uncommitted(self, table: str) -> List[OffsetRecord]:
        """Orphan transactions from crashed runs; callers must delete the
        matching batch rows from storage before rolling these back."""
        return [r for r in self._records if r.table_name == table and not r.is_committed]

    def get_max_info_date_and_offset(
        self, table: str, only_for_info_date: Optional[_dt.date] = None
    ) -> Optional[Tuple[_dt.date, OffsetValue, OffsetValue]]:
        """(max info date, min offset, max offset over that date's committed
        transactions)."""
        committed = [
            r
            for r in self.get_offsets(table, only_for_info_date)
            if r.is_committed
        ]
        if not committed:
            return None
        max_date = max(r.info_date for r in committed)
        todays = [r for r in committed if r.info_date == max_date]
        offset_type = OffsetType(todays[0].offset_type)
        decoded_min = min(
            (decode_offset(offset_type, r.min_offset) for r in todays), key=_offset_sort_key
        )
        decoded_max = max(
            (decode_offset(offset_type, r.max_offset) for r in todays), key=_offset_sort_key
        )
        return (_dt.date.fromisoformat(max_date), decoded_min, decoded_max)


def _offset_sort_key(v: OffsetValue):
    return v.value


def _fold_events(events: List[dict]) -> List[OffsetRecord]:
    """Fold an ordered stream of start/commit/rollback events into the
    current set of offset records (shared by the JSONL and Spark backends).

    Commit and rollback apply to the newest OPEN record of their key; a
    committed record is final and survives later events that reuse the
    same (table, date, batch) key — mirroring the in-memory ``_find``."""
    records: List[OffsetRecord] = []

    def newest_open(key: Tuple[str, str, int]) -> Optional[OffsetRecord]:
        found = None
        for r in records:
            if (r.table_name, r.info_date, r.batch_id) == key and not r.is_committed:
                found = r
        return found

    for rec in events:
        op = rec.get("op")
        key = (rec["table_name"], rec["info_date"], rec["batch_id"])
        if op == "start":
            stale = newest_open(key)
            if stale is not None:  # re-start of a never-finished tx
                records.remove(stale)
            records.append(
                OffsetRecord(
                    table_name=rec["table_name"],
                    info_date=rec["info_date"],
                    offset_type=rec["offset_type"],
                    batch_id=rec["batch_id"],
                    created_at=rec["created_at"],
                )
            )
        elif op == "commit":
            target = newest_open(key)
            if target is not None:
                target.committed_at = rec["committed_at"]
                target.min_offset = rec["min_offset"]
                target.max_offset = rec["max_offset"]
        elif op == "rollback":
            target = newest_open(key)
            if target is not None:
                records.remove(target)
    return records
