"""Timestamp normalization helpers for Spark 4 TIMESTAMP_NTZ semantics.

Spark 4 (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to true)
reads tz-less parquet timestamps as TIMESTAMP_NTZ, and instant-based
functions (``unix_micros``, ``to_utc_timestamp``) reject NTZ input with
DATATYPE_MISMATCH. The engine's time semantics treat stored wall-clock
values as UTC instants (matching the reference's UTC-normalized timestamp
discipline, core/.../utils/JdbcSparkUtils.scala:236 and README.md:636-638),
so the normalization is: cast NTZ -> TIMESTAMP under a UTC session
timezone.

The cast NTZ->TIMESTAMP interprets the wall-clock value in
``spark.sql.session.timeZone``; these helpers therefore only guarantee
UTC-instant semantics when the session timezone is UTC. ``build_session``
(session.py) pins it; code paths that receive an externally-owned session
(the driver's correctness/bench harness) must call ``pin_utc(spark)`` once
before building plans. On a UTC session the cast is a pure re-tag (no
wall-clock arithmetic), so it is DST-safe and a no-op for values already
typed TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00"}


def pin_utc(spark: SparkSession) -> None:
    """Set the session timezone to UTC iff it is not already a UTC alias.

    Session timezone is a runtime-mutable conf; epoch extraction from
    NTZ-typed columns is only deterministic across hosts once it is pinned.
    """
    if spark.conf.get("spark.sql.session.timeZone") not in _UTC_NAMES:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def ts_instant(col: Column | str) -> Column:
    """Normalize a timestamp-ish column to TIMESTAMP (an instant).

    No-op for TIMESTAMP input; re-tags TIMESTAMP_NTZ wall-clock values in
    the session timezone (pin UTC first — see module docstring); parses
    strings/dates per the usual cast rules.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def unix_micros_utc(col: Column | str) -> Column:
    """``F.unix_micros`` that tolerates TIMESTAMP_NTZ input (Spark 4)."""
    return F.unix_micros(ts_instant(col))
