"""Robust anomaly detection over grouped series (median / MAD).

The monitoring counterpart to the trend fit (queries/catalog.py::
q_trend_slope_daily) and the PSI drift check (operators/drift.py): given
per-key observations, flag the points whose deviation from the key's
median exceeds ``threshold`` robust standard deviations, where the robust
sigma is 1.4826 * MAD (the normal-consistency constant). Mean/stddev
z-scores break exactly when they matter — a single huge spike inflates
the stddev and masks itself — while median and MAD have a 50% breakdown
point, which is why the reference-style operational checks (pramen's
"insufficient data" / record-count guards, MetastoreImpl.scala record
stats) grow into MAD gates in practice.

Plan shape: two aggregations over the (already small) per-key series —
one for the median, one for the MAD after a broadcast-size join of the
medians — then a final join to flag rows. All medians are EXACT
(``percentile``, interpolating, matching DuckDB's ``median`` /
``quantile_cont``), which is oracle-checkable; at 100 TB the *input* to
this operator is already an aggregate (one row per key per bucket, e.g.
days x event types), so the exact sort-based percentile is over a
bounded set, not the raw corpus. If the keyed series itself is huge,
swap ``F.percentile`` for ``F.percentile_approx`` — same plan shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale factor making MAD a consistent estimator of sigma under normality
MAD_SIGMA = 1.4826


def mad_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Flag rows whose ``value_col`` deviates from its key-group median by
    more than ``threshold`` robust sigmas; returns the input columns plus
    ``median_value``, ``mad``, ``robust_z`` and ``is_anomaly``.

    robust_z is 0 when MAD is 0 and the value equals the median; when MAD
    is 0 and the value differs (a constant series with one outlier) the
    z-score is +infinity conceptually — represented here by flagging the
    row and reporting a NULL robust_z, so downstream arithmetic never
    meets an infinity.
    """
    keys = [F.col(k) for k in key_cols]
    med = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("median_value")
    )
    with_med = df.join(med, on=list(key_cols))
    dev = F.abs(F.col(value_col) - F.col("median_value"))
    mad = (
        with_med.groupBy(*keys)
        .agg(F.percentile(dev, F.lit(0.5)).alias("mad"))
    )
    scored = with_med.join(mad, on=list(key_cols))
    sigma = F.col("mad") * F.lit(MAD_SIGMA)
    z = dev / sigma
    return scored.select(
        *[F.col(c) for c in df.columns],
        "median_value",
        "mad",
        F.when(sigma > 0, z)
        .when(dev == 0, F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("robust_z"),
        F.when(sigma > 0, z > threshold)
        .otherwise(dev > 0)
        .alias("is_anomaly"),
    )
