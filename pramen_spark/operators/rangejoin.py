"""Range (interval) join: match point events to intervals containing them.

Not in the reference (joins are delegated to user code); this is the
time-window containment join training pipelines need (event-in-session,
click-within-attribution-window, sensor-reading-in-maintenance-window).

Scale design: Spark compiles ``l.ts BETWEEN r.start AND r.end`` (plus an
equality key) into a join whose range predicate only filters AFTER the
per-key pairing, so hot keys go quadratic. The bin trick makes the match
an equi-join: intervals explode to the fixed-size time bins they overlap,
points map to exactly one bin, and the join key becomes (by, bin). Each
(point, interval) pair meets in exactly one bin — the point's — so no
dedup pass is needed. Shuffle volume is |points| + |intervals| x
avg_bins_per_interval; pick ``bin_seconds`` near the typical interval
length to keep that factor small.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bin_seconds: int = 3600,
    how: str = "inner",
    point_id_col: Optional[str] = None,
    suffix: str = "_iv",
) -> DataFrame:
    """Join each point row to every interval row (same ``by`` key) with
    start <= point <= end. Interval columns get ``suffix`` on collisions.

    how: 'inner' (matched points only) or 'left' (also keep unmatched
    points with nulls; requires ``point_id_col``, a unique point key, for
    the anti-join that finds them).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if how == "left" and not point_id_col:
        raise ValueError("how='left' requires point_id_col (a unique point key)")
    by = list(by)
    bin_us = int(bin_seconds) * 1_000_000

    from pramen_spark.operators.tsutils import unix_micros_utc

    p_bin = (unix_micros_utc(F.col(point_col)) / bin_us).cast("long")
    pts = points.withColumn("_bin", p_bin)

    s_bin = (unix_micros_utc(F.col(start_col)) / bin_us).cast("long")
    e_bin = (unix_micros_utc(F.col(end_col)) / bin_us).cast("long")
    ivs = intervals.select(
        *by,
        F.explode(F.sequence(s_bin, e_bin)).alias("_bin"),
        F.struct(
            *[F.col(c) for c in intervals.columns if c not in by]
        ).alias("_iv"),
    )

    in_range = (F.col(f"_iv.{start_col}") <= F.col(point_col)) & (
        F.col(point_col) <= F.col(f"_iv.{end_col}")
    )
    matched = pts.join(ivs, [*by, "_bin"], "inner").filter(in_range)

    iv_cols = [c for c in intervals.columns if c not in by]
    out_cols = [F.col(c) for c in points.columns]
    out_cols += [
        F.col(f"_iv.{c}").alias(c + suffix if c in points.columns else c)
        for c in iv_cols
    ]
    result = matched.select(*out_cols)
    if how == "left":
        unmatched = points.join(
            matched.select(point_id_col).distinct(), point_id_col, "left_anti"
        )
        for c in iv_cols:
            name = c + suffix if c in points.columns else c
            dtype = intervals.schema[c].dataType
            unmatched = unmatched.withColumn(name, F.lit(None).cast(dtype))
        result = result.unionByName(unmatched)
    return result
