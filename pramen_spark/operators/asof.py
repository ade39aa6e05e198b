"""As-of join: for each left row, the most recent right row at or before
(backward) / the earliest at or after (forward) its timestamp, per key.

Not in the reference (Pramen delegates joins to user transformer code);
this is a training-data-pipeline operator (point-in-time feature joins)
the DataFrame API lacks as a built-in.

Scale design (the reason this is NOT a range join): a naive
``left.join(right, keys & (l.ts >= r.ts))`` + row_number explodes to
O(|left| x |right per key|) before filtering — quadratic in hot keys. The
union-window formulation below is linear: tag both sides, union, and run
one window pass ordered by (ts, side) per key; each left row picks up the
running "last right payload seen". One shuffle on the key, no candidate
blow-up, AQE-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    suffix: str = "_right",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join. Right payload columns (everything except ``on`` and
    ``by``) appear with ``suffix`` appended on name collisions; the right
    match time is always included as ``{on}{suffix}``. Unmatched left rows
    keep nulls (left-join semantics).

    direction: 'backward' (right.ts <= left.ts, most recent) or
    'forward' (right.ts >= left.ts, earliest).
    """
    from pyspark.sql import Window as W

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    payload_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    out_names[on] = on + suffix

    # pack the right payload into ONE struct so all matched columns come
    # from the same right row (independent last() calls would mix rows)
    r_tagged = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(F.col(on).alias(on), *[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    l_tagged = left.select(
        "*",
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_payload"].dataType).alias("_payload"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # right rows order before left rows at equal ts -> ties match
        w = (
            W.partitionBy(*by)
            .orderBy(F.asc("_t"), F.asc("_side"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        w = (
            W.partitionBy(*by)
            .orderBy(F.desc("_t"), F.asc("_side"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    matched = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        from pramen_spark.operators.tsutils import unix_micros_utc

        diff = F.abs(
            unix_micros_utc(F.col("_t")) - unix_micros_utc(F.col(f"_match.{on}"))
        )
        out = out.withColumn(
            "_match",
            F.when(diff <= int(tolerance_seconds * 1_000_000), F.col("_match")),
        )
    selected = [F.col(c) for c in left.columns]
    selected.append(F.col(f"_match.{on}").alias(out_names[on]))
    selected += [F.col(f"_match.{c}").alias(out_names[c]) for c in payload_cols]
    return out.select(*selected)
