"""Count-min sketch: a fixed-size mergeable frequency summary for
streams/corpora whose key cardinality dwarfs memory (the heavy-hitter
first-pass `heavy_hitter_tokens`' docstring promises).

The sketch is depth x width counters; each key increments one counter
per row (``xxhash64(key, row) % width``), and a key's estimate is the
MIN over its depth counters — an OVERESTIMATE by construction (never
under), within ``e * N / width`` with probability ``1 - e^-depth``.

Spark-first shape: the sketch IS a (depth*width)-row DataFrame built by
one exploded map-side-combined aggregation — mergeable across batches
by summing matching cells (the same algebra `merge_agg_state` uses), so
incremental maintenance is a union + re-aggregate of KB-scale tables.
No driver state, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Aggregate rows into the (row_i, col, n) counter table.

    One explode (depth rows per input row) + one map-side-combined
    aggregation; output is at most depth*width rows regardless of input
    size. Counts weight each ROW once — pre-aggregate first to sketch
    distinct keys or weighted frequencies.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.row_i", "cell.col").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: (key, est).

    The probe re-derives each key's depth cells (the build expressions,
    so agreement is by construction), joins the KB-scale sketch
    broadcast, and takes the MIN across depth — a missing cell means
    count 0. ``width``/``depth`` must match the build.
    """
    probes = keys.select(F.col(key_col)).distinct()
    cells = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.row_i", "cell.col")
    hit = cells.join(F.broadcast(sketch), ["row_i", "col"], "left").select(
        key_col, F.coalesce("n", F.lit(0)).alias("n")
    )
    return hit.groupBy(key_col).agg(F.min("n").cast("long").alias("est"))


def cms_error_bound(n_rows: int, width: int = 1024) -> float:
    """The classic CMS overestimate envelope: ``e * N / width``."""
    return math.e * n_rows / float(width)


# ---------------------------------------------------------------------------
# DDSketch: mergeable RELATIVE-accuracy quantile sketch (Masson, Rim, Lee,
# "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
# Guarantees", VLDB 2019). The log-domain sibling of the count-min sketch
# above and the third member of the engine's mergeable-summary family
# (counts: CMS, distincts: HLL state in cdc.py, quantiles: here).
# ---------------------------------------------------------------------------


def _dd_gamma(relative_accuracy: float) -> float:
    if not (0.0 < relative_accuracy < 1.0):
        raise ValueError(f"relative_accuracy must be in (0,1), got {relative_accuracy}")
    return (1.0 + relative_accuracy) / (1.0 - relative_accuracy)


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    relative_accuracy: float = 0.01,
    group_cols=(),
) -> DataFrame:
    """Aggregate POSITIVE values into gamma-log buckets: bucket =
    ceil(ln(x) / ln(gamma)) with gamma = (1+a)/(1-a), so every value in
    bucket b lies within relative error ``a`` of the bucket midpoint
    2*gamma^b/(gamma+1). Returns (group..., bucket, n) — a KB-scale
    counter table (bucket count grows with the LOG of the value range:
    a=0.01 spans 1e-9..1e9 in ~2100 buckets), NOT with data volume.

    Non-positive values are excluded by construction (the log domain);
    shift or sign-split first if they matter. ln(gamma) is embedded as
    one double literal so both engines divide by the identical constant;
    a value landing within an ulp of an exact bucket boundary is the
    documented FP caveat class (same as the cosine-threshold one).

    Scale/mergeability: ONE map-side-combined aggregation; sketches from
    different days/partitions/streams merge by summing matching buckets
    (:func:`ddsketch_merge`) — build-on-union == merge-of-builds exactly,
    the persist-and-fold contract of `merge_agg_state`."""
    import math as _m

    gamma = _dd_gamma(relative_accuracy)
    groups = list(group_cols)
    v = F.col(value_col).cast("double")
    bucket = F.ceil(F.ln(v) / F.lit(_m.log(gamma))).cast("long")
    return (
        df.where(v > 0)
        .select(*groups, bucket.alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def ddsketch_merge(*sketches: DataFrame, group_cols=()) -> DataFrame:
    """Sum matching buckets across sketches — the full merge (no error
    growth, unlike quantile-digest midpoints): union + one aggregation
    of KB-scale counter tables."""
    groups = list(group_cols)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def ddsketch_quantile(
    sketch: DataFrame,
    relative_accuracy: float = 0.01,
    qs=(0.5, 0.9, 0.99),
    group_cols=(),
) -> DataFrame:
    """Quantile estimates from the bucket table: for each q, the first
    bucket (in bucket order) whose cumulative count reaches
    1 + floor(q * (n_total - 1)), reported as the bucket midpoint
    2*gamma^b/(gamma+1) — guaranteed within ``relative_accuracy`` of the
    true quantile VALUE (relative error, which rank-based mergeable
    summaries like approx_percentile cannot promise).

    Returns (group..., q, estimate) rounded to 6.

    Scale: the cumulative walk is a window over the SKETCH DOMAIN
    (hundreds of buckets per group — log of the value range), never the
    data; a deliberate bounded single-partition stage when ungrouped."""
    from pyspark.sql import Window

    gamma = _dd_gamma(relative_accuracy)
    groups = list(group_cols)
    w = (
        Window.partitionBy(*groups).orderBy("bucket")
        if groups
        else Window.orderBy("bucket")
    )
    wall = Window.partitionBy(*groups) if groups else Window.partitionBy()
    cum = sketch.select(
        *groups,
        "bucket",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(wall).alias("_total"),
    )
    per_q = []
    for q in qs:
        rank = F.lit(1) + F.floor(F.lit(float(q)) * (F.col("_total") - 1).cast("double"))
        est_bucket = F.min(F.when(F.col("_cum") >= rank, F.col("bucket")))
        per_q.append(
            cum.groupBy(*groups).agg(
                F.lit(float(q)).alias("q"),
                F.round(
                    F.lit(2.0)
                    * F.pow(F.lit(gamma), est_bucket.cast("double"))
                    / F.lit(gamma + 1.0),
                    6,
                ).alias("estimate"),
            )
        )
    out = per_q[0]
    for p in per_q[1:]:
        out = out.unionByName(p)
    return out
