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
