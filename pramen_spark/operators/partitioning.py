"""Partitioning helpers for operators whose first stage AMPLIFIES data
(shingling, char-bigram explosion: one input row fans out to hundreds of
rows). Downstream parallelism of such a stage is inherited from the
INPUT's partitioning — a narrow corpus read as a few parquet splits would
run the amplifying stage nearly single-threaded regardless of cluster
size.

``spread_input`` repartitions the narrow input by its key ONLY when the
input has fewer partitions than the session's default parallelism: the
pre-spread shuffle moves the narrow rows (cheap — the amplification has
not happened yet), and at real scale (100 TB = tens of thousands of file
splits) the condition is false and the call is a no-op, so the helper
never adds a shuffle to a well-partitioned pipeline.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def spread_input(
    df: DataFrame, key_col: str, min_partitions: Optional[int] = None
) -> DataFrame:
    """Repartition ``df`` by ``key_col`` to the session default parallelism
    iff its current partition count is lower; no-op otherwise.

    FP note: spreading changes which partial aggregates merge in which
    order, so downstream double sums can move by an ulp — only compose
    with outputs that round (the catalog's double columns all do) or that
    are integer/hash-typed."""
    target = min_partitions
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key_col)
