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

    # Partition COUNT alone is a misleading signal for raw file scans:
    # Spark happily cuts a small parquet file into `target` byte-range
    # splits (openCostInBytes), but parquet assigns each ROW GROUP to the
    # one split holding its midpoint — a single-row-group file yields 31
    # empty partitions and one partition carrying every row, and the
    # count check sails past it. So for parquet-backed inputs with fewer
    # FILES than target (the only case where this is possible — K row
    # groups bound non-empty partitions by K), read the footers (driver
    # metadata, bounded by len(files) < target) and spread when the row
    # groups cannot feed `target` partitions. At real scale the file
    # count alone short-circuits this to a no-op before any footer read.
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plans fall back below
        files = None
    if files and len(files) < target and all(
        f.split("?", 1)[0].endswith((".parquet", ".parq")) for f in files
    ):
        try:
            import pyarrow.parquet as pq

            row_groups = 0
            for f in files:
                path = f[7:] if f.startswith("file://") else (
                    f[5:] if f.startswith("file:") else f
                )
                row_groups += pq.ParquetFile(path).metadata.num_row_groups
                if row_groups >= target:
                    break
            if row_groups < target:
                return df.repartition(target, key_col)
        except Exception:  # noqa: BLE001 — unreadable footers: count check
            pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key_col)


def zorder_key(
    df: "DataFrame",
    col_x: str,
    col_y: str,
    bits: int = 10,
):
    """Z-order (Morton) interleaved key over two integer dimensions:
    bit i of x lands at output bit 2i, bit i of y at 2i+1, so sorting by
    the key clusters rows that are close in BOTH dimensions — the
    locality transform behind Delta/Iceberg Z-ORDER table maintenance.
    Adds ``zkey``. Inputs must already be in [0, 2^bits); scale/bucket
    them first (the catalog query mods its keys down).

    Scale rationale: min/max column statistics prune file scans only if
    value ranges are NARROW per file; sorting by one column leaves the
    other scattered everywhere, while Z-order bounds the per-file range
    of BOTH — two-column predicates then skip most files. The key is a
    pure codegen'd bit expression (a sum of shifted bit tests — no UDF,
    no shuffle); pair with :func:`repartition_by_zorder` to materialize
    the clustered layout."""
    from pyspark.sql import functions as F

    x, y = F.col(col_x).cast("long"), F.col(col_y).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return df.withColumn("zkey", z.cast("long"))


def repartition_by_zorder(
    df: "DataFrame",
    col_x: str,
    col_y: str,
    bits: int = 10,
    num_partitions: Optional[int] = None,
):
    """Range-repartition by the Z-order key: each output partition (and
    thus each written file) covers a contiguous Morton range = a compact
     2-D tile, giving every file narrow min/max on BOTH dimensions. This
    is the write-side half of Z-ORDER maintenance; plan shows
    RangePartitioning(zkey) (asserted in tests)."""
    keyed = zorder_key(df, col_x, col_y, bits)
    from pyspark.sql import functions as F

    if num_partitions is None:
        return keyed.repartitionByRange(F.col("zkey"))
    return keyed.repartitionByRange(num_partitions, F.col("zkey"))
