"""Bloom-filter join pruning: shrink a huge fact-side shuffle with a
fixed-size bitmap built from the dimension keys.

This is Spark's runtime row-level bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected only
inside one query) made EXPLICIT and reusable across stages, queries and
pipeline runs: build the bitmap once from the dim side, persist or
broadcast it, and prune the fact scan BEFORE its join exchange. The
memory envelope is the point — a broadcast hash join holds O(|dim|)
rows per executor, while the bloom bitmap is a constant ``m_bits/8``
bytes (16 KiB at the default) no matter how large the dim grows; the
dim then joins normally (shuffle or broadcast) against the already
pruned fact, and the join itself removes the bloom's false positives,
so results are EXACTLY equal to the unpruned join.

Everything stays JVM-side: the k probe hashes are ``xxhash64(key, i)``
column expressions, the bitmap is a constant array<long> literal probed
with ``element_at`` + bit math inside whole-stage codegen — no UDF, no
Python in the per-row path.

Reference parity: pramen prunes source reads with pushed-down date
predicates (core/.../sql/SqlGeneratorBase.scala getDataQuery); this is
the same read-less-before-the-join idea for join keys at lake scale.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_M_BITS = 1 << 17  # 16 KiB bitmap
_DEFAULT_HASHES = 3


def _positions(key: Column, m_bits: int, num_hashes: int) -> List[Column]:
    """The k bloom positions for a key, as JVM column expressions.

    ``xxhash64(key, i)`` with a distinct literal second argument yields
    independent 64-bit hashes; ``pmod`` folds them onto the bitmap. The
    SAME expression builds and probes, so build/probe agreement is by
    construction (the key columns must have equal types on both sides —
    xxhash64 of int 5 and bigint 5 differ).
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(num_hashes)
    ]


def bloom_bitmap(
    df: DataFrame, key: str, m_bits: int = _DEFAULT_M_BITS,
    num_hashes: int = _DEFAULT_HASHES,
) -> List[int]:
    """Build the bitmap from the dim side as ``m_bits // 64`` longs.

    Distributed build: each key row emits its k bit positions, the
    positions aggregate map-side into per-word OR masks (``bit_or``), and
    only the NON-ZERO words reach the driver — at most ``m_bits / 64``
    rows (2048 at the default) regardless of dim cardinality. This is a
    control-plane collect bounded by the bitmap size, not by the data.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64: {m_bits}")
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, num_hashes))).alias("pos")
    )
    # the SQL shiftleft accepts a column shift amount; the Python wrapper
    # F.shiftleft only takes a literal int, hence call_function
    words = (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[int(r["word_idx"])] = int(r["word"])
    return bitmap


def bloom_prune(
    df: DataFrame, key: str, bitmap: Sequence[int],
    num_hashes: int = _DEFAULT_HASHES,
) -> DataFrame:
    """Keep only rows whose key MAY be in the bloom (all k bits set).

    The bitmap rides along as a constant array<long> literal; each probe
    is ``element_at`` + shift + AND — pure codegen, evaluated against a
    constant, no join and no broadcast variable plumbing. False
    positives pass (rate ``(1 - e^{-kn/m})^k``); true keys always pass.
    """
    m_bits = len(bitmap) * 64
    # ONE parsed SQL array literal: F.lit(python_list) marshals the
    # bitmap element-by-element over py4j (~0.9 s of driver latency for
    # the default 2048 words, measured r15); the SQL string parses
    # JVM-side in milliseconds and constant-folds to the same array
    arr = F.expr("array(%s)" % ",".join(f"{int(w)}L" for w in bitmap))
    cond = F.lit(True)
    for pos in _positions(F.col(key), m_bits, num_hashes):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftright", word, pos.bitwiseAND(F.lit(63)).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == F.lit(1))
    return df.where(cond)


def false_positive_rate(n_keys: int, m_bits: int = _DEFAULT_M_BITS,
                        num_hashes: int = _DEFAULT_HASHES) -> float:
    """Expected FP rate for sizing: ``(1 - e^{-kn/m})^k``."""
    return (1.0 - math.exp(-num_hashes * n_keys / float(m_bits))) ** num_hashes


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = _DEFAULT_M_BITS,
    num_hashes: int = _DEFAULT_HASHES,
    how: str = "inner",
) -> DataFrame:
    """Inner/semi join with the fact side bloom-pruned first.

    Exactly equal to ``fact.join(dim, fact_key == dim_key, how)``: the
    bloom only REMOVES fact rows that cannot match, and the join removes
    the bloom's false positives. The win at 100 TB: the fact-side join
    exchange shuffles only surviving rows (selective dims prune >99%),
    and unlike a broadcast join the driver/executor memory cost is the
    constant bitmap, not the dim.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom pruning only preserves inner/semi join semantics: {how}"
        )
    bitmap = bloom_bitmap(dim, dim_key, m_bits=m_bits, num_hashes=num_hashes)
    pruned = bloom_prune(fact, fact_key, bitmap, num_hashes=num_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
