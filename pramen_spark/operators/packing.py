"""Sequence packing: assign documents to fixed-token-budget packs
(training batches) with minimal padding waste.

A 100 TB-scale formulation of the greedy first-fit-decreasing packer:
global optimal packing needs a total order over all documents (one
machine); instead documents are hash-distributed into independent
shards and packed per shard with FFD. Waste vs global FFD is negligible
when each shard holds >> budget/avg_len documents, and the job is
embarrassingly parallel — one shuffle (the hash repartition), one
applyInPandas pass, no driver involvement.

Determinism: shard assignment is a pure hash of the id, order within a
shard is (token_count desc, id), so pack ids are stable across runs and
cluster sizes for a fixed ``num_shards``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_count_col: Optional[str] = None,
    text_col: str = "text",
    num_shards: int = 32,
) -> DataFrame:
    """Assign each document to a pack: returns (id, n_tokens, pack_id,
    truncated). Documents longer than ``budget`` get a single-document
    pack with ``truncated = true`` (the trainer decides split/drop).

    pack_id = "<shard>:<seq>" — stable for a fixed num_shards."""
    import pandas as pd

    if token_count_col is None:
        df = with_token_counts(df, text_col)
        token_count_col = "n_tokens"
    slim = df.select(
        F.col(id_col).alias("id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).alias("shard"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        bins: list[int] = []  # remaining capacity per bin
        assignment: list[int] = []
        truncated: list[bool] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                bins.append(0)  # oversized doc: its own full pack
                assignment.append(len(bins) - 1)
                truncated.append(True)
                continue
            # first-fit over open bins (counts are sorted desc -> FFD)
            for i, cap in enumerate(bins):
                if cap >= n:
                    bins[i] = cap - n
                    assignment.append(i)
                    break
            else:
                bins.append(budget - n)
                assignment.append(len(bins) - 1)
            truncated.append(False)
        pdf = pdf.assign(
            pack_id=[f"{shard}:{a}" for a in assignment], truncated=truncated
        )
        return pdf[["id", "n_tokens", "pack_id", "truncated"]]

    return slim.groupBy("shard").applyInPandas(
        pack_shard, "id long, n_tokens long, pack_id string, truncated boolean"
    ).withColumnRenamed("id", id_col)


def pack_stats(assignments: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization: (pack_id, n_docs, tokens, fill_ratio)."""
    return assignments.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("fill_ratio"),
    )
