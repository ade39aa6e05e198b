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


def pack_invariants(
    assignments: DataFrame, budget: int, id_col: str = "doc_id"
) -> DataFrame:
    """Audit an FFD packing: one (invariant, val) row per check.

    FFD bin assignment is procedural (iterative first-fit), so its output
    can't be reproduced in SQL — but its *correctness* can be stated as
    exact properties any valid packing must satisfy:

    - ``docs_packed`` / ``tokens_packed`` / ``oversize_docs`` — accounting
      totals, independently computable from the input corpus.
    - ``duplicate_doc_assignments`` = 0 — every document in exactly one pack.
    - ``overfull_packs`` = 0 — no non-truncated pack exceeds the budget.
    - ``truncated_pack_extra_docs`` = 0 — an oversized document is alone
      in its pack.
    - ``packs_below_lower_bound`` = 0 — pack count >= the information-
      theoretic floor ceil(non_oversize_tokens / budget) + oversize_docs
      (holds for any sharding: each regular pack carries <= budget tokens,
      each oversized doc occupies its own pack).
    - ``packs_above_upper_bound`` = 0 — pack count <= one pack per doc.

    Everything reduces to two single-row aggregates (docs, packs) joined
    by broadcast — no large shuffle, scale-independent output size.
    """
    doc_agg = assignments.agg(
        F.count(F.lit(1)).cast("long").alias("docs_packed"),
        F.sum("n_tokens").cast("long").alias("tokens_packed"),
        F.sum(F.col("truncated").cast("long")).alias("oversize_docs"),
        F.sum(
            F.when(F.col("truncated"), F.col("n_tokens")).otherwise(F.lit(0))
        ).cast("long").alias("oversize_tokens"),
        (F.count(F.lit(1)) - F.countDistinct(F.col(id_col)))
        .cast("long").alias("duplicate_doc_assignments"),
    )
    pack_agg = (
        assignments.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.max(F.col("truncated").cast("int")).alias("has_truncated"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum(
                F.when(
                    (F.col("has_truncated") == 0) & (F.col("tokens") > budget),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("long").alias("overfull_packs"),
            F.sum(
                F.when(F.col("has_truncated") == 1, F.col("n_docs") - 1)
                .otherwise(F.lit(0))
            ).cast("long").alias("truncated_pack_extra_docs"),
        )
    )
    one = doc_agg.crossJoin(F.broadcast(pack_agg))
    lower_bound = (
        F.ceil(
            (F.col("tokens_packed") - F.col("oversize_tokens"))
            / F.lit(float(budget))
        ).cast("long")
        + F.col("oversize_docs")
    )
    one = one.withColumn(
        "packs_below_lower_bound",
        F.when(F.col("n_packs") < lower_bound, F.lit(1)).otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "packs_above_upper_bound",
        F.when(F.col("n_packs") > F.col("docs_packed"), F.lit(1))
        .otherwise(F.lit(0)).cast("long"),
    )
    return one.selectExpr(
        "stack(8, "
        "'docs_packed', docs_packed, "
        "'tokens_packed', tokens_packed, "
        "'oversize_docs', oversize_docs, "
        "'duplicate_doc_assignments', duplicate_doc_assignments, "
        "'overfull_packs', overfull_packs, "
        "'truncated_pack_extra_docs', truncated_pack_extra_docs, "
        "'packs_below_lower_bound', packs_below_lower_bound, "
        "'packs_above_upper_bound', packs_above_upper_bound"
        ") AS (invariant, val)"
    )
