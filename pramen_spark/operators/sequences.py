"""Event-sequence mining: Markov transition matrices over ordered
per-entity event streams.

The sequence-level sibling of sessionization (streaming/stream.py::
sessionize_batch) and the funnel (queries/catalog.py::q_funnel_events):
instead of asking "did the user pass these stages in order", the
transition matrix asks "from each state, where do users go next, with
what probability" — the summary that feeds churn paths, UI-flow audits,
and next-event baselines.

Plan shape: ONE window (partitioned by the entity key, ordered by the
event time with a unique id tiebreak so the lag assignment is
deterministic) produces (state, next_state) pairs, then one
map-side-combined aggregation counts them; the per-source normalization
is a window over the (tiny) distinct-state-pairs result, not the raw
events. Two shuffles total on the raw data — the window's hash
partitioning by entity and the pair count — both keyed on
high-cardinality columns, no skew beyond the entity key's own.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Count (src, dst) adjacent-state transitions per entity and
    normalize per src: returns (src, dst, n_transitions, prob).

    ``order_cols`` must make the per-entity ordering total (include a
    unique id as tiebreak); the final state of each entity has no
    successor and contributes no pair.
    """
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    total = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n_transitions",
        (F.col("n_transitions") / F.sum("n_transitions").over(total)).alias(
            "prob"
        ),
    )
