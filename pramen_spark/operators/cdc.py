"""Change-data-capture and warehouse-maintenance operators: latest-wins
upsert/delete merge, SCD Type 2 history construction, and incremental
aggregate maintenance.

The reference engine exists to orchestrate exactly these incremental
pipelines (SURVEY §2.6-2.7: offset-tracked incremental ingestion into
date-partitioned metastore tables); these operators are the
transformation-side counterparts a warehouse team runs inside such a
pipeline. Reference parity: pramen's incremental jobs deliver the change
batches (core/.../OffsetManager, IncrementalIngestionJob); applying them
is left to user transformers — here the standard appliers ship with the
engine, Spark-first.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins CDC merge: apply a change batch (upserts + deletes) to
    a snapshot, producing the next snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` (any value;
    rows whose op equals ``delete_op`` are deletes) and ``seq_col``, a
    per-key monotonically increasing sequence (log offset, LSN, commit
    timestamp). For each key only the HIGHEST-sequence change applies:
    a delete removes the key, anything else replaces the row. Keys
    untouched by the batch pass through. (``seq_col`` must be unique per
    key — equal sequences for one key make "latest" undefined; ties break
    on the op column only to keep the output deterministic.)

    Scale (100 TB): the change batch is ranked per key in one shuffle
    (window on key, carrying only batch rows — batches are small relative
    to the snapshot), and the snapshot is touched by exactly one
    hash-partitioned LEFT ANTI join on the key columns (AQE broadcasts
    the distinct-key set when the batch is small, the common case). The
    snapshot is never windowed or re-sorted; the union appends the
    surviving upserts. Chained batches = chained calls, each paying only
    O(snapshot scan + batch)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col(op_col) != delete_op).drop(op_col, seq_col)
    touched = latest.select(*keys)
    kept = snapshot.join(touched, keys, "left_anti")
    return kept.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    date_col: str,
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Build a Slowly-Changing-Dimension Type 2 history from a change log:
    one row per (key, version) with ``effective_from`` / ``effective_to``
    / ``is_current``, where a new version opens only when the tracked
    attributes actually CHANGE (consecutive identical observations
    collapse into one version).

    ``tiebreak_cols`` makes the per-key ordering total when several
    change rows share a date (required for determinism — pass the source
    primary key). ``effective_to`` is the next version's start (half-open
    intervals, the warehouse convention); the last version has NULL and
    ``is_current = true``.

    Scale (100 TB): both window passes (change detection via lag, then
    interval closing via lead over the surviving versions) partition by
    the SAME key columns — one exchange, two in-partition sorts; nothing
    but key, attrs, and dates ever moves. This is the standard dimension
    build: run it over the full change log on backfill; fold later
    batches with :func:`scd2_merge` (O(batch) per fold, chained ==
    one-shot, fuzz-asserted)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    ties = list(tiebreak_cols or [])
    order = [F.col(date_col)] + [F.col(c) for c in ties]
    w = Window.partitionBy(*keys).orderBy(*order)
    attr_struct = F.struct(*[F.col(a) for a in attrs])
    # tiebreak cols ride along: the second window sorts by them too
    with_prev = changes.select(
        *keys,
        *attrs,
        F.col(date_col),
        *ties,
        F.lag(attr_struct).over(w).alias("_prev"),
    )
    # a version opens at the first observation and whenever any attribute
    # differs from the previous observation (null-safe compare)
    changed = with_prev.filter(
        F.col("_prev").isNull() | ~attr_struct.eqNullSafe(F.col("_prev"))
    ).drop("_prev")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return changed.select(
        *keys,
        *attrs,
        F.col(date_col).alias("effective_from"),
        F.lead(date_col).over(w2).alias("effective_to"),
        F.lead(date_col).over(w2).isNull().alias("is_current"),
    )


def scd2_merge(
    state: Optional[DataFrame],
    batch: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    date_col: str,
    tiebreak_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a NEW change batch into an
    existing Type 2 dimension (the output schema of :func:`scd2_history`)
    without replaying history. Chaining date-ordered batches equals the
    one-shot :func:`scd2_history` over the full log (property-fuzzed in
    ``test_training_ops.py::TestCdcFuzz::test_scd2_merge_chained_equals_one_shot``).

    Precondition — in-order arrival: every date in the batch must be
    strictly GREATER than every date already observed for that key (the
    normal CDC feed: batch N+1 is a later extract window than batch N).
    An out-of-order date could not be honored anyway without reopening
    closed intervals; replay :func:`scd2_history` over the full log to
    repair late data.

    How the open-version handoff works (the half-open-interval trap this
    function exists to get right): for keys the batch touches, the
    state's OPEN version re-enters change detection as a synthetic
    observation at its own ``effective_from`` — so a batch row with
    IDENTICAL attributes collapses into it (no spurious version), and the
    first genuinely different batch row closes it at that row's date.
    Closed versions and untouched keys pass through verbatim.

    Scale (100 TB dimension, GB-scale batches): the rebuild windows run
    over (touched open rows + batch) ONLY — O(batch); closed history is
    never windowed, sorted, or shuffled (it passes through a union — with
    the state persisted as a table, a scan-append). The touched-key
    semi/anti joins probe the state with the batch's distinct keys (AQE
    broadcasts them for a small batch, the common case)."""
    if state is None:
        return scd2_history(batch, key_cols, attr_cols, date_col, tiebreak_cols)
    keys = list(key_cols)
    attrs = list(attr_cols)
    ties = list(tiebreak_cols or [])
    touched = batch.select(*keys).distinct()
    cur = F.col("is_current")
    open_touched = state.filter(cur).join(touched, keys, "left_semi")
    open_untouched = state.filter(cur).join(touched, keys, "left_anti")
    closed = state.filter(~cur)
    # the open version re-enters as an observation at its effective_from;
    # tiebreak values are irrelevant (the precondition forbids a batch
    # date equal to it), but must exist with the batch's types
    state_obs = open_touched.select(
        *keys,
        *attrs,
        F.col("effective_from").alias(date_col),
        *[F.lit(None).cast(batch.schema[t].dataType).alias(t) for t in ties],
    )
    batch_obs = batch.select(*keys, *attrs, F.col(date_col), *ties)
    rebuilt = scd2_history(
        state_obs.unionByName(batch_obs), keys, attrs, date_col, ties
    )
    return closed.unionByName(open_untouched).unionByName(rebuilt)


def merge_agg_state(
    state: Optional[DataFrame],
    batch: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch into a running
    per-group aggregate WITHOUT recomputing history. The state schema is
    (group..., count, sum_<c>..., min_<c>..., max_<c>...) — all
    associative/commutative merges, so chaining
    ``merge_agg_state(merge_agg_state(None, b1), b2)`` over any batch
    split equals the one-shot aggregate over the union (averages derive
    as sum/count downstream; non-mergeable aggregates like exact
    distincts need sketches instead).

    This is THE incremental-pipeline aggregation pattern the reference's
    offset-tracked ingestion feeds (SURVEY §2.6): each day's batch
    updates daily/rolling rollups in O(batch + |state|), not O(history).

    Scale (100 TB of history, GB-scale batches): the batch aggregates
    map-side first (its shuffle carries per-group partials, not rows);
    the state merge is a group-keyed union+agg whose cost is bounded by
    the number of GROUPS, not history rows. The union+agg form shown
    here always re-exchanges the state side (a union has no preserved
    distribution); when the state lives in a table persisted with
    :func:`persist_agg_state` (bucketed by the group columns), fold
    batches with :func:`merge_agg_state_join` instead — the state scan
    already satisfies the join's distribution and only the batch
    partials shuffle (asserted by
    ``test_training_ops.py::TestAggStateBucketing``)."""
    groups = list(group_cols)
    batch_agg = batch.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )
    if state is None:
        return batch_agg
    return (
        state.unionByName(batch_agg)
        .groupBy(*groups)
        .agg(
            F.sum(count_col).cast("long").alias(count_col),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
            *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
        )
    )


def merge_agg_state_join(
    state: DataFrame,
    batch: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """:func:`merge_agg_state`'s merge step as a FULL OUTER JOIN instead
    of a union+agg — same result (asserted by equivalence tests), but a
    join preserves the state side's storage distribution where a union
    cannot: against a state table persisted with :func:`persist_agg_state`
    (bucketed by the group columns), the state scan satisfies the join's
    required distribution in place and ONLY the batch partials are
    exchanged. This is the layout+operator pair that makes per-batch cost
    independent of state size, exactly like the dedup hash ledger
    (operators/dedup.py::persist_hash_ledger).

    Groups present on one side only pass through (full outer + null-aware
    merges: counts/sums add where both exist, min/max via least/greatest
    which skip NULLs); a NULL sum meeting a non-NULL sum keeps the
    non-NULL one, preserving SUM's all-NULL semantics across batches."""
    groups = list(group_cols)
    batch_agg = batch.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )
    rename = {c: f"_b_{c}" for c in batch_agg.columns if c not in groups}
    b = batch_agg.withColumnsRenamed(rename)
    joined = state.join(b, groups, "full_outer")

    def add(col: str):
        s, bb = F.col(col), F.col(f"_b_{col}")
        return (
            F.when(s.isNull(), bb).when(bb.isNull(), s).otherwise(s + bb)
        )

    return joined.select(
        *groups,
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col(f"_b_{count_col}"), F.lit(0))
        )
        .cast("long")
        .alias(count_col),
        *[add(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[
            F.least(F.col(f"min_{c}"), F.col(f"_b_min_{c}")).alias(f"min_{c}")
            for c in min_cols
        ],
        *[
            F.greatest(F.col(f"max_{c}"), F.col(f"_b_max_{c}")).alias(f"max_{c}")
            for c in max_cols
        ],
    )


def persist_agg_state(
    state: DataFrame,
    table: str,
    group_cols: Sequence[str],
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> str:
    """Persist a :func:`merge_agg_state` state BUCKETED by its group
    columns — the storage layout under which :func:`merge_agg_state_join`
    folds each batch with NO exchange on the state side (the scan's
    bucket distribution satisfies the join). The
    :func:`~pramen_spark.operators.dedup.persist_hash_ledger` pattern,
    applied to aggregate state: per-run cost O(batch + groups touched),
    never O(state), no matter how many groups the rollup has accumulated.

    Reference semantics: the bookkeeper's persisted per-table record
    store (core/.../bookkeeper/BookkeeperBase.scala), specialized to
    mergeable aggregate state. Returns the table name for chaining."""
    (
        state.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *list(group_cols))
        .sortBy(*list(group_cols))
        .saveAsTable(table)
    )
    return table


def merge_distinct_state(
    state: Optional[DataFrame],
    batch: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Incremental DISTINCT-count maintenance: exact distincts are not
    associative (yesterday's count + today's count double-counts
    returning keys), so the running state per group is a mergeable
    HyperLogLog sketch (Spark's Datasketches hll_sketch_agg /
    hll_union_agg builtins, ~2% error at lg_k=12 in a KB per group).
    Fold each batch with this function, read the estimate off the state
    with :func:`estimate_distinct` — the mergeable-sketch counterpart of
    :func:`merge_agg_state`'s sum/count/min/max columns.

    Scale (100 TB): the batch collapses to one sketch per group map-side
    (the shuffle carries partial sketches, not keys); the state merge
    costs O(groups), never O(history keys). Unions are associative and
    commutative, so any batch split yields the same state."""
    groups = list(group_cols)
    batch_sk = batch.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch")
    )
    if state is None:
        return batch_sk
    return (
        state.unionByName(batch_sk)
        .groupBy(*groups)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def estimate_distinct(state: DataFrame) -> DataFrame:
    """Read (group..., n_distinct_est) off a merge_distinct_state state."""
    others = [c for c in state.columns if c != "sketch"]
    return state.select(
        *others,
        F.hll_sketch_estimate("sketch").cast("long").alias("n_distinct_est"),
    )
