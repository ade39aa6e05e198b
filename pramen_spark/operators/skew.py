"""Skew-ACTION operators: salted aggregation and a salt-replicated join.

:func:`pramen_spark.operators.validation.key_skew_profile` MEASURES how
lopsided a candidate shuffle key is; these operators ACT on that
measurement. A hot key in a plain ``groupBy`` funnels all its rows through
one reducer regardless of cluster size (AQE's skew handling splits JOIN
partitions, not aggregation keys), and a hot key on the probe side of a
shuffle join pins the whole partition on one task. Salting breaks the hot
key across ``n_salts`` reducers at the cost of one extra (tiny) merge pass
or a ``n_salts``-fold replication of the SMALL side.

Reference parity: the reference exposes per-table "good throughput"
thresholds (core/.../app/config/Keys.scala:27-28 ``goodThroughputRps`` /
``badThroughputRps``) as the ops hook that tells a user a job is
shuffle-bound; this module is the transformation-side remedy the engine
itself can apply. ``recommend_salts`` closes the loop: profile -> decide
-> act.

All outputs are salt-invariant: the salt only changes WHERE partial rows
are computed, never WHAT the final rows are (associative/commutative
merges only — the same algebra :func:`~pramen_spark.operators.cdc.
merge_agg_state` relies on).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pramen_spark.operators.validation import key_skew_profile


def _salt_expr(df: DataFrame, salt_cols: Optional[Sequence[str]], n_salts: int):
    """Deterministic per-row salt in [0, n_salts): xxhash64 of the given
    columns (default: every column), so re-runs and retries place each row
    on the same salt — no RNG, no partition-id dependence."""
    cols = list(salt_cols) if salt_cols else list(df.columns)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    n_salts: int = 16,
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: aggregate on (group..., salt)
    first — the hot key's rows spread over ``n_salts`` reducers — then
    merge the per-salt partials on the group columns alone. The second
    exchange carries at most ``n_keys * n_salts`` rows, so its cost is
    negligible no matter how hot the key was.

    Output schema matches :func:`~pramen_spark.operators.cdc.
    merge_agg_state`: (group..., count, sum_<c>..., min_<c>..., max_<c>...)
    — all associative merges, so the salted result is bit-identical to the
    unsalted ``groupBy`` (integer/decimal sums exactly; double sums up to
    the same reordering ulp any partitioning change causes). Averages
    derive as sum/count downstream.

    Scale (100 TB): a key holding 10% of the table turns a 1000-executor
    aggregation into a 1-task tail; salted, the same key becomes
    ``n_salts`` tasks of 1/n_salts each. Spark's own partial aggregation
    (map-side combine) already helps LOW-cardinality hot keys; salting is
    the remedy when per-map-task cardinality is too high for the hash map
    (combiner spills) or when the agg carries wide state. The cost — one
    extra exchange of n_keys*n_salts pre-aggregated rows — is paid only
    when you opt in; wire :func:`recommend_salts` to decide from data.
    """
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    groups = list(group_cols)
    salted = df.withColumn("_salt", _salt_expr(df, salt_cols, n_salts))
    partial = salted.groupBy(*groups, "_salt").agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    )
    return partial.groupBy(*groups).agg(
        F.sum(count_col).cast("long").alias(count_col),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
        *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Skew-safe shuffle join: the LEFT (large, skewed) side gets a
    deterministic row salt; the RIGHT (small — dimension/aggregate) side
    is replicated once per salt value; the join runs on (keys..., salt).
    A hot left key that would pin one task now spreads across ``n_salts``
    tasks, each joining against its own replica of the right rows.

    Only ``inner`` and ``left`` joins are supported: replicating the right
    side would duplicate unmatched right rows under right/full outer
    semantics (and a semi/anti join should just use the unsalted form —
    its right side carries no payload to replicate).

    Scale (100 TB): use when BOTH broadcast is impossible (right side over
    the broadcast cap) AND the left key histogram is hot
    (:func:`~pramen_spark.operators.validation.key_skew_profile` top1_share
    high). Replication multiplies the right side's shuffle volume by
    ``n_salts`` — that is the explicit price, so keep n_salts near
    max_rows/p99_rows (what :func:`recommend_salts` computes), don't
    default it high. AQE's skew-join split solves the sort-merge case at
    runtime; salting remains the remedy for hash aggregation feeding the
    join and for deterministic plan shape."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(replicating the right side breaks right/full outer semantics)"
        )
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    keys = list(on)
    l_salted = left.withColumn("_salt", _salt_expr(left, salt_cols, n_salts))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_replicated, keys + ["_salt"], how).drop("_salt")


def recommend_salts(
    df: DataFrame,
    key_col: str,
    skew_threshold: float = 4.0,
    max_salts: int = 64,
) -> int:
    """Profile -> decision: run :func:`~pramen_spark.operators.validation.
    key_skew_profile` on the candidate key and return the salt count a
    salted aggregation/join should use — ``1`` (don't salt) when the
    hottest key is within ``skew_threshold``× of the p90 key, else
    ``ceil(max_rows / p90_rows)`` clamped to ``max_salts``: enough salts
    that the hot key's per-reducer share shrinks to an ordinary-heavy
    key's load, and no more (each salt multiplies the merge pass /
    replication). p90 — not p99 or the mean — is the robust baseline:
    with few distinct keys p99 interpolates toward the max itself, and
    one giant key inflates the mean; both would mask real skew.

    The profile is ONE extra aggregation over the key column (collect of
    a single summary row — a control-plane scalar, the documented collect
    pattern). Cache the result per (table, key) in a real pipeline; the
    histogram of a key drifts slowly."""
    row = key_skew_profile(df, key_col).collect()[0]
    baseline = max(float(row.p90_rows), 1.0)
    if float(row.max_rows) <= skew_threshold * baseline:
        return 1
    return max(1, min(max_salts, math.ceil(float(row.max_rows) / baseline)))


def herfindahl_index(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    value_expr,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per group: the sum of
    squared entity shares of ``value_expr`` — 1/n for perfectly even
    markets, 1.0 for a monopoly. The market-concentration complement of
    key_skew_profile: skew says "one key is huge", HHI says "how close
    to single-supplier is this market", and 1/HHI is the effective
    number of competitors.

    Exactness: entity totals sum as decimals, and HHI is computed as
    Σv² / (Σv)² with the per-entity SQUARES also taken and summed in
    decimal — both engines divide the same two exact integers-scaled
    values, so the only float step is the final division. Never the
    naive Σ(share²), whose double sum is reduce-order dependent.

    Scale: two map-side-combined aggregations (entity totals, then the
    per-group reduce of the entity table). The second input is bounded
    by |group| × |entity|, not data volume.

    Returns (group, n_entities, top_share, hhi).
    """
    per = df.groupBy(
        F.col(group_col).alias("grp"), F.col(entity_col).alias("_ent")
    ).agg(F.sum(value_expr).cast("decimal(18,4)").alias("_v"))
    agg = per.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("_v").alias("_tot"),
        F.sum(F.col("_v") * F.col("_v")).alias("_sq"),
        F.max("_v").alias("_mx"),
    )
    tot = F.col("_tot").cast("double")
    return agg.select(
        "grp",
        "n_entities",
        F.round(F.col("_mx").cast("double") / tot, 6).alias("top_share"),
        F.round(F.col("_sq").cast("double") / (tot * tot), 6).alias("hhi"),
    )


def peer_zscore(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    value_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Peer-group z-score outliers: each entity's value standardized
    against ITS OWN group's mean and sample deviation, returning the
    entities beyond ``threshold`` deviations — "this supplier's
    balance is normal globally but 3σ off for its nation". The
    peer-relative complement of grubbs_test's global extreme.

    Group moments come from one DECIMAL-exact aggregation (the
    welch/anova discipline) broadcast back onto the entities; the
    z-score is one subtraction and division per row. Groups of one
    have no deviation — NULL z, never flagged.

    Returns (group, entity, value, z), |z| > threshold only, round 6.
    """
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(entity_col).alias("entity"),
        v.alias("_v"),
    )
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec(F.col("_v"))).cast("double").alias("_s1"),
        F.sum(dec(F.col("_v") * F.col("_v"))).cast("double").alias("_s2"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s1") / n
    sd = F.sqrt(
        F.try_divide(n * F.col("_s2") - F.col("_s1") * F.col("_s1"),
                     n * (n - F.lit(1.0)))
    )
    stats = g.select("grp", mean.alias("_m"), sd.alias("_sd"))
    z = F.try_divide(F.col("_v") - F.col("_m"), F.col("_sd"))
    return (
        base.join(F.broadcast(stats), "grp")
        .where(F.abs(z) > threshold)
        .select(
            "grp",
            "entity",
            F.round("_v", 6).alias("value"),
            F.round(z, 6).alias("z"),
        )
    )


def apply_skew_guard(df: DataFrame, guard: dict, right_df: Optional[DataFrame] = None):
    """Config surface for the profile -> decide -> act loop: a pipeline
    author declares an operation-level ``skew_guard`` (the shape below)
    and the task runner routes the operation's output through this
    function — :func:`recommend_salts` profiles the declared key at run
    time and the declared action executes salted exactly when the
    decision rule fires, plain otherwise. This operationalizes the
    reference's throughput-threshold ops hook (core/.../app/config/
    Keys.scala:27-28 ``goodThroughputRps``/``badThroughputRps``): where
    the reference can only WARN that a job is shuffle-bound, the engine
    applies the remedy.

    ``guard`` keys::

        key: str            # shuffle key to profile (required)
        threshold: float    # hot/p90 ratio that triggers salting (4.0)
        max_salts: int      # salt-count clamp (64)
        action: "agg" | "join"            # default "agg"
        # action=agg (output schema == salted_agg's):
        group_cols: [str]   # default [key]
        sum_cols / min_cols / max_cols: [str]
        # action=join (right_df = the small side, runner-resolved from
        # guard["right_table"] via the metastore):
        on: [str]           # default [key]
        how: "inner" | "left"

    Returns ``(DataFrame, note)`` — the note records the decision
    (profiled key, chosen n_salts, salted or plain) and the runner
    surfaces it in the task result warnings, so every run documents
    whether the two-phase plan was in effect.

    Both paths produce identical values (salting is algebra-invariant),
    so flipping between them as the key histogram drifts is safe."""
    key = guard["key"]
    n_salts = recommend_salts(
        df,
        key,
        skew_threshold=float(guard.get("threshold", 4.0)),
        max_salts=int(guard.get("max_salts", 64)),
    )
    action = str(guard.get("action", "agg"))
    if action == "agg":
        groups = list(guard.get("group_cols", [key]))
        sums = list(guard.get("sum_cols", ()))
        mins = list(guard.get("min_cols", ()))
        maxs = list(guard.get("max_cols", ()))
        if n_salts > 1:
            out = salted_agg(
                df, groups, sum_cols=sums, min_cols=mins, max_cols=maxs,
                n_salts=n_salts,
            )
        else:
            # plain single-exchange aggregation with the exact salted_agg
            # output schema, so downstream code never sees the decision
            out = df.groupBy(*groups).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                *[F.sum(c).alias(f"sum_{c}") for c in sums],
                *[F.min(c).alias(f"min_{c}") for c in mins],
                *[F.max(c).alias(f"max_{c}") for c in maxs],
            )
    elif action == "join":
        if right_df is None:
            raise ValueError(
                "skew_guard action=join needs the small side: set "
                "guard['right_table'] (runner-resolved) or pass right_df"
            )
        on = list(guard.get("on", [key]))
        how = str(guard.get("how", "inner"))
        if n_salts > 1:
            out = salted_join(df, right_df, on, n_salts=n_salts, how=how)
        else:
            out = df.join(right_df, on, how)
    else:
        raise ValueError(f"unknown skew_guard action {action!r}")
    note = (
        f"skew.guard: key={key} action={action} n_salts={n_salts} "
        f"({'salted two-phase' if n_salts > 1 else 'plain (no skew)'})"
    )
    return out, note
