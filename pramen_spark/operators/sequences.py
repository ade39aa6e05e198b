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


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    window_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing/product attribution: for every CONVERSION
    event, the most recent preceding TOUCH event by the same user within
    ``window_seconds`` — the standard "which click gets credit for this
    purchase" assignment. Returns one row per conversion:
    (conversion id/user/ts, touch_event_id, touch_type, touch_ts,
    gap_us — microsecond-exact, so window boundaries never depend on
    second truncation), with NULL touch columns for organic conversions
    (no touch inside the window).

    Deterministic: events order per user by (ts, id); "preceding" is
    strict in that total order, so a touch sharing a timestamp with the
    conversion attributes only if its id sorts first.

    Scale (100 TB of events): ONE window pass partitioned by user — the
    carried state is a single struct (the running last touch via
    ``last(..., ignorenulls=True)``), never a join of conversions against
    the event history (the self-join formulation shuffles the events
    table twice and explodes on hot users). The window check is applied
    as a post-filter on the one carried candidate, which is exactly the
    last-touch semantics (an older in-window touch never wins over a
    newer one)."""
    is_touch = F.col(type_col).isin(list(touch_types))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(ts_col).alias("t_ts"),
            F.col(id_col).alias("t_id"),
            F.col(type_col).alias("t_type"),
        ),
    )
    with_touch = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        F.col(type_col),
        F.last(touch_struct, ignorenulls=True).over(w).alias("_touch"),
    )
    conv = with_touch.filter(F.col(type_col) == conversion_type)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_touch.t_ts"))
    in_window = F.col("_touch").isNotNull() & (
        gap_us <= F.lit(int(window_seconds) * 1_000_000)
    )
    return conv.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col).alias("conversion_ts"),
        F.when(in_window, F.col("_touch.t_id")).alias("touch_event_id"),
        F.when(in_window, F.col("_touch.t_type")).alias("touch_type"),
        F.when(in_window, F.col("_touch.t_ts")).alias("touch_ts"),
        F.when(in_window, gap_us).cast("long").alias("gap_us"),
    )


def time_to_convert(
    events: DataFrame,
    start_type: str,
    end_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-latency measurement: per user, the FIRST ``start_type``
    event and the first ``end_type`` event strictly after it (in (ts, id)
    order), with the microsecond gap — the funnel's "how long" complement
    to the funnel's "how many" (queries/catalog.py::q_funnel_events).
    Users who started but never converted keep NULL conversion columns;
    users who never started are absent.

    Deterministic: "first" is an argmin over the total order (ts, id),
    computed as MIN over a struct — no row_number window needed, so each
    side is one map-side-combined aggregation.

    Scale (100 TB of events): two filtered per-user aggregations and one
    user-keyed join — all co-partitioned on the user key after a single
    exchange each; no window over raw events, no self-join of the full
    stream (only the start/end subsets move)."""
    us = lambda c: F.unix_micros(F.col(c))
    starts = (
        events.filter(F.col(type_col) == start_type)
        .groupBy(user_col)
        .agg(
            F.min(
                F.struct(us(ts_col).alias("us"), F.col(id_col).alias("id"))
            ).alias("s")
        )
    )
    ends = events.filter(F.col(type_col) == end_type).select(
        F.col(user_col), us(ts_col).alias("e_us"), F.col(id_col).alias("e_id")
    )
    after = (
        ends.join(starts, user_col)
        .filter(
            (F.col("e_us") > F.col("s.us"))
            | ((F.col("e_us") == F.col("s.us")) & (F.col("e_id") > F.col("s.id")))
        )
        .groupBy(user_col)
        .agg(
            F.min(
                F.struct(F.col("e_us").alias("us"), F.col("e_id").alias("id"))
            ).alias("c")
        )
    )
    return (
        starts.join(after, user_col, "left")
        .select(
            F.col(user_col),
            F.col("s.us").alias("start_us"),
            F.col("s.id").alias("start_event_id"),
            F.col("c.us").alias("convert_us"),
            F.col("c.id").alias("convert_event_id"),
            (F.col("c.us") - F.col("s.us")).cast("long").alias("gap_us"),
        )
    )


def burst_dedup(
    events: DataFrame,
    gap_seconds: float,
    group_cols: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Collapse event bursts: within each group, consecutive events
    closer than ``gap_seconds`` chain into one burst (retry storms,
    double-clicks, sensor chatter) and only the burst's FIRST event
    survives, annotated with ``burst_n_events`` and ``burst_span_us`` —
    the event-stream counterpart of exact document dedup, with the same
    keep-first convention. Chain semantics (gap measured to the previous
    event, sessionization-style), so a storm emitting every N-1 seconds
    for an hour is ONE row, which is what you want from a retry storm.

    Scale: the sessionize_batch plan — one exchange on the group key,
    two in-partition window passes (lag gap-flag, cumulative burst id),
    one aggregation; only (group, ts, id) move."""
    groups = [F.col(c) for c in group_cols]
    gap_us = int(gap_seconds * 1_000_000)
    w = Window.partitionBy(*groups).orderBy(F.col(ts_col), F.col(id_col))
    tus = F.unix_micros(F.col(ts_col))
    prev = F.lag(tus).over(w)
    marked = events.withColumn(
        "_new", (prev.isNull() | (tus - prev > gap_us)).cast("int")
    ).withColumn("_burst", F.sum("_new").over(w))
    return (
        marked.groupBy(*groups, F.col("_burst"))
        .agg(
            F.min(F.struct(tus.alias("us"), F.col(id_col).alias("id"))).alias("f"),
            F.count(F.lit(1)).cast("long").alias("burst_n_events"),
            (F.max(tus) - F.min(tus)).cast("long").alias("burst_span_us"),
        )
        .select(
            F.col("f.id").alias(id_col),
            *group_cols,
            F.col("f.us").alias("first_us"),
            "burst_n_events",
            "burst_span_us",
        )
    )


def time_weighted_avg(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (TWAP-style): each observation's value holds
    until the NEXT observation, so the mean weights each value by its
    holding duration instead of letting burst-sampled moments dominate —
    the correct "average state" for irregularly sampled series (prices,
    gauge metrics, queue depths). The last observation has no holding
    interval and contributes no weight. Returns (user, n_events,
    span_us, twap); singleton users report NULL twap (zero total
    weight).

    Scale: ONE window pass per key (lead over (ts, id)) computes holding
    gaps; the weighted mean is a map-side-combined aggregation. Exact
    integer microsecond gaps; only the final products are doubles."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    tus = F.unix_micros(F.col(ts_col))
    gap = (F.lead(tus).over(w) - tus).cast("long")
    weighted = events.select(
        F.col(user_col),
        tus.alias("tus"),
        F.col(value_col).cast("double").alias("v"),
        gap.alias("gap_us"),
    )
    return weighted.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("tus") - F.min("tus")).cast("long").alias("span_us"),
        F.round(
            F.try_divide(
                F.sum(F.col("v") * F.col("gap_us")), F.sum("gap_us")
            ),
            4,
        ).alias("twap"),
    )


def churn_labels(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    inactive_days: int = 7,
) -> DataFrame:
    """Churn labeling against the dataset horizon: per user, the last
    active day, days inactive relative to the global max day, and the
    boolean churn label (inactive > ``inactive_days``) — the standard
    supervised-churn target generator.

    Returns (user, last_day, days_inactive, churned).

    Scale: one map-side-combined per-user MAX, then a 1-row broadcast
    of the global horizon; no window, no self-join. (The per-user table
    is the thing that shuffles — one row per user.)
    """
    per_user = df.groupBy(F.col(user_col)).agg(
        F.max(F.to_date(F.col(ts_col))).alias("last_day")
    )
    horizon = per_user.agg(F.max("last_day").alias("_max_day"))
    return per_user.crossJoin(F.broadcast(horizon)).select(
        user_col,
        "last_day",
        F.datediff(F.col("_max_day"), F.col("last_day"))
        .cast("long")
        .alias("days_inactive"),
        (
            F.datediff(F.col("_max_day"), F.col("last_day"))
            > F.lit(int(inactive_days))
        ).alias("churned"),
    )


def path_ngrams(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    order_col: str = "event_id",
    n: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Frequent event-path n-grams: the top consecutive event
    subsequences across user journeys — the exploratory step before
    funnel definition (which paths actually happen?) and the n>2
    extension of the Markov transition matrix.

    Returns the top-``top_n`` n-grams as (step_1..step_n, n_paths),
    ordered by count with the full tuple as the deterministic tiebreak.
    Ordering within a user is (ts, ``order_col``) so timestamp ties
    cannot flip results between runs or engines.

    Scale: ONE window pass partitioned by user (n-1 LEADs share the
    same frame), then a map-side-combined count and a TakeOrdered
    top-N. Per-user ordering shuffles each user's events to one
    partition — the sessionize/funnel shape; a hot synthetic user is
    the salted_agg case."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    grams = df.select(
        *[s.alias(f"step_{i + 1}") for i, s in enumerate(steps)]
    ).where(F.col(f"step_{n}").isNotNull())
    return (
        grams.groupBy(*[f"step_{i + 1}" for i in range(n)])
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), *[F.asc(f"step_{i + 1}") for i in range(n)]
        )
        .limit(top_n)
    )


def interval_concurrency(
    intervals: DataFrame,
    start_us_col: str,
    end_us_col: str,
) -> DataFrame:
    """Peak concurrency per day over closed microsecond intervals
    [start_us, end_us] — "how many sessions were open at once": the
    capacity-planning readout for connection pools, support queues, and
    streaming-state sizing.

    Sweep-line: each interval contributes a +1 at its (clipped) start
    and a -1 at its (clipped) end; the running sum of deltas in
    (time, +1-before--1) order is the concurrency profile, and its
    per-day max is the answer. Intervals are CLOSED, so two sessions
    touching at one microsecond count as concurrent, and a
    zero-duration interval still registers (its +1 sorts first).

    Scale (the reason this shape, not a global sweep): intervals are
    first split at UTC midnights (sequence over the covered days — gap-
    bounded sessions span at most 2), so the sweep window partitions BY
    DAY and every day's profile computes independently and in parallel;
    nothing ever funnels through a single global sort. Shuffle volume
    is 2 points per interval-day.

    Returns (day, n_intervals, max_concurrent).
    """
    base = intervals.select(
        F.col(start_us_col).cast("long").alias("_s_us"),
        F.col(end_us_col).cast("long").alias("_e_us"),
    )
    # integer DIV, never double division: an exact-midnight microsecond
    # divided as double can round across the day boundary
    seg = base.select(
        "_s_us",
        "_e_us",
        F.explode(
            F.sequence(
                F.date_from_unix_date(
                    F.expr("CAST(_s_us DIV 86400000000 AS INT)")
                ),
                F.date_from_unix_date(
                    F.expr("CAST(_e_us DIV 86400000000 AS INT)")
                ),
            )
        ).alias("day"),
    )
    day_start = F.unix_date(F.col("day")).cast("long") * F.lit(86_400_000_000)
    day_end = day_start + F.lit(86_400_000_000 - 1)
    clipped = seg.select(
        "day",
        F.greatest(F.col("_s_us"), day_start).alias("_cs"),
        F.least(F.col("_e_us"), day_end).alias("_ce"),
    )
    pts = clipped.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("_cs").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("_ce").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select("day", F.col("p.t").alias("t"), F.col("p.delta").alias("delta"))
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = pts.withColumn("_conc", F.sum("delta").over(w))
    return swept.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_intervals"),
        F.max("_conc").cast("long").alias("max_concurrent"),
    )


def activity_streaks(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands classic, and the retention metric product teams
    actually chase (DAU streaks), all in exact integer arithmetic.

    Islands via the textbook trick: within a user's DISTINCT active
    days, day_number − row_number() is constant exactly along a
    consecutive run. The raw log collapses to distinct (user, day)
    FIRST (the only event-volume stage, map-side combined), so both
    windows run over at most one row per user-day; everything is keyed
    on the user — one shuffle, perfectly parallel across users.

    Returns (user, n_active_days, n_streaks, longest_streak).
    """
    days = df.select(
        F.col(user_col).alias("user"),
        F.expr(
            f"CAST(unix_micros({ts_col}) DIV 86400000000 AS LONG)"
        ).alias("_dayn"),
    ).distinct()
    w = Window.partitionBy("user").orderBy("_dayn")
    isl = days.withColumn(
        "_island", F.col("_dayn") - F.row_number().over(w)
    )
    per_island = isl.groupBy("user", "_island").agg(
        F.count(F.lit(1)).cast("long").alias("_len")
    )
    return per_island.groupBy("user").agg(
        F.sum("_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("_len").cast("long").alias("longest_streak"),
    )


def new_vs_returning(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily new-vs-returning split: per UTC day, how many distinct
    users were active, how many were seen for the FIRST time ever, and
    how many returned — the growth-accounting decomposition under every
    DAU chart.

    The raw log collapses to distinct (user, day) first (the
    activity_streaks pattern); each user's first day is a min
    aggregation, and "new on day d" is first_day == d — no join of
    events against their own minimum, just one user-keyed window over
    the deduplicated pairs.

    Returns (day, n_users, n_new, n_returning), all exact integers.
    """
    days = df.select(
        F.col(user_col).alias("user"),
        F.expr(
            f"CAST(unix_micros({ts_col}) DIV 86400000000 AS LONG)"
        ).alias("_dayn"),
    ).distinct()
    w = Window.partitionBy("user")
    flagged = days.withColumn("_first", F.min("_dayn").over(w))
    return flagged.groupBy(
        F.date_from_unix_date(F.col("_dayn").cast("int")).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("_dayn") == F.col("_first")).cast("int"))
        .cast("long")
        .alias("n_new"),
        F.sum((F.col("_dayn") != F.col("_first")).cast("int"))
        .cast("long")
        .alias("n_returning"),
    )


def inter_event_gaps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Inter-event interval distribution: the gaps (in fractional days)
    between each user's CONSECUTIVE events, summarized as exact
    interpolated quartiles plus a decimal-exact mean — the
    repeat-purchase-cadence readout that sets reorder-reminder timing
    and churn-definition windows.

    One window pass partitioned by user (ordered by (ts, id) so ties
    are deterministic) produces the gaps; one global aggregation
    summarizes. Gap days divide microsecond longs as IEEE doubles —
    identical everywhere.

    Returns one row: (n_gaps, mean_days, p25, p50, p75), rounds 6.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col))
    gaps = df.select(
        ((us - F.lag(us).over(w)).cast("double") / F.lit(86_400_000_000.0))
        .alias("_gap")
    ).where(F.col("_gap").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(
            F.sum(F.col("_gap").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_days"),
        F.round(F.percentile(F.col("_gap"), 0.25), 6).alias("p25"),
        F.round(F.percentile(F.col("_gap"), 0.5), 6).alias("p50"),
        F.round(F.percentile(F.col("_gap"), 0.75), 6).alias("p75"),
    )


def reactivations(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    dormancy_days: int = 30,
) -> DataFrame:
    """Daily reactivation count: users who return after at least
    ``dormancy_days`` of silence — the win-back metric that pairs with
    new_vs_returning's growth accounting (a "returning" user who was
    dark for a month is a different business event than a daily
    habitual).

    Same skeleton as activity_streaks: collapse to distinct
    (user, day) first, one user-partitioned LAG, then count the days
    whose gap from the user's previous active day exceeds the
    dormancy threshold. Exact integers throughout.

    Returns (day, n_reactivated).
    """
    days = df.select(
        F.col(user_col).alias("user"),
        F.expr(
            f"CAST(unix_micros({ts_col}) DIV 86400000000 AS LONG)"
        ).alias("_dayn"),
    ).distinct()
    w = Window.partitionBy("user").orderBy("_dayn")
    gapped = days.select(
        "_dayn", (F.col("_dayn") - F.lag("_dayn").over(w)).alias("_gap")
    )
    return (
        gapped.where(F.col("_gap") > dormancy_days)
        .groupBy(
            F.date_from_unix_date(F.col("_dayn").cast("int")).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_reactivated"))
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Full DAU growth accounting: every day's active count decomposed
    into NEW (first day ever), RETAINED (also active yesterday) and
    RESURRECTED (returning after ≥1 dark day), plus CHURNED (active
    yesterday, not today) — the identity dau(d) = new + retained +
    resurrected and churned(d) = dau(d−1) − retained(d) that growth
    teams reconcile weekly. Completes the new_vs_returning /
    reactivations family with the churn side.

    One distinct (user, day) collapse, one user-partitioned window
    producing lag/lead/first in a single pass, two small aggregations
    joined on the day. Churn attributes to the day AFTER the user's
    last consecutive day; the final day of data reports churned from
    its previous day only (nobody can churn "after" the data ends).

    Returns (day, dau, n_new, n_retained, n_resurrected, n_churned).
    """
    days = df.select(
        F.col(user_col).alias("user"),
        F.expr(
            f"CAST(unix_micros({ts_col}) DIV 86400000000 AS LONG)"
        ).alias("_dayn"),
    ).distinct()
    w = Window.partitionBy("user").orderBy("_dayn")
    flagged = days.select(
        "_dayn",
        F.lag("_dayn").over(w).alias("_prev"),
        F.lead("_dayn").over(w).alias("_next"),
        F.min("_dayn").over(
            Window.partitionBy("user").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_first"),
    )
    per_day = flagged.groupBy(F.col("_dayn").alias("_d")).agg(
        F.count(F.lit(1)).cast("long").alias("dau"),
        F.sum((F.col("_dayn") == F.col("_first")).cast("int"))
        .cast("long")
        .alias("n_new"),
        # when/otherwise, not a bare comparison cast: _prev is NULL on
        # every first-day row, and a day of only new users would SUM
        # all-NULL flags to NULL instead of 0
        F.sum(
            F.when(F.col("_prev") == F.col("_dayn") - 1, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_retained"),
        F.sum(
            (F.col("_prev").isNotNull()
             & (F.col("_prev") < F.col("_dayn") - 1)).cast("int")
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        flagged.where(
            F.col("_next").isNull() | (F.col("_next") > F.col("_dayn") + 1)
        )
        .groupBy((F.col("_dayn") + 1).alias("_d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return per_day.join(churn, "_d", "left").select(
        F.date_from_unix_date(F.col("_d").cast("int")).alias("day"),
        "dau",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
    )


def littles_law_audit(
    intervals: DataFrame,
    start_us_col: str,
    end_us_col: str,
) -> DataFrame:
    """Little's law audit per UTC day: compare the MEASURED time-average
    concurrency L (total busy microseconds in the day / day length)
    against the λ·W PREDICTION (arrivals that day × their mean duration
    in days) — the queueing-theory identity capacity planning leans on,
    and a data-quality tripwire when sessionization is broken (the two
    sides diverge hard if sessions leak or truncate).

    Busy time uses the same midnight-splitting as interval_concurrency
    (day-partitioned, exact integer microsecond sums as decimals);
    arrivals attribute to the start day. Boundary effects (sessions
    spanning midnight put busy time in day 2 but arrival in day 1)
    are the expected, documented source of small residuals.

    Returns (day, n_arrivals, mean_duration_s, l_measured,
    l_predicted), rounds 6.
    """
    base = intervals.select(
        F.col(start_us_col).cast("long").alias("_s_us"),
        F.col(end_us_col).cast("long").alias("_e_us"),
    )
    seg = base.select(
        "_s_us",
        "_e_us",
        F.explode(
            F.sequence(
                F.date_from_unix_date(
                    F.expr("CAST(_s_us DIV 86400000000 AS INT)")
                ),
                F.date_from_unix_date(
                    F.expr("CAST(_e_us DIV 86400000000 AS INT)")
                ),
            )
        ).alias("day"),
    )
    day_start = F.unix_date(F.col("day")).cast("long") * F.lit(86_400_000_000)
    day_end = day_start + F.lit(86_400_000_000 - 1)
    clipped = seg.select(
        "day",
        (
            F.least(F.col("_e_us"), day_end)
            - F.greatest(F.col("_s_us"), day_start)
            + F.lit(1)
        ).alias("_busy"),
    )
    busy = clipped.groupBy("day").agg(
        F.sum(F.col("_busy").cast("decimal(38,0)"))
        .cast("double")
        .alias("_busy_us")
    )
    arr = base.groupBy(
        F.date_from_unix_date(
            F.expr("CAST(_s_us DIV 86400000000 AS INT)")
        ).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.sum((F.col("_e_us") - F.col("_s_us") + 1).cast("decimal(38,0)"))
        .cast("double")
        .alias("_dur_us"),
    )
    day_us = F.lit(86_400_000_000.0)
    j = busy.join(arr, "day", "left")
    return j.select(
        "day",
        F.coalesce("n_arrivals", F.lit(0)).cast("long").alias("n_arrivals"),
        F.round(
            F.try_divide(F.col("_dur_us"), F.col("n_arrivals").cast("double"))
            / F.lit(1_000_000.0),
            6,
        ).alias("mean_duration_s"),
        F.round(F.col("_busy_us") / day_us, 6).alias("l_measured"),
        F.round(
            F.col("n_arrivals").cast("double")
            * F.try_divide(
                F.col("_dur_us"), F.col("n_arrivals").cast("double")
            )
            / day_us,
            6,
        ).alias("l_predicted"),
    )
