"""Robust anomaly detection over grouped series (median / MAD).

The monitoring counterpart to the trend fit (queries/catalog.py::
q_trend_slope_daily) and the PSI drift check (operators/drift.py): given
per-key observations, flag the points whose deviation from the key's
median exceeds ``threshold`` robust standard deviations, where the robust
sigma is 1.4826 * MAD (the normal-consistency constant). Mean/stddev
z-scores break exactly when they matter — a single huge spike inflates
the stddev and masks itself — while median and MAD have a 50% breakdown
point, which is why the reference-style operational checks (pramen's
"insufficient data" / record-count guards, MetastoreImpl.scala record
stats) grow into MAD gates in practice.

Plan shape: two aggregations over the (already small) per-key series —
one for the median, one for the MAD after a broadcast-size join of the
medians — then a final join to flag rows. All medians are EXACT
(``percentile``, interpolating, matching DuckDB's ``median`` /
``quantile_cont``), which is oracle-checkable; at 100 TB the *input* to
this operator is already an aggregate (one row per key per bucket, e.g.
days x event types), so the exact sort-based percentile is over a
bounded set, not the raw corpus. If the keyed series itself is huge,
swap ``F.percentile`` for ``F.percentile_approx`` — same plan shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scale factor making MAD a consistent estimator of sigma under normality
MAD_SIGMA = 1.4826


def mad_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Flag rows whose ``value_col`` deviates from its key-group median by
    more than ``threshold`` robust sigmas; returns the input columns plus
    ``median_value``, ``mad``, ``robust_z`` and ``is_anomaly``.

    robust_z is 0 when MAD is 0 and the value equals the median; when MAD
    is 0 and the value differs (a constant series with one outlier) the
    z-score is +infinity conceptually — represented here by flagging the
    row and reporting a NULL robust_z, so downstream arithmetic never
    meets an infinity.
    """
    keys = [F.col(k) for k in key_cols]
    med = df.groupBy(*keys).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("median_value")
    )
    with_med = df.join(med, on=list(key_cols))
    dev = F.abs(F.col(value_col) - F.col("median_value"))
    mad = (
        with_med.groupBy(*keys)
        .agg(F.percentile(dev, F.lit(0.5)).alias("mad"))
    )
    scored = with_med.join(mad, on=list(key_cols))
    sigma = F.col("mad") * F.lit(MAD_SIGMA)
    z = dev / sigma
    return scored.select(
        *[F.col(c) for c in df.columns],
        "median_value",
        "mad",
        F.when(sigma > 0, z)
        .when(dev == 0, F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("robust_z"),
        F.when(sigma > 0, z > threshold)
        .otherwise(dev > 0)
        .alias("is_anomaly"),
    )


def cusum_changepoint(
    series: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    round_to: int = 4,
) -> DataFrame:
    """CUSUM change-point localization over an (already aggregated)
    per-group series: the running sum of deviations from the group mean
    peaks in magnitude exactly where the level shifts, so
    ``argmax |CUSUM_t|`` is the classic single-change-point estimate
    (Page's statistic, offline form). Complements this module's MAD
    detector (WHICH points are outliers) with WHERE the regime changed.
    Returns one row per group: (group..., n_points, changepoint_at,
    max_abs_cusum) with the earliest position winning ties.

    Determinism: the running sum follows the total (order, value) series
    order — identical sequential fold in both engines — and rounds
    before the argmax so the tie-break is ulp-proof.

    Scale: input is a per-group SERIES (one row per bucket, e.g. daily
    aggregates) — the window partitions by group over already-reduced
    rows, never raw events; the argmax is a lexicographic struct MAX,
    map-side combined."""
    groups = [F.col(c) for c in group_cols]
    w_all = Window.partitionBy(*groups)
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col).cast("double")
    with_mean = series.withColumn(
        "_mean", F.avg(v).over(w_all)
    )
    cusum = with_mean.withColumn(
        "_cusum", F.round(F.sum(v - F.col("_mean")).over(w_cum), round_to)
    )
    neg_order = (-F.unix_micros(F.col(order_col).cast("timestamp"))
                 if dict(series.dtypes).get(order_col) in ("date", "timestamp")
                 else -F.col(order_col))
    best = cusum.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.max(
            F.struct(
                F.abs(F.col("_cusum")).alias("a"),
                neg_order.alias("no"),
                F.col(order_col).alias("at"),
            )
        ).alias("b"),
    )
    return best.select(
        *group_cols,
        "n_points",
        F.col("b.at").alias("changepoint_at"),
        F.col("b.a").alias("max_abs_cusum"),
    )


def overdispersion(
    df: DataFrame,
    group_col: str,
    entity_col: str,
) -> DataFrame:
    """Overdispersion check of per-entity counts within each group: the
    dispersion index ``var / mean`` of how many rows each entity
    contributes. Poisson arrivals give ~1; substantially above 1 means
    burstiness / heavy users (plan for salting and skew joins),
    below 1 means capped or quota'd behavior. The load-model companion
    to key_skew_profile.

    Returns per group: (group, n_entities, mean_count, var_count,
    dispersion, overdispersed).

    Scale: two map-side-combined aggregations — (group, entity) counts,
    then per-group moments over the one-row-per-entity table. No
    window, no join.
    """
    per = df.groupBy(
        F.col(group_col).alias("grp"), F.col(entity_col).alias("ent")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.avg("c").alias("_m"),
        F.var_samp(F.col("c").cast("double")).alias("_v"),
    )
    disp = F.col("_v") / F.col("_m")
    return agg.select(
        F.col("grp"),
        "n_entities",
        F.round("_m", 6).alias("mean_count"),
        F.round("_v", 6).alias("var_count"),
        F.round(disp, 6).alias("dispersion"),
        (disp > F.lit(1.0)).alias("overdispersed"),
    )


def runs_test(
    df: DataFrame,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test for serial randomness: is the series'
    above/below-median sign pattern consistent with independence, or
    does it cluster (trend/regime) or alternate (overcorrection)?
    The go/no-go screen before trusting i.i.d.-assuming monitors.

    Values equal to the interpolated median drop (the standard
    convention); the run count is 1 + Σ(sign ≠ previous sign) over the
    ORDER, and the z-statistic is the closed form from the exact
    integer counts (n_pos, n_neg, n_runs) — the only float work is
    scalar arithmetic on one row.

    Callers pre-aggregate to a bounded grid (daily rows — the
    ewma_smooth contract); the sign window is unpartitioned but only
    ever sees the calendar-bounded series.

    Returns one row: (n_pos, n_neg, n_runs, z), z round 6.
    """
    med = df.agg(F.percentile(F.col(value_col), 0.5).alias("_med"))
    signed = (
        df.crossJoin(F.broadcast(med))
        .where(F.col(value_col) != F.col("_med"))
        .select(
            F.col(order_col).alias("_o"),
            (F.col(value_col) > F.col("_med")).cast("int").alias("_s"),
        )
    )
    w = Window.orderBy("_o")
    flagged = signed.select(
        "_s",
        F.when(
            F.lag("_s").over(w).isNull()
            | (F.lag("_s").over(w) != F.col("_s")),
            1,
        ).otherwise(0).alias("_newrun"),
    )
    agg = flagged.agg(
        F.sum("_s").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("_s")).cast("long").alias("n_neg"),
        F.sum("_newrun").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_pos").cast("double")
    n2 = F.col("n_neg").cast("double")
    r = F.col("n_runs").cast("double")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "n_runs",
        F.round(F.try_divide(r - mu, F.sqrt(var)), 6).alias("z"),
    )


def grubbs_test(
    df: DataFrame,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Grubbs' maximum-studentized-deviate test: find THE single most
    extreme point of a series and how many sample standard deviations
    it sits from the mean — the "is this one day broken or just the
    tail" question mad_anomalies answers robustly; Grubbs is the
    parametric classic auditors expect next to it.

    Mean and variance come from DECIMAL-exact Σv and Σv² (products in
    IEEE double, sums in decimal — the welch/acf discipline), the
    outlier is an argmax over a (deviation, order) struct with a
    deterministic order tiebreak, and everything after the one
    aggregation pass is scalar arithmetic on a broadcast row.

    Returns one row: (n, at, value, g_stat), rounds 6.
    """
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    v = F.col(value_col).cast("double")
    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(v)).cast("double").alias("_s1"),
        F.sum(dec(v * v)).cast("double").alias("_s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s1") / n
    var = (n * F.col("_s2") - F.col("_s1") * F.col("_s1")) / (
        n * (n - F.lit(1.0))
    )
    enriched = stats.select("n", mean.alias("_mean"), F.sqrt(var).alias("_sd"))
    dev = F.abs(v - F.col("_mean"))
    arg = df.crossJoin(F.broadcast(enriched)).agg(
        F.max("n").alias("n_keep"),
        F.max("_mean").alias("_m"),
        F.max("_sd").alias("_sdk"),
        F.max(
            F.struct(
                dev.alias("d"),
                F.col(order_col).alias("o"),
                v.alias("v"),
            )
        ).alias("_top"),
    )
    return arg.select(
        F.col("n_keep").alias("n"),
        F.col("_top.o").alias("at"),
        F.round(F.col("_top.v"), 6).alias("value"),
        F.round(F.try_divide(F.col("_top.d"), F.col("_sdk")), 6).alias(
            "g_stat"
        ),
    )


def control_chart(
    df: DataFrame,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """XmR (individuals / moving-range) control chart summary — the
    Shewhart SPC screen: natural process limits are mean ± 2.66·mR̄
    where mR̄ is the mean absolute successive difference, and a point
    outside them is special-cause, not noise. The grandfather of
    cusum_changepoint (which localizes WHERE the shift happened; XmR
    says WHETHER today's point is out of control at all).

    The series mean and the moving ranges both reduce as DECIMALs
    (ranges from one LAG over the calendar-bounded grid — the
    ewma_smooth contract); limits and the violation count are one
    broadcast row plus a second bounded pass.

    Returns one row: (n, mean, mr_bar, ucl, lcl, n_violations),
    rounds 6.
    """
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    v = F.col(value_col).cast("double")
    w = Window.orderBy(order_col)
    ranged = df.select(
        v.alias("_v"), F.abs(v - F.lag(v).over(w)).alias("_mr")
    )
    stats = ranged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(dec(F.col("_v"))).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("_mean"),
        (F.sum(dec(F.col("_mr"))).cast("double")
         / F.count(F.col("_mr")).cast("double")).alias("_mrbar"),
    )
    limits = stats.select(
        "n",
        "_mean",
        "_mrbar",
        (F.col("_mean") + F.lit(2.66) * F.col("_mrbar")).alias("_ucl"),
        (F.col("_mean") - F.lit(2.66) * F.col("_mrbar")).alias("_lcl"),
    )
    flagged = df.select(v.alias("_v")).crossJoin(F.broadcast(limits))
    return flagged.groupBy("n", "_mean", "_mrbar", "_ucl", "_lcl").agg(
        F.sum(
            ((F.col("_v") > F.col("_ucl")) | (F.col("_v") < F.col("_lcl")))
            .cast("int")
        ).cast("long").alias("n_violations")
    ).select(
        "n",
        F.round("_mean", 6).alias("mean"),
        F.round("_mrbar", 6).alias("mr_bar"),
        F.round("_ucl", 6).alias("ucl"),
        F.round("_lcl", 6).alias("lcl"),
        "n_violations",
    )
