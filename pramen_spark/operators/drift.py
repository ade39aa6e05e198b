"""Distribution-drift monitoring between two dataset snapshots: fixed-grid
histograms and Population Stability Index (PSI) — the check a recurring
pipeline runs between yesterday's and today's batch before accepting a
refresh (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 drifted).

Scale: each side is ONE map-side-combined aggregation into
``num_buckets`` rows (bucket bounds are fixed constants, not quantiles,
so no pre-pass and no sort); the join and PSI arithmetic run on
2 x num_buckets rows. Laplace smoothing keeps empty buckets finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    num_buckets: int = 10,
) -> DataFrame:
    """(bucket, n) counts over a fixed [lo, hi) grid; values outside the
    range clamp into the edge buckets, NULLs are dropped."""
    c = F.col(col).cast("double")
    width = (hi - lo) / num_buckets
    bucket = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(num_buckets - 1),
    ).cast("long")
    return (
        df.where(c.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    num_buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-bucket drift report between a reference and a current snapshot:
    (bucket, ref_rate, cur_rate, psi_term), with rates Laplace-smoothed by
    one count per bucket so empty buckets stay finite. Total PSI is
    SUM(psi_term); terms and rates are rounded for engine-portable
    comparison."""
    h_ref = value_histogram(ref, col, lo, hi, num_buckets).withColumnRenamed(
        "n", "n_ref"
    )
    h_cur = value_histogram(cur, col, lo, hi, num_buckets).withColumnRenamed(
        "n", "n_cur"
    )
    grid = ref.sparkSession.range(num_buckets).select(F.col("id").alias("bucket"))
    joined = (
        grid.join(h_ref, "bucket", "left")
        .join(h_cur, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    k = F.lit(float(num_buckets))
    p = (F.col("n_ref") + F.lit(1.0)) / (F.col("t_ref") + k)
    q = (F.col("n_cur") + F.lit(1.0)) / (F.col("t_cur") + k)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(p, round_to).alias("ref_rate"),
            F.round(q, round_to).alias("cur_rate"),
            F.round((q - p) * F.log(q / p), round_to).alias("psi_term"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-level diff between two corpus snapshots: one row per id
    with status ``added`` (only in ``new``), ``removed`` (only in
    ``old``), ``changed`` (both, different content hash) or ``unchanged``
    — the audit a recurring ingestion runs before accepting a refreshed
    dump (how much actually changed? did the provider silently rewrite
    history?). Aggregate the output for the report; gate on it with
    :mod:`pramen_spark.operators.validation` rules.

    Scale: each side reduces to (id, sha256) before the single full-outer
    join — the shuffle carries 8-byte ids + 64-byte hashes, never text.
    Snapshots persisted bucketed by ``id_col`` (see
    ``operators/dedup.py::persist_hash_ledger`` for the writer pattern)
    join with no exchange at all."""
    o = old.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("_h_old")
    )
    nw = new.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("_h_new")
    )
    j = o.join(nw, id_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def ks_binned(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    num_buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over a fixed bin grid: the
    maximum absolute gap between the two empirical CDFs, evaluated at the
    bin edges. Complements :func:`psi` (which weights every bucket) with
    the classic worst-gap test a monitoring gate thresholds on; the exact
    (unbinned) KS needs a global sort of both samples — the binned form
    trades edge resolution for ONE map-side-combined aggregation per side,
    which is the only version that makes sense at 100 TB anyway.

    Returns one row: (ks_stat, n_ref, n_cur). Deterministic: integer bin
    counts cumulate exactly; each CDF value is a single division, and the
    max-of-abs-diffs is order-free.

    Scale: histograms reduce each side to ``num_buckets`` rows; the
    full-outer bucket join, cumulative window, and max all run on
    <= 2*num_buckets rows (the window's single partition holds bucket
    summaries, never raw data)."""
    h_ref = value_histogram(ref, col, lo, hi, num_buckets).withColumnRenamed("n", "n_ref")
    h_cur = value_histogram(cur, col, lo, hi, num_buckets).withColumnRenamed("n", "n_cur")
    both = (
        h_ref.join(h_cur, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    from pyspark.sql import Window as W

    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cdf = both.select(
        F.sum("n_ref").over(w_cum).alias("c_ref"),
        F.sum("n_cur").over(w_cum).alias("c_cur"),
        F.sum("n_ref").over(w_all).alias("t_ref"),
        F.sum("n_cur").over(w_all).alias("t_cur"),
    )
    gap = F.abs(
        F.col("c_ref") / F.col("t_ref") - F.col("c_cur") / F.col("t_cur")
    )
    return cdf.agg(
        F.round(F.max(gap), 6).alias("ks_stat"),
        F.max("t_ref").cast("long").alias("n_ref"),
        F.max("t_cur").cast("long").alias("n_cur"),
    )


def chi2_categorical(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """Chi-square drift decomposition for a CATEGORICAL column (PSI/KS
    cover numeric grids): per category, observed counts on each side vs
    the expected counts under the pooled distribution, and the category's
    additive chi-square contribution — the rows a drift dashboard sorts
    to answer "WHICH category moved". Sum the contributions for the
    classic test statistic (df = categories - 1).

    Returns (category, n_ref, n_cur, contrib) with
    ``contrib = (o_r - e_r)^2/e_r + (o_c - e_c)^2/e_c`` where
    ``e_side = (n_ref_cat + n_cur_cat) * N_side / N``. Per-category
    contributions are each a handful of exact-integer-derived divisions
    (deterministic, ROUND(6)); emitting the decomposition instead of one
    summed scalar keeps the oracle order-free.

    Scale: one map-side-combined count per side, a full-outer join on the
    (small) category set, and four broadcast scalars — nothing touches
    raw rows twice."""
    cnt = lambda df: df.where(F.col(col).isNotNull()).groupBy(
        F.col(col).alias("category")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    h_ref = cnt(ref).withColumnRenamed("n", "n_ref")
    h_cur = cnt(cur).withColumnRenamed("n", "n_cur")
    both = (
        h_ref.join(h_cur, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    totals = both.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    j = both.crossJoin(F.broadcast(totals))
    pooled = (F.col("n_ref") + F.col("n_cur")).cast("double")
    n = (F.col("t_ref") + F.col("t_cur")).cast("double")
    e_ref = pooled * F.col("t_ref") / n
    e_cur = pooled * F.col("t_cur") / n
    # try_divide: an empty snapshot (t_ref or t_cur = 0) gives expected
    # count 0 — NULL the contribution consistently on both engines rather
    # than throwing under ANSI mode (module-wide degenerate-input rule).
    contrib = (
        F.try_divide((F.col("n_ref") - e_ref) * (F.col("n_ref") - e_ref), e_ref)
        + F.try_divide((F.col("n_cur") - e_cur) * (F.col("n_cur") - e_cur), e_cur)
    )
    return j.select(
        "category",
        "n_ref",
        "n_cur",
        F.round(contrib, 6).alias("contrib"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Pointwise and aggregate mutual information between two categorical
    columns — the dependence measure behind feature-selection and
    leakage screens (a feature with high MI against the label column is
    either predictive or leaking it), complementing chi2_categorical's
    significance decomposition with an information-theoretic effect
    size.

    Returns one row per observed (x, y) cell: joint count, PMI
    log2(p(x,y) / (p(x) p(y))) and the cell's MI contribution
    p(x,y) * PMI; SUM(mi_contrib) over the result is the mutual
    information in bits.

    Scale: ONE shuffle — the (x, y) contingency aggregation with
    map-side combine. Marginals and the grand total re-aggregate the
    contingency table itself (|X|*|Y| rows, KB-scale) and join back
    broadcast; the raw table is scanned once.
    """
    joint = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    mx = joint.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    pmi = F.log2(
        F.col("n_xy").cast("double") * F.col("n")
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.col("n_xy").cast("long").alias("n_xy"),
            F.round(pmi, 6).alias("pmi"),
            F.round(
                F.col("n_xy").cast("double") / F.col("n") * pmi, 9
            ).alias("mi_contrib"),
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two groups of
    a numeric column — the A/B experiment readout (and the parametric
    sibling of ks_binned's distribution-free test). Welch rather than
    pooled Student: arm variances in real experiments are never equal.

    Returns ONE row: (n_a, n_b, mean_a, mean_b, t_stat, dof) with the
    Welch-Satterthwaite degrees of freedom; means and the statistic
    round to 6.

    Scale: a single aggregation pass with conditional aggregates —
    count/mean/variance per arm computed map-side combined; every
    downstream value is scalar arithmetic on the one result row. No
    shuffle beyond the 1-row reduce.
    """
    a = F.col(group_col) == F.lit(group_a)
    b = F.col(group_col) == F.lit(group_b)
    v = F.col(value_col)
    agg = df.where(a | b).agg(
        F.count(F.when(a, 1)).cast("long").alias("n_a"),
        F.count(F.when(b, 1)).cast("long").alias("n_b"),
        F.avg(F.when(a, v)).alias("_ma"),
        F.avg(F.when(b, v)).alias("_mb"),
        F.var_samp(F.when(a, v)).alias("_va"),
        F.var_samp(F.when(b, v)).alias("_vb"),
    )
    sa = F.col("_va") / F.col("n_a")
    sb = F.col("_vb") / F.col("n_b")
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(sa + sb)
    dof = (sa + sb) * (sa + sb) / (
        sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("_ma", 6).alias("mean_a"),
        F.round("_mb", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def proportion_ci(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Wilson score interval per group for a boolean success column —
    the small-sample-safe CTR/conversion readout (the naive normal
    interval collapses or exits [0,1] at extreme rates; Wilson never
    does). Deterministic closed form, so the oracle replays it exactly.

    Returns (group, n, successes, rate, ci_lo, ci_hi) rounded to 6.

    Scale: one map-side-combined aggregation; the interval is scalar
    arithmetic on (n, successes). No window, no join.
    """
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias("successes"),
    )
    n = F.col("n").cast("double")
    p = F.col("successes") / n
    z2 = F.lit(float(z) * float(z))
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(float(z)) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return agg.select(
        "grp",
        "n",
        "successes",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    )


def spearman(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    monotone-association readout that survives the heavy tails and
    outliers that wreck Pearson, computed EXACTLY (average ranks for
    ties) without ever ranking row-by-row.

    The trick: a value's average rank is (#smaller) + (#equal + 1)/2,
    which depends only on the VALUE HISTOGRAM — so ranks come from a
    running sum over each column's distinct-value table (the auc
    histogram trick) and join back by value. Ranks are scaled by 2
    (r2 = 2·#smaller + #equal + 1) to stay integer-exact through the
    half-rank ties; Pearson is scale-invariant so rho is unchanged.
    All co-moment sums reduce as DECIMALs — the statistic is
    bit-reproducible at any cluster size; the only float step is the
    final scalar formula.

    Scale: two distinct-value aggregations (map-side combined, bounded
    by each column's DOMAIN), two windows over those domain tables,
    two value-keyed joins back, one reduce. No global row sort, no
    single-partition stage over row volume.

    Returns one row: (n, rho).
    """
    base = df.select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    def rank2(src_col: str, v_alias: str, r_alias: str) -> DataFrame:
        g = base.groupBy(F.col(src_col).alias(v_alias)).agg(
            F.count(F.lit(1)).alias("_c")
        )
        w = Window.orderBy(v_alias).rowsBetween(Window.unboundedPreceding, -1)
        return g.select(
            v_alias,
            (
                F.lit(2) * F.coalesce(F.sum("_c").over(w), F.lit(0))
                + F.col("_c")
                + F.lit(1)
            ).cast("long").alias(r_alias),
        )

    rx = rank2("_x", "_vx", "_r2x")
    ry = rank2("_y", "_vy", "_r2y")
    j = (
        base.join(rx, base["_x"] == rx["_vx"])
        .join(ry, base["_y"] == ry["_vy"])
        .select("_r2x", "_r2y")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_r2x"))).cast("double").alias("_sx"),
        F.sum(dec(F.col("_r2y"))).cast("double").alias("_sy"),
        F.sum(dec(F.col("_r2x") * F.col("_r2y"))).cast("double").alias("_sxy"),
        F.sum(dec(F.col("_r2x") * F.col("_r2x"))).cast("double").alias("_sxx"),
        F.sum(dec(F.col("_r2y") * F.col("_r2y"))).cast("double").alias("_syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(
        (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (n * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    return s.select("n", F.round(F.try_divide(num, den), 6).alias("rho"))


def ols_fit(df: DataFrame, x_expr, y_expr) -> DataFrame:
    """Simple least-squares fit of y on x from decimal-exact co-moment
    sums — the workhorse behind elasticity estimates and any
    log-log/semi-log regression readout. Slope, intercept and R² from
    one aggregation pass: products in IEEE double (identical on every
    engine), sums in DECIMAL, so the fit never depends on reduce order
    (the autocorrelation/spearman discipline).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²); R² = num² / (denx · deny).
    Zero-variance x (or y for R²) yields NULL via try_divide on both
    engines. Returns one row: (n, slope, intercept, r2), rounds 6.

    Scale: one map-side-combined aggregation; everything after is
    scalar arithmetic on the single result row.
    """
    base = df.select(
        x_expr.cast("double").alias("_x"), y_expr.cast("double").alias("_y")
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    s = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).cast("double").alias("_sx"),
        F.sum(dec(F.col("_y"))).cast("double").alias("_sy"),
        F.sum(dec(F.col("_x") * F.col("_y"))).cast("double").alias("_sxy"),
        F.sum(dec(F.col("_x") * F.col("_x"))).cast("double").alias("_sxx"),
        F.sum(dec(F.col("_y") * F.col("_y"))).cast("double").alias("_syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    denx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    deny = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.try_divide(num, denx)
    return s.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.try_divide(F.col("_sy") - slope * F.col("_sx"), n), 6
        ).alias("intercept"),
        F.round(F.try_divide(num * num, denx * deny), 6).alias("r2"),
    )


def anova_oneway(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """One-way ANOVA F statistic: does the mean of ``value_col`` differ
    across the levels of ``group_col`` more than within-level noise
    explains? The k-group generalization of welch_ttest's two arms —
    the screen that says WHETHER a categorical dimension matters
    before per-pair tests say where.

    Per-group n/Σv/Σv² reduce as DECIMALs (exact for integer-valued
    metrics like day latencies); the between/within sum-of-squares
    identity SSB = Σsᵢ²/nᵢ − S²/N and SSW = Σssᵢ − Σsᵢ²/nᵢ runs on the
    k-row group table, so the only reduce-order-exposed float work is
    a k-term sum of exact-derived doubles (ulp-level, invisible at
    round 6).

    Returns one row: (k, n, f_stat, ss_between, ss_within), rounds 6.
    """
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    v = value_col if not isinstance(value_col, str) else F.col(value_col)
    vv = v.cast("double")
    g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(dec(vv)).cast("double").alias("_s"),
        F.sum(dec(vv * vv)).cast("double").alias("_ss"),
    )
    red = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n"),
        F.sum(dec(F.col("_s"))).cast("double").alias("_S"),
        F.sum(dec(F.col("_ss"))).cast("double").alias("_SS"),
        F.sum(F.col("_s") * F.col("_s") / F.col("_n").cast("double"))
        .alias("_sq_over_n"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("_sq_over_n") - F.col("_S") * F.col("_S") / n
    ssw = F.col("_SS") - F.col("_sq_over_n")
    f_stat = F.try_divide(ssb / (k - F.lit(1.0)), ssw / (n - k))
    return red.select(
        "k",
        "n",
        F.round(f_stat, 6).alias("f_stat"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
    )


def ols_by_group(
    df: DataFrame, group_col: str, x_expr, y_expr
) -> DataFrame:
    """Per-group simple OLS — :func:`ols_fit` fanned out over a
    grouping key in ONE aggregation pass: each group gets its own
    slope/intercept/R² from decimal-exact co-moments. The "is revenue
    trending differently per segment" readout without k separate
    scans.

    Returns (group, n, slope, intercept, r2), rounds 6; zero-variance
    groups NULL via try_divide.
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        x_expr.cast("double").alias("_x"),
        y_expr.cast("double").alias("_y"),
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    s = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).cast("double").alias("_sx"),
        F.sum(dec(F.col("_y"))).cast("double").alias("_sy"),
        F.sum(dec(F.col("_x") * F.col("_y"))).cast("double").alias("_sxy"),
        F.sum(dec(F.col("_x") * F.col("_x"))).cast("double").alias("_sxx"),
        F.sum(dec(F.col("_y") * F.col("_y"))).cast("double").alias("_syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    denx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    deny = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.try_divide(num, denx)
    return s.select(
        "grp",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.try_divide(F.col("_sy") - slope * F.col("_sx"), n), 6
        ).alias("intercept"),
        F.round(F.try_divide(num * num, denx * deny), 6).alias("r2"),
    )


def odds_ratio(
    df: DataFrame, exposure_col, outcome_col
) -> DataFrame:
    """2×2 odds ratio with the Woolf log-OR 95% interval: how much the
    odds of ``outcome`` change under ``exposure`` (both boolean
    expressions) — the case-control readout that, unlike a rate ratio,
    survives outcome rarity. Wilson CIs (wilson_ctr) bound one
    proportion; this compares two.

    The 2×2 cells are one conditional aggregation of exact integers;
    OR = (a·d)/(b·c) and the interval exp(ln OR ± 1.96·√(1/a + 1/b +
    1/c + 1/d)) are scalar arithmetic on the single row. Any empty
    cell yields NULL OR/CI via try_divide (the standard
    continuity-correction decision is the caller's, not silent).

    Returns one row: (n_exp_pos, n_exp_neg, n_unexp_pos, n_unexp_neg,
    odds_ratio, ci_lo, ci_hi), rounds 6.
    """
    e = exposure_col.cast("boolean")
    o = outcome_col.cast("boolean")
    cells = df.agg(
        F.sum((e & o).cast("int")).cast("long").alias("n_exp_pos"),
        F.sum((e & ~o).cast("int")).cast("long").alias("n_exp_neg"),
        F.sum((~e & o).cast("int")).cast("long").alias("n_unexp_pos"),
        F.sum((~e & ~o).cast("int")).cast("long").alias("n_unexp_neg"),
    )
    a = F.col("n_exp_pos").cast("double")
    b = F.col("n_exp_neg").cast("double")
    c = F.col("n_unexp_pos").cast("double")
    d = F.col("n_unexp_neg").cast("double")
    orr = F.try_divide(a * d, b * c)
    se = F.sqrt(
        F.try_divide(F.lit(1.0), a) + F.try_divide(F.lit(1.0), b)
        + F.try_divide(F.lit(1.0), c) + F.try_divide(F.lit(1.0), d)
    )
    return cells.select(
        "n_exp_pos",
        "n_exp_neg",
        "n_unexp_pos",
        "n_unexp_neg",
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - F.lit(1.96) * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + F.lit(1.96) * se), 6).alias("ci_hi"),
    )


def two_proportion_ztest(
    df: DataFrame, group_expr, outcome_expr
) -> DataFrame:
    """Pooled two-proportion z-test: is the outcome rate different
    between the two groups ``group_expr`` splits the rows into?
    z = (p₁ − p₂) / √(p̂(1 − p̂)(1/n₁ + 1/n₂)) with p̂ the pooled rate —
    the rate-difference companion to odds_ratio's multiplicative view
    (report both: they disagree exactly when base rates are extreme).

    One conditional aggregation of exact integers; the statistic is
    scalar arithmetic on the single row. An empty group or a
    degenerate pooled rate yields NULL via try_divide.

    Returns one row: (n_1, x_1, n_2, x_2, p_1, p_2, z), rounds 6.
    """
    g = group_expr.cast("boolean")
    o = outcome_expr.cast("boolean")
    cells = df.agg(
        F.sum(g.cast("int")).cast("long").alias("n_1"),
        F.sum((g & o).cast("int")).cast("long").alias("x_1"),
        F.sum((~g).cast("int")).cast("long").alias("n_2"),
        F.sum((~g & o).cast("int")).cast("long").alias("x_2"),
    )
    n1 = F.col("n_1").cast("double")
    x1 = F.col("x_1").cast("double")
    n2 = F.col("n_2").cast("double")
    x2 = F.col("x_2").cast("double")
    p1 = F.try_divide(x1, n1)
    p2 = F.try_divide(x2, n2)
    pool = F.try_divide(x1 + x2, n1 + n2)
    z = F.try_divide(
        p1 - p2,
        F.sqrt(
            pool * (F.lit(1.0) - pool)
            * (F.try_divide(F.lit(1.0), n1) + F.try_divide(F.lit(1.0), n2))
        ),
    )
    return cells.select(
        "n_1",
        "x_1",
        "n_2",
        "x_2",
        F.round(p1, 6).alias("p_1"),
        F.round(p2, 6).alias("p_2"),
        F.round(z, 6).alias("z"),
    )


def ols2_fit(df: DataFrame, x1_expr, x2_expr, y_expr) -> DataFrame:
    """TWO-regressor least squares — y = b0 + b1*x1 + b2*x2 — solved in
    closed form by Cramer's rule over the 3x3 normal equations, from the
    same decimal-exact moment sums :func:`ols_fit` uses (products in
    IEEE double, sums in DECIMAL, so nothing depends on reduce order).
    The multivariate step ols_fit cannot take: separating two correlated
    drivers (price on quantity AND discount; latency on size AND hour)
    instead of attributing their shared variance to whichever ran first.

    Returns one row (n, b0, b1, b2, r2), rounds 6. A singular system
    (collinear regressors, zero variance) yields NULL coefficients via
    try_divide — same convention as the rest of the module.

    Scale: ONE map-side-combined aggregation collecting 9 moments;
    everything after is scalar arithmetic on the single result row.
    """
    base = df.select(
        x1_expr.cast("double").alias("_a"),
        x2_expr.cast("double").alias("_b"),
        y_expr.cast("double").alias("_y"),
    ).where(
        F.col("_a").isNotNull() & F.col("_b").isNotNull() & F.col("_y").isNotNull()
    )
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    s = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_a"))).cast("double").alias("_sa"),
        F.sum(dec(F.col("_b"))).cast("double").alias("_sb"),
        F.sum(dec(F.col("_y"))).cast("double").alias("_sy"),
        F.sum(dec(F.col("_a") * F.col("_a"))).cast("double").alias("_saa"),
        F.sum(dec(F.col("_b") * F.col("_b"))).cast("double").alias("_sbb"),
        F.sum(dec(F.col("_a") * F.col("_b"))).cast("double").alias("_sab"),
        F.sum(dec(F.col("_a") * F.col("_y"))).cast("double").alias("_say"),
        F.sum(dec(F.col("_b") * F.col("_y"))).cast("double").alias("_sby"),
        F.sum(dec(F.col("_y") * F.col("_y"))).cast("double").alias("_syy"),
    )
    n = F.col("n").cast("double")
    sa, sb, sy = F.col("_sa"), F.col("_sb"), F.col("_sy")
    saa, sbb, sab = F.col("_saa"), F.col("_sbb"), F.col("_sab")
    say, sby = F.col("_say"), F.col("_sby")
    # det of [[n, sa, sb], [sa, saa, sab], [sb, sab, sbb]] — written in ONE
    # fixed expression order so both engines evaluate identical doubles
    det = (
        n * (saa * sbb - sab * sab)
        - sa * (sa * sbb - sab * sb)
        + sb * (sa * sab - saa * sb)
    )
    det0 = (
        sy * (saa * sbb - sab * sab)
        - sa * (say * sbb - sab * sby)
        + sb * (say * sab - saa * sby)
    )
    det1 = (
        n * (say * sbb - sab * sby)
        - sy * (sa * sbb - sab * sb)
        + sb * (sa * sby - say * sb)
    )
    det2 = (
        n * (saa * sby - say * sab)
        - sa * (sa * sby - say * sb)
        + sy * (sa * sab - saa * sb)
    )
    b0 = F.try_divide(det0, det)
    b1 = F.try_divide(det1, det)
    b2 = F.try_divide(det2, det)
    sse = F.col("_syy") - b0 * sy - b1 * say - b2 * sby
    sst = F.col("_syy") - sy * sy / n
    return s.select(
        "n",
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(F.lit(1.0) - F.try_divide(sse, sst), 6).alias("r2"),
    )
