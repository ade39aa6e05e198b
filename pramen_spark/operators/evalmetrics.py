"""Model-evaluation metrics computed sort-free at corpus scale.

AUC here is the exact Mann-Whitney U statistic, computed WITHOUT ever
globally sorting the row-level data: scores aggregate to a (score,
n_pos, n_neg) histogram first, the running negative count runs over
that DOMAIN-sized table, and the U statistic folds back to integers —
so the result is exact (ties get the standard half credit) and
bit-reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC of ``score_col`` against boolean/0-1 ``label_col``.

    Returns ONE row (n_pos, n_neg, auc): the probability a random
    positive outranks a random negative, ties counted half (the
    Mann-Whitney U / rank-sum estimator) — computed from the integer
    identity ``2U = sum_s n_pos(s) * (2 * cum_neg(<s) + n_neg(s))``, so
    every intermediate is an exact BIGINT and the only double op is the
    final division.

    Scale: the row-level data reduces to the per-score histogram in one
    map-side-combined aggregation — the ONLY stage that sees data
    volume. The running window is ordered over that histogram, bounded
    by the score DOMAIN, not the row count (quantize continuous scores
    first to cap it, the standard streaming-AUC move). NULL scores or
    labels are excluded.
    """
    lab = df.select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("int").alias("y"),
    ).where(F.col("s").isNotNull() & F.col("y").isNotNull())
    h = lab.groupBy("s").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("nn"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "np", "nn", F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("cum_nn")
    )
    t = cum.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (F.lit(2) * F.col("cum_nn") + F.col("nn"))
        ).cast("long").alias("_u2"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("_u2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


def gini(df: DataFrame, value_col: str, id_col: str,
         decimal_type: str = "decimal(18,2)") -> DataFrame:
    """Gini coefficient of a non-negative value across entities — the
    inequality summary (how concentrated is spend / token mass /
    traffic?) that turns key_skew_profile's head-vs-body picture into
    one number.

    Returns ONE row (n, total, gini) from the sorted-rank identity
    ``G = (2 * sum_i i * x_(i)) / (n * sum x) - (n + 1) / n`` with rank
    ties broken by ``id_col``. Values are summed in DECIMAL so both
    rank-weighted and plain sums are exact; the Gini itself is a fixed
    scalar expression over them.

    Scale: ranks come from one window over the PER-ENTITY table (one
    row per id — entity domain, not event volume; aggregate first).
    The global ordering is the one inherently serial step; for
    monitoring at extreme entity counts switch to the binned/quantile
    approximation and keep this exact form as its oracle.
    """
    v = F.col(value_col).cast(decimal_type)
    w = Window.orderBy(F.col(value_col), F.col(id_col))
    ranked = df.select(
        v.alias("x"), F.row_number().over(w).cast("long").alias("i")
    )
    t = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("_t"),
        F.sum(F.col("i") * F.col("x")).alias("_s"),
    )
    g = (
        F.lit(2.0) * F.col("_s").cast("double") / F.col("_t").cast("double")
        - (F.col("n") + F.lit(1))
    ) / F.col("n")
    return t.select(
        "n",
        F.col("_t").cast("double").alias("total"),
        F.round(g, 6).alias("gini"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic score: per
    fixed-width probability bin, the member count, mean predicted
    probability, observed positive fraction, and |gap| — the table
    behind a calibration curve and the ECE (expected calibration
    error = sum over bins of (n/N) * gap).

    Returns (bin, n, mean_p, frac_pos, gap) for observed bins;
    ``prob_col`` must be in [0, 1] (1.0 folds into the top bin).

    Scale: ONE map-side-combined aggregation keyed by the bin id
    (<= n_bins groups); exact integer counts, the means on already
    aggregated sums. No window, no join.
    """
    p = F.col(prob_col)
    y = F.col(label_col).cast("int")
    b = F.least(
        F.floor(p * F.lit(int(n_bins))).cast("long"), F.lit(int(n_bins) - 1)
    )
    agg = (
        df.where(p.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(p).alias("_mp"),
            F.avg(y.cast("double")).alias("_fp"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.round("_mp", 6).alias("mean_p"),
        F.round("_fp", 6).alias("frac_pos"),
        F.round(F.abs(F.col("_mp") - F.col("_fp")), 6).alias("gap"),
    )


def ndcg_at_k(
    ranked: DataFrame,
    ideal: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    gain_col: str = "cosine",
    rank_col: str = "rank",
) -> DataFrame:
    """NDCG@k of a ranking against the ideal ordering — the
    graded-relevance quality gate beside topk_recall's binary one (an
    ANN index can hit 9/10 of the right ids but put the best one
    last; recall won't see that, NDCG will).

    ``ranked`` is the system's top-k (query, id, rank); gains come from
    ``ideal``'s ``gain_col`` (the ground-truth relevance, joined by id
    — items absent from the ideal top-k contribute 0), and IDCG from
    ``ideal``'s own ordering. Returns (query_id, dcg, idcg, ndcg)
    rounded to 6.

    Scale: both inputs are k rows per query; the gain join is co-keyed
    on (query, id) and the discounted sums aggregate per query —
    KB-scale however big the corpus behind the inputs."""
    disc = lambda r: F.log2(F.col(r).cast("double") + F.lit(1.0))
    sys_gain = (
        ranked.select(query_id_col, id_col, rank_col)
        # enforce k on the system side too (mirrors the ideal-side filter)
        # so an over-long ranked input can't inflate DCG past the @k cut.
        .where(F.col(rank_col) <= k)
        .join(
            ideal.select(
                query_id_col, id_col, F.col(gain_col).alias("_rel")
            ),
            [query_id_col, id_col],
            "left",
        )
        .select(
            query_id_col,
            (F.coalesce("_rel", F.lit(0.0)) / disc(rank_col)).alias("_g"),
        )
    )
    dcg = sys_gain.groupBy(query_id_col).agg(F.sum("_g").alias("_dcg"))
    idcg = (
        ideal.where(F.col(rank_col) <= k)
        .select(
            query_id_col,
            (F.col(gain_col) / disc(rank_col)).alias("_g"),
        )
        .groupBy(query_id_col)
        .agg(F.sum("_g").alias("_idcg"))
    )
    return dcg.join(idcg, query_id_col).select(
        query_id_col,
        F.round("_dcg", 6).alias("dcg"),
        F.round("_idcg", 6).alias("idcg"),
        F.round(F.col("_dcg") / F.col("_idcg"), 6).alias("ndcg"),
    )


def kaplan_meier(
    durations: DataFrame,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator over a right-censored duration
    table: one row per subject with an integer ``time_col`` (e.g. days
    from signup) and ``event_col`` = 1 if the terminal event (churn,
    conversion) was observed at that time, 0 if the subject was only
    observed that long (censored). Returns the survival curve at each
    observed event time: S(t) = Π_{t_i <= t} (1 − d_i / n_i).

    Shape: collapse subjects to the per-duration histogram (d_i events,
    c_i subjects leaving risk), compute the at-risk count n_i as a
    REVERSE running sum (everyone with duration >= t_i — no separate
    total needed; ties censored at t_i count as still at risk, the
    standard events-before-censorings convention), and the running
    product via exp(Σ ln) with an explicit zero flag: the moment a
    factor hits 0 (everyone at risk fails) survival pins to exactly 0
    instead of tripping ln(0), which Spark NULLs and DuckDB -infs.

    Scale: one map-side-combined aggregation to the duration histogram
    (bounded by the time domain in days, not subjects), then two
    windows over that KB-scale table. Nothing beyond the first
    aggregation sees subject volume.
    """
    g = durations.groupBy(F.col(time_col).cast("long").alias("t")).agg(
        F.sum(F.col(event_col).cast("int")).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w_fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_rev = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    risked = g.withColumn("at_risk", F.sum("c").over(w_rev))
    # separate selects: a higher-order/window ref against a same-select
    # alias can bind to the wrong column (the quantize_embeddings lesson)
    factored = risked.withColumn(
        "_f",
        (F.col("at_risk") - F.col("d")).cast("double")
        / F.col("at_risk").cast("double"),
    )
    swept = factored.select(
        "t",
        "d",
        "at_risk",
        F.sum(F.when(F.col("_f") > 0, F.log(F.col("_f")))).over(w_fwd).alias("_lnsum"),
        F.max((F.col("_f") == 0).cast("int")).over(w_fwd).alias("_zero"),
    )
    survival = F.when(F.col("_zero") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.coalesce(F.col("_lnsum"), F.lit(0.0))), 6)
    )
    return swept.where(F.col("d") > 0).select(
        F.col("t").alias("time"),
        F.col("d").alias("n_events"),
        "at_risk",
        survival.alias("survival"),
    )


def cohens_kappa(df: DataFrame, col_a, col_b) -> DataFrame:
    """Cohen's kappa between two categorical labelings of the same rows
    — inter-annotator (or heuristic-vs-gold) agreement corrected for
    chance: κ = (p_o − p_e) / (1 − p_e). The one-number companion to a
    confusion matrix (langid_confusion shows WHERE they disagree;
    kappa says whether the agreement beats guessing at all).

    Everything is exact integer counting until three final divisions:
    the (a, b) contingency reduces once, the diagonal and marginals
    re-aggregate that KB-scale table, and the expected-agreement
    product Σ row_k · col_k sums as DECIMAL (counts can square past
    int64 at corpus scale). Degenerate labelings (p_e = 1: both sides
    constant) yield NULL via try_divide, not a crash.

    Returns one row: (n, po, pe, kappa), rounds 6.
    """
    pairs = df.groupBy(
        F.col(col_a).alias("_a") if isinstance(col_a, str) else col_a.alias("_a"),
        F.col(col_b).alias("_b") if isinstance(col_b, str) else col_b.alias("_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    tot = pairs.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0))
        .cast("long")
        .alias("_agree"),
    )
    rows = pairs.groupBy("_a").agg(F.sum("_n").cast("long").alias("_ra"))
    cols = pairs.groupBy("_b").agg(F.sum("_n").cast("long").alias("_cb"))
    prod = (
        rows.join(cols, rows["_a"] == cols["_b"])
        .agg(
            F.sum(
                (F.col("_ra") * F.col("_cb")).cast("decimal(38,0)")
            ).cast("double").alias("_rowcol")
        )
    )
    j = tot.crossJoin(F.broadcast(prod))
    n = F.col("n").cast("double")
    po = F.col("_agree").cast("double") / n
    pe = F.col("_rowcol") / (n * n)
    return j.select(
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
    )


def mcnemar_test(df: DataFrame, label_col, pred_col) -> DataFrame:
    """McNemar's test for paired binary labelings: of the rows where
    the two labelings DISAGREE, is the disagreement symmetric? The
    right before/after-model comparison — accuracy deltas mislead when
    both models agree on the easy 95%, McNemar looks only at the
    discordant cells. χ² = (b − c)² / (b + c) on the exact integer
    discordant counts (b: label true / pred false; c: the reverse);
    no-disagreement data yields NULL via try_divide.

    Returns one row: (n, n_both_pos, n_both_neg, n_b, n_c, chi2),
    round 6.
    """
    y = label_col.cast("boolean")
    p = pred_col.cast("boolean")
    cells = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((y & p).cast("int")).cast("long").alias("n_both_pos"),
        F.sum((~y & ~p).cast("int")).cast("long").alias("n_both_neg"),
        F.sum((y & ~p).cast("int")).cast("long").alias("n_b"),
        F.sum((~y & p).cast("int")).cast("long").alias("n_c"),
    )
    b = F.col("n_b").cast("double")
    c = F.col("n_c").cast("double")
    return cells.select(
        "n",
        "n_both_pos",
        "n_both_neg",
        "n_b",
        "n_c",
        F.round(F.try_divide((b - c) * (b - c), b + c), 6).alias("chi2"),
    )


def gains_curve(
    df: DataFrame,
    score_col,
    label_col,
    bins: int = 10,
) -> DataFrame:
    """Cumulative gains (CAP) curve: rank rows by score into quantile
    bins and report, from the TOP bin down, the cumulative share of
    all positives captured — "the top 20% of scores catch 71% of the
    positives", the number a targeting budget is actually set by.
    Completes the eval family: AUC summarizes rank quality,
    calibration_bins checks probability meaning, gains prices the
    cut-off.

    Bins come from broadcast exact-percentile thresholds (the
    woe_iv/rfm pattern — never NTILE); capture cumulates over the
    ``bins``-row table from the highest bin down. All counts exact
    integers; two divisions per output row.

    Returns (bin, n, n_pos, capture, cum_capture) with bin 1 = lowest
    scores, cum_capture measured from bin ``bins`` downward, round 6.
    """
    from pyspark.sql import Window as W

    qs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    th = df.agg(F.percentile(score_col, qs).alias("_th"))
    b = F.lit(1)
    for i in range(1, bins):
        b = b + (score_col > F.element_at(F.col("_th"), i)).cast("int")
    g = (
        df.crossJoin(F.broadcast(th))
        .groupBy(b.cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(label_col.cast("int")).cast("long").alias("n_pos"),
        )
    )
    w_rev = W.orderBy(F.desc("bin")).rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy(F.desc("bin")).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.round(
            F.try_divide(
                F.col("n_pos").cast("double"),
                F.sum("n_pos").over(w_all).cast("double"),
            ),
            6,
        ).alias("capture"),
        F.round(
            F.try_divide(
                F.sum("n_pos").over(w_rev).cast("double"),
                F.sum("n_pos").over(w_all).cast("double"),
            ),
            6,
        ).alias("cum_capture"),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """:func:`gini` fanned out over a grouping key: one inequality
    coefficient per segment from rank-ordered decimal sums — "is spend
    concentration a BUILDING segment problem or everywhere?", the
    comparison the global number cannot answer.

    Same sorted-rank identity, but the ranking window PARTITIONS BY
    THE GROUP, so segments rank in parallel and the one inherently
    serial step of the global form disappears; per-group n / Σx /
    Σi·x reduce in a single aggregation.

    Returns (group, n, total, gini) per group, round 6.
    """
    v = F.col(value_col).cast(decimal_type)
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col)
    )
    ranked = df.select(
        F.col(group_col).alias("grp"),
        v.alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    t = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("_t"),
        F.sum(F.col("i") * F.col("x")).alias("_s"),
    )
    g = (
        F.lit(2.0) * F.col("_s").cast("double") / F.col("_t").cast("double")
        - (F.col("n") + F.lit(1))
    ) / F.col("n")
    return t.select(
        "grp",
        "n",
        F.col("_t").cast("double").alias("total"),
        F.round(g, 6).alias("gini"),
    )
