"""Feature-engineering transforms for tabular ML pipelines: smoothed
target encoding and long-tail category collapse.

Both are fit-transform shapes where the "fit" artifact is a KB-scale
aggregate (per-category statistics, the frequent-category set) that
broadcasts back into a single pass over the data — the same
build-small/probe-big pattern as the vocabulary and centroid operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column:
    ``enc = (sum_cat + m * global_mean) / (n_cat + m)`` — the empirical
    Bayes shrinkage that keeps rare categories near the global mean
    instead of memorizing their few targets (the leakage-prone naive
    mean encoder's failure mode).

    Returns the encoder table (category, n, enc) to be broadcast-joined
    onto train/serve data. Target sums run in DECIMAL so they are exact
    and order-independent; every double op afterwards is a fixed scalar
    expression — the encoder is bit-reproducible across runs and
    engines.

    Scale: one map-side-combined aggregation keyed by category; the
    global mean derives from re-aggregating the category table
    (KB-scale) and broadcasts. The raw table is scanned once.
    """
    per_cat = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(target_col).cast(decimal_type)).alias("_sum"),
    )
    glob = per_cat.agg(
        (
            F.sum("_sum").cast("double") / F.sum("n").cast("double")
        ).alias("_gmean")
    )
    m = float(smoothing)
    return per_cat.crossJoin(F.broadcast(glob)).select(
        "category",
        "n",
        F.round(
            (F.col("_sum").cast("double") + F.lit(m) * F.col("_gmean"))
            / (F.col("n") + F.lit(m)),
            6,
        ).alias("enc"),
    )


def collapse_rare(
    df: DataFrame,
    col: str,
    min_count: int,
    other_label: str = "__other__",
) -> DataFrame:
    """Collapse long-tail categories below ``min_count`` occurrences
    into ``other_label`` — vocabulary truncation for categorical
    features (and the `<unk>` mapping of token vocabularies): unbounded
    category domains become fixed-width one-hot/embedding tables and
    singleton categories stop memorizing individual rows.

    Returns ``df`` with ``col`` replaced by the collapsed value.

    Scale: the FREQUENT set (bounded above by |rows| / min_count,
    KB-scale for any real threshold) builds in one map-side-combined
    aggregation and broadcast-joins back; rows map in a single pass,
    no shuffle of the data itself.
    """
    frequent = (
        df.groupBy(F.col(col).alias("_cat"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("_cat", F.lit(True).alias("_keep"))
    )
    joined = df.join(
        F.broadcast(frequent), df[col] == frequent["_cat"], "left"
    )
    return joined.withColumn(
        col,
        F.when(F.col("_keep"), F.col(col)).otherwise(F.lit(other_label)),
    ).drop("_cat", "_keep")


def feature_hash_audit(
    df: DataFrame, col: str, n_buckets: int = 4096
) -> DataFrame:
    """Collision audit for the hashing trick (feature hashing): how many
    distinct values share a bucket at the chosen width — the number that
    decides whether 2^k buckets is enough before anyone trains on
    hashed features. Buckets use the md5-prefix hash (engine-portable,
    the sampling._hash_unit construction) so the audit is reproducible
    anywhere; production hashing can use any function once the width is
    chosen.

    Returns ONE row (n_values, n_buckets_used, n_collided,
    collision_rate).

    Scale: the value domain deduplicates first (the only data-volume
    stage, map-side combined); the audit is one exact two-distinct
    aggregation over the domain table.
    """
    vals = df.select(F.col(col).alias("v")).distinct()
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("v")), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )
    b = vals.select("v", bucket.alias("bucket"))
    return b.agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.countDistinct("bucket").cast("long").alias("n_buckets_used"),
        (F.count(F.lit(1)) - F.countDistinct("bucket"))
        .cast("long")
        .alias("n_collided"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("bucket"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("collision_rate"),
    )


def rfm_scores(
    df: DataFrame,
    cust_col: str,
    date_col: str,
    amount_col: str,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring — the
    classic behavioral segmentation — with quartile scores assigned via
    BROADCAST exact-percentile thresholds, not a global NTILE window
    (the curriculum_thresholds pattern: a rank window over all
    customers is a single-partition sort; three threshold comparisons
    are a zero-shuffle map).

    Returns per customer: (customer, recency_days, frequency, monetary,
    r_score, f_score, m_score), each score 1-4 = number of quartile
    thresholds STRICTLY exceeded plus one. Note r_score 4 means MOST
    days since last order (callers wanting "4 = best" invert it);
    monetary sums run in DECIMAL so thresholds see exact inputs.

    Scale: one map-side-combined per-customer aggregation (the only
    order-volume stage), one 1-row percentile aggregate over the
    per-customer table, broadcast back as nine literal comparisons.
    """
    day = F.to_date(F.col(date_col))
    per = df.groupBy(F.col(cust_col).alias("customer")).agg(
        F.max(day).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col(amount_col).cast(decimal_type))
        .cast("double")
        .alias("monetary"),
    )
    horizon = per.agg(F.max("_last").alias("_mx"))
    base = per.crossJoin(F.broadcast(horizon)).select(
        "customer",
        F.datediff(F.col("_mx"), F.col("_last")).cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    th = base.agg(
        F.percentile(F.col("recency_days"), qs).alias("_tr"),
        F.percentile(F.col("frequency"), qs).alias("_tf"),
        F.percentile(F.col("monetary"), qs).alias("_tm"),
    )

    def score(col, tcol):
        s = F.lit(1)
        for i in (1, 2, 3):
            s = s + (F.col(col) > F.element_at(F.col(tcol), i)).cast("int")
        return s.cast("long")

    return base.crossJoin(F.broadcast(th)).select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        score("recency_days", "_tr").alias("r_score"),
        score("frequency", "_tf").alias("f_score"),
        score("monetary", "_tm").alias("m_score"),
    )


def skyline_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
) -> DataFrame:
    """Two-dimensional skyline (Pareto frontier): keep the rows no other
    row dominates, where A dominates B iff A is no worse on both axes
    (``cost`` <=, ``gain`` >=) and strictly better on at least one.
    The classic "cheapest part of at least this size" catalog question,
    and the multi-objective filter step of data-mixture tuning.

    The textbook formulation is a quadratic NOT-EXISTS self-join. This
    is the sort-based reformulation: collapse to the best ``gain`` per
    distinct ``cost`` value, take a running max of that best gain over
    strictly-cheaper costs, and a row is dominated iff some strictly
    cheaper cost already achieved its gain, or its own cost level
    achieves a strictly better gain. Equal (cost, gain) twins survive
    together (neither dominates).

    Scale: one map-side-combined aggregation to the distinct-cost
    table, one window over THAT table (bounded by the cost domain, not
    the data volume), and one hash join back on the cost key — no
    quadratic candidate generation anywhere. 100 TB of rows with a
    bounded price domain reduces to a KB-scale frontier sweep.
    """
    from pyspark.sql import Window as W

    per_cost = df.groupBy(F.col(cost_col).alias("_cost")).agg(
        F.max(gain_col).alias("_best_gain")
    )
    w = W.orderBy("_cost").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_cost.withColumn(
        "_cheaper_best", F.max("_best_gain").over(w)
    )
    out = df.join(ranked, on=df[cost_col] == ranked["_cost"])
    dominated = (
        F.col("_cheaper_best").isNotNull()
        & (F.col("_cheaper_best") >= F.col(gain_col))
    ) | (F.col("_best_gain") > F.col(gain_col))
    return out.where(~dominated).drop("_cost", "_best_gain", "_cheaper_best")


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col,
    bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence binning with per-bin information value — the
    credit-scoring-style predictiveness readout for a numeric feature
    against a binary label: WOE_b = ln(P(bin|pos) / P(bin|neg)),
    IV_b = (P(bin|pos) − P(bin|neg)) · WOE_b.

    Bins come from exact percentile thresholds broadcast as ONE row
    (the rfm_scores pattern: bin = 1 + #thresholds exceeded), never
    NTILE, whose tie placement is engine- and partition-order-
    dependent. A bin with zero positives or zero negatives gets NULL
    WOE explicitly on both engines — Spark NULLs ln(0) while DuckDB
    returns -inf, so the guard is semantics, not style.

    Scale: one percentile aggregation (map-side combined) broadcast to
    a pure column expression, one ``bins``-group aggregation, totals
    re-aggregated from the bin table. Nothing after the first pass
    sees row volume.
    """
    qs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    th = df.agg(F.percentile(F.col(value_col), qs).alias("_th"))
    binned = df.crossJoin(F.broadcast(th))
    b = F.lit(1)
    for i in range(1, bins):
        b = b + (F.col(value_col) > F.element_at(F.col("_th"), i)).cast("int")
    g = binned.groupBy(b.cast("long").alias("bin")).agg(
        F.sum(label_col.cast("int")).cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tot = g.agg(
        F.sum("n_pos").cast("long").alias("_tp"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("_tn"),
    )
    j = g.crossJoin(F.broadcast(tot))
    dp = F.col("n_pos").cast("double") / F.col("_tp").cast("double")
    dn = (F.col("n") - F.col("n_pos")).cast("double") / F.col("_tn").cast("double")
    woe = F.when(
        (F.col("n_pos") > 0) & (F.col("n") - F.col("n_pos") > 0),
        F.log(dp / dn),
    )
    return j.select(
        "bin",
        "n",
        "n_pos",
        F.round(woe, 6).alias("woe"),
        F.round((dp - dn) * woe, 6).alias("iv_component"),
    )


def cohort_ltv(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_expr,
) -> DataFrame:
    """Cohort lifetime-value triangle: entities cohort by the calendar
    month of their FIRST transaction, and each (cohort, month-offset)
    cell carries that cohort's revenue in that month plus the running
    cumulative — the LTV curve finance teams read off the diagonal.
    The revenue twin of the retention triangle
    (queries/catalog.py::q_cohort_retention_events).

    Exactness: monthly revenue sums as decimals; the cumulative is a
    window sum over the DECIMAL monthly cells (months × cohorts rows,
    calendar-bounded), so cum_revenue never depends on reduce order.
    Month offsets are pure integer arithmetic (year·12 + month diffs),
    never float months_between.

    Scale: one per-entity window for the cohort month (carries
    (entity, month) pairs), one triangle aggregation, one
    calendar-bounded window. Nothing else sees row volume.
    """
    from pyspark.sql import Window as W

    mnum = (F.year(date_col) * 12 + F.month(date_col)).alias("_mnum")
    base = df.select(
        F.col(entity_col).alias("_ent"),
        mnum,
        value_expr.alias("_v"),
    )
    w = W.partitionBy("_ent")
    cohorted = base.withColumn("_cohort", F.min("_mnum").over(w))
    tri = cohorted.groupBy(
        F.col("_cohort"),
        (F.col("_mnum") - F.col("_cohort")).cast("long").alias("month_offset"),
    ).agg(
        F.count_distinct(F.col("_ent")).cast("long").alias("n_active"),
        F.sum("_v").cast("decimal(18,2)").alias("_rev"),
    )
    cum = W.partitionBy("_cohort").orderBy("month_offset").rowsBetween(
        W.unboundedPreceding, 0
    )
    return tri.select(
        F.make_date(
            ((F.col("_cohort") - 1) / 12).cast("int"),
            ((F.col("_cohort") - 1) % 12 + 1).cast("int"),
            F.lit(1),
        ).alias("cohort_month"),
        "month_offset",
        "n_active",
        F.col("_rev").cast("double").alias("revenue"),
        F.sum("_rev").over(cum).cast("double").alias("cum_revenue"),
    )


def segment_migration(
    df: DataFrame,
    entity_col: str,
    period_expr,
    value_expr,
    n_segments: int = 4,
) -> DataFrame:
    """Customer-segment migration matrix between two periods: entities
    are quantile-scored WITHIN each period (the rfm_scores broadcast-
    threshold pattern — never NTILE) and the matrix counts entities per
    (segment_then, segment_now) cell, with segment 0 meaning "absent
    that period" — so churned (from > 0, to = 0) and newly acquired
    (from = 0, to > 0) entities appear in the same readout as
    upgrades/downgrades.

    ``period_expr`` must evaluate to exactly two distinct values; the
    smaller (by natural ordering) is "then". Per-entity values reduce
    as the caller's expression (pass a decimal cast for money); the
    quantile thresholds are one exact-percentile row PER PERIOD
    broadcast back, so tie placement is engine-exact.

    Scale: one (entity, period) aggregation over the fact table, a
    2-row percentile aggregation, one full-outer self-join of the two
    period slices on the entity key. Returns (seg_from, seg_to,
    n_entities).
    """
    # decimal-exact sum, then ONE double conversion: percentile and the
    # threshold comparisons run in double on both engines identically
    per = df.groupBy(
        F.col(entity_col).alias("_ent"), period_expr.alias("_per")
    ).agg(F.sum(value_expr).cast("double").alias("_v"))
    qs = F.array(
        *[F.lit(i / n_segments) for i in range(1, n_segments)]
    )
    th = per.groupBy("_per").agg(F.percentile(F.col("_v"), qs).alias("_th"))
    seg = F.lit(1)
    for i in range(1, n_segments):
        seg = seg + (F.col("_v") > F.element_at(F.col("_th"), i)).cast("int")
    scored = per.join(F.broadcast(th), "_per").select(
        "_ent", "_per", seg.cast("long").alias("_seg")
    )
    bounds = scored.agg(
        F.min("_per").alias("_p1"), F.max("_per").alias("_p2")
    )
    with_bounds = scored.crossJoin(F.broadcast(bounds))
    p1 = with_bounds.where(F.col("_per") == F.col("_p1")).select(
        "_ent", F.col("_seg").alias("seg_from")
    )
    p2 = with_bounds.where(F.col("_per") == F.col("_p2")).select(
        "_ent", F.col("_seg").alias("seg_to")
    )
    j = p1.join(p2, "_ent", "full_outer").select(
        F.coalesce("seg_from", F.lit(0)).cast("long").alias("seg_from"),
        F.coalesce("seg_to", F.lit(0)).cast("long").alias("seg_to"),
    )
    return j.groupBy("seg_from", "seg_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities")
    )


def simpson_diversity(
    df: DataFrame,
    entity_col: str,
    category_col: str,
) -> DataFrame:
    """Simpson diversity index per entity: the probability that two of
    an entity's observations (drawn without replacement) fall in
    DIFFERENT categories, D = 1 − Σ nᵢ(nᵢ−1) / (N(N−1)) — the
    behavioral-breadth score (does this user only ever 'view', or do
    they engage across the surface?) that powers engagement-depth
    segmentation. The pairwise complement of token_entropy's
    information-theoretic view, and EXACT: every term is integer
    arithmetic, the single division happens once per entity.

    Entities with one observation have no pair to draw — NULL, not 0,
    via try_divide. Returns (entity, n_obs, richness, simpson_d),
    round 6.

    Scale: two map-side-combined aggregations (observations →
    (entity, category) counts → per-entity reduce). Nothing after the
    first pass sees row volume.
    """
    cat = df.groupBy(
        F.col(entity_col).alias("entity"), F.col(category_col).alias("_c")
    ).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    g = cat.groupBy("entity").agg(
        F.sum("_n").cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("richness"),
        F.sum(F.col("_n") * (F.col("_n") - 1)).cast("long").alias("_pairs"),
    )
    same = F.try_divide(
        F.col("_pairs").cast("double"),
        (F.col("n_obs") * (F.col("n_obs") - 1)).cast("double"),
    )
    return g.select(
        "entity",
        "n_obs",
        "richness",
        F.round(F.lit(1.0) - same, 6).alias("simpson_d"),
    )


def decayed_value(
    df: DataFrame,
    entity_col: str,
    date_col: str,
    value_expr,
    half_life_days: int = 7,
) -> DataFrame:
    """Recency-weighted entity value: each transaction contributes
    value · 0.5^⌊age / half_life⌋, aged against the dataset's own
    horizon (max date) — the engagement-decay scoring behind churn
    models and re-targeting budgets, where last week's purchase should
    count double next week's.

    Exactness: the exponent is an INTEGER bucket, so the weight is an
    exact power of two computed as 1.0 / (1 << k) — never float
    pow(0.5, x), whose libm differs across engines at money-breaking
    magnitudes. Value·weight products are IEEE doubles; they SUM as
    decimals. Ages beyond 62 half-lives weight exactly 0.

    Scale: a 1-row horizon broadcast (the temporal_split pattern), a
    pure column expression for the weight, one entity-keyed
    aggregation. Returns (entity, n_txns, raw_value, decayed_value).
    """
    base = df.select(
        F.col(entity_col).alias("entity"),
        F.unix_date(F.to_date(date_col)).cast("long").alias("_dayn"),
        value_expr.cast("decimal(18,2)").alias("_v"),
    )
    horizon = base.agg(F.max("_dayn").alias("_h"))
    k = F.expr(f"CAST((_h - _dayn) DIV {int(half_life_days)} AS INT)")
    # fully exact scaled integers: cents · 2^(62−k) — a per-term
    # double→decimal cast of v·2^-k lands EXACTLY on decimal half-way
    # digits (2-decimal values times binary fractions), where Spark
    # rounds HALF_UP and DuckDB HALF_EVEN. call_function: F.shiftleft
    # only takes a literal shift amount.
    cents = (F.col("_v") * 100).cast("decimal(18,0)")
    pow2 = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.lit(62) - k
    ).cast("decimal(19,0)")
    scaled = F.when(k > 62, F.lit(0).cast("decimal(37,0)")).otherwise(
        cents * pow2
    )
    denom = F.lit(100.0 * float(1 << 62))
    return (
        base.crossJoin(F.broadcast(horizon))
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_txns"),
            F.round(F.sum("_v").cast("double"), 6).alias("raw_value"),
            F.round(
                F.sum(scaled).cast("double") / denom, 6
            ).alias("decayed_value"),
        )
    )
