"""Frequent-itemset / association-rule mining over baskets (the
market-basket co-occurrence analysis a feature-engineering or
recommender pipeline runs over transaction logs).

Apriori-pruned pair mining, expressed as exact relational algebra:

1. baskets reduce to DISTINCT (basket, item) — presence, not multiplicity;
2. item supports aggregate map-side; items below ``min_support`` are
   dropped BEFORE any pair is formed (the Apriori monotonicity lemma: a
   pair can only be frequent if both items are), which is what keeps the
   candidate space polynomial at scale;
3. surviving (basket, item) rows self-join CO-KEYED on the basket id
   (``item_a < item_b`` cuts the symmetric half), so the only shuffle is
   hash-partitioning by basket — the quadratic blow-up is bounded per
   basket by the frequent-item count, never corpus-wide;
4. pair counts roll up with map-side combine; support / confidence /
   lift derive from the broadcast 1-row basket total.

Reference parity: pramen has no mining operators (it is an orchestration
framework); this extends the engine's training-data analytics the way
PLANS.md documents for the other corpus-statistics families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.02,
) -> DataFrame:
    """Association pairs with support, directional confidence and lift.

    Returns (item_a, item_b, pair_count, support, confidence_a_to_b,
    confidence_b_to_a, lift) for every unordered frequent pair, exact
    counts. ``support`` = P(a, b), ``confidence_a_to_b`` = P(b | a),
    ``lift`` = P(a, b) / (P(a) P(b)); doubles are NOT rounded here —
    round at the presentation edge.
    """
    baskets = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()

    totals = baskets.agg(
        F.countDistinct("basket").cast("double").alias("n_baskets")
    )

    item_counts = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("item_count")
    )
    frequent = (
        item_counts.crossJoin(F.broadcast(totals))
        .where(F.col("item_count") >= F.col("n_baskets") * F.lit(min_support))
        .select("item", "item_count")
    )

    kept = baskets.join(F.broadcast(frequent), "item").select(
        "basket", "item", "item_count"
    )
    a = kept.select(
        "basket",
        F.col("item").alias("item_a"),
        F.col("item_count").alias("count_a"),
    )
    b = kept.select(
        "basket",
        F.col("item").alias("item_b"),
        F.col("item_count").alias("count_b"),
    )
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b", "count_a", "count_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
    )
    return pairs.crossJoin(F.broadcast(totals)).select(
        "item_a",
        "item_b",
        "pair_count",
        (F.col("pair_count") / F.col("n_baskets")).alias("support"),
        (F.col("pair_count") / F.col("count_a")).alias("confidence_a_to_b"),
        (F.col("pair_count") / F.col("count_b")).alias("confidence_b_to_a"),
        (
            F.col("pair_count") * F.col("n_baskets")
            / (F.col("count_a") * F.col("count_b"))
        ).alias("lift"),
    )


def set_overlap(
    df: DataFrame,
    set_col: str,
    member_col: str,
) -> DataFrame:
    """Pairwise audience overlap between labeled member sets: for every
    unordered pair of set labels, the exact intersection size, Jaccard
    similarity and overlap coefficient (|A∩B| / min(|A|,|B|)) — the
    "how much do these segments share users" readout behind channel
    planning and leakage checks between cohorts.

    Membership dedups to distinct (set, member) first; intersections
    come from a self-join CO-KEYED ON THE MEMBER (quadratic only in
    the handful of sets a single member belongs to, never across
    members); set sizes broadcast back onto the pair table. All
    integer counts; the two ratios are single divisions, round 6.
    """
    m = df.select(
        F.col(set_col).alias("_s"), F.col(member_col).alias("_m")
    ).distinct()
    sizes = m.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    a, b = m.alias("a"), m.alias("b")
    inter = (
        a.join(b, (F.col("a._m") == F.col("b._m"))
               & (F.col("a._s") < F.col("b._s")))
        .groupBy(
            F.col("a._s").alias("set_a"), F.col("b._s").alias("set_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("_s").alias("set_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_s").alias("set_b"), F.col("_n").alias("n_b"))
    j = inter.join(F.broadcast(sa), "set_a").join(F.broadcast(sb), "set_b")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return j.select(
        "set_a",
        "set_b",
        "n_a",
        "n_b",
        "n_common",
        F.round(F.col("n_common").cast("double") / union.cast("double"), 6)
        .alias("jaccard"),
        F.round(
            F.col("n_common").cast("double")
            / F.least("n_a", "n_b").cast("double"),
            6,
        ).alias("overlap_coeff"),
    )


def basket_size_distribution(
    df: DataFrame,
    basket_col: str,
) -> DataFrame:
    """Basket-size histogram: how many baskets contain exactly k lines,
    with each size's share of all baskets — the shape parameter behind
    basket mining support thresholds (basket_pairs' candidate volume is
    quadratic in this distribution's tail) and cart UX dashboards.

    Two map-side-combined aggregations: lines → per-basket counts →
    per-size counts; the basket total re-aggregates the (tiny) size
    histogram and broadcasts. Exact integers plus one division.

    Returns (basket_size, n_baskets, share), share round 6.
    """
    sizes = df.groupBy(F.col(basket_col).alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_sz")
    )
    hist = sizes.groupBy(F.col("_sz").alias("basket_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    tot = hist.agg(F.sum("n_baskets").cast("long").alias("_t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "basket_size",
        "n_baskets",
        F.round(
            F.col("n_baskets").cast("double") / F.col("_t").cast("double"), 6
        ).alias("share"),
    )


def token_npmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_support: float = 0.05,
) -> DataFrame:
    """Pointwise mutual information (and its normalized form) for token
    pairs co-occurring in documents: PMI = ln(lift) says how much more
    often two tokens appear together than independence predicts; nPMI
    rescales it to [−1, 1] so collocations are comparable across
    frequency bands — the phrase-detection statistic behind
    word2vec-style preprocessing.

    Pure composition: documents tokenize to distinct (doc, token)
    baskets and flow through :func:`basket_pairs` (Apriori pruning,
    basket-co-keyed pair join, broadcast totals); PMI/nPMI are column
    expressions over its exact counts. One operator, two readouts —
    the lift-vs-PMI equivalence made explicit.

    Returns (item_a, item_b, pair_count, support, pmi, npmi), round 6.
    """
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )
    baskets = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("basket"), F.explode(toks).alias("item"))
        .where(F.col("item") != "")
    )
    p = basket_pairs(baskets, "basket", "item", min_support=min_support)
    pmi = F.log(F.col("lift"))
    npmi = F.try_divide(pmi, -F.log(F.col("support")))
    return p.select(
        "item_a",
        "item_b",
        "pair_count",
        F.round("support", 6).alias("support"),
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )
