"""Statistical quality and drift (round 8): token statistics, seasonal
decomposition, SPC, hypothesis tests.

Split from the round-8 catalog monolith (round 9); registration order
preserved — this module registers the same queries, in the same order,
as its original line range in catalog.py.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pramen_spark.operators.rowlevel import (
    add_batch_id,
    add_info_date,
    apply_filters,
    sanitize_df_columns,
)
from pramen_spark.operators.tsutils import pin_utc, ts_instant
from pramen_spark.queries.base import (
    QUERIES,
    QuerySpec,
    load_documents_spread,
    load_events,
    load_table,
    query,
)
from pramen_spark.queries.core import (
    _LANG_ID_ORACLE,
)


@query(
    "token_burstiness_documents",
    r"""
    WITH raw AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM raw WHERE token <> '' GROUP BY doc_id, token
    ),
    g AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq,
               CAST(SUM(CAST(tf AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(tf * tf AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM tf GROUP BY token
    )
    SELECT token, doc_freq,
           ROUND(s1 / CAST(doc_freq AS DOUBLE), 6) AS mean_tf,
           ROUND((s2 / CAST(doc_freq AS DOUBLE)
                  - (s1 / CAST(doc_freq AS DOUBLE))
                    * (s1 / CAST(doc_freq AS DOUBLE)))
                 / (s1 / CAST(doc_freq AS DOUBLE)), 6) AS burstiness
    FROM g WHERE doc_freq >= 5
    """,
    "token burstiness (Fano factor of per-document frequency) for "
    "tokens in >= 5 documents: topical words burst, function words "
    "repeat steadily",
    tags=("text",),
)
def q_token_burstiness_documents(spark, sf_dir):
    """The dispersion signal behind stopword lists and BM25's tf
    saturation (operators/text.py::token_burstiness): per-(doc, token)
    counts are the only corpus-volume stage; per-token moments reduce
    the tf table with DECIMAL Σtf and Σtf² so the variance-to-mean
    ratio is reduce-order independent."""
    from pramen_spark.operators.text import token_burstiness

    d = load_table(spark, sf_dir, "documents")
    return token_burstiness(d, "doc_id", "text", min_df=5)


@query(
    "key_gap_audit_orders",
    """
    WITH k AS (
        SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders
    ),
    d AS (SELECT k - lag(k) OVER (ORDER BY k) AS d FROM k),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(COALESCE(MAX(d - 1), 0) AS BIGINT) AS max_gap_len
        FROM d WHERE d > 1
    ),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               MIN(k) AS min_key, MAX(k) AS max_key
        FROM k
    )
    SELECT n_keys, min_key, max_key, n_gaps, max_gap_len,
           CAST(max_key - min_key + 1 - n_keys AS BIGINT) AS missing_keys
    FROM t, g
    """,
    "integer-key completeness audit of the order-key space: gap "
    "count, widest gap, and missing-key total over the observed span",
    tags=("quality", "validation"),
)
def q_key_gap_audit_orders(spark, sf_dir):
    """The "did ingestion drop a range" screen
    (operators/validation.py::key_gap_audit): keys bucket by
    k DIV 100000 so the intra-bucket LAG window is PARTITIONED
    (parallel), and bucket-boundary gaps come from one LAG over the
    per-bucket (min, max) summary — bounded by domain/bucket_size,
    never the global single-partition sort the textbook query implies.
    TPC-H deliberately uses a sparse key space, so the audit has real
    gaps to find."""
    from pramen_spark.operators.validation import key_gap_audit

    o = load_table(spark, sf_dir, "orders")
    return key_gap_audit(o, "o_orderkey", bucket_size=100_000)


@query(
    "audience_overlap_events",
    """
    WITH m AS (SELECT DISTINCT event_type AS s, user_id AS u FROM events),
    sz AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY s),
    inter AS (
        SELECT a.s AS set_a, b.s AS set_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM m a JOIN m b ON a.u = b.u AND a.s < b.s
        GROUP BY 1, 2
    )
    SELECT set_a, set_b, sa.n AS n_a, sb.n AS n_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(sa.n + sb.n - n_common AS DOUBLE), 6) AS jaccard,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6) AS overlap_coeff
    FROM inter
    JOIN sz sa ON inter.set_a = sa.s
    JOIN sz sb ON inter.set_b = sb.s
    """,
    "pairwise audience overlap between event-type user sets: exact "
    "intersections, Jaccard, and overlap coefficient",
    tags=("analytics", "itemsets"),
)
def q_audience_overlap_events(spark, sf_dir):
    """Segment-sharing audit (operators/itemsets.py::set_overlap):
    membership dedups to distinct (set, member) first; intersections
    self-join CO-KEYED ON THE MEMBER — quadratic only in the handful
    of sets one member belongs to, never across members; sizes
    broadcast onto the pair table. The same shape that checks
    train/eval cohort leakage."""
    from pramen_spark.operators.itemsets import set_overlap

    return set_overlap(load_events(spark, sf_dir), "event_type", "user_id")


@query(
    "pvm_bridge_orders",
    """
    WITH cells AS (
        SELECT p_brand AS grp, year(l_shipdate) AS per,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS q,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    a AS (SELECT grp, q AS qty_a, r AS rev_a FROM cells WHERE per = 1996),
    b AS (SELECT grp, q AS qty_b, r AS rev_b FROM cells WHERE per = 1997)
    SELECT a.grp, qty_a, qty_b, rev_a, rev_b,
           ROUND((qty_b - qty_a) * (rev_a / qty_a), 6) AS volume_effect,
           ROUND((rev_b / qty_b - rev_a / qty_a) * qty_b, 6)
             AS price_effect
    FROM a JOIN b ON a.grp = b.grp
    """,
    "price-volume bridge per brand between 1996 and 1997: revenue "
    "change split into volume-at-old-price and price-on-new-volume",
    tags=("analytics", "finance"),
)
def q_pvm_bridge_orders(spark, sf_dir):
    """The revenue-review waterfall (operators/finance.py::pvm_bridge):
    quantities and discounted revenue reduce as DECIMALs per
    (brand, year), the two effects are scalar arithmetic on the joined
    two-period cell — and they telescope to the total change exactly,
    so the decomposition audits itself."""
    from pramen_spark.operators.finance import pvm_bridge

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return pvm_bridge(
        j, "p_brand", F.year("l_shipdate"), 1996, 1997,
        "l_quantity", amount,
    )


@query(
    "abc_classification_parts",
    """
    WITH per AS (
        SELECT l_partkey AS k,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
        FROM lineitem GROUP BY 1
    ),
    r AS (
        SELECT v,
               SUM(v) OVER (ORDER BY v DESC, k
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(v) OVER () AS tot
        FROM per
    ),
    c AS (
        SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
                    THEN 'A'
                    WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95
                    THEN 'B'
                    ELSE 'C' END AS abc_class,
               v, tot
        FROM r
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(v) AS DOUBLE) AS value,
           ROUND(CAST(SUM(v) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
             AS share
    FROM c GROUP BY abc_class
    """,
    "ABC/Pareto classification of parts by discounted revenue: class "
    "A carries 80% of value, B to 95%, C the tail",
    tags=("analytics", "finance"),
)
def q_abc_classification_parts(spark, sf_dir):
    """Which 20% of the catalog is 80% of revenue
    (operators/finance.py::abc_classification): per-part revenue
    reduces as DECIMAL, the cumulative runs over the PART table
    (domain-bounded, deterministic (value desc, key) order), and
    breakpoints compare in double only at the classification."""
    from pramen_spark.operators.finance import abc_classification

    l = load_table(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return abc_classification(l, "l_partkey", amount)


@query(
    "basket_size_orders",
    """
    WITH sizes AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS sz
        FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
        SELECT sz AS basket_size, CAST(COUNT(*) AS BIGINT) AS n_baskets
        FROM sizes GROUP BY sz
    ),
    tot AS (SELECT CAST(SUM(n_baskets) AS BIGINT) AS t FROM hist)
    SELECT basket_size, n_baskets,
           ROUND(CAST(n_baskets AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
    FROM hist, tot
    """,
    "basket-size histogram of order line counts with each size's "
    "share of all orders",
    tags=("analytics", "itemsets"),
)
def q_basket_size_orders(spark, sf_dir):
    """The shape parameter behind basket-mining support thresholds
    (operators/itemsets.py::basket_size_distribution): two map-side-
    combined aggregations (lines → basket sizes → histogram); the
    total re-aggregates the tiny histogram and broadcasts."""
    from pramen_spark.operators.itemsets import basket_size_distribution

    return basket_size_distribution(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )


@query(
    "customer_migration_orders",
    """
    WITH per AS (
        SELECT o_custkey AS ent,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 2 END AS per,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS v
        FROM orders GROUP BY 1, 2
    ),
    th AS (
        SELECT per, quantile_cont(v, 0.25) AS t1,
               quantile_cont(v, 0.5) AS t2, quantile_cont(v, 0.75) AS t3
        FROM per GROUP BY per
    ),
    scored AS (
        SELECT ent, per.per,
               CAST(1 + (CASE WHEN v > t1 THEN 1 ELSE 0 END)
                      + (CASE WHEN v > t2 THEN 1 ELSE 0 END)
                      + (CASE WHEN v > t3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS seg
        FROM per JOIN th ON per.per = th.per
    ),
    p1 AS (SELECT ent, seg FROM scored WHERE per = 1),
    p2 AS (SELECT ent, seg FROM scored WHERE per = 2)
    SELECT COALESCE(p1.seg, 0) AS seg_from,
           COALESCE(p2.seg, 0) AS seg_to,
           CAST(COUNT(*) AS BIGINT) AS n_entities
    FROM p1 FULL OUTER JOIN p2 ON p1.ent = p2.ent
    GROUP BY 1, 2
    """,
    "customer quartile-segment migration matrix between pre- and "
    "post-1998 revenue, with segment 0 for absent-that-period",
    tags=("analytics", "features"),
)
def q_customer_migration_orders(spark, sf_dir):
    """Upgrades, downgrades, churn and acquisition in ONE matrix
    (operators/features.py::segment_migration): per-period quartiles
    from broadcast exact-percentile rows (never NTILE), segment 0 for
    absent entities via the full-outer self-join on the customer key.
    Decimal-exact sums convert to double once, before thresholding."""
    from pramen_spark.operators.features import segment_migration

    o = load_table(spark, sf_dir, "orders")
    period = F.when(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
    ).otherwise(2)
    return segment_migration(
        o, "o_custkey", period,
        F.col("o_totalprice").cast("decimal(18,2)"), n_segments=4,
    )


@query(
    "reactivation_events",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    g AS (
        SELECT dayn,
               dayn - lag(dayn) OVER (PARTITION BY user_id
                                      ORDER BY dayn) AS gap
        FROM days
    )
    SELECT DATE '1970-01-01' + CAST(dayn AS INTEGER) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_reactivated
    FROM g WHERE gap > 2 GROUP BY dayn
    """,
    "daily win-back count: users active again after more than 2 days "
    "of silence",
    tags=("analytics", "sequences"),
)
def q_reactivation_events(spark, sf_dir):
    """The win-back half of growth accounting
    (operators/sequences.py::reactivations): distinct (user, day)
    collapse, one user-partitioned LAG, and a threshold on the exact
    integer day gap — a habitual daily user and a resurrected one stop
    being the same 'returning' number."""
    from pramen_spark.operators.sequences import reactivations

    return reactivations(
        load_events(spark, sf_dir), "user_id", "ts", dormancy_days=2
    )


@query(
    "event_diversity_users",
    """
    WITH cat AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT user_id AS entity, CAST(SUM(n) AS BIGINT) AS n_obs,
               CAST(COUNT(*) AS BIGINT) AS richness,
               CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs
        FROM cat GROUP BY 1
    )
    SELECT entity, n_obs, richness,
           ROUND(1.0 - CAST(pairs AS DOUBLE)
                 / CAST(n_obs * (n_obs - 1) AS DOUBLE), 6) AS simpson_d
    FROM g
    """,
    "Simpson diversity of event types per user: probability two of a "
    "user's events differ in type — exact integer arithmetic",
    tags=("analytics", "features"),
)
def q_event_diversity_users(spark, sf_dir):
    """Behavioral-breadth segmentation
    (operators/features.py::simpson_diversity): the pairwise
    complement of token_entropy's information view, and fully exact —
    Σnᵢ(nᵢ−1) and N(N−1) are integers, divided once per user.
    Single-observation users NULL (no pair to draw) on both engines."""
    from pramen_spark.operators.features import simpson_diversity

    return simpson_diversity(
        load_events(spark, sf_dir), "user_id", "event_type"
    )


@query(
    "decayed_value_customers",
    """
    WITH base AS (
        SELECT o_custkey AS entity,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS dayn,
               o_totalprice AS v
        FROM orders
    ),
    h AS (SELECT MAX(dayn) AS hh FROM base),
    wtd AS (
        SELECT entity, CAST(v AS DECIMAL(18,2)) AS vd,
               CASE WHEN (hh - dayn) // 90 > 62
                    THEN CAST(0 AS DECIMAL(37,0))
                    ELSE CAST(CAST(v AS DECIMAL(18,2)) * 100
                              AS DECIMAL(18,0))
                         * CAST(1::BIGINT << CAST(62 - (hh - dayn) // 90
                                                  AS INTEGER)
                                AS DECIMAL(19,0))
               END AS scaled
        FROM base, h
    )
    SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_txns,
           ROUND(CAST(SUM(vd) AS DOUBLE), 6) AS raw_value,
           ROUND(CAST(SUM(scaled) AS DOUBLE)
                 / (100.0 * CAST(1::BIGINT << 62 AS DOUBLE)), 6)
             AS decayed_value
    FROM wtd GROUP BY entity
    """,
    "recency-decayed customer value: order totals halved every 90 "
    "days of age against the dataset horizon, exact power-of-two "
    "weights",
    tags=("analytics", "features"),
)
def q_decayed_value_customers(spark, sf_dir):
    """Engagement decay without cross-engine pow()
    (operators/features.py::decayed_value): the age bucket is an
    INTEGER half-life count, so weights are exact powers of two built
    by bit shift (1.0 / (1 << k)) — float pow(0.5, x) differs across
    libms at money-breaking magnitudes. Products stay IEEE doubles;
    sums reduce as decimals; one 1-row horizon broadcast."""
    from pramen_spark.operators.features import decayed_value

    o = load_table(spark, sf_dir, "orders")
    return decayed_value(
        o, "o_custkey", "o_orderdate", F.col("o_totalprice"),
        half_life_days=90,
    )


@query(
    "duplicate_line_screen_lineitem",
    """
    WITH base AS (
        SELECT l_orderkey AS entity, l_partkey AS amount,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS dayn,
               l_linenumber AS id
        FROM lineitem
    ),
    paired AS (
        SELECT entity, amount,
               lag(id) OVER w AS first_id, id AS second_id,
               dayn - lag(dayn) OVER w AS gap_days
        FROM base
        WINDOW w AS (PARTITION BY entity, amount ORDER BY dayn, id)
    )
    SELECT entity, amount, first_id, second_id,
           CAST(gap_days AS BIGINT) AS gap_days
    FROM paired
    WHERE gap_days IS NOT NULL AND gap_days <= 365
    """,
    "double-entry screen: the same part appearing twice in one order "
    "within a year, as consecutive (ship date, line) pairs",
    tags=("quality", "validation"),
)
def q_duplicate_line_screen_lineitem(spark, sf_dir):
    """The billing-incident first query
    (operators/validation.py::duplicate_transaction_screen):
    CONSECUTIVE-pair semantics via one (entity, amount)-partitioned
    window with a (date, id) tiebreak — a burst of k repeats flags
    k−1 pairs and never explodes quadratically on a hot key. TPC-H
    orders really do contain repeated parts, so the screen fires."""
    from pramen_spark.operators.validation import (
        duplicate_transaction_screen,
    )

    l = load_table(spark, sf_dir, "lineitem")
    return duplicate_transaction_screen(
        l, "l_orderkey", "l_partkey", "l_shipdate", "l_linenumber",
        window_days=365,
    )


@query(
    "token_npmi_documents",
    r"""
    WITH baskets AS (
        SELECT DISTINCT doc_id AS basket,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS item
        FROM documents WHERE trim(text) <> ''
    ),
    b2 AS (SELECT basket, item FROM baskets WHERE item <> ''),
    tot AS (SELECT CAST(COUNT(DISTINCT basket) AS DOUBLE) AS n_baskets
            FROM b2),
    ic AS (SELECT item, COUNT(*) AS item_count FROM b2 GROUP BY item),
    freq AS (SELECT item, item_count FROM ic, tot
             WHERE item_count >= n_baskets * 0.05),
    kept AS (SELECT b.basket, b.item, f.item_count
             FROM b2 b JOIN freq f USING (item)),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               a.item_count AS count_a, b.item_count AS count_b,
               CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM kept a JOIN kept b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2, 3, 4
    )
    SELECT item_a, item_b, pair_count,
           ROUND(pair_count / n_baskets, 6) AS support,
           ROUND(ln(pair_count * n_baskets
                    / (CAST(count_a AS DOUBLE) * count_b)), 6) AS pmi,
           ROUND(ln(pair_count * n_baskets
                    / (CAST(count_a AS DOUBLE) * count_b))
                 / (-ln(pair_count / n_baskets)), 6) AS npmi
    FROM pairs, tot
    """,
    "pointwise mutual information (and normalized PMI) of frequent "
    "token pairs co-occurring in documents",
    tags=("text", "itemsets"),
)
def q_token_npmi_documents(spark, sf_dir):
    """Collocation detection as pure composition
    (operators/itemsets.py::token_npmi): documents tokenize to
    distinct (doc, token) baskets and flow through basket_pairs
    (Apriori pruning, basket-co-keyed join, broadcast totals);
    PMI = ln(lift) and nPMI are column expressions over its exact
    counts — the lift-vs-PMI equivalence made explicit."""
    from pramen_spark.operators.itemsets import token_npmi

    d = load_table(spark, sf_dir, "documents")
    return token_npmi(d, "doc_id", "text", min_support=0.05)


@query(
    "growth_accounting_events",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    fl AS (
        SELECT dayn,
               lag(dayn) OVER w AS prev, lead(dayn) OVER w AS next,
               MIN(dayn) OVER (PARTITION BY user_id) AS first
        FROM days WINDOW w AS (PARTITION BY user_id ORDER BY dayn)
    ),
    per AS (
        SELECT dayn AS d, CAST(COUNT(*) AS BIGINT) AS dau,
               CAST(SUM(CASE WHEN dayn = first THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev = dayn - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < dayn - 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM fl GROUP BY dayn
    ),
    ch AS (
        SELECT dayn + 1 AS d, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM fl WHERE next IS NULL OR next > dayn + 1
        GROUP BY dayn + 1
    )
    SELECT DATE '1970-01-01' + CAST(per.d AS INTEGER) AS day,
           dau, n_new, n_retained, n_resurrected,
           CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
    FROM per LEFT JOIN ch ON per.d = ch.d
    """,
    "full DAU growth accounting: new / retained / resurrected / "
    "churned per day, reconciling dau = new + retained + resurrected",
    tags=("analytics", "sequences"),
)
def q_growth_accounting_events(spark, sf_dir):
    """The weekly growth-review identity
    (operators/sequences.py::growth_accounting): one distinct
    (user, day) collapse, one user window yielding lag/lead/first in
    a single pass, churn attributed to the day AFTER a user's last
    consecutive day. Completes new_vs_returning and reactivations
    with the churn side; dau = new + retained + resurrected holds
    row-by-row."""
    from pramen_spark.operators.sequences import growth_accounting

    return growth_accounting(load_events(spark, sf_dir), "user_id", "ts")


@query(
    "cohens_kappa_langid",
    f"""
    WITH pred AS ({_LANG_ID_ORACLE}),
    pairs AS (
        SELECT d.lang AS a, p.lang_pred AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
                 AS agree
        FROM pairs
    ),
    r AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM pairs GROUP BY a),
    c AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb FROM pairs GROUP BY b),
    pr AS (
        SELECT CAST(SUM(CAST(ra * cb AS DECIMAL(38,0))) AS DOUBLE)
                 AS rowcol
        FROM r JOIN c ON r.a = c.b
    )
    SELECT n,
           ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
           ROUND(rowcol / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
             AS pe,
           ROUND((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
                  - rowcol / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                 / (1.0 - rowcol
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
             AS kappa
    FROM tot, pr
    """,
    "Cohen's kappa between the labeled language and the stopword-vote "
    "language-ID prediction: chance-corrected agreement",
    tags=("evalmetrics", "text"),
)
def q_cohens_kappa_langid(spark, sf_dir):
    """The one-number companion to langid_confusion
    (operators/evalmetrics.py::cohens_kappa): exact integer
    contingency + marginals, Σ row·col summed as DECIMAL (marginal
    products square past int64 at corpus scale), three divisions at
    the end. Degenerate (both-constant) labelings NULL via
    try_divide."""
    from pramen_spark.operators.evalmetrics import cohens_kappa
    from pramen_spark.operators.text import language_id

    d = load_documents_spread(spark, sf_dir)
    pred = language_id(d).select("doc_id", "lang_pred")
    j = d.select("doc_id", "lang").join(pred, "doc_id")
    return cohens_kappa(j, "lang", "lang_pred")


@query(
    "token_fertility_documents",
    r"""
    SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(text)) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(len(text)) AS DOUBLE)
                 / CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                        AS DOUBLE), 6) AS chars_per_token
    FROM documents WHERE trim(text) <> ''
    GROUP BY lang
    """,
    "tokenizer fertility per language: characters per whitespace "
    "token — the context-window cost profile of each language",
    tags=("text",),
)
def q_token_fertility_documents(spark, sf_dir):
    """The first number a tokenizer evaluation reports
    (operators/text.py::token_fertility): a language whose words cost
    3× the characters fits 3× fewer into the same context window and
    trains underweighted unless the mixture corrects for it. Exact
    integer char/token sums, one division per language row."""
    from pramen_spark.operators.text import token_fertility

    d = load_table(spark, sf_dir, "documents")
    return token_fertility(d, "lang", "text")


@query(
    "pii_rate_by_source_documents",
    r"""
    WITH aug AS (
        SELECT source, text
          || CASE WHEN doc_id % 3 = 0
                  THEN ' mail user@example.com' ELSE '' END
          || CASE WHEN doc_id % 5 = 0
                  THEN ' call (555) 123-4567' ELSE '' END
          || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.0.1' ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END
            AS text
        FROM documents
    ),
    c AS (
        SELECT source AS grp,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text,
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text,
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
               CAST(len(regexp_extract_all(text,
                 '(?:\+[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b'))
                 AS BIGINT) AS n_phone
        FROM aug
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_email,
           CAST(SUM(n_email) AS BIGINT) AS spans_email,
           CAST(SUM(CASE WHEN n_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_ipv4,
           CAST(SUM(n_ipv4) AS BIGINT) AS spans_ipv4,
           CAST(SUM(CASE WHEN n_ssn > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_ssn,
           CAST(SUM(n_ssn) AS BIGINT) AS spans_ssn,
           CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_phone,
           CAST(SUM(n_phone) AS BIGINT) AS spans_phone,
           ROUND(CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS rate_email,
           ROUND(CAST(SUM(CASE WHEN n_ipv4 > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS rate_ipv4,
           ROUND(CAST(SUM(CASE WHEN n_ssn > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS rate_ssn,
           ROUND(CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS rate_phone
    FROM c GROUP BY grp
    """,
    "per-source PII exposure: document rates and span counts per PII "
    "kind over a deterministic synthetic specimen injection",
    tags=("quality", "text"),
)
def q_pii_rate_by_source_documents(spark, sf_dir):
    """The scrub-triage audit before redact_pii's full rewrite pass
    (operators/text.py::pii_rate): one scan, RE2-safe regexp_count
    column expressions, one source-keyed aggregation. The synthetic
    corpus has no real PII, so deterministic specimens inject per
    doc_id residue class (the redact_pii_documents construction),
    giving every source a distinct, oracle-checkable rate profile."""
    from pramen_spark.operators.text import pii_rate

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" mail user@example.com")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" call (555) 123-4567")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit(" host 10.0.0.1")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.lit(" ssn 123-45-6789")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_rate(aug, "source", "text")


@query(
    "bounce_rate_events",
    """
    WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
    ),
    marked AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                         OR tus - lag(tus) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess0 AS (
        SELECT user_id, tus,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus) AS sid
        FROM marked
    ),
    sess AS (
        SELECT MIN(tus) AS s_us, COUNT(*) AS n_events
        FROM sess0 GROUP BY user_id, sid
    )
    SELECT DATE '1970-01-01' + CAST(s_us // 86400000000 AS INTEGER) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS bounce_rate
    FROM sess GROUP BY 1
    """,
    "daily bounce rate: share of 30-min-gap sessions containing "
    "exactly one event, grouped by session start day",
    tags=("analytics", "sessionization"),
)
def q_bounce_rate_events(spark, sf_dir):
    """The classic web-analytics readout as a pure composition over
    sessionize_batch (streaming/stream.py — same semantics the
    streaming sessionizer runs incrementally): sessions reduce to
    (start day, is_bounce) and one day-keyed aggregation finishes.
    No operator needed — the session table IS the reusable piece."""
    from pramen_spark.streaming.stream import sessionize_batch

    s = sessionize_batch(
        load_events(spark, sf_dir), "user_id", "ts", gap="30 minutes"
    )
    day = F.date_from_unix_date(
        F.expr(
            "CAST(unix_micros(session_start) DIV 86400000000 AS INT)"
        )
    )
    bounce = (F.col("n_events") == 1).cast("int")
    return s.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounces"),
        F.round(
            F.sum(bounce).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
    )


@query(
    "adoption_curve_events",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    firsts AS (SELECT user_id, MIN(dayn) AS f FROM days GROUP BY user_id),
    daily AS (
        SELECT f AS dayn, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY f
    ),
    c AS (
        SELECT dayn, n_new,
               CAST(SUM(n_new) OVER (ORDER BY dayn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_users,
               CAST(SUM(n_new) OVER () AS BIGINT) AS total
        FROM daily
    )
    SELECT DATE '1970-01-01' + CAST(dayn AS INTEGER) AS day, n_new,
           cum_users,
           ROUND(CAST(cum_users AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS adoption
    FROM c
    """,
    "user adoption curve: cumulative distinct users ever seen per day "
    "and the share of the final population reached",
    tags=("analytics", "sequences"),
)
def q_adoption_curve_events(spark, sf_dir):
    """The S-curve over growth_accounting's n_new: first-seen days
    reduce to a daily-new histogram (two map-side-combined
    aggregations over (user, day) pairs), and both windows run over
    the calendar-bounded daily grid — cumulative adoption never
    rescans events."""
    ev = load_events(spark, sf_dir)
    days = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS LONG)").alias(
            "_dayn"
        ),
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("_dayn").alias("_f"))
    daily = firsts.groupBy(F.col("_f").alias("_d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    from pyspark.sql import Window as W

    w_cum = W.orderBy("_d").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("_d").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return daily.select(
        F.date_from_unix_date(F.col("_d").cast("int")).alias("day"),
        "n_new",
        F.sum("n_new").over(w_cum).cast("long").alias("cum_users"),
        F.round(
            F.sum("n_new").over(w_cum).cast("double")
            / F.sum("n_new").over(w_all).cast("double"),
            6,
        ).alias("adoption"),
    )


@query(
    "anova_latency_priority",
    """
    WITH base AS (
        SELECT o.o_orderpriority AS g,
               CAST(CAST(l.l_shipdate AS DATE)
                    - CAST(o.o_orderdate AS DATE) AS BIGINT) AS v
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    g AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,6)))
                    AS DOUBLE) AS s,
               CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                             AS DECIMAL(38,6))) AS DOUBLE) AS ss
        FROM base GROUP BY g
    ),
    red AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS st,
               CAST(SUM(CAST(ss AS DECIMAL(38,6))) AS DOUBLE) AS sst,
               SUM(s * s / CAST(n_g AS DOUBLE)) AS sq_over_n
        FROM g
    )
    SELECT k, n,
           ROUND(((sq_over_n - st * st / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((sst - sq_over_n)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             AS f_stat,
           ROUND(sq_over_n - st * st / CAST(n AS DOUBLE), 6)
             AS ss_between,
           ROUND(sst - sq_over_n, 6) AS ss_within
    FROM red
    """,
    "one-way ANOVA of order-to-ship latency across the five order "
    "priorities: does priority move the mean at all?",
    tags=("analytics", "drift"),
)
def q_anova_latency_priority(spark, sf_dir):
    """The k-group generalization of welch_ttest
    (operators/drift.py::anova_oneway): integer day latencies reduce
    as DECIMAL Σv/Σv² per priority; the between/within identity runs
    on the 5-row group table. Screens WHETHER the dimension matters
    before per-pair tests say where."""
    from pramen_spark.operators.drift import anova_oneway

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("latency"),
    )
    return anova_oneway(j, "o_orderpriority", "latency")


@query(
    "control_chart_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT revenue AS v,
               abs(revenue - lag(revenue) OVER (ORDER BY day)) AS mr
        FROM daily
    ),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS m,
               CAST(SUM(CAST(mr AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(mr) AS DOUBLE) AS mrbar
        FROM r
    ),
    lim AS (
        SELECT n, m, mrbar,
               m + 2.66 * mrbar AS ucl, m - 2.66 * mrbar AS lcl
        FROM st
    )
    SELECT lim.n, ROUND(lim.m, 6) AS mean, ROUND(lim.mrbar, 6) AS mr_bar,
           ROUND(lim.ucl, 6) AS ucl, ROUND(lim.lcl, 6) AS lcl,
           CAST(SUM(CASE WHEN d.revenue > lim.ucl OR d.revenue < lim.lcl
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM daily d, lim
    GROUP BY lim.n, lim.m, lim.mrbar, lim.ucl, lim.lcl
    """,
    "XmR (individuals/moving-range) control chart of daily revenue: "
    "natural process limits mean +/- 2.66 mRbar and violation count",
    tags=("analytics", "anomaly"),
)
def q_control_chart_daily(spark, sf_dir):
    """Shewhart SPC over the daily grid
    (operators/anomaly.py::control_chart): the moving range is one
    LAG over calendar-bounded rows; mean and mR̄ reduce as decimals;
    the violation count is a second bounded pass against one
    broadcast limits row. cusum_changepoint localizes WHERE a shift
    happened — XmR says whether today is out of control at all."""
    from pramen_spark.operators.anomaly import control_chart

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return control_chart(daily, "revenue", "day")


@query(
    "seasonal_factors_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    ma AS (
        SELECT isodow(day) - 1 AS dow, revenue AS v,
               CAST(SUM(CAST(revenue AS DECIMAL(38,6))) OVER w AS DOUBLE)
                 / CAST(COUNT(*) OVER w AS DOUBLE) AS mam,
               COUNT(*) OVER w AS wn
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING)
    ),
    d2 AS (SELECT dow, v - mam AS r FROM ma WHERE wn = 7)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS factor
    FROM d2 GROUP BY dow
    """,
    "additive weekday seasonal factors of daily revenue after "
    "removing a centered 7-day moving-average trend (Monday = 0)",
    tags=("analytics", "timegrid"),
)
def q_seasonal_factors_daily(spark, sf_dir):
    """The decomposition complement of weekday_seasonality
    (operators/timegrid.py::seasonal_factors): detrend FIRST with a
    centered MA over the calendar-bounded grid (full windows only —
    partial edges bias the trend), then average residuals per
    weekday, so a growing series doesn't masquerade as seasonality."""
    from pramen_spark.operators.timegrid import seasonal_factors

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return seasonal_factors(daily, "revenue", "day", period=7)


@query(
    "trend_by_priority_orders",
    """
    WITH daily AS (
        SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS y
        FROM orders GROUP BY 1, 2
    ),
    base AS (
        SELECT grp, CAST(day - DATE '1970-01-01' AS DOUBLE) AS x, y
        FROM daily
    ),
    s AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM base GROUP BY grp
    )
    SELECT grp, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
    FROM s
    """,
    "per-priority OLS revenue trend: slope/intercept/R2 of each "
    "priority's daily revenue against time, one pass",
    tags=("analytics", "drift"),
)
def q_trend_by_priority_orders(spark, sf_dir):
    """ols_fit fanned out over a segment key in ONE aggregation
    (operators/drift.py::ols_by_group): 'is revenue trending
    differently per priority' without k separate scans; decimal
    co-moments per group, scalar fits on the 5-row result."""
    from pramen_spark.operators.drift import ols_by_group

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    return ols_by_group(
        daily, "grp", F.unix_date("day"), F.col("y")
    )


@query(
    "return_rate_by_brand",
    """
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS return_rate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END))
                AS DOUBLE) AS returned_revenue,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (CASE WHEN l_returnflag = 'R'
                             THEN 1 ELSE 0 END)) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2))))
                        AS DOUBLE), 6) AS returned_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    "merchandising return report per brand: line return rate plus "
    "the revenue share lost to returns, decimal-exact",
    tags=("analytics", "finance"),
)
def q_return_rate_by_brand(spark, sf_dir):
    """The merch dashboard's returns row (pure composition — TPC-H's
    l_returnflag is a real label): the returned-revenue sum keeps
    decimal exactness by multiplying the money term by an INTEGER
    flag inside the sum, never a conditional double. One broadcast
    part join, one brand-keyed map-side-combined aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    flag = (F.col("l_returnflag") == "R").cast("int")
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(flag).cast("long").alias("n_returned"),
        F.round(
            F.sum(flag).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("return_rate"),
        F.sum(rev).cast("double").alias("revenue"),
        F.sum(rev * flag).cast("double").alias("returned_revenue"),
        F.round(
            F.sum(rev * flag).cast("double") / F.sum(rev).cast("double"),
            6,
        ).alias("returned_share"),
    )


@query(
    "odds_ratio_events",
    """
    WITH cells AS (
        SELECT
          CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_exp_pos,
          CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                             AND event_type <> 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_exp_neg,
          CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_unexp_pos,
          CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                             AND event_type <> 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_unexp_neg
        FROM events
    )
    SELECT n_exp_pos, n_exp_neg, n_unexp_pos, n_unexp_neg,
           ROUND((CAST(n_exp_pos AS DOUBLE) * CAST(n_unexp_neg AS DOUBLE))
                 / (CAST(n_exp_neg AS DOUBLE)
                    * CAST(n_unexp_pos AS DOUBLE)), 6) AS odds_ratio,
           ROUND(exp(ln((CAST(n_exp_pos AS DOUBLE)
                         * CAST(n_unexp_neg AS DOUBLE))
                        / (CAST(n_exp_neg AS DOUBLE)
                           * CAST(n_unexp_pos AS DOUBLE)))
                     - 1.96 * sqrt(1.0 / CAST(n_exp_pos AS DOUBLE)
                                   + 1.0 / CAST(n_exp_neg AS DOUBLE)
                                   + 1.0 / CAST(n_unexp_pos AS DOUBLE)
                                   + 1.0 / CAST(n_unexp_neg AS DOUBLE))),
                 6) AS ci_lo,
           ROUND(exp(ln((CAST(n_exp_pos AS DOUBLE)
                         * CAST(n_unexp_neg AS DOUBLE))
                        / (CAST(n_exp_neg AS DOUBLE)
                           * CAST(n_unexp_pos AS DOUBLE)))
                     + 1.96 * sqrt(1.0 / CAST(n_exp_pos AS DOUBLE)
                                   + 1.0 / CAST(n_exp_neg AS DOUBLE)
                                   + 1.0 / CAST(n_unexp_pos AS DOUBLE)
                                   + 1.0 / CAST(n_unexp_neg AS DOUBLE))),
                 6) AS ci_hi
    FROM cells
    """,
    "weekend-vs-weekday purchase odds ratio with the Woolf log-OR "
    "95% interval, from exact 2x2 cells",
    tags=("analytics", "drift"),
)
def q_odds_ratio_events(spark, sf_dir):
    """The case-control readout (operators/drift.py::odds_ratio):
    Wilson CIs (wilson_ctr_events) bound ONE proportion; this compares
    two. The 2×2 cells are one conditional aggregation of exact
    integers; OR and the Woolf interval are scalar arithmetic on the
    single row. Exposure here: ISO weekend (weekday >= 5)."""
    from pramen_spark.operators.drift import odds_ratio

    ev = load_events(spark, sf_dir)
    return odds_ratio(
        ev,
        F.weekday(F.col("ts")) >= 5,
        F.col("event_type") == "purchase",
    )


@query(
    "mcnemar_langid",
    f"""
    WITH pred AS ({_LANG_ID_ORACLE})
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.lang = 'en' AND p.lang_pred = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pos,
           CAST(SUM(CASE WHEN d.lang <> 'en' AND p.lang_pred <> 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_both_neg,
           CAST(SUM(CASE WHEN d.lang = 'en' AND p.lang_pred <> 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN d.lang <> 'en' AND p.lang_pred = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
           ROUND((CAST(SUM(CASE WHEN d.lang = 'en' AND p.lang_pred <> 'en'
                           THEN 1 ELSE 0 END) AS DOUBLE)
                  - CAST(SUM(CASE WHEN d.lang <> 'en'
                                       AND p.lang_pred = 'en'
                             THEN 1 ELSE 0 END) AS DOUBLE))
                 * (CAST(SUM(CASE WHEN d.lang = 'en'
                                       AND p.lang_pred <> 'en'
                             THEN 1 ELSE 0 END) AS DOUBLE)
                    - CAST(SUM(CASE WHEN d.lang <> 'en'
                                         AND p.lang_pred = 'en'
                               THEN 1 ELSE 0 END) AS DOUBLE))
                 / (CAST(SUM(CASE WHEN d.lang = 'en'
                                       AND p.lang_pred <> 'en'
                             THEN 1 ELSE 0 END) AS DOUBLE)
                    + CAST(SUM(CASE WHEN d.lang <> 'en'
                                         AND p.lang_pred = 'en'
                               THEN 1 ELSE 0 END) AS DOUBLE)), 6)
             AS chi2
    FROM documents d JOIN pred p USING (doc_id)
    """,
    "McNemar's paired test of is-English: labeled language vs the "
    "stopword-vote prediction, chi2 on the discordant cells only",
    tags=("evalmetrics", "text"),
)
def q_mcnemar_langid(spark, sf_dir):
    """The before/after-model comparison done right
    (operators/evalmetrics.py::mcnemar_test): accuracy deltas mislead
    when both labelings agree on the easy 95% — McNemar's
    χ² = (b−c)²/(b+c) looks only at the exact integer discordant
    cells. Pairs with cohens_kappa (overall agreement) the way a
    model-regression review reads both."""
    from pramen_spark.operators.evalmetrics import mcnemar_test
    from pramen_spark.operators.text import language_id

    d = load_documents_spread(spark, sf_dir)
    pred = language_id(d).select("doc_id", "lang_pred")
    j = d.select("doc_id", "lang").join(pred, "doc_id")
    return mcnemar_test(
        j, F.col("lang") == "en", F.col("lang_pred") == "en"
    )


@query(
    "lorenz_curve_customers",
    """
    WITH per AS (
        SELECT o_custkey AS k,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT v, row_number() OVER (ORDER BY v, k) AS r,
               COUNT(*) OVER () AS n, SUM(v) OVER () AS tot
        FROM per
    ),
    g AS (
        SELECT (r - 1) * 10 // n + 1 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               SUM(v) AS bv, MAX(tot) AS t
        FROM ranked GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n_keys,
           CAST(bv AS DOUBLE) AS value,
           ROUND(CAST(SUM(bv) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cum_share
    FROM g
    """,
    "customer-revenue Lorenz curve in deciles: cumulative share of "
    "revenue held by the bottom k/10 of customers",
    tags=("analytics", "finance"),
)
def q_lorenz_curve_customers(spark, sf_dir):
    """The SHAPE behind gini_orders' scalar
    (operators/finance.py::lorenz_curve): per-customer decimal sums,
    deterministic (value, key) ranking over the domain-bounded
    customer table, integer decile assignment, exact decimal
    cumulative divided once per bucket row."""
    from pramen_spark.operators.finance import lorenz_curve

    o = load_table(spark, sf_dir, "orders")
    return lorenz_curve(
        o, "o_custkey", F.col("o_totalprice").cast("decimal(18,2)"),
        n_buckets=10,
    )


@query(
    "peer_zscore_customers",
    """
    WITH g AS (
        SELECT c_mktsegment AS grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS s1,
               CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6)))
                    AS DOUBLE) AS s2
        FROM customer GROUP BY 1
    ),
    st AS (
        SELECT grp, s1 / CAST(n AS DOUBLE) AS m,
               sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 AS sd
        FROM g
    )
    SELECT c.c_mktsegment AS grp, c.c_custkey AS entity,
           ROUND(c.c_acctbal, 6) AS value,
           ROUND((c.c_acctbal - st.m) / st.sd, 6) AS z
    FROM customer c JOIN st ON c.c_mktsegment = st.grp
    WHERE abs((c.c_acctbal - st.m) / st.sd) > 1.6
    """,
    "peer-group outliers: customers whose account balance sits more "
    "than 1.6 sample deviations from their own market segment's mean",
    tags=("analytics", "skew"),
)
def q_peer_zscore_customers(spark, sf_dir):
    """Normal globally, extreme for its peers
    (operators/skew.py::peer_zscore) — the peer-relative complement
    of grubbs_test's global extreme: decimal-exact group moments
    broadcast back, one standardization per row, groups of one NULL
    out instead of flagging. Threshold 1.6 because TPC-H balances are
    UNIFORM: |z| never exceeds √3 ≈ 1.73, so a naive 2σ gate on this
    data proves nothing — reading the distribution before picking the
    fence is the point of the operator."""
    from pramen_spark.operators.skew import peer_zscore

    c = load_table(spark, sf_dir, "customer")
    return peer_zscore(
        c, "c_mktsegment", "c_custkey", "c_acctbal", threshold=1.6
    )


@query(
    "revenue_entropy_brands",
    """
    WITH per AS (
        SELECT p_brand,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    ),
    tot AS (SELECT SUM(v) AS t FROM per),
    p AS (SELECT CAST(v AS DOUBLE) / CAST(t AS DOUBLE) AS sh
          FROM per, tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
           ROUND(-SUM(sh * ln(sh)), 6) AS entropy,
           ROUND(exp(-SUM(sh * ln(sh))), 6) AS effective_brands
    FROM p
    """,
    "Shannon entropy of brand revenue shares and the effective brand "
    "count exp(H): catalog-concentration in information units",
    tags=("analytics", "finance"),
)
def q_revenue_entropy_brands(spark, sf_dir):
    """The information-theoretic twin of hhi_nation_suppliers (1/HHI
    is the Simpson effective count; exp(H) the Shannon one): brand
    revenues reduce as DECIMALs, shares and the 25-term entropy sum
    are scalar work on the brand table. Pure composition — the
    entropy of an exact share vector needs no new operator."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    per = j.groupBy("p_brand").agg(F.sum(rev).alias("_v"))
    tot = per.agg(F.sum("_v").alias("_t"))
    shares = per.crossJoin(F.broadcast(tot)).select(
        (F.col("_v").cast("double") / F.col("_t").cast("double")).alias(
            "_sh"
        )
    )
    h = -F.sum(F.col("_sh") * F.log(F.col("_sh")))
    return shares.agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.round(h, 6).alias("entropy"),
        F.round(F.exp(h), 6).alias("effective_brands"),
    )


@query(
    "littles_law_events",
    """
    WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
    ),
    marked AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                         OR tus - lag(tus) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess0 AS (
        SELECT user_id, tus,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus) AS sid
        FROM marked
    ),
    sess AS (
        SELECT MIN(tus) AS s_us, MAX(tus) AS e_us
        FROM sess0 GROUP BY user_id, sid
    ),
    seg AS (
        SELECT s_us, e_us,
               unnest(range(s_us // 86400000000,
                            e_us // 86400000000 + 1)) AS dayn
        FROM sess
    ),
    clip AS (
        SELECT dayn,
               LEAST(e_us, dayn * 86400000000 + 86399999999)
               - GREATEST(s_us, dayn * 86400000000) + 1 AS busy
        FROM seg
    ),
    busy AS (
        SELECT dayn,
               CAST(SUM(CAST(busy AS DECIMAL(38,0))) AS DOUBLE) AS busy_us
        FROM clip GROUP BY dayn
    ),
    arr AS (
        SELECT s_us // 86400000000 AS dayn,
               CAST(COUNT(*) AS BIGINT) AS n_arrivals,
               CAST(SUM(CAST(e_us - s_us + 1 AS DECIMAL(38,0)))
                    AS DOUBLE) AS dur_us
        FROM sess GROUP BY 1
    )
    SELECT DATE '1970-01-01' + CAST(b.dayn AS INTEGER) AS day,
           CAST(COALESCE(a.n_arrivals, 0) AS BIGINT) AS n_arrivals,
           ROUND(a.dur_us / CAST(a.n_arrivals AS DOUBLE) / 1000000.0, 6)
             AS mean_duration_s,
           ROUND(b.busy_us / 86400000000.0, 6) AS l_measured,
           ROUND(CAST(a.n_arrivals AS DOUBLE)
                 * (a.dur_us / CAST(a.n_arrivals AS DOUBLE))
                 / 86400000000.0, 6) AS l_predicted
    FROM busy b LEFT JOIN arr a ON b.dayn = a.dayn
    """,
    "Little's law audit per day over 30-min-gap sessions: measured "
    "time-average concurrency vs the arrivals x mean-duration "
    "prediction",
    tags=("analytics", "sessionization"),
)
def q_littles_law_events(spark, sf_dir):
    """The queueing identity as a data-quality tripwire
    (operators/sequences.py::littles_law_audit): busy time uses
    interval_concurrency's midnight splitting (day-partitioned, exact
    integer microsecond sums as decimals); arrivals attribute to the
    start day. The two sides diverge hard when sessionization leaks
    or truncates — that divergence is the alert."""
    from pramen_spark.operators.sequences import littles_law_audit
    from pramen_spark.streaming.stream import sessionize_batch

    s = sessionize_batch(
        load_events(spark, sf_dir), "user_id", "ts", gap="30 minutes"
    )
    iv = s.select(
        F.unix_micros("session_start").alias("s_us"),
        F.unix_micros("session_end").alias("e_us"),
    )
    return littles_law_audit(iv, "s_us", "e_us")


@query(
    "its_breakpoint_daily",
    """
    WITH daily AS (
        SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
                    THEN 'pre' ELSE 'post' END AS grp,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    AS DOUBLE) AS x,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS y
        FROM orders GROUP BY 1, CAST(o_orderdate AS DATE)
    ),
    s AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
        FROM daily GROUP BY grp
    ),
    f AS (
        SELECT grp, n,
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
               ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                            / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                     / CAST(n AS DOUBLE), 6) AS intercept
        FROM s
    )
    SELECT pre.n AS n_pre, post.n AS n_post,
           pre.slope AS slope_pre, post.slope AS slope_post,
           ROUND(post.slope - pre.slope, 6) AS slope_change,
           ROUND((post.intercept + post.slope * 10227.0)
                 - (pre.intercept + pre.slope * 10227.0), 6)
             AS level_change
    FROM (SELECT * FROM f WHERE grp = 'pre') pre,
         (SELECT * FROM f WHERE grp = 'post') post
    """,
    "interrupted time series at 1998-01-01: pre/post OLS revenue "
    "trends with the slope change and the level jump at the break",
    tags=("analytics", "drift"),
)
def q_its_breakpoint_daily(spark, sf_dir):
    """The policy-change readout (composition over
    operators/drift.py::ols_by_group): two decimal-exact fits in one
    pass (grp = pre/post), then the level jump evaluated AT the
    breakpoint day from the ROUNDED fit outputs — both engines derive
    the deltas from identical rounded doubles, so composition adds no
    parity risk."""
    from pramen_spark.operators.drift import ols_by_group

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.when(
            F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"),
            "pre",
        ).otherwise("post").alias("grp"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    fits = ols_by_group(daily, "grp", F.unix_date("day"), F.col("y"))
    pre = fits.where(F.col("grp") == "pre").select(
        F.col("n").alias("n_pre"),
        F.col("slope").alias("slope_pre"),
        F.col("intercept").alias("i_pre"),
    )
    post = fits.where(F.col("grp") == "post").select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("slope_post"),
        F.col("intercept").alias("i_post"),
    )
    xb = F.lit(10227.0)  # unix day of 1998-01-01
    return pre.crossJoin(post).select(
        "n_pre",
        "n_post",
        "slope_pre",
        "slope_post",
        F.round(F.col("slope_post") - F.col("slope_pre"), 6).alias(
            "slope_change"
        ),
        F.round(
            (F.col("i_post") + F.col("slope_post") * xb)
            - (F.col("i_pre") + F.col("slope_pre") * xb),
            6,
        ).alias("level_change"),
    )


@query(
    "gains_curve_documents",
    """
    WITH th AS (
        SELECT [quantile_cont(CAST(n_chars AS DOUBLE), 0.1),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.2),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.3),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.4),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.5),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.6),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.7),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.8),
                quantile_cont(CAST(n_chars AS DOUBLE), 0.9)] AS t
        FROM documents
    ),
    b AS (
        SELECT CAST(1
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[1] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[2] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[3] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[4] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[5] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[6] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[7] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[8] THEN 1 ELSE 0 END)
          + (CASE WHEN CAST(n_chars AS DOUBLE) > t[9] THEN 1 ELSE 0 END)
          AS BIGINT) AS bin,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents, th
    ),
    g AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos
        FROM b GROUP BY bin
    ),
    w AS (
        SELECT bin, n, n_pos,
               CAST(SUM(n_pos) OVER (ORDER BY bin DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS cum,
               CAST(SUM(n_pos) OVER () AS DOUBLE) AS tot
        FROM g
    )
    SELECT bin, n, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / tot, 6) AS capture,
           ROUND(cum / tot, 6) AS cum_capture
    FROM w
    """,
    "cumulative gains (CAP) curve: share of positives captured by "
    "each score decile from the top down (length scoring is-English)",
    tags=("evalmetrics",),
)
def q_gains_curve_documents(spark, sf_dir):
    """The targeting-budget chart (operators/evalmetrics.py::
    gains_curve) completing the eval family: AUC ranks, calibration
    checks probabilities, gains prices the cut-off. Broadcast
    exact-percentile deciles (never NTILE), exact integer capture
    counts, two divisions per output row."""
    from pramen_spark.operators.evalmetrics import gains_curve

    d = load_table(spark, sf_dir, "documents")
    return gains_curve(
        d,
        F.col("n_chars").cast("double"),
        (F.col("lang") == "en"),
        bins=10,
    )


@query(
    "two_proportion_ztest_events",
    """
    WITH cells AS (
        SELECT
          CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_1,
          CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                             AND event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS x_1,
          CAST(SUM(CASE WHEN isodow(ts) - 1 < 5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_2,
          CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                             AND event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS x_2
        FROM events
    )
    SELECT n_1, x_1, n_2, x_2,
           ROUND(CAST(x_1 AS DOUBLE) / CAST(n_1 AS DOUBLE), 6) AS p_1,
           ROUND(CAST(x_2 AS DOUBLE) / CAST(n_2 AS DOUBLE), 6) AS p_2,
           ROUND((CAST(x_1 AS DOUBLE) / CAST(n_1 AS DOUBLE)
                  - CAST(x_2 AS DOUBLE) / CAST(n_2 AS DOUBLE))
                 / sqrt((CAST(x_1 + x_2 AS DOUBLE)
                         / CAST(n_1 + n_2 AS DOUBLE))
                        * (1.0 - CAST(x_1 + x_2 AS DOUBLE)
                           / CAST(n_1 + n_2 AS DOUBLE))
                        * (1.0 / CAST(n_1 AS DOUBLE)
                           + 1.0 / CAST(n_2 AS DOUBLE))), 6) AS z
    FROM cells
    """,
    "pooled two-proportion z-test of the purchase rate, weekend vs "
    "weekday, from exact cells",
    tags=("analytics", "drift"),
)
def q_two_proportion_ztest_events(spark, sf_dir):
    """The rate-difference companion to odds_ratio_events
    (operators/drift.py::two_proportion_ztest): same 2×2 cells, the
    additive view — report both, they disagree exactly when base
    rates are extreme. One conditional aggregation, scalar z."""
    from pramen_spark.operators.drift import two_proportion_ztest

    ev = load_events(spark, sf_dir)
    return two_proportion_ztest(
        ev,
        F.weekday(F.col("ts")) >= 5,
        F.col("event_type") == "purchase",
    )


@query(
    "stickiness_ratios_events",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dlist AS (SELECT DISTINCT day FROM du),
    d1 AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM du GROUP BY day
    ),
    d7 AS (
        SELECT l.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM dlist l JOIN du u ON u.day BETWEEN l.day - 6 AND l.day
        GROUP BY l.day
    ),
    d30 AS (
        SELECT l.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
        FROM dlist l JOIN du u ON u.day BETWEEN l.day - 29 AND l.day
        GROUP BY l.day
    )
    SELECT d1.day, dau, wau, mau,
           ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)
             AS dau_wau,
           ROUND(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6)
             AS dau_mau
    FROM d1
    JOIN d7 ON d1.day = d7.day
    JOIN d30 ON d1.day = d30.day
    """,
    "stickiness ratios per day: DAU/WAU and DAU/MAU from exact "
    "trailing-window distinct users (1/7/30 days)",
    tags=("analytics", "timegrid"),
)
def q_stickiness_ratios_events(spark, sf_dir):
    """The habit metric (composition over operators/timegrid.py::
    trailing_distinct at windows 1/7/30): each window collapses to
    DISTINCT (day, user) then a bounded explode — shuffle volume is
    window_days × active pairs, never a range join of events against
    a calendar. Three day-keyed joins of calendar-bounded tables."""
    from pramen_spark.operators.timegrid import trailing_distinct

    ev = load_events(spark, sf_dir)
    d1 = trailing_distinct(ev, "ts", "user_id", 1)
    d7 = trailing_distinct(ev, "ts", "user_id", 7)
    d30 = trailing_distinct(ev, "ts", "user_id", 30)
    j = d1.join(d7, "day").join(d30, "day")
    dau = F.col("active_1d").alias("dau")
    return j.select(
        "day",
        F.col("active_1d").alias("dau"),
        F.col("active_7d").alias("wau"),
        F.col("active_30d").alias("mau"),
        F.round(
            F.col("active_1d").cast("double")
            / F.col("active_7d").cast("double"),
            6,
        ).alias("dau_wau"),
        F.round(
            F.col("active_1d").cast("double")
            / F.col("active_30d").cast("double"),
            6,
        ).alias("dau_mau"),
    )


@query(
    "stream_topk_types_hourly",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, cnt,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY cnt DESC, event_type)
                 AS rnk
        FROM hourly
    )
    SELECT window_start, event_type, cnt, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 2
    """,
    "streaming parity: top-2 event types per hourly tumbling window "
    "with a deterministic (count desc, type) tiebreak",
    tags=("streaming",),
)
def q_stream_topk_types_hourly(spark, sf_dir):
    """The per-window leaderboard a streaming job emits via
    foreachBatch over FINALIZED windows (rank isn't incremental, so
    production ranks each closed window after the watermark passes —
    this is that batch computation, the same shape
    stream_windowed_counts verifies for plain aggregates). Window
    partitioned BY THE HOUR: perfectly parallel, never a global
    sort."""
    from pyspark.sql import Window as W

    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = W.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return hourly.withColumn(
        "rnk", F.row_number().over(w)
    ).where(F.col("rnk") <= 2)


@query(
    "byte_stats_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           CAST(SUM(CASE WHEN strlen(text) > length(text)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_multibyte_docs,
           ROUND(CAST(SUM(strlen(text)) AS DOUBLE)
                 / CAST(SUM(length(text)) AS DOUBLE), 6)
             AS bytes_per_char
    FROM documents GROUP BY source
    """,
    "opaque-payload byte accounting per source: UTF-8 bytes vs "
    "characters, multibyte-document count, bytes-per-char ratio",
    tags=("multimodal", "text"),
)
def q_byte_stats_by_source(spark, sf_dir):
    """The storage-vs-tokenizer accounting for binary-ish payloads
    (pure composition — Spark octet_length vs DuckDB strlen are both
    UTF-8 byte counts): bytes-per-char > 1 flags the non-ASCII
    sources whose context-window cost token_fertility_documents then
    prices. One scan, one source-keyed aggregation, exact integers."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
        F.sum(
            (F.octet_length("text") > F.length("text")).cast("int")
        ).cast("long").alias("n_multibyte_docs"),
        F.round(
            F.sum(F.octet_length("text")).cast("double")
            / F.sum(F.length("text")).cast("double"),
            6,
        ).alias("bytes_per_char"),
    )


@query(
    "lateness_profile_events",
    """
    WITH l AS (
        SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - epoch_us(CAST(ts AS TIMESTAMP)) AS behind_us
        FROM events
    ),
    k AS (
        SELECT CAST(GREATEST(behind_us, 0) AS DOUBLE) / 1000000.0
                 AS late_s
        FROM l WHERE behind_us IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           ROUND(CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS late_share,
           ROUND(quantile_cont(late_s, 0.5), 6) AS p50_s,
           ROUND(quantile_cont(late_s, 0.99), 6) AS p99_s,
           ROUND(MAX(late_s), 6) AS max_s
    FROM k
    """,
    "watermark-lateness profile: how far behind its user's "
    "high-watermark each event arrives (event_id as arrival order) — "
    "the number that sets withWatermark's delay",
    tags=("streaming",),
)
def q_lateness_profile_events(spark, sf_dir):
    """The withWatermark threshold, measured instead of guessed
    (streaming/stream.py::lateness_profile): set the delay at this
    p99 and 1% of data drops; at max and state never ages. Per-key
    running max over (user, arrival) order — parallel by key; the
    global watermark is the degenerate single-key case."""
    from pramen_spark.streaming.stream import lateness_profile

    ev = load_events(spark, sf_dir)
    return lateness_profile(ev, "user_id", "ts", "event_id")


@query(
    "langid_margin_documents",
    f"""
    WITH pred AS ({_LANG_ID_ORACLE}),
    m AS (
        SELECT lang_pred,
               list_sort([votes_de, votes_en, votes_es, votes_fr,
                          votes_it], 'DESC')[1]
               - list_sort([votes_de, votes_en, votes_es, votes_fr,
                            votes_it], 'DESC')[2] AS margin
        FROM pred
    )
    SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(margin AS DECIMAL(38,0))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_margin,
           CAST(SUM(CASE WHEN margin = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tied
    FROM m GROUP BY lang_pred
    """,
    "language-ID confidence audit: vote margin (top minus runner-up) "
    "per predicted language, with exact tie counts",
    tags=("text", "evalmetrics"),
)
def q_langid_margin_documents(spark, sf_dir):
    """HOW SURE is the classifier langid_confusion scores (pure
    composition over operators/text.py::language_id's vote columns):
    the top-vs-runner-up vote margin is the abstain/escalate signal a
    production pipeline thresholds before trusting cheap language ID.
    Integer vote arithmetic; ties counted exactly."""
    from pramen_spark.operators.text import language_id

    d = load_documents_spread(spark, sf_dir)
    votes = F.array(
        *[F.col(f"votes_{lang}") for lang in ("de", "en", "es", "fr", "it")]
    )
    srt = F.sort_array(votes, asc=False)
    scored = language_id(d).select(
        "lang_pred",
        (F.element_at(srt, 1) - F.element_at(srt, 2)).alias("_margin"),
    )
    return scored.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("_margin").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_margin"),
        F.sum((F.col("_margin") == 0).cast("int")).cast("long").alias(
            "n_tied"
        ),
    )


@query(
    "nzv_screen_lineitem",
    """
    WITH q AS (
        SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
    ),
    qg AS (SELECT v, COUNT(*) AS c FROM q GROUP BY v),
    qs AS (
        SELECT 'l_quantity' AS col_name,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               (SELECT ROUND(v, 6) FROM qg
                ORDER BY c DESC, v DESC LIMIT 1) AS mode_value,
               (SELECT c FROM qg ORDER BY c DESC, v DESC LIMIT 1)
                 AS mode_c
        FROM qg
    ),
    d AS (
        SELECT CAST(l_discount AS DOUBLE) AS v FROM lineitem
    ),
    dg AS (SELECT v, COUNT(*) AS c FROM d GROUP BY v),
    ds AS (
        SELECT 'l_discount' AS col_name,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               (SELECT ROUND(v, 6) FROM dg
                ORDER BY c DESC, v DESC LIMIT 1) AS mode_value,
               (SELECT c FROM dg ORDER BY c DESC, v DESC LIMIT 1)
                 AS mode_c
        FROM dg
    ),
    t AS (
        SELECT CAST(l_tax AS DOUBLE) AS v FROM lineitem
    ),
    tg AS (SELECT v, COUNT(*) AS c FROM t GROUP BY v),
    ts AS (
        SELECT 'l_tax' AS col_name,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               (SELECT ROUND(v, 6) FROM tg
                ORDER BY c DESC, v DESC LIMIT 1) AS mode_value,
               (SELECT c FROM tg ORDER BY c DESC, v DESC LIMIT 1)
                 AS mode_c
        FROM tg
    ),
    ln AS (
        SELECT CAST(l_linenumber AS DOUBLE) AS v FROM lineitem
    ),
    lg AS (SELECT v, COUNT(*) AS c FROM ln GROUP BY v),
    ls AS (
        SELECT 'l_linenumber' AS col_name,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               (SELECT ROUND(v, 6) FROM lg
                ORDER BY c DESC, v DESC LIMIT 1) AS mode_value,
               (SELECT c FROM lg ORDER BY c DESC, v DESC LIMIT 1)
                 AS mode_c
        FROM lg
    ),
    u AS (
        SELECT * FROM qs UNION ALL SELECT * FROM ds
        UNION ALL SELECT * FROM ts UNION ALL SELECT * FROM ls
    )
    SELECT col_name, n, n_distinct, mode_value,
           ROUND(CAST(mode_c AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS mode_share,
           ROUND(CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS distinct_ratio
    FROM u
    """,
    "near-zero-variance feature screen over four lineitem numerics: "
    "mode share and distinct ratio per column",
    tags=("quality", "validation"),
)
def q_nzv_screen_lineitem(spark, sf_dir):
    """The caret nearZeroVar audit
    (operators/validation.py::nzv_screen): constant and
    almost-constant features caught before they waste model capacity.
    Each column reduces to its own value histogram (parquet column
    pruning keeps k columns from costing k full-row scans); the mode
    is an argmax over a (count, value) struct with a deterministic
    value tiebreak."""
    from pramen_spark.operators.validation import nzv_screen

    l = load_table(spark, sf_dir, "lineitem")
    return nzv_screen(
        l, ["l_quantity", "l_discount", "l_tax", "l_linenumber"]
    )


@query(
    "attribution_window_sweep_events",
    """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    w AS (
        SELECT event_id, event_type, us,
               last_value(CASE WHEN event_type IN ('view', 'click')
                          THEN struct_pack(t_us := us, t_type := event_type)
                          END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch
        FROM e
    ),
    conv AS (
        SELECT us - touch.t_us AS gap_us, touch.t_type AS t_type
        FROM w WHERE event_type = 'purchase'
    )
    SELECT COALESCE(t_type, 'organic') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(CASE WHEN gap_us <= 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS within_1d,
           CAST(SUM(CASE WHEN gap_us <= 259200000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS within_3d,
           CAST(SUM(CASE WHEN gap_us <= 604800000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS within_7d
    FROM conv GROUP BY 1
    """,
    "attribution-window sensitivity: last-touch purchase credit per "
    "touch type at 1/3/7-day windows from one pass",
    tags=("analytics", "sequences"),
)
def q_attribution_window_sweep_events(spark, sf_dir):
    """Is the 7-day window doing work, or would 1 day credit the same
    touches? (composition over operators/sequences.py::
    last_touch_attribution with an unbounded carry): the three window
    thresholds are conditional sums over the SAME microsecond gap
    column — a sweep costs one pass, not three attribution runs.
    Conversions with no prior touch at all report as 'organic'."""
    from pramen_spark.operators.sequences import last_touch_attribution

    att = last_touch_attribution(
        load_events(spark, sf_dir),
        ("view", "click"),
        "purchase",
        window_seconds=10_000_000_000,
    )
    day_us = 86_400_000_000
    return att.groupBy(
        F.coalesce(F.col("touch_type"), F.lit("organic")).alias(
            "touch_type"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum(F.when(F.col("gap_us") <= day_us, 1).otherwise(0))
        .cast("long")
        .alias("within_1d"),
        F.sum(F.when(F.col("gap_us") <= 3 * day_us, 1).otherwise(0))
        .cast("long")
        .alias("within_3d"),
        F.sum(F.when(F.col("gap_us") <= 7 * day_us, 1).otherwise(0))
        .cast("long")
        .alias("within_7d"),
    )


@query(
    "dup_rate_by_source_documents",
    """
    WITH h AS (SELECT source, md5(text) AS hh FROM documents),
    c AS (SELECT hh, COUNT(*) AS cnt FROM h GROUP BY hh)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS dup_rate
    FROM h JOIN c USING (hh) GROUP BY source
    """,
    "exact-duplicate exposure per source: share of documents whose "
    "text hash appears more than once corpus-wide",
    tags=("dedup", "quality"),
)
def q_dup_rate_by_source_documents(spark, sf_dir):
    """WHERE the duplication lives (pure composition — the triage
    report over dedup_exact's hash space): per-source rates decide
    which feeds get the full MinHash treatment. md5 is the portable
    digest (the sampling._hash_unit discipline); the hash-count join
    carries 32-byte digests, never text."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("_h"))
    c = h.groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt"))
    return h.join(c, "_h").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_cnt") > 1).cast("int")).cast("long").alias(
            "n_dup_docs"
        ),
        F.round(
            F.sum((F.col("_cnt") > 1).cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


