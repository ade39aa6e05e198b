"""KPI compositions (round 8 waves 27-35): executive dashboard recipes
composed from already-verified operators.

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


@query(
    "emerging_terms_documents",
    r"""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE trim(text) <> ''
    ),
    sizes AS (
        SELECT CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2
        FROM base
    ),
    tok AS (
        SELECT DISTINCT doc_id,
               CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS h,
               unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS token
        FROM base
    ),
    g AS (
        SELECT token, CAST(SUM(1 - h) AS BIGINT) AS df_1,
               CAST(SUM(h) AS BIGINT) AS df_2
        FROM tok WHERE token <> '' GROUP BY token
    )
    SELECT token, df_1, df_2,
           ROUND(ln((CAST(df_2 AS DOUBLE) + 1.0)
                    / (CAST(n2 AS DOUBLE) + 2.0))
                 - ln((CAST(df_1 AS DOUBLE) + 1.0)
                      / (CAST(n1 AS DOUBLE) + 2.0)), 6) AS growth
    FROM g, sizes WHERE df_1 + df_2 >= 5
    """,
    "emerging/fading terms between deterministic corpus halves: "
    "smoothed log-odds document-frequency growth per token",
    tags=("text", "drift"),
)
def q_emerging_terms_documents(spark, sf_dir):
    """Trend mining over the vocabulary (operators/text.py::
    term_growth): both halves' document frequencies come from ONE
    conditional aggregation over distinct (token, doc) pairs;
    add-one smoothing keeps single-half tokens finite. The split is
    doc_id parity here; production passes a time predicate."""
    from pramen_spark.operators.text import term_growth

    d = load_table(spark, sf_dir, "documents")
    return term_growth(d, "doc_id", "text", min_df=5)


@query(
    "price_dispersion_brands",
    """
    WITH u AS (
        SELECT p_brand, l_extendedprice / l_quantity AS up
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0
    ),
    g AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(up AS DECIMAL(38,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(up * up AS DECIMAL(38,6))) AS DOUBLE) AS s2
        FROM u GROUP BY 1
    )
    SELECT p_brand, n,
           ROUND(s1 / CAST(n AS DOUBLE), 6) AS mean_unit_price,
           ROUND(sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))), 6) AS sd,
           ROUND(sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0)))
                 / (s1 / CAST(n AS DOUBLE)), 6) AS cv
    FROM g
    """,
    "realized unit-price dispersion per brand: mean, sample deviation "
    "and coefficient of variation of extendedprice/quantity",
    tags=("analytics", "finance"),
)
def q_price_dispersion_brands(spark, sf_dir):
    """Which brands' realized prices are volatile (pure composition,
    the welch/anova decimal discipline): unit prices are IEEE-double
    divisions, moments sum as decimals per brand, CV is scalar work
    on the 25-row brand table."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).where(
        F.col("l_quantity") > 0
    )
    up = (F.col("l_extendedprice") / F.col("l_quantity")).alias("_up")
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    g = j.select("p_brand", up).groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_up"))).cast("double").alias("_s1"),
        F.sum(dec(F.col("_up") * F.col("_up"))).cast("double").alias("_s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("_s1") / n
    sd = F.sqrt(
        (n * F.col("_s2") - F.col("_s1") * F.col("_s1"))
        / (n * (n - F.lit(1.0)))
    )
    return g.select(
        "p_brand",
        "n",
        F.round(mean, 6).alias("mean_unit_price"),
        F.round(sd, 6).alias("sd"),
        F.round(sd / mean, 6).alias("cv"),
    )


@query(
    "d7_retention_by_cohort_events",
    """
    WITH du AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    f AS (SELECT user_id, MIN(dayn) AS cohort FROM du GROUP BY user_id),
    r AS (
        SELECT f.user_id, f.cohort,
               MAX(CASE WHEN du.dayn = f.cohort + 7
                   THEN 1 ELSE 0 END) AS retained
        FROM f JOIN du ON f.user_id = du.user_id
        GROUP BY 1, 2
    )
    SELECT DATE '1970-01-01' + CAST(cohort AS INTEGER) AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS cohort_size,
           CAST(SUM(retained) AS BIGINT) AS retained_d7,
           ROUND(CAST(SUM(retained) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS d7_rate
    FROM r GROUP BY cohort
    """,
    "day-7 retention per signup cohort: share of each cohort active "
    "exactly seven days after first being seen",
    tags=("analytics", "sequences"),
)
def q_d7_retention_by_cohort_events(spark, sf_dir):
    """THE growth KPI distilled from the retention triangle
    (composition over cohort_retention's machinery): first days from
    one aggregation over distinct (user, day) pairs, the day-7 flag
    from a user-keyed join back — one exact rate per cohort instead
    of a triangle to eyeball."""
    ev = load_events(spark, sf_dir)
    du = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS LONG)").alias(
            "_dayn"
        ),
    ).distinct()
    f = du.groupBy("user_id").agg(F.min("_dayn").alias("_cohort"))
    r = (
        f.join(du, "user_id")
        .groupBy("user_id", "_cohort")
        .agg(
            F.max(
                F.when(F.col("_dayn") == F.col("_cohort") + 7, 1).otherwise(
                    0
                )
            ).alias("_ret")
        )
    )
    return r.groupBy(
        F.date_from_unix_date(F.col("_cohort").cast("int")).alias(
            "cohort_day"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size"),
        F.sum("_ret").cast("long").alias("retained_d7"),
        F.round(
            F.sum("_ret").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("d7_rate"),
    )


@query(
    "negative_samples_orders",
    """
    WITH items AS (SELECT p_partkey AS item FROM part),
    idx AS (
        SELECT item,
               CAST(row_number() OVER (ORDER BY item) - 1 AS BIGINT) AS i
        FROM items
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM items),
    ents AS (SELECT DISTINCT o_custkey AS entity FROM orders),
    slots AS (
        SELECT entity, CAST(s.s AS INTEGER) AS slot
        FROM ents, (SELECT unnest(range(0, 4)) AS s) s
    ),
    cand AS (
        SELECT entity, slot,
               ('0x' || substr(md5(CAST(entity AS VARCHAR) || ':'
                                   || CAST(slot AS VARCHAR)), 1, 8))
                 ::BIGINT % cnt AS i
        FROM slots, n
    ),
    pos AS (
        SELECT DISTINCT o_custkey AS entity, l_partkey AS item
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT c.entity, c.slot, x.item
    FROM cand c JOIN idx x ON c.i = x.i
    WHERE NOT EXISTS (SELECT 1 FROM pos p
                      WHERE p.entity = c.entity AND p.item = x.item)
    """,
    "deterministic md5 negative sampling: 4 catalog parts per "
    "customer that they never purchased, reproducible on any engine",
    tags=("sampling", "training"),
)
def q_negative_samples_orders(spark, sf_dir):
    """The implicit-feedback training-pair generator
    (operators/sampling.py::negative_samples): items index densely
    via row_number over the part CATALOG (never assume contiguous
    ids), the hash-to-index map is a pure column expression, and
    observed positives drop by anti-join. A slot colliding with a
    positive yields nothing — determinism beats exact-k."""
    from pramen_spark.operators.sampling import negative_samples

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pos = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        "o_custkey", "l_partkey"
    )
    out = negative_samples(pos, "o_custkey", "l_partkey", p.select(
        F.col("p_partkey")
    ).withColumnRenamed("p_partkey", "l_partkey"), k=4)
    return out.select(
        "entity", F.col("slot").cast("int").alias("slot"), "item"
    )


@query(
    "cross_cardinality_lineitem",
    """
    WITH j AS (
        SELECT p_brand, l_returnflag, l_linestatus
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    a AS (
        SELECT 'p_brand x l_returnflag' AS cross_name,
               CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_a,
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_b,
               CAST(COUNT(DISTINCT (p_brand, l_returnflag)) AS BIGINT)
                 AS n_observed
        FROM j
    ),
    b AS (
        SELECT 'p_brand x l_linestatus',
               CAST(COUNT(DISTINCT p_brand) AS BIGINT),
               CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
               CAST(COUNT(DISTINCT (p_brand, l_linestatus)) AS BIGINT)
        FROM j
    ),
    c AS (
        SELECT 'l_returnflag x l_linestatus',
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
               CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
               CAST(COUNT(DISTINCT (l_returnflag, l_linestatus))
                    AS BIGINT)
        FROM j
    ),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b
          UNION ALL SELECT * FROM c)
    SELECT cross_name, n_a, n_b, n_observed,
           CAST(n_a * n_b AS BIGINT) AS max_possible,
           ROUND(CAST(n_observed AS DOUBLE)
                 / CAST(n_a * n_b AS DOUBLE), 6) AS fill_rate
    FROM u
    """,
    "feature-cross cardinality audit over three lineitem/part pairs: "
    "observed combinations vs the |a|x|b| maximum",
    tags=("quality", "validation"),
)
def q_cross_cardinality_lineitem(spark, sf_dir):
    """Embedding table or one-hot explosion
    (operators/validation.py::cross_cardinality_audit): each pair is
    one exact three-distinct aggregation; low fill rates also flag
    structurally-coupled columns (returnflag x linestatus) where
    crossing adds nothing."""
    from pramen_spark.operators.validation import cross_cardinality_audit

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    return cross_cardinality_audit(
        j,
        [
            ("p_brand", "l_returnflag"),
            ("p_brand", "l_linestatus"),
            ("l_returnflag", "l_linestatus"),
        ],
    )


@query(
    "l_diversity_customers",
    """
    WITH g AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000)
                                        AS BIGINT)) AS BIGINT) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_failing,
           ROUND(CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS share_failing,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_exposed
    FROM g
    """,
    "l-diversity audit of (segment, nation) quasi-identifier groups "
    "against banded account balance, l = 3",
    tags=("quality", "validation"),
)
def q_l_diversity_customers(spark, sf_dir):
    """k-anonymity's stronger sibling
    (operators/validation.py::l_diversity_audit): a large QI group
    still exposes members when everyone shares one sensitive value —
    distinct sensitive bands per group, exact integer counts, one
    group pass + one reduce. Completes the privacy family with
    k_anonymity_customers and dp_counts_customers."""
    from pramen_spark.operators.validation import l_diversity_audit

    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return l_diversity_audit(
        c, ["c_mktsegment", "c_nationkey"], band, l=3
    )


@query(
    "ess_weights_documents",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND((CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                               AS DECIMAL(38,6))) AS DOUBLE)
                  * CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                                 AS DECIMAL(38,6))) AS DOUBLE))
                 / CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                                * CAST(n_chars AS DOUBLE)
                                AS DECIMAL(38,6))) AS DOUBLE), 6) AS ess,
           ROUND(((CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                                AS DECIMAL(38,6))) AS DOUBLE)
                   * CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                                  AS DECIMAL(38,6))) AS DOUBLE))
                  / CAST(SUM(CAST(CAST(n_chars AS DOUBLE)
                                 * CAST(n_chars AS DOUBLE)
                                 AS DECIMAL(38,6))) AS DOUBLE))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS ess_ratio
    FROM documents
    """,
    "Kish effective sample size of the length-weighted corpus: how "
    "many equal-weight documents the weighting is actually worth",
    tags=("sampling", "training"),
)
def q_ess_weights_documents(spark, sf_dir):
    """The importance-sampling diagnostic
    (operators/sampling.py::effective_sample_size): ESS/n near 1
    means the length weighting barely changes effective coverage;
    near 0 means a few huge documents dominate training. Decimal
    Σw/Σw² (squares as products), one pass."""
    from pramen_spark.operators.sampling import effective_sample_size

    d = load_table(spark, sf_dir, "documents")
    return effective_sample_size(d, F.col("n_chars").cast("double"))


@query(
    "lang_mix_by_source",
    """
    WITH g AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           (SELECT g2.lang FROM g g2 WHERE g2.source = g.source
            ORDER BY g2.n DESC, g2.lang LIMIT 1) AS top_lang,
           ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
             AS top_share
    FROM g GROUP BY source
    """,
    "language mix per source: distinct languages, the dominant "
    "language and its share — the mixture-weights input table",
    tags=("text", "quality"),
)
def q_lang_mix_by_source(spark, sf_dir):
    """What each feed is actually made of (pure composition): the
    per-source language profile that token_budget_mix and
    mixture_weights consume. Dominant language via an argmax struct
    with a deterministic (count desc, lang asc) tiebreak; two
    map-side-combined aggregations."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    # argmax struct: (count, reversed-lang) so ties pick the SMALLEST
    # lang; encode by negating count ordering instead: max on
    # (n, neg-lang) is awkward — use min on (-n, lang)
    top = F.min(
        F.struct((-F.col("_n")).alias("_neg"), F.col("lang").alias("_l"))
    )
    return g.groupBy("source").agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        top.getField("_l").alias("top_lang"),
        F.round(
            F.max("_n").cast("double") / F.sum("_n").cast("double"), 6
        ).alias("top_share"),
    )


@query(
    "latency_trend_monthly",
    """
    WITH l AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(CAST(l_shipdate AS DATE)
                    - CAST(o_orderdate AS DATE) AS BIGINT) AS lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(CAST(lat AS DOUBLE), 0.5), 6) AS p50,
           ROUND(quantile_cont(CAST(lat AS DOUBLE), 0.9), 6) AS p90
    FROM l GROUP BY month
    """,
    "order-to-ship latency SLA trend: exact P50/P90 day latency per "
    "order month",
    tags=("analytics", "timegrid"),
)
def q_latency_trend_monthly(spark, sf_dir):
    """ship_latency_lineitem's priority slices put on the time axis
    (pure composition): is the SLA drifting? One co-keyed
    lineitem-orders join, month-keyed exact interpolated percentiles
    — the per-month groups keep the percentile state partitioned."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month"
        ),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("double")
        .alias("_lat"),
    )
    return j.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.percentile(F.col("_lat"), 0.5), 6).alias("p50"),
        F.round(F.percentile(F.col("_lat"), 0.9), 6).alias("p90"),
    )


@query(
    "basket_mix_drift_orders",
    """
    WITH sz AS (
        SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT year(o_orderdate) AS yr,
               CASE WHEN c = 1 THEN '1' WHEN c <= 3 THEN '2-3'
                    WHEN c <= 5 THEN '4-5' ELSE '6+' END AS band
        FROM sz JOIN orders ON l_orderkey = o_orderkey
        WHERE year(o_orderdate) IN (1996, 1997)
    ),
    h AS (
        SELECT band,
               CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cur
        FROM j GROUP BY band
    ),
    t AS (
        SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
               CAST(SUM(n_cur) AS BIGINT) AS t_cur
        FROM h
    )
    SELECT band AS category, n_ref, n_cur,
           ROUND((n_ref - CAST(n_ref + n_cur AS DOUBLE) * t_ref
                          / CAST(t_ref + t_cur AS DOUBLE))
                 * (n_ref - CAST(n_ref + n_cur AS DOUBLE) * t_ref
                            / CAST(t_ref + t_cur AS DOUBLE))
                 / (CAST(n_ref + n_cur AS DOUBLE) * t_ref
                    / CAST(t_ref + t_cur AS DOUBLE))
                 + (n_cur - CAST(n_ref + n_cur AS DOUBLE) * t_cur
                            / CAST(t_ref + t_cur AS DOUBLE))
                 * (n_cur - CAST(n_ref + n_cur AS DOUBLE) * t_cur
                            / CAST(t_ref + t_cur AS DOUBLE))
                 / (CAST(n_ref + n_cur AS DOUBLE) * t_cur
                    / CAST(t_ref + t_cur AS DOUBLE)), 6) AS contrib
    FROM h, t
    """,
    "basket-size mix drift 1996 vs 1997: chi-square contribution per "
    "line-count band",
    tags=("analytics", "drift"),
)
def q_basket_mix_drift_orders(spark, sf_dir):
    """chi2_categorical (operators/drift.py) applied to a DERIVED
    categorical — the basket-size band — showing the drift operator
    composes over computed features, not just raw columns: are orders
    getting bigger year over year, and which band moved?"""
    from pramen_spark.operators.drift import chi2_categorical

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sz = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_c"))
    band = (
        F.when(F.col("_c") == 1, "1")
        .when(F.col("_c") <= 3, "2-3")
        .when(F.col("_c") <= 5, "4-5")
        .otherwise("6+")
    )
    j = sz.join(o, sz["l_orderkey"] == o["o_orderkey"]).select(
        F.year("o_orderdate").alias("_yr"), band.alias("band")
    )
    ref = j.where(F.col("_yr") == 1996)
    cur = j.where(F.col("_yr") == 1997)
    return chi2_categorical(ref, cur, "band")


@query(
    "yoy_contribution_brands",
    """
    WITH cells AS (
        SELECT p_brand AS grp, year(l_shipdate) AS per,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    a AS (SELECT grp, r AS r_a FROM cells WHERE per = 1996),
    b AS (SELECT grp, r AS r_b FROM cells WHERE per = 1997),
    j AS (
        SELECT a.grp, r_a, r_b, r_b - r_a AS chg
        FROM a JOIN b ON a.grp = b.grp
    ),
    w AS (SELECT grp, r_a, r_b, chg, SUM(chg) OVER () AS tot FROM j)
    SELECT grp, CAST(r_a AS DOUBLE) AS rev_a,
           CAST(r_b AS DOUBLE) AS rev_b,
           CAST(chg AS DOUBLE) AS change,
           ROUND(CAST(chg AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS share_of_change
    FROM w
    """,
    "year-over-year revenue-change contribution per brand: which "
    "brands drove the total move, as exact decimal shares",
    tags=("analytics", "finance"),
)
def q_yoy_contribution_brands(spark, sf_dir):
    """The 'what moved the number' decomposition (composition in the
    pvm_bridge family): per-brand changes stay exact decimals, the
    total change is a window sum of decimals over the brand table,
    and each share divides two exact values once. Brands present in
    only one year drop (pvm_bridge's documented convention)."""
    from pyspark.sql import Window as W

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).where(
        F.year("l_shipdate").isin([1996, 1997])
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    cells = j.groupBy(
        F.col("p_brand").alias("grp"), F.year("l_shipdate").alias("_per")
    ).agg(F.sum(rev).alias("_r"))
    a = cells.where(F.col("_per") == 1996).select(
        "grp", F.col("_r").alias("_ra")
    )
    b = cells.where(F.col("_per") == 1997).select(
        "grp", F.col("_r").alias("_rb")
    )
    both = a.join(b, "grp").withColumn(
        "_chg", F.col("_rb") - F.col("_ra")
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return both.select(
        "grp",
        F.col("_ra").cast("double").alias("rev_a"),
        F.col("_rb").cast("double").alias("rev_b"),
        F.col("_chg").cast("double").alias("change"),
        F.round(
            F.col("_chg").cast("double")
            / F.sum("_chg").over(w_all).cast("double"),
            6,
        ).alias("share_of_change"),
    )


@query(
    "vocab_coverage_documents",
    r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS token
        FROM documents WHERE trim(text) <> ''
    ),
    v AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok WHERE token <> '' GROUP BY token
    ),
    r AS (
        SELECT row_number() OVER (ORDER BY f DESC, token) AS rnk,
               SUM(f) OVER (ORDER BY f DESC, token
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(f) OVER () AS tot
        FROM v
    )
    SELECT CAST(rnk AS BIGINT) AS vocab_size,
           ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS coverage
    FROM r WHERE rnk IN (10, 100, 1000, 10000)
    """,
    "vocabulary coverage curve: share of corpus token occurrences "
    "covered by the top 10/100/1000/10000 tokens",
    tags=("text", "training"),
)
def q_vocab_coverage_documents(spark, sf_dir):
    """The tokenizer-budget design curve (composition in the
    vocabulary-first family of zipf_slope / vocab_truncate): the
    corpus collapses to the token-frequency table FIRST, so the
    ranking windows run over the VOCABULARY, and the curve reads out
    at fixed rank checkpoints. Exact integer cumulative sums."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    v = (
        d.where(F.trim(F.col("text")) != "")
        .select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("_f"))
    )
    w = W.orderBy(F.desc("_f"), F.asc("token"))
    w_cum = w.rowsBetween(W.unboundedPreceding, 0)
    w_all = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = v.select(
        F.row_number().over(w).cast("long").alias("vocab_size"),
        F.sum("_f").over(w_cum).alias("_cum"),
        F.sum("_f").over(w_all).alias("_tot"),
    )
    return r.where(
        F.col("vocab_size").isin([10, 100, 1000, 10000])
    ).select(
        "vocab_size",
        F.round(
            F.col("_cum").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("coverage"),
    )


@query(
    "dup_cluster_sizes_documents",
    """
    WITH c AS (
        SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS sz
        FROM documents GROUP BY 1
    )
    SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM c GROUP BY sz
    """,
    "exact-duplicate cluster-size histogram over the md5 hash space: "
    "how duplication is shaped, not just how much",
    tags=("dedup", "quality"),
)
def q_dup_cluster_sizes_documents(spark, sf_dir):
    """The SHAPE behind dup_rate_by_source's rates (composition over
    dedup_exact's hash space): a corpus with one 10,000-copy template
    dedups very differently from one with 5,000 pairs, and this
    histogram is what picks between exact-hash and MinHash passes.
    Two map-side-combined aggregations over 32-byte digests."""
    d = load_table(spark, sf_dir, "documents")
    c = d.select(F.md5("text").alias("_h")).groupBy("_h").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return c.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


@query(
    "dow_hour_heatmap_events",
    """
    WITH g AS (
        SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
    SELECT dow, hr, n,
           ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
    FROM g, t
    """,
    "weekday x hour activity heatmap: event counts and shares on the "
    "7x24 grid (Monday = 0)",
    tags=("analytics", "timegrid"),
)
def q_dow_hour_heatmap_events(spark, sf_dir):
    """The capacity/anomaly heatmap every ops dashboard opens with
    (pure composition in the weekday_seasonality family): one
    168-cell map-side-combined aggregation, total re-aggregated from
    the grid and broadcast. Weekday is ISO-Monday-0 on both engines;
    hour is the session-UTC hour on both."""
    ev = load_events(spark, sf_dir)
    g = ev.groupBy(
        F.weekday(F.col("ts")).cast("long").alias("dow"),
        F.hour(F.col("ts")).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = g.agg(F.sum("n").cast("long").alias("_tot"))
    return g.crossJoin(F.broadcast(t)).select(
        "dow",
        "hr",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("share"),
    )


@query(
    "qte_weekend_value_events",
    """
    WITH s AS (
        SELECT CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS wk,
               value FROM events
    ),
    q AS (
        SELECT wk, CAST(COUNT(*) AS BIGINT) AS n,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.9) AS p90
        FROM s GROUP BY wk
    )
    SELECT a.n AS n_weekend, b.n AS n_weekday,
           ROUND(a.p25 - b.p25, 6) AS qte_p25,
           ROUND(a.p50 - b.p50, 6) AS qte_p50,
           ROUND(a.p75 - b.p75, 6) AS qte_p75,
           ROUND(a.p90 - b.p90, 6) AS qte_p90
    FROM (SELECT * FROM q WHERE wk = 1) a,
         (SELECT * FROM q WHERE wk = 0) b
    """,
    "quantile treatment effect of weekends on event value: exact "
    "per-quantile differences, not just the mean shift",
    tags=("analytics", "drift"),
)
def q_qte_weekend_value_events(spark, sf_dir):
    """WHERE in the distribution the effect lives (composition in the
    welch/ks family): a mean shift can hide a tail-only effect —
    per-group exact interpolated quantiles difference engine-exactly.
    One two-group aggregation; the pivot is a 2-row cross join."""
    ev = load_events(spark, sf_dir)
    wk = (F.weekday(F.col("ts")) >= 5).cast("int")
    q = ev.groupBy(wk.alias("_wk")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile(F.col("value"), 0.25).alias("_p25"),
        F.percentile(F.col("value"), 0.5).alias("_p50"),
        F.percentile(F.col("value"), 0.75).alias("_p75"),
        F.percentile(F.col("value"), 0.9).alias("_p90"),
    )
    a = q.where(F.col("_wk") == 1).select(
        F.col("n").alias("n_weekend"),
        *[F.col(f"_p{p}").alias(f"_a{p}") for p in (25, 50, 75, 90)],
    )
    b = q.where(F.col("_wk") == 0).select(
        F.col("n").alias("n_weekday"),
        *[F.col(f"_p{p}").alias(f"_b{p}") for p in (25, 50, 75, 90)],
    )
    return a.crossJoin(b).select(
        "n_weekend",
        "n_weekday",
        *[
            F.round(F.col(f"_a{p}") - F.col(f"_b{p}"), 6).alias(
                f"qte_p{p}"
            )
            for p in (25, 50, 75, 90)
        ],
    )


@query(
    "catalog_coverage_parts",
    """
    WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part
    ),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sold FROM sold)
    SELECT n_parts, n_sold,
           CAST(n_parts - n_sold AS BIGINT) AS n_never_sold,
           ROUND(CAST(n_sold AS DOUBLE) / CAST(n_parts AS DOUBLE), 6)
             AS coverage
    FROM t, s
    """,
    "catalog coverage: how many parts have ever sold, the dead-stock "
    "count, and the coverage ratio",
    tags=("analytics", "finance"),
)
def q_catalog_coverage_parts(spark, sf_dir):
    """The dead-stock screen (pure composition): distinct sold keys
    from one map-side-combined pass over lineitem against the part
    catalog's count — the cold-start denominator
    negative_samples_orders draws from. (TPC-H sells every part at
    real scale; thin scale factors leave genuine gaps to count.)"""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sold = l.select("l_partkey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sold")
    )
    tot = p.agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    return tot.crossJoin(sold).select(
        "n_parts",
        "n_sold",
        (F.col("n_parts") - F.col("n_sold")).cast("long").alias(
            "n_never_sold"
        ),
        F.round(
            F.col("n_sold").cast("double")
            / F.col("n_parts").cast("double"),
            6,
        ).alias("coverage"),
    )


@query(
    "price_points_parts",
    """
    WITH up AS (
        SELECT l_partkey,
               CAST(COUNT(DISTINCT l_extendedprice / l_quantity)
                    AS BIGINT) AS n_points
        FROM lineitem WHERE l_quantity > 0 GROUP BY 1
    )
    SELECT n_points, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM up GROUP BY n_points
    """,
    "price-ladder audit: distribution of distinct realized unit "
    "prices per part — one point is a fixed ladder, many is leakage",
    tags=("quality", "finance"),
)
def q_price_points_parts(spark, sf_dir):
    """Price-integrity screening (pure composition): a part
    transacting at many distinct unit prices signals manual overrides
    or broken discount logic. Unit prices are IEEE-double divisions
    (identical everywhere, so the DISTINCT is engine-exact); two
    map-side-combined aggregations."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") > 0
    )
    up = l.groupBy("l_partkey").agg(
        F.countDistinct(
            F.col("l_extendedprice") / F.col("l_quantity")
        ).cast("long").alias("n_points")
    )
    return up.groupBy("n_points").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


@query(
    "gini_by_mktsegment",
    """
    WITH spend AS (
        SELECT c.c_mktsegment AS grp, o.o_custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT grp, CAST(x AS DECIMAL(18,2)) AS xd,
               ROW_NUMBER() OVER (PARTITION BY grp
                                  ORDER BY x, o_custkey) AS i
        FROM spend
    ),
    t AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, SUM(xd) AS tt,
               SUM(i * xd) AS ss
        FROM r GROUP BY grp
    )
    SELECT grp, n, CAST(tt AS DOUBLE) AS total,
           ROUND((2.0 * CAST(ss AS DOUBLE) / CAST(tt AS DOUBLE)
                  - (n + 1)) / n, 6) AS gini
    FROM t
    """,
    "customer-spend Gini per market segment: is concentration a "
    "one-segment problem or everywhere?",
    tags=("analytics", "evalmetrics"),
)
def q_gini_by_mktsegment(spark, sf_dir):
    """gini fanned out over segments
    (operators/evalmetrics.py::gini_by_group): the ranking window
    PARTITIONS BY GROUP, so the global form's one serial step
    disappears and segments rank in parallel; rank-weighted decimal
    sums keep each coefficient exact."""
    from pramen_spark.operators.evalmetrics import gini_by_group

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_custkey")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("x")
        )
    )
    return gini_by_group(spend, "seg", "x", "o_custkey")


@query(
    "uplift_deciles_events",
    """
    WITH th AS (
        SELECT [quantile_cont(value, 0.25), quantile_cont(value, 0.5),
                quantile_cont(value, 0.75)] AS t
        FROM events
    ),
    b AS (
        SELECT CAST(1 + (CASE WHEN value > t[1] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[2] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[3] THEN 1 ELSE 0 END)
                    AS BIGINT) AS bin,
               CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS trt,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events, th
    ),
    g AS (
        SELECT bin,
               CAST(SUM(trt) AS BIGINT) AS n_t,
               CAST(SUM(trt * y) AS BIGINT) AS x_t,
               CAST(SUM(1 - trt) AS BIGINT) AS n_c,
               CAST(SUM((1 - trt) * y) AS BIGINT) AS x_c
        FROM b GROUP BY bin
    )
    SELECT bin, n_t, x_t, n_c, x_c,
           ROUND(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE), 6)
             AS rate_t,
           ROUND(CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
             AS rate_c,
           ROUND(CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
             AS uplift
    FROM g
    """,
    "uplift by value quartile: weekend-vs-weekday purchase-rate "
    "lift per value band — where the treatment effect concentrates",
    tags=("analytics", "evalmetrics"),
)
def q_uplift_deciles_events(spark, sf_dir):
    """The heterogeneous-treatment-effect readout (composition in the
    woe_iv/gains family): quartile bins from ONE broadcast
    exact-percentile row, then a 2×2 of exact integer counts per bin.
    two_proportion_ztest says IF the rates differ; this says for
    WHOM."""
    ev = load_events(spark, sf_dir)
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    th = ev.agg(F.percentile(F.col("value"), qs).alias("_th"))
    b = F.lit(1)
    for i in (1, 2, 3):
        b = b + (F.col("value") > F.element_at(F.col("_th"), i)).cast(
            "int"
        )
    trt = (F.weekday(F.col("ts")) >= 5).cast("int")
    y = (F.col("event_type") == "purchase").cast("int")
    g = (
        ev.crossJoin(F.broadcast(th))
        .groupBy(b.cast("long").alias("bin"))
        .agg(
            F.sum(trt).cast("long").alias("n_t"),
            F.sum(trt * y).cast("long").alias("x_t"),
            F.sum(F.lit(1) - trt).cast("long").alias("n_c"),
            F.sum((F.lit(1) - trt) * y).cast("long").alias("x_c"),
        )
    )
    rt = F.col("x_t").cast("double") / F.col("n_t").cast("double")
    rc = F.col("x_c").cast("double") / F.col("n_c").cast("double")
    return g.select(
        "bin", "n_t", "x_t", "n_c", "x_c",
        F.round(rt, 6).alias("rate_t"),
        F.round(rc, 6).alias("rate_c"),
        F.round(rt - rc, 6).alias("uplift"),
    )


@query(
    "token_diversity_by_source",
    r"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS token
        FROM documents WHERE trim(text) <> ''
    ),
    cat AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE token <> '' GROUP BY 1, 2
    ),
    g AS (
        SELECT source AS entity, CAST(SUM(n) AS BIGINT) AS n_obs,
               CAST(COUNT(*) AS BIGINT) AS richness,
               CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs
        FROM cat GROUP BY 1
    )
    SELECT entity, n_obs, richness,
           ROUND(1.0 - CAST(pairs AS DOUBLE)
                 / CAST(n_obs * (n_obs - 1) AS DOUBLE), 6) AS simpson_d
    FROM g
    """,
    "vocabulary Simpson diversity per source: probability two token "
    "occurrences from a source are different words",
    tags=("text", "features"),
)
def q_token_diversity_by_source(spark, sf_dir):
    """simpson_diversity (operators/features.py) composed onto a NEW
    domain — sources as entities, tokens as categories — the
    templated-feed detector: a source whose token diversity craters
    is boilerplate, whatever its document count says. The explode is
    the only corpus-volume stage; pair arithmetic stays exact
    integers."""
    from pramen_spark.operators.features import simpson_diversity

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    rows = (
        d.where(F.trim(F.col("text")) != "")
        .select("source", F.explode(toks).alias("token"))
        .where(F.col("token") != "")
    )
    return simpson_diversity(rows, "source", "token")


@query(
    "weekday_anova_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    base AS (SELECT isodow(day) - 1 AS g, revenue AS v FROM daily),
    gg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS ss
        FROM base GROUP BY g
    ),
    red AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS st,
               CAST(SUM(CAST(ss AS DECIMAL(38,6))) AS DOUBLE) AS sst,
               SUM(s * s / CAST(n_g AS DOUBLE)) AS sq_over_n
        FROM gg
    )
    SELECT k, n,
           ROUND(((sq_over_n - st * st / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((sst - sq_over_n)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             AS f_stat,
           ROUND((sq_over_n - st * st / CAST(n AS DOUBLE))
                 / ((sq_over_n - st * st / CAST(n AS DOUBLE))
                    + (sst - sq_over_n)), 6) AS eta_squared
    FROM red
    """,
    "seasonality strength: one-way ANOVA of daily revenue across "
    "weekdays with eta-squared (share of variance the weekly cycle "
    "explains)",
    tags=("analytics", "timegrid"),
)
def q_weekday_anova_daily(spark, sf_dir):
    """HOW MUCH of the variance the weekly cycle explains
    (anova_oneway composed with the eta² effect size): F says the
    cycle is real; η² says whether it's worth modeling —
    seasonal_factors gives the shape, this the strength. Weekday
    grouping over the calendar-bounded daily grid."""
    from pramen_spark.operators.drift import anova_oneway

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    base = daily.select(
        F.weekday(F.col("day")).alias("dow"), F.col("revenue")
    )
    a = anova_oneway(base, "dow", F.col("revenue"))
    return a.select(
        "k",
        "n",
        "f_stat",
        F.round(
            F.col("ss_between")
            / (F.col("ss_between") + F.col("ss_within")),
            6,
        ).alias("eta_squared"),
    )


@query(
    "shard_rebalance_audit_documents",
    """
    WITH keys AS (SELECT CAST(doc_id AS VARCHAR) AS k FROM documents),
    m AS (
        SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT % 16 AS m16,
               ('0x' || substr(md5(k), 1, 8))::BIGINT % 17 AS m17,
               k
        FROM keys
    ),
    grid AS (
        SELECT k, CAST(s.s AS INTEGER) AS s,
               ('0x' || substr(md5(k || '#' || CAST(s.s AS VARCHAR)),
                               1, 8))::BIGINT AS h
        FROM keys, (SELECT unnest(range(0, 17)) AS s) s
    ),
    h17 AS (
        SELECT k, s FROM (
            SELECT k, s, row_number() OVER (PARTITION BY k
                         ORDER BY h DESC, s DESC) AS r
            FROM grid) WHERE r = 1
    ),
    h16 AS (
        SELECT k, s FROM (
            SELECT k, s, row_number() OVER (PARTITION BY k
                         ORDER BY h DESC, s DESC) AS r
            FROM grid WHERE s < 16) WHERE r = 1
    ),
    j AS (
        SELECT m.k, m16, m17, h16.s AS hrw16, h17.s AS hrw17
        FROM m JOIN h16 ON m.k = h16.k JOIN h17 ON m.k = h17.k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(CAST(SUM(CASE WHEN m16 <> m17 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS moved_mod,
           ROUND(CAST(SUM(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS moved_hrw
    FROM j
    """,
    "shard-rebalance audit, 16 -> 17 shards: share of keys that move "
    "under mod hashing (almost all) vs rendezvous/HRW hashing (~1/17)",
    tags=("scale", "sampling"),
)
def q_shard_rebalance_audit_documents(spark, sf_dir):
    """WHY shard_assignment must never be `key % n` (measured, not
    asserted): adding one shard moves ~16/17 of keys under mod but
    only ~1/17 under highest-random-weight hashing — the difference
    between re-shuffling 100 TB and moving 6% of it. HRW argmax via a
    17-way md5 grid and a (hash desc, shard desc) deterministic
    rank; everything is portable md5 arithmetic."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    keys = d.select(F.col("doc_id").cast("string").alias("k"))
    h8 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c), 1, 8), 16, 10
    ).cast("long")
    m = keys.select(
        "k",
        (h8(F.col("k")) % 16).alias("m16"),
        (h8(F.col("k")) % 17).alias("m17"),
    )
    grid = keys.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(16))).alias("s")
    ).select(
        "k",
        "s",
        h8(F.concat(F.col("k"), F.lit("#"), F.col("s").cast("string")))
        .alias("h"),
    )
    w17 = W.partitionBy("k").orderBy(F.desc("h"), F.desc("s"))
    h17 = (
        grid.withColumn("r", F.row_number().over(w17))
        .where(F.col("r") == 1)
        .select("k", F.col("s").alias("hrw17"))
    )
    h16 = (
        grid.where(F.col("s") < 16)
        .withColumn("r", F.row_number().over(w17))
        .where(F.col("r") == 1)
        .select("k", F.col("s").alias("hrw16"))
    )
    j = m.join(h16, "k").join(h17, "k")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(
            F.sum((F.col("m16") != F.col("m17")).cast("int")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("moved_mod"),
        F.round(
            F.sum((F.col("hrw16") != F.col("hrw17")).cast("int")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("moved_hrw"),
    )


@query(
    "dedup_bias_audit_documents",
    """
    WITH reps AS (
        SELECT MIN(doc_id) AS keep FROM documents GROUP BY md5(text)
    ),
    before AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
        FROM documents GROUP BY lang
    ),
    tb AS (SELECT CAST(SUM(n_before) AS BIGINT) AS t_b FROM before),
    after AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_after
        FROM documents d JOIN reps r ON d.doc_id = r.keep
        GROUP BY lang
    ),
    ta AS (SELECT CAST(SUM(n_after) AS BIGINT) AS t_a FROM after)
    SELECT b.lang, n_before, n_after,
           ROUND(CAST(n_before AS DOUBLE) / CAST(t_b AS DOUBLE), 6)
             AS share_before,
           ROUND(CAST(n_after AS DOUBLE) / CAST(t_a AS DOUBLE), 6)
             AS share_after,
           ROUND(CAST(n_after AS DOUBLE) / CAST(t_a AS DOUBLE)
                 - CAST(n_before AS DOUBLE) / CAST(t_b AS DOUBLE), 6)
             AS share_delta
    FROM before b JOIN after a ON b.lang = a.lang, tb, ta
    """,
    "dedup survivorship bias: per-language corpus share before vs "
    "after exact dedup keeps min-id representatives",
    tags=("dedup", "quality"),
)
def q_dedup_bias_audit_documents(spark, sf_dir):
    """Does dedup silently reweight the mixture? (composition over
    dedup_exact's representative convention): a language whose share
    jumps after dedup was padding its count with copies — the
    governance check that runs BEFORE mixture_weights trusts
    post-dedup counts. Digest-keyed aggregations only; text never
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    reps = d.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    before = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    after = (
        d.join(reps, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_after"))
    )
    tb = before.agg(F.sum("n_before").cast("long").alias("_tb"))
    ta = after.agg(F.sum("n_after").cast("long").alias("_ta"))
    j = (
        before.join(after, "lang")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
    )
    sb = F.col("n_before").cast("double") / F.col("_tb").cast("double")
    sa = F.col("n_after").cast("double") / F.col("_ta").cast("double")
    return j.select(
        "lang",
        "n_before",
        "n_after",
        F.round(sb, 6).alias("share_before"),
        F.round(sa, 6).alias("share_after"),
        F.round(sa - sb, 6).alias("share_delta"),
    )


@query(
    "bootstrap_uplift_ci_events",
    """
    WITH base AS (
        SELECT event_id,
               CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS t,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    w AS (
        SELECT b, t, y,
               CASE WHEN u < 0.36787944117144233 THEN 0
                    WHEN u < 0.7357588823428847 THEN 1
                    WHEN u < 0.9196986029286058 THEN 2
                    WHEN u < 0.9810118431238463 THEN 3
                    WHEN u < 0.9963401531726563 THEN 4
                    WHEN u < 0.9994058151824183 THEN 5
                    WHEN u < 0.999916758850712 THEN 6
                    ELSE 7 END AS w
        FROM (
            SELECT b.b AS b, e.t, e.y,
                   ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                                       || chr(31) || 'uplift'
                                       || CAST(b.b // 4 AS VARCHAR)),
                                   1 + (b.b % 4) * 8, 8))
                     ::BIGINT / 4294967296.0 AS u
            FROM base e, range(0, 50) b(b)
        )
    ),
    m AS (
        SELECT b,
               SUM(w * t * y) / SUM(w * t)
               - SUM(w * (1 - t) * y) / SUM(w * (1 - t)) AS db
        FROM w GROUP BY b
    ),
    pt AS (
        SELECT CAST(SUM(t) AS BIGINT) AS n_exp,
               CAST(SUM(1 - t) AS BIGINT) AS n_unexp,
               CAST(SUM(t * y) AS BIGINT) AS xt,
               CAST(SUM((1 - t) * y) AS BIGINT) AS xc
        FROM base
    )
    SELECT n_exp, n_unexp,
           ROUND(CAST(xt AS DOUBLE) / CAST(n_exp AS DOUBLE)
                 - CAST(xc AS DOUBLE) / CAST(n_unexp AS DOUBLE), 6)
             AS uplift,
           ROUND((SELECT quantile_cont(db, 0.025) FROM m), 6) AS ci_lo,
           ROUND((SELECT quantile_cont(db, 0.975) FROM m), 6) AS ci_hi,
           CAST(50 AS BIGINT) AS n_boot
    FROM pt
    """,
    "derandomized Poisson-bootstrap 95% CI for the weekend-vs-weekday "
    "purchase-rate difference: 50 paired resamples in one pass",
    tags=("analytics", "sampling"),
)
def q_bootstrap_uplift_ci_events(spark, sf_dir):
    """The error bar the experiment readout actually ships
    (operators/sampling.py::bootstrap_uplift_ci):
    two_proportion_ztest's normal approximation gets an exact
    finite-sample companion — both group rates inside one replicate
    share the same md5-derandomized Poisson world, and all 200
    weighted sums evaluate in ONE map-side-combined aggregation."""
    from pramen_spark.operators.sampling import bootstrap_uplift_ci

    ev = load_events(spark, sf_dir)
    return bootstrap_uplift_ci(
        ev,
        F.weekday(F.col("ts")) >= 5,
        F.col("event_type") == "purchase",
        "event_id",
        n_boot=50,
    )


@query(
    "retention_curve_events",
    """
    WITH du AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    f AS (SELECT user_id, MIN(dayn) AS cohort FROM du GROUP BY user_id),
    h AS (SELECT MAX(dayn) AS mx FROM du),
    off AS (
        SELECT f.user_id, f.cohort, CAST(t.k AS BIGINT) AS k
        FROM f, (SELECT unnest(range(1, 8)) AS k) t, h
        WHERE f.cohort + t.k <= h.mx
    )
    SELECT o.k AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_eligible,
           CAST(SUM(CASE WHEN d2.user_id IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           ROUND(CAST(SUM(CASE WHEN d2.user_id IS NOT NULL
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS retention
    FROM off o
    LEFT JOIN du d2 ON o.user_id = d2.user_id
                    AND d2.dayn = o.cohort + o.k
    GROUP BY o.k
    """,
    "pooled retention curve, day 1-7: share of eligible users active "
    "exactly k days after first being seen",
    tags=("analytics", "sequences"),
)
def q_retention_curve_events(spark, sf_dir):
    """The full curve d7_retention samples one point of (composition
    over the same machinery): a bounded 7-way offset explode per
    user, ELIGIBILITY gated on the data horizon so late cohorts
    don't dilute late offsets, and one co-keyed join back to the
    distinct (user, day) pairs."""
    ev = load_events(spark, sf_dir)
    du = ev.select(
        "user_id",
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS LONG)").alias(
            "_dayn"
        ),
    ).distinct()
    f = du.groupBy("user_id").agg(F.min("_dayn").alias("_cohort"))
    h = du.agg(F.max("_dayn").alias("_mx"))
    off = (
        f.crossJoin(F.broadcast(h))
        .select(
            "user_id",
            "_cohort",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.lit(7).cast("long"))
            ).alias("day_offset"),
            "_mx",
        )
        .where(F.col("_cohort") + F.col("day_offset") <= F.col("_mx"))
    )
    hit = du.select(
        "user_id", F.col("_dayn").alias("_target"), F.lit(1).alias("_hit")
    )
    j = off.join(
        hit,
        (off["user_id"] == hit["user_id"])
        & (hit["_target"] == off["_cohort"] + off["day_offset"]),
        "left",
    )
    return j.groupBy("day_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_eligible"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
        .cast("long")
        .alias("n_retained"),
        F.round(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("retention"),
    )


@query(
    "srm_check_documents",
    """
    WITH s AS (
        SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8))::BIGINT
                         / 4294967296.0 < 0.5
                    THEN 1 ELSE 0 END AS arm
        FROM documents
    ),
    c AS (
        SELECT CAST(SUM(arm) AS BIGINT) AS n_a,
               CAST(SUM(1 - arm) AS BIGINT) AS n_b
        FROM s
    )
    SELECT n_a, n_b,
           ROUND((CAST(n_a AS DOUBLE)
                  - CAST(n_a + n_b AS DOUBLE) / 2.0)
                 * (CAST(n_a AS DOUBLE)
                    - CAST(n_a + n_b AS DOUBLE) / 2.0)
                 / (CAST(n_a + n_b AS DOUBLE) / 2.0)
                 + (CAST(n_b AS DOUBLE)
                    - CAST(n_a + n_b AS DOUBLE) / 2.0)
                 * (CAST(n_b AS DOUBLE)
                    - CAST(n_a + n_b AS DOUBLE) / 2.0)
                 / (CAST(n_a + n_b AS DOUBLE) / 2.0), 6) AS chi2,
           (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           / (CAST(n_a + n_b AS DOUBLE) / 2.0)
           + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
           / (CAST(n_a + n_b AS DOUBLE) / 2.0) > 3.841 AS srm_flag
    FROM c
    """,
    "sample-ratio-mismatch check of the md5 50/50 split: chi2 of the "
    "observed arm counts against the designed ratio, flag at 95%",
    tags=("quality", "sampling"),
)
def q_srm_check_documents(spark, sf_dir):
    """The #1 A/B trust check (composition over hash_sample's md5
    split): an SRM flag means the assignment itself is broken and
    every downstream readout is invalid — run it before looking at
    any metric. Exact integer arm counts; chi2 1-df scalar; the flag
    thresholds at 3.841 (95%)."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(16 ** 8))
    arm = (u < 0.5).cast("int")
    c = d.agg(
        F.sum(arm).cast("long").alias("n_a"),
        F.sum(F.lit(1) - arm).cast("long").alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")).cast("double") / F.lit(2.0)
    chi2 = (
        (F.col("n_a").cast("double") - e)
        * (F.col("n_a").cast("double") - e) / e
        + (F.col("n_b").cast("double") - e)
        * (F.col("n_b").cast("double") - e) / e
    )
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


@query(
    "sla_attainment_priority",
    """
    WITH l AS (
        SELECT o_orderpriority AS priority,
               CAST(CAST(l_shipdate AS DATE)
                    - CAST(o_orderdate AS DATE) AS BIGINT) AS lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS within_30d,
           ROUND(CAST(SUM(CASE WHEN lat <= 60 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS within_60d,
           ROUND(CAST(SUM(CASE WHEN lat <= 90 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS within_90d
    FROM l GROUP BY priority
    """,
    "SLA attainment per order priority: share of lines shipped "
    "within 30/60/90 days, one pass",
    tags=("analytics", "finance"),
)
def q_sla_attainment_priority(spark, sf_dir):
    """The contract-compliance view of ship_latency's percentiles
    (the one-pass threshold-sweep pattern): percentiles answer 'how
    slow are we', attainment answers 'what fraction breached the
    promise' — three thresholds as conditional sums over one latency
    column."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("_lat"),
    )
    share = lambda d: F.round(  # noqa: E731
        F.sum((F.col("_lat") <= d).cast("int")).cast("double")
        / F.count(F.lit(1)).cast("double"),
        6,
    )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        share(30).alias("within_30d"),
        share(60).alias("within_60d"),
        share(90).alias("within_90d"),
    )


@query(
    "token_length_hist_documents",
    r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS token
        FROM documents WHERE trim(text) <> ''
    ),
    g AS (
        SELECT CAST(length(token) AS BIGINT) AS token_len,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE token <> '' GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
    SELECT token_len, n,
           ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
    FROM g, t
    """,
    "token-length histogram over corpus occurrences: the word-shape "
    "profile that sizes subword vocabularies",
    tags=("text", "training"),
)
def q_token_length_hist_documents(spark, sf_dir):
    """The word-shape profile behind BPE merge budgets (composition
    in the vocabulary-first family): long-tailed lengths mean
    compounds a subword tokenizer must split. One explode, one
    length-domain aggregation, total re-aggregated and broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    g = (
        d.where(F.trim(F.col("text")) != "")
        .select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy(F.length("token").cast("long").alias("token_len"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = g.agg(F.sum("n").cast("long").alias("_tot"))
    return g.crossJoin(F.broadcast(t)).select(
        "token_len",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("share"),
    )


@query(
    "mde_power_events",
    """
    WITH c AS (
        SELECT CAST(SUM(CASE WHEN isodow(ts) - 1 >= 5
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
               CAST(SUM(CASE WHEN isodow(ts) - 1 < 5
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events
    )
    SELECT n_1, n_2,
           ROUND(CAST(x AS DOUBLE) / CAST(n_1 + n_2 AS DOUBLE), 6)
             AS base_rate,
           ROUND((1.959963984540054 + 0.8416212335729143)
                 * sqrt((CAST(x AS DOUBLE) / CAST(n_1 + n_2 AS DOUBLE))
                        * (1.0 - CAST(x AS DOUBLE)
                           / CAST(n_1 + n_2 AS DOUBLE))
                        * (1.0 / CAST(n_1 AS DOUBLE)
                           + 1.0 / CAST(n_2 AS DOUBLE))), 6) AS mde
    FROM c
    """,
    "minimum detectable effect at 80% power / 95% confidence for the "
    "weekend-vs-weekday purchase-rate comparison, from exact cells",
    tags=("analytics", "sampling"),
)
def q_mde_power_events(spark, sf_dir):
    """The experiment-design readout that belongs NEXT TO every
    two_proportion_ztest (pure composition): with these arm sizes and
    this base rate, effects smaller than the MDE are invisible — a
    'not significant' verdict below it means nothing. z literals are
    exact doubles (1.96…, 0.8416…) on both engines."""
    ev = load_events(spark, sf_dir)
    c = ev.agg(
        F.sum((F.weekday(F.col("ts")) >= 5).cast("int"))
        .cast("long")
        .alias("n_1"),
        F.sum((F.weekday(F.col("ts")) < 5).cast("int"))
        .cast("long")
        .alias("n_2"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("x"),
    )
    p = F.col("x").cast("double") / (F.col("n_1") + F.col("n_2")).cast(
        "double"
    )
    mde = F.lit(1.959963984540054 + 0.8416212335729143) * F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.lit(1.0) / F.col("n_1").cast("double")
            + F.lit(1.0) / F.col("n_2").cast("double")
        )
    )
    return c.select(
        "n_1",
        "n_2",
        F.round(p, 6).alias("base_rate"),
        F.round(mde, 6).alias("mde"),
    )


@query(
    "freshness_by_type_events",
    """
    WITH g AS (
        SELECT event_type,
               MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
                 AS last_day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ),
    h AS (SELECT MAX(last_day) AS mx FROM g),
    ld AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                                  // 86400000000
                                  = (SELECT mx FROM h)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day
        FROM events GROUP BY event_type
    )
    SELECT g.event_type,
           DATE '1970-01-01' + CAST(g.last_day AS INTEGER) AS last_seen,
           CAST(h.mx - g.last_day AS BIGINT) AS staleness_days,
           g.n, ld.n_last_day
    FROM g CROSS JOIN h JOIN ld ON g.event_type = ld.event_type
    """,
    "feed-freshness audit per event type: last-seen day, staleness "
    "against the dataset horizon, and last-day volume",
    tags=("quality", "validation"),
)
def q_freshness_by_type_events(spark, sf_dir):
    """The first page of every pipeline-ops dashboard (pure
    composition): a type whose staleness jumps stopped flowing —
    catching it here is cheaper than catching it in model drift. Two
    map-side-combined aggregations and a 1-row horizon broadcast."""
    ev = load_events(spark, sf_dir)
    dayn = F.expr("CAST(unix_micros(ts) DIV 86400000000 AS LONG)")
    g = ev.groupBy("event_type").agg(
        F.max(dayn).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    h = g.agg(F.max("_last").alias("_mx"))
    ld = (
        ev.select("event_type", dayn.alias("_d"))
        .crossJoin(F.broadcast(h))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("_d") == F.col("_mx")).cast("int"))
            .cast("long")
            .alias("n_last_day")
        )
    )
    return (
        g.crossJoin(F.broadcast(h))
        .join(ld, "event_type")
        .select(
            "event_type",
            F.date_from_unix_date(F.col("_last").cast("int")).alias(
                "last_seen"
            ),
            (F.col("_mx") - F.col("_last")).cast("long").alias(
                "staleness_days"
            ),
            "n",
            "n_last_day",
        )
    )


@query(
    "neyman_allocation_orders",
    """
    WITH g AS (
        SELECT o_orderpriority AS stratum,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS s1,
               CAST(SUM(CAST(o_totalprice * o_totalprice
                             AS DECIMAL(38,6))) AS DOUBLE) AS s2
        FROM orders GROUP BY 1
    ),
    sd AS (
        SELECT stratum, n,
               sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                    / (CAST(n AS DOUBLE)
                       * (CAST(n AS DOUBLE) - 1.0))) AS sdev
        FROM g
    ),
    t AS (SELECT SUM(CAST(n AS DOUBLE) * sdev) AS tot FROM sd)
    SELECT stratum, n, ROUND(sdev, 6) AS sd,
           ROUND(CAST(n AS DOUBLE) * sdev / tot, 6) AS share,
           ROUND(CAST(n AS DOUBLE) * sdev / tot * 1000.0, 2)
             AS alloc_1000
    FROM sd, t
    """,
    "Neyman optimal sample allocation across order priorities: each "
    "stratum's share of a 1000-row audit budget proportional to "
    "n_h * sd_h",
    tags=("analytics", "sampling"),
)
def q_neyman_allocation_orders(spark, sf_dir):
    """The design tool stratified_sample should be fed BY (pure
    composition, welch decimal moments): equal-rate sampling wastes
    budget on homogeneous strata — Neyman allocation puts auditors
    where the variance is. The 5-term weight normalization is scalar
    work on the stratum table."""
    o = load_table(spark, sf_dir, "orders")
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    v = F.col("o_totalprice")
    g = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(v)).cast("double").alias("_s1"),
        F.sum(dec(v * v)).cast("double").alias("_s2"),
    )
    n = F.col("n").cast("double")
    sdev = F.sqrt(
        (n * F.col("_s2") - F.col("_s1") * F.col("_s1"))
        / (n * (n - F.lit(1.0)))
    )
    sd = g.select("stratum", "n", sdev.alias("_sd"))
    from pyspark.sql import Window as W

    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    tot = F.sum(F.col("n").cast("double") * F.col("_sd")).over(w_all)
    share = F.col("n").cast("double") * F.col("_sd") / tot
    return sd.select(
        "stratum",
        "n",
        F.round("_sd", 6).alias("sd"),
        F.round(share, 6).alias("share"),
        F.round(share * F.lit(1000.0), 2).alias("alloc_1000"),
    )


@query(
    "cuped_variance_reduction_events",
    """
    WITH per AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                                  // 86400000000 < 19738
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 AS x,
               CAST(SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                                  // 86400000000 >= 19738
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 AS y
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM per
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS theta,
           ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
             AS var_reduction
    FROM s
    """,
    "CUPED readout: theta and the variance-reduction share from "
    "regressing each user's post-period value on their pre-period "
    "value (split at 2024-01-16)",
    tags=("analytics", "sampling"),
)
def q_cuped_variance_reduction_events(spark, sf_dir):
    """Modern experimentation's free sample-size multiplier (pure
    composition over operators/drift.py::ols_fit): CUPED's θ IS the
    OLS slope of post on pre, and the variance reduction IS the R² —
    a 30% reduction reads like 43% more users. Pre/post user sums are
    decimal-exact in one conditional pass."""
    from pramen_spark.operators.drift import ols_fit

    ev = load_events(spark, sf_dir)
    dayn = F.expr("CAST(unix_micros(ts) DIV 86400000000 AS LONG)")
    zero = F.lit(0).cast("decimal(18,6)")
    per = ev.groupBy("user_id").agg(
        F.sum(
            F.when(dayn < 19738, F.col("value").cast("decimal(18,6)"))
            .otherwise(zero)
        ).cast("double").alias("x"),
        F.sum(
            F.when(dayn >= 19738, F.col("value").cast("decimal(18,6)"))
            .otherwise(zero)
        ).cast("double").alias("y"),
    )
    fit = ols_fit(per, F.col("x"), F.col("y"))
    return fit.select(
        "n",
        F.col("slope").alias("theta"),
        F.col("r2").alias("var_reduction"),
    )


@query(
    "source_divergence_documents",
    r"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)), '\s+'))
                 AS token
        FROM documents WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE token <> '' GROUP BY 1, 2
    ),
    vocab AS (
        SELECT token FROM tf GROUP BY token HAVING SUM(n) >= 5
    ),
    vtf AS (SELECT tf.* FROM tf JOIN vocab USING (token)),
    vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    corpus AS (
        SELECT token, CAST(SUM(n) AS BIGINT) AS cn FROM vtf
        GROUP BY token
    ),
    ct AS (SELECT CAST(SUM(cn) AS BIGINT) AS ctot FROM corpus),
    stot AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS st FROM vtf
        GROUP BY source
    ),
    grid AS (
        SELECT s.source, c.token, c.cn, s.st,
               COALESCE(v.n, 0) AS n
        FROM stot s CROSS JOIN corpus c
        LEFT JOIN vtf v ON v.source = s.source AND v.token = c.token
    )
    SELECT source,
           ROUND(SUM(((n + 1.0) / (st + v))
                     * ln(((n + 1.0) / (st + v))
                          / ((cn + 1.0) / (ctot + v)))), 6) AS kl
    FROM grid, vsize, ct
    GROUP BY source
    """,
    "source idiosyncrasy: smoothed KL divergence of each source's "
    "frequent-token distribution from the corpus distribution",
    tags=("text", "drift"),
)
def q_source_divergence_documents(spark, sf_dir):
    """How far each feed's vocabulary sits from the corpus (the
    vocabulary-first discipline): the KL runs on the FREQUENT-token
    grid (sources × bounded vocab — the corpus volume only builds the
    tf table), add-one smoothed so absent tokens stay finite. The
    mixture-weights companion: a high-KL source shifts the blend more
    per token than its share suggests."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tf = (
        d.where(F.trim(F.col("text")) != "")
        .select("source", F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    vocab = tf.groupBy("token").agg(
        F.sum("n").cast("long").alias("cn")
    ).where(F.col("cn") >= 5)
    vtf = tf.join(vocab.select("token"), "token")
    vsize = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    ct = vocab.agg(F.sum("cn").cast("long").alias("ctot"))
    stot = vtf.groupBy("source").agg(
        F.sum("n").cast("long").alias("st")
    )
    grid = (
        stot.crossJoin(F.broadcast(vocab))
        .join(vtf, ["source", "token"], "left")
        .select(
            "source",
            "st",
            "cn",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(ct))
    )
    p = (F.col("n") + F.lit(1.0)) / (F.col("st") + F.col("v"))
    q = (F.col("cn") + F.lit(1.0)) / (F.col("ctot") + F.col("v"))
    return grid.groupBy("source").agg(
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl")
    )


@query(
    "repeat_customers_orders",
    """
    WITH per AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat,
           ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS repeat_share,
           ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN rev
                          ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS repeat_revenue_share
    FROM per
    """,
    "loyalty snapshot: share of customers with repeat orders and the "
    "revenue share they carry, decimal-exact",
    tags=("analytics", "features"),
)
def q_repeat_customers_orders(spark, sf_dir):
    """The one-row loyalty KPI under every RFM deck (pure
    composition): repeat-revenue share usually dwarfs repeat-customer
    share — the gap IS the retention business case. Decimal sums; the
    conditional keeps money in decimal until one final division."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"),
    )
    rep = (F.col("_n") >= 2).cast("int")
    zero = F.lit(0).cast("decimal(28,2)")
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(rep).cast("long").alias("n_repeat"),
        F.round(
            F.sum(rep).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("repeat_share"),
        F.round(
            F.sum(F.when(F.col("_n") >= 2, F.col("_rev")).otherwise(zero))
            .cast("double")
            / F.sum("_rev").cast("double"),
            6,
        ).alias("repeat_revenue_share"),
    )


@query(
    "drawdown_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT revenue,
               MAX(revenue) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS peak
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(peak - revenue), 6) AS max_drawdown,
           ROUND(MAX((peak - revenue) / peak), 6) AS max_drawdown_share
    FROM r
    """,
    "maximum drawdown of daily revenue: worst drop from a running "
    "peak, absolute and as a share of that peak",
    tags=("analytics", "finance"),
)
def q_drawdown_daily(spark, sf_dir):
    """The worst-case-decline readout (pure composition in the
    control_chart family): running max over the calendar-bounded
    daily grid, then a max of exact double differences — XmR flags
    single out-of-control days, drawdown measures the deepest slide.
    The share variant divides before the max so the worst RELATIVE
    drop can differ from the worst absolute one."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    r = daily.select(
        "revenue", F.max("revenue").over(w).alias("_peak")
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max(F.col("_peak") - F.col("revenue")), 6).alias(
            "max_drawdown"
        ),
        F.round(
            F.max((F.col("_peak") - F.col("revenue")) / F.col("_peak")), 6
        ).alias("max_drawdown_share"),
    )


@query(
    "top_customer_dependency",
    """
    WITH per AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk,
               SUM(rev) OVER () AS tot
        FROM per
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CASE WHEN rnk <= 1 THEN rev
                          ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS share_top1,
           ROUND(CAST(SUM(CASE WHEN rnk <= 5 THEN rev
                          ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS share_top5,
           ROUND(CAST(SUM(CASE WHEN rnk <= 10 THEN rev
                          ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS share_top10
    FROM r
    """,
    "key-account dependency: revenue share of the top 1/5/10 "
    "customers — the concentration risk one number per cut",
    tags=("analytics", "finance"),
)
def q_top_customer_dependency(spark, sf_dir):
    """The 'what if our biggest customer leaves' number (composition
    next to gini/lorenz/hhi, which grade the whole curve): a
    deterministic (revenue desc, key) rank over the customer table
    and three threshold sums of exact decimals."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev")
    )
    w = W.orderBy(F.desc("_rev"), F.asc("o_custkey"))
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = per.select(
        "_rev",
        F.row_number().over(w).alias("_rnk"),
        F.sum("_rev").over(w_all).alias("_tot"),
    )
    zero = F.lit(0).cast("decimal(28,2)")
    share = lambda k: F.round(  # noqa: E731
        F.sum(F.when(F.col("_rnk") <= k, F.col("_rev")).otherwise(zero))
        .cast("double")
        / F.max("_tot").cast("double"),
        6,
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        share(1).alias("share_top1"),
        share(5).alias("share_top5"),
        share(10).alias("share_top10"),
    )


@query(
    "arpdau_daily_events",
    """
    SELECT DATE '1970-01-01'
             + CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                    AS INTEGER) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 6)
             AS arpdau
    FROM events GROUP BY 1
    """,
    "ARPDAU: per-day total event value over distinct active users — "
    "the monetization-per-head daily",
    tags=("analytics", "timegrid"),
)
def q_arpdau_daily_events(spark, sf_dir):
    """The denominator-aware revenue daily (pure composition): total
    value alone confounds growth with monetization — dividing by DAU
    separates them. One day-keyed aggregation with an exact distinct;
    value sums as decimal."""
    ev = load_events(spark, sf_dir)
    day = F.date_from_unix_date(
        F.expr("CAST(unix_micros(ts) DIV 86400000000 AS INT)")
    )
    return ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.countDistinct("user_id").cast("double"),
            6,
        ).alias("arpdau"),
    )


@query(
    "sessions_per_user_events",
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
    per AS (
        SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
        FROM marked GROUP BY user_id
    )
    SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per GROUP BY n_sessions
    """,
    "sessions-per-user histogram over 30-min-gap sessions: the "
    "engagement-frequency shape behind DAU averages",
    tags=("analytics", "sessionization"),
)
def q_sessions_per_user_events(spark, sf_dir):
    """WHO generates the session volume (composition over
    sessionize_batch's machinery — session count per user is just the
    sum of new-session flags, no per-session rows needed): a mean of
    9 sessions/user can be everyone-at-9 or a bimodal
    lurkers-plus-addicts split; the histogram tells which."""
    from pramen_spark.streaming.stream import sessionize_batch

    s = sessionize_batch(
        load_events(spark, sf_dir), "user_id", "ts", gap="30 minutes"
    )
    per = s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    return per.groupBy("n_sessions").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@query(
    "discount_depth_bands",
    """
    WITH b AS (
        SELECT CASE WHEN l_discount = 0 THEN '0'
                    WHEN l_discount <= 0.05 THEN '1-5'
                    ELSE '6+' END AS band,
               CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev,
               CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2)) AS given
        FROM lineitem
    ),
    g AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
               SUM(rev) AS rev, SUM(given) AS given
        FROM b GROUP BY band
    ),
    t AS (SELECT SUM(rev) AS tot FROM g)
    SELECT band, n_lines, CAST(rev AS DOUBLE) AS revenue,
           CAST(given AS DOUBLE) AS discount_given,
           ROUND(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS revenue_share
    FROM g, t
    """,
    "promo-depth mix: lines, realized revenue and discount dollars "
    "given per discount band, decimal-exact",
    tags=("analytics", "finance"),
)
def q_discount_depth_bands(spark, sf_dir):
    """How deep the discounting runs and what it costs (pure
    composition): the discount-given column is the same decimal
    product family as realized revenue, so 'revenue + given = list
    price' audits itself. One band-keyed aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") == 0, "0")
        .when(F.col("l_discount") <= 0.05, "1-5")
        .otherwise("6+")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    g = l.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(price * (F.lit(1) - disc)).alias("_rev"),
        F.sum(price * disc).alias("_given"),
    )
    t = g.agg(F.sum("_rev").alias("_tot"))
    return g.crossJoin(F.broadcast(t)).select(
        "band",
        "n_lines",
        F.col("_rev").cast("double").alias("revenue"),
        F.col("_given").cast("double").alias("discount_given"),
        F.round(
            F.col("_rev").cast("double") / F.col("_tot").cast("double"),
            6,
        ).alias("revenue_share"),
    )


@query(
    "velocity_segments_parts",
    """
    WITH per AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    ),
    b AS (
        SELECT CASE WHEN n_lines >= 30 THEN 'fast'
                    WHEN n_lines >= 10 THEN 'medium'
                    ELSE 'slow' END AS velocity,
               n_lines
        FROM per
    )
    SELECT velocity, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(n_lines) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS lines_per_part
    FROM b GROUP BY velocity
    """,
    "sales-velocity segmentation of parts (fast/medium/slow movers) "
    "by lifetime line count",
    tags=("analytics", "finance"),
)
def q_velocity_segments_parts(spark, sf_dir):
    """The fast/slow-mover split merchandising plans around (pure
    composition, the abc_classification companion by COUNT instead of
    value): two map-side-combined aggregations; the band thresholds
    are exact integer comparisons."""
    l = load_table(spark, sf_dir, "lineitem")
    per = l.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    vel = (
        F.when(F.col("_n") >= 30, "fast")
        .when(F.col("_n") >= 10, "medium")
        .otherwise("slow")
    )
    return per.groupBy(vel.alias("velocity")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("_n").cast("long").alias("n_lines"),
        F.round(
            F.sum("_n").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("lines_per_part"),
    )


@query(
    "qoq_revenue_orders",
    """
    WITH q AS (
        SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE)
                 AS quarter,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT quarter, CAST(rev AS DOUBLE) AS revenue,
           ROUND((CAST(rev AS DOUBLE)
                  - CAST(lag(rev) OVER (ORDER BY quarter) AS DOUBLE))
                 / CAST(lag(rev) OVER (ORDER BY quarter) AS DOUBLE), 6)
             AS qoq_growth
    FROM q
    """,
    "quarter-over-quarter revenue growth from decimal quarterly "
    "sums — the board-deck number",
    tags=("analytics", "finance"),
)
def q_qoq_revenue_orders(spark, sf_dir):
    """The wow_revenue pattern at board cadence (pure composition):
    DECIMAL quarterly cells, one LAG over the calendar-bounded
    quarter table; the growth ratio divides two exact-derived
    doubles."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy(
        F.to_date(F.date_trunc("quarter", F.col("o_orderdate"))).alias(
            "quarter"
        )
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev")
    )
    w = W.orderBy("quarter")
    prev = F.lag("_rev").over(w)
    return q.select(
        "quarter",
        F.col("_rev").cast("double").alias("revenue"),
        F.round(
            (F.col("_rev").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("qoq_growth"),
    )


@query(
    "aov_monthly_orders",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS aov
    FROM orders GROUP BY 1
    """,
    "average order value per month from decimal sums — the unit "
    "economics trend under every revenue chart",
    tags=("analytics", "finance"),
)
def q_aov_monthly_orders(spark, sf_dir):
    """Revenue = orders × AOV; this is the AOV axis (pure
    composition): one month-keyed map-side-combined aggregation,
    decimal revenue divided by an exact count once per month row."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("aov"),
    )


@query(
    "weekend_revenue_share_monthly",
    """
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))
                   * (CASE WHEN isodow(o_orderdate) - 1 >= 5
                      THEN 1 ELSE 0 END)) AS wrev
        FROM orders GROUP BY 1
    )
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           CAST(wrev AS DOUBLE) AS weekend_revenue,
           ROUND(CAST(wrev AS DOUBLE) / CAST(rev AS DOUBLE), 6)
             AS weekend_share
    FROM m
    """,
    "weekend revenue share per month: the calendar-mix control that "
    "separates seasonality from weekend-count artifacts",
    tags=("analytics", "timegrid"),
)
def q_weekend_revenue_share_monthly(spark, sf_dir):
    """Months have 8-10 weekend days — a 'weak month' can be a
    calendar artifact (pure composition): the weekend share per month
    is the control the MoM narrative needs. Decimal money times an
    INTEGER weekend flag stays exact inside one aggregation."""
    o = load_table(spark, sf_dir, "orders")
    rev = F.col("o_totalprice").cast("decimal(18,2)")
    flag = (F.weekday(F.col("o_orderdate")) >= 5).cast("int")
    m = o.groupBy(
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month"
        )
    ).agg(
        F.sum(rev).alias("_rev"),
        F.sum(rev * flag).alias("_wrev"),
    )
    return m.select(
        "month",
        F.col("_rev").cast("double").alias("revenue"),
        F.col("_wrev").cast("double").alias("weekend_revenue"),
        F.round(
            F.col("_wrev").cast("double") / F.col("_rev").cast("double"),
            6,
        ).alias("weekend_share"),
    )


