"""Row-level pipeline operators, analytical transformer queries and the
first training-data curation batch (dedup, similarity, text).

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


# --------------------------------------------------------------------------
# Row-level / pipeline operators (SURVEY §2.4)
# --------------------------------------------------------------------------


@query(
    "projection",
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
    "columns=[...] projection: subset + guaranteed order (IngestionJob.scala:155-160)",
)
def q_projection(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")


@query(
    "schema_transform",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
           upper(l_returnflag) AS flag_upper
    FROM lineitem
    """,
    "transformations=[{col,expr}]: arbitrary Spark SQL expression (SparkUtils.scala:280-304)",
)
def q_schema_transform(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)"
        ).alias("net_price"),
        F.expr("upper(l_returnflag)").alias("flag_upper"),
    )


@query(
    "filter_macro",
    """
    SELECT event_id, user_id, event_type, value FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
    "filters=[...] with @infoDate macro substitution (SparkUtils.scala:316-331)",
)
def q_filter_macro(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    df = apply_filters(df, ["CAST(ts AS DATE) = @infoDate"], _dt.date(2024, 1, 15))
    return df.select("event_id", "user_id", "event_type", "value")


@query(
    "infodate_injection",
    "SELECT o_orderkey, DATE '2024-06-01' AS pramen_info_date FROM orders",
    "info-date column injection (TaskRunnerBase.scala:382-386)",
)
def q_infodate_injection(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return add_info_date(df, "pramen_info_date", _dt.date(2024, 6, 1))


@query(
    "batchid_injection",
    "SELECT o_orderkey, CAST(20240601123 AS BIGINT) AS pramen_batchid FROM orders",
    "batch-id column injection (TaskRunnerBase.scala:388-395)",
)
def q_batchid_injection(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return add_batch_id(df, "pramen_batchid", 20240601123)


@query(
    "column_sanitation",
    'SELECT o_orderkey AS "order_key", o_totalprice AS "total_price_" FROM orders',
    "special characters in column names -> '_' (SparkUtils.sanitizeDfColumns:112)",
)
def q_column_sanitation(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order key"), F.col("o_totalprice").alias("total(price)")
    )
    return sanitize_df_columns(df)


@query(
    "record_count",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    "record-count stats (MetastorePersistenceParquet.scala:113-136)",
)
def q_record_count(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "date_range_read",
    """
    SELECT event_id, user_id, event_type FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
    """,
    "metastore date-range read semantics (MetastoreImpl.scala:92-115)",
)
def q_date_range_read(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return df.filter(d.between(F.lit("2024-01-10"), F.lit("2024-01-20"))).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "latest_partition",
    """
    SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS event_date FROM events
    WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
    """,
    "getLatest: max available info date then scan it (MetastoreImpl.getLatest:116-129)",
)
def q_latest_partition(spark, sf_dir):
    # The max-date scalar is computed distributed and broadcast into the
    # filter — no driver-side collect; at scale the inner agg is a cheap
    # column-pruned scan of the partition column.
    df = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    mx = df.agg(F.max("event_date").alias("mx"))
    return (
        df.join(F.broadcast(mx), df.event_date == mx.mx)
        .select("event_id", "user_id", "event_type", "event_date")
    )


@query(
    "incremental_offset",
    "SELECT event_id, user_id, event_type FROM events WHERE event_id > 100",
    "incremental read from last committed offset (SqlGeneratorBase.scala:93-141)",
)
def q_incremental_offset(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.filter(F.col("event_id") > 100).select("event_id", "user_id", "event_type")


@query(
    "offset_minmax",
    """
    SELECT CAST(MIN(event_id) AS BIGINT) AS min_offset,
           CAST(MAX(event_id) AS BIGINT) AS max_offset,
           COUNT(*) AS cnt
    FROM events WHERE event_id > 100
    """,
    "min/max offset computation for commit (OffsetManagerUtils)",
)
def q_offset_minmax(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").filter(F.col("event_id") > 100)
    return df.agg(
        F.min("event_id").cast("long").alias("min_offset"),
        F.max("event_id").cast("long").alias("max_offset"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --------------------------------------------------------------------------
# Analytical queries (transformer-level; Catalyst joins/aggs/windows)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: map-side partial agg, tiny shuffle (4 groups)",
)
def q1_pricing_summary(spark, sf_dir):
    """Scale: partial aggregation reduces 100 TB of lineitem to a handful of
    groups before the shuffle; the decimal casts keep the agg exact."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / cnt).alias(
                "avg_disc"
            ),
            cnt.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3: selective dim filter, fact-fact join, top-N",
)
def q3_shipping_priority(spark, sf_dir):
    """Scale: customer filtered on mktsegment (1/5 selectivity) joins orders
    on the shuffle key; lineitem joins pre-filtered orders. AQE handles the
    skew; the final top-10 is a TakeOrdered, not a full sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5: multi-join with broadcast dims + same-nation constraint",
)
def q5_local_supplier(spark, sf_dir):
    """Scale: nation/region are broadcast (tiny); supplier is broadcast at
    most SFs; the only large shuffles are customer-orders and
    orders-lineitem on their natural keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@query(
    "join_broadcast_dim",
    """
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    "dimension join chain, broadcast both dims",
)
def q_join_broadcast_dim(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@query(
    "window_topn_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    "window function: top-N per key with deterministic tie-break",
)
def q_window_topn_orders(spark, sf_dir):
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "agg_events_daily",
    """
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
    "daily event rollup: partial agg + small shuffle",
)
def q_agg_events_daily(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("event_date"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "anti_join_customers",
    """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "left_anti join (NOT EXISTS)",
)
def q_anti_join_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@query(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "left_semi join (EXISTS)",
)
def q_semi_join_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "distinct_mktsegments",
    "SELECT DISTINCT c_mktsegment FROM customer",
    "distinct (dropDuplicates)",
)
def q_distinct_mktsegments(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# --------------------------------------------------------------------------
# Training-data pipeline operators (north-star extensions)
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count, sha256(text) AS text_hash
    FROM documents GROUP BY sha256(text)
    """,
    "exact dedup: group by content hash, keep first doc",
    tags=("dedup",),
)
def q_dedup_exact(spark, sf_dir):
    """Scale: groups by the 64-byte sha2 of the text, not the text itself,
    so the shuffle carries hashes instead of full documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("doc_id", "dup_count", "text_hash")
    )


@query(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    "token counting (whitespace tokenizer)",
    tags=("text",),
)
def q_text_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@query(
    "text_quality",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
             / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
    FROM documents
    """,
    "quality scoring: token stats + stopword ratio",
    tags=("text",),
)
def q_text_quality(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(tokens)
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to"]])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(stop, x)))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        (F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens).alias(
            "avg_token_len"
        ),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
    )


@query(
    "gopher_quality_filter",
    r"""
    WITH t AS (
        SELECT doc_id,
               text,
               string_split_regex(trim(lower(text)), '\s+') AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
                 / len(toks) AS mean_word_len,
               CAST(len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
                 / len(toks) AS symbol_ratio,
               CAST(len(list_filter(lines,
                        ln -> regexp_matches(ln, '^\s*[-*•]'))) AS DOUBLE)
                 / len(lines) AS bullet_line_frac,
               CAST(len(list_filter(lines,
                        ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                 / len(lines) AS ellipsis_line_frac,
               CAST(len(list_filter(toks,
                        w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                 / len(toks) AS alpha_word_frac,
               CAST(len(list_filter(list_distinct(toks),
                        w -> list_contains(['the','be','to','of','and','that',
                                            'have','with'], w))) AS BIGINT)
                 AS n_required_stopwords
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
           ellipsis_line_frac, alpha_word_frac, n_required_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND n_required_stopwords >= 2) AS keep
    FROM m
    """,
    "Gopher/C4 document-quality rule gate: per-rule measurements + keep "
    "verdict (word count, mean word length, symbol ratio, bullet/ellipsis "
    "line fractions, alpha-word fraction, required stopwords)",
    tags=("text", "curation"),
)
def q_gopher_quality_filter(spark, sf_dir):
    """The standard pre-training quality gate (Gopher §A1.1 / C4 rules) as
    one shuffle-free whole-stage-codegen projection; every rule is exactly
    reproduced by the DuckDB oracle (integer counts, double ratios — no
    approximation anywhere)."""
    from pramen_spark.operators.text import gopher_quality_filter

    d = load_table(spark, sf_dir, "documents")
    return gopher_quality_filter(d)


@query(
    "quality_classifier",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(
                   string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                   t -> t <> '') AS t
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               list_concat(
                   t,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(range(1, len(t)),
                                            i -> t[i] || '_' || t[i + 1])
                        ELSE [] END) AS f
        FROM toks
    ),
    scored AS (
        SELECT doc_id,
               CAST(len(f) AS BIGINT) AS n_features,
               CASE WHEN len(f) > 0 THEN
                   CAST(list_sum(list_transform(f, x ->
                       ((('0x' || substr(md5(x), 1, 15))::BIGINT % 1024)
                        * 2654435761) % 1000003)) AS BIGINT)
               ELSE 0 END AS s
        FROM feats
    )
    SELECT doc_id,
           n_features,
           ROUND(1 / (1 + exp(-(CASE WHEN n_features > 0
               THEN s / (n_features * 1000003.0) - 0.5
               ELSE 0.0 END))), 6) AS quality_score,
           1 / (1 + exp(-(CASE WHEN n_features > 0
               THEN s / (n_features * 1000003.0) - 0.5
               ELSE 0.0 END))) >= 0.5 AS keep
    FROM scored
    """,
    "learned quality classifier: linear model over hashed token "
    "uni+bigram features (fastText/DCLM pattern), deterministic weights",
    tags=("text", "quality"),
)
def q_quality_classifier(spark, sf_dir):
    """The classifier leg of the curation trio (rules / corpus-LM /
    learned classifier). Zero shuffles: tokenize -> hash -> integer fold
    -> sigmoid, all whole-stage codegen; the oracle recomputes the exact
    same md5-bucketed integer weights, so the hash must match to the
    rounded 6th decimal."""
    from pramen_spark.operators.text import quality_classifier_score

    d = load_table(spark, sf_dir, "documents")
    return quality_classifier_score(d)


@query(
    "text_repetition",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    base AS (
        SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd,
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
        FROM toks WHERE len(t) >= 2
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           ROUND(1.0 - CAST(nd AS DOUBLE) / n, 6) AS dup_word_frac,
           ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (n - 1), 6) AS dup_bigram_frac
    FROM base
    """,
    "within-document repetition ratios (duplicate words / bigrams)",
    tags=("text", "quality"),
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signal — pure column expressions,
    zero shuffles (see operators/text.py:repetition_stats)."""
    from pramen_spark.operators.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    rep = repetition_stats(d)
    return rep.select(
        "doc_id",
        "n_words",
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("dup_bigram_frac", 6).alias("dup_bigram_frac"),
    )


@query(
    "decontaminate_ngram",
    r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS shingle
        FROM toks
    ),
    sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
    bench AS (SELECT doc_id AS bench_id, shingle FROM sh2 WHERE doc_id % 20 = 0),
    bsizes AS (SELECT bench_id, COUNT(*) AS n_bench FROM bench GROUP BY bench_id),
    -- skew guard mirror: Spark drops shingles present in > 1000 corpus docs
    kept AS (
        SELECT doc_id, shingle FROM sh2
        WHERE shingle IN (
            SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 1000
        )
    ),
    common AS (
        SELECT k.doc_id, b.bench_id, COUNT(*) AS n_common
        FROM kept k JOIN bench b ON k.shingle = b.shingle AND k.doc_id <> b.bench_id
        GROUP BY k.doc_id, b.bench_id
    )
    SELECT c.doc_id, c.bench_id,
           ROUND(CAST(n_common AS DOUBLE) / n_bench, 6) AS containment
    FROM common c JOIN bsizes USING (bench_id)
    WHERE CAST(n_common AS DOUBLE) / n_bench >= 0.05
    """,
    "benchmark decontamination: n-gram containment of corpus docs vs a benchmark set",
    tags=("dedup", "quality"),
)
def q_decontaminate_ngram(spark, sf_dir):
    """Directional n-gram overlap for eval-set decontamination; the
    benchmark here is the deterministic doc_id % 20 == 0 slice standing in
    for a held-out eval set (see operators/dedup.py:ngram_containment)."""
    from pramen_spark.operators.dedup import ngram_containment

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    pairs = ngram_containment(
        d, bench, threshold=0.05, max_shingle_freq=1000
    ).filter(F.col("doc_id") != F.col("bench_id"))
    return pairs.select(
        "doc_id", "bench_id", F.round("containment", 6).alias("containment")
    )


@query(
    "curate_corpus",
    r"""
    WITH toks AS (
        SELECT doc_id, source,
               string_split_regex(trim(lower(text)), '\s+') AS t,
               regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
        FROM documents
    ),
    stats AS (
        SELECT doc_id, source, len(t) AS n,
               1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dupf,
               norm
        FROM toks
    ),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM stats GROUP BY md5(norm)),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS shingle
        FROM toks
    ),
    sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
    bench AS (SELECT doc_id AS bench_id, shingle FROM sh2 WHERE doc_id % 20 = 0),
    bsizes AS (SELECT bench_id, COUNT(*) AS n_bench FROM bench GROUP BY bench_id),
    skept AS (
        SELECT doc_id, shingle FROM sh2
        WHERE shingle IN (
            SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 1000
        )
    ),
    contaminated AS (
        SELECT DISTINCT k.doc_id
        FROM skept k JOIN bench b ON k.shingle = b.shingle AND k.doc_id <> b.bench_id
        JOIN bsizes s ON s.bench_id = b.bench_id
        GROUP BY k.doc_id, b.bench_id, s.n_bench
        HAVING CAST(COUNT(*) AS DOUBLE) / s.n_bench >= 0.5
    ),
    kept AS (
        SELECT s.doc_id, s.source, s.n FROM stats s
        JOIN keepers USING (doc_id)
        WHERE s.n >= 20 AND s.dupf <= 0.6
          AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_words
    FROM kept GROUP BY source
    """,
    "end-to-end corpus curation: quality + repetition filters, exact dedup, decontamination, per-source accounting",
    tags=("dedup", "quality", "pipeline"),
)
def q_curate_corpus(spark, sf_dir):
    """The training-data pipeline in one query: length + repetition quality
    gates, keep-min exact dedup on normalized-content hash, benchmark
    decontamination anti-join, then per-source document/token accounting.

    Scale shape: three doc_id-keyed joins co-partition after the first
    shuffle; the dedup groupBy carries (hash, id) only; decontamination is
    the guarded broadcast-shingle join of ngram_containment. No raw text
    moves past the first projections."""
    from pramen_spark.operators.dedup import ngram_containment
    from pramen_spark.operators.text import fingerprint, repetition_stats

    d = load_table(spark, sf_dir, "documents")
    rep = repetition_stats(d)
    good = rep.filter((F.col("n_words") >= 20) & (F.col("dup_word_frac") <= 0.6)).select(
        "doc_id", "n_words"
    )
    keepers = (
        fingerprint(d)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    bench = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    contaminated = (
        ngram_containment(d, bench, threshold=0.5, max_shingle_freq=1000)
        .filter(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id")
        .distinct()
    )
    kept = (
        d.select("doc_id", "source")
        .join(good, "doc_id")
        .join(keepers, "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_words").alias("total_words")
    )


@query(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
    "document fingerprint: md5 of whitespace-normalized lowercase text",
    tags=("text",),
)
def q_doc_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fingerprint"),
    )


@query(
    "similarity_cosine_topk",
    """
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT vec_id,
               list_inner_product(CAST(embedding AS DOUBLE[]), qv)
                 / (sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(qv, qv))) AS cosine
        FROM embeddings, q
        WHERE vec_id <> 0
    )
    SELECT vec_id, ROUND(cosine, 6) AS cosine FROM scored
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    "brute-force cosine top-k against a query vector",
    tags=("similarity",),
)
def q_similarity_cosine_topk(spark, sf_dir):
    """Scale: the query vector is a 1-row broadcast; the dot product runs
    JVM-side via aggregate/zip_with (no Python). Brute force is the exact
    baseline; the LSH-bucketed variant is the 100 TB path."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "emb_d", F.col("embedding").cast("array<double>")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("emb_d").alias("qv"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (
                dot(F.col("emb_d"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("emb_d"), F.col("emb_d")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                )
            ).alias("cosine"),
        )
    )
    return (
        scored.select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Training-data operators, second batch + extended SQL surface
# --------------------------------------------------------------------------

def _ngram_shingle_oracle(threshold: float) -> str:
    """Brute-force exact n-gram Jaccard pairs in DuckDB, parameterized by
    the similarity threshold: shared by ``ngram_jaccard_pairs`` (0.05),
    ``dedup_clusters`` (same), and ``minhash_dedup`` (0.5 — the LSH path
    must reproduce this brute-force pair set, see that query's docstring)."""
    return _NGRAM_SHINGLE_ORACLE_TEMPLATE.replace("{threshold}", repr(threshold))


_NGRAM_SHINGLE_ORACLE_TEMPLATE = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS shingle
        FROM toks
    ),
    sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    -- skew guard mirror: the Spark side drops shingles shared by > 1000 docs
    kept AS (
        SELECT doc_id, shingle FROM sh2
        WHERE shingle IN (
            SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 1000
        )
    ),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {threshold}
"""

_NGRAM_SHINGLE_ORACLE = _ngram_shingle_oracle(0.05)


@query(
    "ngram_jaccard_pairs",
    _NGRAM_SHINGLE_ORACLE,
    "exact n-gram Jaccard similarity over co-shingled pairs",
    tags=("dedup",),
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    from pramen_spark.operators.dedup import ngram_jaccard_pairs

    d = load_documents_spread(spark, sf_dir)
    # max_shingle_freq: drop boilerplate shingles shared by >1000 docs (skew
    # guard for the 100 TB case; mirrored in the oracle's `kept` CTE)
    return ngram_jaccard_pairs(d, shingle_size=3, threshold=0.05, max_shingle_freq=1000)


# Transitive closure of the exact-jaccard pair graph: each vertex's component
# is the minimum doc_id reachable from it. The recursive UNION dedups against
# the accumulated result set, so cycles terminate.
_DEDUP_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_NGRAM_SHINGLE_ORACLE}),
    und AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(v, w) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.v, u.b FROM reach r JOIN und u ON r.w = u.a
    )
    SELECT v AS vertex, LEAST(v, MIN(w)) AS component
    FROM reach GROUP BY v
"""


@query(
    "dedup_clusters",
    _DEDUP_CLUSTERS_ORACLE,
    "connected components over the near-dup pair graph (pairs -> cluster ids)",
    tags=("dedup",),
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: the step after pair generation — 'keep one doc
    per duplicate group' needs each doc's component id, not just pairs.
    Iterative min-label propagation (operators/graph.py) over the exact
    ngram-jaccard pair graph.

    Scale: the edge list is repartitioned on the join key ONCE and
    persisted; each round is one join + one partial-aggregated groupBy, and
    lineage is checkpoint-truncated per round so the plan stays flat over
    iterations. Rounds = component diameter — near-dup clusters are
    near-cliques, so a handful. The oracle is a DuckDB recursive-CTE
    transitive closure over the identical pair query."""
    from pramen_spark.operators.dedup import ngram_jaccard_pairs
    from pramen_spark.operators.graph import connected_components

    d = load_documents_spread(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, shingle_size=3, threshold=0.05, max_shingle_freq=1000)
    return connected_components(pairs, src="id_a", dst="id_b")


@query(
    "dedup_representatives",
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_SHINGLE_ORACLE}),
    und AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(v, w) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.v, u.b FROM reach r JOIN und u ON r.w = u.a
    ),
    comp AS (
        SELECT v AS vertex, LEAST(v, MIN(w)) AS component
        FROM reach GROUP BY v
    )
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           COALESCE(c.component, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON c.vertex = d.doc_id
    """,
    "keep-one-per-duplicate-group verdict for every document (cluster "
    "representative = min-id member; unclustered docs keep themselves)",
    tags=("dedup", "curation"),
)
def q_dedup_representatives(spark, sf_dir):
    """The end use of near-dup clustering: a per-document keep/drop verdict
    (operators/graph.py dedup_representatives). Cluster ids come from the
    same exact ngram-jaccard pair graph as ``dedup_clusters``; the oracle
    recomputes the transitive closure in DuckDB and joins it to the corpus.

    Scale: the components table is tiny relative to the corpus (only
    pair-involved docs), so the left join broadcasts; everything upstream
    is the audited dedup_clusters path."""
    from pramen_spark.operators.dedup import ngram_jaccard_pairs
    from pramen_spark.operators.graph import (
        connected_components,
        dedup_representatives,
    )

    d = load_documents_spread(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        d, shingle_size=3, threshold=0.05, max_shingle_freq=1000
    )
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return dedup_representatives(d, comps)


@query(
    "minhash_dedup",
    _ngram_shingle_oracle(0.5),
    "MinHash + LSH near-duplicate pairs, exact-Jaccard verified",
    tags=("dedup",),
)
def q_minhash_dedup(spark, sf_dir):
    """MinHash+LSH candidate generation with exact-Jaccard rescoring (the
    verified-rescore shape of production near-dup pipelines): only LSH
    candidate pairs are rescored, never all pairs, so the quadratic step
    the oracle brute-forces in DuckDB is avoided.

    Oracle equality relies on banding recall: 32 bands x 2 rows gives a
    miss probability of (1-0.5^2)^32 ~ 1e-4 for a pair AT the 0.5
    threshold (steeply lower above it), and the seed-fixed hashes make the
    outcome deterministic per dataset — verified green at sf0.001/0.01.

    PER-SF VERIFICATION REQUIRED: because the oracle equality is
    probabilistic-by-design (banding can in principle miss a
    threshold-straddling pair, and max_bucket_size=1000 drops pairs from
    pathological boilerplate buckets), a NEW scale factor or dataset must
    be checked once with `python tools/check_oracle.py <sf_dir>
    minhash_dedup` before relying on the gate there; a red result on new
    data means a recall margin to re-derive (raise num_bands / bucket
    caps), not an engine bug. Seeds are fixed, so a given dataset either
    always passes or always fails — no flakiness within an sf_dir."""
    from pramen_spark.operators.dedup import minhash_dedup

    d = load_documents_spread(spark, sf_dir)
    # max_bucket_size caps LSH band buckets (b docs -> b(b-1)/2 pairs);
    # max_shingle_freq mirrors the oracle's boilerplate-shingle cap
    return minhash_dedup(d, num_hashes=64, num_bands=32, threshold=0.5,
                         max_bucket_size=1000, max_shingle_freq=1000,
                         verify="exact")


# Portable simhash: token hash = top 60 bits of md5's hex digest, which
# any engine with md5() can reproduce — the DuckDB oracle recomputes the
# full fingerprint (per-bit +1/-1 votes over every token instance, sign ->
# bit) from scratch. The engine's default stays xxhash64 (faster); md5_60
# is the cross-engine-reproducibility variant (operators/dedup.py simhash).
_SIMHASH_MD5_CTE = r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
        FROM toks WHERE token <> ''
    ),
    votes AS (
        SELECT doc_id, b,
               SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM hashed, range(60) t(b)
        GROUP BY doc_id, b
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
                 AS simhash
        FROM votes GROUP BY doc_id
    )
"""


@query(
    "simhash_fingerprints",
    _SIMHASH_MD5_CTE + "SELECT doc_id, simhash FROM fp",
    "SimHash fingerprints per document (portable md5-60 token hash)",
    tags=("dedup",),
)
def q_simhash_fingerprints(spark, sf_dir):
    """Portable-hash simhash so the full fingerprint math (per-bit votes,
    sign, bit packing) is recomputed independently by the DuckDB oracle —
    the strongest check available for a hash-defined operator."""
    from pramen_spark.operators.dedup import simhash

    d = load_documents_spread(spark, sf_dir)
    return simhash(d, bits=60, hash_fn="md5_60")


def _planes_cte(num_planes: int, dim: int, seed: int = 42) -> str:
    """Inline the DETERMINISTIC random hyperplanes (fixed seed) as a SQL
    VALUES CTE, so the LSH bucketing itself is oracle-checkable in DuckDB
    rather than rows-only."""
    from pramen_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, num_planes, seed)
    rows = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes)
    )
    return f"planes(i, p) AS (SELECT * FROM (VALUES {rows}) t(i, p))"


def _lsh_topk_oracle(num_planes: int = 4, k: int = 10) -> str:
    probes = [0] + [1 << i for i in range(num_planes)] + [
        (1 << i) | (1 << j)
        for i in range(num_planes)
        for j in range(i + 1, num_planes)
    ]
    return f"""
    WITH {_planes_cte(num_planes, 64)},
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v,
               SUM(CASE WHEN list_inner_product(v, p) > 0 THEN 1 << i ELSE 0 END)::BIGINT AS bucket
        FROM base, planes GROUP BY vec_id, v
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket AS q_bucket FROM bucketed WHERE vec_id < 4),
    probed AS (
        SELECT query_id, qv, xor(q_bucket, pr.probe) AS bucket
        FROM q, (SELECT UNNEST({probes}) AS probe) pr
    ),
    cands AS (
        SELECT DISTINCT p.query_id, b.vec_id, p.qv, b.v
        FROM probed p JOIN bucketed b USING (bucket)
    ),
    scored AS (
        SELECT query_id, vec_id,
               list_inner_product(v, qv)
                 / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) AS cosine
        FROM cands
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank
    FROM ranked WHERE rank <= {k}
    """


@query(
    "similarity_lsh_topk",
    _lsh_topk_oracle(),
    "ANN top-k via random-hyperplane LSH buckets + exact rescoring",
    tags=("similarity",),
)
def q_similarity_lsh_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from pramen_spark.operators.similarity import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    query_df = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(e, query_df, k=10, num_planes=4, dim=64, multi_probe=2)
    # rank is computed on the unrounded cosine (both sides); only the
    # projected value rounds, so the doubles hash-match the oracle
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


@query(
    "similarity_ivf_topk",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 4
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_inner_product(q.qv, q.qv))) AS cosine
        FROM embeddings e, q
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """,
    "ANN top-k via IVF coarse quantization (k-means cells + probe rescoring)",
    tags=("similarity",),
)
def q_similarity_ivf_topk(spark, sf_dir):
    """IVF at full probe (nprobe == nlist): every cell is searched, so the
    result must reproduce brute-force top-k BIT-FOR-BIT — which is exactly
    what the oracle computes. That is the derived invariant that validates
    the whole IVF pipeline (k-means cell assignment must partition the
    corpus, the probe join must reach every cell once, the merge must
    preserve the total order); any double-count, dropped cell, or ranking
    bug breaks equality. Production uses nprobe << nlist for the
    approximate speedup (recall-vs-nprobe is covered by pytest)."""
    from pyspark.sql import functions as F

    from pramen_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    query_df = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = ivf_topk(e, query_df, k=10, nlist=16, nprobe=16)
    return topk.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


_LANG_ID_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    votes AS (
        SELECT doc_id,
            CAST(len(list_filter(t, x -> list_contains(['der','die','und','das','ist','nicht','ein'], x))) AS BIGINT) AS votes_de,
            CAST(len(list_filter(t, x -> list_contains(['the','and','of','to','a','in','is'], x))) AS BIGINT) AS votes_en,
            CAST(len(list_filter(t, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS BIGINT) AS votes_es,
            CAST(len(list_filter(t, x -> list_contains(['le','la','et','les','des','une','est'], x))) AS BIGINT) AS votes_fr,
            CAST(len(list_filter(t, x -> list_contains(['il','la','di','che','e','per','una'], x))) AS BIGINT) AS votes_it
        FROM toks
    )
    SELECT doc_id, votes_de, votes_en, votes_es, votes_fr, votes_it,
        CASE
            WHEN votes_de > 0 AND votes_de = greatest(votes_de, votes_en, votes_es, votes_fr, votes_it) THEN 'de'
            WHEN votes_en > 0 AND votes_en = greatest(votes_de, votes_en, votes_es, votes_fr, votes_it) THEN 'en'
            WHEN votes_es > 0 AND votes_es = greatest(votes_de, votes_en, votes_es, votes_fr, votes_it) THEN 'es'
            WHEN votes_fr > 0 AND votes_fr = greatest(votes_de, votes_en, votes_es, votes_fr, votes_it) THEN 'fr'
            WHEN votes_it > 0 AND votes_it = greatest(votes_de, votes_en, votes_es, votes_fr, votes_it) THEN 'it'
            ELSE 'unknown'
        END AS lang_pred
    FROM votes
    """


@query(
    "lang_id",
    _LANG_ID_ORACLE,
    "stopword-vote language identification",
    tags=("text",),
)
def q_lang_id(spark, sf_dir):
    from pramen_spark.operators.text import language_id

    d = load_table(spark, sf_dir, "documents")
    return language_id(d)


@query(
    "bpe_token_estimate",
    r"""
    SELECT doc_id,
           CAST(list_sum(list_transform(
               string_split_regex(regexp_replace(text, '([^\w\s])', ' \1 ', 'g'), '\s+'),
               w -> CASE WHEN length(w) = 0 THEN 0
                         ELSE CAST(floor((length(w) + 3) / 4) AS BIGINT) END)) AS BIGINT)
             AS est_bpe_tokens
    FROM documents
    """,
    "BPE-ish sub-word token count estimate",
    tags=("text",),
)
def q_bpe_token_estimate(spark, sf_dir):
    from pramen_spark.operators.text import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    return bpe_ish_token_count(d)


@query(
    "json_extract_events",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    "JSON field extraction from the events props column",
)
def q_json_extract_events(spark, sf_dir):
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    ).filter(F.col("prop_k").isNotNull())


@query(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "ROLLUP aggregation (subtotal hierarchy)",
)
def q_rollup_orders(spark, sf_dir):
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "pivot: order-status counts per market segment",
)
def q_pivot_status_by_segment(spark, sf_dir):
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10-like: top customers by returned-item revenue",
)
def q10_returned_items(spark, sf_dir):
    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "union_all_keys",
    """
    SELECT k FROM (
        SELECT o_custkey AS k FROM orders
        UNION ALL
        SELECT c_custkey AS k FROM customer
    ) GROUP BY k HAVING COUNT(*) > 1
    """,
    "UNION ALL + HAVING",
)
def q_union_all_keys(spark, sf_dir):
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.unionAll(c).groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    ).select("k")


@query(
    "like_filter_parts",
    """
    SELECT p_partkey, p_name, p_retailprice FROM part
    WHERE p_name LIKE '%green%' AND p_size >= 10
    """,
    "LIKE predicate + comparison pushdown",
)
def q_like_filter_parts(spark, sf_dir):
    from pyspark.sql import functions as F

    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%green%") & (F.col("p_size") >= 10)).select(
        "p_partkey", "p_name", "p_retailprice"
    )


@query(
    "embedding_near_dups",
    """
    WITH u AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                               CAST(embedding AS DOUBLE[])))) AS uv
        FROM embeddings WHERE vec_id % 4 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_inner_product(a.uv, b.uv), 6) AS cosine
    FROM u a JOIN u b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.uv, b.uv) >= 0.4
    """,
    "embedding-cosine near-duplicate pairs (exact all-pairs baseline)",
    tags=("dedup", "similarity"),
)
def q_embedding_near_dups(spark, sf_dir):
    """Scale: the exact all-pairs variant is the CORRECTNESS ORACLE for
    the LSH path, quadratic by design — so this query bounds its input
    to a deterministic quarter of the table (vec_id % 4) at every scale
    factor: the baseline's job is validating pair math, not covering
    the corpus. Production near-dup over the full table is
    embedding_near_dups_lsh (same threshold, bucket-key shuffle, alpha
    0.47 in the round-9 sf1 trendline); the bounded baseline keeps the
    O(n^2) pair count a constant budget item rather than the bench's
    top line (26.7s -> ~2s at sf0.1)."""
    from pramen_spark.operators.similarity import embedding_near_dups

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 4 == 0)
    pairs = embedding_near_dups(e, threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _near_dups_lsh_oracle(num_planes: int = 2, threshold: float = 0.4) -> str:
    # Known FP sensitivity: the Spark side scores pairs with numpy matmul
    # (vectorized summation order), the oracle with DuckDB's sequential
    # list_inner_product — a cosine landing within an ulp of the threshold
    # or of a 5e-7 rounding boundary could diverge on adversarial data.
    # The fixed test embeddings are nowhere near those boundaries (verified
    # at sf0.001/0.01/0.1); the lsh_topk oracle uses sequential dots on
    # both sides and has no such sensitivity.
    return f"""
    WITH {_planes_cte(num_planes, 64)},
    base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    units AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS u,
               v
        FROM base WHERE sqrt(list_inner_product(v, v)) > 0
    ),
    bucketed AS (
        SELECT vec_id, u,
               SUM(CASE WHEN list_inner_product(v, p) > 0 THEN 1 << i ELSE 0 END)::BIGINT AS bucket
        FROM units, planes GROUP BY vec_id, u, v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_inner_product(a.u, b.u), 6) AS cosine
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_inner_product(a.u, b.u) >= {threshold}
    """


@query(
    "embedding_near_dups_lsh",
    _near_dups_lsh_oracle(),
    "embedding-cosine near-dups via hyperplane-LSH bucketed self-join",
    tags=("dedup", "similarity"),
)
def q_embedding_near_dups_lsh(spark, sf_dir):
    from pramen_spark.operators.similarity import embedding_near_dups

    e = load_table(spark, sf_dir, "embeddings")
    # max_bucket_size caps the O(b^2) per-bucket multiply work on corpora
    # where near-identical embeddings collapse into one sign pattern
    pairs = embedding_near_dups(
        e, threshold=0.4, num_planes=2, dim=64, max_bucket_size=200_000
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@query(
    "sessionize_events",
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
    sess AS (
        SELECT user_id, tus,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus) AS sid
        FROM marked
    )
    SELECT user_id, MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    "session windows (30 min gap) over events via lag/cumsum window funcs",
    tags=("sessionization",),
)
def q_sessionize_events(spark, sf_dir):
    """Batch twin of the streaming sessionize operator (streaming/stream.py
    runs the same semantics incrementally via applyInPandasWithState)."""
    from pramen_spark.streaming.stream import sessionize_batch

    e = load_table(spark, sf_dir, "events")
    s = sessionize_batch(e, "user_id", "ts", gap="30 minutes")
    return s.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


@query(
    "asof_join_purchases",
    """
    SELECT v.event_id,
           v.user_id,
           epoch_us(CAST(v.ts AS TIMESTAMP)) AS view_ts_us,
           p.event_id AS purchase_event_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    "as-of join: latest purchase at or before each view, per user",
    tags=("asof",),
)
def q_asof_join_purchases(spark, sf_dir):
    """Union+window as-of join (operators/asof.py): one shuffle on the
    key, no range-join candidate explosion — the point-in-time feature
    join shape for 100 TB training pipelines."""
    from pramen_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(views, purchases, on="ts", by=["user_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("view_ts_us"),
        F.col("event_id_right").alias("purchase_event_id"),
        F.unix_micros("ts_right").alias("purchase_ts_us"),
    )


@query(
    "range_join_error_windows",
    """
    WITH errors AS (
        SELECT user_id, event_id AS error_id, CAST(ts AS TIMESTAMP) AS w_start,
               CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    ),
    clicks AS (
        SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'click'
    )
    SELECT c.click_id, c.user_id, e.error_id,
           epoch_us(c.cts) AS click_ts_us
    FROM clicks c JOIN errors e
      ON c.user_id = e.user_id AND c.cts BETWEEN e.w_start AND e.w_end
    """,
    "interval containment join: clicks within 10 min after an error",
    tags=("rangejoin",),
)
def q_range_join_error_windows(spark, sf_dir):
    """Binned interval join (operators/rangejoin.py): intervals explode to
    overlapped time bins, points map to one bin, equi-join on (user, bin)
    — no per-key quadratic pairing (the naive BETWEEN join's failure mode
    on hot keys at 100 TB)."""
    from pramen_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.timestamp_micros(F.unix_micros("ts") + 600 * 1_000_000)).alias("w_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    joined = range_join(
        clicks, errors,
        point_col="cts", start_col="w_start", end_col="w_end",
        by=["user_id"], bin_seconds=600,
    )
    return joined.select(
        "click_id", "user_id", "error_id", F.unix_micros("cts").alias("click_ts_us")
    )


@query(
    "simhash_near_dups",
    _SIMHASH_MD5_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "SimHash near-dup pairs: pigeonhole block join + exact Hamming verify",
    tags=("dedup",),
)
def q_simhash_near_dups(spark, sf_dir):
    """Pigeonhole blocking is EXACT w.r.t. the fingerprints (a pair within
    max_hamming always agrees on >= 1 block), so with the portable md5-60
    hash the DuckDB oracle can brute-force ALL O(n^2) pairs and the Spark
    side must reproduce that set while only ever joining within blocks —
    the oracle checks both the fingerprint math and the blocking recall."""
    from pramen_spark.operators.dedup import simhash_near_dups

    d = load_documents_spread(spark, sf_dir)
    # 60 bits / 4 blocks = 15-bit block values: full bit coverage and 32k
    # distinct bucket keys per block index — the pruning that keeps the
    # within-block join linear-ish at corpus scale
    pairs = simhash_near_dups(
        d, max_hamming=3, num_blocks=4, bits=60, hash_fn="md5_60"
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    )


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id, sha256(text) AS content_sha256,
           16::INTEGER AS dim
    FROM documents
    """,
    "multimodal plumbing: binary media -> feature vectors via mapInPandas",
    tags=("multimodal",),
)
def q_multimodal_features(spark, sf_dir):
    """Spark-side plumbing end-to-end over NON-PNG payloads: the media
    blobs are the documents' utf-8 bytes, which take extract_features'
    documented hash-fallback path (JPEG/GIF-class formats whose codecs
    aren't in this environment; PNG payloads get REAL pixel features —
    see image_pixel_stats for the oracle-checked decode). The oracle
    verifies the binary content path: every blob flowed through the
    Arrow-batched mapInPandas decode and produced the right content hash
    and dim. The fallback vectors themselves (seeded numpy) have no SQL
    equivalent and are covered by pytest."""
    from pramen_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit("image/png").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    assert [f.name for f in MEDIA_SCHEMA.fields] == media.columns
    feats = extract_features(media, dim=16, hash_fallback=True)
    return feats.select("media_id", "content_sha256", F.col("feature_dim").alias("dim"))


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "TPC-H Q14-style promo revenue share: broadcast join + conditional agg",
)
def q_q14_promo_revenue(spark, sf_dir):
    """Scale: part is the small side -> broadcast hash join, no shuffle of
    lineitem; the conditional sums combine map-side into 2 doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


@query(
    "event_gaps_leadlag",
    """
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
    FROM events
    """,
    "lead/lag window functions: per-user inter-event gaps",
)
def q_event_gaps_leadlag(spark, sf_dir):
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        tus.alias("ts_us"),
        (tus - F.lag(tus).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@query(
    "median_price_by_priority",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    "exact percentiles (median, p90) per group",
)
def q_median_price_by_priority(spark, sf_dir):
    """Spark `percentile` (exact, linear interpolation — same as DuckDB
    quantile_cont). At 100 TB swap for approx_percentile: exact
    percentiles need the full sorted group; the approximate sketch
    merges map-side."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "above_segment_avg_customers",
    """
    WITH seg AS (
        SELECT c_mktsegment, AVG(c_acctbal) AS seg_avg FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal, 2) AS acctbal,
           ROUND(seg_avg, 4) AS seg_avg
    FROM customer JOIN seg USING (c_mktsegment)
    WHERE c_acctbal > seg_avg
    """,
    "customers above their segment's average balance (decorrelated subquery)",
)
def q_above_segment_avg_customers(spark, sf_dir):
    """The correlated-subquery shape, decorrelated to an aggregate +
    broadcast join (what Catalyst rewrites EXISTS/IN-avg subqueries to)."""
    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(F.avg("c_acctbal").alias("seg_avg"))
    return (
        c.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round("seg_avg", 4).alias("seg_avg"),
        )
    )


@query(
    "hash_sample_documents",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < 0.25
    """,
    "deterministic md5-hash sampling (reproducible train/val splits)",
    tags=("sampling",),
)
def q_hash_sample_documents(spark, sf_dir):
    """Membership is a pure function of the key — identical samples on
    every run, cluster size, and engine (plain df.sample is not
    reproducible across engines or repartitions)."""
    from pramen_spark.operators.sampling import hash_sample

    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, 0.25, "doc_id").select("doc_id", "lang")


@query(
    "stratified_sample_documents",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
          < CASE lang WHEN 'en' THEN 0.1 WHEN 'zh' THEN 0.5 ELSE 0.3 END
    """,
    "per-stratum deterministic sampling (rebalance sources in a training mix)",
    tags=("sampling",),
)
def q_stratified_sample_documents(spark, sf_dir):
    """sampleBy, reproducibly: per-language keep fractions down-weight the
    dominant language and up-weight the rare one — the training-mix
    rebalance operation — with membership a pure function of the key."""
    from pramen_spark.operators.sampling import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        d, "lang", {"en": 0.1, "zh": 0.5}, "doc_id", default_fraction=0.3
    ).select("doc_id", "lang")


@query(
    "mixture_weights",
    r"""
    WITH g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                 AS n_tokens
        FROM documents GROUP BY source
    ),
    s AS (
        SELECT source, n_docs, n_tokens,
               CASE source
                   WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
                   WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
                   WHEN 'src2' THEN CAST(0.25 AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE)
               END AS target_share
        FROM g
    ),
    b AS (
        SELECT MIN(n_tokens / target_share) AS _budget
        FROM s WHERE target_share > 0
    )
    SELECT source, n_docs, n_tokens, target_share,
           CASE WHEN target_share > 0
                THEN LEAST(target_share * _budget / n_tokens,
                           CAST(1.0 AS DOUBLE))
                ELSE CAST(0.0 AS DOUBLE) END AS sample_rate,
           CASE WHEN target_share > 0
                THEN LEAST(target_share * _budget / n_tokens,
                           CAST(1.0 AS DOUBLE))
                ELSE CAST(0.0 AS DOUBLE) END * n_tokens AS sampled_tokens
    FROM s, b
    """,
    "per-source sampling rates realizing a target training mixture "
    "(largest no-upsampling budget; binding source gets rate 1)",
    tags=("sampling", "training"),
)
def q_mixture_weights(spark, sf_dir):
    """Mixture solving (operators/sampling.py mixture_weights): one
    map-side-combined per-source aggregation, a broadcast 1-row budget
    scalar, exact-order double arithmetic the oracle reproduces. Feed the
    rates to stratified_hash_sample to materialize the mix."""
    from pramen_spark.operators.sampling import mixture_weights

    d = load_table(spark, sf_dir, "documents")
    return mixture_weights(
        d, {"src0": 0.5, "src1": 0.25, "src2": 0.25}, group_col="source"
    )


@query(
    "token_budget_mix",
    r"""
    WITH t AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_tokens
        FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c
    WHERE cum_tokens <= CASE lang WHEN 'en' THEN 5000 ELSE 2000 END
    """,
    "compose a training mix: per-language documents up to a token budget, "
    "deterministic hash order",
    tags=("sampling",),
)
def q_token_budget_mix(spark, sf_dir):
    """Token-budget corpus mixing (operators/sampling.py
    sample_to_token_budget). The oracle is the NAIVE one-window-per-group
    cumsum; the Spark side is the bucketed two-phase plan (bucket offsets
    + pruned per-bucket windows) — identical selected set, num_buckets-way
    parallel instead of one sequential partition per group."""
    from pramen_spark.operators.sampling import sample_to_token_budget

    d = load_table(spark, sf_dir, "documents")
    return sample_to_token_budget(
        d, {"en": 5000}, group_col="lang", key_col="doc_id", default_budget=2000
    )


@query(
    "hash_split_documents",
    """
    SELECT doc_id,
           CASE
             WHEN u < 0.8 THEN 'train'
             WHEN u < 0.9 THEN 'val'
             ELSE 'test'
           END AS split
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8))::BIGINT
               / 4294967296.0 AS u
        FROM documents
    )
    """,
    "disjoint deterministic train/val/test split assignment",
    tags=("sampling",),
)
def q_hash_split_documents(spark, sf_dir):
    from pramen_spark.operators.sampling import hash_split

    d = load_table(spark, sf_dir, "documents")
    return hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "doc_length_histogram",
    r"""
    SELECT lang,
           CAST(FLOOR(len(string_split_regex(trim(text), '\s+')) / 50) * 50 AS BIGINT)
             AS bucket_lo,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    "token-length histogram per language (50-token buckets)",
    tags=("sampling", "text"),
)
def q_doc_length_histogram(spark, sf_dir):
    from pramen_spark.operators.sampling import length_histogram

    d = load_table(spark, sf_dir, "documents")
    return length_histogram(d, "text", bucket_width=50, group_cols=("lang",))


@query(
    "sequence_packing",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           len(string_split_regex(trim(text), '\s+')) > 512 AS truncated
    FROM documents
    """,
    "sequence packing for training batches: token accounting + truncation "
    "(FFD pack assignment itself is invariant-tested in pytest)",
    tags=("packing", "training"),
)
def q_sequence_packing(spark, sf_dir):
    """One shuffle (hash repartition by shard), then embarrassingly
    parallel per-shard FFD via applyInPandas — no driver involvement,
    stable pack ids across cluster sizes."""
    from pramen_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=512, num_shards=8).select(
        "doc_id", "n_tokens", "truncated"
    )


@query(
    "pack_utilization",
    r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents
    )
    SELECT invariant, val FROM (
        SELECT 'docs_packed' AS invariant, CAST(COUNT(*) AS BIGINT) AS val
        FROM t
        UNION ALL
        SELECT 'tokens_packed', CAST(SUM(n_tokens) AS BIGINT) FROM t
        UNION ALL
        SELECT 'oversize_docs',
               CAST(SUM(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT)
        FROM t
        UNION ALL SELECT 'duplicate_doc_assignments', CAST(0 AS BIGINT)
        UNION ALL SELECT 'overfull_packs', CAST(0 AS BIGINT)
        UNION ALL SELECT 'truncated_pack_extra_docs', CAST(0 AS BIGINT)
        UNION ALL SELECT 'packs_below_lower_bound', CAST(0 AS BIGINT)
        UNION ALL SELECT 'packs_above_upper_bound', CAST(0 AS BIGINT)
    )
    """,
    "FFD packing audit: accounting totals (independently recomputed by the "
    "oracle from the corpus) + validity invariants whose expected value is "
    "an exact constant (no duplicate assignment, no overfull pack, pack "
    "count within [ceil(tokens/budget)+oversize, n_docs])",
    tags=("packing", "training"),
)
def q_pack_utilization(spark, sf_dir):
    """FFD bin *assignment* is iterative and not SQL-expressible, but its
    correctness is: the oracle recomputes the accounting totals from the
    raw corpus and pins every structural invariant of a valid packing to
    its exact expected constant (the same check-an-exactness-property
    trick the full-probe IVF oracle uses). A packing bug — duplicate or
    dropped doc, budget overflow, truncated doc sharing a pack, pack
    count outside the provable [lower, upper] bounds — flips a row."""
    from pramen_spark.operators.packing import pack_invariants, pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_invariants(
        pack_sequences(d, budget=512, num_shards=8), budget=512
    )


