"""Query catalog: every driver-checkable operator gets a (Spark builder,
DuckDB oracle SQL) pair.

Determinism rules (both engines must produce bit-identical values so the
driver's value-hash matches):

- Money/2-decimal columns are cast to DECIMAL before SUM so aggregation is
  exact and order-independent; the final value is cast back to DOUBLE.
- AVG is expressed as exact-decimal SUM cast to double, divided by COUNT.
- Counts/sizes are cast to BIGINT on the Spark side (DuckDB len()/COUNT
  return BIGINT).
- Top-N queries always carry a unique tie-break column in the ordering.

Scale notes are in each builder's docstring: what shuffles, what is
broadcast, and why the plan survives a 100x scale-up.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pramen_spark.operators.rowlevel import (
    add_batch_id,
    add_info_date,
    apply_filters,
    sanitize_df_columns,
)
from pramen_spark.operators.tsutils import pin_utc, ts_instant

import datetime as _dt


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan pre-spread for amplifying consumers (shingling,
    char-bigram explosion): the partition introspection runs on the RAW
    scan, where it is a file listing, and is a no-op when the corpus
    already arrives in >= default-parallelism splits (any real-scale
    read). See operators/partitioning.py."""
    from pramen_spark.operators.partitioning import spread_input

    return spread_input(load_table(spark, sf_dir, "documents"), "doc_id")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with ``ts`` normalized to TIMESTAMP (UTC instant).

    Two storage-drift cases are absorbed here so every downstream query can
    assume an instant-typed ``ts``:

    - TIMESTAMP(NANOS) files: Spark only reads those as long
      (spark.sql.legacy.parquet.nanosAsLong); convert with integer division
      (double division would lose precision on epoch-nanos magnitudes).
    - tz-less TIMESTAMP(MICROS) files: Spark 4 infers TIMESTAMP_NTZ
      (inferTimestampNTZ defaults true) and ``unix_micros`` et al. reject
      NTZ input. Re-tag as TIMESTAMP under a pinned-UTC session timezone —
      the driver owns the session, so pin here, not in session.py alone.
    """
    pin_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", ts_instant("ts"))
    return df


@dataclass
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL over pre-registered views; None -> rows-only check
    description: str = ""
    tags: tuple = ()


QUERIES: Dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], description: str = "", tags: tuple = ()):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle, description, tags)
        return fn

    return deco


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

    d = load_table(spark, sf_dir, "documents")
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

    d = load_table(spark, sf_dir, "documents")
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
        FROM embeddings
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
    """Scale: the exact variant is the oracle baseline; production uses
    embedding_near_dups(num_planes=p) which shuffles on the LSH bucket key
    so only same-bucket shards are paired (see similarity.py docstring)."""
    from pramen_spark.operators.similarity import embedding_near_dups

    e = load_table(spark, sf_dir, "embeddings")
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

    d = load_table(spark, sf_dir, "documents")
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
    """Spark-side plumbing is real (schema, Arrow batching, partitioning);
    the decode step is a deterministic fake because no image/audio codecs
    ship in this environment (operators/multimodal.py gates the real
    path behind NotImplementedError). The media blobs are the documents'
    utf-8 bytes so the oracle can independently verify the binary content
    path end-to-end: every blob flowed through the Arrow-batched
    mapInPandas decode and produced the right content hash and dim. The
    feature vectors themselves (seeded numpy) have no SQL equivalent and
    are covered by pytest."""
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
    feats = extract_features(media, dim=16, deterministic_fake=True)
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


# --------------------------------------------------------------------------
# TPC-H-style coverage widening (joins, subqueries, disjunctive filters,
# grouping sets, running windows) — added after the first bench pass.
# --------------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4-style: EXISTS decorrelated to a left-semi join with an "
    "inequality residual, then count per priority",
)
def q_q4_order_priority(spark, sf_dir):
    """Scale: the date filter prunes orders before the join; the semi join
    shuffles only (orderkey, orderdate, priority) — lineitem is reduced to
    (l_orderkey, l_shipdate) by column pruning. Semi join stops at first
    match per key, so skewed orders don't amplify output."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6-style: pure scan + filter + single-row agg (the pushdown benchmark)",
)
def q_q6_revenue_forecast(spark, sf_dir):
    """Scale: every predicate reaches the parquet scan (PushedFilters on
    l_shipdate/l_discount/l_quantity), ReadSchema is 4 columns; the sum
    combines map-side to one decimal per partition — no shuffle at all
    beyond the final single-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    "TPC-H Q12-style: join + conditional (CASE) aggregation",
)
def q_q12_priority_by_linestatus(spark, sf_dir):
    """Scale: lineitem is filtered at the scan, pruned to 3 columns, and
    joined on the orderkey; the conditional sums combine map-side into two
    longs per linestatus."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13-style: left outer join + two-level aggregation "
    "(orders-per-customer distribution)",
)
def q_q13_customer_distribution(spark, sf_dir):
    """Scale: first agg shuffles on c_custkey (high cardinality, even);
    second agg input is one row per customer and combines map-side to at
    most a few hundred (c_count, custdist) rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "TPC-H Q15-style: top supplier by revenue (scalar-subquery max)",
)
def q_q15_top_supplier(spark, sf_dir):
    """Scale: revenue agg shuffles on l_suppkey once; the scalar MAX is a
    1-row aggregate of that same per-supplier set, joined back by
    crossJoin(broadcast(...)) — no single-partition WindowExec (a global
    window funnels every row through one task), and supplier joins
    broadcast. No second scan of lineitem (the reference SQL's correlated
    MAX is computed from the same aggregate)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        # explicit: the supplier join would push isnotnull into only the
        # rev branch's scan, making the two rev subtrees canonically
        # different and defeating AQE shuffle-stage reuse (lineitem would
        # be scanned twice — the real cost at 100 TB)
        & F.col("l_suppkey").isNotNull()
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           ROUND(o_totalprice, 2) AS total_price,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    "TPC-H Q18-style: HAVING over a big agg, joined back to dims",
)
def q_q18_large_volume_customers(spark, sf_dir):
    """Scale: the quantity agg shuffles (l_orderkey, double) pairs once and
    the HAVING filter cuts the survivors to a tiny set, so both downstream
    joins see only qualifying orderkeys. l_quantity sums are exact in
    decimal then cast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 180)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 21)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#9'  AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    "TPC-H Q19-style: disjunction of conjunctive predicates across a join",
)
def q_q19_disjunctive_revenue(spark, sf_dir):
    """Scale: part is broadcast; the disjunctive predicate stays a single
    post-join filter (Catalyst extracts the common p_size/l_quantity
    bounds for scan pushdown where possible)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7: bi-national shipping volume by year (6-way join)",
)
def q_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (ref test query shapes: pramen uses plain Spark SQL for
    transformer queries; this exercises the multi-join planner).

    Scale: nation (25 rows) and supplier-with-nation are broadcast into
    lineitem, so the only big shuffles are lineitem<->orders and
    orders<->customer on their join keys. Customers are pre-filtered to
    the two nations (2/25 of the table) BEFORE the orders join, and
    lineitem is date-pruned at the scan, so both shuffle inputs are cut
    first. The pair-direction disjunction is applied post-join on two
    tiny string columns."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    two = n.filter(F.col("n_name").isin("NATION_3", "NATION_8"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(two.withColumnRenamed("n_name", "supp_nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(two.withColumnRenamed("n_name", "cust_nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    """
    SELECT l_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT n1.n_name AS supp_nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY l_year
    """,
    "TPC-H Q8: national market share within a region (8-way join + conditional agg)",
)
def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8. The numerator/denominator ratio is computed as
    double(decimal-sum)/double(decimal-sum) so both engines divide
    bit-identical doubles.

    Scale: part (filtered to one type) and supplier+nation are broadcast
    into lineitem; customers are pre-filtered to the region via the
    broadcast nation->region dims before the orders join. Shuffles:
    lineitem<->orders, orders<->customer — both on pruned inputs. The
    CASE/sum ratio is a single pass over the joined set."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation")
    amer_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(amer_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    vol = (price * (F.lit(1) - disc)).alias("volume")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(F.year("o_orderdate").alias("l_year"), "supp_nation", vol)
    )
    return joined.groupBy("l_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
    "TPC-H Q9 (adapted: no partsupp table, so profit = discounted revenue; "
    "the supply-cost term is dropped): profit by supplier nation and year",
)
def q_q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape, adapted to the test schema (no partsupp /
    ps_supplycost column exists, so amount omits the cost term).

    Scale: part is filtered by the LIKE before broadcast; supplier+nation
    broadcast. The one big shuffle is lineitem<->orders on orderkey. The
    final agg has |nations| x |years| groups — tiny."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_profit"))
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16 (adapted: the part-supplier relation is DISTINCT(l_partkey,l_suppkey) "
    "from lineitem since no partsupp table exists; the complaints NOT IN becomes "
    "negative-acctbal suppliers): supplier counts per part attribute",
)
def q_q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape on the reduced schema. Exercises NOT IN
    (anti-join), DISTINCT projection, and COUNT(DISTINCT) in one plan.

    Scale: the DISTINCT (partkey, suppkey) pair set shuffles once on the
    pair hash; part (filtered) and the excluded-supplier set are both
    broadcast, so the anti-join adds no shuffle. COUNT(DISTINCT) over the
    grouped pairs is a two-phase partial aggregate in Spark."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               COUNT(*) AS cnt_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq   ON pk = l_partkey
    WHERE p_brand = 'Brand#13' AND p_size < 5
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
    """,
    "TPC-H Q17 (adapted: p_container -> p_size band; the correlated "
    "0.2*AVG subquery is expressed exactly as qty*5*count < sum so both "
    "engines compare exact decimals): small-quantity order revenue",
)
def q_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17's correlated scalar subquery, decorrelated into a
    per-part aggregate + join (what a good optimizer does anyway). The
    0.2*AVG threshold is rewritten qty*5*cnt < sum in exact decimals —
    no float AVG, so Spark and DuckDB agree bit-for-bit.

    Scale: per-part {sum,count} aggregates shuffle (partkey, 2 numbers)
    once; the filtered part dim is broadcast. The per-part aggregate for
    ONLY the filtered parts is what's joined back (semi-reduced before
    the join), so the second join input is tiny and broadcast too."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") < 5))
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    # aggregate only lineitems of qualifying parts: the avg is per-part so
    # restricting to the broadcast-filtered parts changes nothing
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pq = li_p.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt_qty")
    )
    return (
        li_p.join(F.broadcast(pq), F.col("l_partkey") == F.col("pk"))
        .filter(qty * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 120 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 120 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "TPC-H Q21 (adapted: no commit/receipt dates in the schema, so 'late' is "
    "shipped >120 days after the order date): sole-late supplier per multi-"
    "supplier order, EXISTS + NOT EXISTS",
)
def q_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21. The oracle keeps the EXISTS/NOT EXISTS form; the Spark
    plan replaces both correlated subqueries with window aggregates over
    the order: n_supp = #distinct suppliers in the order, n_late_supp =
    #distinct late suppliers. A late row qualifies iff n_supp > 1 and
    n_late_supp == 1 — equivalent, and it reads lineitem ONCE instead of
    three times.

    Scale: one shuffle (lineitem<->orders on orderkey); both window
    aggregates reuse that partitioning (no extra exchange — asserted in
    test_plans). Final top-20 is a TakeOrdered, not a global sort."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")).cast("int"),
    )
    w = W.partitionBy("l_orderkey")
    j = j.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w))).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).over(w)),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        j.filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY n_name
    """,
    "TPC-H Q22 (adapted: no phone column, so the country-code grouping "
    "becomes the customer's nation; 'no recent orders' replaces 'no orders "
    "at all'): high-balance customers with no recent orders",
)
def q_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join.
    The average is computed as double(decimal-sum)/count so both engines
    filter on an identical double.

    Scale: the 1-row average cross-joins (broadcast) into customer; the
    NOT EXISTS is a left_anti shuffle join against date-pruned orders
    (AQE may demote it to broadcast when the recent slice is small);
    nation is broadcast. One scan of each table."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
        FROM lineitem GROUP BY 1, 2
    ),
    eur_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p_partkey, suppkey, min_price,
               MIN(min_price) OVER (PARTITION BY p_partkey) AS best
        FROM ps
        JOIN part ON partkey = p_partkey
        WHERE p_type = 'LARGE'
          AND suppkey IN (SELECT s_suppkey FROM eur_supp)
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(min_price AS DOUBLE) AS supply_cost
    FROM cand JOIN eur_supp ON suppkey = s_suppkey
    WHERE min_price = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 (adapted: no partsupp, so supply cost = MIN lineitem price per "
    "(part, supplier)): the cheapest EUROPE supplier for every LARGE part",
)
def q_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2's correlated MIN subquery, decorrelated: per-(part,supplier)
    min price -> per-part best via a small aggregate joined back. Costs are
    exact decimals so the min-equality predicate is bit-stable across
    engines; the ordering carries a full tie-break (partkey).

    Scale: lineitem is cut FIRST by two broadcast joins (LARGE parts,
    EUROPE suppliers) before the one big groupBy shuffle on
    (partkey, suppkey). The per-part best table is |parts| rows ->
    broadcast back. Top-100 is TakeOrdered, not a global sort."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    eur_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                          .select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(eur_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("min_price"))
    )
    best = ps.groupBy(F.col("p_partkey").alias("bp")).agg(F.min("min_price").alias("best"))
    return (
        ps.join(F.broadcast(best),
                (ps.p_partkey == F.col("bp")) & (ps.min_price == F.col("best")))
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("min_price").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_parts",
    """
    WITH val AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY 1
    ),
    tot AS (SELECT SUM(value) AS t FROM val)
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM val, tot
    WHERE CAST(value AS DOUBLE) > CAST(t AS DOUBLE) * 0.001
    """,
    "TPC-H Q11 (adapted: no partsupp, so part value = lineitem revenue via "
    "one nation's suppliers): parts above a fraction of the nation's total",
)
def q_q11_important_parts(spark, sf_dir):
    """TPC-H Q11's share-of-total HAVING: a scalar aggregate over the
    grouped result, cross-joined back as the threshold. Sums are exact
    decimals; the threshold compare happens in double on both engines.

    Scale: lineitem is cut first by the broadcast nation-filtered supplier
    dim, then ONE groupBy shuffle on partkey. The per-part aggregate is
    persisted (it is |parts| rows x 2 cols — tiny next to lineitem) because
    it feeds BOTH the 1-row total and the output filter: without the
    persist, neither static ReuseExchange nor AQE dedups the two branches
    and lineitem is scanned twice (verified on the formatted plan)."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("v"))
    ).persist()
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t").cast("double") * F.lit(0.001))
        .select("partkey", F.col("v").cast("double").alias("value"))
    )


@query(
    "q20_promotable_suppliers",
    """
    WITH shipped AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate <  TIMESTAMP '1998-01-01'
                        THEN CAST(l_quantity AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1997,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total,
               COUNT(*) AS n_li
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT suppkey FROM shipped
        JOIN part ON partkey = p_partkey
        WHERE p_name LIKE '%widget%'
          AND qty_1997 * 2 > qty_total
          AND qty_total > qty_1997
          AND n_li >= 3
    )
    ORDER BY s_name
    """,
    "TPC-H Q20 (adapted: no partsupp availability, so a supplier qualifies "
    "when their 1997 shipments of a widget part exceed half their all-time "
    "shipments of it): suppliers concentrating recent volume",
)
def q_q20_promotable_suppliers(spark, sf_dir):
    """TPC-H Q20's nested IN-subquery with an aggregate inside,
    decorrelated: per-(part,supplier) conditional sums in one pass, the
    threshold as exact-decimal 2*qty_1997 > qty_total (no 0.5 float), the
    IN as a distinct + broadcast semi-join.

    Scale: lineitem is cut first by the broadcast widget-part dim, then ONE
    groupBy shuffle on (partkey, suppkey) computes both sums. The
    qualifying supplier set is tiny -> broadcast left_semi into the
    supplier dim. Lineitem is read once, not twice as in the literal
    formulation."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    in_97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_97, qty).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("qty_1997"),
            F.sum(qty).alias("qty_total"),
            F.count(F.lit(1)).alias("n_li"),
        )
    )
    # qty_total > qty_1997 keeps only suppliers with pre/post-1997 history
    # (otherwise every single-shipment part trivially qualifies), and the
    # n_li floor drops noise pairs — both mirrored in the oracle.
    qualifying = (
        shipped.filter(
            (F.col("qty_1997") * F.lit(2) > F.col("qty_total"))
            & (F.col("qty_total") > F.col("qty_1997"))
            & (F.col("n_li") >= 3)
        )
        .select(F.col("l_suppkey").alias("qk"))
        .distinct()
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("qk"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "cube_events_type_day",
    """
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
    "CUBE grouping sets over events (all 4 grouping combinations in one pass)",
)
def q_cube_events_type_day(spark, sf_dir):
    """Scale: Spark expands CUBE into one shuffle keyed by (grouping-set-id,
    keys) — 4 grouping sets cost ~4x map output of one groupBy, not 4
    scans. Decimal sums keep the double cast order-independent."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    )
    return (
        e.cube("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "moving_avg_user_value",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS value_ma7
    FROM events
    """,
    "7-event moving average per user (ROWS frame window)",
)
def q_moving_avg_user_value(spark, sf_dir):
    """Scale: one shuffle on user_id; frames are evaluated streaming within
    each sorted partition. The (ts, event_id) ordering is total, so the
    frame contents — and the float sum order — are deterministic."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("value_ma7")
    )


@query(
    "daily_revenue_running_total",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    )
    SELECT day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_revenue
    FROM daily
    """,
    "pre-aggregated running total (cumulative revenue by day)",
)
def q_daily_revenue_running_total(spark, sf_dir):
    """Scale: the unpartitioned running window runs AFTER the daily
    aggregation, so it sees at most one row per day (365 rows/year) — the
    single-partition window is bounded by calendar size, not data size.
    Decimal sums make the running total exact."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_rev"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("running_revenue"),
    )


@query(
    "heavy_hitter_tokens",
    r"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    )
    SELECT token, COUNT(*) AS doc_freq
    FROM tok WHERE token <> ''
    GROUP BY token
    ORDER BY doc_freq DESC, token
    LIMIT 50
    """,
    "top-50 tokens by document frequency (corpus heavy hitters)",
    tags=("text",),
)
def q_heavy_hitter_tokens(spark, sf_dir):
    """Scale: per-document distinct tokens are deduplicated BEFORE the
    global count (array_distinct inside the row — no shuffle), so the count
    shuffle carries (token, partial count) pairs that combine map-side. The
    top-50 is a TakeOrderedAndProject, not a full sort. At 100 TB the same
    shape works; for a first cheap pass swap the exact count for a
    count-min sketch and verify survivors exactly."""
    d = load_table(spark, sf_dir, "documents").where(F.trim(F.col("text")) != "")
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    return (
        d.select(F.explode(toks).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(50)
    )


@query(
    "tfidf_top_terms",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS c FROM tok WHERE token <> '' GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, SUM(c) AS n_tok FROM tf GROUP BY 1),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf)
    SELECT doc_id, token AS top_term,
           ROUND((CAST(c AS DOUBLE) / n_tok)
                 * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
    FROM (
        SELECT tf.doc_id, tf.token, tf.c, dl.n_tok, df.df, nd.n_docs,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY (CAST(c AS DOUBLE) / n_tok)
                            * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) DESC,
                            tf.token
               ) AS rn
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN nd
    )
    WHERE rn = 1
    """,
    "most characteristic term per document (smoothed TF-IDF, top-1)",
    tags=("text",),
)
def q_tfidf_top_terms(spark, sf_dir):
    """Scale: term frequencies shuffle on (doc_id, token) once and every
    later stage reads that aggregate. Document frequency is a second agg of
    the SAME (doc,token) set and joins back via a SHUFFLE join on token —
    the vocabulary is corpus-sized (10^8+ tokens at 100 TB), so
    broadcasting it would OOM the driver; only the scalar n_docs is
    broadcast. The top-1-per-doc window shuffles by doc_id only. No
    raw-text shuffles anywhere."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").where(F.trim(F.col("text")) != "")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    dl = tf.groupBy("doc_id").agg(F.sum("c").alias("n_tok"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    tfidf = (F.col("c").cast("double") / F.col("n_tok")) * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("token"))
    return (
        tf.join(dl, "doc_id")
        .join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf_raw", tfidf)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_term"), F.round("tfidf_raw", 6).alias("tfidf"))
    )


@query(
    "redact_pii_documents",
    r"""
    WITH aug AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or (555) 123-4567, ip 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.1 ssn 123-45-6789.'
                 AS text
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
        FROM aug
    ),
    s2 AS (
        SELECT doc_id, n_email,
               CAST(len(regexp_extract_all(text,
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
               regexp_replace(text,
                 '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g') AS text
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, n_email, n_ipv4,
               CAST(len(regexp_extract_all(text,
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
               regexp_replace(text,
                 '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS text
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, n_email, n_ipv4, n_ssn,
               CAST(len(regexp_extract_all(text,
                 '(?:\+[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b')) AS BIGINT) AS n_phone,
               regexp_replace(text,
                 '(?:\+[0-9]{1,2}[ .-]?)?(?:\([0-9]{3}\)|\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b', '<PHONE>', 'g') AS text
        FROM s3
    )
    SELECT doc_id, n_email, n_ipv4, n_ssn, n_phone,
           n_email + n_ipv4 + n_ssn + n_phone AS n_pii_total,
           md5(text) AS redacted_md5
    FROM s4
    """,
    "PII redaction: emails/IPs/SSNs/phones -> placeholders + per-kind counts",
    tags=("text", "quality"),
)
def q_redact_pii_documents(spark, sf_dir):
    """PII scrubbing — a mandatory pass in production training pipelines.
    The synthetic corpus contains no PII, so the query injects a
    deterministic specimen per document (same construction in the oracle);
    the operator itself is the chain of engine-portable RE2-safe
    regexp_count/regexp_replace expressions in operators/text.py
    (zero shuffles, scan-speed). The oracle replays the sequential rewrite
    in DuckDB and compares per-kind counts plus the md5 of the fully
    redacted text."""
    from pramen_spark.operators.text import redact_pii

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or (555) 123-4567, ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 ssn 123-45-6789."),
        ).alias("text"),
    )
    red = redact_pii(aug)
    return red.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "n_pii_total",
        F.md5("text").alias("redacted_md5"),
    )


@query(
    "canonical_url_dedup",
    r"""
    WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN 'HTTPS://Host' || CAST(doc_id % 5 AS VARCHAR)
                         || '.Example.COM:443/p/' || CAST(doc_id % 3 AS VARCHAR)
                         || '/?utm_campaign=c' || CAST(doc_id AS VARCHAR)
                         || '&q=1#sec'
                    ELSE 'https://host' || CAST(doc_id % 5 AS VARCHAR)
                         || '.example.com/p/' || CAST(doc_id % 3 AS VARCHAR)
                         || '?q=1'
               END AS url
        FROM documents
    ),
    c AS (
        SELECT
          CASE WHEN regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) = ''
               THEN url
               ELSE
                 regexp_replace(
                   regexp_replace(
                     lower(regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)),
                     '^(http://[^/:]*):80$', '\1'),
                   '^(https://[^/:]*):443$', '\1')
                 ||
                 regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(
                   regexp_replace(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                   '#.*', '', 'g'),
                   '(utm_[a-zA-Z0-9_]+|fbclid|gclid)=[^&#]*', '', 'g'),
                   '&&+', '&', 'g'),
                   '\?&', '?', 'g'),
                   '[?&]+$', '', 'g'),
                   '/+\?', '?', 'g'),
                   '/+$', '', 'g')
          END AS canonical_url
        FROM u
    )
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls
    FROM c GROUP BY canonical_url
    """,
    "URL canonicalization + canonical-URL frequency (page-level dedup key: "
    "case, default ports, fragments, tracking params, slash normalization)",
    tags=("text", "curation"),
)
def q_canonical_url_dedup(spark, sf_dir):
    """Page-level dedup by canonical URL (operators/text.py
    canonicalize_urls): messy and clean spellings of the same page are
    injected deterministically (the corpus has no URL column) and must
    collapse to one key. Canonicalization is a zero-shuffle chained-regexp
    projection; the count is one map-side-combined groupBy."""
    from pramen_spark.operators.text import canonicalize_urls

    d = load_table(spark, sf_dir, "documents")
    m5 = (F.col("doc_id") % 5).cast("string")
    m3 = (F.col("doc_id") % 3).cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("HTTPS://Host"), m5, F.lit(".Example.COM:443/p/"), m3,
            F.lit("/?utm_campaign=c"), F.col("doc_id").cast("string"),
            F.lit("&q=1#sec"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://host"), m5, F.lit(".example.com/p/"), m3,
            F.lit("?q=1"),
        )
    )
    withurl = d.select("doc_id", url.alias("url"))
    return (
        canonicalize_urls(withurl)
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )


@query(
    "domain_histogram_documents",
    r"""
    WITH aug AS (
        SELECT doc_id,
               text || ' see https://host' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.org/page and http://Mirror'
                    || CAST(doc_id % 3 AS VARCHAR) || '.Example.COM'
                 AS text
        FROM documents
    ),
    doms AS (
        SELECT doc_id,
               lower(unnest(regexp_extract_all(text,
                 'https?://([A-Za-z0-9.-]+)', 1))) AS domain
        FROM aug
    )
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_mentions,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM doms GROUP BY domain
    """,
    "per-domain URL mention histogram (source weighting / blocklists)",
    tags=("text",),
)
def q_domain_histogram_documents(spark, sf_dir):
    """Domain statistics drive blocklist filtering and per-source mixing
    weights in corpus curation. URLs are injected deterministically (the
    corpus has none); extraction is regexp_extract_all + one explode (no
    shuffle), the histogram a map-side-combined groupBy on the domain."""
    from pramen_spark.operators.text import domain_histogram

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://host"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/page and http://Mirror"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".Example.COM"),
        ).alias("text"),
    )
    return domain_histogram(aug)


@query(
    "line_dedup_documents",
    r"""
    WITH aug AS (
        SELECT doc_id,
               'Copyright Example Corp' || chr(10) || text || chr(10)
                 || 'footer ' || CAST(doc_id AS VARCHAR) || chr(10)
                 || 'All rights reserved'
                 AS text
        FROM documents
    ),
    sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
    lines AS (
        SELECT doc_id, i + 1 AS pos, ls[CAST(i + 1 AS INTEGER)] AS line
        FROM (SELECT doc_id, ls, unnest(range(len(ls))) AS i FROM sp)
    ),
    freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line),
    kept AS (
        SELECT l.doc_id, l.pos, l.line
        FROM lines l JOIN freq f ON l.line = f.line WHERE f.df <= 2
    ),
    removed AS (
        SELECT l.doc_id, COUNT(*) AS n_removed
        FROM lines l JOIN freq f ON l.line = f.line WHERE f.df > 2
        GROUP BY l.doc_id
    )
    SELECT k.doc_id,
           array_to_string(list(k.line ORDER BY k.pos), chr(10)) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
           CAST(COALESCE(ANY_VALUE(r.n_removed), 0) AS BIGINT) AS n_lines_removed
    FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
    GROUP BY k.doc_id
    """,
    "line-level dedup: strip lines shared by > 2 docs (boilerplate removal)",
    tags=("dedup", "quality"),
)
def q_line_dedup_documents(spark, sf_dir):
    """Sub-document dedup (CCNet/RefinedWeb boilerplate stripping): the
    corpus is single-line docs, so the query wraps each in deterministic
    boilerplate (shared header/footer lines that must be stripped) plus a
    per-doc unique line that must survive, same construction in the
    oracle. The operator groups lines by 64-bit hash (one shuffle),
    anti-joins the over-threshold set, and rebuilds documents order-
    preserved in a single aggregation (operators/dedup.py::line_dedup)."""
    from pramen_spark.operators.dedup import line_dedup

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.lit("Copyright Example Corp\n"),
            F.col("text"),
            F.lit("\nfooter "),
            F.col("doc_id").cast("string"),
            F.lit("\nAll rights reserved"),
        ).alias("text"),
    )
    return line_dedup(aug, max_line_docs=2)


@query(
    "chunk_documents",
    r"""
    WITH sp AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
    ),
    params AS (
        SELECT doc_id, ts,
               greatest((len(ts) - 8 + 24 - 1) // 24, 1) AS n_chunks
        FROM sp
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_id,
               list_slice(ts, CAST(i * 24 + 1 AS INTEGER),
                              CAST(i * 24 + 32 AS INTEGER)) AS ck
        FROM (SELECT doc_id, ts, unnest(range(n_chunks)) AS i FROM params)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(ck, ' ') AS text,
           CAST(len(ck) AS BIGINT) AS n_tokens
    FROM chunks
    """,
    "sliding-window chunking: 32-token chunks, 8-token overlap",
    tags=("text", "chunking"),
)
def q_chunk_documents(spark, sf_dir):
    """Document chunking for embedding/RAG indexing and long-context
    example construction: fixed 32-token windows stepping by 24 (8-token
    overlap). Pure per-row expression + one posexplode — no shuffle
    (operators/text.py::chunk_documents); the oracle rebuilds every chunk
    independently via list_slice."""
    from pramen_spark.operators.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=32, overlap_tokens=8)


@query(
    "paragraph_dedup_documents",
    r"""
    WITH aug AS (
        SELECT doc_id,
               'Shared disclaimer: synthetic corpus, evaluation use only.'
                 || chr(10) || chr(10) || text
                 || chr(10) || chr(10) || 'ref ' || CAST(doc_id AS VARCHAR)
                 AS text
        FROM documents
    ),
    sp AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM aug),
    paras AS (
        SELECT doc_id, i + 1 AS pos, ps[CAST(i + 1 AS INTEGER)] AS para
        FROM (SELECT doc_id, ps, unnest(range(len(ps))) AS i FROM sp)
    ),
    ranked AS (
        SELECT doc_id, pos, para,
               ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rnk
        FROM paras
    ),
    kept AS (SELECT doc_id, pos, para FROM ranked WHERE rnk = 1),
    removed AS (
        SELECT doc_id, COUNT(*) AS n_removed
        FROM ranked WHERE rnk > 1 GROUP BY doc_id
    )
    SELECT k.doc_id,
           array_to_string(list(k.para ORDER BY k.pos), chr(10) || chr(10)) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_paras_kept,
           CAST(COALESCE(ANY_VALUE(r.n_removed), 0) AS BIGINT) AS n_paras_removed
    FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
    GROUP BY k.doc_id
    """,
    "paragraph-level keep-first dedup: duplicated passages survive only at "
    "their first global occurrence",
    tags=("dedup", "quality"),
)
def q_paragraph_dedup_documents(spark, sf_dir):
    """Keep-first passage dedup (paragraph-granularity Lee et al. exact
    substring dedup): the corpus is single-line docs, so the query wraps
    each in a corpus-wide shared paragraph (kept only by the globally
    first doc) plus a per-doc unique ref paragraph (always kept); real
    duplicate texts in the corpus exercise the keep-first rule on the
    middle paragraph. Same construction in the oracle. The operator ranks
    paragraphs inside hash-partitioned windows and rebuilds documents
    order-preserved in one aggregation
    (operators/dedup.py::paragraph_dedup)."""
    from pramen_spark.operators.dedup import paragraph_dedup

    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.lit(
                "Shared disclaimer: synthetic corpus, evaluation use only."
                "\n\n"
            ),
            F.col("text"),
            F.lit("\n\nref "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return paragraph_dedup(aug)


@query(
    "substring_dedup_documents",
    r"""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' visit our site today for the best synthetic data offers'
                    ELSE text END AS text
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS t
        FROM aug
    ),
    grams AS (
        SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
               array_to_string(t[CAST(i + 1 AS INTEGER):CAST(i + 8 AS INTEGER)], ' ') AS gram
        FROM (SELECT doc_id, t, unnest(range(len(t) - 8 + 1)) AS i
              FROM toks WHERE len(t) >= 8)
    ),
    ranked AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM grams
    ),
    rm AS (
        SELECT DISTINCT d.doc_id, d.pos + ro.o AS rmpos
        FROM (SELECT doc_id, pos FROM ranked WHERE rn > 1) d, range(8) ro(o)
    ),
    alltoks AS (
        SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
               t[CAST(i + 1 AS INTEGER)] AS tok, len(t) AS n_all
        FROM (SELECT doc_id, t, unnest(range(len(t))) AS i FROM toks)
    ),
    kept AS (
        SELECT a.doc_id, a.pos, a.tok, a.n_all
        FROM alltoks a LEFT JOIN rm ON a.doc_id = rm.doc_id AND a.pos = rm.rmpos
        WHERE rm.doc_id IS NULL
    )
    SELECT doc_id,
           array_to_string(list(tok ORDER BY pos), ' ') AS text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
           CAST(ANY_VALUE(n_all) - COUNT(*) AS BIGINT) AS n_tokens_removed
    FROM kept
    GROUP BY doc_id
    """,
    "exact substring dedup: duplicated >=8-token runs survive only at "
    "their globally first occurrence (Lee et al. at token granularity)",
    tags=("dedup", "quality"),
)
def q_substring_dedup_documents(spark, sf_dir):
    """Sub-paragraph exact dedup (the member of the Lee et al. family
    that paragraph_dedup misses): a 10-token promotional sentence is
    appended to every third doc — the globally first copy keeps it, every
    later copy has exactly those tokens stripped while the surrounding
    unique text survives. Same construction in the oracle, which
    recomputes the keep-first marking and rebuild from scratch. The
    operator shuffles n-grams once for the keep-first window (partitioned
    by hash + gram, exact under collisions) and rebuilds docs from an
    aggregated start-position list (operators/dedup.py::substring_dedup);
    no self-join on raw text."""
    from pramen_spark.operators.dedup import substring_dedup

    # n-gram build amplifies ~8x: spread the narrow raw scan first
    # (interleaved A/B at sf0.1: 2.25s -> 0.96s median)
    d = load_documents_spread(spark, sf_dir)
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" visit our site today for the best synthetic data offers"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return substring_dedup(aug, n=8)


@query(
    "ngram_novelty_documents",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS gram
        FROM (SELECT doc_id, t, unnest(range(len(t) - 3 + 1)) AS i
              FROM toks WHERE len(t) >= 3)
    ),
    dfq AS (SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
               AS novelty_ratio
    FROM grams g JOIN dfq d USING (gram)
    GROUP BY g.doc_id
    """,
    "per-doc novelty: fraction of distinct token 3-grams occurring in no "
    "other document (residual-duplication / memorization-risk audit)",
    tags=("dedup", "quality"),
)
def q_ngram_novelty_documents(spark, sf_dir):
    """Novelty audit over the corpus: per-doc distinct grams build inside
    the row (array_distinct before the explode), corpus doc-frequency is
    one window count keyed by (hash, gram), and the verdict folds in a
    map-side-combined groupBy — no join anywhere in the operator
    (operators/dedup.py::ngram_novelty); the oracle recomputes df with an
    explicit GROUP BY + join."""
    from pramen_spark.operators.dedup import ngram_novelty

    # gram explode amplifies ~len(doc)x: spread the narrow raw scan
    # (interleaved A/B at sf0.1: 0.87s -> 0.69s median)
    d = load_documents_spread(spark, sf_dir)
    return ngram_novelty(d, n=3)


@query(
    "snapshot_diff_documents",
    r"""
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, 'new doc ' || CAST(doc_id AS VARCHAR) AS text
        FROM documents WHERE doc_id % 11 = 0
    ),
    o AS (SELECT doc_id, sha256(text) AS h_old FROM old),
    n AS (SELECT doc_id, sha256(text) AS h_new FROM new)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.h_old <> n.h_new THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """,
    "corpus snapshot diff: per-id added/removed/changed/unchanged between "
    "two dumps, compared by content hash",
    tags=("monitoring", "dedup"),
)
def q_snapshot_diff_documents(spark, sf_dir):
    """Refresh audit (operators/drift.py::snapshot_diff): the 'new' dump
    deterministically deletes every 7th doc, rewrites every 5th, and adds
    one per 11th — the diff must classify each id exactly. Each side
    reduces to (id, sha256) before the single full-outer join; the
    shuffle never carries text."""
    from pramen_spark.operators.drift import snapshot_diff

    d = load_table(spark, sf_dir, "documents")
    old = d.select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")).alias("text"),
    ).unionAll(
        d.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
        )
    )
    return snapshot_diff(old, new)


@query(
    "char_lm_quality",
    r"""
    WITH t AS (
        SELECT doc_id, lower(substr(text, 1, 4000)) AS s FROM documents
    ),
    d AS (SELECT doc_id, s FROM t WHERE length(s) >= 2),
    bg AS (
        SELECT doc_id, substr(s, CAST(i AS INTEGER), 2) AS bg
        FROM (SELECT doc_id, s, unnest(range(1, length(s))) AS i FROM d)
    ),
    doc_bg AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bg),
    model_bg AS (SELECT bg, SUM(cnt) AS c_bg FROM doc_bg GROUP BY bg),
    prefix AS (
        SELECT substr(bg, 1, 1) AS c1, SUM(c_bg) AS c_prefix
        FROM model_bg GROUP BY c1
    ),
    vocab AS (SELECT COUNT(DISTINCT substr(bg, 2, 1)) AS v FROM model_bg),
    model AS (
        SELECT m.bg,
               ln((CAST(m.c_bg AS DOUBLE) + 1.0)
                  / (CAST(p.c_prefix AS DOUBLE) + vv.v)) AS logp
        FROM model_bg m
        JOIN prefix p ON substr(m.bg, 1, 1) = p.c1
        CROSS JOIN vocab vv
    )
    SELECT d.doc_id,
           CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(d.cnt * m.logp) / SUM(d.cnt) / ln(2), 4) AS bits_per_char
    FROM doc_bg d JOIN model m ON d.bg = m.bg
    GROUP BY d.doc_id
    """,
    "perplexity-proxy quality score: per-doc cross-entropy under a "
    "corpus-trained char-bigram LM",
    tags=("text", "quality"),
)
def q_char_lm_quality(spark, sf_dir):
    """Model-based quality scoring (the CCNet/KenLM pattern, self-trained):
    estimate a char-bigram LM from the corpus, score every document by its
    bits-per-character under that model. One explode collapsed by map-side
    combine, model broadcast to the scoring join
    (operators/text.py::char_lm_score). Scores are ROUNDed to 4 decimals on
    both sides, the same float-determinism margin the other double-summing
    oracles use."""
    from pramen_spark.operators.text import char_lm_score

    d = load_documents_spread(spark, sf_dir)
    return char_lm_score(d)


@query(
    "materialize_mixture_corpus",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM documents
    ),
    g AS (SELECT source, SUM(n_tokens) AS g_tokens FROM t GROUP BY source),
    e AS (
        SELECT t.doc_id, t.source, t.n_tokens, t.u,
               CASE t.source WHEN 'src0' THEN 0.7 WHEN 'src1' THEN 0.3
                             ELSE 0.0 END * 3000.0 / g.g_tokens AS ep
        FROM t JOIN g ON t.source = g.source
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(floor(ep) + CASE WHEN u < ep - floor(ep) THEN 1 ELSE 0 END
                    AS BIGINT) AS n_copies
        FROM e
    )
    SELECT doc_id, source, n_tokens, CAST(i AS BIGINT) AS copy_idx
    FROM (SELECT doc_id, source, n_tokens, unnest(range(n_copies)) AS i
          FROM c WHERE n_copies > 0)
    """,
    "materialized training mixture: 70/30 src0/src1 at a 3000-token "
    "budget, hash-deterministic down- and up-sampling in one mechanism",
    tags=("sampling", "mixing"),
)
def q_materialize_mixture_corpus(spark, sf_dir):
    """The mixing loop closed (operators/sampling.py::materialize_mixture):
    epoch weight e_g = share_g * budget / tokens_g realizes the target
    shares at the budget — here src0 lands above 1 (upsampled) and src1
    below 1 (downsampled) on this corpus, exercising both directions of
    the one hash mechanism. Per-group aggregate broadcast back; no
    row-level shuffle."""
    from pramen_spark.operators.sampling import materialize_mixture

    d = load_table(spark, sf_dir, "documents")
    return materialize_mixture(d, {"src0": 0.7, "src1": 0.3}, total_tokens=3000.0)


@query(
    "value_drift_psi",
    """
    WITH ref AS (
        SELECT CAST(least(greatest(floor((CAST(value AS DOUBLE) - 0.0) / 50.0),
                                   0), 9) AS BIGINT) AS bucket
        FROM events
        WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ),
    cur AS (
        SELECT CAST(least(greatest(floor((CAST(value AS DOUBLE) - 0.0) / 50.0),
                                   0), 9) AS BIGINT) AS bucket
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ),
    h_ref AS (SELECT bucket, COUNT(*) AS n_ref FROM ref GROUP BY bucket),
    h_cur AS (SELECT bucket, COUNT(*) AS n_cur FROM cur GROUP BY bucket),
    grid AS (SELECT unnest(range(10)) AS bucket),
    joined AS (
        SELECT g.bucket,
               COALESCE(r.n_ref, 0) AS n_ref,
               COALESCE(c.n_cur, 0) AS n_cur
        FROM grid g
        LEFT JOIN h_ref r ON g.bucket = r.bucket
        LEFT JOIN h_cur c ON g.bucket = c.bucket
    ),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM joined)
    SELECT bucket,
           ROUND((n_ref + 1.0) / (t_ref + 10.0), 6) AS ref_rate,
           ROUND((n_cur + 1.0) / (t_cur + 10.0), 6) AS cur_rate,
           ROUND(((n_cur + 1.0) / (t_cur + 10.0) - (n_ref + 1.0) / (t_ref + 10.0))
                 * ln(((n_cur + 1.0) / (t_cur + 10.0))
                      / ((n_ref + 1.0) / (t_ref + 10.0))), 6) AS psi_term
    FROM joined CROSS JOIN tot
    """,
    "distribution-drift report: per-bucket PSI terms of the events value "
    "histogram, first half vs second half of the month",
    tags=("quality", "monitoring"),
)
def q_value_drift_psi(spark, sf_dir):
    """Population Stability Index between two snapshot windows
    (operators/drift.py::psi): each side is one map-side-combined
    histogram over a FIXED [0, 500) grid (constant bounds — no quantile
    pre-pass, no sort), smoothing keeps empty buckets finite, and the PSI
    arithmetic runs on 10 rows. SUM(psi_term) is the headline drift
    number a recurring pipeline alerts on."""
    from pramen_spark.operators.drift import psi

    e = load_events(spark, sf_dir)
    split = F.lit("2024-01-16").cast("timestamp")
    ref = e.filter(F.col("ts") < split)
    cur = e.filter(F.col("ts") >= split)
    return psi(ref, cur, "value", lo=0.0, hi=500.0, num_buckets=10)


@query(
    "bucket_gapfill_hourly",
    """
    WITH e AS (
        SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
               value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
    ),
    actual AS (
        SELECT user_id, bucket_ts, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM e GROUP BY user_id, bucket_ts
    ),
    span AS (
        SELECT user_id, MIN(bucket_ts) AS b0, MAX(bucket_ts) AS b1
        FROM actual GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket_ts
        FROM span
    )
    SELECT g.user_id,
           epoch_us(g.bucket_ts) AS bucket_us,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
           a.total_value,
           last_value(a.total_value IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.bucket_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_locf
    FROM grid g LEFT JOIN actual a USING (user_id, bucket_ts)
    """,
    "time-bucket gap filling: per-user hourly grid over each user's active "
    "span, missing buckets at 0/NULL, last observation carried forward",
    tags=("timeseries",),
)
def q_bucket_gapfill_hourly(spark, sf_dir):
    """Continuous-aggregate / time_bucket_gapfill pattern
    (operators/timegrid.py::bucket_gapfill): the grid is generated per
    key between that key's own first and last bucket — never a global
    keys x buckets cross join — so sparse keys cost only their own span.
    Decimal sums keep totals order-independent; the bucket is projected
    as epoch micros for engine-portable comparison."""
    from pramen_spark.operators.timegrid import bucket_gapfill

    e = load_events(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-13").cast("timestamp"))
    )
    out = bucket_gapfill(e, ts_col="ts", key_col="user_id", value_col="value")
    return out.select(
        "user_id",
        F.unix_micros("bucket_ts").alias("bucket_us"),
        "n_events",
        "total_value",
        "value_locf",
    )


@query(
    "rollup_orders_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "ROLLUP hierarchy over orders: per (priority, status), per priority, "
    "grand total in one pass",
    tags=("olap",),
)
def q_rollup_orders_priority_status(spark, sf_dir):
    """ROLLUP sibling of the CUBE query: the 3 hierarchical grouping sets
    cost one shuffle keyed by (grouping-set-id, keys), not 3 scans.
    Decimal sums keep the double cast order-independent."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "approx_aggregates_selfcheck",
    """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS distinct_within_5pct,
           ROUND(quantile_cont(value, 0.5), 4) AS median_exact,
           TRUE AS median_within_5pct
    FROM events
    """,
    "self-checking approximate aggregates: HLL distinct + quantile sketch "
    "asserted within 5% of exact, exact values hash-checked",
    tags=("olap", "sketch"),
)
def q_approx_aggregates_selfcheck(spark, sf_dir):
    """Sketch-based aggregates cannot hash-match another engine, so the
    query CARRIES ITS OWN CHECK: it outputs the exact values (oracle-
    comparable) plus booleans asserting the sketch estimates
    (approx_count_distinct HLL, percentile_approx) land within 5% of the
    exact answers — the oracle pins the booleans to TRUE, so a sketch
    regression flips the hash. At 100 TB the sketches are the production
    path (fixed-size state, one pass); the exact twins here are the
    verification harness."""
    e = load_events(spark, sf_dir)
    exact = e.agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        F.expr("percentile(value, 0.5)").alias("med_exact"),
    )
    approx = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        F.percentile_approx("value", 0.5, 10000).alias("med_approx"),
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.col("n_exact")
            < 0.05
        ).alias("distinct_within_5pct"),
        F.round("med_exact", 4).alias("median_exact"),
        (
            F.abs(F.col("med_approx") - F.col("med_exact"))
            / F.abs(F.col("med_exact"))
            < 0.05
        ).alias("median_within_5pct"),
    )


@query(
    "customer_value_ranks",
    """
    WITH spend AS (
        SELECT c.c_custkey, n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, n.n_name
    )
    SELECT c_custkey, n_name,
           total_spend,
           CAST(NTILE(4) OVER w AS BIGINT) AS spend_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume_dist
    FROM spend
    WINDOW w AS (PARTITION BY n_name ORDER BY total_spend, c_custkey)
    """,
    "ranking-function suite: per-nation customer spend quartiles, "
    "percent_rank and cume_dist",
    tags=("olap", "window"),
)
def q_customer_value_ranks(spark, sf_dir):
    """Window ranking-family coverage (ntile / percent_rank / cume_dist)
    over per-nation partitions — every window partitions on n_name, so no
    single-partition stage; the spend aggregation shuffles once and the
    three ranking functions share one sorted window. Decimal sums keep
    the double totals order-independent; the deterministic (total_spend,
    c_custkey) order makes ntile ties stable across engines."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = W.partitionBy("n_name").orderBy("total_spend", "c_custkey")
    return spend.select(
        "c_custkey",
        "n_name",
        "total_spend",
        F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


@query(
    "validate_documents",
    r"""
    SELECT 'doc_id_not_null' AS rule,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS violations,
           SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM documents
    UNION ALL
    SELECT 'doc_id_unique',
           CAST(COUNT(*) - COUNT(DISTINCT doc_id)
                - MAX(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*) - COUNT(DISTINCT doc_id)
                - MAX(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'n_chars_in_range',
           CAST(SUM(CASE WHEN n_chars IS NULL OR n_chars < 0
                         OR n_chars > 100000 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN n_chars IS NULL OR n_chars < 0
                    OR n_chars > 100000 THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'lang_is_iso2',
           CAST(SUM(CASE WHEN lang IS NULL
                         OR NOT regexp_matches(lang, '^[a-z]{2}$')
                         THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN lang IS NULL
                    OR NOT regexp_matches(lang, '^[a-z]{2}$')
                    THEN 1 ELSE 0 END) = 0
    FROM documents
    UNION ALL
    SELECT 'n_chars_consistent',
           CAST(SUM(CASE WHEN NOT (n_chars = length(text))
                         THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN NOT (n_chars = length(text)) THEN 1 ELSE 0 END) = 0
    FROM documents
    """,
    "data-quality expectations report: 5 rules over documents in one "
    "aggregation pass",
    tags=("quality", "validation"),
)
def q_validate_documents(spark, sf_dir):
    """Deequ-style expectation gate (operators/validation.py): all five
    rules — not-null, uniqueness, range, regex shape, cross-column
    consistency — evaluate in ONE aggregation job; stack pivots the wide
    row into the report. The oracle recomputes each rule independently
    (UNION ALL), so a silently-dropped rule or a miscounted violation
    breaks the hash."""
    from pramen_spark.operators.validation import validate_expectations

    d = load_table(spark, sf_dir, "documents")
    return validate_expectations(
        d,
        [
            ("doc_id_not_null", "not_null", {"col": "doc_id"}),
            ("doc_id_unique", "unique", {"col": "doc_id"}),
            ("n_chars_in_range", "in_range", {"col": "n_chars", "lo": 0, "hi": 100000}),
            ("lang_is_iso2", "matches", {"col": "lang", "pattern": r"^[a-z]{2}$"}),
            ("n_chars_consistent", "predicate", {"sql": "n_chars = length(text)"}),
        ],
    )


@query(
    "incremental_dedup_batch",
    """
    WITH seen AS (
        SELECT DISTINCT sha256(text) AS text_hash FROM documents WHERE doc_id <= 250
    ),
    batch AS (
        SELECT doc_id, sha256(text) AS text_hash FROM documents WHERE doc_id > 250
    ),
    fresh AS (
        SELECT b.doc_id, b.text_hash
        FROM batch b LEFT JOIN seen s USING (text_hash)
        WHERE s.text_hash IS NULL
    )
    SELECT doc_id, text_hash
    FROM (SELECT doc_id, text_hash,
                 ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
          FROM fresh)
    WHERE rn = 1
    """,
    "incremental exact dedup: new batch anti-joined against the "
    "previously-ingested hash ledger, within-batch dups collapsed",
    tags=("dedup", "incremental"),
)
def q_incremental_dedup_batch(spark, sf_dir):
    """Cross-run dedup (the incremental-pipeline shape: each run persists
    its content hashes; the next run admits only unseen content). Here the
    first half of the corpus plays the ledger and the second half the new
    batch (operators/dedup.py::dedup_against). Hash-keyed anti-join +
    keep-min — text never shuffles."""
    from pramen_spark.operators.dedup import dedup_against

    d = load_table(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") <= 250)
    batch = d.filter(F.col("doc_id") > 250).select("doc_id", "text")
    return dedup_against(batch, seen).select("doc_id", "text_hash")


@query(
    "minhash_incremental_batch",
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
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
    kept AS (
        SELECT doc_id, shingle FROM sh2
        WHERE shingle IN (
            SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 1000
        )
    ),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id > 250 AND trim(d.text) <> ''
      AND NOT EXISTS (SELECT 1 FROM dup_pairs p WHERE p.id_b = d.doc_id)
    """,
    "incremental MinHash near-dup dedup: new batch vs a persisted "
    "signature index (plus within-batch pairwise dropping)",
    tags=("dedup", "incremental"),
)
def q_minhash_incremental_batch(spark, sf_dir):
    """Near-dup analogue of incremental_dedup_batch: the first corpus
    half plays the persisted SIGNATURE index (id + 64 minhash longs —
    never text), the second half the new batch
    (operators/dedup.py::minhash_dedup_against). Candidates come from the
    LSH band join; exact-Jaccard rescoring (verify='exact') makes the
    survivor set equal to the oracle's brute-force NOT-EXISTS, since a
    batch doc survives iff no smaller-id doc (indexed or in-batch) is a
    >= 0.5 Jaccard neighbor — the pair (smaller, larger) is exactly
    dup_pairs(id_b = doc). Same banding-recall caveat as minhash_dedup
    (per-SF verification documented there); same boilerplate shingle cap
    (1000) mirrored in the oracle's kept CTE."""
    from pramen_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_signatures,
    )

    d = load_documents_spread(spark, sf_dir)
    seen = d.filter(F.col("doc_id") <= 250)
    batch = d.filter(F.col("doc_id") > 250)
    idx = minhash_signatures(seen, num_hashes=64, shingle_size=3)
    out = minhash_dedup_against(
        batch,
        idx,
        num_hashes=64,
        num_bands=32,
        threshold=0.5,
        max_shingle_freq=1000,
        verify="exact",
        seen_text=seen,
    )
    return out.select("doc_id")


@query(
    "upsample_epoch_mix",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 3.0
                           ELSE 1.0 END AS e,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'epoch'), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM documents
    ),
    c AS (
        SELECT doc_id, source,
               CAST(floor(e) + CASE WHEN u < e - floor(e) THEN 1 ELSE 0 END
                    AS BIGINT) AS n_copies
        FROM t
    )
    SELECT doc_id, source, CAST(i AS BIGINT) AS copy_idx
    FROM (SELECT doc_id, source, unnest(range(n_copies)) AS i
          FROM c WHERE n_copies > 0)
    """,
    "epoch-weighted upsampling: src0 x2.5, src1 x3, everything else x1, "
    "fractional copies by document hash",
    tags=("sampling", "mixing"),
)
def q_upsample_epoch_mix(spark, sf_dir):
    """Materialized epoch weighting (the upsampling half of a training
    mix): every src0 document appears 2 or 3 times (exactly half the
    group, hash-chosen, gets the third copy), src1 exactly 3 times,
    everything else once. Pure projection + posexplode, no shuffle
    (operators/sampling.py::upsample_to_epochs)."""
    from pramen_spark.operators.sampling import upsample_to_epochs

    d = load_table(spark, sf_dir, "documents")
    out = upsample_to_epochs(d, {"src0": 2.5, "src1": 3.0})
    return out.select("doc_id", "source", F.col("copy_idx").cast("long").alias("copy_idx"))


@query(
    "semdedup_embeddings",
    """
    WITH u AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                                               CAST(embedding AS DOUBLE[])))) AS uv
        FROM embeddings
    )
    SELECT a.vec_id,
           CAST(0 AS BIGINT) AS cell,
           COALESCE(MAX(CASE WHEN list_inner_product(a.uv, b.uv) >= 0.4
                             THEN 1 ELSE 0 END), 0) = 0 AS keep
    FROM u a LEFT JOIN u b ON b.vec_id < a.vec_id
    GROUP BY a.vec_id
    """,
    "SemDeDup: semantic dedup verdict per embedding (single-cluster exact "
    "registration; production uses nlist clusters)",
    tags=("dedup", "similarity"),
)
def q_semdedup_embeddings(spark, sf_dir):
    """SemDeDup registered at nlist=1, where the within-cluster keep-first
    rule is exact over the whole corpus and the oracle is a NOT-EXISTS
    over lower-id cosine pairs (the same full-probe exactness trick as
    IVF). Production runs nlist clusters so only same-cell vectors are
    ever paired (operators/similarity.py::semdedup)."""
    from pramen_spark.operators.similarity import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    return semdedup(e, threshold=0.4, nlist=1)


@query(
    "shard_assignment",
    r"""
    WITH t AS (
        SELECT doc_id,
               least(CAST(floor(
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 * 16) AS BIGINT), 15) AS shard_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM t GROUP BY shard_id
    """,
    "deterministic training-shard assignment: 16 hash shards with per-shard "
    "doc and token counts",
    tags=("sampling", "export"),
)
def q_shard_assignment(spark, sf_dir):
    """Shard-export audit: assign every document its deterministic hash
    shard (operators/sampling.py::assign_shards — the same assignment
    sinks/shard_sink.py writes out) and report per-shard doc/token counts,
    the balance check run before handing shards to a training job. One
    map-side-combined groupBy on the 16 shard ids."""
    from pramen_spark.operators.sampling import assign_shards

    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return (
        assign_shards(d, 16)
        .select("shard_id", n_tokens.alias("n_tokens"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


@query(
    "stream_windowed_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    "Structured Streaming parity: watermarked hourly tumbling-window "
    "counts over the events stream equal the batch aggregate",
    tags=("streaming",),
)
def q_stream_windowed_counts(spark, sf_dir):
    """The engine's streaming aggregation path run FOR REAL — a file
    readStream over the events table, watermarked tumbling-window
    counts+sums (streaming/stream.py::windowed_aggregation), availableNow
    trigger, memory sink — checked against the batch SQL twin. Streaming
    and batch MUST agree on a bounded input; this is the parity audit the
    reference's batch/streaming split (SURVEY §1.5) implies.

    Scale: the stateful window aggregate combines partially per
    micro-batch and the watermark bounds state; on a real cluster the
    memory sink becomes a metastore foreach_batch sink
    (streaming/stream.py::metastore_foreach_batch_sink) — the plan shape
    (one keyed state exchange) is the same."""
    from pramen_spark.streaming.stream import (
        read_file_stream,
        windowed_aggregation,
    )

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # The file streaming source requires a directory or a GLOB root (a
    # bare file path makes it set basePath to the file and fail); the
    # single-character class makes this a glob matching exactly one file.
    glob_path = f"{sf_dir}/events.parque[t]"
    # Parquet stores ts as TIMESTAMP_NTZ; Spark's event-time watermark
    # requires an instant (TIMESTAMP_LTZ), so cast on the way in and cast
    # the window bound back on the way out (identity under the session's
    # UTC timezone — the contract the testdata is generated under).
    stream = read_file_stream(spark, glob_path, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = windowed_aggregation(
        stream,
        "ts",
        "1 hour",
        watermark="30 minutes",
        group_cols=("event_type",),
        value_col="value",
    )
    sink = "stream_windowed_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@query(
    "bm25_relevance_documents",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    ),
    t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM t
        WHERE token IN ('spark', 'stream', 'vector', 'window')
        GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token)
    SELECT tf.doc_id,
           ROUND(SUM(
               ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           ), 4) AS bm25
    FROM tf
    JOIN dfreq d USING (token)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    GROUP BY tf.doc_id
    """,
    "Okapi BM25 relevance of every document against a fixed query term "
    "bag (k1=1.2, b=0.75)",
    tags=("text", "ranking"),
)
def q_bm25_relevance_documents(spark, sf_dir):
    """Lexical retrieval scoring (operators/text.py::bm25_scores): rank
    the corpus against a topical query — the candidate-pool builder for
    retrieval-based curation. One tokenize pass feeds doc lengths and
    query-term frequencies; (N, avgdl) and the per-term document
    frequencies are broadcast scalars, never corpus-joined."""
    from pramen_spark.operators.text import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    return bm25_scores(d, ["spark", "stream", "vector", "window"])


@query(
    "winnow_fingerprint_documents",
    """
    WITH d AS (
        SELECT doc_id, substr(lower(text), 1, 1000) AS s FROM documents
        WHERE length(substr(lower(text), 1, 1000)) >= 11
    ),
    g AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS i,
               length(s) - 7 AS n_grams,
               ('0x' || substr(md5(substr(s, CAST(i AS INTEGER), 8)), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, s, unnest(range(1, length(s) - 6)) AS i FROM d)
    ),
    wmin AS (
        SELECT doc_id, n_grams, i,
               MIN(h) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
               ) AS fp
        FROM g
    )
    SELECT doc_id,
           CAST(MAX(n_grams) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
           MIN(fp) AS min_fingerprint
    FROM wmin
    WHERE i <= n_grams - 3
    GROUP BY doc_id
    """,
    "winnowing (MOSS) fingerprint selection: min k-gram hash per sliding "
    "window, per-doc selected-set audit",
    tags=("text", "dedup"),
)
def q_winnow_fingerprint_documents(spark, sf_dir):
    """Winnowing fingerprints (operators/text.py::winnow_fingerprints,
    k=8 w=4): the index-builder audit for substring-level copy detection —
    any shared >=11-char span guarantees a shared fingerprint. The gram
    explode amplifies ~1000x per doc, so the narrow raw scan is spread
    first; only 8-byte hashes shuffle, once, and the per-doc aggregate
    reuses the window's partitioning."""
    from pramen_spark.operators.text import winnow_fingerprints

    d = load_documents_spread(spark, sf_dir)
    return winnow_fingerprints(d, k=8, w=4, prefix_chars=1000)


_LEAKAGE_SPLIT_ORACLE = f"""
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
        SELECT v AS vertex, LEAST(v, MIN(w)) AS component FROM reach GROUP BY v
    ),
    labeled AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_label
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.vertex
    )
    SELECT doc_id, cluster_label,
           CASE WHEN ('0x' || substr(md5(CAST(cluster_label AS VARCHAR) || 'split'), 1, 8))::BIGINT
                     / 4294967296.0 < 0.9
                THEN 'train' ELSE 'eval' END AS split
    FROM labeled
"""


@query(
    "leakage_safe_split_documents",
    _LEAKAGE_SPLIT_ORACLE,
    "near-dup-cluster-aware train/eval split: no eval document has a "
    "near-copy in train",
    tags=("sampling", "dedup"),
)
def q_leakage_safe_split_documents(spark, sf_dir):
    """Leakage-safe eval split (operators/sampling.py::leakage_safe_split):
    connected components over the exact ngram-Jaccard pair graph label
    each near-dup cluster, and the cluster — not the document — draws the
    split. Plain hash_split would put a document and its 95%-copy on
    opposite sides of the train/eval boundary; here the whole component
    inherits one salted-md5 draw, and isolated documents split exactly as
    hash_split does. The component map is pair-involved docs only, so the
    corpus-side join build is tiny."""
    from pramen_spark.operators.dedup import ngram_jaccard_pairs
    from pramen_spark.operators.sampling import leakage_safe_split

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        load_documents_spread(spark, sf_dir),
        shingle_size=3,
        threshold=0.05,
        max_shingle_freq=1000,
    )
    return leakage_safe_split(d, pairs, {"train": 0.9, "eval": 0.1})


_PROFILE_COL_TEMPLATE = """
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM documents
"""

_PROFILE_ORACLE = " UNION ALL ".join(
    _PROFILE_COL_TEMPLATE.format(c=c)
    for c in ("doc_id", "text", "lang", "source", "n_chars")
)


@query(
    "profile_documents_table",
    _PROFILE_ORACLE,
    "one-pass per-column table profile: null count, exact distinct count, "
    "min/max per column",
    tags=("validation", "monitoring"),
)
def q_profile_documents_table(spark, sf_dir):
    """Column profiling (operators/validation.py::profile_columns): the
    pre-publish table summary — every column's null/distinct/min/max from
    ONE aggregation job (exact distincts expand map-side; the HLL variant
    is the 100 TB default). Extends the reference's record-count stats
    (metastore/persistence.py record counting) to column granularity."""
    from pramen_spark.operators.validation import profile_columns

    d = load_table(spark, sf_dir, "documents")
    return profile_columns(d)


@query(
    "cohort_retention_events",
    """
    WITH e AS (
        SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    f AS (
        SELECT user_id, day,
               MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM e
    )
    SELECT cohort_day,
           CAST(day - cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM f
    GROUP BY cohort_day, day_offset
    """,
    "cohort retention triangle: users active N days after their "
    "first-seen day, grouped by first-seen cohort",
    tags=("analytics",),
)
def q_cohort_retention_events(spark, sf_dir):
    """Classic product-analytics rollup: each user's cohort is their
    first active day; the triangle counts distinct users per
    (cohort_day, day_offset). Two shuffles total — the per-user window
    for the cohort day, then the counting aggregate (distinct users
    expand inside it); no self-join of events against its own minimum.
    At 100 TB the window shuffle carries (user_id, date) pairs only."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    )
    f = e.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return f.groupBy(
        "cohort_day",
        F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
    ).agg(F.countDistinct("user_id").cast("long").alias("n_users"))


@query(
    "funnel_events",
    """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'view', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
    "ordered conversion funnel signup -> view -> purchase: users "
    "completing each stage strictly after the previous one",
    tags=("analytics",),
)
def q_funnel_events(spark, sf_dir):
    """Ordered funnel: stage N counts users whose earliest stage-N event
    falls strictly AFTER their stage-(N-1) completion time — the
    sequence-sensitive metric a naive per-type count gets wrong. Each
    stage is a filtered aggregate joined to the previous stage's per-user
    completion times; every shuffle and join keys on user_id, so AQE
    reuses one partitioning across the chain and only (user_id,
    timestamp) pairs move."""
    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("signup").alias("stage"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("stage"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("purchase").alias("stage"), "n_users"
        ),
    ]
    out = counts[0].unionAll(counts[1]).unionAll(counts[2])
    return out.select("stage", F.col("n_users").cast("long").alias("n_users"))


@query(
    "apply_cdc_orders",
    """
    WITH snap AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    ),
    changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 2 AS o_totalprice, 'U' AS op, 1 AS seq
        FROM snap WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D', 2
        FROM snap WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N', 100.0, 'I', 1
        FROM snap WHERE o_orderkey % 11 = 0
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey ORDER BY seq DESC, op DESC
            ) AS rn FROM changes
        ) WHERE rn = 1
    ),
    kept AS (
        SELECT s.* FROM snap s
        WHERE NOT EXISTS (
            SELECT 1 FROM latest l WHERE l.o_orderkey = s.o_orderkey
        )
    ),
    merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM kept
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM latest WHERE op <> 'D'
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM merged
    """,
    "latest-wins CDC merge: apply an upsert/delete change batch to a "
    "snapshot (updates, deletes, inserts, delete-beats-update conflicts)",
    tags=("cdc", "incremental"),
)
def q_apply_cdc_orders(spark, sf_dir):
    """CDC apply (operators/cdc.py::apply_cdc): the change batch updates
    every 5th order (price doubled), deletes every 7th, inserts one per
    11th under a shifted key — with %35 keys receiving BOTH an update and
    a higher-sequence delete, so latest-wins conflict resolution is
    exercised, not just disjoint ops. The snapshot pays one anti-join on
    the key; only the (small) batch is windowed."""
    from pramen_spark.operators.cdc import apply_cdc

    snap = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    upd = snap.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    dels = snap.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    ins = snap.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    merged = apply_cdc(snap, changes, ["o_orderkey"], "seq")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@query(
    "scd2_customer_status",
    """
    WITH obs AS (
        SELECT o_custkey, o_orderstatus, CAST(o_orderdate AS DATE) AS d,
               o_orderkey
        FROM orders
    ),
    with_prev AS (
        SELECT o_custkey, o_orderstatus, d, o_orderkey,
               LAG(o_orderstatus) OVER (
                   PARTITION BY o_custkey ORDER BY d, o_orderkey
               ) AS prev
        FROM obs
    ),
    versions AS (
        SELECT o_custkey, o_orderstatus, d, o_orderkey FROM with_prev
        WHERE prev IS NULL OR o_orderstatus <> prev
    )
    SELECT o_custkey, o_orderstatus,
           d AS effective_from,
           LEAD(d) OVER (
               PARTITION BY o_custkey ORDER BY d, o_orderkey
           ) AS effective_to,
           LEAD(d) OVER (
               PARTITION BY o_custkey ORDER BY d, o_orderkey
           ) IS NULL AS is_current
    FROM versions
    """,
    "SCD Type 2 dimension build: per-key attribute versions with "
    "half-open effective_from/effective_to intervals and is_current",
    tags=("cdc", "incremental"),
)
def q_scd2_customer_status(spark, sf_dir):
    """SCD2 history (operators/cdc.py::scd2_history): each customer's
    order-status observations collapse into versions that open only when
    the status CHANGES; the order-key tiebreak makes same-day
    observations deterministic. Both window passes share one key
    exchange; intervals are half-open with a NULL-ended current row."""
    from pramen_spark.operators.cdc import scd2_history

    obs = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    return scd2_history(
        obs,
        key_cols=["o_custkey"],
        attr_cols=["o_orderstatus"],
        date_col="d",
        tiebreak_cols=["o_orderkey"],
    )


@query(
    "scd2_incremental_customer",
    """
    WITH obs AS (
        SELECT o_custkey, o_orderstatus, CAST(o_orderdate AS DATE) AS d,
               o_orderkey
        FROM orders
    ),
    with_prev AS (
        SELECT o_custkey, o_orderstatus, d, o_orderkey,
               LAG(o_orderstatus) OVER (
                   PARTITION BY o_custkey ORDER BY d, o_orderkey
               ) AS prev
        FROM obs
    ),
    versions AS (
        SELECT o_custkey, o_orderstatus, d, o_orderkey FROM with_prev
        WHERE prev IS NULL OR o_orderstatus <> prev
    )
    SELECT o_custkey, o_orderstatus,
           d AS effective_from,
           LEAD(d) OVER (
               PARTITION BY o_custkey ORDER BY d, o_orderkey
           ) AS effective_to,
           LEAD(d) OVER (
               PARTITION BY o_custkey ORDER BY d, o_orderkey
           ) IS NULL AS is_current
    FROM versions
    """,
    "incremental SCD2 maintenance: three date-ordered batch folds equal "
    "the one-shot dimension build over the full change log",
    tags=("cdc", "incremental"),
)
def q_scd2_incremental_customer(spark, sf_dir):
    """The open-version handoff under test at catalog scale
    (operators/cdc.py::scd2_merge): the order-status change log splits at
    1997-01-01 and 1999-01-01 into three strictly date-ordered batches
    that fold into the dimension one at a time. Each fold rebuilds ONLY
    (touched open versions + batch) — closed history passes through
    unwindowed — yet the chained result must match the oracle's one-shot
    build exactly, including versions that collapse because a later
    batch re-observes an unchanged status across the boundary. The fuzz
    twin (TestCdcFuzz::test_scd2_merge_chained_equals_one_shot) proves
    the property over random logs/cuts;
    this query pins it on real data every round."""
    from pramen_spark.operators.cdc import scd2_merge

    obs = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    cuts = ["1997-01-01", "1999-01-01"]
    batches = [
        obs.filter(F.col("d") < cuts[0]),
        obs.filter((F.col("d") >= cuts[0]) & (F.col("d") < cuts[1])),
        obs.filter(F.col("d") >= cuts[1]),
    ]
    state = None
    for b in batches:
        state = scd2_merge(
            state,
            b,
            key_cols=["o_custkey"],
            attr_cols=["o_orderstatus"],
            date_col="d",
            tiebreak_cols=["o_orderkey"],
        )
    return state.select(
        "o_custkey", "o_orderstatus", "effective_from", "effective_to", "is_current"
    )


@query(
    "incremental_agg_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
           CAST(MAX(l_shipdate) AS DATE) AS max_shipdate
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "incremental aggregate maintenance: three chained batch merges equal "
    "the one-shot aggregate over the whole table",
    tags=("cdc", "incremental"),
)
def q_incremental_agg_lineitem(spark, sf_dir):
    """Running-rollup maintenance (operators/cdc.py::merge_agg_state):
    lineitem splits into three disjoint batches (by l_orderkey % 3) that
    fold into the state one at a time — the associative merge must equal
    the single-pass GROUP BY the oracle runs. Each merge costs
    O(batch + groups), never O(history); this is the aggregation pattern
    an offset-tracked incremental pipeline (SURVEY §2.6) runs per batch."""
    from pramen_spark.operators.cdc import merge_agg_state

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        F.to_date("l_shipdate").alias("l_shipdate"),
    )
    state = None
    for i in range(3):
        batch = li.filter(F.col("l_orderkey") % 3 == i).drop("l_orderkey")
        state = merge_agg_state(
            state,
            batch,
            group_cols=["l_returnflag", "l_linestatus"],
            sum_cols=["l_quantity", "l_extendedprice"],
            min_cols=["l_shipdate"],
            max_cols=["l_shipdate"],
        )
    return state.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.round("sum_l_extendedprice", 2).alias("sum_price"),
        F.col("min_l_shipdate").alias("min_shipdate"),
        F.col("max_l_shipdate").alias("max_shipdate"),
    )


@query(
    "incremental_agg_join_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
           CAST(MAX(l_shipdate) AS DATE) AS max_shipdate
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "incremental aggregate maintenance via the FULL OUTER JOIN merge "
    "(bucketed-state form): chained folds equal the one-shot GROUP BY",
    tags=("cdc", "incremental", "scale"),
)
def q_incremental_agg_join_lineitem(spark, sf_dir):
    """The bucketed-state counterpart of incremental_agg_lineitem
    (operators/cdc.py::merge_agg_state_join): the same three chained
    batch folds, but each merge is a full-outer join on the group columns
    instead of union+agg. Against a state persisted with
    persist_agg_state (bucketed by the groups) the state side of this
    join needs NO exchange — per-batch cost O(batch + touched groups),
    independent of state size (plan-asserted by
    TestAggStateBucketing). Here the state stays in memory so both
    merge forms are exercised oracle-equal."""
    from pramen_spark.operators.cdc import merge_agg_state, merge_agg_state_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        F.to_date("l_shipdate").alias("l_shipdate"),
    )
    kw = dict(
        group_cols=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity", "l_extendedprice"],
        min_cols=["l_shipdate"],
        max_cols=["l_shipdate"],
    )
    state = None
    for i in range(3):
        batch = li.filter(F.col("l_orderkey") % 3 == i).drop("l_orderkey")
        if state is None:
            state = merge_agg_state(None, batch, **kw)
        else:
            state = merge_agg_state_join(state, batch, **kw)
    return state.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.round("sum_l_extendedprice", 2).alias("sum_price"),
        F.col("min_l_shipdate").alias("min_shipdate"),
        F.col("max_l_shipdate").alias("max_shipdate"),
    )


@query(
    "reconcile_orders_copy",
    """
    WITH lft AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        FROM orders
    ),
    rgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(
                   CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS DECIMAL(18,2)) AS VARCHAR) AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    la AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                   % 64 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_left,
               bit_xor(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || chr(31)
                   || CAST(o_custkey AS VARCHAR) || chr(31)
                   || o_orderstatus || chr(31) || price), 1, 15))::BIGINT)
                   AS digest_left
        FROM lft GROUP BY 1
    ),
    ra AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                   % 64 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_right,
               bit_xor(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || chr(31)
                   || CAST(o_custkey AS VARCHAR) || chr(31)
                   || o_orderstatus || chr(31) || price), 1, 15))::BIGINT)
                   AS digest_right
        FROM rgt GROUP BY 1
    )
    SELECT COALESCE(la.bucket, ra.bucket) AS bucket,
           CAST(COALESCE(n_left, 0) AS BIGINT) AS n_left,
           CAST(COALESCE(n_right, 0) AS BIGINT) AS n_right,
           digest_left, digest_right,
           (COALESCE(n_left, 0) = COALESCE(n_right, 0)
            AND COALESCE(digest_left = digest_right, FALSE)) AS match
    FROM la FULL OUTER JOIN ra ON la.bucket = ra.bucket
    """,
    "Merkle-style table reconciliation: per-bucket row counts and XOR "
    "content digests expose where a drifted copy diverges",
    tags=("validation", "monitoring"),
)
def q_reconcile_orders_copy(spark, sf_dir):
    """Copy-integrity audit (operators/reconcile.py::reconcile_tables):
    the 'copy' drops every 97th order and doubles every 89th price — the
    per-bucket count+digest comparison must flag exactly those buckets
    while the untouched ones match. Each side is one map-side-combined
    aggregation to 64 rows; nothing but (bucket, count, digest) partials
    ever shuffles, at any table size. The double column is pre-cast to
    DECIMAL(18,2) so its string form is engine-portable."""
    from pramen_spark.operators.reconcile import reconcile_tables

    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    left = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", price.alias("price")
    )
    drifted_price = (
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(18,2)")
        .cast("string")
    )
    right = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", drifted_price.alias("price")
    )
    return reconcile_tables(
        left,
        right,
        key_cols=["o_orderkey"],
        value_cols=["o_custkey", "o_orderstatus", "price"],
        num_buckets=64,
    )


@query(
    "quantize_embeddings_int8",
    """
    WITH s AS (
        SELECT vec_id, embedding,
               CAST(list_max(list_transform(embedding, x -> abs(x)))
                    AS DOUBLE) / 127.0 AS scale
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CASE WHEN scale = 0
                THEN list_transform(embedding, x -> 0)
                ELSE list_transform(
                    embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER))
           END AS qvec,
           CASE WHEN scale = 0 THEN 0.0
                ELSE ROUND(list_max(list_transform(
                    embedding,
                    x -> abs(CAST(x AS DOUBLE)
                             - round(CAST(x AS DOUBLE) / scale) * scale))), 6)
           END AS max_abs_err
    FROM s
    """,
    "symmetric int8 embedding quantization with per-vector scale and "
    "reconstruction-error audit",
    tags=("similarity", "embeddings"),
)
def q_quantize_embeddings_int8(spark, sf_dir):
    """Index compression (operators/similarity.py::quantize_embeddings):
    per-vector symmetric int8 with the max_abs_err <= scale/2 bound as an
    audit column — the check run before serving ANN candidates from the
    4x-smaller int8 index. Pure codegen projection: zero shuffles."""
    from pramen_spark.operators.similarity import quantize_embeddings

    e = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(e)


@query(
    "stream_sliding_counts",
    """
    WITH w AS (
        SELECT date_trunc('hour', ts) AS w0, event_type FROM events
    ),
    ex AS (
        SELECT w0 AS window_start, event_type FROM w
        UNION ALL
        SELECT w0 - INTERVAL 1 HOUR, event_type FROM w
    )
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ex GROUP BY 1, 2
    """,
    "Structured Streaming parity for HOPPING windows: 2h windows sliding "
    "by 1h — every event counts in exactly two windows",
    tags=("streaming",),
)
def q_stream_sliding_counts(spark, sf_dir):
    """Sliding (hopping) window parity, run as a REAL streaming query like
    stream_windowed_counts: 2-hour windows every hour mean each event
    belongs to the two windows starting at trunc_hour(ts) and the hour
    before — which is exactly how the batch oracle expands it. The
    stateful aggregate keys on (window, type); the watermark bounds how
    many open windows the store holds."""
    from pramen_spark.streaming.stream import (
        read_file_stream,
        windowed_aggregation,
    )

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    glob_path = f"{sf_dir}/events.parque[t]"
    stream = read_file_stream(spark, glob_path, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = windowed_aggregation(
        stream,
        "ts",
        "2 hours",
        slide_duration="1 hour",
        watermark="30 minutes",
        group_cols=("event_type",),
    )
    sink = "stream_sliding_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
    )


def _pagerank_oracle(n_iter: int = 10, d: float = 0.85) -> str:
    """Unrolled PageRank replay: one CTE trio (dangling mass, contribs,
    new ranks) per iteration — recursive CTEs cannot aggregate over the
    recursive term, so a FIXED iteration count unrolls instead."""
    head = """
    WITH edges AS MATERIALIZED (
        SELECT o.o_custkey AS a, l.l_suppkey + 1000000 AS b
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    verts AS MATERIALIZED (SELECT a AS v FROM edges UNION SELECT b FROM edges),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
    deg AS MATERIALIZED (SELECT a, COUNT(*) AS dd FROM edges GROUP BY a),
    pr0 AS MATERIALIZED (SELECT v, 1.0 / nn.n AS r FROM verts CROSS JOIN nn)"""
    steps = []
    for i in range(1, n_iter + 1):
        p = f"pr{i - 1}"
        steps.append(
            f"""
    dang{i} AS MATERIALIZED (
        SELECT COALESCE(SUM(p.r), 0) AS m
        FROM {p} p LEFT JOIN deg ON p.v = deg.a WHERE deg.a IS NULL
    ),
    contrib{i} AS MATERIALIZED (
        SELECT e.b AS v, SUM(p.r / deg.dd) AS c
        FROM edges e JOIN {p} p ON e.a = p.v JOIN deg ON deg.a = e.a
        GROUP BY e.b
    ),
    pr{i} AS MATERIALIZED (
        SELECT t.v,
               (1 - {d}) / nn.n + {d} * (COALESCE(c.c, 0) + g.m / nn.n) AS r
        FROM verts t CROSS JOIN nn CROSS JOIN dang{i} g
        LEFT JOIN contrib{i} c ON c.v = t.v
    )"""
        )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT v AS vertex, ROUND(r, 8) AS pr FROM pr{n_iter}
    """
    )


@query(
    "pagerank_purchase_graph",
    _pagerank_oracle(),
    "PageRank (10 synchronous iterations, damping 0.85, dangling-mass "
    "redistribution) over the directed customer -> supplier purchase graph",
    tags=("graph",),
)
def q_pagerank_purchase_graph(spark, sf_dir):
    """Iterative graph algorithm checked exactly (operators/graph.py::
    pagerank): the purchase graph is bipartite and directed — customers
    have only out-edges, suppliers only in-edges — so every supplier is
    DANGLING and the uniform mass redistribution is exercised every
    round, not just on edge cases. Fixed iteration count makes the
    result deterministic; the oracle replays the same 10 synchronous
    updates unrolled. Per iteration: one co-keyed join + one map-side
    combined aggregate (Pregel messages on DataFrames), a 1-row dangling
    broadcast, and lineage truncated every 3 rounds."""
    from pramen_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1000000).alias("dst"),
    )
    ranks = pagerank(edges, damping=0.85, n_iter=10)
    return ranks.select("vertex", F.round("rank", 8).alias("pr"))


@query(
    "incremental_distinct_hll",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
    "incremental distinct-user maintenance: three chained HLL sketch "
    "merges must estimate the one-shot exact distinct within 5%",
    tags=("cdc", "incremental", "sketch"),
)
def q_incremental_distinct_hll(spark, sf_dir):
    """Mergeable distinct state (operators/cdc.py::merge_distinct_state):
    exact distincts cannot fold across batches, HLL sketches can — three
    disjoint event batches merge into one sketch per event_type, and the
    query CARRIES ITS OWN CHECK (the approx_aggregates_selfcheck
    pattern): it outputs the exact distinct count (oracle-matched) plus
    a within-5% verdict computed from the sketch estimate, so estimator
    drift fails the driver gate even though sketch binaries cannot
    hash-match another engine."""
    from pramen_spark.operators.cdc import estimate_distinct, merge_distinct_state

    e = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    state = None
    for i in range(3):
        state = merge_distinct_state(
            state,
            e.filter(F.col("event_id") % 3 == i),
            group_cols=["event_type"],
            key_col="user_id",
        )
    est = estimate_distinct(state)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_distinct_est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_5pct"),
    )


@query(
    "value_percentiles_daily",
    """
    SELECT CAST(ts AS DATE) AS day,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY 1
    """,
    "daily P50/P95/P99 of the event value (exact interpolated "
    "percentiles)",
    tags=("analytics", "monitoring"),
)
def q_value_percentiles_daily(spark, sf_dir):
    """Daily latency-style percentile monitoring: exact interpolated
    percentiles per day (Spark `percentile` and DuckDB `quantile_cont`
    implement the same p*(n-1) linear interpolation). Exact grouped
    percentiles sort each day's values inside the aggregate — fine for
    day-sized groups; at 100 TB swap in approx_percentile and keep the
    within-tolerance self-check (the sketch pattern
    approx_aggregates_selfcheck / incremental_distinct_hll use)."""
    e = load_events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "value"
    )
    pct = F.percentile(F.col("value"), F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return e.groupBy("day").agg(
        F.round(F.element_at(pct, 1), 4).alias("p50"),
        F.round(F.element_at(pct, 2), 4).alias("p95"),
        F.round(F.element_at(pct, 3), 4).alias("p99"),
    )


@query(
    "weighted_sample_documents",
    """
    WITH scored AS (
        SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS weight,
               ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wsample'), 1, 8))::BIGINT
                  / 4294967296.0) / n_chars AS s
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, weight, ROUND(s, 8) AS sample_score
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY s DESC, doc_id
        ) AS rn FROM scored
    ) WHERE rn <= 50
    """,
    "deterministic weighted sampling without replacement (derandomized "
    "Efraimidis-Spirakis): per-language top-50 by ln(u)/weight",
    tags=("sampling",),
)
def q_weighted_sample_documents(spark, sf_dir):
    """Quality-weighted selection (operators/sampling.py::
    weighted_sample_topk): longer documents are proportionally MORE
    likely — never certain — to be kept, per language, and the draw is
    reproducible from the doc-id hash (re-runs never swap the sample).
    Scoring is a projection; the per-group top-k is one window per
    language partition."""
    from pramen_spark.operators.sampling import weighted_sample_topk

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("weight")
    )
    out = weighted_sample_topk(
        d, "weight", 50, key_col="doc_id", group_cols=["lang"]
    )
    return out.select(
        "doc_id", "lang", "weight", F.round("sample_score", 8).alias("sample_score")
    )


def _hits_oracle(n_iter: int = 8) -> str:
    """Unrolled HITS replay (same mechanism as the pagerank oracle):
    one (authority-raw, authority, hub-raw, hub) CTE quad per iteration,
    every level MATERIALIZED so references do not inline exponentially."""
    head = """
    WITH edges AS MATERIALIZED (
        SELECT o.o_custkey AS a, l.l_suppkey + 1000000 AS b
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    verts AS MATERIALIZED (SELECT a AS v FROM edges UNION SELECT b FROM edges),
    h0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS s FROM verts)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f"""
    araw{i} AS MATERIALIZED (
        SELECT e.b AS v, SUM(p.s) AS raw
        FROM edges e JOIN h{i - 1} p ON e.a = p.v GROUP BY e.b
    ),
    a{i} AS MATERIALIZED (
        SELECT t.v, COALESCE(r.raw, 0) / m.mx AS s
        FROM verts t
        CROSS JOIN (SELECT MAX(raw) AS mx FROM araw{i}) m
        LEFT JOIN araw{i} r ON r.v = t.v
    ),
    hraw{i} AS MATERIALIZED (
        SELECT e.a AS v, SUM(p.s) AS raw
        FROM edges e JOIN a{i} p ON e.b = p.v GROUP BY e.a
    ),
    h{i} AS MATERIALIZED (
        SELECT t.v, COALESCE(r.raw, 0) / m.mx AS s
        FROM verts t
        CROSS JOIN (SELECT MAX(raw) AS mx FROM hraw{i}) m
        LEFT JOIN hraw{i} r ON r.v = t.v
    )"""
        )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT h.v AS vertex, ROUND(h.s, 8) AS hub, ROUND(a.s, 8) AS authority
    FROM h{n_iter} h JOIN a{n_iter} a ON h.v = a.v
    """
    )


@query(
    "hits_purchase_graph",
    _hits_oracle(),
    "HITS hubs and authorities (8 max-normalized iterations) over the "
    "directed customer -> supplier purchase graph",
    tags=("graph",),
)
def q_hits_purchase_graph(spark, sf_dir):
    """Mutual-reinforcement ranking (operators/graph.py::hits): on the
    bipartite purchase graph hubs rank customers by how much volume they
    send to strong suppliers and authorities rank suppliers by the
    strength of their buyers — the two-sided structure a single PageRank
    score flattens. Max normalization keeps every step division-only,
    so the unrolled oracle replays it exactly. Same iteration scaffolding
    as pagerank: static edges, broadcast score tables under the 1M-vertex
    envelope, lineage truncated every other round."""
    from pramen_spark.operators.graph import hits

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1000000).alias("dst"),
    )
    out = hits(edges, n_iter=8)
    return out.select(
        "vertex",
        F.round("hub", 8).alias("hub"),
        F.round("authority", 8).alias("authority"),
    )


@query(
    "trend_slope_daily",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS x,
               SUM(value) AS y
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(regr_slope(y, x), 4) AS slope,
           ROUND(regr_intercept(y, x), 4) AS intercept,
           ROUND(corr(y, x) * corr(y, x), 4) AS r2
    FROM daily
    GROUP BY event_type
    """,
    "per-type daily-volume trend: closed-form OLS slope/intercept/r2 "
    "over the day index",
    tags=("analytics", "monitoring"),
)
def q_trend_slope_daily(spark, sf_dir):
    """Trend monitoring as two map-side-combined aggregations: daily
    volumes per type, then the closed-form OLS fit from covariance
    aggregates — slope = covar_pop(y,x)/var_pop(x), intercept from the
    means, r2 from corr — exactly DuckDB's regr_* definitions, so the
    fit is oracle-exact. The trend a freshness/volume alert consumes; at
    any scale the regression state is six running sums per group."""
    e = load_events(spark, sf_dir)
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("double")
            .alias("x"),
        )
        .agg(F.sum("value").alias("y"))
    )
    slope = F.covar_pop("y", "x") / F.var_pop("x")
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(slope, 4).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 4).alias("intercept"),
        F.round(F.corr("y", "x") * F.corr("y", "x"), 4).alias("r2"),
    )


_RECON_KEY_SQL = "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT"
_RECON_DIG_SQL = (
    "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || chr(31) "
    "|| CAST(o_custkey AS VARCHAR) || chr(31) || o_orderstatus || chr(31) "
    "|| price), 1, 15))::BIGINT"
)

_DRILLDOWN_ORACLE = f"""
    WITH lft AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        FROM orders
    ),
    rgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(
                   CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS DECIMAL(18,2)) AS VARCHAR) AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    cl AS (
        SELECT {_RECON_KEY_SQL} % 16 AS b, CAST(COUNT(*) AS BIGINT) AS n_l,
               bit_xor({_RECON_DIG_SQL}) AS x_l
        FROM lft GROUP BY 1
    ),
    cr AS (
        SELECT {_RECON_KEY_SQL} % 16 AS b, CAST(COUNT(*) AS BIGINT) AS n_r,
               bit_xor({_RECON_DIG_SQL}) AS x_r
        FROM rgt GROUP BY 1
    ),
    bad AS (
        SELECT COALESCE(cl.b, cr.b) AS b
        FROM cl FULL OUTER JOIN cr ON cl.b = cr.b
        WHERE NOT (COALESCE(n_l, 0) = COALESCE(n_r, 0)
                   AND COALESCE(x_l = x_r, FALSE))
    ),
    fl AS (
        SELECT {_RECON_KEY_SQL} % 256 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_left,
               bit_xor({_RECON_DIG_SQL}) AS digest_left
        FROM lft WHERE {_RECON_KEY_SQL} % 16 IN (SELECT b FROM bad)
        GROUP BY 1
    ),
    fr AS (
        SELECT {_RECON_KEY_SQL} % 256 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_right,
               bit_xor({_RECON_DIG_SQL}) AS digest_right
        FROM rgt WHERE {_RECON_KEY_SQL} % 16 IN (SELECT b FROM bad)
        GROUP BY 1
    )
    SELECT COALESCE(fl.bucket, fr.bucket) AS bucket,
           CAST(COALESCE(n_left, 0) AS BIGINT) AS n_left,
           CAST(COALESCE(n_right, 0) AS BIGINT) AS n_right,
           digest_left, digest_right,
           (COALESCE(n_left, 0) = COALESCE(n_right, 0)
            AND COALESCE(digest_left = digest_right, FALSE)) AS match
    FROM fl FULL OUTER JOIN fr ON fl.bucket = fr.bucket
"""


@query(
    "reconcile_drilldown_orders",
    _DRILLDOWN_ORACLE,
    "Merkle descent step: fine-grained re-reconciliation of ONLY the "
    "coarse buckets the first pass flagged",
    tags=("validation", "monitoring"),
)
def q_reconcile_drilldown_orders(spark, sf_dir):
    """The descent reconcile_tables' docstring promises, run for real
    (operators/reconcile.py::reconcile_drilldown): a 16-bucket coarse
    pass flags the damaged buckets (same injected drift as
    reconcile_orders_copy), and the 256-bucket second pass touches only
    those buckets' rows — the scan shrinks proportionally to the damage,
    and iterating narrows a 100 TB diff to the changed keys in O(log)
    aggregate-only passes. The only driver traffic is the <= 16
    mismatched coarse ids."""
    from pramen_spark.operators.reconcile import reconcile_drilldown

    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    left = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", price.alias("price")
    )
    drifted_price = (
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(18,2)")
        .cast("string")
    )
    right = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", drifted_price.alias("price")
    )
    return reconcile_drilldown(
        left,
        right,
        key_cols=["o_orderkey"],
        value_cols=["o_custkey", "o_orderstatus", "price"],
        coarse_buckets=16,
        fine_buckets=256,
    )


@query(
    "anomaly_mad_daily",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, median(cnt) AS m FROM daily GROUP BY 1
    ),
    mads AS (
        SELECT d.event_type, median(abs(cnt - m)) AS mad
        FROM daily d JOIN med USING (event_type) GROUP BY 1
    )
    SELECT d.event_type, day, cnt,
           ROUND(m, 4) AS median_value,
           ROUND(mad, 4) AS mad,
           ROUND(CASE WHEN mad > 0 THEN abs(cnt - m) / (1.4826 * mad)
                      WHEN abs(cnt - m) = 0 THEN 0.0
                      ELSE NULL END, 4) AS robust_z,
           CASE WHEN mad > 0 THEN abs(cnt - m) / (1.4826 * mad) > 3.0
                ELSE abs(cnt - m) > 0 END AS is_anomaly
    FROM daily d JOIN med USING (event_type) JOIN mads USING (event_type)
    """,
    "robust anomaly detection: median/MAD z-scores over daily event "
    "counts per type, 3-sigma flag",
    tags=("analytics", "monitoring"),
)
def q_anomaly_mad_daily(spark, sf_dir):
    """Robust outlier gate (operators/anomaly.py::mad_anomalies) over the
    daily volume series: median and MAD per event type (both EXACT
    interpolating percentiles, matching DuckDB's median), then flag days
    whose deviation exceeds 3 robust sigmas. Unlike mean/stddev z-scores
    the spike being hunted cannot mask itself. The detector's input is
    already an aggregate (days x types), so the exact per-group
    percentile sorts a bounded set — the raw 100 TB is reduced by the
    first map-side-combined count."""
    from pramen_spark.operators.anomaly import mad_anomalies

    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    out = mad_anomalies(daily, ["event_type"], "cnt", threshold=3.0)
    return out.select(
        "event_type",
        "day",
        "cnt",
        F.round("median_value", 4).alias("median_value"),
        F.round("mad", 4).alias("mad"),
        F.round("robust_z", 4).alias("robust_z"),
        "is_anomaly",
    )


@query(
    "event_transitions_markov",
    """
    WITH nxt AS (
        SELECT event_type AS src,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ),
    cnt AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM nxt WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n_transitions,
           ROUND(n_transitions * 1.0
                 / SUM(n_transitions) OVER (PARTITION BY src), 6) AS prob
    FROM cnt
    """,
    "Markov transition matrix over per-user ordered event streams: "
    "(src, dst, count, probability)",
    tags=("analytics", "sequences"),
)
def q_event_transitions_markov(spark, sf_dir):
    """First-order Markov chain of user behavior (operators/sequences.py::
    transition_matrix): one entity-partitioned window forms adjacent
    (src, dst) state pairs (event_id tiebreak makes the order total),
    one map-side-combined count aggregates them, and the per-source
    normalization windows over the tiny distinct-pairs result — two
    shuffles of the raw events, both on high-cardinality keys. Feeds
    next-event baselines, churn-path audits, and UI-flow monitoring."""
    from pramen_spark.operators.sequences import transition_matrix

    e = load_events(spark, sf_dir)
    out = transition_matrix(e, "user_id", "event_type", ["ts", "event_id"])
    return out.select(
        "src", "dst", "n_transitions", F.round("prob", 6).alias("prob")
    )


@query(
    "skew_profile_orders",
    """
    WITH counts AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    )
    SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_rows,
           ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top1_share,
           ROUND(quantile_cont(c, 0.5), 6) AS p50_rows,
           ROUND(quantile_cont(c, 0.9), 6) AS p90_rows,
           ROUND(quantile_cont(c, 0.99), 6) AS p99_rows,
           ROUND(AVG(c), 6) AS mean_rows,
           ROUND(MAX(c) * 1.0 / AVG(c), 6) AS skew_ratio
    FROM counts
    """,
    "join/shuffle-skew diagnostic: distribution summary of rows-per-key "
    "for a candidate shuffle key",
    tags=("validation", "monitoring"),
)
def q_skew_profile_orders(spark, sf_dir):
    """The measurement behind every salting / AQE-skew decision
    (operators/validation.py::key_skew_profile): per-key counts then a
    one-row distribution summary (max, top-1 share, exact interpolating
    p50/p90/p99 of rows-per-key, skew ratio). Two aggregations; the
    second reduces one-row-per-key to one row total — the cheap question
    to ask before shuffling 100 TB on a key."""
    from pramen_spark.operators.validation import key_skew_profile

    o = load_table(spark, sf_dir, "orders")
    prof = key_skew_profile(o, "o_custkey")
    return prof.select(
        "n_rows",
        "n_keys",
        "max_rows",
        "top1_share",
        F.round("p50_rows", 6).alias("p50_rows"),
        F.round("p90_rows", 6).alias("p90_rows"),
        F.round("p99_rows", 6).alias("p99_rows"),
        "mean_rows",
        "skew_ratio",
    )


@query(
    "readability_documents",
    r"""
    WITH c AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS w,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS v
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_sentences,
           CAST(greatest(v, w) AS BIGINT) AS n_syllables,
           ROUND(CASE WHEN w > 0
                      THEN 206.835 - 1.015 * w / s
                           - 84.6 * greatest(v, w) / w
                 END, 4) AS flesch_reading_ease
    FROM c
    """,
    "Flesch reading ease per document from regex word/sentence/"
    "vowel-group counts",
    tags=("text",),
)
def q_readability_documents(spark, sf_dir):
    """The readability axis of the curation gate family
    (operators/text.py::readability_scores): FRE from three
    regexp_extract_all counts — words, sentence-ending punctuation runs,
    vowel-group syllable approximation — inside one codegen'd projection.
    Zero shuffles; the regexes carry identical semantics in DuckDB so
    the score is oracle-exact. Feeds audience filters and the
    easy-to-hard curriculum ordering."""
    from pramen_spark.operators.text import readability_scores

    d = load_table(spark, sf_dir, "documents")
    out = readability_scores(d)
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round("flesch_reading_ease", 4).alias("flesch_reading_ease"),
    )


@query(
    "curriculum_buckets_documents",
    """
    WITH b AS (
        SELECT lang, n_chars,
               ntile(10) OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id) AS bucket
        FROM documents
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM b GROUP BY 1, 2
    """,
    "curriculum-learning deciles: per-language NTILE(10) over document "
    "length, with per-bucket stats",
    tags=("sampling", "training"),
)
def q_curriculum_buckets_documents(spark, sf_dir):
    """Easy-to-hard phase assignment for a training loader
    (operators/sampling.py::curriculum_buckets): NTILE(10) over the
    total order (n_chars, doc_id) within each language, then per-bucket
    occupancy and length stats. The doc_id tiebreak makes the decile
    assignment deterministic (Spark and DuckDB share NTILE's
    remainder-to-first rule). The window partitions by language — a
    hash-partitioned per-group sort, not a global one — and the
    summary aggregation is map-side combined."""
    from pramen_spark.operators.sampling import curriculum_buckets

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    b = curriculum_buckets(
        d, "n_chars", "doc_id", n_buckets=10, partition_col="lang"
    )
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "json_props_events",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    "semi-structured JSON properties: typed extraction from the props "
    "column and per-type aggregation",
    tags=("relational", "json"),
)
def q_json_props_events(spark, sf_dir):
    """The semi-structured path every event pipeline needs: ``props``
    carries JSON; ``get_json_object`` extracts ``$.k`` JVM-side (codegen,
    no Python) and the cast-to-long feeds ordinary aggregation. At
    100 TB prefer ``from_json`` with an explicit schema once the shape
    is known (single parse, columnar struct access) — per-path
    extraction re-parses per path; this query has one path so they tie.
    Malformed/missing keys become NULLs and drop out of COUNT(col)/SUM
    identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(k).cast("long").alias("n_with_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@query(
    "grouping_sets_revenue",
    """
    SELECT n_name,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, order_year), (n_name), (order_year))
    """,
    "GROUPING SETS: nation x year, nation-only, and year-only revenue "
    "rollups in one pass (the subtotal shapes CUBE can't pick freely)",
    tags=("relational", "olap"),
)
def q_grouping_sets_revenue(spark, sf_dir):
    """The free-form subtotal surface (CUBE/ROLLUP's general form,
    SURVEY's OLAP family): three chosen grouping shapes — (nation, year),
    (nation), (year) — computed in ONE pass via Expand (each input row
    replicates once per grouping set, then a single hash aggregation;
    never three scans). Dimension joins broadcast; the decimal revenue
    is exact under every grouping."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.to_date("o_orderdate")).cast("long").alias("order_year"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = o.join(
        F.broadcast(c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])),
        o["o_custkey"] == c["c_custkey"],
    ).select("n_name", "order_year", "price")
    joined.createOrReplaceTempView("_gs_rev")
    return joined.sparkSession.sql(
        """
        SELECT n_name, order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(price), 2) AS DOUBLE) AS revenue
        FROM _gs_rev
        GROUP BY GROUPING SETS ((n_name, order_year), (n_name), (order_year))
        """
    )


@query(
    "twap_events",
    """
    WITH e AS (
        SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events
    ),
    g AS (
        SELECT user_id, v, tus,
               lead(tus) OVER (PARTITION BY user_id
                               ORDER BY tus, event_id) - tus AS gap_us
        FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(tus) - MIN(tus) AS BIGINT) AS span_us,
           ROUND(SUM(v * gap_us) / SUM(gap_us), 4) AS twap
    FROM g GROUP BY user_id
    """,
    "time-weighted average: each value weighted by its holding duration "
    "until the next observation, per user",
    tags=("analytics", "timeseries"),
)
def q_twap_events(spark, sf_dir):
    """The correct 'average state' for irregular sampling
    (operators/sequences.py::time_weighted_avg): burst-sampled moments
    stop dominating the mean because each value weighs its holding
    interval (lead-gap in exact integer micros; only the final products
    are doubles). One window pass per user + one map-side-combined
    aggregation; the last observation holds nothing and singleton users
    surface NULL via try_divide."""
    from pramen_spark.operators.sequences import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev)


@query(
    "cusum_changepoint_daily",
    """
    WITH series AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ),
    with_mean AS (
        SELECT *, AVG(x) OVER (PARTITION BY event_type) AS m FROM series
    ),
    cus AS (
        SELECT event_type, d,
               ROUND(SUM(x - m) OVER (PARTITION BY event_type ORDER BY d),
                     4) AS c
        FROM with_mean
    ),
    ranked AS (
        SELECT event_type, d, ABS(c) AS a,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ABS(c) DESC, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM cus
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           d AS changepoint_at, a AS max_abs_cusum
    FROM ranked WHERE rn = 1
    """,
    "CUSUM change-point localization: argmax |running deviation sum| "
    "over each type's daily-count series",
    tags=("anomaly", "monitoring"),
)
def q_cusum_changepoint_daily(spark, sf_dir):
    """WHERE the regime changed (operators/anomaly.py::
    cusum_changepoint), completing the anomaly family: MAD says which
    points are outliers, OLS says the trend, CUSUM localizes the level
    shift as the peak of the running deviation sum (Page's statistic,
    offline form). The window runs over the per-(type, day) SERIES —
    already reduced, never raw events — and the argmax is a
    lexicographic struct MAX with the earliest day winning rounded
    ties."""
    from pramen_spark.operators.anomaly import cusum_changepoint

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    return cusum_changepoint(series, ["event_type"], "d", "x")


@query(
    "zorder_cluster_lineitem",
    f"""
    WITH keyed AS (
        SELECT ((l_partkey * 7919) % 1024) AS x,
               ((l_suppkey * 104729) % 1024) AS y,
               ({" + ".join(
                   f"((((l_partkey * 7919) % 1024) >> {i}) & 1) * {1 << (2 * i)}"
                   f" + ((((l_suppkey * 104729) % 1024) >> {i}) & 1) * {1 << (2 * i + 1)}"
                   for i in range(10)
               )}) AS zkey
        FROM lineitem
    )
    SELECT CAST(zkey // 65536 AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
    FROM keyed GROUP BY 1
    """,
    "Z-order clustering audit: Morton-interleaved (partkey, suppkey) "
    "tiles with per-tile min/max showing two-dimensional locality",
    tags=("scale", "partitioning"),
)
def q_zorder_cluster_lineitem(spark, sf_dir):
    """The lakehouse locality transform (operators/partitioning.py::
    zorder_key / repartition_by_zorder — what Delta/Iceberg Z-ORDER
    maintenance computes): interleaving the bits of two dimensions makes
    every contiguous key range a compact 2-D tile, so files written in
    key order get NARROW min/max on BOTH columns and two-column
    predicates prune most of a 100 TB scan. The audit groups by the
    top-4-bit tile and shows each tile's bounded x/y extent; the key is
    a pure codegen'd bit expression — no UDF, no shuffle beyond the
    audit's own aggregate."""
    from pramen_spark.operators.partitioning import zorder_key

    li = load_table(spark, sf_dir, "lineitem").select(
        ((F.col("l_partkey") * 7919) % 1024).alias("x"),
        ((F.col("l_suppkey") * 104729) % 1024).alias("y"),
    )
    keyed = zorder_key(li, "x", "y", bits=10)
    return keyed.groupBy(
        F.shiftright(F.col("zkey"), 16).cast("long").alias("tile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("x").cast("long").alias("min_x"),
        F.max("x").cast("long").alias("max_x"),
        F.min("y").cast("long").alias("min_y"),
        F.max("y").cast("long").alias("max_y"),
    )


@query(
    "hll_accuracy_events",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
    "sketch-accuracy contract: HLL distinct-user estimate per type must "
    "land within 5% of the exact count (the oracle asserts the bound)",
    tags=("sketch", "monitoring"),
)
def q_hll_accuracy_events(spark, sf_dir):
    """The accuracy CONTRACT behind every sketch this engine ships
    (incremental_distinct_hll, approx profiles): per event type, the
    HyperLogLog++ estimate must land within 5% of the exact distinct
    count — emitted as a boolean the oracle pins to TRUE, so estimator
    drift fails correctness, not just a dashboard. Both counts come from
    ONE aggregation pass (the exact side is the two-phase Expand
    distinct; the sketch side merges partials map-side)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id").cast("double")
                - F.countDistinct("user_id").cast("double")
            )
            / F.countDistinct("user_id")
            <= 0.05
        ).alias("within_5pct"),
    )


@query(
    "orders_pivot_status",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_P,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(o_totalprice AS DECIMAL(18,2))
                          ELSE 0 END), 2) AS revenue_F
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot: order counts per priority spread across status columns, plus "
    "a pivoted revenue measure",
    tags=("relational",),
)
def q_orders_pivot_status(spark, sf_dir):
    """The pivot surface (df.groupBy().pivot(col, values)): explicit
    pivot VALUES pin the output schema (omitting them adds a
    distinct-scan job and makes the schema data-dependent — never do
    that in a pipeline), and the pivot compiles to exactly the oracle's
    conditional aggregation: one map-side-combined pass, no extra
    shuffle vs the plain groupBy."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("price").alias("rev"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_cnt", F.lit(0)).cast("long").alias("status_F"),
        F.coalesce("O_cnt", F.lit(0)).cast("long").alias("status_O"),
        F.coalesce("P_cnt", F.lit(0)).cast("long").alias("status_P"),
        F.round(
            F.coalesce(F.col("F_rev"), F.lit(0).cast("decimal(18,2)")), 2
        )
        .cast("double")
        .alias("revenue_F"),
    )


@query(
    "lineitem_unpivot_charges",
    """
    SELECT l_orderkey, l_linenumber, charge_kind,
           ROUND(amount, 2) AS amount
    FROM (
        SELECT l_orderkey, l_linenumber,
               unnest(['extendedprice', 'discount', 'tax']) AS charge_kind,
               unnest([l_extendedprice, l_discount, l_tax]) AS amount
        FROM lineitem
    )
    WHERE l_orderkey % 100 = 0
    """,
    "unpivot/melt: the three lineitem charge measures as (kind, amount) "
    "rows — the long form feeding generic per-measure pipelines",
    tags=("relational",),
)
def q_lineitem_unpivot_charges(spark, sf_dir):
    """The unpivot surface (df.unpivot — Spark's melt): wide measures to
    (variable, value) rows as a zero-shuffle projection+generate. The
    long form is what generic per-measure validators/drift monitors
    consume without knowing the schema; the id filter keeps the catalog
    output bounded. Unpivot multiplies rows by the measure count — do it
    AFTER filters, never before a join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "charge_kind",
        "amount",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("charge_kind", "^l_", "").alias("charge_kind"),
        F.round("amount", 2).alias("amount"),
    )


@query(
    "burst_dedup_events",
    """
    WITH e AS (
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                            OR tus - lag(tus) OVER w > 86400000000
                       THEN 1 ELSE 0 END AS nb
        FROM e WINDOW w AS (PARTITION BY user_id, event_type
                            ORDER BY tus, event_id)
    ),
    b AS (
        SELECT *, SUM(nb) OVER (PARTITION BY user_id, event_type
                                ORDER BY tus, event_id) AS bid
        FROM marked
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type, bid
                                     ORDER BY tus, event_id) AS rn
        FROM b
    ),
    agg AS (
        SELECT user_id, event_type, bid,
               MIN(tus) AS first_us,
               COUNT(*) AS burst_n_events,
               MAX(tus) - MIN(tus) AS burst_span_us
        FROM b GROUP BY 1, 2, 3
    )
    SELECT r.event_id, r.user_id, r.event_type,
           CAST(a.first_us AS BIGINT) AS first_us,
           CAST(a.burst_n_events AS BIGINT) AS burst_n_events,
           CAST(a.burst_span_us AS BIGINT) AS burst_span_us
    FROM ranked r
    JOIN agg a USING (user_id, event_type, bid)
    WHERE r.rn = 1
    """,
    "event burst collapse: chains of same-(user, type) events within a "
    "1-day gap keep only their first event, annotated with burst size",
    tags=("analytics", "sequences", "dedup"),
)
def q_burst_dedup_events(spark, sf_dir):
    """Retry-storm / double-fire dedup (operators/sequences.py::
    burst_dedup): the event-stream counterpart of exact document dedup —
    keep-first over gap-chained bursts per (user, type), with burst size
    and span kept for the audit trail. Chain semantics (gap to the
    PREVIOUS event) so an hour-long storm is one row. Plan is the
    sessionization shape: one exchange on the group key, two in-partition
    windows, one aggregation."""
    from pramen_spark.operators.sequences import burst_dedup

    ev = load_table(spark, sf_dir, "events")
    return burst_dedup(ev, gap_seconds=86400)


@query(
    "label_centroid_cohesion",
    """
    WITH dims AS (
        SELECT label, CAST(i AS INTEGER) AS dim,
               CAST(embedding AS DOUBLE[])[CAST(i + 1 AS INTEGER)] AS x
        FROM embeddings, unnest(range(len(embedding))) AS u(i)
    ),
    cent AS (
        SELECT label, dim, ROUND(AVG(x), 6) AS c FROM dims GROUP BY 1, 2
    ),
    carr AS (
        SELECT label, list(c ORDER BY dim) AS centroid FROM cent GROUP BY label
    ),
    scored AS (
        SELECT e.label,
               ROUND(
                   list_inner_product(CAST(e.embedding AS DOUBLE[]), c.centroid)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(c.centroid, c.centroid))),
                   6) AS cos
        FROM embeddings e JOIN carr c USING (label)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(cos), 4) AS mean_cosine,
           MIN(cos) AS min_cosine
    FROM scored GROUP BY label
    """,
    "embedding class-quality report: per-label centroid and members' "
    "mean/min cosine to their own centroid",
    tags=("similarity", "monitoring"),
)
def q_label_centroid_cohesion(spark, sf_dir):
    """Mislabeled/multi-modal class detector (operators/similarity.py::
    label_centroid_cohesion): cohesion via centroids is O(N*d) — the
    dimension explode partial-sums map-side (labels x dims rows in the
    shuffle), the KB-scale centroid table broadcasts back, and no
    vector-vector pair is ever formed (the intra-class pair matrix is
    the O(N^2) trap). Centroid dims ROUND(6) before any cosine pins the
    engines' summation-order ulps."""
    from pramen_spark.operators.similarity import label_centroid_cohesion

    e = load_table(spark, sf_dir, "embeddings")
    return label_centroid_cohesion(e)


@query(
    "hard_negatives_embeddings",
    """
    WITH q AS (
        SELECT vec_id AS query_id, label AS query_label,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
        SELECT q.query_id, q.query_label, e.vec_id AS neg_id,
               e.label AS neg_label,
               ROUND(
                   list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                   / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS cosine
        FROM embeddings e, q
        WHERE e.label <> q.query_label
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neg_id) AS rn
        FROM scored
    )
    SELECT query_id, query_label, neg_id, neg_label, cosine
    FROM ranked WHERE rn = 1
    """,
    "hard-negative mining: per query vector, the most-similar corpus "
    "vector with a different label (exact, deterministic argmax)",
    tags=("similarity", "training"),
)
def q_hard_negatives_embeddings(spark, sf_dir):
    """The contrastive-training data miner (operators/similarity.py::
    hard_negatives): every 50th vector queries for its most-similar
    DIFFERENT-label neighbor — the boundary examples that carry the
    gradient. The query set broadcasts, the corpus is read once scoring
    JVM-side (aggregate/zip_with fold — sequential like DuckDB's
    list_inner_product, so doubles match bit-for-bit), and the argmax is
    a lexicographic struct MAX: map-side combined, rounded-cosine ties
    to the lowest id, no per-query window holding the corpus."""
    from pramen_spark.operators.similarity import hard_negatives

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return hard_negatives(e, queries)


@query(
    "stream_session_counts",
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
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    "Structured Streaming parity: built-in session_window (30 min gap) "
    "over a real file stream equals batch lag/cumsum sessionization",
    tags=("streaming", "sessionization"),
)
def q_stream_session_counts(spark, sf_dir):
    """The THIRD streaming parity proof, now for MERGING state (tumbling
    and hopping windows have fixed boundaries; session windows must merge
    as late events bridge gaps): Spark's built-in ``session_window`` with
    a 30-minute gap over a real file readStream, availableNow trigger,
    memory sink — checked against the batch lag->cumsum->agg twin, the
    same oracle the applyInPandasWithState custom operator
    (streaming/stream.py::sessionize) is tested against. Bounds are
    aggregated as min/max event micros (session_window's own window.end
    adds the gap padding by definition — the raw extrema are the
    engine-portable form).

    Scale: session state is per-user and merges in the state store;
    watermarking (dropped here: bounded availableNow input, complete
    mode) bounds it on an unbounded stream."""
    from pramen_spark.streaming.stream import read_file_stream

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    glob_path = f"{sf_dir}/events.parque[t]"
    stream = read_file_stream(spark, glob_path, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = (
        stream.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("session_end_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    sink = "stream_session_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        "user_id", "session_start_us", "session_end_us", "n_events"
    )


@query(
    "winsorize_lineitem",
    """
    WITH b AS (
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
               ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        FROM lineitem GROUP BY l_returnflag
    ),
    w AS (
        SELECT l.l_returnflag,
               LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi) AS vw,
               l.l_extendedprice < b.lo AS clo,
               l.l_extendedprice > b.hi AS chi
        FROM lineitem l JOIN b USING (l_returnflag)
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN clo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN chi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           ROUND(AVG(vw), 4) AS avg_winsorized
    FROM w GROUP BY l_returnflag
    """,
    "per-group winsorization at exact p05/p95: clip counts and the tamed "
    "mean",
    tags=("validation", "monitoring"),
)
def q_winsorize_lineitem(spark, sf_dir):
    """Outlier taming before averaging (operators/sampling.py::
    winsorize): per-returnflag exact p05/p95 bounds from ONE map-side-
    combined percentile aggregation, broadcast back, values clipped
    against the ROUND(6) bounds so the clip decision is ulp-proof on
    both engines. No window, no sort of raw rows; the summary shows how
    much mass the tails held."""
    from pramen_spark.operators.sampling import winsorize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    w = winsorize(li, "l_extendedprice", 0.05, 0.95, group_col="l_returnflag")
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("clipped_low").cast("long")).cast("long").alias("n_low"),
        F.sum(F.col("clipped_high").cast("long")).cast("long").alias("n_high"),
        F.round(F.avg("l_extendedprice_w"), 4).alias("avg_winsorized"),
    )


@query(
    "orphan_audit_lineitem",
    """
    WITH parent AS (
        SELECT DISTINCT o_orderkey AS l_orderkey FROM orders
        WHERE o_orderstatus = 'O'
    ),
    childkeys AS (SELECT DISTINCT l_orderkey FROM lineitem)
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT l_orderkey FROM parent))
               AS n_orphan_child,
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O')
               AS n_parent,
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O'
            AND o_orderkey NOT IN (SELECT l_orderkey FROM childkeys))
               AS n_childless_parent
    """,
    "referential-integrity audit: orphaned fact rows and childless "
    "dimension rows between lineitem and the open-orders subset",
    tags=("validation", "monitoring"),
)
def q_orphan_audit_lineitem(spark, sf_dir):
    """The join-silently-drops-rows detector (operators/validation.py::
    orphan_audit): lineitem audited against the OPEN orders subset (a
    deliberately incomplete parent so both orphan directions are
    non-trivial). Two anti-join counts plus two count-only scans fold
    into one lazy row via broadcast loop joins — at 100 TB this is the
    difference between "the join ran" and "we know we dropped 2% of
    revenue"."""
    from pramen_spark.operators.validation import orphan_audit

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return orphan_audit(li, o, ["l_orderkey"])


@query(
    "triangle_count_suppliers",
    """
    WITH pairs AS (
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    co AS (SELECT s1, s2, COUNT(*) AS c FROM pairs GROUP BY s1, s2),
    thr AS (SELECT ROUND(quantile_cont(c, 0.95), 6) AS t FROM co),
    edges AS (SELECT s1 AS a, s2 AS b FROM co, thr WHERE c >= t),
    deg AS (
        SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
        GROUP BY v
    ),
    o AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                    THEN e.a ELSE e.b END AS u,
               CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                    THEN e.b ELSE e.a END AS w
        FROM edges e
        JOIN deg da ON da.v = e.a
        JOIN deg db ON db.v = e.b
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*)
            FROM o e1 JOIN o e2 ON e1.w = e2.u
            JOIN o e3 ON e3.u = e1.u AND e3.w = e2.w) AS n_triangles
    """,
    "exact degree-ordered triangle count over the strong co-supply "
    "graph (suppliers co-occurring in the top-5% of shared orders)",
    tags=("graph",),
)
def q_triangle_count_suppliers(spark, sf_dir):
    """Graph cohesion done scale-right (operators/graph.py::
    triangle_count): supplier pairs co-occurring in >= the p95 shared-
    order count form the strong co-supply graph; edges orient from the
    (degree, id)-smaller endpoint so each triangle is counted exactly
    once AND every out-neighborhood is O(sqrt(E)) — the wedge join
    cannot explode on a hub (Suri & Vassilvitskii's "last reducer"
    problem). Pair generation explodes per-order supplier SETS (JVM-side
    ordered pairs, ~C(7,2) rows per order), never a raw self-join of
    lineitem."""
    from pramen_spark.operators.dedup import _ordered_pairs
    from pramen_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    co = (
        per_order.select(F.explode(_ordered_pairs(F.col("ss"))).alias("p"))
        .groupBy(F.col("p.id_a").alias("s1"), F.col("p.id_b").alias("s2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    thr = co.agg(F.round(F.percentile(F.col("c"), F.lit(0.95)), 6).alias("t"))
    edges = co.crossJoin(F.broadcast(thr)).filter(F.col("c") >= F.col("t"))
    return triangle_count(edges, src="s1", dst="s2")


@query(
    "langid_confusion_documents",
    f"""
    WITH pred AS ({_LANG_ID_ORACLE})
    SELECT d.lang, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    """,
    "language-ID confusion matrix: labeled lang vs stopword-vote "
    "prediction, one count per (truth, predicted) cell",
    tags=("text", "monitoring"),
)
def q_langid_confusion_documents(spark, sf_dir):
    """Classifier quality audit without leaving the engine
    (operators/text.py::language_id vs the labeled lang column): the
    confusion matrix is the first artifact a curation team checks before
    trusting a filter at 100 TB. The prediction is the same zero-shuffle
    stopword vote lang_id runs; one extra co-keyed join against the
    labels and one map-side-combined count."""
    from pramen_spark.operators.text import language_id

    d = load_table(spark, sf_dir, "documents")
    pred = language_id(d).select("doc_id", "lang_pred")
    truth = d.select("doc_id", "lang")
    return truth.join(pred, "doc_id").groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@query(
    "time_to_convert_events",
    """
    WITH s AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS rn
        FROM events WHERE event_type = 'signup'
    ),
    starts AS (SELECT user_id, us AS start_us, event_id AS start_event_id
               FROM s WHERE rn = 1),
    e AS (
        SELECT e.user_id, epoch_us(CAST(e.ts AS TIMESTAMP)) AS us,
               e.event_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id)
                   AS rn
        FROM events e JOIN starts st ON e.user_id = st.user_id
        WHERE e.event_type = 'purchase'
          AND (epoch_us(CAST(e.ts AS TIMESTAMP)) > st.start_us
               OR (epoch_us(CAST(e.ts AS TIMESTAMP)) = st.start_us
                   AND e.event_id > st.start_event_id))
    )
    SELECT st.user_id,
           CAST(st.start_us AS BIGINT) AS start_us,
           st.start_event_id,
           CAST(e.us AS BIGINT) AS convert_us,
           e.event_id AS convert_event_id,
           CAST(e.us - st.start_us AS BIGINT) AS gap_us
    FROM starts st LEFT JOIN e ON st.user_id = e.user_id AND e.rn = 1
    """,
    "conversion latency: first signup to first subsequent purchase per "
    "user, microsecond-exact, NULLs for never-converted",
    tags=("analytics", "sequences"),
)
def q_time_to_convert_events(spark, sf_dir):
    """The funnel's latency complement (operators/sequences.py::
    time_to_convert): first signup and first strictly-later purchase per
    user via MIN-over-struct argmins — two filtered map-side-combined
    aggregations and one user-keyed join; no window over the raw stream,
    no stream self-join. Never-converted users keep NULL conversion
    columns for downstream survival analysis."""
    from pramen_spark.operators.sequences import time_to_convert

    ev = load_table(spark, sf_dir, "events")
    return time_to_convert(ev, "signup", "purchase")


@query(
    "prefix_filter_jaccard_pairs",
    _ngram_shingle_oracle(0.3),
    "exact threshold-Jaccard pairs via AllPairs/PPJoin prefix filtering: "
    "only each doc's rarest n - ceil(t*n) + 1 shingles generate candidates",
    tags=("dedup", "scale"),
)
def q_prefix_filter_jaccard_pairs(spark, sf_dir):
    """The high-threshold exact-dup path that beats both co-occurrence
    pairing and LSH (operators/dedup.py::prefix_filter_jaccard_pairs):
    order shingles rarest-first, expose only the provably-sufficient
    prefix as join keys (two sets at Jaccard >= t share their smallest
    common shingle inside BOTH prefixes — the AllPairs lemma), verify
    survivors by array intersection. Must reproduce the brute-force
    oracle EXACTLY — same pair set, same jaccard values — while the
    candidate stream touches only rare shingles. The third member of the
    exact-jaccard family (ngram_jaccard_pairs = co-occurrence, minhash =
    probabilistic), sharing their oracle at t=0.3."""
    from pramen_spark.operators.dedup import prefix_filter_jaccard_pairs

    d = load_documents_spread(spark, sf_dir)
    return prefix_filter_jaccard_pairs(
        d, shingle_size=3, threshold=0.3, max_shingle_freq=1000
    )


@query(
    "attribution_events",
    """
    WITH ordered AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END IGNORE NULLS) OVER w AS t_id,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER w AS t_type,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
                   OVER w AS t_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
                     event_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(epoch_us(ts) AS BIGINT) AS conversion_us,
           CASE WHEN ok THEN t_id END AS touch_event_id,
           CASE WHEN ok THEN t_type END AS touch_type,
           CASE WHEN ok THEN CAST(epoch_us(t_ts) AS BIGINT) END AS touch_us,
           CASE WHEN ok THEN epoch_us(ts) - epoch_us(t_ts) END AS gap_us
    FROM (SELECT *, t_ts IS NOT NULL
                    AND epoch_us(ts) - epoch_us(t_ts) <= 604800000000 AS ok
          FROM ordered)
    WHERE event_type = 'purchase'
    """,
    "last-touch attribution: each purchase credited to the latest "
    "preceding click/view by the same user within 7 days",
    tags=("analytics", "sequences"),
)
def q_attribution_events(spark, sf_dir):
    """Which touch gets credit (operators/sequences.py::
    last_touch_attribution): ONE window pass per user carries the running
    last-touch struct via last(ignorenulls) — never a conversions-vs-
    history self-join (which shuffles events twice and explodes on hot
    users). Strict (ts, event_id) ordering makes same-timestamp behavior
    deterministic; the 7-day window applies microsecond-exact to the one
    carried candidate, which IS last-touch semantics (an older in-window
    touch never outranks a newer one)."""
    from pramen_spark.operators.sequences import last_touch_attribution

    ev = load_table(spark, sf_dir, "events")
    out = last_touch_attribution(
        ev, ["click", "view"], "purchase", window_seconds=7 * 86400
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("conversion_ts").alias("conversion_us"),
        "touch_event_id",
        "touch_type",
        F.unix_micros("touch_ts").alias("touch_us"),
        "gap_us",
    )


@query(
    "rank_normalize_documents",
    """
    SELECT doc_id, lang, n_chars,
           ROUND(percent_rank() OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS rank_unit
    FROM documents
    """,
    "per-language percent-rank calibration of a score column to [0,1]",
    tags=("sampling", "training"),
)
def q_rank_normalize_documents(spark, sf_dir):
    """Cross-source score calibration (operators/sampling.py::
    rank_normalize): raw scores from heterogeneous scorers aren't
    comparable, rank positions are — percent_rank over (score, id) per
    language, the input a global mixture/curriculum decision actually
    wants. One hash-partitioned per-group window; Spark and DuckDB share
    the (rank-1)/(n-1) definition so the unit is oracle-exact."""
    from pramen_spark.operators.sampling import rank_normalize

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return rank_normalize(d, "n_chars", "doc_id", partition_col="lang")


@query(
    "quota_split_documents",
    """
    WITH u AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'quota'), 1, 8))
                   ::BIGINT / 4294967296.0 AS uu
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY uu, doc_id)
                   AS rn
        FROM u
    )
    SELECT doc_id, lang,
           CASE WHEN rn <= 40 THEN 'val'
                WHEN rn <= 80 THEN 'test'
                ELSE 'train' END AS split
    FROM ranked
    """,
    "exact-count eval carving: the first N docs of the deterministic md5 "
    "order per language go to val/test, the rest to train",
    tags=("sampling", "training"),
)
def q_quota_split_documents(spark, sf_dir):
    """Exact-COUNT splits where hash_split gives exact probabilities
    (operators/sampling.py::quota_split): exactly 40 val + 40 test docs
    per language, assigned by row_number over the salted-md5 order —
    reproducible across runs and engines, bounded churn under corpus
    growth (only quota-boundary displacement). One per-group window; the
    grouped path is the designed scale path."""
    from pramen_spark.operators.sampling import quota_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return quota_split(
        d, {"val": 40, "test": 40}, key_col="doc_id", group_col="lang"
    ).select("doc_id", "lang", "split")


@query(
    "oov_rate_documents",
    """
    WITH tok AS (
        SELECT d.doc_id, t.token
        FROM documents d,
             unnest(list_filter(
                 string_split_regex(lower(d.text), '[^a-z0-9]+'),
                 x -> x != '')) AS t(token)
    ),
    df_t AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    vocab AS (SELECT token FROM df_t ORDER BY df DESC, token LIMIT 500),
    cnt AS (
        SELECT d.doc_id,
               COUNT(t.token) AS n_tokens,
               COALESCE(SUM(CASE WHEN t.token IS NOT NULL AND v.token IS NULL
                                 THEN 1 ELSE 0 END), 0) AS n_oov
        FROM documents d
        LEFT JOIN tok t ON d.doc_id = t.doc_id
        LEFT JOIN vocab v ON t.token = v.token
        GROUP BY d.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CASE WHEN n_tokens > 0
                THEN ROUND(n_oov * 1.0 / n_tokens, 6) END AS oov_rate
    FROM cnt
    """,
    "vocabulary-coverage audit: per-document OOV token share against the "
    "corpus top-500 document-frequency vocabulary",
    tags=("text", "training"),
)
def q_oov_rate_documents(spark, sf_dir):
    """How much of each document a fixed tokenizer would shatter
    (operators/text.py::oov_rate): document frequency aggregates map-side
    over (token, doc) pairs, the top-500 vocabulary plans as
    TakeOrderedAndProject (never a global sort) and broadcasts into the
    scoring join, and per-doc occurrence counts re-aggregate on the id.
    High OOV flags wrong-language leakage and encoding damage; the
    per-source profile is a standard pre-training corpus report."""
    from pramen_spark.operators.text import oov_rate

    d = load_documents_spread(spark, sf_dir)
    return oov_rate(d, vocab_size=500)


@query(
    "ks_drift_events",
    """
    WITH t AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
               CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 49) AS BIGINT)
                   AS bucket
        FROM events WHERE value IS NOT NULL
    ),
    h AS (
        SELECT bucket,
               SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM t GROUP BY bucket
    ),
    cdf AS (
        SELECT SUM(n_ref) OVER (ORDER BY bucket) AS c_ref,
               SUM(n_cur) OVER (ORDER BY bucket) AS c_cur,
               SUM(n_ref) OVER () AS t_ref,
               SUM(n_cur) OVER () AS t_cur
        FROM h
    )
    SELECT ROUND(MAX(ABS(c_ref * 1.0 / t_ref - c_cur * 1.0 / t_cur)), 6)
               AS ks_stat,
           CAST(MAX(t_ref) AS BIGINT) AS n_ref,
           CAST(MAX(t_cur) AS BIGINT) AS n_cur
    FROM cdf
    """,
    "binned two-sample Kolmogorov-Smirnov drift statistic between two "
    "event populations",
    tags=("drift", "monitoring"),
)
def q_ks_drift_events(spark, sf_dir):
    """The worst-CDF-gap drift test (operators/drift.py::ks_binned),
    complementing PSI's bucket-weighted score: both event halves (by id
    parity) histogram in one map-side-combined pass each, the CDFs
    cumulate over the 50-bucket grid, and the max gap is order-free.
    Exact KS would need a global sort of both samples; the binned form is
    the version that exists at 100 TB, and every post-histogram stage
    runs on bucket summaries only."""
    from pramen_spark.operators.drift import ks_binned

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return ks_binned(ref, cur, "value", 0.0, 500.0, num_buckets=50)


@query(
    "chi2_drift_events",
    """
    WITH t AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
               event_type AS category
        FROM events WHERE event_type IS NOT NULL
    ),
    h AS (
        SELECT category,
               SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM t GROUP BY category
    ),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM h)
    SELECT category,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(
               POW(n_ref - (n_ref + n_cur) * 1.0 * t_ref / (t_ref + t_cur), 2)
                   / ((n_ref + n_cur) * 1.0 * t_ref / (t_ref + t_cur))
               + POW(n_cur - (n_ref + n_cur) * 1.0 * t_cur / (t_ref + t_cur), 2)
                   / ((n_ref + n_cur) * 1.0 * t_cur / (t_ref + t_cur)), 6)
               AS contrib
    FROM h, tot
    """,
    "chi-square drift decomposition for a categorical column: "
    "per-category contribution vs the pooled expectation",
    tags=("drift", "monitoring"),
)
def q_chi2_drift_events(spark, sf_dir):
    """WHICH category moved (operators/drift.py::chi2_categorical): the
    per-category chi-square contributions against pooled expectations,
    the categorical sibling of PSI/KS. One count per side, a full-outer
    join on the category set, four broadcast scalars; contributions stay
    per-row so the oracle never sums doubles in engine-dependent order."""
    from pramen_spark.operators.drift import chi2_categorical

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return chi2_categorical(ref, cur, "event_type")


@query(
    "image_dimensions_documents",
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'gif' END AS image_format,
           CAST(16 + doc_id % 317 AS INTEGER) AS width,
           CAST(16 + (doc_id * 7) % 211 AS INTEGER) AS height
    FROM documents
    """,
    "REAL image header decode: PNG IHDR / JPEG SOF / GIF descriptors "
    "written by an independent encoder, parsed back by the byte walker",
    tags=("multimodal",),
)
def q_image_dimensions_documents(spark, sf_dir):
    """The multimodal decode that IS implementable without media libs
    (operators/multimodal.py::parse_image_header + image_dimensions):
    each document id deterministically derives (format, width, height);
    encode_image_header writes a well-formed PNG/JPEG/GIF header from the
    format specs (struct-packed, CRC'd IHDR, a JFIF APP0 the JPEG walker
    must skip), and image_dimensions parses the bytes back through the
    Arrow-batched mapInPandas path. The oracle recomputes the dims from
    the id arithmetic alone — a parser/encoder disagreement on any of the
    three formats breaks the match. Both stages are pure maps: no
    shuffle; blobs never leave their partition."""
    from pramen_spark.operators.multimodal import (
        encode_image_header,
        image_dimensions,
    )
    from pyspark.sql import types as T
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    enc_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    fmts = ["png", "jpeg", "gif"]

    def encode(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        encode_image_header(
                            fmts[i % 3], int(16 + i % 317), int(16 + (i * 7) % 211)
                        )
                        for i in ids
                    ],
                }
            )

    media = d.mapInPandas(encode, enc_schema)
    return image_dimensions(media).select(
        F.col("media_id").alias("doc_id"), "image_format", "width", "height"
    )


@query(
    "curriculum_global_documents",
    """
    WITH b AS (
        SELECT list_transform(
                   quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                   x -> ROUND(x, 6)) AS bounds
        FROM documents
    ),
    assigned AS (
        SELECT d.doc_id, d.n_chars,
               CAST(1 + len(list_filter(
                   b.bounds, x -> CAST(d.n_chars AS DOUBLE) > x))
                    AS INTEGER) AS bucket
        FROM documents d, b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           ROUND(SUM(CAST(n_chars AS DECIMAL(18,0)))
                 / COUNT(*), 4) AS avg_chars
    FROM assigned GROUP BY bucket
    """,
    "scale-safe GLOBAL curriculum deciles: quantile thresholds from one "
    "aggregate + a broadcast comparison — no single-partition NTILE sort",
    tags=("sampling", "training", "scale"),
)
def q_curriculum_global_documents(spark, sf_dir):
    """The corpus-sized answer to curriculum_buckets' unpartitioned
    hazard (operators/sampling.py::curriculum_thresholds): the nine
    interior decile boundaries come from ONE exact-percentile aggregate
    (map-side combined to a single row — DuckDB quantile_cont computes
    the identical interpolation, ROUND(6) on both engines kills any ulp),
    the 1-row boundary array broadcasts, and bucket assignment is a pure
    codegen'd strict-> comparison count. No Window node anywhere; a
    plan test asserts it. Occupancy is even only up to score ties —
    the documented price of removing the global sort."""
    from pramen_spark.operators.sampling import curriculum_thresholds

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = curriculum_thresholds(d, "n_chars", n_buckets=10)
    return b.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            / F.count(F.lit(1)),
            4,
        )
        .cast("double")
        .alias("avg_chars"),
    )


@query(
    "salted_agg_lineitem",
    """
    WITH t AS (
        SELECT CASE WHEN l_suppkey % 10 = 0 THEN 0 ELSE l_suppkey END
                   AS skew_key,
               l_quantity, l_extendedprice, CAST(l_shipdate AS DATE) AS sd
        FROM lineitem
    )
    SELECT skew_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           MIN(sd) AS min_shipdate,
           MAX(sd) AS max_shipdate
    FROM t GROUP BY skew_key
    """,
    "skew-safe two-phase aggregation: salted (key, salt) partials merged "
    "on key equal the plain GROUP BY on a deliberately hot key",
    tags=("skew", "scale"),
)
def q_salted_agg_lineitem(spark, sf_dir):
    """Skew ACTION, not just measurement (operators/skew.py::salted_agg,
    closing the loop key_skew_profile opened): ``skew_key`` deliberately
    funnels every 10th supplier's lineitems onto one hot key (~10% of the
    table on one reducer in a plain groupBy). recommend_salts profiles
    the key (one control-plane summary row) and picks the salt count;
    salted_agg then aggregates on (key, salt) — the hot key spreads over
    that many reducers — and merges partials on the key alone. The merge
    exchange carries n_keys*n_salts pre-aggregated rows, noise at any
    scale. Sums run in DECIMAL so the salted result is bit-identical to
    the oracle's one-phase GROUP BY."""
    from pramen_spark.operators.skew import recommend_salts, salted_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_suppkey") % 10 == 0, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .alias("skew_key"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.to_date("l_shipdate").alias("sd"),
    )
    n_salts = recommend_salts(li, "skew_key")
    agg = salted_agg(
        li,
        ["skew_key"],
        sum_cols=["qty", "price"],
        min_cols=["sd"],
        max_cols=["sd"],
        n_salts=n_salts,
    )
    return agg.select(
        "skew_key",
        "n_rows",
        F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("sum_price").cast("double"), 2).alias("sum_price"),
        F.col("min_sd").alias("min_shipdate"),
        F.col("max_sd").alias("max_shipdate"),
    )


@query(
    "salted_join_lineitem",
    """
    WITH t AS (
        SELECT CASE WHEN l_suppkey % 10 = 0 THEN 0 ELSE l_suppkey END
                   AS skew_key,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty
        FROM lineitem
    ),
    d AS (
        SELECT skew_key, COUNT(*) AS n, SUM(qty) AS s
        FROM t GROUP BY skew_key
    )
    SELECT t.skew_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN t.qty * d.n > d.s THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_avg
    FROM t JOIN d USING (skew_key)
    GROUP BY t.skew_key
    """,
    "salt-replicated join: fact side salted, per-key aggregate side "
    "replicated per salt; equals the plain join on a deliberately hot key",
    tags=("skew", "scale"),
)
def q_salted_join_lineitem(spark, sf_dir):
    """The join-side skew remedy (operators/skew.py::salted_join) composed
    with salted_agg: the per-key dimension (count + exact DECIMAL sum —
    avg as a ratio, never a float) is built by the two-phase salted
    aggregation, then joined back to the salted fact side on
    (key, salt) — the hot key's probe rows spread across the salt space,
    each salt joining its own replica of the (tiny) dim row. The
    above-average test multiplies through by the count
    (qty * n > sum) so both engines compare exact decimals — no
    float-boundary flakes. Use when the dim side is over the broadcast
    cap AND the fact key is hot; replication cost = n_salts * |dim|."""
    from pramen_spark.operators.skew import salted_agg, salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_suppkey") % 10 == 0, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .alias("skew_key"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    dim = salted_agg(li, ["skew_key"], sum_cols=["qty"], n_salts=8).select(
        "skew_key",
        F.col("n_rows").alias("_n"),
        F.col("sum_qty").alias("_s"),
    )
    joined = salted_join(li, dim, ["skew_key"], n_salts=8)
    return joined.groupBy("skew_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("qty") * F.col("_n") > F.col("_s")).cast("long"))
        .cast("long")
        .alias("n_above_avg"),
    )


@query(
    "bloom_prune_join_lineitem",
    """
    SELECT s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal > 5000
    GROUP BY s_suppkey
    """,
    "bloom-pruned join: lineitem filtered through a 16 KiB bitmap of the "
    "rich-supplier keys before the join shuffle; result exactly equals "
    "the plain join",
    tags=("scale", "join"),
)
def q_bloom_prune_join_lineitem(spark, sf_dir):
    """The explicit bloom-filter join (operators/joins.py::
    bloom_prune_join — Spark's runtime row-level bloom filter made
    persistent and cross-stage): the dim side folds its keys into a
    CONSTANT 16 KiB bitmap (distributed bit_or build, <= 2048 words
    reach the driver regardless of dim size), the fact scan probes it
    with pure-codegen xxhash64 + bit math BEFORE its join exchange, and
    the join itself removes the bloom's false positives — so the oracle
    is simply the unpruned join. At 100 TB a selective dim prunes >99%
    of the fact shuffle at O(bitmap) memory, where a broadcast join
    would hold O(|dim|) per executor."""
    from pramen_spark.operators.joins import bloom_prune_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") > 5000
    )
    joined = bloom_prune_join(li, dim, "l_suppkey", "s_suppkey")
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "approx_quantile_contract_lineitem",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
           TRUE AS p50_within, TRUE AS p90_within
    FROM lineitem GROUP BY l_returnflag
    """,
    "sketch-accuracy contract: approx_percentile (accuracy 10000) must "
    "land inside the exact +-0.1%-rank quantile envelope per return flag",
    tags=("sketch", "monitoring"),
)
def q_approx_quantile_contract_lineitem(spark, sf_dir):
    """The quantile twin of hll_accuracy_events: the Greenwald-Khanna
    sketch behind approx_percentile guarantees rank error <= n/accuracy
    (1e-4 here); the contract pins each approximate quantile inside the
    EXACT interpolated quantiles at q +- 0.001 — a 10x margin that still
    fails on real estimator drift. Both sides come from one aggregation
    pass; the oracle recomputes the exact envelope and asserts the
    booleans TRUE, so a sketch regression fails correctness, not just a
    dashboard. At 100 TB only the sketch side survives (exact grouped
    percentiles sort each group); the contract is what licenses that
    swap."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.array(*[F.lit(x) for x in (0.5, 0.9, 0.499, 0.501, 0.899, 0.901)])
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_extendedprice"), qs).alias("ex"),
        F.percentile_approx(
            F.col("l_extendedprice"), F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("ap"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.element_at("ex", 1), 4).alias("p50_exact"),
        F.round(F.element_at("ex", 2), 4).alias("p90_exact"),
        F.element_at("ap", 1).between(
            F.element_at("ex", 3), F.element_at("ex", 4)
        ).alias("p50_within"),
        F.element_at("ap", 2).between(
            F.element_at("ex", 5), F.element_at("ex", 6)
        ).alias("p90_within"),
    )


@query(
    "assoc_pairs_orders",
    """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT basket) AS DOUBLE) AS n_baskets
            FROM baskets),
    ic AS (SELECT item, COUNT(*) AS item_count FROM baskets GROUP BY item),
    freq AS (SELECT item, item_count FROM ic, tot
             WHERE item_count >= n_baskets * 0.05),
    kept AS (SELECT b.basket, b.item, f.item_count
             FROM baskets b JOIN freq f USING (item)),
    pairs AS (
        SELECT a.item AS brand_a, b.item AS brand_b,
               a.item_count AS count_a, b.item_count AS count_b,
               CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM kept a JOIN kept b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2, 3, 4
    )
    SELECT brand_a, brand_b, pair_count,
           ROUND(pair_count / n_baskets, 6) AS support,
           ROUND(CAST(pair_count AS DOUBLE) / count_a, 6) AS conf_a_b,
           ROUND(pair_count * n_baskets
                 / (CAST(count_a AS DOUBLE) * count_b), 6) AS lift
    FROM pairs, tot
    ORDER BY pair_count DESC, brand_a, brand_b
    LIMIT 30
    """,
    "market-basket association rules: Apriori-pruned brand pairs per "
    "order with support, confidence and lift (top-30 by co-occurrence)",
    tags=("analytics", "itemsets"),
)
def q_assoc_pairs_orders(spark, sf_dir):
    """Frequent-pair mining (operators/itemsets.py::basket_pairs):
    orders are baskets, part brands are items. The Apriori lemma prunes
    items below 5% support BEFORE any pair forms, the pair self-join is
    CO-KEYED on the order key (one hash partitioning, quadratic only
    within a basket and only over frequent items), and supports derive
    from a broadcast 1-row total — no corpus-wide cross product at any
    scale. The frequent-item build side is bounded by
    avg_basket_size / min_support rows, so its broadcast is KB-scale
    however large the log grows."""
    from pramen_spark.operators.itemsets import basket_pairs

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select("l_orderkey", "p_brand")
    pairs = basket_pairs(baskets, "l_orderkey", "p_brand", min_support=0.05)
    return (
        pairs.select(
            F.col("item_a").alias("brand_a"),
            F.col("item_b").alias("brand_b"),
            "pair_count",
            F.round("support", 6).alias("support"),
            F.round("confidence_a_to_b", 6).alias("conf_a_b"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy(F.desc("pair_count"), "brand_a", "brand_b")
        .limit(30)
    )


@query(
    "k_anonymity_customers",
    """
    WITH g AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer GROUP BY 1, 2
    )
    SELECT group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_rows,
           group_size < 5 AS below_k
    FROM g GROUP BY group_size
    """,
    "k-anonymity audit: group-size profile of the (segment, nation) "
    "quasi-identifier — min size is the dataset's k; below-k rows are "
    "the re-identification exposure",
    tags=("privacy", "validation"),
)
def q_k_anonymity_customers(spark, sf_dir):
    """The privacy gate next to redact_pii (operators/validation.py::
    k_anonymity_audit): every (mktsegment, nationkey) combination's
    population, histogrammed by group size — min(group_size) IS the
    release's k-anonymity level, and the below_k rows quantify exactly
    what a suppress-below-k policy drops. Two map-side-combined
    aggregations (QI combination, then the tiny size domain); no window,
    no join, one scan — the shape is identical at 100 TB because the
    second aggregate's input is one row per QI combination."""
    from pramen_spark.operators.validation import k_anonymity_audit

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity_audit(cust, ["c_mktsegment", "c_nationkey"], k=5)


@query(
    "token_entropy_documents",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS token
        FROM documents
    ),
    c AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               SUM(c * log2(c)) AS s
        FROM c GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_types,
           ROUND(log2(n_tokens) - s / n_tokens, 6) AS entropy,
           CASE WHEN n_types > 1
                THEN ROUND((log2(n_tokens) - s / n_tokens) / log2(n_types), 6)
           END AS norm_entropy
    FROM agg
    """,
    "per-document Shannon entropy of the token distribution (information "
    "density), plus type count and normalized entropy",
    tags=("text", "quality"),
)
def q_token_entropy_documents(spark, sf_dir):
    """Information-density quality signal (operators/text.py::
    token_entropy): H = log2(N) - sum(c*log2 c)/N over per-document
    token counts — low entropy flags keyword stuffing and shuffled
    boilerplate that repetition_stats' verbatim-run detector misses.
    Two map-side-combined aggregations keyed (doc, token) then doc; the
    explode amplification runs on the spread input like every shingling
    consumer; no window, no join, no driver state — the per-document
    fold is embarrassingly parallel at any corpus size."""
    from pramen_spark.operators.text import token_entropy

    return token_entropy(load_documents_spread(spark, sf_dir))


@query(
    "mutual_info_events",
    """
    WITH joint AS (
        SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
               CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(n_xy) AS n_x FROM joint GROUP BY x),
    my AS (SELECT y, SUM(n_xy) AS n_y FROM joint GROUP BY y),
    tot AS (SELECT SUM(n_xy) AS n FROM joint)
    SELECT x, y, n_xy,
           ROUND(log2(CAST(n_xy AS DOUBLE) * n
                      / (CAST(n_x AS DOUBLE) * n_y)), 6) AS pmi,
           ROUND(CAST(n_xy AS DOUBLE) / n
                 * log2(CAST(n_xy AS DOUBLE) * n
                        / (CAST(n_x AS DOUBLE) * n_y)), 9) AS mi_contrib
    FROM joint JOIN mx USING (x) JOIN my USING (y), tot
    """,
    "pointwise mutual information between event type and hour of day; "
    "SUM(mi_contrib) is the MI in bits (feature/leakage screen)",
    tags=("analytics", "drift"),
)
def q_mutual_info_events(spark, sf_dir):
    """Information-theoretic dependence screen (operators/drift.py::
    mutual_information): PMI per (event_type, hour) cell plus each
    cell's MI contribution — the feature-selection / label-leakage
    measure beside chi2_categorical's significance test. ONE shuffle
    (the contingency aggregation, map-side combined); marginals and the
    grand total re-aggregate the KB-scale contingency table and join
    back broadcast — the raw log is scanned once at any scale."""
    from pramen_spark.operators.drift import mutual_information

    ev = load_events(spark, sf_dir).select(
        "event_type", F.hour("ts").cast("long").alias("hour")
    )
    out = mutual_information(ev, "event_type", "hour")
    return out.select(
        F.col("x"), F.col("y"), "n_xy", "pmi", "mi_contrib"
    )


@query(
    "covariance_embeddings",
    """
    WITH p AS (
        SELECT CAST(t1.i AS BIGINT) AS i, CAST(t2.j AS BIGINT) AS j
        FROM range(1, 9) t1(i), range(1, 9) t2(j) WHERE t1.i <= t2.j
    )
    SELECT i, j,
           ROUND(covar_pop(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE),
                           CAST(embedding[CAST(j AS INTEGER)] AS DOUBLE)),
                 6) AS cov
    FROM embeddings, p GROUP BY i, j
    """,
    "upper-triangular covariance of the first 8 embedding dimensions in "
    "one aggregation pass (pre-whitening feature audit)",
    tags=("similarity", "analytics"),
)
def q_covariance_embeddings(spark, sf_dir):
    """The feature-correlation audit before whitening/PCA
    (operators/similarity.py::covariance_matrix): all 36 upper-triangle
    covariances of dims 1-8 as parallel map-side-combined covar_pop
    expressions in ONE aggregation — no explode, no self-join, the
    vectors shuffle nowhere; the unpivot to (i, j, cov) runs on the
    single result row. Full high-d matrices switch to the blocked-numpy
    Gram path (X^T X partials over Arrow batches) documented on the
    operator."""
    from pramen_spark.operators.similarity import covariance_matrix

    return covariance_matrix(
        load_table(spark, sf_dir, "embeddings"), "embedding", tuple(range(1, 9))
    )


@query(
    "kmeans_step_embeddings",
    """
    WITH seeds AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
        FROM embeddings WHERE vec_id IN (1, 2, 3, 4)
    ),
    dists AS (
        SELECT e.vec_id, s.cid, CAST(e.embedding AS DOUBLE[]) AS v,
               list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        - s.c[CAST(i AS INTEGER)]) AS d
        FROM embeddings e, seeds s
    ),
    assign AS (
        SELECT vec_id, cid, v, list_inner_product(d, d) AS dist2,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id
                   ORDER BY list_inner_product(d, d), cid) AS rn
        FROM dists
    )
    SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(SUM(dist2), 4) AS inertia,
           ROUND(AVG(v[1]), 6) AS c1, ROUND(AVG(v[2]), 6) AS c2,
           ROUND(AVG(v[3]), 6) AS c3, ROUND(AVG(v[4]), 6) AS c4
    FROM assign WHERE rn = 1 GROUP BY cid
    """,
    "one distributed Lloyd iteration: nearest-centroid assignment from "
    "4 seed vectors + per-cluster size, inertia and re-estimated "
    "centroid head",
    tags=("similarity", "clustering"),
)
def q_kmeans_step_embeddings(spark, sf_dir):
    """Distributed k-means (operators/similarity.py::kmeans_step — the
    Lloyd iteration IVF's coarse quantizer needs at corpus scale, where
    the driver-sample training shortcut stops being representative):
    centroids are a k-row control-plane table inlined as literals, so
    ASSIGNMENT IS A ZERO-SHUFFLE MAP — k sequential-fold distance
    expressions per row (the fold order DuckDB's list_inner_product
    uses, so the oracle reproduces every double bit-for-bit) with
    array_min tie-broken on centroid id; re-estimation is one
    map-side-combined aggregate of k*d partial sums. Per iteration at
    100 TB: one job, one k*d-row shuffle, vectors never join."""
    from pramen_spark.operators.similarity import kmeans_step

    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.where(F.col("vec_id").isin(1, 2, 3, 4)).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    return kmeans_step(e, seeds)


@query(
    "edit_distance_pairs_documents",
    """
    WITH n AS (
        SELECT doc_id, lang,
               substr(lower(trim(text)), 1, 16) AS blk,
               substr(lower(trim(text)), 1, 200) AS head
        FROM documents WHERE trim(text) <> ''
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
    FROM n a JOIN n b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 40
    """,
    "blocked Levenshtein near-duplicate pairs: same (lang, 16-char "
    "prefix) block, exact edit distance <= 40 on the 200-char head",
    tags=("dedup", "linkage"),
)
def q_edit_distance_pairs_documents(spark, sf_dir):
    """The record-linkage string-similarity join (operators/dedup.py::
    edit_distance_pairs): standard blocking on (lang, normalized
    16-char prefix), then exact codegen'd Levenshtein on bounded
    200-char heads — catches single-character-edit duplicates that
    shingle Jaccard barely moves. The self-join is CO-KEYED on the
    block (one hash partition, quadratic only within a block); the
    prefix block trades recall for join size exactly like LSH banding
    (early-edit duplicates are the MinHash pass's job). The O(n*m) DP
    cost is capped by head_chars^2, independent of document length."""
    from pramen_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "dp_counts_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_true,
           ROUND(COUNT(*)
                 + -(CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * LEAST(ABS(u - 0.5), 0.5 - 1e-12))
                   / 1.0, 6) AS n_noisy,
           1.0 AS epsilon
    FROM (
        SELECT c_mktsegment,
               ('0x' || substr(md5(c_mktsegment || chr(31) || 'dp'), 1, 8))::BIGINT
               / 4294967296.0 AS u
        FROM customer
    )
    GROUP BY c_mktsegment, u
    """,
    "differentially-private release pattern: per-segment counts with "
    "deterministic seeded Laplace(1/eps) noise (eps = 1.0)",
    tags=("privacy", "validation"),
)
def q_dp_counts_customers(spark, sf_dir):
    """The release half of the privacy story (operators/validation.py::
    dp_noisy_counts, beside k_anonymity_customers' audit half): exact
    group counts plus inverse-CDF Laplace noise driven by a
    DERANDOMIZED md5-uniform of the seeded group key — deterministic so
    a re-run backfill publishes identical numbers and the oracle
    replays the noise exactly; production rotates the seed per
    publication. One map-side-combined aggregation; the noise is a pure
    column expression; sensitivity 1 => scale 1/epsilon."""
    from pramen_spark.operators.validation import dp_noisy_counts

    return dp_noisy_counts(
        load_table(spark, sf_dir, "customer"), ["c_mktsegment"],
        epsilon=1.0, seed="dp",
    )


@query(
    "cms_frequency_events",
    """
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_exact, TRUE AS overestimates, TRUE AS within_bound
    FROM c ORDER BY n_exact DESC, user_id LIMIT 10
    """,
    "count-min sketch contract: the 4x1024 sketch's estimate for each "
    "top-10 user must be >= the exact count and <= exact + e*N/width",
    tags=("sketch", "monitoring"),
)
def q_cms_frequency_events(spark, sf_dir):
    """The frequency sibling of hll_accuracy_events (operators/
    sketches.py::cms_build / cms_estimate): the depth*width counter
    table is built in one exploded map-side-combined aggregation (<=
    4096 rows whatever the input), estimates probe it broadcast with
    min-over-depth, and the contract pins BOTH CMS guarantees — the
    estimate never undercounts (structural) and overshoots by at most
    e*N/width (the Markov envelope, deterministic here because the
    hashes are fixed). The sketch is mergeable across batches by
    summing cells — the merge_agg_state algebra — which is what makes
    it the 100 TB heavy-hitter first pass."""
    from pramen_spark.operators.sketches import (
        cms_build, cms_error_bound, cms_estimate,
    )

    ev = load_events(spark, sf_dir).select("user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    top = exact.orderBy(F.desc("n_exact"), F.asc("user_id")).limit(10)
    sketch = cms_build(ev, "user_id", width=1024, depth=4)
    est = cms_estimate(sketch, top, "user_id", width=1024, depth=4)
    n_rows = ev.count()
    bound = cms_error_bound(n_rows, width=1024)
    return top.join(est, "user_id").select(
        "user_id",
        "n_exact",
        (F.col("est") >= F.col("n_exact")).alias("overestimates"),
        (F.col("est") <= F.col("n_exact") + F.lit(bound)).alias("within_bound"),
    )


@query(
    "trailing_active_users_events",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    "rolling 7-day active users per day (exact trailing-window distinct)",
    tags=("analytics", "timegrid"),
)
def q_trailing_active_users_events(spark, sf_dir):
    """The rolling-actives metric (operators/timegrid.py::
    trailing_distinct): the log collapses to DISTINCT (day, user) first
    — the only stage that sees event volume — then each pair EXPLODES
    to the <= 7 target days it serves and a second distinct-count
    finishes per day. No range join, no self-join: shuffle volume is
    7 * |active pairs|, independent of event count; day membership is
    a broadcast semi-join against the calendar-sized day list. Month
    windows swap the explode for merged per-day HLL sketches."""
    from pramen_spark.operators.timegrid import trailing_distinct

    return trailing_distinct(
        load_events(spark, sf_dir), "ts", "user_id", window_days=7
    )


@query(
    "lsh_recall_audit",
    f"""
    WITH lsh AS ({_lsh_topk_oracle()}),
    brute AS (
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
        )
        SELECT query_id, vec_id
        FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= 10
    )
    SELECT b.query_id,
           CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           ROUND(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 / 10.0, 4) AS recall_at_10
    FROM brute b LEFT JOIN lsh l
      ON b.query_id = l.query_id AND b.vec_id = l.vec_id
    GROUP BY b.query_id
    """,
    "recall@10 of the hyperplane-LSH index against brute-force cosine "
    "per query (the ANN quality gate)",
    tags=("similarity", "monitoring"),
)
def q_lsh_recall_audit(spark, sf_dir):
    """The audit every ANN index must publish (operators/similarity.py::
    topk_recall): LSH top-10 (the production path) overlapped against
    brute-force top-10 (the ground truth) per query. Both inputs are
    k-rows-per-query tables, so the overlap join and per-query count
    are KB-scale; the oracle recomputes BOTH sides exactly (the
    deterministic plane literals replay the index). Recall < 1 here is
    the LSH design working as specified, not a bug — the contract is
    that the number is MEASURED and tracked, the multi-probe/plane
    knobs trade it against candidate volume."""
    from pramen_spark.operators.similarity import (
        cosine_topk, lsh_topk, topk_recall,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = lsh_topk(e, q, k=10, num_planes=4, dim=64, multi_probe=2)
    brute = cosine_topk(e, q, k=10)
    return topk_recall(lsh, brute, k=10)


@query(
    "bootstrap_ci_events",
    """
    WITH w AS (
        SELECT b, value,
               CASE WHEN u < 0.36787944117144233 THEN 0
                    WHEN u < 0.7357588823428847 THEN 1
                    WHEN u < 0.9196986029286058 THEN 2
                    WHEN u < 0.9810118431238463 THEN 3
                    WHEN u < 0.9963401531726563 THEN 4
                    WHEN u < 0.9994058151824183 THEN 5
                    WHEN u < 0.999916758850712 THEN 6
                    ELSE 7 END AS w
        FROM (
            SELECT b.b AS b, e.value,
                   ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                                       || chr(31) || 'boot'
                                       || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
            FROM events e, range(0, 50) b(b)
        )
    ),
    m AS (SELECT b, SUM(w * value) / SUM(w) AS mb FROM w GROUP BY b)
    SELECT CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_rows,
           ROUND((SELECT SUM(value) FROM events)
                 / (SELECT COUNT(*) FROM events), 6) AS mean_value,
           ROUND(quantile_cont(mb, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(mb, 0.975), 6) AS ci_hi,
           CAST(50 AS BIGINT) AS n_boot
    FROM m
    """,
    "derandomized Poisson-bootstrap 95% CI for the mean event value: 50 "
    "hash-weighted resample means in one aggregation pass",
    tags=("analytics", "sampling"),
)
def q_bootstrap_ci_events(spark, sf_dir):
    """Error bars on corpus statistics without 50 scans (operators/
    sampling.py::bootstrap_mean_ci — the Poisson bootstrap, the
    distributed resampling scheme that needs no global coordination):
    each resample weights every row Poisson(1) via the md5-uniform of
    (id, seed, b), ALL 100 weighted sums evaluate in ONE map-side
    combined aggregation, and the percentile interval interpolates over
    the 50-element means array inside the single result row. The oracle
    replays weights and quantile_cont interpolation exactly."""
    from pramen_spark.operators.sampling import bootstrap_mean_ci

    ev = load_events(spark, sf_dir).select("event_id", "value")
    return bootstrap_mean_ci(ev, "value", "event_id", n_boot=50, alpha=0.05)


@query(
    "bpe_merge_candidates_documents",
    r"""
    WITH tok AS (
        SELECT unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS w
        FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    bg AS (
        SELECT c, unnest(list_transform(range(1, length(w)),
                   i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
        FROM wc WHERE length(w) >= 2
    )
    SELECT pair, CAST(SUM(c) AS BIGINT) AS weight
    FROM bg GROUP BY pair ORDER BY weight DESC, pair LIMIT 20
    """,
    "BPE tokenizer training, round one: top-20 adjacent character pairs "
    "weighted by word frequency (the merge-candidate count step)",
    tags=("text", "tokenizer"),
)
def q_bpe_merge_candidates_documents(spark, sf_dir):
    """The count step of BPE vocabulary training (operators/text.py::
    bpe_merge_candidates): the corpus collapses to the distinct-word
    vocabulary with counts FIRST (the Zipf trick — the only stage that
    sees corpus volume), then pair explosion runs over the vocabulary
    with each pair weighted by its word count; top-20 is a
    TakeOrderedAndProject. Full tokenizer training iterates
    apply-merge -> recount; every iteration is this shape."""
    from pramen_spark.operators.text import bpe_merge_candidates

    return bpe_merge_candidates(load_documents_spread(spark, sf_dir))


@query(
    "target_encode_orders",
    """
    WITH per AS (
        SELECT o_orderpriority AS category, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        FROM orders GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS gm
          FROM per)
    SELECT category, n,
           ROUND((CAST(s AS DOUBLE) + 10.0 * gm) / (n + 10.0), 6) AS enc
    FROM per, g
    """,
    "smoothed target encoding: per-priority mean order value shrunk "
    "toward the global mean (m = 10 empirical-Bayes prior)",
    tags=("features", "ml"),
)
def q_target_encode_orders(spark, sf_dir):
    """The categorical encoder table (operators/features.py::
    target_encode): enc = (sum_cat + m*global_mean) / (n_cat + m) —
    empirical-Bayes shrinkage so rare categories sit near the prior
    instead of memorizing their few rows. Target sums run in DECIMAL
    (exact, order-independent — a plain double sum drifts ~1e-2 at this
    magnitude across partition orders), so the encoder is
    bit-reproducible. One map-side-combined aggregation; the global
    mean re-aggregates the KB-scale category table and broadcasts."""
    from pramen_spark.operators.features import target_encode

    return target_encode(
        load_table(spark, sf_dir, "orders"), "o_orderpriority",
        "o_totalprice", smoothing=10.0,
    )


@query(
    "vocab_truncate_documents",
    r"""
    WITH tok AS (
        SELECT unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS token
        FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
    mapped AS (
        SELECT CASE WHEN n >= 20 THEN token ELSE '__unk__' END AS token_out,
               n
        FROM freq
    )
    SELECT token_out, CAST(SUM(n) AS BIGINT) AS n_occurrences
    FROM mapped GROUP BY 1
    ORDER BY n_occurrences DESC, token_out LIMIT 20
    """,
    "vocabulary truncation: token histogram after collapsing tokens "
    "with fewer than 20 occurrences into __unk__ (top-20)",
    tags=("features", "text"),
)
def q_vocab_truncate_documents(spark, sf_dir):
    """Long-tail collapse (operators/features.py::collapse_rare) applied
    to the token vocabulary — the `<unk>` mapping every fixed-vocab
    tokenizer performs. The FREQUENT set (bounded by total_tokens /
    min_count) builds in one map-side-combined aggregation and
    broadcast-joins back over the token stream; the histogram then
    counts the collapsed column. No shuffle carries raw text beyond
    the (token) explode itself; top-20 is a TakeOrderedAndProject."""
    from pramen_spark.operators.features import collapse_rare

    toks = F.expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    )
    tok_df = load_documents_spread(spark, sf_dir).select(
        F.explode(toks).alias("token")
    )
    collapsed = collapse_rare(tok_df, "token", min_count=20,
                              other_label="__unk__")
    return (
        collapsed.groupBy(F.col("token").alias("token_out"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token_out"))
        .limit(20)
    )


@query(
    "churn_labels_events",
    """
    WITH pu AS (
        SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day
        FROM events GROUP BY 1
    ),
    h AS (SELECT MAX(last_day) AS mx FROM pu)
    SELECT user_id, last_day,
           CAST(mx - last_day AS BIGINT) AS days_inactive,
           (mx - last_day) > 7 AS churned
    FROM pu, h
    """,
    "supervised churn target: per user last active day, inactivity vs "
    "the dataset horizon, and the churned label (> 7 days)",
    tags=("analytics", "ml"),
)
def q_churn_labels_events(spark, sf_dir):
    """The churn-label generator (operators/sequences.py::
    churn_labels): per-user MAX day in one map-side-combined
    aggregation, a 1-row broadcast of the global horizon, and pure
    column arithmetic — no window, no self-join; only the one-row-per-
    user table shuffles. The label feeds the classifier pipeline the
    same way quality_classifier's labels feed curation."""
    from pramen_spark.operators.sequences import churn_labels

    return churn_labels(load_events(spark, sf_dir), inactive_days=7)


@query(
    "event_trigrams_events",
    """
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS s2,
               LEAD(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS step_1, s2 AS step_2, s3 AS step_3,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM o WHERE s3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, step_1, step_2, step_3 LIMIT 20
    """,
    "top-20 consecutive event trigrams across user journeys (path "
    "mining before funnel definition)",
    tags=("analytics", "sequences"),
)
def q_event_trigrams_events(spark, sf_dir):
    """Path n-gram mining (operators/sequences.py::path_ngrams — the
    n>2 extension of the Markov transition matrix): ONE window pass
    partitioned by user (both LEADs share the frame; ordering is
    (ts, event_id) so timestamp ties cannot flip engines), then a
    map-side-combined count and a TakeOrdered top-20. Per-user
    ordering is the sessionize shape — a pathological hot user is the
    salted_agg case."""
    from pramen_spark.operators.sequences import path_ngrams

    return path_ngrams(load_events(spark, sf_dir), n=3, top_n=20)


@query(
    "ab_ttest_events",
    """
    WITH agg AS (
        SELECT
            CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_a,
            CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_b,
            AVG(CASE WHEN event_type = 'click' THEN value END) AS ma,
            AVG(CASE WHEN event_type = 'view' THEN value END) AS mb,
            VAR_SAMP(CASE WHEN event_type = 'click' THEN value END) AS va,
            VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS vb
        FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT n_a, n_b, ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
           ROUND((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                 / ((va / n_a) * (va / n_a) / (n_a - 1)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1)), 6) AS dof
    FROM agg
    """,
    "Welch two-sample t-test of event value between the click and view "
    "arms (A/B readout with Welch-Satterthwaite dof)",
    tags=("analytics", "drift"),
)
def q_ab_ttest_events(spark, sf_dir):
    """The A/B experiment readout (operators/drift.py::welch_ttest —
    the parametric sibling of ks_binned): per-arm count/mean/variance
    as conditional aggregates in a SINGLE map-side-combined pass, then
    scalar Welch arithmetic on the one result row (squares written as
    products, not pow(), so both engines compute identical doubles).
    Nothing shuffles but the 1-row reduce at any scale."""
    from pramen_spark.operators.drift import welch_ttest

    return welch_ttest(
        load_events(spark, sf_dir), "event_type", "value", "click", "view"
    )


@query(
    "auc_documents",
    """
    WITH lab AS (
        SELECT n_chars AS s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    h AS (
        SELECT s, CAST(SUM(y) AS BIGINT) AS np,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
        FROM lab GROUP BY s
    ),
    w AS (
        SELECT np, nn,
               COALESCE(SUM(nn) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_nn
        FROM h
    ),
    t AS (
        SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
               CAST(SUM(nn) AS BIGINT) AS n_neg,
               CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2
        FROM w
    )
    SELECT n_pos, n_neg,
           ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
    FROM t
    """,
    "exact Mann-Whitney ROC AUC of document length predicting "
    "lang = 'en', computed sort-free over the score histogram",
    tags=("ml", "evaluation"),
)
def q_auc_documents(spark, sf_dir):
    """Exact AUC without a global sort (operators/evalmetrics.py::auc):
    rows reduce to the per-score histogram in one map-side-combined
    aggregation — the only stage that sees data volume — the running
    negative count windows over the score DOMAIN (quantize continuous
    scores to cap it, the streaming-AUC move), and 2U folds to exact
    BIGINTs (ties get half credit), so the only double op is the final
    division and the metric is bit-reproducible. The demo scores
    length against the English label; any (classifier score, label)
    pair plugs in."""
    from pramen_spark.operators.evalmetrics import auc

    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").alias("y"),
    )
    return auc(d, "s", "y")


@query(
    "gini_orders",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT CAST(x AS DECIMAL(18,2)) AS xd,
               ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
        FROM spend
    ),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(xd) AS tt,
               SUM(i * xd) AS ss
        FROM r
    )
    SELECT n, CAST(tt AS DOUBLE) AS total,
           ROUND((2.0 * CAST(ss AS DOUBLE) / CAST(tt AS DOUBLE) - (n + 1))
                 / n, 6) AS gini
    FROM t
    """,
    "Gini coefficient of customer spend concentration (rank-weighted "
    "exact-decimal identity)",
    tags=("analytics", "validation"),
)
def q_gini_orders(spark, sf_dir):
    """Inequality in one number (operators/evalmetrics.py::gini — the
    scalar summary behind key_skew_profile's head/body picture):
    G = 2*sum(i * x_(i)) / (n * sum x) - (n+1)/n over rank-ordered
    per-customer spend, DECIMAL sums so both the rank-weighted and the
    plain total are exact and the Gini is a fixed scalar expression.
    Ranks come from one window over the PER-ENTITY table (one row per
    customer — entity domain, not order volume); ties break on the
    customer key so the ordering is engine-stable."""
    from pramen_spark.operators.evalmetrics import gini

    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
    )
    return gini(spend, "spend", "o_custkey")


@query(
    "temporal_split_events",
    """
    WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
    s AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CASE WHEN CAST(ts AS DATE) >= mx - 9 THEN 'test'
                    WHEN CAST(ts AS DATE) >= mx - 11 THEN 'embargo'
                    ELSE 'train' END AS split
        FROM events, h
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM s GROUP BY split
    """,
    "temporal train/test split with a 2-day embargo gap before the "
    "10-day test window (leakage-safe time split summary)",
    tags=("sampling", "ml"),
)
def q_temporal_split_events(spark, sf_dir):
    """The time-axis leakage guard (operators/sampling.py::
    temporal_split, the temporal sibling of leakage_safe_split): the
    last 10 days are test, the 2 days before them are EMBARGOED out of
    training so trailing-window features and session spillover cannot
    cross the boundary. The horizon is a 1-row broadcast and the
    assignment a pure column expression — zero shuffle; the summary
    aggregation here is the audit a pipeline logs before training."""
    from pramen_spark.operators.sampling import temporal_split

    s = temporal_split(
        load_events(spark, sf_dir), "ts", test_days=10, embargo_days=2
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min(F.to_date("ts")).alias("min_day"),
        F.max(F.to_date("ts")).alias("max_day"),
    )


@query(
    "overdispersion_events",
    """
    WITH per AS (
        SELECT event_type AS grp, user_id, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    agg AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_entities, AVG(c) AS m,
               VAR_SAMP(CAST(c AS DOUBLE)) AS v
        FROM per GROUP BY 1
    )
    SELECT grp, n_entities, ROUND(m, 6) AS mean_count,
           ROUND(v, 6) AS var_count, ROUND(v / m, 6) AS dispersion,
           v / m > 1.0 AS overdispersed
    FROM agg
    """,
    "overdispersion check: variance/mean of per-user event counts per "
    "type (Poisson ~ 1; above = bursty heavy users)",
    tags=("analytics", "monitoring"),
)
def q_overdispersion_events(spark, sf_dir):
    """The load-model companion to key_skew_profile (operators/
    anomaly.py::overdispersion): the dispersion index var/mean of
    per-entity counts — Poisson arrivals sit near 1, heavy/bursty
    users push it up (provision salting), quota'd behavior pulls it
    below. Two map-side-combined aggregations ((group, entity) counts,
    then per-group moments over the one-row-per-entity table); no
    window, no join."""
    from pramen_spark.operators.anomaly import overdispersion

    return overdispersion(load_events(spark, sf_dir), "event_type", "user_id")


@query(
    "weekday_seasonality_events",
    """
    WITH per AS (
        SELECT isodow(ts) - 1 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(value) AS s
        FROM events GROUP BY 1
    ),
    g AS (SELECT SUM(s) / SUM(n) AS gm FROM per)
    SELECT CAST(dow AS BIGINT) AS dow, n, ROUND(s / n, 6) AS mean_value,
           ROUND((s / n) / gm, 6) AS seasonality_index
    FROM per, g
    """,
    "day-of-week seasonality profile of the event value (Monday = 0): "
    "mean per weekday and index vs the global mean",
    tags=("analytics", "timegrid"),
)
def q_weekday_seasonality_events(spark, sf_dir):
    """The weekly-cycle half of metric decomposition (operators/
    timegrid.py::weekday_seasonality; trend_slope_daily is the trend
    half): one 7-group map-side-combined aggregation, the global mean
    re-aggregated from the 7-row table and broadcast. Weekday is
    ISO-Monday-0 on both engines (Spark weekday(), DuckDB isodow - 1)
    so the profile is portable."""
    from pramen_spark.operators.timegrid import weekday_seasonality

    return weekday_seasonality(load_events(spark, sf_dir), "ts", "value")


@query(
    "calibration_bins_documents",
    """
    WITH mx AS (SELECT MAX(n_chars) AS mx FROM documents),
    s AS (
        SELECT CAST(n_chars AS DOUBLE) / mx AS p,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents, mx
    ),
    b AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y FROM s)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(p), 6) AS mean_p,
           ROUND(AVG(CAST(y AS DOUBLE)), 6) AS frac_pos,
           ROUND(ABS(AVG(p) - AVG(CAST(y AS DOUBLE))), 6) AS gap
    FROM b GROUP BY bin
    """,
    "reliability-diagram bins: normalized document length as a "
    "probability score vs the English label, per-decile mean score, "
    "positive fraction, and calibration gap",
    tags=("ml", "evaluation"),
)
def q_calibration_bins_documents(spark, sf_dir):
    """The calibration curve table (operators/evalmetrics.py::
    calibration_bins — ECE is sum over rows of (n/N)*gap): ONE
    map-side-combined aggregation keyed by the fixed-width probability
    bin (<= 10 groups), exact counts, means over already-aggregated
    sums; the score-normalizing max is a 1-row broadcast. Any
    (probability, label) pair plugs in — here the normalized length
    scores the English label so the oracle replays everything
    exactly."""
    from pramen_spark.operators.evalmetrics import calibration_bins

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("_mx"))
    scored = d.crossJoin(F.broadcast(mx)).select(
        (F.col("n_chars").cast("double") / F.col("_mx")).alias("p"),
        (F.col("lang") == "en").alias("y"),
    )
    return calibration_bins(scored, "p", "y", n_bins=10)


@query(
    "ndcg_lsh_audit",
    f"""
    WITH lsh_full AS ({_lsh_topk_oracle()}),
    brute AS (
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
        )
        SELECT query_id, vec_id, cosine, rank
        FROM (
            SELECT query_id, vec_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= 10
    ),
    sysg AS (
        SELECT l.query_id,
               COALESCE(b.cosine, 0.0) / log2(l.rank + 1.0) AS g
        FROM lsh_full l LEFT JOIN brute b
          ON l.query_id = b.query_id AND l.vec_id = b.vec_id
    ),
    dcg AS (SELECT query_id, SUM(g) AS dcg_raw FROM sysg GROUP BY 1),
    idcg AS (SELECT query_id, SUM(cosine / log2(rank + 1.0)) AS idcg_raw
             FROM brute GROUP BY 1)
    SELECT d.query_id, ROUND(dcg_raw, 6) AS dcg, ROUND(idcg_raw, 6) AS idcg,
           ROUND(dcg_raw / idcg_raw, 6) AS ndcg
    FROM dcg d JOIN idcg USING (query_id)
    """,
    "NDCG@10 of the LSH ranking against brute-force cosine order (the "
    "graded-relevance ANN quality gate beside recall@10)",
    tags=("similarity", "evaluation"),
)
def q_ndcg_lsh_audit(spark, sf_dir):
    """Graded ranking quality (operators/evalmetrics.py::ndcg_at_k):
    recall@10 counts hits, NDCG also charges the index for putting the
    best neighbors low — gains are the TRUE cosines (from the
    brute-force ideal; items outside the ideal top-10 gain 0),
    discounted by log2(rank+1). Both inputs are 10 rows per query, the
    gain join is co-keyed, the discounted sums aggregate per query —
    the audit is KB-scale regardless of corpus size, and the oracle
    replays index and ideal exactly via the deterministic planes."""
    from pramen_spark.operators.evalmetrics import ndcg_at_k
    from pramen_spark.operators.similarity import cosine_topk, lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = lsh_topk(e, q, k=10, num_planes=4, dim=64, multi_probe=2)
    brute = cosine_topk(e, q, k=10)
    return ndcg_at_k(lsh, brute, k=10)


@query(
    "wilson_ctr_events",
    """
    WITH agg AS (
        SELECT event_type AS grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
                 AS successes
        FROM events GROUP BY 1
    )
    SELECT grp, n, successes,
           ROUND(successes / CAST(n AS DOUBLE), 6) AS rate,
           ROUND((successes / CAST(n AS DOUBLE)
                  + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
                  - 1.96 * sqrt((successes / CAST(n AS DOUBLE))
                                * (1.0 - successes / CAST(n AS DOUBLE))
                                / CAST(n AS DOUBLE)
                                + (1.96 * 1.96)
                                  / (4.0 * CAST(n AS DOUBLE)
                                     * CAST(n AS DOUBLE))))
                 / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS ci_lo,
           ROUND((successes / CAST(n AS DOUBLE)
                  + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
                  + 1.96 * sqrt((successes / CAST(n AS DOUBLE))
                                * (1.0 - successes / CAST(n AS DOUBLE))
                                / CAST(n AS DOUBLE)
                                + (1.96 * 1.96)
                                  / (4.0 * CAST(n AS DOUBLE)
                                     * CAST(n AS DOUBLE))))
                 / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS ci_hi
    FROM agg
    """,
    "Wilson 95% score interval for the high-value rate (value > 100) "
    "per event type — the small-sample-safe conversion readout",
    tags=("analytics", "monitoring"),
)
def q_wilson_ctr_events(spark, sf_dir):
    """Proportion confidence intervals that behave at the extremes
    (operators/drift.py::proportion_ci): the Wilson score interval
    never exits [0,1] and stays honest at tiny n or rates near 0/1
    where the naive normal interval collapses. One map-side-combined
    aggregation; the interval is closed-form scalar arithmetic on
    (n, successes) — z^2 is written as 1.96*1.96 on both sides so the
    engines compute the identical double."""
    from pramen_spark.operators.drift import proportion_ci

    ev = load_events(spark, sf_dir).select(
        "event_type", (F.col("value") > 100).alias("success")
    )
    return proportion_ci(ev, "event_type", "success", z=1.96)


@query(
    "embedding_health_embeddings",
    """
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(dim) AS BIGINT) AS dim_min,
           CAST(MAX(dim) AS BIGINT) AS dim_max,
           CAST(SUM(CASE WHEN NOT nan AND nrm = 0.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_norm,
           CAST(SUM(CASE WHEN nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
           ROUND(MIN(CASE WHEN NOT nan THEN nrm END), 6) AS norm_min,
           ROUND(AVG(CASE WHEN NOT nan THEN nrm END), 6) AS norm_mean,
           ROUND(MAX(CASE WHEN NOT nan THEN nrm END), 6) AS norm_max
    FROM (
        SELECT label, len(embedding) AS dim,
               len(list_filter(embedding, x -> isnan(x))) > 0 AS nan,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    )
    GROUP BY label
    """,
    "embedding table pre-flight: per label, dimension consistency, "
    "zero-norm and NaN vectors, and norm statistics",
    tags=("similarity", "validation"),
)
def q_embedding_health_embeddings(spark, sf_dir):
    """The health gate before any similarity stage (operators/
    similarity.py::embedding_health_audit): a handful of NaN vectors
    silently poisons every downstream cosine and centroid, and a
    dimension drift breaks zip_with at row N million — catch both in
    ONE map-side-combined aggregation with sequential-fold norms the
    oracle reproduces bit-for-bit. No window, no join."""
    from pramen_spark.operators.similarity import embedding_health_audit

    return embedding_health_audit(load_table(spark, sf_dir, "embeddings"))


@query(
    "zipf_slope_documents",
    r"""
    WITH tok AS (
        SELECT unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS token
        FROM documents
    ),
    freq AS (
        SELECT token, COUNT(*) AS c FROM tok GROUP BY 1
        ORDER BY c DESC, token LIMIT 500
    ),
    xy AS (
        SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token)
                       AS DOUBLE)) AS x,
               ln(CAST(c AS DOUBLE)) AS y
        FROM freq
    ),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens_fit,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM xy
    )
    SELECT n_tokens_fit,
           ROUND((n_tokens_fit * sxy - sx * sy)
                 / (n_tokens_fit * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n_tokens_fit * sxy - sx * sy)
                       / (n_tokens_fit * sxx - sx * sx) * sx)
                 / n_tokens_fit, 6) AS intercept,
           ROUND((n_tokens_fit * sxy - sx * sy) * (n_tokens_fit * sxy - sx * sy)
                 / ((n_tokens_fit * sxx - sx * sx)
                    * (n_tokens_fit * syy - sy * sy)), 6) AS r2
    FROM t
    """,
    "Zipf's-law fit: OLS slope of ln(frequency) vs ln(rank) over the "
    "top-500 tokens (corpus-health one-liner; natural text ~ -1)",
    tags=("text", "quality"),
)
def q_zipf_slope_documents(spark, sf_dir):
    """Corpus-level distribution health (operators/text.py::
    zipf_slope): natural corpora fit ln(freq) ~ -ln(rank); synthetic
    or template-heavy corpora flatten or cliff. Token counts aggregate
    map-side (the only corpus-volume stage), top-500 is a
    TakeOrderedAndProject, and the rank window + closed-form OLS run
    over the 500-row table — bounded by the parameter, not the
    corpus."""
    from pramen_spark.operators.text import zipf_slope

    return zipf_slope(load_documents_spread(spark, sf_dir), top_k=500)


@query(
    "stream_static_enrich_events",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
    "Structured Streaming parity #4: stream-static broadcast join — "
    "streaming events enriched with the customer dim, per-segment "
    "counts equal the batch join",
    tags=("streaming",),
)
def q_stream_static_enrich_events(spark, sf_dir):
    """The stream-static JOIN path run for real (the fourth streaming
    parity, after tumbling/hopping/session windows): a file readStream
    over events joins the BATCH customer dimension broadcast per
    micro-batch — the standard streaming enrichment (dim lookups
    against a slowly-changing table) — then aggregates per segment in
    complete mode; the batch twin is the plain join. Stream-static
    inner joins need no watermark and keep NO join state: each
    micro-batch probes the broadcast dim and moves on, so the pattern
    holds at any stream volume; the dim refreshes per batch on a real
    cluster."""
    from pramen_spark.streaming.stream import read_file_stream

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    glob_path = f"{sf_dir}/events.parque[t]"
    stream = read_file_stream(spark, glob_path, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("_sv"),
    )
    sink = "stream_static_enrich_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        "c_mktsegment", "n_events", F.round("_sv", 4).alias("sum_value")
    )


@query(
    "stream_dedup_events",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_pairs
    FROM events GROUP BY 1
    """,
    "Structured Streaming parity #5: streaming exact dedup on "
    "(user_id, event_type) — kept rows equal the batch distinct pairs",
    tags=("streaming",),
)
def q_stream_dedup_events(spark, sf_dir):
    """The streaming dedup path run for real (streaming/stream.py::
    streaming_dedup — the continuous exact_dedup for at-least-once
    sources): dropDuplicates state keeps first-arrival (user, type)
    pairs across micro-batches, the append-mode sink receives exactly
    one row per pair, and counting the sink per type must equal the
    batch COUNT(DISTINCT user). The parity uses the unbounded form so
    the equality is exact on bounded input; the watermark-evicted
    ``dropDuplicatesWithinWatermark`` form (state bounded by
    rate x watermark — the only shape that survives 100 TB/day) is
    covered by test_streaming.py."""
    from pramen_spark.streaming.stream import (
        read_file_stream,
        streaming_dedup,
    )

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    glob_path = f"{sf_dir}/events.parque[t]"
    stream = read_file_stream(spark, glob_path, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    deduped = streaming_dedup(
        stream, "ts", key_cols=("user_id", "event_type"),
        within_watermark=False,
    ).select("user_id", "event_type")
    sink = "stream_dedup_sink"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


@query(
    "feature_hash_collisions_documents",
    r"""
    WITH tok AS (
        SELECT DISTINCT unnest(list_filter(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '')) AS token
        FROM documents
    ),
    b AS (
        SELECT token,
               ('0x' || substr(md5(token), 1, 8))::BIGINT % 4096 AS bucket
        FROM tok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets_used,
           CAST(COUNT(*) - COUNT(DISTINCT bucket) AS BIGINT) AS n_collided,
           ROUND((COUNT(*) - COUNT(DISTINCT bucket))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS collision_rate
    FROM b
    """,
    "hashing-trick audit: token-vocabulary collision rate at 4096 "
    "feature buckets (md5-prefix hash, engine-portable)",
    tags=("features", "ml"),
)
def q_feature_hash_collisions_documents(spark, sf_dir):
    """The width-sizing audit for feature hashing (operators/
    features.py::feature_hash_audit): distinct tokens deduplicate
    first (the only corpus-volume stage), then one two-distinct
    aggregation over the domain counts bucket collisions at the
    candidate width. The md5-prefix bucket makes the audit portable;
    swap any hash at serving time once the width passes."""
    from pramen_spark.operators.features import feature_hash_audit

    toks = F.expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    )
    tok_df = load_documents_spread(spark, sf_dir).select(
        F.explode(toks).alias("token")
    )
    return feature_hash_audit(tok_df, "token", n_buckets=4096)


@query(
    "info_gain_ranking_events",
    """
    WITH lab AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(isodow(ts) - 1 AS BIGINT) AS dw,
               CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
        FROM events
    ),
    f1 AS (
        SELECT 'event_type' AS feature, ROUND(SUM(mi), 6) AS mi_bits FROM (
            SELECT ROUND(CAST(n_xy AS DOUBLE) / n
                   * log2(CAST(n_xy AS DOUBLE) * n
                          / (CAST(n_x AS DOUBLE) * n_y)), 9) AS mi
            FROM (
                SELECT event_type AS x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
                FROM lab GROUP BY 1, 2
            ) j
            JOIN (SELECT event_type AS x, CAST(COUNT(*) AS BIGINT) AS n_x
                  FROM lab GROUP BY 1) mx USING (x)
            JOIN (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_y
                  FROM lab GROUP BY 1) my USING (y),
                 (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab) tot
        )
    ),
    f2 AS (
        SELECT 'hour' AS feature, ROUND(SUM(mi), 6) AS mi_bits FROM (
            SELECT ROUND(CAST(n_xy AS DOUBLE) / n
                   * log2(CAST(n_xy AS DOUBLE) * n
                          / (CAST(n_x AS DOUBLE) * n_y)), 9) AS mi
            FROM (
                SELECT hr AS x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
                FROM lab GROUP BY 1, 2
            ) j
            JOIN (SELECT hr AS x, CAST(COUNT(*) AS BIGINT) AS n_x
                  FROM lab GROUP BY 1) mx USING (x)
            JOIN (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_y
                  FROM lab GROUP BY 1) my USING (y),
                 (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab) tot
        )
    ),
    f3 AS (
        SELECT 'weekday' AS feature, ROUND(SUM(mi), 6) AS mi_bits FROM (
            SELECT ROUND(CAST(n_xy AS DOUBLE) / n
                   * log2(CAST(n_xy AS DOUBLE) * n
                          / (CAST(n_x AS DOUBLE) * n_y)), 9) AS mi
            FROM (
                SELECT dw AS x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
                FROM lab GROUP BY 1, 2
            ) j
            JOIN (SELECT dw AS x, CAST(COUNT(*) AS BIGINT) AS n_x
                  FROM lab GROUP BY 1) mx USING (x)
            JOIN (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_y
                  FROM lab GROUP BY 1) my USING (y),
                 (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab) tot
        )
    )
    SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
    ORDER BY mi_bits DESC, feature
    """,
    "information-gain feature ranking: MI of event_type / hour / "
    "weekday against the high-value label, ranked",
    tags=("ml", "drift"),
)
def q_info_gain_ranking_events(spark, sf_dir):
    """Feature selection by information gain (operators/drift.py::
    mutual_information applied per candidate feature against the
    label): each feature costs ONE contingency shuffle; marginals and
    totals re-aggregate the KB-scale cell tables broadcast. The ranked
    one-row-per-feature output is the screen run before training (and
    a leakage alarm — a feature with implausibly high MI against the
    label is leaking it). Cell contributions round at 9 on both
    engines before summing, so the ranking is reproducible."""
    from pramen_spark.operators.drift import mutual_information

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.weekday("ts").cast("long").alias("dw"),
        (F.col("value") > 100).alias("y"),
    )
    outs = []
    for name, colname in (
        ("event_type", "event_type"), ("hour", "hr"), ("weekday", "dw"),
    ):
        mi = mutual_information(
            ev.select(F.col(colname).alias("f"), F.col("y").cast("int").alias("y")),
            "f",
            "y",
        )
        outs.append(
            mi.agg(F.round(F.sum("mi_contrib"), 6).alias("mi_bits")).select(
                F.lit(name).alias("feature"), "mi_bits"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(F.desc("mi_bits"), F.asc("feature"))


@query(
    "weighted_percentile_lineitem",
    """
    WITH dom AS (
        SELECT l_extendedprice AS v, SUM(l_quantity) AS w
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT v, SUM(w) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        FROM dom
    ),
    tot AS (SELECT SUM(w) AS tw FROM dom)
    SELECT MIN(CASE WHEN cw >= 0.5 * tw THEN v END) AS p50_weighted,
           MIN(CASE WHEN cw >= 0.9 * tw THEN v END) AS p90_weighted
    FROM cum, tot
    """,
    "quantity-weighted price percentiles (lower/inverse-CDF "
    "convention): the smallest price reaching 50% / 90% of total "
    "shipped quantity",
    tags=("analytics", "sampling"),
)
def q_weighted_percentile_lineitem(spark, sf_dir):
    """Weighted quantiles no engine ships built-in (operators/
    sampling.py::weighted_percentiles — the token-weighted median
    length, quantity-weighted price band): values collapse to the
    (value, total-weight) DOMAIN first (the only row-volume stage),
    the cumulative window runs over that domain table (bounded by
    distinct values — quantize continuous values to cap it, the AUC
    histogram move), and the thresholds are conditional MINs against
    the broadcast total. Small-integer weights keep every cumulative
    sum exact in doubles, so the thresholds are deterministic."""
    from pramen_spark.operators.sampling import weighted_percentiles

    return weighted_percentiles(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        "l_quantity", qs=(0.5, 0.9),
    )


@query(
    "rfm_segments_orders",
    """
    WITH per AS (
        SELECT o_custkey AS customer, MAX(CAST(o_orderdate AS DATE)) AS last_d,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS monetary
        FROM orders GROUP BY 1
    ),
    h AS (SELECT MAX(last_d) AS mx FROM per),
    base AS (
        SELECT customer, CAST(mx - last_d AS BIGINT) AS recency_days,
               frequency, monetary
        FROM per, h
    ),
    th AS (
        SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS tr,
               quantile_cont(frequency, [0.25, 0.5, 0.75]) AS tf,
               quantile_cont(monetary, [0.25, 0.5, 0.75]) AS tm
        FROM base
    )
    SELECT customer, recency_days, frequency, monetary,
           CAST(1 + (recency_days > tr[1])::INT + (recency_days > tr[2])::INT
                + (recency_days > tr[3])::INT AS BIGINT) AS r_score,
           CAST(1 + (frequency > tf[1])::INT + (frequency > tf[2])::INT
                + (frequency > tf[3])::INT AS BIGINT) AS f_score,
           CAST(1 + (monetary > tm[1])::INT + (monetary > tm[2])::INT
                + (monetary > tm[3])::INT AS BIGINT) AS m_score
    FROM base, th
    """,
    "RFM customer segmentation: recency/frequency/monetary per customer "
    "with quartile scores from broadcast exact-percentile thresholds",
    tags=("analytics", "features"),
)
def q_rfm_segments_orders(spark, sf_dir):
    """Behavioral segmentation without the global-NTILE hazard
    (operators/features.py::rfm_scores — the curriculum_thresholds
    pattern applied three ways): per-customer R/F/M in one map-side
    combined aggregation (the only order-volume stage), ONE 1-row
    exact-percentile aggregate over the per-customer table, and nine
    broadcast threshold comparisons — no rank window anywhere. DECIMAL
    monetary sums keep threshold inputs exact so quartile boundaries
    cannot drift between engines."""
    from pramen_spark.operators.features import rfm_scores

    return rfm_scores(
        load_table(spark, sf_dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice",
    )


@query(
    "ship_latency_lineitem",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(quantile_cont(CAST(l_shipdate AS DATE)
                               - CAST(o_orderdate AS DATE), 0.5), 4)
             AS p50_days,
           ROUND(quantile_cont(CAST(l_shipdate AS DATE)
                               - CAST(o_orderdate AS DATE), 0.9), 4)
             AS p90_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    "order-to-ship latency SLA: P50/P90 days from order to line-item "
    "ship date per order priority",
    tags=("analytics", "monitoring"),
)
def q_ship_latency_lineitem(spark, sf_dir):
    """The cross-table SLA readout: lineitem joins orders CO-KEYED on
    the order key (both sides shuffle once on the same key — or the
    orders side broadcasts under AQE at audit scale), the day latency
    is a pure date-arithmetic column, and exact interpolated
    percentiles aggregate per priority (five groups). At 100 TB swap
    the exact percentile for approx_percentile under the
    approx_quantile_contract gate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("ord_d")
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff("ship_d", "ord_d").cast("long").alias("lat"),
    )
    pct = F.percentile(F.col("lat"), F.array(F.lit(0.5), F.lit(0.9)))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.element_at(pct, 1), 4).alias("p50_days"),
        F.round(F.element_at(pct, 2), 4).alias("p90_days"),
    )


@query(
    "wow_revenue_orders",
    """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT week_start,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY week_start) AS DOUBLE)
                 / CAST(LAG(rev) OVER (ORDER BY week_start) AS DOUBLE),
                 6) AS wow_change
    FROM weekly
    """,
    "week-over-week revenue: weekly totals with the percentage change "
    "vs the previous week (NULL for the first week)",
    tags=("analytics", "timegrid"),
)
def q_wow_revenue_orders(spark, sf_dir):
    """The WoW growth readout every revenue dashboard carries: orders
    aggregate to Monday-start weeks FIRST (map-side combined — the only
    order-volume stage; both engines truncate weeks to Monday), so the
    unpartitioned LAG window sees one row per WEEK — bounded by
    calendar span, the daily_revenue_running_total pattern. DECIMAL
    weekly sums are exact; the change ratio divides the same exact
    values on both engines."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("week_start")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = W.orderBy("week_start")
    prev = F.lag("rev").over(w)
    return weekly.select(
        "week_start",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev") - prev).cast("double") / prev.cast("double"), 6
        ).alias("wow_change"),
    )


@query(
    "benford_audit_orders",
    """
    WITH pos AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x
        FROM orders WHERE o_totalprice >= 1
    ),
    d AS (
        SELECT CAST(regexp_extract(CAST(x AS VARCHAR), '([1-9])', 1)
                    AS INTEGER) AS digit
        FROM pos
    ),
    g AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / tot, 6) AS observed_p,
           ROUND(log10(1 + 1.0 / digit), 6) AS expected_p
    FROM g, t
    """,
    "Benford's-law first-digit audit of order totals: observed leading-"
    "digit shares vs the log10(1+1/d) expectation",
    tags=("quality", "validation"),
)
def q_benford_audit_orders(spark, sf_dir):
    """The fraud / synthetic-data screen
    (operators/validation.py::benford_digit_audit): the leading digit
    comes from an exact DECIMAL magnitude ladder on the Spark side —
    never log10 of the value, whose last-ulp engine differences flip
    the digit at exact powers of ten — while the oracle extracts the
    same digit lexically from the decimal rendering; agreement of the
    two routes is itself part of the check. One filter + one 9-group
    map-side-combined aggregation; the 9-row digit table re-aggregates
    to the broadcast total."""
    from pramen_spark.operators.validation import benford_digit_audit

    return benford_digit_audit(
        load_table(spark, sf_dir, "orders"), "o_totalprice"
    )


@query(
    "ewma_revenue_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    l AS (
        SELECT day, revenue,
               lag(revenue, 1) OVER w AS r1, lag(revenue, 2) OVER w AS r2,
               lag(revenue, 3) OVER w AS r3, lag(revenue, 4) OVER w AS r4,
               lag(revenue, 5) OVER w AS r5, lag(revenue, 6) OVER w AS r6
        FROM daily WINDOW w AS (ORDER BY day)
    )
    SELECT day, revenue,
           ROUND(((((((revenue
                 + COALESCE(r1, 0) * 0.5)
                 + COALESCE(r2, 0) * 0.25)
                 + COALESCE(r3, 0) * 0.125)
                 + COALESCE(r4, 0) * 0.0625)
                 + COALESCE(r5, 0) * 0.03125)
                 + COALESCE(r6, 0) * 0.015625)
                 / ((((((1.0
                 + CASE WHEN r1 IS NOT NULL THEN 0.5 ELSE 0 END)
                 + CASE WHEN r2 IS NOT NULL THEN 0.25 ELSE 0 END)
                 + CASE WHEN r3 IS NOT NULL THEN 0.125 ELSE 0 END)
                 + CASE WHEN r4 IS NOT NULL THEN 0.0625 ELSE 0 END)
                 + CASE WHEN r5 IS NOT NULL THEN 0.03125 ELSE 0 END)
                 + CASE WHEN r6 IS NOT NULL THEN 0.015625 ELSE 0 END),
                 6) AS ewma
    FROM l
    """,
    "7-tap exponentially-weighted moving average of daily revenue "
    "(decay 0.5, partial-history renormalized)",
    tags=("analytics", "timegrid"),
)
def q_ewma_revenue_daily(spark, sf_dir):
    """Dashboard smoothing without the sequential recurrence
    (operators/timegrid.py::ewma_smooth): orders pre-aggregate to one
    DECIMAL-exact row per day (map-side combined — the only
    order-volume stage), then a finite 7-tap LAG sum with binary-
    fraction weights 0.5^k replaces the unbounded ``s_t = a*x_t +
    (1-a)*s_{t-1}`` recursion, whose prefix-product form overflows past
    ~1000 rows. The unpartitioned window sees only calendar-bounded
    daily rows (the wow_revenue pattern). Weights are exact in binary,
    so both engines sum identical doubles in identical order."""
    from pramen_spark.operators.timegrid import ewma_smooth

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return ewma_smooth(daily, "revenue", "day", decay=0.5, taps=7)


@query(
    "pareto_frontier_parts",
    """
    WITH per AS (
        SELECT p_retailprice AS cost, MAX(p_size) AS best_gain
        FROM part GROUP BY 1
    ),
    r AS (
        SELECT cost, best_gain,
               MAX(best_gain) OVER (
                   ORDER BY cost
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS cheaper_best
        FROM per
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
    FROM part p JOIN r ON p.p_retailprice = r.cost
    WHERE NOT ((r.cheaper_best IS NOT NULL
                AND r.cheaper_best >= p.p_size)
               OR r.best_gain > p.p_size)
    """,
    "2-D Pareto frontier of parts (minimize retail price, maximize "
    "size): no other part is both cheaper-or-equal and larger-or-equal "
    "with one strict",
    tags=("analytics", "skyline"),
)
def q_pareto_frontier_parts(spark, sf_dir):
    """Skyline without the quadratic NOT-EXISTS self-join
    (operators/features.py::skyline_2d): collapse to best-size-per-
    price, one running-max window over that DOMAIN-bounded table, and
    a hash join back on the price key. Equal (price, size) twins
    survive together — the frontier is a set, not one winner."""
    from pramen_spark.operators.features import skyline_2d

    p = load_table(spark, sf_dir, "part")
    return skyline_2d(p, "p_retailprice", "p_size").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )


@query(
    "max_concurrency_events",
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
               GREATEST(s_us, dayn * 86400000000) AS cs,
               LEAST(e_us, dayn * 86400000000 + 86399999999) AS ce
        FROM seg
    ),
    pts AS (
        SELECT dayn, cs AS t, 1 AS delta FROM clip
        UNION ALL
        SELECT dayn, ce AS t, -1 AS delta FROM clip
    ),
    sw AS (
        SELECT dayn, delta,
               SUM(delta) OVER (
                   PARTITION BY dayn ORDER BY t, delta DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS conc
        FROM pts
    )
    SELECT DATE '1970-01-01' + CAST(dayn AS INTEGER) AS day,
           CAST(COUNT(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_intervals,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM sw GROUP BY dayn
    """,
    "peak concurrent 30-min-gap sessions per UTC day via a day-"
    "partitioned sweep line over closed session intervals",
    tags=("analytics", "sessionization"),
)
def q_max_concurrency_events(spark, sf_dir):
    """Capacity planning over sessionize_batch's output
    (operators/sequences.py::interval_concurrency): sessions split at
    UTC midnights FIRST, so the +1/−1 sweep window partitions by day
    and never funnels the whole timeline through one sort — the global-
    sweep-line pitfall made parallel. Closed intervals: sessions
    touching at one microsecond are concurrent, and a one-event
    session still registers."""
    from pramen_spark.operators.sequences import interval_concurrency
    from pramen_spark.streaming.stream import sessionize_batch

    s = sessionize_batch(
        load_events(spark, sf_dir), "user_id", "ts", gap="30 minutes"
    )
    iv = s.select(
        F.unix_micros("session_start").alias("s_us"),
        F.unix_micros("session_end").alias("e_us"),
    )
    return interval_concurrency(iv, "s_us", "e_us")


@query(
    "acf_revenue_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    l AS (
        SELECT revenue AS x,
               lag(revenue, 1) OVER w AS y1, lag(revenue, 2) OVER w AS y2,
               lag(revenue, 3) OVER w AS y3, lag(revenue, 4) OVER w AS y4,
               lag(revenue, 5) OVER w AS y5, lag(revenue, 6) OVER w AS y6,
               lag(revenue, 7) OVER w AS y7
        FROM daily WINDOW w AS (ORDER BY day)
    ),
    st AS (
        SELECT 1 AS lag, x, y1 AS y FROM l UNION ALL
        SELECT 2, x, y2 FROM l UNION ALL
        SELECT 3, x, y3 FROM l UNION ALL
        SELECT 4, x, y4 FROM l UNION ALL
        SELECT 5, x, y5 FROM l UNION ALL
        SELECT 6, x, y6 FROM l UNION ALL
        SELECT 7, x, y7 FROM l
    ),
    a AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM st WHERE y IS NOT NULL GROUP BY lag
    )
    SELECT lag, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS acf
    FROM a
    """,
    "autocorrelation of daily revenue at lags 1-7 from decimal-exact "
    "co-moment sums: the weekly-cycle detector",
    tags=("analytics", "timegrid"),
)
def q_acf_revenue_daily(spark, sf_dir):
    """The window-size picker for every smoother in timegrid
    (operators/timegrid.py::autocorrelation): orders pre-aggregate to
    the DECIMAL-exact daily grid (the only order-volume stage), lags
    1..7 stack via one explode, and ONE aggregation produces all six
    co-moment sums per lag — products in IEEE double, sums in decimal,
    so the Pearson statistic never depends on reduce order. The
    unpartitioned LAG window sees only calendar-bounded daily rows."""
    from pramen_spark.operators.timegrid import autocorrelation

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return autocorrelation(daily, "revenue", "day", max_lag=7)


@query(
    "hhi_nation_suppliers",
    """
    WITH per AS (
        SELECT n.n_name, l.l_suppkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                    AS DECIMAL(18,4)) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           ROUND(CAST(MAX(v) AS DOUBLE) / CAST(SUM(v) AS DOUBLE), 6)
             AS top_share,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(19,4)) * v) AS DOUBLE)
                 / (CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)), 6)
             AS hhi
    FROM per GROUP BY n_name
    """,
    "Herfindahl-Hirschman supplier-concentration index of discounted "
    "revenue per nation, with top-supplier share",
    tags=("analytics", "skew"),
)
def q_hhi_nation_suppliers(spark, sf_dir):
    """Market concentration as exact arithmetic
    (operators/skew.py::herfindahl_index): supplier revenues sum as
    decimals, HHI is the ratio of two exact decimal reductions
    (Σv² / (Σv)²) — never the naive Σ(share²) double sum whose value
    depends on reduce order. Two map-side-combined aggregations; the
    second input is bounded by nations × suppliers."""
    from pramen_spark.operators.skew import herfindahl_index

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    joined = l.join(
        F.broadcast(s), l["l_suppkey"] == s["s_suppkey"]
    ).join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return herfindahl_index(joined, "n_name", "l_suppkey", rev).select(
        F.col("grp").alias("n_name"), "n_entities", "top_share", "hhi"
    )


@query(
    "kaplan_meier_events",
    """
    WITH s AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS rn
        FROM events WHERE event_type = 'signup'
    ),
    starts AS (SELECT user_id, us AS start_us, event_id AS start_event_id
               FROM s WHERE rn = 1),
    e AS (
        SELECT e.user_id, epoch_us(CAST(e.ts AS TIMESTAMP)) AS us,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id)
                   AS rn
        FROM events e JOIN starts st ON e.user_id = st.user_id
        WHERE e.event_type = 'purchase'
          AND (epoch_us(CAST(e.ts AS TIMESTAMP)) > st.start_us
               OR (epoch_us(CAST(e.ts AS TIMESTAMP)) = st.start_us
                   AND e.event_id > st.start_event_id))
    ),
    conv AS (SELECT user_id, us AS convert_us FROM e WHERE rn = 1),
    lastev AS (
        SELECT user_id, MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        FROM events GROUP BY user_id
    ),
    dur AS (
        SELECT (COALESCE(c.convert_us, l.last_us) - st.start_us)
                   // 86400000000 AS t,
               CASE WHEN c.convert_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM starts st
        JOIN lastev l ON st.user_id = l.user_id
        LEFT JOIN conv c ON st.user_id = c.user_id
    ),
    g AS (
        SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM dur GROUP BY t
    ),
    r AS (
        SELECT t, d,
               CAST(SUM(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                                 AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS at_risk
        FROM g
    ),
    f AS (
        SELECT t, d, at_risk,
               CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE) AS fac
        FROM r
    ),
    sw AS (
        SELECT t, d, at_risk,
               SUM(CASE WHEN fac > 0 THEN ln(fac) END) OVER w AS lnsum,
               MAX(CASE WHEN fac = 0 THEN 1 ELSE 0 END) OVER w AS zero
        FROM f
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT t AS time, d AS n_events, at_risk,
           CASE WHEN zero = 1 THEN 0.0
                ELSE ROUND(exp(COALESCE(lnsum, 0)), 6) END AS survival
    FROM sw WHERE d > 0
    """,
    "Kaplan-Meier survival curve of signup-to-purchase latency in days, "
    "right-censored at each user's last observed event",
    tags=("analytics", "evalmetrics"),
)
def q_kaplan_meier_events(spark, sf_dir):
    """Survival analysis over the conversion funnel
    (operators/evalmetrics.py::kaplan_meier, fed by sequences.py::
    time_to_convert): never-converted users enter as censored at their
    last observed event instead of being dropped — the bias the naive
    time_to_convert average has. Subjects collapse to the per-day
    duration histogram first; at-risk counts are a REVERSE running sum
    (no separate total), and the running product is exp(Σ ln) with an
    explicit zero flag so a 100%%-failure day pins survival to exact 0
    on both engines (Spark NULLs ln(0), DuckDB -infs it)."""
    from pramen_spark.operators.evalmetrics import kaplan_meier
    from pramen_spark.operators.sequences import time_to_convert

    ev = load_events(spark, sf_dir)
    t = time_to_convert(ev, "signup", "purchase")
    last = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts"))).alias("_last_us")
    )
    dur = t.join(last, "user_id").select(
        F.expr(
            "CAST((COALESCE(convert_us, _last_us) - start_us)"
            " DIV 86400000000 AS LONG)"
        ).alias("t_days"),
        F.col("convert_us").isNotNull().cast("int").alias("converted"),
    )
    return kaplan_meier(dur, "t_days", "converted")


@query(
    "theil_sen_daily",
    """
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    AS DOUBLE) AS x,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS y
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    slopes AS (
        SELECT (b.y - a.y) / (b.x - a.x) AS s
        FROM daily a JOIN daily b ON a.x < b.x
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               quantile_cont(s, 0.5) AS slope
        FROM slopes
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points, m.n_pairs,
           ROUND(m.slope, 6) AS slope,
           ROUND(quantile_cont(d.y - m.slope * d.x, 0.5), 6) AS intercept
    FROM daily d, m GROUP BY m.n_pairs, m.slope
    """,
    "Theil-Sen robust trend of daily revenue: median of all pairwise "
    "slopes plus median-residual intercept",
    tags=("analytics", "timegrid"),
)
def q_theil_sen_daily(spark, sf_dir):
    """The outlier-proof sibling of trend_slope_daily's OLS fit
    (operators/timegrid.py::theil_sen): orders collapse to the DECIMAL-
    exact daily grid first, so the O(days²) pair join is bounded by the
    CALENDAR (ten years ≈ 6.7M pairs), never data volume. Slopes are
    IEEE-double divisions; the interpolated median averages two order
    statistics — engine-exact on both sides."""
    from pramen_spark.operators.timegrid import theil_sen

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return theil_sen(daily, "revenue", "day")


@query(
    "woe_iv_events",
    """
    WITH th AS (
        SELECT [quantile_cont(value, 0.1), quantile_cont(value, 0.2),
                quantile_cont(value, 0.3), quantile_cont(value, 0.4),
                quantile_cont(value, 0.5), quantile_cont(value, 0.6),
                quantile_cont(value, 0.7), quantile_cont(value, 0.8),
                quantile_cont(value, 0.9)] AS t
        FROM events
    ),
    binned AS (
        SELECT CAST(1 + (CASE WHEN value > t[1] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[2] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[3] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[4] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[5] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[6] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[7] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[8] THEN 1 ELSE 0 END)
                      + (CASE WHEN value > t[9] THEN 1 ELSE 0 END)
                AS BIGINT) AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events, th
    ),
    g AS (
        SELECT bin, CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
               CAST(SUM(n - n_pos) AS BIGINT) AS tn
        FROM g
    )
    SELECT bin, n, n_pos,
           ROUND(CASE WHEN n_pos > 0 AND n - n_pos > 0
                 THEN ln((CAST(n_pos AS DOUBLE) / tp)
                         / (CAST(n - n_pos AS DOUBLE) / tn)) END, 6) AS woe,
           ROUND((CAST(n_pos AS DOUBLE) / tp
                  - CAST(n - n_pos AS DOUBLE) / tn)
                 * CASE WHEN n_pos > 0 AND n - n_pos > 0
                   THEN ln((CAST(n_pos AS DOUBLE) / tp)
                           / (CAST(n - n_pos AS DOUBLE) / tn)) END, 6)
             AS iv_component
    FROM g, tot
    """,
    "weight-of-evidence deciles of event value against the purchase "
    "label, with per-bin information value",
    tags=("analytics", "features"),
)
def q_woe_iv_events(spark, sf_dir):
    """Credit-scoring-style feature screening
    (operators/features.py::woe_iv): bins from ONE broadcast exact-
    percentile row (the rfm_scores pattern — never NTILE, whose tie
    placement is engine-dependent), WOE/IV from the 10-row bin table.
    Bins with zero positives or negatives NULL explicitly on both
    engines: Spark NULLs ln(0) while DuckDB returns -inf, so the guard
    is semantics, not style."""
    from pramen_spark.operators.features import woe_iv

    ev = load_events(spark, sf_dir)
    return woe_iv(
        ev, "value", (F.col("event_type") == "purchase"), bins=10
    )


@query(
    "posting_lists_documents",
    r"""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq,
           list_sort(list(doc_id))[1:1000] AS postings
    FROM tok WHERE token <> ''
    GROUP BY token HAVING COUNT(*) >= 5
    """,
    "inverted-index posting lists: per token with doc_freq >= 5, the "
    "sorted document-id list capped at the 1000 smallest ids",
    tags=("text", "scale"),
)
def q_posting_lists_documents(spark, sf_dir):
    """The index-build step behind bm25_relevance
    (operators/text.py::posting_lists): per-document dedup inside the
    row (array_distinct — no shuffle), one token-keyed aggregation,
    min_df pruning, and DETERMINISTIC truncation to the 1000 smallest
    doc ids per token so stopword lists cannot hold gigabytes in one
    reducer. Posting lists shard naturally by token — the layout a
    distributed index wants."""
    from pramen_spark.operators.text import posting_lists

    d = load_table(spark, sf_dir, "documents")
    return posting_lists(d, "doc_id", "text", min_df=5, max_postings=1000)


@query(
    "activity_streaks_events",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    isl AS (
        SELECT user_id, dayn,
               dayn - row_number() OVER (PARTITION BY user_id
                                         ORDER BY dayn) AS island
        FROM days
    ),
    per AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id AS user, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM per GROUP BY user_id
    """,
    "longest consecutive-day activity streak per user via the "
    "gaps-and-islands row_number trick, exact integers",
    tags=("analytics", "sequences"),
)
def q_activity_streaks_events(spark, sf_dir):
    """Retention's streak metric (operators/sequences.py::
    activity_streaks): the raw log collapses to distinct (user, day)
    FIRST — the only event-volume stage — then day_number −
    row_number() is constant exactly along consecutive runs. One
    user-keyed shuffle; windows see at most one row per user-day."""
    from pramen_spark.operators.sequences import activity_streaks

    return activity_streaks(load_events(spark, sf_dir), "user_id", "ts")


@query(
    "spearman_quantity_price",
    """
    WITH base AS (
        SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    gx AS (SELECT x AS v, COUNT(*) AS c FROM base GROUP BY x),
    rx AS (
        SELECT v, CAST(2 * COALESCE(SUM(c) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS r2
        FROM gx
    ),
    gy AS (SELECT y AS v, COUNT(*) AS c FROM base GROUP BY y),
    ry AS (
        SELECT v, CAST(2 * COALESCE(SUM(c) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS r2
        FROM gy
    ),
    j AS (
        SELECT rx.r2 AS a, ry.r2 AS b
        FROM base JOIN rx ON base.x = rx.v JOIN ry ON base.y = ry.v
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(a AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a * b AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(a * a AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b * b AS DECIMAL(38,0))) AS DOUBLE) AS syy
        FROM j
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS rho
    FROM s
    """,
    "exact tie-aware Spearman rank correlation of quantity vs extended "
    "price via histogram-derived doubled ranks",
    tags=("analytics", "drift"),
)
def q_spearman_quantity_price(spark, sf_dir):
    """Monotone association without a global row sort
    (operators/drift.py::spearman): average ranks depend only on the
    VALUE HISTOGRAM — (#smaller, #equal) per distinct value (the auc
    trick) — so ranks come from domain-bounded running sums and join
    back by value. Doubled ranks (2·#smaller + #equal + 1) keep tie
    half-ranks integer-exact; Pearson is scale-invariant so rho is
    unchanged, and every co-moment reduces as DECIMAL — the statistic
    is bit-reproducible at any cluster size."""
    from pramen_spark.operators.drift import spearman

    l = load_table(spark, sf_dir, "lineitem")
    return spearman(l, "l_quantity", "l_extendedprice")


@query(
    "cohort_ltv_orders",
    """
    WITH base AS (
        SELECT o_custkey AS ent,
               year(o_orderdate) * 12 + month(o_orderdate) AS mnum,
               CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders
    ),
    c AS (
        SELECT ent, mnum, v, MIN(mnum) OVER (PARTITION BY ent) AS cohort
        FROM base
    ),
    tri AS (
        SELECT cohort, CAST(mnum - cohort AS BIGINT) AS month_offset,
               CAST(COUNT(DISTINCT ent) AS BIGINT) AS n_active,
               CAST(SUM(v) AS DECIMAL(18,2)) AS rev
        FROM c GROUP BY cohort, month_offset
    )
    SELECT make_date(CAST((cohort - 1) // 12 AS INTEGER),
                     CAST((cohort - 1) % 12 + 1 AS INTEGER), 1)
             AS cohort_month,
           month_offset, n_active,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY month_offset
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE) AS cum_revenue
    FROM tri
    """,
    "cohort lifetime-value triangle: customers cohorted by first-order "
    "month, per-offset revenue and the cumulative LTV curve",
    tags=("analytics", "features"),
)
def q_cohort_ltv_orders(spark, sf_dir):
    """The revenue twin of the retention triangle
    (operators/features.py::cohort_ltv): cohort month via one
    per-customer window over (customer, month) pairs, DECIMAL monthly
    cells, and a calendar-bounded window for the cumulative — month
    offsets are integer year·12+month arithmetic, never float
    months_between."""
    from pramen_spark.operators.features import cohort_ltv

    o = load_table(spark, sf_dir, "orders")
    return cohort_ltv(
        o,
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)"),
    )


@query(
    "new_vs_returning_events",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn
        FROM events
    ),
    f AS (
        SELECT user_id, dayn,
               MIN(dayn) OVER (PARTITION BY user_id) AS first_day
        FROM days
    )
    SELECT DATE '1970-01-01' + CAST(dayn AS INTEGER) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN dayn = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN dayn <> first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning
    FROM f GROUP BY dayn
    """,
    "daily growth accounting: distinct active users split into "
    "first-ever-seen vs returning",
    tags=("analytics", "sequences"),
)
def q_new_vs_returning_events(spark, sf_dir):
    """The decomposition under every DAU chart
    (operators/sequences.py::new_vs_returning): the log collapses to
    distinct (user, day) first, each user's first day is one window
    min over those pairs — never a join of events against their own
    minimum. All exact integers."""
    from pramen_spark.operators.sequences import new_vs_returning

    return new_vs_returning(load_events(spark, sf_dir), "user_id", "ts")


@query(
    "runs_test_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(revenue, 0.5) AS m FROM daily),
    s AS (
        SELECT day, CASE WHEN revenue > m THEN 1 ELSE 0 END AS sgn
        FROM daily, med WHERE revenue <> m
    ),
    fl AS (
        SELECT sgn,
               CASE WHEN lag(sgn) OVER w IS NULL
                         OR lag(sgn) OVER w <> sgn
                    THEN 1 ELSE 0 END AS newrun
        FROM s WINDOW w AS (ORDER BY day)
    ),
    a AS (
        SELECT CAST(SUM(sgn) AS BIGINT) AS n_pos,
               CAST(SUM(1 - sgn) AS BIGINT) AS n_neg,
               CAST(SUM(newrun) AS BIGINT) AS n_runs
        FROM fl
    )
    SELECT n_pos, n_neg, n_runs,
           ROUND((CAST(n_runs AS DOUBLE)
                  - (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                     / (CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
                     + 1.0))
                 / sqrt(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                        * (2.0 * CAST(n_pos AS DOUBLE)
                           * CAST(n_neg AS DOUBLE)
                           - CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))
                        / ((CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
                           * (CAST(n_pos AS DOUBLE)
                              + CAST(n_neg AS DOUBLE))
                           * (CAST(n_pos AS DOUBLE)
                              + CAST(n_neg AS DOUBLE) - 1.0))), 6) AS z
    FROM a
    """,
    "Wald-Wolfowitz runs test of daily revenue around its median: "
    "exact run counts and the closed-form z statistic",
    tags=("analytics", "anomaly"),
)
def q_runs_test_daily(spark, sf_dir):
    """The i.i.d. sanity screen before trusting alerting thresholds
    (operators/anomaly.py::runs_test): median-equal days drop (the
    standard convention), runs count as 1 + sign flips over the
    calendar-bounded daily grid, and the z statistic is scalar
    arithmetic on the one exact-integer result row."""
    from pramen_spark.operators.anomaly import runs_test

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return runs_test(daily, "revenue", "day")


@query(
    "grubbs_test_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(revenue * revenue AS DECIMAL(38,6)))
                    AS DOUBLE) AS s2
        FROM daily
    ),
    en AS (
        SELECT n, s1 / CAST(n AS DOUBLE) AS m,
               sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 AS sd
        FROM st
    )
    SELECT en.n, d.day AS "at", ROUND(d.revenue, 6) AS value,
           ROUND(abs(d.revenue - en.m) / en.sd, 6) AS g_stat
    FROM daily d, en
    ORDER BY abs(d.revenue - en.m) DESC, d.day DESC LIMIT 1
    """,
    "Grubbs' max-studentized-deviate test on daily revenue: the single "
    "most extreme day and its distance in sample standard deviations",
    tags=("analytics", "anomaly"),
)
def q_grubbs_test_daily(spark, sf_dir):
    """The parametric partner of anomaly_mad_daily
    (operators/anomaly.py::grubbs_test): mean/variance from
    DECIMAL-exact Σv and Σv² in one pass, the outlier an argmax over a
    (deviation, day) struct with a deterministic date tiebreak —
    everything after the single aggregation is scalar arithmetic on a
    broadcast row."""
    from pramen_spark.operators.anomaly import grubbs_test

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return grubbs_test(daily, "revenue", "day")


@query(
    "forecast_backtest_daily",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    ),
    l AS (
        SELECT revenue AS y, lag(revenue, 7) OVER (ORDER BY day) AS f
        FROM daily
    ),
    p AS (SELECT y, f FROM l WHERE f IS NOT NULL),
    a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(abs(y - f) AS DECIMAL(38,6))) AS DOUBLE)
                 AS sae,
               CAST(SUM(CAST((y - f) * (y - f) AS DECIMAL(38,6)))
                    AS DOUBLE) AS sse,
               CAST(SUM(CAST(abs(y - f) / abs(y) AS DECIMAL(38,6)))
                    AS DOUBLE) AS sap
        FROM p
    )
    SELECT n, ROUND(sae / CAST(n AS DOUBLE), 6) AS mae,
           ROUND(sqrt(sse / CAST(n AS DOUBLE)), 6) AS rmse,
           ROUND(sap / CAST(n AS DOUBLE), 6) AS mape
    FROM a
    """,
    "seasonal-naive (same-day-last-week) forecast backtest on daily "
    "revenue: MAE, RMSE, MAPE",
    tags=("analytics", "timegrid"),
)
def q_forecast_backtest_daily(spark, sf_dir):
    """The evaluation floor every forecast must beat
    (operators/timegrid.py::forecast_backtest): ŷ_t = y_{t−7} via one
    LAG over the calendar-bounded daily grid; absolute errors, squares
    (as products, never pow) and percentage ratios sum as decimals so
    the metrics are reduce-order independent."""
    from pramen_spark.operators.timegrid import forecast_backtest

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return forecast_backtest(daily, "revenue", "day", season=7)


@query(
    "price_elasticity_lineitem",
    """
    WITH base AS (
        SELECT ln(1 - l_discount) AS x, ln(l_quantity) AS y
        FROM lineitem WHERE l_quantity > 0 AND l_discount < 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
        FROM base
    )
    SELECT n,
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
    "log-log OLS of quantity on effective price factor (1 - discount): "
    "the price-elasticity regression from decimal-exact co-moments",
    tags=("analytics", "drift"),
)
def q_price_elasticity_lineitem(spark, sf_dir):
    """The elasticity readout every pricing team fits first
    (operators/drift.py::ols_fit): ln transforms are per-row IEEE
    doubles, co-moments sum as DECIMALs (the autocorrelation/spearman
    discipline), and slope/intercept/R² are scalar arithmetic on one
    row. One map-side-combined pass over lineitem."""
    from pramen_spark.operators.drift import ols_fit

    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 0) & (F.col("l_discount") < 1)
    )
    return ols_fit(
        l, F.log(F.lit(1) - F.col("l_discount")), F.log("l_quantity")
    )


@query(
    "repeat_purchase_interval_events",
    """
    WITH p AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT CAST(us - lag(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) AS DOUBLE)
               / 86400000000.0 AS gap
        FROM p
    ),
    k AS (SELECT gap FROM g WHERE gap IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(CAST(SUM(CAST(gap AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_days,
           ROUND(quantile_cont(gap, 0.25), 6) AS p25,
           ROUND(quantile_cont(gap, 0.5), 6) AS p50,
           ROUND(quantile_cont(gap, 0.75), 6) AS p75
    FROM k
    """,
    "repeat-purchase cadence: quartiles and mean of fractional-day "
    "gaps between each user's consecutive purchases",
    tags=("analytics", "sequences"),
)
def q_repeat_purchase_interval_events(spark, sf_dir):
    """Reorder-timing and churn-window calibration
    (operators/sequences.py::inter_event_gaps): one user-partitioned
    window with a (ts, id) tiebreak, gaps as IEEE-double divisions of
    microsecond longs, decimal-exact mean and interpolated quartiles
    in one global reduce."""
    from pramen_spark.operators.sequences import inter_event_gaps

    ev = load_events(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    return inter_event_gaps(ev, "user_id", "ts", "event_id")


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
                                       || CAST(b.b AS VARCHAR)), 1, 8))
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


# ---------------------------------------------------------------------------
# Driver correctness-window ordering.
#
# The driver's per-round correctness gate checks the FIRST 50 entries of
# ``QUERIES`` in iteration order. Registration order above is historical
# (operators were added round by round), which left 17 of the 22 TPC-H
# adaptations and several extension operators outside the audited window.
# Rebuild the dict in priority order: SURVEY.md §2 operator queries, the
# full TPC-H set, the strongest oracle-checked extension operators, then
# the remaining oracle-checked queries, with rows-only (no DuckDB oracle)
# queries last. Stable within each tier by registration order, and any
# query not named below falls into its tier automatically — adding a new
# query never silently drops an audited one out of order.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_PRIORITY = [
    # tier 0: SURVEY.md §2 operator queries (11)
    "projection", "schema_transform", "filter_macro", "infodate_injection",
    "batchid_injection", "column_sanitation", "record_count",
    "date_range_read", "latest_partition", "incremental_offset",
    "offset_minmax",
    # tier 1: full TPC-H set (22)
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q6_revenue_forecast",
    "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_by_linestatus",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q20_promotable_suppliers", "q21_waiting_suppliers",
    "q22_dormant_customers",
    # tier 2: flagship + strongest oracle-checked extension operators (17).
    # Rotated each round so every family gets driver CORRECTNESS rows over
    # time. Round 8 (the VERDICT r7 ask #3 rotation): in = the eight
    # queries that never had a driver row (scd2, reconcile, hits, weighted
    # sample, incremental minhash, MAD anomaly, skew profile, readability)
    # plus the six new round-8 operators; out = the round-6/7 flagships
    # with green driver rows in BOTH r6 and r7 (curate_corpus, dedup_exact,
    # minhash_dedup, dedup_clusters, semdedup, gopher, char_lm,
    # paragraph/line/substring dedup, validate, pack_utilization,
    # apply_cdc, pagerank — all still oracle-checked every round by
    # tools/check_oracle.py + pytest's out-of-window sweep).
    "scd2_customer_status", "reconcile_orders_copy",
    "hits_purchase_graph", "weighted_sample_documents",
    "minhash_incremental_batch", "anomaly_mad_daily",
    "skew_profile_orders", "readability_documents",
    # round-8 additions: skew action, global curriculum, real image
    # header decode, incremental SCD2, bucketed-state join merge
    "salted_agg_lineitem", "salted_join_lineitem",
    "curriculum_global_documents", "image_dimensions_documents",
    "scd2_incremental_customer", "incremental_agg_join_lineitem",
    # continuity keepers (one green driver row each, round 7)
    "stream_windowed_counts", "leakage_safe_split_documents",
    "quality_classifier",
]


def _query_order(item):
    name, spec = item
    if name in _DRIVER_WINDOW_PRIORITY:
        return (0, _DRIVER_WINDOW_PRIORITY.index(name))
    # oracle-checked queries before rows-only ones; stable otherwise
    return (1 if spec.oracle is not None else 2, 0)


QUERIES = dict(
    sorted(QUERIES.items(), key=lambda kv: (_query_order(kv), ))
)
