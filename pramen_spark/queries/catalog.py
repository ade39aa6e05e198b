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

import datetime as _dt


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark only reads as a
    long (spark.sql.legacy.parquet.nanosAsLong). Convert to a micros
    timestamp with integer division (a double division would lose precision
    on epoch-nanos magnitudes)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
