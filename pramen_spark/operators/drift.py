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

from pyspark.sql import DataFrame
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
