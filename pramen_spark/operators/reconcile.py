"""Table reconciliation: verify that two tables (a source and its
ingested/derived copy) agree — WITHOUT moving or sorting rows — by
comparing per-bucket row counts and order-independent content digests,
the Merkle/rsync pattern applied to warehouse tables.

Reference context: the reference records per-table record counts at write
time (MetastorePersistence) and validates them in pre-run checks; this
extends that integrity story to row CONTENT, still at aggregate cost.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit separator: a delimiter that cannot appear in normal column text;
# the null sentinel is printable (no NUL byte — oracle engines reject
# embedded NUL in varchar) and separator-wrapped so it cannot collide
_SEP = "\x1f"
_NULL = "\x1e[[null]]\x1e"


def bucket_expr(key_cols: Sequence[str], num_buckets: int) -> F.Column:
    """The bucket assignment reconcile_tables uses, as a reusable column
    expression — callers re-apply it to FILTER a table down to suspect
    buckets for the Merkle descent (drill into a mismatched bucket with
    a finer num_buckets, touching only that bucket's rows)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        _SEP,
                        *[
                            F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
                            for c in key_cols
                        ],
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(num_buckets),
    )


def _digest(cols: Sequence[str]) -> F.Column:
    """Order-independent-aggregatable row digest: md5 of the
    null-sentineled, separator-joined column values, first 15 hex chars
    as a 60-bit integer (portable: any engine with md5 reproduces it)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10
    ).cast("long")


def reconcile_tables(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    value_cols: Optional[Sequence[str]] = None,
    num_buckets: int = 256,
) -> DataFrame:
    """Compare two tables bucket by bucket:
    (bucket, n_left, n_right, digest_left, digest_right, match).

    Rows land in a bucket by the md5 of their KEY columns (so the same
    logical row lands in the same bucket on both sides even when its
    values differ), and each bucket reduces to a row count plus a
    BIT_XOR of full-row digests — order-independent, so no sort, and a
    single missing/extra/changed row flips its bucket's digest. A row
    count equal but digest unequal bucket means changed values; count
    drift means missing/extra rows. Buckets with no rows on either side
    are absent from the output.

    XOR caveat (standard for Merkle-style digests): a bucket containing
    two IDENTICAL full rows XORs them away — the row COUNT still catches
    the difference, which is why both are compared.

    Scale (100 TB): each side is ONE map-side-combined aggregation down
    to ``num_buckets`` rows — the shuffle carries (bucket, count, 8-byte
    digest) partials, never rows — and the comparison joins two
    KB-scale aggregates. Drill-down: re-run on a suspect bucket's rows
    (filter by the same bucket expression) with more buckets, the
    classic Merkle descent, each level again one aggregate pass."""
    keys = list(key_cols)
    vals = list(value_cols) if value_cols is not None else [
        c for c in left.columns if c not in keys
    ]
    bucket = bucket_expr(keys, num_buckets)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                bucket.alias("bucket"), _digest(keys + vals).alias("_d")
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
                F.expr("bit_xor(_d)").alias(f"digest_{tag}"),
            )
        )

    l_agg = side(left, "left")
    r_agg = side(right, "right")
    joined = l_agg.join(r_agg, "bucket", "full_outer")
    n_l = F.coalesce(F.col("n_left"), F.lit(0)).cast("long")
    n_r = F.coalesce(F.col("n_right"), F.lit(0)).cast("long")
    return joined.select(
        F.col("bucket").cast("long").alias("bucket"),
        n_l.alias("n_left"),
        n_r.alias("n_right"),
        F.col("digest_left"),
        F.col("digest_right"),
        (
            (n_l == n_r)
            & F.coalesce(
                F.col("digest_left") == F.col("digest_right"), F.lit(False)
            )
        ).alias("match"),
    )


def reconcile_drilldown(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    value_cols: Optional[Sequence[str]] = None,
    coarse_buckets: int = 16,
    fine_buckets: int = 256,
) -> DataFrame:
    """One step of the Merkle descent: reconcile coarsely, then
    re-reconcile ONLY the rows of mismatched coarse buckets at fine
    granularity. Output schema is reconcile_tables' at the fine level;
    matching coarse buckets contribute nothing, so the second pass scans
    a fraction of each table proportional to the damage. Iterating this
    (filter by ``bucket_expr`` on the suspect fine buckets, re-bucket
    finer) narrows a 100 TB diff to the changed keys in O(log) passes,
    each an aggregate — rows still never move.

    The mismatched coarse-bucket ids are collected to the driver — a
    control-plane list of at most ``coarse_buckets`` integers, the same
    envelope class as a file listing. No mismatches → empty output."""
    keys = list(key_cols)
    coarse = reconcile_tables(left, right, keys, value_cols, coarse_buckets)
    bad = [
        r["bucket"] for r in coarse.filter(~F.col("match")).select("bucket").collect()
    ]
    b = bucket_expr(keys, coarse_buckets)
    return reconcile_tables(
        left.filter(b.isin(bad)),
        right.filter(b.isin(bad)),
        keys,
        value_cols,
        fine_buckets,
    )
