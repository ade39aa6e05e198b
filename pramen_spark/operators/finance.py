"""Finance-analytics operators: revenue-bridge decomposition and
ABC/Pareto classification — the explain-the-delta and focus-the-effort
readouts every revenue review opens with.

Both follow the catalog's exactness discipline: money aggregates as
DECIMAL (reduce-order independent), and the only float steps are final
scalar divisions/products on already-reduced cells.

Scale: each operator is one map-side-combined aggregation over the fact
table into a DOMAIN-bounded cell table (brands × periods, or the part
catalog), with all windows/joins running on that bounded table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pvm_bridge(
    df: DataFrame,
    group_col: str,
    period_col,
    period_a,
    period_b,
    qty_col: str,
    amount_expr,
) -> DataFrame:
    """Price-volume(-mix) bridge between two periods, per group: splits
    each group's revenue change into a VOLUME effect (quantity moved at
    old prices, (q₂−q₁)·p₁) and a PRICE effect (price moved on new
    volume, (p₂−p₁)·q₂) — the standard waterfall that explains "why is
    revenue up 4%" in terms a pricing team can act on. The two effects
    sum to the total change exactly in real arithmetic (telescoping),
    so the residual is a float-rounding audit, not a mix bucket.

    Quantities and amounts reduce as DECIMALs per (group, period);
    average prices and the effects are scalar arithmetic on the joined
    two-period cell row. Groups absent from either period drop (their
    whole revenue IS the change; report them separately).

    Returns (group, qty_a, qty_b, rev_a, rev_b, volume_effect,
    price_effect), rounds 6.
    """
    cells = (
        df.where(period_col.isin([period_a, period_b]))
        .groupBy(
            F.col(group_col).alias("grp"), period_col.alias("_per")
        )
        .agg(
            # no post-sum scale reduction: a cast back to cents rounds
            # HALF_UP on Spark and HALF_EVEN on DuckDB — keep the sum's
            # exact full scale and convert to double once
            F.sum(F.col(qty_col).cast("decimal(18,2)")).alias("_q"),
            F.sum(amount_expr).alias("_r"),
        )
    )
    a = cells.where(F.col("_per") == period_a).select(
        "grp",
        F.col("_q").cast("double").alias("qty_a"),
        F.col("_r").cast("double").alias("rev_a"),
    )
    b = cells.where(F.col("_per") == period_b).select(
        "grp",
        F.col("_q").cast("double").alias("qty_b"),
        F.col("_r").cast("double").alias("rev_b"),
    )
    j = a.join(b, "grp")
    p1 = F.col("rev_a") / F.col("qty_a")
    p2 = F.col("rev_b") / F.col("qty_b")
    return j.select(
        "grp",
        "qty_a",
        "qty_b",
        "rev_a",
        "rev_b",
        F.round((F.col("qty_b") - F.col("qty_a")) * p1, 6).alias(
            "volume_effect"
        ),
        F.round((p2 - p1) * F.col("qty_b"), 6).alias("price_effect"),
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_expr,
    a_share: float = 0.8,
    b_share: float = 0.95,
) -> DataFrame:
    """ABC / Pareto classification: rank entities by value, split them
    at cumulative-share breakpoints (A carries the first ``a_share`` of
    total value, B up to ``b_share``, C the tail), and report each
    class's entity count and value share — "which 20% of parts are 80%
    of revenue". An entity straddling a breakpoint classifies by its
    own cumulative share (the standard convention).

    Per-entity values reduce as DECIMALs; the cumulative is a window
    sum of decimals over the ENTITY table (domain-bounded — the part
    catalog, not lineitem) with a deterministic (value desc, key)
    order, and the share thresholds compare exact decimal cumulative
    against decimal total · share computed in double only at the
    comparison.

    Returns one row per class: (abc_class, n_keys, value, share).
    """
    per = df.groupBy(F.col(key_col).alias("_k")).agg(
        # exact full-scale decimal sum (a cents recast would round
        # HALF_UP on Spark vs HALF_EVEN on DuckDB)
        F.sum(value_expr).alias("_v")
    )
    w_cum = Window.orderBy(F.desc("_v"), F.asc("_k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.desc("_v"), F.asc("_k")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "_v",
        F.sum("_v").over(w_cum).alias("_cum"),
        F.sum("_v").over(w_all).alias("_tot"),
    )
    cum_share = F.col("_cum").cast("double") / F.col("_tot").cast("double")
    cls = (
        F.when(cum_share <= F.lit(float(a_share)), F.lit("A"))
        .when(cum_share <= F.lit(float(b_share)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        ranked.select(cls.alias("abc_class"), "_v", "_tot")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("_v").cast("double").alias("value"),
            F.round(
                F.sum("_v").cast("double") / F.max("_tot").cast("double"), 6
            ).alias("share"),
        )
    )


def lorenz_curve(
    df: DataFrame,
    key_col: str,
    value_expr,
    n_buckets: int = 10,
) -> DataFrame:
    """Lorenz curve in ``n_buckets`` points: entities sort by value
    ascending and each decile reports its cumulative share of total
    value — the curve whose area doubles into the Gini coefficient
    (evalmetrics.py::gini gives the scalar; this gives the SHAPE the
    scalar hides: is inequality in a thin top or a thick bottom?).

    Per-entity values reduce as DECIMALs; ranking uses row_number with
    a deterministic (value, key) tiebreak over the DOMAIN-bounded
    entity table (the abc_classification contract), bucket assignment
    is pure integer arithmetic ((r−1)·k DIV n + 1), and cumulative
    shares divide exact decimal sums once per bucket row.

    Returns (bucket, n_keys, value, cum_share), rounds 6.
    """
    per = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.sum(value_expr).alias("_v")
    )
    w = Window.orderBy(F.asc("_v"), F.asc("_k"))
    tot = Window.orderBy(F.asc("_v"), F.asc("_k")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "_v",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(tot).alias("_n"),
        F.sum("_v").over(tot).alias("_tot"),
    )
    bucket = F.expr(f"CAST((_r - 1) * {int(n_buckets)} DIV _n + 1 AS LONG)")
    g = ranked.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_v").alias("_bv"),
        F.max("_tot").alias("_t"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        "bucket",
        "n_keys",
        F.col("_bv").cast("double").alias("value"),
        F.round(
            F.sum("_bv").over(w_cum).cast("double")
            / F.col("_t").cast("double"),
            6,
        ).alias("cum_share"),
    )
