"""Sampling and distribution operators for training-data pipelines.

- Deterministic hash sampling: sample membership is a pure function of a
  key (md5 prefix), so the same rows are selected on every run, every
  cluster size, and every engine — the property training-data splits
  need (train/val/test must not drift between pipeline runs). Plain
  ``df.sample`` is seed-dependent on partitioning and not reproducible
  across engines.
- Stratified sampling: per-stratum fractions via the same hash trick.
- Sequence-length histogram: fixed-width bucket counts of token lengths —
  the length-distribution report run before choosing packing/truncation
  parameters.

All pure DataFrame ops; a single shuffle only where an aggregation needs
one.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Size gate for the exact-percentile family (VERDICT r13 #2): the exact
# path buffers ONE sorted double array per aggregation task (~8 B/row) —
# oracle-exact and fast at test scale, an OOM on an ungrouped 100 TB
# column. Above this per-buffer row count the operators swap to
# percentile_approx; 10M doubles ~= 80 MB, comfortably inside an executor
# but far beyond any scale the exact path is needed at. The license for
# the swap is the oracle-pinned accuracy contract
# (queries/curation_advanced.py::approx_quantile_contract_lineitem):
# percentile_approx at this accuracy lands inside the exact
# +-0.001-rank quantile envelope (Greenwald-Khanna rank error <=
# n/accuracy = 1e-4, a 10x margin).
EXACT_PERCENTILE_ROW_LIMIT = 10_000_000
PERCENTILE_APPROX_ACCURACY = 10_000


def _max_percentile_buffer_rows(df: DataFrame, group_col: Optional[str]) -> int:
    """Rows the largest exact-percentile buffer would hold: the biggest
    group (grouped) or the whole input (global). One map-side-combined
    counting pass — a count job is cheap insurance against a
    hundreds-of-GB single-task sort buffer."""
    if group_col is None:
        return df.count()
    row = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))  # explicit alias: a column
        .agg(F.max("__n"))  # literally named 'count' must not collide
        .collect()[0]
    )
    return int(row[0] or 0)


def _hash_unit(key_col: str) -> F.Column:
    """Uniform [0, 1) from the md5 of the key's string form: the first 8
    hex chars as an integer / 16^8. md5 is available in every engine
    (reproducible oracle), uniform enough for sampling."""
    return F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic sample: keeps rows whose hash-unit < fraction.
    ``salt`` derives independent samples from the same keys (e.g. 'val'
    vs 'test' splits)."""
    col = key_col
    if salt:
        df = df.withColumn("_salted", F.concat(F.col(key_col).cast("string"), F.lit(salt)))
        col = "_salted"
    out = df.filter(_hash_unit(col) < fraction)
    return out.drop("_salted") if salt else out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Disjoint named splits covering the whole input: adds a ``split``
    column by cumulative fraction ranges of the hash unit."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"Split fractions must sum to 1, got {total}")
    df = df.withColumn("_salted", F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    u = _hash_unit("_salted")
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float edge: u == 1.0 impossible, but guard with the last name
    expr = expr.otherwise(F.lit(list(fractions)[-1]))
    return df.withColumn("split", expr).drop("_salted")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy, reproducibly)."""
    u = _hash_unit(key_col)
    frac = None
    for value, f_ in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        frac = F.when(cond, F.lit(f_)) if frac is None else frac.when(cond, F.lit(f_))
    frac = frac.otherwise(F.lit(default_fraction))
    return df.filter(u < frac)


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
    bucket_width: int = 50,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Token-length histogram: (group..., bucket_lo, n_docs). Token count
    is whitespace-split size; buckets are [k*w, (k+1)*w). Partial counts
    combine map-side — the shuffle carries one row per (group, bucket)."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bucket_lo = (F.floor(n_tokens / bucket_width) * bucket_width).cast("long")
    return (
        df.select(*group_cols, bucket_lo.alias("bucket_lo"))
        .groupBy(*group_cols, "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: Dict[str, int],
    group_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    num_buckets: int = 256,
    token_count_col: Optional[str] = None,
) -> DataFrame:
    """Corpus mixing to a token budget: per group, take documents in
    deterministic md5-pseudo-random order until the group's cumulative
    whitespace-token count reaches its budget (a document that would
    cross the budget is excluded). This is the 'compose a training mix
    of N_g tokens per language/source' operation; the hash order makes
    the selected set a pure function of the keys — identical across
    runs, cluster sizes, and engines.

    Returns (key, group, n_tokens, cum_tokens).

    Scale: the naive formulation is one ordered cumsum window per group —
    a SINGLE sequential partition holding billions of rows. Instead the
    hash-unit order is range-split into ``num_buckets``: per-(group,
    bucket) token sums (map-side combined; the shuffle carries
    groups x buckets rows) give each bucket's starting offset, buckets
    that start at/after the budget are pruned BEFORE any row-level work
    (for budget << corpus, almost all of them), and the within-bucket
    cumsum windows partition on (group, bucket) — num_buckets-way
    parallel. The selected set is identical to the naive one because
    bucket order is a monotone prefix of the (u, key) order.
    """
    # token_count_col upgrades the budget from the whitespace ESTIMATE to
    # exact counts (e.g. operators/text.py bpe_encode's n_bpe_tokens).
    if token_count_col is not None:
        n_tokens = F.col(token_count_col).cast("long")
    else:
        n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    d = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        _hash_unit(key_col).alias("u"),
        n_tokens.alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(F.floor(F.col("u") * num_buckets), F.lit(num_buckets - 1)).cast("long"),
    )

    budget = None
    for k, v in budgets.items():
        budget = (
            F.when(F.col("grp") == k, F.lit(int(v)))
            if budget is None
            else budget.when(F.col("grp") == k, F.lit(int(v)))
        )
    budget = (
        budget.otherwise(F.lit(int(default_budget)))
        if budget is not None
        else F.lit(int(default_budget))
    )

    from pyspark.sql import Window as W

    per_bucket = d.groupBy("grp", "bucket").agg(F.sum("n_tokens").alias("btok"))
    wb = (
        W.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        per_bucket.withColumn("cum_before", F.coalesce(F.sum("btok").over(wb), F.lit(0)))
        .withColumn("budget", budget)
        .filter(F.col("cum_before") < F.col("budget"))
        .select("grp", "bucket", "cum_before", "budget")
    )

    ww = (
        W.partitionBy("grp", "bucket")
        .orderBy("u", "key")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), ["grp", "bucket"])
        .withColumn("cum_tokens", F.col("cum_before") + F.sum("n_tokens").over(ww))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select(
            F.col("key").alias(key_col),
            F.col("grp").alias(group_col),
            "n_tokens",
            "cum_tokens",
        )
    )


def mixture_weights(
    df: DataFrame,
    target_shares: Dict[str, float],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group sampling rates that realize a target training mixture.

    Given desired mixture proportions ``target_shares`` (need not sum to
    1 — they are normalized), compute the LARGEST total token budget T
    achievable with per-group sampling rates <= 1 (no upsampling):
    T = min_g(tokens_g / share_g), then rate_g = share_g * T / tokens_g —
    the scarcest group relative to its target share is the binding one
    (rate 1.0) and every other group downsamples to keep the mixture
    exact. Groups absent from ``target_shares`` get share 0 / rate 0.

    Returns (group, n_docs, n_tokens, target_share, sample_rate,
    sampled_tokens) — feed ``sample_rate`` to ``stratified_hash_sample``
    to materialize the mix deterministically.

    Scale: ONE map-side-combined aggregation over the corpus (groups x 1
    rows out); the budget scalar is a broadcast 1-row aggregate; all
    arithmetic is exact-order double math the oracle reproduces."""
    total_share = float(sum(target_shares.values()))
    share = None
    for k, v in target_shares.items():
        normalized = F.lit(float(v) / total_share)
        share = (
            F.when(F.col("grp") == k, normalized)
            if share is None
            else share.when(F.col("grp") == k, normalized)
        )
    share = share.otherwise(F.lit(0.0)) if share is not None else F.lit(0.0)

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    per_group = (
        df.select(F.col(group_col).alias("grp"), n_tokens.alias("n_tokens"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn("target_share", share)
    )
    budget = per_group.filter(F.col("target_share") > 0).agg(
        F.min(F.col("n_tokens") / F.col("target_share")).alias("_budget")
    )
    rate = F.when(
        F.col("target_share") > 0,
        F.least(
            F.col("target_share") * F.col("_budget") / F.col("n_tokens"),
            F.lit(1.0),
        ),
    ).otherwise(F.lit(0.0))
    return (
        per_group.crossJoin(F.broadcast(budget))
        .withColumn("sample_rate", rate)
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            "target_share",
            "sample_rate",
            (F.col("sample_rate") * F.col("n_tokens")).alias("sampled_tokens"),
        )
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic uniform shard assignment: shard = floor(hash_unit(key)
    * n_shards). The shard of a row is a pure function of its key —
    identical across runs, cluster sizes, and engines — which is what a
    training-data export needs (re-running the pipeline must not move
    examples between shards, or downstream data-order-dependent training
    runs stop being reproducible).

    Uniform in expectation; at export scale (millions of docs per shard)
    the relative imbalance is O(1/sqrt(docs_per_shard)) — negligible.
    For token-balanced PACKING inside a shard, compose with
    operators/packing.py::pack_sequences (sharded first-fit-decreasing).

    Pure narrow column expression — adds no shuffle; the writer decides
    whether to repartition on the shard id.
    """
    u = _hash_unit(key_col)
    return df.withColumn(
        shard_col,
        F.least(F.floor(u * n_shards), F.lit(n_shards - 1)).cast("long"),
    )


def upsample_to_epochs(
    df: DataFrame,
    epochs: Dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_epochs: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """Materialize per-source epoch weights by deterministic replication:
    a document in a group weighted ``e`` epochs appears ``floor(e)`` or
    ``ceil(e)`` times, the fractional extra copy chosen by the document's
    hash unit (so exactly the right FRACTION of each group repeats, and
    WHICH documents repeat is a pure function of their keys). This is the
    'high-quality source x3.5 epochs' step of LLaMA-style data recipes —
    the upsampling counterpart of :func:`mixture_weights`, which only
    downsamples.

    Returns the input columns plus ``copy_idx`` (0-based: copy 0 is the
    original) — downstream shuffling/sharding treats each copy as an
    independent example. Groups weighted 0 drop out.

    Scale: one narrow projection computes n_copies per row, one
    posexplode emits the copies — no shuffle, no join; output size is
    sum_g(epochs_g * rows_g) by construction. The hash decides the
    fractional copy per DOCUMENT (not per group), so replication skew
    never concentrates on a partition.
    """
    n_int = None
    for k, v in epochs.items():
        n_int = (
            F.when(F.col(group_col) == k, F.lit(float(v)))
            if n_int is None
            else n_int.when(F.col(group_col) == k, F.lit(float(v)))
        )
    e = (
        n_int.otherwise(F.lit(float(default_epochs)))
        if n_int is not None
        else F.lit(float(default_epochs))
    )
    salted = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    u = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("double") / F.lit(
        float(16**8)
    )
    n_copies = (F.floor(e) + (u < (e - F.floor(e))).cast("long")).cast("long")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .select(
            "*",
            F.posexplode(F.sequence(F.lit(1), F.col("_n_copies"))).alias(
                "copy_idx", "_one"
            ),
        )
        .drop("_n_copies", "_one")
    )


def materialize_mixture(
    df: DataFrame,
    target_shares: Dict[str, float],
    total_tokens: float,
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a target training mixture at a token budget: each
    group's effective epoch weight is e_g = share_g * total_tokens /
    tokens_g, and every document appears floor(e_g) or ceil(e_g) times
    with the fractional copy hash-chosen per document — one mechanism
    covering BOTH directions (e < 1 is deterministic downsampling, e > 1
    is epoch upsampling), so the realized mixture hits the target shares
    in expectation at the requested budget. Groups absent from
    ``target_shares`` drop out. This is the materializing counterpart of
    :func:`mixture_weights` (which only reports rates) and the
    group-budgeted sibling of :func:`upsample_to_epochs` (fixed weights).

    Returns (key, group, n_tokens, copy_idx).

    Scale: one map-side-combined per-group token aggregation (groups x 1
    rows, broadcast back), then a narrow projection + posexplode — no
    row-level shuffle; which documents repeat or survive is a pure
    function of their keys, identical across runs and engines.
    """
    share = None
    for k, v in target_shares.items():
        share = (
            F.when(F.col(group_col) == k, F.lit(float(v)))
            if share is None
            else share.when(F.col(group_col) == k, F.lit(float(v)))
        )
    share = share.otherwise(F.lit(0.0)) if share is not None else F.lit(0.0)

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(group_col).alias("grp"),
        n_tokens.alias("n_tokens"),
        share.alias("_share"),
    )
    g = base.groupBy("grp").agg(F.sum("n_tokens").alias("_g_tokens"))
    salted = F.concat(F.col("key").cast("string"), F.lit(salt))
    u = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("double") / F.lit(
        float(16**8)
    )
    e = F.col("_share") * F.lit(float(total_tokens)) / F.col("_g_tokens")
    n_copies = (F.floor(e) + (u < (e - F.floor(e))).cast("long")).cast("long")
    return (
        base.join(F.broadcast(g), "grp")
        .withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .select(
            F.col("key").alias(key_col),
            F.col("grp").alias(group_col),
            "n_tokens",
            F.posexplode(F.sequence(F.lit(1), F.col("_n_copies"))).alias(
                "copy_idx", "_one"
            ),
        )
        .select(
            key_col,
            group_col,
            "n_tokens",
            F.col("copy_idx").cast("long").alias("copy_idx"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: Dict[str, float],
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "split",
) -> DataFrame:
    """Near-dup-aware train/eval split: documents connected by any pair in
    ``pairs`` (a near-duplicate edge list, e.g. from ngram_jaccard_pairs
    or minhash_lsh candidates) are split as a UNIT — the whole duplicate
    cluster lands on one side, so no eval document has a near-copy in
    train. Plain hash_split leaks: two 95%-identical documents hash
    independently and straddle the boundary ~2*p*(1-p) of the time.

    Returns (id, cluster_label, split) for EVERY input document:
    cluster_label is the component id (min reachable doc id) for
    pair-involved docs and the doc's own id otherwise; split is the
    deterministic hash_split of the LABEL (salted md5), so singleton docs
    split exactly as hash_split would and clustered docs inherit their
    cluster's draw.

    Scale (100 TB): the pair graph is orders of magnitude smaller than
    the corpus (high-threshold near-dup pairs are rare), so
    connected_components runs on the edge list only — never the corpus —
    and the label join back to the corpus is a join against that small
    component map (AQE broadcasts it under the threshold; isolated docs
    never enter the join's build side). No shuffle carries text.
    """
    from pramen_spark.operators.graph import connected_components

    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "vertex", id_col
    )
    labeled = (
        df.select(F.col(id_col))
        .join(comp, id_col, "left")
        .withColumn("cluster_label", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    return hash_split(labeled, "cluster_label", fractions, salt=salt).select(
        id_col, "cluster_label", "split"
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    group_cols: Sequence[str] = (),
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis exponential-sort trick, derandomized): each row
    draws u = hash-unit(key, salt) and scores ln(u) / weight — a
    monotone transform of the classic u^(1/w) key — and the top-k scores
    (per group, if given) are the sample. Inclusion probability is
    proportional to weight, the selection is reproducible from the key
    hash alone, and re-runs never swap rows in and out (the
    hash_sample/hash_split stability property, now weight-aware — the
    tool for quality-weighted corpus selection where better documents
    should be MORE likely, not certain, to be kept). Rows with
    non-positive weight are excluded.

    Scale (100 TB): scoring is a projection; the global top-k plans as
    TakeOrderedAndProject (no full sort, no single-partition window) and
    grouped top-k is one window per group partition. Output carries
    (key, group..., weight, score) — callers join survivors back by key,
    the same pattern the dedup survivors use."""
    u = _hash_unit("_salted")
    score = F.log(u) / F.col(weight_col)
    base = (
        df.filter(F.col(weight_col) > 0)
        .withColumn(
            "_salted", F.concat(F.col(key_col).cast("string"), F.lit(salt))
        )
        .withColumn("_score", score)
        .drop("_salted")
    )
    groups = list(group_cols)
    if not groups:
        out = base.orderBy(F.desc("_score"), F.col(key_col)).limit(k)
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(*groups).orderBy(
            F.desc("_score"), F.col(key_col)
        )
        out = (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    return out.withColumnRenamed("_score", "sample_score")


def curriculum_buckets(
    df: DataFrame,
    score_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
    partition_col: str | None = None,
) -> DataFrame:
    """Curriculum-learning bucket assignment: NTILE(``n_buckets``) over
    a total order (score, tiebreak) — optionally within
    ``partition_col`` groups — so a training loader can feed easy-to-hard
    phases (short-to-long documents, clean-to-noisy quality scores).
    Returns the input plus ``bucket`` (1-based).

    The tiebreak makes the order total, which makes the assignment
    deterministic and oracle-exact (Spark and DuckDB share NTILE's
    remainder-to-first-buckets rule). Scale: WITH a partition column the
    window hash-partitions and sorts per group — the normal path. The
    unpartitioned variant collapses to a single-partition sort; for a
    corpus-sized unpartitioned curriculum use
    :func:`curriculum_thresholds` (one percentile aggregate + a
    broadcast threshold comparison, no global window) and accept
    occupancy drift at tied scores.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    order = [F.col(score_col), F.col(tiebreak_col)]
    w = (
        Window.partitionBy(partition_col).orderBy(*order)
        if partition_col is not None
        else Window.orderBy(*order)
    )
    return df.withColumn("bucket", F.ntile(n_buckets).over(w))


def curriculum_thresholds(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    round_to: int = 6,
    exact_row_limit: Optional[int] = EXACT_PERCENTILE_ROW_LIMIT,
) -> DataFrame:
    """Scale-safe GLOBAL curriculum bucketing: instead of NTILE over a
    single-partition global sort (:func:`curriculum_buckets` without a
    partition column — correct, but one task sorts the corpus), compute
    the ``n_buckets - 1`` interior quantile boundaries in ONE aggregation,
    broadcast the 1-row boundary array, and assign
    ``bucket = 1 + #{boundaries strictly below the score}`` as a pure
    projection. Returns the input plus ``bucket`` (1-based).

    Exactness contract: boundaries use Spark's exact interpolating
    ``percentile`` (DuckDB ``quantile_cont`` computes the identical
    formula), ROUNDed to ``round_to`` decimals on both engines so the
    strict ``>`` comparison can never straddle an ulp. Scores EQUAL to a
    rounded boundary fall in the lower bucket, so bucket occupancies are
    equal only up to ties — the price of removing the global sort; the
    ASSIGNMENT itself is deterministic and oracle-exact.

    Scale (100 TB): the percentile aggregate is map-side combined into a
    1-row result (a control-plane scalar — the same shape as q15's MAX);
    the crossJoin against it plans as a broadcast nested-loop over one
    row, and the bucket expression is whole-stage codegen. No Window
    node, no SinglePartition sort anywhere near corpus-sized data.

    ``exact_row_limit`` (VERDICT r13 #2): exact Percentile buffers a
    per-distinct-value hash map per boundary in one task. Above this many
    input rows the boundary pass swaps to
    ``percentile_approx(accuracy=10000)`` — licensed by the oracle-pinned
    ±0.001-rank envelope contract (approx_quantile_contract_lineitem);
    ``None`` forces the exact path (the catalog/oracle contract) and
    skips the gate's counting pass."""
    if n_buckets <= 1:
        raise ValueError(f"n_buckets must be > 1, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    use_exact = (
        exact_row_limit is None
        or _max_percentile_buffer_rows(df, None) <= exact_row_limit
    )
    if use_exact:
        bounds = df.agg(
            F.array(
                *[
                    F.round(F.percentile(F.col(score_col), F.lit(q)), round_to)
                    for q in qs
                ]
            ).alias("_bounds")
        )
    else:
        bounds = df.agg(
            F.percentile_approx(
                F.col(score_col),
                F.array(*[F.lit(float(q)) for q in qs]),
                F.lit(PERCENTILE_APPROX_ACCURACY),
            ).alias("_ap")
        ).select(
            F.transform(F.col("_ap"), lambda b: F.round(b, round_to)).alias(
                "_bounds"
            )
        )
    scored = df.crossJoin(F.broadcast(bounds))
    bucket = (
        F.size(
            F.filter(
                F.col("_bounds"),
                lambda b: F.col(score_col).cast("double") > b,
            )
        )
        + 1
    )
    return scored.withColumn("bucket", bucket).drop("_bounds")


def rank_normalize(
    df: DataFrame,
    score_col: str,
    tiebreak_col: str,
    partition_col: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """Rank-transform a score to [0, 1]: percent_rank over (score,
    tiebreak), optionally per group — the calibration step that makes
    quality scores COMPARABLE across heterogeneous sources/languages
    before a global curriculum or mixture decision (a 0.8 from one
    scorer's scale and a 0.8 from another's mean different things; their
    rank positions don't). Adds ``rank_unit``.

    percent_rank = (rank - 1) / (n - 1) with ties sharing a rank — the
    same definition in Spark and DuckDB, so the output is oracle-exact
    after rounding. Single-row partitions yield 0.0.

    Scale: per group the window hash-partitions and sorts per key; an
    UNPARTITIONED call is the same single-partition hazard as
    :func:`curriculum_buckets` — for a corpus-sized global calibration
    use :func:`curriculum_thresholds` with many buckets instead."""
    order = [F.col(score_col), F.col(tiebreak_col)]
    w = (
        Window.partitionBy(partition_col).orderBy(*order)
        if partition_col is not None
        else Window.orderBy(*order)
    )
    return df.withColumn(
        "rank_unit", F.round(F.percent_rank().over(w), round_to)
    )


def quota_split(
    df: DataFrame,
    quotas: Dict[str, int],
    key_col: str,
    group_col: Optional[str] = None,
    salt: str = "quota",
) -> DataFrame:
    """Exact-COUNT splits (vs :func:`hash_split`'s exact-PROBABILITY
    splits): assign the first ``quotas[name]`` rows of the deterministic
    md5 order to each named split, remaining rows to ``train`` — per
    group when ``group_col`` is given. The tool for "exactly 500 eval
    docs per language, the rest train": a fractional split can only hit
    500 in expectation.

    The order is (hash_unit(key + salt), key) — reproducible across runs
    and engines, and stable under corpus growth in the hash_sample sense
    EXCEPT at the quota boundary (a new doc hashing into the first N
    displaces the N-th; bounded churn, unlike a re-randomized split).

    Scale: one window per group partition (row_number over the hash
    order). Grouped usage is the designed path; ungrouped runs one
    global sort — acceptable for eval-set carving (quotas are small),
    wrong for corpus-sized assignment."""
    u = _hash_unit("_salted")
    base = df.withColumn(
        "_salted", F.concat(F.col(key_col).cast("string"), F.lit(salt))
    ).withColumn("_u", u).drop("_salted")
    order = [F.col("_u"), F.col(key_col)]
    w = (
        Window.partitionBy(group_col).orderBy(*order)
        if group_col is not None
        else Window.orderBy(*order)
    )
    ranked = base.withColumn("_rn", F.row_number().over(w))
    expr = None
    acc = 0
    for name, n in quotas.items():
        acc += int(n)
        cond = F.col("_rn") <= acc
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = expr.otherwise(F.lit("train")) if expr is not None else F.lit("train")
    return ranked.withColumn("split", expr).drop("_u", "_rn")


def _qcont(arr, q):
    """``percentile(col, q)``'s exact interpolation over a PRE-SORTED
    array, replicated VERBATIM from Spark's Percentile.getPercentile:
    pos = q·(n−1), and the SYMMETRIC lerp
    ``(ceil(pos)−pos)·v[floor] + (pos−floor(pos))·v[ceil]`` — which is
    also bit-for-bit what DuckDB's ``quantile_cont`` computes (verified
    empirically over awkward doubles; pinned by
    tests/test_analytics_ops.py::TestQcontMatchesPercentile). The naive
    one-sided form ``lo + frac·(hi−lo)`` differs from BOTH engines by an
    ulp on some inputs — with round-6 outputs that is a ~1e-4-per-value
    latent hash-flake, so the operand order here is a correctness
    contract, not style.

    Why not F.percentile itself on corpus-scale inputs: exact Percentile
    buffers a hash-map entry per DISTINCT value, and continuous metrics
    (prices, pairwise slopes) are its pathological case — measured 2.1 s
    vs 0.9 s on 600k lineitem prices and 10.6 s vs 6.2 s on theil_sen's
    2.9M pairwise slopes for the collect_list + array_sort form. The
    sorted-array buffer is ~8 B/row and merges by concatenation.

    Returns NULL on an empty array (matching percentile over zero rows);
    the guard also keeps ANSI element_at from probing index 0."""
    n = F.size(arr)
    pos = (n - F.lit(1)).cast("double") * F.lit(float(q))
    lo = F.floor(pos)
    hi = F.ceil(pos).cast("double")
    lo_v = F.element_at(arr, lo.cast("int") + 1)
    hi_v = F.element_at(arr, hi.cast("int") + 1)
    return F.when(
        n > 0,
        F.when(lo == hi, lo_v).otherwise(
            (hi - pos) * lo_v + (pos - lo) * hi_v
        ),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    group_col: Optional[str] = None,
    round_to: int = 6,
    exact_row_limit: Optional[int] = EXACT_PERCENTILE_ROW_LIMIT,
) -> DataFrame:
    """Winsorization: clip a value column at its (per-group) ``lo_q`` /
    ``hi_q`` exact percentiles — the standard outlier-taming transform
    before averaging noisy metrics (a single fat-finger value no longer
    owns the mean). Adds ``<value>_w`` (clipped, double), ``clipped_low``
    and ``clipped_high`` flags; NULL values pass through unclipped.

    Bounds are exact interpolating percentiles ROUNDed to ``round_to``
    (the same cross-engine determinism contract as
    :func:`curriculum_thresholds`); clipping compares against the rounded
    bound so the decision can never straddle an ulp.

    Scale: ONE map-side-combined sorted-array aggregation (per group or
    global 1-row) — both bounds interpolate from the same array
    (:func:`_qcont`; exact Percentile would build one per-distinct-value
    hash map PER BOUND, the measured 2× pathological case on continuous
    values) — broadcast back over the data; no window, no sort of the
    raw rows.

    ``exact_row_limit`` (VERDICT r13 #2): the sorted-array buffer holds
    the whole column (or largest group) in ONE aggregation task. When the
    buffer would exceed this many rows, bounds swap to
    ``percentile_approx(accuracy=10000)`` — licensed by the oracle-pinned
    ±0.001-rank envelope contract (approx_quantile_contract_lineitem).
    Pass ``None`` to force the exact path unconditionally (the oracle
    contract the catalog queries pin; also skips the gate's counting
    pass)."""
    v = F.col(value_col).cast("double")
    keys = [group_col] if group_col is not None else []
    use_exact = (
        exact_row_limit is None
        or _max_percentile_buffer_rows(df, group_col) <= exact_row_limit
    )
    if use_exact:
        arr = F.array_sort(F.collect_list(v)).alias("_arr")
        pre = df.groupBy(*keys).agg(arr) if keys else df.agg(arr)
        bounds = pre.select(
            *keys,
            F.round(_qcont(F.col("_arr"), lo_q), round_to).alias("_lo"),
            F.round(_qcont(F.col("_arr"), hi_q), round_to).alias("_hi"),
        )
    else:
        ap = F.percentile_approx(
            v,
            F.array(F.lit(float(lo_q)), F.lit(float(hi_q))),
            F.lit(PERCENTILE_APPROX_ACCURACY),
        ).alias("_ap")
        pre = df.groupBy(*keys).agg(ap) if keys else df.agg(ap)
        bounds = pre.select(
            *keys,
            F.round(F.element_at("_ap", 1), round_to).alias("_lo"),
            F.round(F.element_at("_ap", 2), round_to).alias("_hi"),
        )
    if group_col is not None:
        joined = df.join(F.broadcast(bounds), group_col)
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        joined.withColumn(f"{value_col}_w", F.round(clipped, round_to))
        .withColumn("clipped_low", v < F.col("_lo"))
        .withColumn("clipped_high", v > F.col("_hi"))
        .drop("_lo", "_hi")
    )


# Poisson(1) CDF thresholds for the derandomized bootstrap weights; the
# literal strings are shared verbatim with the DuckDB oracle so both
# engines parse the identical doubles
POISSON1_CDF = (
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712",
)


def _poisson_weight(u: F.Column) -> F.Column:
    """Poisson(1) inverse CDF over a uniform [0,1): the per-row resample
    multiplicity of the Poisson bootstrap (Chamandy et al.'s distributed
    bootstrap — multinomial resampling needs global coordination,
    independent Poisson(1) weights need none)."""
    w = F.lit(7)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(float(POISSON1_CDF[k])), F.lit(k)).otherwise(w)
    return w


def _stage_poisson_weights(df, carry_cols, id_col, seed, n_boot):
    """Three staged projections that make the derandomized-bootstrap
    weight computation structurally shared — digests, then uniforms,
    then weights, each referencing the previous stage's NAMED columns:

    1. one md5 per GROUP OF FOUR replicates (32 hex chars = 4x 32-bit
       uniforms at offsets 1/9/17/25) — ceil(n_boot/4) hashes per row;
    2. one conv per replicate over the shared digest column;
    3. one Poisson inverse-CDF CASE per replicate over the plain
       uniform column.

    Why three selects and not one expression tree: CollapseProject
    declines to merge projects when it would duplicate a non-cheap
    expression referenced multiple times, so the stages survive to the
    physical plan and the hash/conv run exactly once per use — inlined,
    the 8-branch CASE re-evaluated its uniform (and the hash under it)
    per branch comparison, and each aggregate re-evaluated the weight
    per sum: the r8 bench measured the difference at ~3x on the two
    bootstrap queries (VERDICT r8 next-round task 5).

    Returns df projected to ``carry_cols`` + weight columns
    ``_w_0.._w_{n_boot-1}`` (double). ``carry_cols`` are expressions
    evaluated against ``df``; they are carried by NAME through the
    later stages, so alias anything computed.

    The repetitive per-replicate expressions are built as SQL strings
    (one ``F.expr`` parse each) rather than chained Column operators:
    the Column form issued ~3,500 py4j round-trips per build (~3-4 s of
    DRIVER latency on every invocation — measured r14, dwarfing the
    1.7 s cluster execution); the parsed trees are identical, so the
    physical plan and results are unchanged."""
    digs = [
        F.expr(
            f"md5(concat(cast(`{id_col}` as string), '\x1f', '{seed}', '{k}'))"
        ).alias(f"_dig_{k}")
        for k in range((n_boot + 3) // 4)
    ]
    staged = df.select(*carry_cols, *digs)
    carry_names = [staged.columns[i] for i in range(len(carry_cols))]
    uniforms = [
        F.expr(
            f"cast(conv(substring(_dig_{b // 4}, {1 + (b % 4) * 8}, 8), 16, 10)"
            f" as double) / 4.294967296E9"
        ).alias(f"_u_{b}")
        for b in range(n_boot)
    ]
    staged = staged.select(*carry_names, *uniforms)
    case_body = " ".join(
        f"WHEN _U_ < {t}D THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    weights = [
        F.expr(
            f"cast(CASE {case_body} ELSE 7 END as double)".replace(
                "_U_", f"_u_{b}"
            )
        ).alias(f"_w_{b}")
        for b in range(n_boot)
    ]
    return staged.select(*carry_names, *weights)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 50,
    alpha: float = 0.05,
    seed: str = "boot",
) -> DataFrame:
    """Percentile bootstrap confidence interval for the mean, fully
    distributed and DERANDOMIZED: resample b gives each row a
    Poisson(1) weight from a 32-bit md5-uniform — one digest of
    (id, seed, b//4) feeds four replicates, staged so each hash and
    weight evaluates once per row (measured ~2x on the r8 bench; see
    _stage_poisson_weights) — so reruns and the oracle reproduce the
    interval exactly.

    Returns ONE row: (n_rows, mean_value, ci_lo, ci_hi, n_boot), the
    (alpha/2, 1-alpha/2) percentile interval over the ``n_boot``
    weighted resample means (quantile_cont interpolation).

    Scale: all ``2 * n_boot`` weighted sums evaluate in ONE map-side
    combined aggregation pass — no data duplication, no shuffle beyond
    the single 1-row reduce; the quantile runs on the n_boot-element
    array inside that row. This is how you put error bars on corpus
    statistics at 100 TB without 50 scans.
    """
    from pramen_spark.operators.partitioning import spread_input

    # The weight staging is the heavy map stage (ceil(n_boot/4) md5 + n_boot
    # conv per row); its parallelism is inherited from the input scan, so a
    # narrow raw read (one parquet row group) would serialize all of it on a
    # single core (guide §2.5 input skew). spread_input is a no-op whenever
    # the input already arrives in >= default-parallelism splits.
    staged = _stage_poisson_weights(
        spread_input(df, id_col), [F.col(value_col)], id_col, seed, n_boot
    )
    # SQL-string expression construction (see _stage_poisson_weights),
    # handed over as ONE selectExpr call: even one F.expr + .alias pair
    # per replicate column is 2 py4j round trips, which at 2*n_boot
    # aggregates was most of this function's plan-build latency
    # (measured r15). selectExpr over the staged frame builds the same
    # global Aggregate as .agg().
    agg_sql = [
        "cast(count(1) as long) as n_rows",
        f"sum(`{value_col}`) as _sx",
    ]
    for b in range(n_boot):
        agg_sql.append(f"sum(_w_{b} * `{value_col}`) as _swx_{b}")
        agg_sql.append(f"sum(_w_{b}) as _sw_{b}")
    one = staged.selectExpr(*agg_sql)
    means = F.expr(
        "array_sort(filter(array("
        + ", ".join(f"try_divide(_swx_{b}, _sw_{b})" for b in range(n_boot))
        + "), m -> m IS NOT NULL))"
    )

    return one.select(
        "n_rows",
        F.round(F.col("_sx") / F.col("n_rows"), 6).alias("mean_value"),
        F.round(_qcont(means, alpha / 2.0), 6).alias("ci_lo"),
        F.round(_qcont(means, 1.0 - alpha / 2.0), 6).alias("ci_hi"),
        F.lit(n_boot).cast("long").alias("n_boot"),
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    test_days: int = 10,
    embargo_days: int = 2,
) -> DataFrame:
    """Time-based train/test split with an EMBARGO gap — the
    leakage-safe protocol for temporally correlated data (financial /
    user-behavior ML): rows within ``embargo_days`` before the test
    window are DROPPED from training so near-boundary leakage
    (sessions, labels computed over trailing windows) cannot cross the
    split. The group-disjoint sibling is leakage_safe_split; this is
    the time axis.

    Returns ``df`` plus a ``split`` column ('train' / 'embargo' /
    'test') derived from the dataset horizon: test = the last
    ``test_days`` days, embargo = the ``embargo_days`` before them.

    Scale: the horizon is a 1-row broadcast; assignment is a pure
    column expression — no shuffle at all. Filtering split == 'train'
    after this is a pushed-down predicate.
    """
    day = F.to_date(F.col(ts_col))
    horizon = df.agg(F.max(day).alias("_max_day"))
    test_start = F.date_sub(F.col("_max_day"), int(test_days) - 1)
    embargo_start = F.date_sub(test_start, int(embargo_days))
    return df.crossJoin(F.broadcast(horizon)).withColumn(
        "split",
        F.when(day >= test_start, F.lit("test"))
        .when(day >= embargo_start, F.lit("embargo"))
        .otherwise(F.lit("train")),
    ).drop("_max_day")


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Weighted percentiles (lower / inverse-CDF convention): the
    smallest value whose cumulative weight reaches q * total — the
    token-weighted median document length, quantity-weighted price
    percentile, etc. No engine builtin does weighted quantiles; this is
    the exact two-phase form.

    Returns ONE row with a ``p{q}_weighted`` column per requested q.

    Scale: values collapse to the (value, total_weight) DOMAIN first
    (map-side combined — the only stage that sees row volume); the
    cumulative window runs over that domain table (bounded by distinct
    values — quantize continuous values to cap it, as with the AUC
    histogram); the thresholds are conditional MINs in one final
    aggregate against the broadcast total.
    """
    dom = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.col(weight_col)).alias("w")
    )
    w_ord = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = dom.select("v", F.sum("w").over(w_ord).alias("cw"))
    tot = dom.agg(F.sum("w").alias("tw"))
    aggs = [
        F.min(
            F.when(F.col("cw") >= F.lit(float(q)) * F.col("tw"), F.col("v"))
        ).alias(f"p{int(q * 100)}_weighted")
        for q in qs
    ]
    return cum.crossJoin(F.broadcast(tot)).agg(*aggs)


def negative_samples(
    positives: DataFrame,
    entity_col: str,
    item_col: str,
    all_items: DataFrame,
    k: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training:
    per entity, ``k`` pseudo-random items drawn from the catalog by
    md5 hashing (entity, slot) — reproducible on every engine, run,
    and cluster size, unlike rand()-based sampling — with observed
    positives removed by an anti-join. A slot whose hash collides
    with a positive yields nothing (no resampling: determinism beats
    exact-k, and the expected shortfall is positives/catalog).

    Items index densely via row_number over the DOMAIN-bounded item
    table (never assume contiguous ids); the hash-to-index map is a
    pure column expression; the item lookup and the positive
    anti-join are the only joins, both broadcastable/co-keyed.

    Returns (entity, slot, item).
    """
    items = all_items.select(F.col(item_col).alias("_item")).distinct()
    from pyspark.sql import Window as W

    w = W.orderBy("_item")
    indexed = items.select(
        "_item", (F.row_number().over(w) - 1).cast("long").alias("_idx")
    )
    n_items = items.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ents = positives.select(F.col(entity_col).alias("entity")).distinct()
    slots = ents.select(
        "entity",
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("slot"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("entity").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = slots.crossJoin(F.broadcast(n_items)).select(
        "entity", "slot", (h % F.col("_n")).alias("_idx")
    )
    picked = cand.join(F.broadcast(indexed), "_idx").select(
        "entity", "slot", F.col("_item").alias("item")
    )
    pos = positives.select(
        F.col(entity_col).alias("entity"), F.col(item_col).alias("item")
    ).distinct()
    return picked.join(pos, ["entity", "item"], "left_anti").select(
        "entity", "slot", "item"
    )


def effective_sample_size(df: DataFrame, weight_expr) -> DataFrame:
    """Kish effective sample size of a weighted dataset:
    ESS = (Σw)² / Σw² — the importance-sampling diagnostic that says
    how many EQUAL-weight rows the weighted set is actually worth.
    An upsampled mixture with ESS/n = 0.2 trains like a corpus a
    fifth its size; below ~0.5 the mixture weights are doing more
    harm than coverage.

    Weights' sums and square-sums reduce as DECIMALs (squares as
    products), so the diagnostic is reduce-order independent; one
    aggregation pass.

    Returns one row: (n, ess, ess_ratio), rounds 6.
    """
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    w = weight_expr.cast("double")
    s = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(w)).cast("double").alias("_s1"),
        F.sum(dec(w * w)).cast("double").alias("_s2"),
    )
    ess = F.try_divide(F.col("_s1") * F.col("_s1"), F.col("_s2"))
    return s.select(
        "n",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n").cast("double"), 6).alias("ess_ratio"),
    )


def bootstrap_uplift_ci(
    df: DataFrame,
    exposure_expr,
    outcome_expr,
    id_col: str,
    n_boot: int = 50,
    alpha: float = 0.05,
    seed: str = "uplift",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for a DIFFERENCE in
    rates between two groups — the error bar two_proportion_ztest's
    normal approximation only asymptotically promises, and the one an
    experiment readout actually ships. Same derandomized Poisson
    scheme as bootstrap_mean_ci (one staged digest per four
    replicates), so the PAIRED group rates inside one replicate share
    the same resampled world.

    All ``4 · n_boot`` weighted sums evaluate in ONE map-side-combined
    aggregation; the interval interpolates over the n_boot diffs
    inside the single result row.

    Returns one row: (n_exp, n_unexp, uplift, ci_lo, ci_hi, n_boot),
    rounds 6.
    """
    from pramen_spark.operators.partitioning import spread_input

    # Same single-row-group spread rationale as bootstrap_mean_ci.
    staged = _stage_poisson_weights(
        spread_input(df, id_col),
        [exposure_expr.cast("int").alias("_t"), outcome_expr.cast("int").alias("_y")],
        id_col,
        seed,
        n_boot,
    )
    # SQL-string expression construction (see _stage_poisson_weights),
    # handed over as ONE selectExpr call — at 4*n_boot aggregates the
    # per-Column F.expr + .alias round trips were most of the build
    # latency (measured r15); selectExpr builds the same global
    # Aggregate as .agg().
    agg_sql = [
        "cast(sum(_t) as long) as n_exp",
        "cast(sum(1 - _t) as long) as n_unexp",
        "cast(sum(_t * _y) as long) as _xt",
        "cast(sum((1 - _t) * _y) as long) as _xc",
    ]
    for b in range(n_boot):
        agg_sql.append(f"sum(_w_{b} * _t * _y) as _wxt_{b}")
        agg_sql.append(f"sum(_w_{b} * _t) as _wt_{b}")
        agg_sql.append(f"sum(_w_{b} * (1 - _t) * _y) as _wxc_{b}")
        agg_sql.append(f"sum(_w_{b} * (1 - _t)) as _wc_{b}")
    one = staged.selectExpr(*agg_sql)
    diffs = F.expr(
        "array_sort(filter(array("
        + ", ".join(
            f"try_divide(_wxt_{b}, _wt_{b}) - try_divide(_wxc_{b}, _wc_{b})"
            for b in range(n_boot)
        )
        + "), m -> m IS NOT NULL))"
    )

    point = F.col("_xt").cast("double") / F.col("n_exp").cast("double") - F.col(
        "_xc"
    ).cast("double") / F.col("n_unexp").cast("double")
    return one.select(
        "n_exp",
        "n_unexp",
        F.round(point, 6).alias("uplift"),
        F.round(_qcont(diffs, alpha / 2.0), 6).alias("ci_lo"),
        F.round(_qcont(diffs, 1.0 - alpha / 2.0), 6).alias("ci_hi"),
        F.lit(n_boot).cast("long").alias("n_boot"),
    )
