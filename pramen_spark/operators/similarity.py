"""Similarity search over embedding columns (``array<float>``).

Two paths:
- ``cosine_topk``: exact brute-force — the correctness baseline. The dot
  product is a JVM-side ``aggregate(zip_with(...))`` (no Python), and the
  query set is broadcast, so the big side streams once.
- ``lsh_topk``: random-hyperplane LSH — the 100 TB path. Vectors are
  bucketed by the sign pattern of dot products with ``num_planes`` fixed
  random hyperplanes (seeded, deterministic); only same-bucket (or
  multi-probe neighboring-bucket) candidates get exact scoring.

Scale: brute force is O(N) per query with a broadcast query set; LSH cuts
the candidate set by ~2^num_planes. For billions of vectors, partition by
bucket and keep per-bucket shards under executor memory.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_double_embedding(df: DataFrame, embedding_col: str = "embedding") -> DataFrame:
    return df.withColumn("_emb_d", F.col(embedding_col).cast("array<double>"))


def _topk_per_query(
    scored: DataFrame, k: int, id_col: str, query_id_col: str
) -> DataFrame:
    """Two-stage top-k over (query_id, id, cosine) rows.

    A single ``row_number().over(partitionBy(query_id))`` would shuffle ALL
    scored rows into |queries| reducers — with a handful of queries,
    parallelism collapses and one straggler task holds N rows.  Instead:

    1. rank within (query, input partition): |queries| x |partitions|
       reduce keys, so the full scored set shuffles into well-spread
       reducers and each key holds at most one partition's rows; only the
       local top-k survive (a superset of the global top-k by the same
       total order);
    2. rank the survivors (<= k x |partitions| rows per query) in the
       final per-query window — now a tiny shuffle.

    The (cosine desc, id asc) order is a deterministic total order, so the
    result is identical to the one-window form."""
    from pyspark.sql import Window as W

    order = [F.desc("cosine"), F.asc(id_col)]
    w_local = W.partitionBy(query_id_col, "_pid").orderBy(*order)
    pruned = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(w_local))
        .filter(F.col("_lrank") <= k)
        .drop("_pid", "_lrank")
    )
    w = W.partitionBy(query_id_col).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``df`` rows for every row of ``query``.

    ``query`` must have (query_id_col, embedding_col); it is broadcast.
    Returns (query_id, vec_id, cosine, rank) with rank 1..k per query."""
    base = with_double_embedding(df, embedding_col)
    q = with_double_embedding(query, embedding_col).select(
        F.col(query_id_col), F.col("_emb_d").alias("_q_d")
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        (_dot(F.col("_emb_d"), F.col("_q_d")) / (_norm(F.col("_emb_d")) * _norm(F.col("_q_d")))).alias(
            "cosine"
        ),
    )
    return _topk_per_query(scored, k, id_col, query_id_col)


def unit_embeddings(
    df: DataFrame, id_col: str = "vec_id", embedding_col: str = "embedding"
) -> DataFrame:
    """(id, u): L2-normalized double embedding. The norm is projected as a
    real column before the per-element divide — inlining it into the
    transform lambda would recompute the norm once per element."""
    base = with_double_embedding(df, embedding_col).select(id_col, "_emb_d")
    with_norm = base.select(id_col, "_emb_d", _norm(F.col("_emb_d")).alias("_nrm"))
    return with_norm.where(F.col("_nrm") > 0).select(
        F.col(id_col),
        F.transform("_emb_d", lambda x: x / F.col("_nrm")).alias("u"),
    )


def _bucketed_pairs_blockwise(
    units: DataFrame,
    threshold: float,
    max_bucket_size: Optional[int] = None,
    block_rows: int = 2048,
) -> DataFrame:
    """Per-bucket all-pairs cosine via blocked numpy matmuls
    (applyInPandas). Each vector lives in exactly one bucket (its sign
    pattern), so pairs are unique across buckets — no dedup pass.

    Transfer cost is |vectors| once (Arrow), NOT |pairs|: scoring 780k
    candidate pairs by shipping both arrays per pair moves ~1000x more
    bytes than shipping each bucket's vectors once and multiplying
    in-block. The matmul runs in ``block_rows``-row strips, so peak task
    memory is O(block_rows x bucket) doubles, not O(bucket^2).

    ``max_bucket_size`` is the skew guard for degenerate corpora: a bucket
    of b vectors still costs O(b^2) multiply WORK even when memory is
    bounded, so buckets above the cap (near-identical embeddings all
    landing in one sign pattern) are dropped. The size filter is a window
    count over the same ``bucket`` key the groupBy shuffles on, so the
    partitioning is computed once and reused."""
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        units = (
            units.withColumn("_bsize", F.count("*").over(W.partitionBy("bucket")))
            .filter(F.col("_bsize") <= max_bucket_size)
            .drop("_bsize")
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf["id"].to_numpy()
        m = np.stack(pdf["u"].to_numpy())
        frames = []
        for s in range(0, n, block_rows):
            c = m[s : s + block_rows] @ m.T  # strip: block_rows x n
            ia, ib = np.where(c >= threshold)
            ia = ia + s  # strip-local row -> bucket-global row
            keep = ia < ib  # upper triangle: each unordered pair once
            if not keep.any():
                continue
            a, b = ids[ia[keep]], ids[ib[keep]]
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(a, b),
                        "id_b": np.maximum(a, b),
                        "cosine": c[ia[keep] - s, ib[keep]],
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        return pd.concat(frames, ignore_index=True)

    return units.groupBy("bucket").applyInPandas(
        fn, "id_a long, id_b long, cosine double"
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    num_planes: Optional[int] = None,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: (id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    ``num_planes=None`` is the exact all-pairs baseline (O(N^2) — the
    correctness oracle). With ``num_planes`` set, candidates are restricted
    to pairs sharing a random-hyperplane LSH bucket before exact cosine
    verification — the 100 TB path: the self-join shuffles on the bucket
    key, so only same-bucket shards are ever paired. Recall for a pair at
    angle theta is (1 - theta/pi)^num_planes; pick num_planes from the
    target threshold (near-dup thresholds ~0.95 keep theta small)."""
    if num_planes is None:
        # exact all-pairs: JVM expression scoring — bit-deterministic
        # sequential sums whose evaluation order matches the SQL oracle
        units = unit_embeddings(df, id_col, embedding_col)
        a = units.select(F.col(id_col).alias("id_a"), F.col("u").alias("u_a"))
        b = units.select(F.col(id_col).alias("id_b"), F.col("u").alias("u_b"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return pairs.select(
            "id_a", "id_b", _dot(F.col("u_a"), F.col("u_b")).alias("cosine")
        ).filter(F.col("cosine") >= threshold)
    planes = random_hyperplanes(dim, num_planes, seed)
    bucketed = lsh_bucket(df, planes, embedding_col)
    units = (
        bucketed.select(id_col, "_emb_d", "bucket", _norm(F.col("_emb_d")).alias("_nrm"))
        .where(F.col("_nrm") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.col("bucket"),
            F.transform("_emb_d", lambda x: x / F.col("_nrm")).alias("u"),
        )
    )
    return _bucketed_pairs_blockwise(units, threshold, max_bucket_size)


def random_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic unit hyperplanes (fixed seed -> same buckets on every
    run and every cluster)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(df: DataFrame, planes: Sequence[Sequence[float]], embedding_col: str = "embedding"):
    """Add a ``bucket`` column: bit i = sign(v . plane_i).

    The whole bucket expression builds as ONE parsed SQL string: the
    chained-Column form issued ~65 py4j round trips PER PLANE (one
    F.lit per plane element), ~0.5-0.8 s of driver latency per
    lsh_bucket call at dim 64 (measured r15). Python float repr()
    round-trips exactly through the SQL double-literal parser, and the
    dot product keeps the same zip_with-multiply / left-fold-add float
    sequence, so bucket values are bit-identical to the Column form."""
    base = with_double_embedding(df, embedding_col)

    def dot_sql(plane):
        arr = ",".join(f"{float(x)!r}D" for x in plane)
        return (
            f"aggregate(zip_with(_emb_d, array({arr}), (x, y) -> x * y),"
            f" 0.0D, (acc, x) -> acc + x)"
        )

    bucket_sql = " + ".join(
        f"cast({dot_sql(p)} > 0 as bigint) * cast({1 << i} as bigint)"
        for i, p in enumerate(planes)
    )
    return base.withColumn("bucket", F.expr(bucket_sql))


def kmeans_centroids(
    df: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    sample_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic k-means centroids for IVF coarse quantization,
    trained on a hash-selected sample (``xxhash64(id)``-ordered — the same
    rows on every run and every cluster size, unlike ``df.sample``).

    Lloyd iterations run driver-side in numpy on <= ``sample_size``
    unit vectors: IVF training wants a representative sample, not the
    corpus — at 100 TB you still train on ~10^5-10^6 sampled vectors, so
    collecting the sample is the intended data movement, not a shortcut.
    Returns an (nlist, dim) array of L2-normalized centroids."""
    units = unit_embeddings(df, id_col, embedding_col)
    # Arrow transfer: the sample is sample_size x dim doubles — toPandas
    # moves it as one Arrow batch instead of row-pickled py4j Rows
    # (measured ~0.3 s saved per training call at the 10k default)
    pdf = (
        units.withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(sample_size)
        .select("u")
        .toPandas()
    )
    x = np.array([np.asarray(u) for u in pdf["u"]])
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        # cosine assignment on unit vectors = max dot product
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) coarse
    quantization — the k-means sibling of ``lsh_topk``: vectors are
    assigned to their nearest of ``nlist`` centroids; each query probes
    its ``nprobe`` nearest cells and exactly rescores only those cells'
    vectors. ``nprobe == nlist`` degenerates to exact brute force.

    Scale shape: centroids broadcast (nlist x dim floats — tiny); cell
    assignment is one Arrow-vectorized matmul pass over the corpus; the
    probe join shuffles corpus rows by cell only once (queries broadcast);
    the final reduction reuses the two-stage top-k. Returns
    (query_id, vec_id, cosine, rank)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cent = kmeans_centroids(df, nlist, id_col, embedding_col, sample_size, seed=seed)
    cent_b = cent  # captured in the UDF closures (broadcast with the task)

    @pandas_udf(T.LongType())
    def nearest_cell(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((m / norms) @ cent_b.T, axis=1).astype(np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def probe_cells(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = (m / norms) @ cent_b.T
        order = np.argsort(-scores, axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int64).tolist() for row in order])

    base = with_double_embedding(df, embedding_col).withColumn(
        "cell", nearest_cell(F.col(embedding_col))
    )
    q = with_double_embedding(query, embedding_col).select(
        F.col(query_id_col),
        F.col("_emb_d").alias("_q_d"),
        F.explode(probe_cells(F.col(embedding_col))).alias("cell"),
    )
    scored = base.join(F.broadcast(q), "cell").select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("_emb_d"), F.col("_q_d"))
            / (_norm(F.col("_emb_d")) * _norm(F.col("_q_d")))
        ).alias("cosine"),
    )
    return _topk_per_query(scored, k, id_col, query_id_col)


def lsh_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: candidates are vectors in the query's LSH
    bucket (plus buckets at Hamming distance <= multi_probe), scored
    exactly. Returns (query_id, vec_id, cosine, rank)."""
    planes = random_hyperplanes(dim, num_planes, seed)
    base = lsh_bucket(df, planes, embedding_col)
    q = lsh_bucket(query, planes, embedding_col).select(
        F.col(query_id_col), F.col("_emb_d").alias("_q_d"), F.col("bucket").alias("q_bucket")
    )
    # multi-probe: explode query buckets to all buckets within hamming<=p
    probes = [0]
    if multi_probe >= 1:
        probes += [1 << i for i in range(num_planes)]
    if multi_probe >= 2:
        probes += [
            (1 << i) | (1 << j) for i in range(num_planes) for j in range(i + 1, num_planes)
        ]
    q = q.withColumn(
        "bucket",
        F.explode(F.array(*[F.col("q_bucket").bitwiseXOR(F.lit(p)) for p in probes])),
    )
    scored = base.join(F.broadcast(q), "bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        (_dot(F.col("_emb_d"), F.col("_q_d")) / (_norm(F.col("_emb_d")) * _norm(F.col("_q_d")))).alias(
            "cosine"
        ),
    ).dropDuplicates([query_id_col, id_col])
    return _topk_per_query(scored, k, id_col, query_id_col)


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    sample_size: int = 10_000,
    seed: int = 42,
    max_cluster_size: Optional[int] = None,
    block_rows: int = 2048,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster cosine pruning. Embeddings are
    assigned to their nearest of ``nlist`` deterministic centroids; inside
    each cluster, a vector is DROPPED when any lower-id vector in the same
    cluster has cosine >= threshold (keep-first by id). Returns
    (id, cell, keep) for every non-zero-norm vector.

    The keep rule compares against ALL prior ids, kept or dropped (the
    order-independent, engine-reproducible variant of leader clustering) —
    so the verdict is a pure function of the corpus, expressible in SQL
    for the single-cluster oracle (``nlist=1`` makes the within-cluster
    rule exact over the whole corpus, the same full-probe trick IVF uses).

    Scale: centroids train on a hash-selected sample driver-side (see
    kmeans_centroids); assignment is one Arrow-vectorized matmul pass; the
    only shuffle keys on the cell id, and per-cell scoring is a blocked
    numpy matmul (memory O(block_rows x cell), transfer O(vectors) not
    O(pairs)). ``max_cluster_size`` is the skew guard: clusters above the
    cap skip pairwise scoring and keep every row (conservative no-dedup)
    rather than OOM a task on a degenerate centroid. FP caveat shared
    with embedding_near_dups_lsh: numpy sums vs the oracle's sequential
    list_inner_product can differ in the last ulp — thresholds must not
    sit on a pair's cosine boundary (verified for the test corpus)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cent = kmeans_centroids(df, nlist, id_col, embedding_col, sample_size, seed=seed)

    @pandas_udf(T.LongType())
    def nearest_cell(u: pd.Series) -> pd.Series:
        m = np.stack(u.to_numpy())
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int64))

    units = unit_embeddings(df, id_col, embedding_col).select(
        F.col(id_col).alias("id"), "u"
    )
    base = units.withColumn("cell", nearest_cell(F.col("u")))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids_s = ids[order]
        n = len(ids_s)
        cell = np.full(n, pdf["cell"].iloc[0], dtype=np.int64)
        keep = np.ones(n, dtype=bool)
        if n >= 2 and (max_cluster_size is None or n <= max_cluster_size):
            m = np.stack(pdf["u"].to_numpy())[order]
            col_idx = np.arange(n)
            for s in range(0, n, block_rows):
                c = m[s : s + block_rows] @ m.T  # strip: block_rows x n
                # row i is dropped iff any column j < i clears the
                # threshold: mask the strict lower triangle of the strip
                # and reduce per row — one vectorized pass, no Python loop
                row_idx = np.arange(s, s + c.shape[0])[:, None]
                prior = (c >= threshold) & (col_idx[None, :] < row_idx)
                keep[s : s + c.shape[0]] &= ~prior.any(axis=1)
        return pd.DataFrame({"id": ids_s, "cell": cell, "keep": keep})

    out = base.groupBy("cell").applyInPandas(fn, "id long, cell long, keep boolean")
    return out.withColumnRenamed("id", id_col)


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column:
    (id, scale, qvec, max_abs_err). Per-vector scale = max|x| / 127, each
    component rounds to round(x / scale) in [-127, 127], and
    ``max_abs_err`` audits the reconstruction bound (<= scale/2 by
    construction — the exactness property a quantization job verifies
    before swapping the float index out). All-zero vectors quantize to
    zeros with scale 0.

    The 4x memory cut (and SIMD int8 dot products) is what makes
    billion-vector ANN serving affordable; candidate generation runs on
    qvec, exact re-scoring on the float source (the two-stage pattern
    cosine_topk/ivf_topk already use).

    Scale (100 TB): a pure projection — per-row array expressions, no
    shuffle, no Python; quantizing a corpus is one codegen'd map over
    the vectors."""
    x_abs = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    scale = (x_abs.cast("double") / F.lit(127.0)).alias("scale")
    s = df.select(F.col(id_col), F.col(vec_col), scale)
    xd = lambda x: x.cast("double")  # noqa: E731  (promote float exactly)
    q_of = lambda x: F.round(xd(x) / F.col("scale"))  # noqa: E731
    qvec = F.when(
        F.col("scale") == 0,
        F.transform(F.col(vec_col), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(F.col(vec_col), lambda x: q_of(x).cast("int"))
    )
    err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                F.col(vec_col),
                lambda x: F.abs(xd(x) - q_of(x) * F.col("scale")),
            )
        )
    )
    # two selects: qvec/err must see the UNROUNDED scale — rounding the
    # published scale in the same projection would let the lambda's
    # outer 'scale' reference bind to the rounded alias
    out = s.select(
        F.col(id_col), F.col("scale"), qvec.alias("qvec"), err.alias("_err")
    )
    return out.select(
        id_col,
        F.round("scale", 6).alias("scale"),
        "qvec",
        F.round("_err", 6).alias("max_abs_err"),
    )


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive/metric training: for each
    query vector, the single most-similar corpus vector with a DIFFERENT
    label — the "looks like X but isn't X" examples that teach a model
    its decision boundary (random negatives are trivially far; hard ones
    carry the gradient). Returns (query_id, query_label, neg_id,
    neg_label, cosine).

    Deterministic: cosines are ROUNDed before the argmax and ties break
    to the lowest corpus id via a lexicographic struct MAX — which also
    makes the reduction a map-side-combined aggregation (no per-query
    window holding the whole corpus on one reducer).

    Scale (100 TB corpus, thousands of queries): the query set broadcasts
    (its size is the fan-out multiplier — keep it batched); the corpus is
    read ONCE, each row scoring against all queries JVM-side
    (aggregate/zip_with fold, no Python), and the only shuffle carries
    one partial-max row per (query, partition). For corpus-scale query
    sets use the LSH/IVF candidate paths in this module instead of the
    exhaustive product."""
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).alias("query_label"),
    )
    c = df.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col(label_col).alias("neg_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "neg_id",
            "neg_label",
            F.round(
                F.try_divide(
                    dot(F.col("cv"), F.col("qv")),
                    F.sqrt(dot(F.col("cv"), F.col("cv")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv"))),
                ),
                round_to,
            ).alias("cosine"),
        )
    )
    # min over (-cosine, neg_id) = max cosine with ties broken by the
    # SMALLEST id under the id type's natural ordering — works for string
    # ids too (no negation of the id column, which only orders numerics).
    best = scored.groupBy("query_id", "query_label").agg(
        F.min(
            F.struct(
                (-F.col("cosine")).alias("negc"),
                F.col("neg_id").alias("nid"),
                F.col("neg_label").alias("nl"),
            )
        ).alias("b")
    )
    return best.select(
        "query_id",
        "query_label",
        F.col("b.nid").alias("neg_id"),
        F.col("b.nl").alias("neg_label"),
        (-F.col("b.negc")).alias("cosine"),
    )


def label_centroid_cohesion(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space class-quality report: per label, the centroid
    (dimension-wise mean) and the members' mean/min cosine to their own
    centroid — low cohesion flags a mislabeled or multi-modal class
    before anyone trains on it, the embedding sibling of the lang-ID
    confusion audit. Returns (label, n_vecs, mean_cosine, min_cosine).

    Determinism: centroid dimensions ROUND(6) before any cosine (the sum
    order inside the per-dimension average differs between engines at ulp
    level; rounding pins it), and the final mean rounds to 4.

    Scale (100 TB of vectors): dimensions explode to (label, dim) partial
    sums — map-side combined, shuffle carries labels x dims rows; the
    centroid table (labels x dim doubles, KB-scale) broadcasts back into
    a single pass over the vectors; per-label stats map-side combine.
    No vector-vector pair is ever formed — cohesion via centroids is
    O(N·d), not the O(N^2) intra-class pair matrix."""
    base = df.select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    dims = base.select(
        "label", F.posexplode("v").alias("dim", "x")
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("c")))
                ),
                lambda s: s.c,
            ).alias("centroid")
        )
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = base.join(F.broadcast(cent), "label").select(
        "label",
        # try_divide: a zero centroid (exactly opposing members) or zero
        # vector yields NULL cosine instead of an ANSI divide-by-zero —
        # the degenerate class surfaces as NULL in the report
        F.round(
            F.try_divide(
                dot(F.col("v"), F.col("centroid")),
                F.sqrt(dot(F.col("v"), F.col("v")))
                * F.sqrt(dot(F.col("centroid"), F.col("centroid"))),
            ),
            6,
        ).alias("cos"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("cos"), 4).alias("mean_cosine"),
        F.min("cos").alias("min_cosine"),
    )


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", dims: Sequence[int] = tuple(range(1, 9))
) -> DataFrame:
    """Upper-triangular covariance entries of selected embedding
    dimensions — the feature-correlation audit run before whitening /
    PCA / decorrelation of an embedding table (near-duplicate dimensions
    show up as high off-diagonal covariance).

    Returns (i, j, cov) for i <= j over ``dims`` (1-based positions),
    population covariance rounded to 6.

    Scale: ONE aggregation pass computes all |dims|^2/2 covariances as
    parallel map-side-combined ``covar_pop`` expressions — no explode,
    no self-join, no shuffle of vectors; the unpivot to (i, j, cov) rows
    happens on the single result row. For full high-d matrices swap to
    the blocked-numpy Gram path (one mapInPandas over Arrow batches
    emitting X^T X partials) — this expression form is for audit-sized
    dimension subsets.
    """
    pairs = [(i, j) for i in dims for j in dims if i <= j]
    # Both expression lists build as parsed SQL strings: the chained-
    # Column form (36 covar_pop + 36 struct Columns) costs ~0.5 s of
    # py4j round trips per plan build — the same lesson as the minhash
    # band / simhash bit expressions. Parsed trees identical.
    one = df.selectExpr(
        *[
            f"covar_pop(cast(element_at({vec_col}, {i}) as double),"
            f" cast(element_at({vec_col}, {j}) as double)) as c_{i}_{j}"
            for (i, j) in pairs
        ]
    )
    cells = F.expr(
        "array(%s)"
        % ",".join(
            f"named_struct('i', cast({i} as bigint), 'j', cast({j} as bigint),"
            f" 'cov', round(c_{i}_{j}, 6))"
            for (i, j) in pairs
        )
    )
    return one.select(F.explode(cells).alias("cell")).select(
        "cell.i", "cell.j", "cell.cov"
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2), exactly.

    ``centroids`` is a control-plane table (k rows); it is collected and
    inlined as literal arrays, so assignment is a ZERO-shuffle map:
    each row evaluates k sequential-fold distance expressions
    (``aggregate(zip_with(...))`` — the same fold order DuckDB's
    ``list_inner_product`` uses, so oracles reproduce the doubles
    bit-for-bit) and takes ``array_min`` over (dist2, cid) structs —
    deterministic tie-break on centroid id.

    Returns the input columns plus (cid, dist2). This is the inner step
    of distributed Lloyd iterations AND of IVF cell routing: at 100 TB
    each iteration is this map plus one map-side-combined re-estimation
    aggregate — no join touches the vectors.
    """
    seeds = [
        (r[cid_col], [float(x) for x in r[cvec_col]])
        for r in centroids.select(cid_col, cvec_col).collect()
    ]
    if not seeds:
        raise ValueError("centroids table is empty")
    v = F.col(vec_col).cast("array<double>")
    cands = []
    for cid, cvec in sorted(seeds):
        d = F.zip_with(v, F.lit(cvec), lambda x, y: x - y)
        cands.append(
            F.struct(
                _dot(d, d).alias("dist2"), F.lit(cid).cast("long").alias("cid")
            )
        )
    best = F.array_min(F.array(*cands))
    return df.withColumn("_best", best).select(
        "*", F.col("_best.cid").alias("cid"), F.col("_best.dist2").alias("dist2")
    ).drop("_best")


def kmeans_step(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
    report_dims: Sequence[int] = (1, 2, 3, 4),
) -> DataFrame:
    """One distributed Lloyd iteration as a per-cluster report:
    (cluster_id, n_members, inertia, c1..c_k) where c_i are the
    re-estimated centroid's ``report_dims`` components (ROUND 6 — the
    cross-partition mean is the one order-dependent reduction, rounding
    pins it; inertia rounds to 4 for the same reason).

    Scale: assignment is the zero-shuffle literal-centroid map from
    ``kmeans_assign``; re-estimation is ONE map-side-combined aggregate
    keyed by cluster id. Empty clusters drop out (re-seed policy is the
    caller's). Iterating = feeding the new centroids back in; each round
    is one job, one shuffle of k * d partial sums.
    """
    assigned = kmeans_assign(
        df, centroids, id_col=id_col, vec_col=vec_col,
        cid_col=cid_col, cvec_col=cvec_col,
    )
    v = F.col(vec_col).cast("array<double>")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.sum("dist2"), 4).alias("inertia"),
    ] + [
        F.round(F.avg(F.element_at(v, i)), 6).alias(f"c{i}")
        for i in report_dims
    ]
    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(*aggs)
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the quality gate every ANN index (LSH, IVF) must publish next to
    its latency. Both inputs are (query_id, vec_id, ...) top-k tables;
    returns (query_id, n_overlap, recall_at_k).

    Scale: both sides are already k rows per query (KB-scale); the
    overlap join is co-keyed on (query, id) and the count re-aggregates
    per query. The expensive parts are the inputs, not this audit."""
    e = exact.select(query_id_col, id_col)
    a = approx.select(
        query_id_col, id_col, F.lit(1).alias("_hit")
    )
    hit = e.join(a, [query_id_col, id_col], "left")
    return hit.groupBy(query_id_col).agg(
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_overlap"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0))) / F.lit(float(k)), 4
        ).alias(f"recall_at_{k}"),
    )


def embedding_health_audit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pre-flight health check of an embedding table, per label: vector
    counts, dimension consistency (min/max length), zero-norm and
    NaN-contaminated vectors, and norm statistics — run it before ANY
    similarity/clustering stage (a handful of NaN vectors silently
    poisons every cosine and centroid downstream; dimension drift
    breaks zip_with at row N million).

    Returns (label, n_vecs, dim_min, dim_max, n_zero_norm, n_nan,
    norm_min, norm_mean, norm_max).

    Scale: one map-side-combined aggregation; norms are sequential-fold
    inner products (JVM-side, oracle-reproducible). No window, no join.
    """
    v = F.col(vec_col).cast("array<double>")
    norm2 = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    has_nan = F.exists(v, lambda x: F.isnan(x))
    nrm = F.sqrt(norm2)
    base = df.select(
        F.col(label_col).alias("label"),
        F.size(v).alias("_dim"),
        has_nan.alias("_nan"),
        F.when(~has_nan, nrm).alias("_norm"),
    )
    return base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("_dim").cast("long").alias("dim_min"),
        F.max("_dim").cast("long").alias("dim_max"),
        F.sum((F.col("_norm") == 0.0).cast("long")).cast("long").alias("n_zero_norm"),
        F.sum(F.col("_nan").cast("long")).cast("long").alias("n_nan"),
        F.round(F.min("_norm"), 6).alias("norm_min"),
        F.round(F.avg("_norm"), 6).alias("norm_mean"),
        F.round(F.max("_norm"), 6).alias("norm_max"),
    )
