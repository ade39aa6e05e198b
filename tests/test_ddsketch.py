"""DDSketch: relative-accuracy quantile sketch (operators/sketches.py).
The three contracts that license swapping it in at 100 TB: full
mergeability (merge-of-builds == build-on-union, exactly), the relative
error guarantee against exact quantiles, and grouped operation."""

import numpy as np
import pytest

from pramen_spark.operators.sketches import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantile,
)


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    s = build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )
    yield s


@pytest.fixture(scope="module")
def values():
    rng = np.random.RandomState(11)
    # lognormal: heavy right tail, the shape relative accuracy is FOR
    return np.exp(rng.normal(5.0, 1.5, size=4000))


def test_merge_equals_build_on_union(spark, values):
    half = len(values) // 2
    a = spark.createDataFrame([(float(v),) for v in values[:half]], ["x"])
    b = spark.createDataFrame([(float(v),) for v in values[half:]], ["x"])
    both = spark.createDataFrame([(float(v),) for v in values], ["x"])
    merged = {
        r["bucket"]: r["n"]
        for r in ddsketch_merge(
            ddsketch_build(a, "x"), ddsketch_build(b, "x")
        ).collect()
    }
    direct = {r["bucket"]: r["n"] for r in ddsketch_build(both, "x").collect()}
    assert merged == direct  # exact, not approximate


@pytest.mark.parametrize("acc", [0.01, 0.05])
def test_relative_error_guarantee(spark, values, acc):
    df = spark.createDataFrame([(float(v),) for v in values], ["x"])
    sk = ddsketch_build(df, "x", relative_accuracy=acc)
    qs = (0.1, 0.5, 0.9, 0.99)
    est = {
        r["q"]: r["estimate"]
        for r in ddsketch_quantile(sk, relative_accuracy=acc, qs=qs).collect()
    }
    s = np.sort(values)
    for q in qs:
        exact = s[int(np.floor(q * (len(s) - 1)))]
        rel = abs(est[q] - exact) / exact
        assert rel <= acc + 1e-9, (q, est[q], exact, rel)


def test_grouped_and_nonpositive_excluded(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v) * 10) for v in range(1, 101)
    ] + [("a", 0.0), ("a", -5.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    sk = ddsketch_build(df, "x", group_cols=["g"])
    # non-positive rows never land in a bucket
    assert sum(r["n"] for r in sk.where("g = 'a'").collect()) == 100
    est = {
        (r["g"], r["q"]): r["estimate"]
        for r in ddsketch_quantile(sk, qs=(0.5,), group_cols=["g"]).collect()
    }
    assert abs(est[("a", 0.5)] - 50) / 50 <= 0.011
    assert abs(est[("b", 0.5)] - 500) / 500 <= 0.011


def test_sketch_size_is_log_of_range(spark):
    # 6 decades of value range -> a few hundred buckets at a=0.01
    df = spark.createDataFrame(
        [(float(10 ** (i / 100.0)),) for i in range(600)], ["x"]
    )
    n_buckets = ddsketch_build(df, "x", relative_accuracy=0.01).count()
    assert n_buckets < 800


class TestBootstrapStagedPlan:
    """The round-9 bootstrap speedup lives in the PLAN SHAPE: digests,
    uniforms and Poisson weights materialize as staged projections so
    each md5 evaluates once per 4 replicates and each CASE consumes a
    plain column. Pin the expression counts so a refactor that inlines
    the stages (re-multiplying the hash 4-8x per row) fails here."""

    def test_md5_and_conv_counts(self, spark):
        import re

        from pyspark.sql import functions as F

        from pramen_spark.operators.sampling import bootstrap_mean_ci

        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
        )
        out = bootstrap_mean_ci(df, "v", "k", n_boot=40)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"md5", plan)) == 10  # ceil(40/4), not 40
        assert len(re.findall(r"conv", plan)) == 40  # one per replicate
