#!/usr/bin/env python3
"""Derive a larger scale factor from an existing testdata directory by a
deterministic k-fold union with re-keyed ids (testdata itself is
read-only, so the derived set lands under /tmp by default).

Within copy k every primary/foreign key gets the same offset, so joins
stay internally consistent per copy; dimension tables (region, nation)
are shared. Content columns are deterministically perturbed per copy so
content-addressed operators see a realistically-growing corpus instead
of a pathological one:

- documents.text: per-copy vowel rotation (``translate``) — most
  shingles/fingerprints change, length and token shape are preserved;
  copy 0 is the original. Cross-copy exact/near duplicates still exist
  for vowel-free lines — intended: a real 10x corpus has duplicates.
- embeddings.embedding: a small per-(copy, dimension) sinusoidal offset
  — vectors stay in the same region of space (LSH buckets stay busy)
  without being bit-identical across copies.
- events keep their time range: 10x traffic over the same calendar, so
  windowed/daily operators see row growth, not calendar growth.

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pramen_spark.queries.base import load_events
from pramen_spark.session import build_session

VOWELS = "aeiou"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session(app_name="make_scaled_sf")
    os.makedirs(dst, exist_ok=True)

    def write(name, df):
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")

    def k_union(build_copy):
        out = build_copy(0)
        for k in range(1, copies):
            out = out.unionByName(build_copy(k))
        return out

    # shared dimensions
    for dim in ("region", "nation"):
        write(dim, spark.read.parquet(f"{src}/{dim}.parquet"))

    customer = spark.read.parquet(f"{src}/customer.parquet")
    write(
        "customer",
        k_union(
            lambda k: customer.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(k * 10_000_000)
            )
        ),
    )

    supplier = spark.read.parquet(f"{src}/supplier.parquet")
    write(
        "supplier",
        k_union(
            lambda k: supplier.withColumn(
                "s_suppkey", F.col("s_suppkey") + F.lit(k * 1_000_000)
            )
        ),
    )

    part = spark.read.parquet(f"{src}/part.parquet")
    write(
        "part",
        k_union(
            lambda k: part.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(k * 10_000_000)
            )
        ),
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    write(
        "orders",
        k_union(
            lambda k: orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000)
            ).withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 10_000_000))
        ),
    )

    lineitem = spark.read.parquet(f"{src}/lineitem.parquet")
    write(
        "lineitem",
        k_union(
            lambda k: lineitem.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000)
            )
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * 10_000_000))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * 1_000_000))
        ),
    )

    events = load_events(spark, src)
    write(
        "events",
        k_union(
            lambda k: events.withColumn(
                "event_id", F.col("event_id") + F.lit(k * 1_000_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(k * 10_000_000))
        ),
    )

    documents = spark.read.parquet(f"{src}/documents.parquet")

    def doc_copy(k):
        rot = VOWELS[k % 5 :] + VOWELS[: k % 5]
        return documents.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 1_000_000)
        ).withColumn("text", F.translate(F.col("text"), VOWELS, rot))

    write("documents", k_union(doc_copy))

    embeddings = spark.read.parquet(f"{src}/embeddings.parquet")

    def emb_copy(k):
        return embeddings.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 1_000_000)
        ).withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x + F.sin(i.cast("double") + F.lit(float(k))) / F.lit(50.0)
                ).cast("float"),
            ),
        )

    write("embeddings", k_union(emb_copy))
    spark.stop()


if __name__ == "__main__":
    main()
