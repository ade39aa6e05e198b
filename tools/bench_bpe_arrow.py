#!/usr/bin/env python3
"""Measure the Arrow BPE encode engine at PRODUCTION table size
(VERDICT r10 ask #5): a ~48k-rule creation-ordered merge table — the
scale a real tokenizer ships (~50k merges) — driven over synthetic
distinct-word vocabularies of controlled size, plus the corpus-level
`bpe_encode` at sf0.1 / derived sf1.

What this isolates:

- **Vocabulary-boundedness**: encode wall-clock across vocab tiers
  (10k / 100k / 400k distinct words). The Zipf trick means the corpus
  never touches the kernel — only the vocabulary does — so time must
  grow ~linearly in vocab rows with a fixed intercept.
- **Per-task fixed cost**: the rank dict (~48k entries) is pickled into
  the mapInPandas closure and rebuilt per task; the intercept of the
  tier curve bounds it (ship + build cost, paid once per task, NOT per
  word).
- **Corpus path**: `bpe_encode(documents)` end-to-end at sf0.1 and sf1
  (31 / ~310 distinct words — the fixture corpus's tiny vocabulary
  means this measures the join-back, not the kernel; the tiers above
  are the kernel measurement).

Usage: python tools/bench_bpe_arrow.py [sf_small] [sf_big] [out_json] [reps]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 bench_full/bench_r11_bpe_arrow.json 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pramen_spark.operators.text import bpe_encode, bpe_encode_vocab
from pramen_spark.queries.base import load_documents_spread
from pramen_spark.session import build_session

VOCAB_TIERS = [10_000, 100_000, 400_000]


def production_rules() -> list:
    """~48k creation-ordered merges over [a-z0-9]: all 1296 bigrams
    (single chars are always mergeable), then all 46,656 trigrams as
    (bigram-product, char) — every left side is an earlier rule's
    product, so creation-order validation passes and the table routes
    through the Arrow engine (len >> 256)."""
    chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    rules = [(a, b) for a in chars for b in chars]
    rules += [(a + b, c) for a in chars for b in chars for c in chars]
    return rules


def synthetic_vocab(spark, n: int):
    """n distinct pseudo-words, generated JVM-side (no driver loop):
    the md5 hex of the row id, 8-24 chars — alphabet [0-9a-f], so the
    trigram rules above fire heavily and every word is distinct."""
    return spark.range(n).select(
        F.substring(
            F.md5(F.col("id").cast("string")), 1, (F.col("id") % 17 + 8).cast("int")
        ).alias("w")
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "bench_full/bench_r11_bpe_arrow.json"
    )
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = build_session(app_name="bench_bpe_arrow")
    rules = production_rules()
    print(f"rules: {len(rules)}", flush=True)

    # warm-up: JVM + Arrow worker pool
    timed(bpe_encode_vocab(synthetic_vocab(spark, 1000), rules[:300], engine="arrow"))

    tiers = {}
    for n in VOCAB_TIERS:
        ts = sorted(
            timed(
                bpe_encode_vocab(
                    synthetic_vocab(spark, n), rules, engine="arrow"
                )
            )
            for _ in range(reps)
        )
        tiers[n] = {"median": ts[len(ts) // 2], "reps": ts}
        print(f"vocab {n}: {tiers[n]['median']}s", flush=True)

    corpus = {}
    for label, sf_dir in (("sf0.1", small), ("sf1", big)):
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            print(f"skip corpus tier {label}: {sf_dir} missing", flush=True)
            continue
        d = load_documents_spread(spark, sf_dir)
        ts = sorted(timed(bpe_encode(d, rules)) for _ in range(reps))
        corpus[label] = {"median": ts[len(ts) // 2], "reps": ts}
        print(f"corpus {label}: {corpus[label]['median']}s", flush=True)

    # linear fit over tiers: t = a * n + b -> b bounds the per-run fixed
    # cost (rank-dict ship/build across the task wave + plan overhead)
    ns = sorted(tiers)
    xs = [float(n) for n in ns]
    ys = [tiers[n]["median"] for n in ns]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    intercept = my - slope * mx
    payload = {
        "metric": "bpe_arrow_production_table",
        "n_rules": len(rules),
        "vocab_tiers": tiers,
        "corpus": corpus,
        "fit": {
            "sec_per_100k_words": round(slope * 100_000, 4),
            "fixed_cost_sec": round(intercept, 4),
        },
        "reps": reps,
    }
    from benchlib import resolve_artifact_path

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    out_path = resolve_artifact_path(out_path)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    print(json.dumps(payload["fit"]))


if __name__ == "__main__":
    main()
