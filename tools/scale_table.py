#!/usr/bin/env python3
"""Render the SCALE.md trendline table from a bench_scale JSON artifact.

Usage: python tools/scale_table.py [bench_full/bench_r10_sf1.json]
Prints the markdown table (ratio-descending) plus worst-alpha summary.
"""

import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_full/bench_r10_sf1.json"
rows = json.load(open(path))["queries"]
print("| query | t sf0.1 (s) | t sf1 (s) | ratio | alpha |")
print("|---|---|---|---|---|")
fmt = lambda x: "n/a" if x is None else f"{x:.2f}"  # noqa: E731
for name, v in sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
    print(
        f"| {name} | {fmt(v['t_small'])} | {fmt(v['t_big'])} "
        f"| {fmt(v['ratio'])} | {fmt(v['alpha'])} |"
    )
worst = max(rows.items(), key=lambda kv: kv[1]["alpha"] or -9)
over1 = [k for k, v in rows.items() if (v["alpha"] or 0) > 1]
print(f"\nworst alpha: {worst[0]} {worst[1]['alpha']}; queries over 1.0: {over1}")
