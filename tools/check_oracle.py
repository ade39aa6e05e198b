#!/usr/bin/env python3
"""Side-by-side Spark-vs-DuckDB oracle check, mimicking the driver's
correctness gate: row count, sorted column names, and exact value
comparison (order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def to_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name and rows by string repr — order-insensitive,
    type-faithful (python objects, no pandas dtype coercion)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    reordered = [tuple(r[i] for i in order) for r in rows]
    reordered.sort(key=lambda r: tuple(str(c) for c in r))
    return cols, reordered


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b or str(a) == str(b)


def driver_canonicalizable(columns: list[str], rows: list[tuple]) -> str | None:
    """Mimic the DRIVER's pandas canonicalization (sort all columns by
    name, sort_values over every column, hash the values): returns an
    error string when pandas cannot process the result — e.g. unhashable
    list cells, the round-12 ``quantize_embeddings_int8`` crash class
    that this module's python-object compare sailed past — else None."""
    try:
        pdf = pd.DataFrame(rows, columns=columns)
        pdf = pdf[sorted(columns)]
        pdf = pdf.sort_values(by=list(pdf.columns))
        pd.util.hash_pandas_object(pdf, index=False)
    except Exception as e:  # noqa: BLE001 — any pandas failure is the signal
        return f"{type(e).__name__}: {e}"
    return None


def compare(
    name: str,
    s_cols: list[str],
    s_rows: list[tuple],
    o_cols: list[str],
    o_rows: list[tuple],
) -> list[str]:
    problems: list[str] = []
    s_cols, s_rows = to_rows(s_cols, s_rows)
    o_cols, o_rows = to_rows(o_cols, o_rows)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems
    n_bad = 0
    max_float_diff = 0.0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for j, (a, b) in enumerate(zip(sr, orow)):
            if not cells_equal(a, b):
                if isinstance(a, float) and isinstance(b, float):
                    max_float_diff = max(max_float_diff, abs(a - b))
                n_bad += 1
                if n_bad <= 3:
                    problems.append(
                        f"  cell mismatch [{s_cols[j]}][row {i}]: spark={a!r} oracle={b!r}"
                        f" (types {type(a).__name__}/{type(b).__name__})"
                    )
    if n_bad:
        problems.insert(0, f"{n_bad} mismatched cells (max float diff {max_float_diff:.3e})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pramen_spark.queries.catalog import QUERIES
    from pramen_spark.session import build_session

    spark = build_session(app_name="check_oracle", master="local[8]",
                          extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duck_connect(sf_dir)

    n_pass = n_fail = n_skip = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.build(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: rows-only check ({len(s_rows)} rows)")
            n_skip += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, s_cols, s_rows, o_cols, o_rows)
        canon_err = driver_canonicalizable(s_cols, s_rows)
        if canon_err:
            problems.append(f"driver-canonicalizer would fail: {canon_err}")
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
