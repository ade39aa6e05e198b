"""Catalog-wide oracle hygiene tests.

Two regressions the driver's correctness gate caught in earlier rounds are
pinned here so they cannot recur silently:

1. **HUGEINT dtype drift** — DuckDB ``SUM`` over integer input returns
   HUGEINT, which pandas converts to float64 (``36170.0``), while Spark
   returns int64 (``36170``).  Rows and schema still match, but the
   driver's value hash diverges.  Every oracle must therefore CAST
   integer SUMs to BIGINT.  ``test_no_hugeint_in_oracle_output`` binds
   every oracle in DuckDB (binding only — no execution) and fails if any
   projected column is HUGEINT/UHUGEINT.

2. **Out-of-window regressions** — the driver's CORRECTNESS gate runs the
   first 50 catalog queries only; the remaining ones were previously
   checked only by the judge's manual sweep.  ``test_out_of_window_oracles``
   runs the same Spark-vs-DuckDB compare (tools/check_oracle.py logic) over
   every query *outside* the driver window at sf0.001, so a regression
   there fails pytest instead of waiting a round for the judge.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import check_oracle  # noqa: E402  (tools/check_oracle.py)
from pramen_spark.queries.catalog import QUERIES  # noqa: E402

DRIVER_WINDOW = 50

_ORACLES = [(name, spec.oracle) for name, spec in QUERIES.items() if spec.oracle]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = check_oracle.duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name,oracle", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_no_hugeint_in_oracle_output(duck, name, oracle):
    """No oracle may project HUGEINT: pandas renders it float64, which
    breaks the driver's value hash against Spark's int64 even when every
    cell is numerically identical (round-5 q12/token_budget_mix bug)."""
    rel = duck.sql(oracle)  # lazy relation: binds + plans, does not execute
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if "HUGEINT" in str(typ).upper()
    ]
    assert not bad, (
        f"oracle for {name!r} projects HUGEINT columns {bad}; "
        f"wrap the integer aggregate in CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name,oracle", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_no_nested_types_in_oracle_output(duck, name, oracle):
    """No oracle may project LIST/STRUCT/MAP columns: the driver's pandas
    canonicalizer factorizes every cell and dies on unhashable values
    (round-12 quantize_embeddings_int8 crash — ``TypeError: unhashable
    type: 'list'``). Serialize arrays to a comma-joined scalar in BOTH
    the query and the oracle (concat_ws / array_to_string)."""
    rel = duck.sql(oracle)  # lazy relation: binds + plans, does not execute
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(k in str(typ).upper() for k in ("[]", "STRUCT", "MAP("))
    ]
    assert not bad, (
        f"oracle for {name!r} projects nested-typed columns {bad}; the "
        f"driver's pandas canonicalizer cannot hash list/struct/map "
        f"cells — serialize to a scalar (array_to_string / concat_ws)"
    )


def _out_of_window_names() -> list[str]:
    return list(QUERIES)[DRIVER_WINDOW:]


def test_driver_canonicalizable_catches_list_cells():
    # the r12 crash shape: values equal, but a list-typed cell kills the
    # driver's pandas factorize — the helper must flag it, and pass
    # ordinary scalar results (incl. None/mixed-null columns)
    ok = check_oracle.driver_canonicalizable(
        ["a", "b"], [(1, "x"), (2, None), (3, "y")]
    )
    assert ok is None
    bad = check_oracle.driver_canonicalizable(
        ["a", "qvec"], [(1, [9, 8]), (2, [7])]
    )
    assert bad and "unhashable" in bad


def _sweep(spark, sf_dir, names: list[str]) -> list[str]:
    """Spark-vs-DuckDB value compare PLUS the driver-canonicalizer parity
    check (pandas sort+hash over the result — the round-12 failure class
    where values matched but the driver's canonicalizer crashed on list
    cells). Returns failure strings."""
    con = check_oracle.duck_connect(sf_dir)
    failures: list[str] = []
    for name in names:
        spec = QUERIES[name]
        sdf = spec.build(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        canon_err = check_oracle.driver_canonicalizable(s_cols, s_rows)
        if canon_err:
            failures.append(f"{name}: driver-canonicalizer: {canon_err}")
        if spec.oracle is None:
            assert len(s_rows) >= 0  # rows-only: mirrors the driver's weak check
            continue
        cur = con.execute(spec.oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
        problems = check_oracle.compare(name, s_cols, s_rows, o_cols, o_rows)
        if problems:
            failures.append(f"{name}: {problems[0]}")
    con.close()
    return failures


@pytest.mark.slow
def test_window_oracles(spark, sf_dir):
    """Spark-vs-DuckDB value compare + driver-canonicalizer parity for
    the 50 queries INSIDE the driver's CORRECTNESS window, so a window
    query that would fail the driver's gate fails pytest first (the r12
    quantize_embeddings_int8 red row was only discoverable at driver
    time)."""
    failures = _sweep(spark, sf_dir, list(QUERIES)[:DRIVER_WINDOW])
    assert not failures, "window oracle mismatches:\n" + "\n".join(failures)


@pytest.mark.slow
def test_out_of_window_oracles(spark, sf_dir):
    """Spark-vs-DuckDB value compare for every catalog query the driver's
    50-query CORRECTNESS window does not reach (driver mechanism:
    catalog.py::_DRIVER_WINDOW_PRIORITY)."""
    failures = _sweep(spark, sf_dir, _out_of_window_names())
    assert not failures, "out-of-window oracle mismatches:\n" + "\n".join(failures)
