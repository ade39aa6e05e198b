"""Jaro-Winkler linkage (operators/dedup.py): the scorer must reproduce
the DuckDB convention exactly (that is what licenses the oracle), and
the blocked pair join must honor its documented recall envelope."""

import duckdb
import pytest

from pramen_spark.operators.dedup import _jaro_winkler, jaro_winkler_pairs


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    s = build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )
    yield s


def test_textbook_values():
    assert abs(_jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(_jaro_winkler("dwayne", "duane") - 0.84) < 1e-12
    assert _jaro_winkler("abc", "abc") == 1.0
    assert _jaro_winkler("", "abc") == 0.0
    assert _jaro_winkler("", "") == 0.0  # DuckDB convention, not 1
    assert _jaro_winkler("ab", "ba") == 0.0  # window 0: no matches


def test_matches_duckdb_on_random_strings():
    import random

    con = duckdb.connect()
    rng = random.Random(123)
    for _ in range(500):
        s1 = "".join(rng.choice("abcdxyz") for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice("abcdxyz") for _ in range(rng.randint(0, 12)))
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(_jaro_winkler(s1, s2) - d) < 1e-12, (s1, s2)


def test_blocked_pairs(spark):
    rows = [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "the quick brown fox jmups"),   # transposition, same block
        (3, "en", "the quick red fox jumps"),     # same 8-char block
        (4, "en", "a totally different text"),    # different block
        (5, "de", "the quick brown fox jumps"),   # same text, other lang
        (6, "en", "   "),                         # blank: excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in jaro_winkler_pairs(df, min_sim=0.8).collect()
    }
    assert (1, 2) in out and out[(1, 2)] > 0.95
    assert (1, 3) in out  # same block, high prefix agreement
    assert not any(4 in p or 5 in p or 6 in p for p in out)
    # scores match DuckDB on the emitted pairs
    con = duckdb.connect()
    texts = {r[0]: r[2].lower().strip()[:64] for r in rows}
    for (a, b), jw in out.items():
        d = con.execute(
            "SELECT ROUND(jaro_winkler_similarity(?, ?), 6)",
            [texts[a], texts[b]],
        ).fetchone()[0]
        assert abs(jw - d) < 1e-9
