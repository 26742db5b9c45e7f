"""Readability counts + Flesch scores: hand-computed goldens, NULL/empty
edges, DuckDB twin bit-parity, zero-shuffle plan."""

from __future__ import annotations

import duckdb

from dataqualitykit_spark.operators.readability import (
    readability,
    readability_sql_exprs,
)

DOCS = [
    (0, "The cat sat on the mat."),
    (1, "beautiful"),
    (2, "Mr Grr."),  # vowel-less words floor at 1 syllable each
    (3, "Hi. Bye! Ok?"),
    (4, "no terminal punctuation here"),
    (5, ""),
    (6, None),
    (7, "Wait...   what?!"),
]


def _collect(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    return {r["doc_id"]: r for r in readability(df).collect()}


def test_counts(spark):
    got = _collect(spark)
    assert (got[0]["n_words"], got[0]["n_sentences"], got[0]["n_syllables"]) == (6, 1, 6)
    assert (got[1]["n_words"], got[1]["n_sentences"], got[1]["n_syllables"]) == (1, 1, 3)
    assert (got[2]["n_words"], got[2]["n_sentences"], got[2]["n_syllables"]) == (2, 1, 2)
    assert (got[3]["n_words"], got[3]["n_sentences"], got[3]["n_syllables"]) == (3, 3, 3)
    assert (got[4]["n_sentences"], got[4]["n_syllables"]) == (1, 9)
    assert (got[7]["n_words"], got[7]["n_sentences"]) == (2, 2)


def test_scores(spark):
    got = _collect(spark)
    # monosyllabic one-sentence prose: 206.835 - 1.015*6 - 84.6*1
    assert abs(got[0]["flesch_ease"] - 116.145) < 1e-9
    assert abs(got[0]["fk_grade"] - (0.39 * 6 + 11.8 - 15.59)) < 1e-9


def test_null_and_empty(spark):
    got = _collect(spark)
    assert (got[5]["n_words"], got[5]["n_sentences"]) == (0, 0)
    assert got[5]["flesch_ease"] is None and got[5]["fk_grade"] is None
    assert all(
        got[6][f] is None
        for f in ("n_words", "n_sentences", "n_syllables", "flesch_ease", "fk_grade")
    )


def test_duckdb_twin_bit_parity(spark):
    exprs = readability_sql_exprs("text")
    sql = (
        "SELECT doc_id, "
        + ", ".join(f"{e} AS {n}" for n, e in exprs.items())
        + " FROM t ORDER BY doc_id"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if s is None else repr(s)})" for i, s in DOCS
        )
        + ") AS v(doc_id, text)"
    )
    duck = {row[0]: row for row in con.execute(sql).fetchall()}
    got = _collect(spark)
    for i, _ in DOCS:
        s = got[i]
        d = duck[i]
        assert (s["n_words"], s["n_sentences"], s["n_syllables"]) == (
            d[1], d[2], d[3],
        ), i
        for k, v in ((4, s["flesch_ease"]), (5, s["fk_grade"])):
            if v is None:
                assert d[k] is None, i
            else:
                assert v == d[k], (i, v, d[k])  # bit-identical, no tolerance


def test_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a b.")], "doc_id int, text string")
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fuzz_spark_matches_python_mirror(spark):
    """300 random texts (letters, digits, punctuation, unicode,
    whitespace runs): Spark columns == py_readability bitwise."""
    import random

    from dataqualitykit_spark.operators.readability import py_readability

    rng = random.Random(20260819)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzAEIOUY .,!?.. \t\n"
        "0123456789 -_' éüß мир 你好  "
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 160)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    for i, t in enumerate(texts):
        nw, ns, sy, ease, grade = py_readability(t)
        r = got[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            nw, ns, sy,
        ), (i, repr(t))
        assert r["flesch_ease"] == ease and r["fk_grade"] == grade, (i, repr(t))


def test_vertical_tab_parity(spark):
    """\\x0B is whitespace in Java \\s but NOT in RE2 \\s — the explicit
    ASCII class keeps all three engines identical (probe-found)."""
    from dataqualitykit_spark.operators.readability import (
        py_readability,
        readability_sql_exprs,
    )

    t = "one\x0btwo. three"
    df = spark.createDataFrame([(0, t)], "doc_id int, text string")
    [r] = readability(df).collect()
    nw, ns, sy, ease, grade = py_readability(t)
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (nw, ns, sy) == (3, 2, sy)
    e = readability_sql_exprs("text")
    got = duckdb.sql(
        f"SELECT {e['n_words']}, {e['n_sentences']} FROM (SELECT '{t}' AS text)"
    ).fetchone()
    assert got == (3, 2)
