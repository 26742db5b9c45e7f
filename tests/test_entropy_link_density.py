"""Goldens for the round-5 session-4 ops: token_entropy (per-doc Shannon
entropy, one Arrow pass) and link_density (jusText boilerplate signal
over raw html). Hand-computable fixtures pin the math and the regex
edge cases; the engine-vs-engine value parity is covered by the driver
oracles (test_entry_contract exercises both queries end-to-end)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.functions import text as T
from dataqualitykit_spark.operators.entropy import py_token_entropy, token_entropy


def _entropy_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_entropy(df)
    return {r["id"]: (r["n_tokens"], r["n_distinct"], r["entropy"]) for r in out.collect()}


def test_token_entropy_goldens(spark):
    got = _entropy_rows(
        spark,
        [
            (1, "a a b b"),           # uniform over 2 tokens -> ln 2
            (2, "x x x x"),           # single token type -> 0.0
            (3, "a b c d e"),         # all distinct -> ln 5
            (4, None),                # NULL -> token-less
            (5, "   \t\n  "),         # whitespace-only -> token-less
            (6, "a a a b"),           # 3/4, 1/4 mix
        ],
    )
    assert got[1] == (4, 2, round(math.log(2), 6))
    assert got[2] == (4, 1, 0.0)
    assert got[3] == (5, 5, round(math.log(5), 6))
    assert got[4] == (0, 0, None)
    assert got[5] == (0, 0, None)
    h6 = math.log(4) - (3 * math.log(3)) / 4
    assert got[6] == (4, 2, round(h6, 6))


def test_py_token_entropy_mirror():
    n, d, h = py_token_entropy("a a b b")
    assert (n, d) == (4, 2) and abs(h - math.log(2)) < 1e-12
    assert py_token_entropy(None) == (0, 0, None)
    assert py_token_entropy("") == (0, 0, None)
    # entropy is maximal at all-distinct: H == ln(n)
    n, d, h = py_token_entropy("one two three")
    assert abs(h - math.log(3)) < 1e-12


def _ld_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = df.select(
        "doc_id",
        T.anchor_char_count(F.col("html")).alias("a"),
        T.visible_char_count(F.col("html")).alias("v"),
        T.link_density(F.col("html")).alias("ld"),
    )
    return {r["doc_id"]: (r["a"], r["v"], r["ld"]) for r in out.collect()}


def test_link_density_goldens(spark):
    got = _ld_rows(
        spark,
        [
            # 4 anchor chars ("home"), 14 visible ("home" + "ten chars!")
            (1, '<p><a href="/">home</a>ten chars!</p>'),
            # no anchors at all -> density 0.0
            (2, "<p>plain prose here</p>"),
            # nested tag inside the anchor is stripped: "Read more" = 9
            (3, '<a href="/m">Read <b>more</b></a>'),
            # unclosed trailing anchor contributes nothing
            (4, 'text<a href="/broken">unclosed'),
            # attribute-less <a> still matches
            (5, "<a>x</a>"),
            # only tags -> zero visible chars -> NULL, not div-by-zero
            (6, "<br><hr>"),
            # NULL html -> NULL everywhere
            (7, None),
            # multi-line anchor: (?s) lets the inner text span newlines
            (8, '<a\nhref="/x">line1\nline2</a>'),
            # case-insensitive: <A HREF=...>...</A>
            (9, '<A HREF="/x">UP</A>'),
        ],
    )
    assert got[1] == (4, 14, 4 / 14)
    assert got[2] == (0, 16, 0.0)
    assert got[3] == (9, 9, 1.0)
    assert got[4] == (0, 12, 0.0)
    assert got[5] == (1, 1, 1.0)
    assert got[6] == (0, 0, None)
    assert got[7] == (None, None, None)
    assert got[8] == (11, 11, 1.0)
    assert got[9] == (2, 2, 1.0)


def test_link_density_everything_linked_page(spark):
    # a pure nav page: all visible text inside anchors -> exactly 1.0
    nav = "".join(f'<li><a href="/{i}">item {i}</a></li>' for i in range(10))
    got = _ld_rows(spark, [(1, f"<ul>{nav}</ul>")])
    a, v, ld = got[1]
    assert a == v and ld == 1.0
