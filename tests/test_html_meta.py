"""HTML head-metadata extraction: every (order x quote) leg, case folds,
attribute gaps, absent fields, and Spark<->DuckDB parity on the shared
regex constants."""

from __future__ import annotations

import duckdb
import pytest

from dataqualitykit_spark.operators.html_meta import (
    extract_html_meta,
    html_meta_sql_exprs,
)

CASES = [
    (  # canonical everything, double quotes, name-first
        '<html lang="en"><head><title> My Page </title>'
        '<meta name="description" content="A fine page">'
        '<link rel="canonical" href="https://ex.com/a">'
        '<meta property="og:title" content="OG Page"></head>',
        ("My Page", "A fine page", "https://ex.com/a", "OG Page", "en"),
    ),
    (  # reversed attribute order, single quotes, uppercase tags
        "<HTML LANG='de-AT'><TITLE>Seite</TITLE>"
        "<META content='Beschreibung' NAME='description'>"
        "<LINK href='https://ex.com/b' REL='canonical'>"
        "<META content='OG Seite' PROPERTY='og:title'>",
        ("Seite", "Beschreibung", "https://ex.com/b", "OG Seite", "de-AT"),
    ),
    (  # intervening attributes + multiline title
        '<html data-x="1" lang="fr"><title id="t">\nLigne\n</title>'
        '<meta charset="utf-8"><meta id="d" name="description" '
        'data-y="2" content="Desc FR">',
        ("Ligne", "Desc FR", None, None, "fr"),
    ),
    (  # nothing present
        "<html><body><p>plain</p></body></html>",
        (None, None, None, None, None),
    ),
    (  # body text mentioning the markers must not match
        '<html><body><p>set name="description" content="nope" in a '
        "paragraph, not a meta tag; title: fake</p></body></html>",
        (None, None, None, None, None),
    ),
    (  # single-quoted value with an embedded double quote survives raw
        "<title>a</title><meta name='description' content='say \"hi\"'>",
        ("a", 'say "hi"', None, None, None),
    ),
]

FIELDS = ["title", "meta_description", "canonical_url", "og_title", "html_lang"]


def test_extract_fields(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "id int, html string"
    )
    got = {
        r["id"]: tuple(r[f] for f in FIELDS)
        for r in extract_html_meta(df).collect()
    }
    for i, (_, exp) in enumerate(CASES):
        assert got[i] == exp, f"case {i}"


def test_duckdb_twin_parity(spark):
    """The exact regex constants must produce identical values in DuckDB
    (driver-oracle precondition)."""
    exprs = html_meta_sql_exprs("html")
    sql = "SELECT " + ", ".join(f"{e} AS {n}" for n, e in exprs.items()) + " FROM t"
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "id int, html string"
    )
    spark_rows = {
        r["id"]: tuple(r[f] for f in FIELDS)
        for r in extract_html_meta(df).collect()
    }
    for i, (h, _) in enumerate(CASES):
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS html", [h])
        duck = con.execute(sql).fetchone()
        assert tuple(duck) == spark_rows[i], f"case {i}"


def test_null_html(spark):
    df = spark.createDataFrame([(1, None)], "id int, html string")
    [r] = extract_html_meta(df).collect()
    assert all(r[f] is None for f in FIELDS)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "<title>x</title>")], "id int, html string")
    plan = extract_html_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
