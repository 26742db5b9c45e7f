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


PUB_CASES = [
    ('<meta property="article:published_time" content="2024-03-05T06:07:08Z">',
     "2024-03-05T06:07:08Z", "2024-03-05 06:07:08"),
    ("<meta content='2023-12-31T23:59:59' property='article:published_time'>",
     "2023-12-31T23:59:59", "2023-12-31 23:59:59"),
    ("<meta name='date' content='2022-01-15'>", "2022-01-15", "2022-01-15 00:00:00"),
    ('<article><time datetime="2021-07-04">July 4</time></article>',
     "2021-07-04", "2021-07-04 00:00:00"),
    ('<meta name="date" content="not a date">', "not a date", None),
    ("<p>no dates at all</p>", None, None),
]


def test_publish_dates(spark):
    from dataqualitykit_spark.operators.html_meta import extract_publish_dates

    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(PUB_CASES)], "id int, html string"
    )
    got = {r["id"]: r for r in extract_publish_dates(df).collect()}
    for i, (_, raw, ts_str) in enumerate(PUB_CASES):
        assert got[i]["publish_date_raw"] == raw, i
        ts = got[i]["publish_ts"]
        if ts_str is None:
            assert ts is None, i
        else:
            assert ts.strftime("%Y-%m-%d %H:%M:%S") == ts_str, i


def test_publish_date_duckdb_twin(spark):
    from dataqualitykit_spark.operators.html_meta import publish_date_sql_exprs

    e = publish_date_sql_exprs("html")
    con = duckdb.connect()
    for i, (h, raw, ts_str) in enumerate(PUB_CASES):
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS html", [h])
        got_raw, got_ts = con.execute(
            f"SELECT {e['publish_date_raw']},"
            f" strftime({e['publish_ts']}, '%Y-%m-%d %H:%M:%S') FROM t"
        ).fetchone()
        assert got_raw == raw, i
        assert got_ts == ts_str, i


def _random_head(rng) -> str:
    q = rng.choice(['"', "'"])
    junk = rng.choice(["", " id='x'", ' data-k="v"', " async"])
    parts = []
    if rng.random() < 0.7:
        parts.append(f"<title{junk}>T{rng.randrange(100)} </title>")
    if rng.random() < 0.7:
        attrs = [f"name={q}description{q}", f"content={q}D {rng.randrange(100)}{q}"]
        rng.shuffle(attrs)
        parts.append(f"<meta{junk} {attrs[0]}{junk} {attrs[1]}>")
    if rng.random() < 0.5:
        attrs = [f"rel={q}canonical{q}", f"href={q}https://x/{rng.randrange(50)}{q}"]
        rng.shuffle(attrs)
        parts.append(f"<link {attrs[0]} {attrs[1]}>")
    if rng.random() < 0.5:
        attrs = [f"property={q}og:title{q}", f"content={q}OG{rng.randrange(30)}{q}"]
        rng.shuffle(attrs)
        parts.append(f"<meta {attrs[0]} {attrs[1]}>")
    if rng.random() < 0.5:
        parts.append(
            f"<meta property={q}article:published_time{q} "
            f"content={q}202{rng.randrange(5)}-0{1 + rng.randrange(9)}-1{rng.randrange(9)}{q}>"
        )
    if rng.random() < 0.4:
        parts.append("<p>body mentions content=\"fake\" and title: no</p>")
    rng.shuffle(parts)
    html = "".join(parts)
    lang = rng.choice(["", f'<html lang={q}en{q}>'])
    case = rng.random()
    if case < 0.25:
        html = html.upper()
    elif case < 0.4:
        html = html.lower()
    return lang + html


def test_fuzz_spark_matches_python_mirror(spark):
    import random

    from dataqualitykit_spark.operators.html_meta import (
        extract_html_meta,
        extract_publish_dates,
        py_html_meta,
    )

    rng = random.Random(20260819)
    htmls = [_random_head(rng) for _ in range(250)]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "id int, html string"
    )
    out = extract_publish_dates(extract_html_meta(df), "html")
    got = {r["id"]: r for r in out.collect()}
    for i, h in enumerate(htmls):
        exp = py_html_meta(h)
        for f in FIELDS + ["publish_date_raw"]:
            assert got[i][f] == exp[f], (i, f, h)


def test_canonical_dedup_key(spark):
    from dataqualitykit_spark.operators.html_meta import canonical_dedup_key_col

    rows = [
        # two tracked copies of the same article declaring one canonical
        (0, "https://m.ex.com/a?utm_source=x",
         '<link rel="canonical" href="HTTPS://Ex.COM/article/1">'),
        (1, "https://ex.com/a?ref=feed&utm_medium=rss",
         "<link href='https://ex.com/article/1#top' rel='canonical'>"),
        # relative canonical ignored -> fetch url (normalized) is the key
        (2, "https://Other.example/Page?utm_campaign=z",
         '<link rel="canonical" href="/article/1">'),
        # no canonical at all
        (3, "https://plain.example/x#frag", "<body>n</body>"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, "id int, url string, html string")
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", canonical_dedup_key_col("html", "url").alias("k")
        ).collect()
    }
    assert got[0] == got[1] == "https://ex.com/article/1"
    assert got[2] == "https://other.example/Page"
    assert got[3] == "https://plain.example/x"
    assert got[4] is None
