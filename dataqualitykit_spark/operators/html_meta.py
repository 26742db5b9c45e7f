"""HTML head-metadata extraction as pure column algebra — zero shuffle.

A web-text pipeline wants the head block's signals without a DOM parse:
``<title>`` feeds quality scoring, ``<meta name="description">`` and
``og:title`` feed snippet/selection heuristics, ``<link rel="canonical">``
is the dedup key the crawler intended, and ``<html lang>`` cross-checks
the detected language. All five come out with native ``regexp_extract``
— whole-stage codegen over the html column, no Python, no exchange;
Catalyst prunes the html bytes right after the projection.

The regex constants are the Java/RE2 COMMON SUBSET — inline ``(?is)``
flags, lazy quantifiers, ``\\b``, character classes; no lookaround, no
backreferences — so the exact same strings run in DuckDB for the driver
oracle (the has_noindex/langid shared-constant discipline). Because RE2
lacks backreferences, a quote-delimited attribute value cannot reuse the
opening quote: each field gets one leg per (attribute order x quote
style), coalesced in a fixed order. Values come back raw (entities are
NOT decoded; that is encoding.xmlcharref territory).

Reference parity: the reference has no HTML handling at all (its text
checks start from extracted columns); this extends the web-ingest
surface next to justext_extract (which consumes the body, not the head).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["HTML_META_LEGS", "TITLE_RE", "html_meta_cols", "extract_html_meta"]

TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
HTML_LANG_RE = r"(?is)<html\b[^>]*\blang\s*=\s*[\"']([A-Za-z][A-Za-z0-9-]*)[\"']"


def _attr_legs(tag: str, key: str, val: str, want: str) -> list[str]:
    """The four (order x quote) legs extracting attribute `want` from a
    `tag` element carrying key=val — e.g. content= from
    <meta name="description" ...>. Key/val quoting is a character class
    (either quote matches); the CAPTURED value needs the paired-quote
    legs because RE2 has no backreferences."""
    marker = rf"\b{key}\s*=\s*[\"']{val}[\"']"
    legs = []
    for q in ('"', "'"):
        cap = rf"\b{want}\s*=\s*{q}([^{q}]*){q}"
        legs.append(rf"(?is)<{tag}\b[^>]*{marker}[^>]*{cap}")   # key first
        legs.append(rf"(?is)<{tag}\b[^>]*{cap}[^>]*{marker}")   # value first
    return legs


HTML_META_LEGS: dict[str, list[str]] = {
    "title": [TITLE_RE],
    "meta_description": _attr_legs("meta", "name", "description", "content"),
    "canonical_url": _attr_legs("link", "rel", "canonical", "href"),
    "og_title": _attr_legs("meta", "property", "og:title", "content"),
    "html_lang": [HTML_LANG_RE],
}

# single source for the whitespace btrim set (title gets trimmed; attribute
# values are returned byte-raw)
_WS = " \t\r\n\f\v"


def html_meta_cols(html_col: str = "html") -> dict[str, Column]:
    """name -> Column for the five head fields. NULL when absent (the
    legs coalesce in fixed order; '' never escapes)."""
    out: dict[str, Column] = {}
    for name, legs in HTML_META_LEGS.items():
        col = F.coalesce(
            *[
                F.nullif(F.regexp_extract(F.col(html_col), leg, 1), F.lit(""))
                for leg in legs
            ]
        )
        if name == "title":
            col = F.nullif(F.btrim(col, F.lit(_WS)), F.lit(""))
        out[name] = col
    return out


def extract_html_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds title / meta_description / canonical_url / og_title /
    html_lang columns. One zero-shuffle projection."""
    cols = html_meta_cols(html_col)
    return df.select("*", *[c.alias(n) for n, c in cols.items()])


def html_meta_sql_exprs(html_expr: str = "html") -> dict[str, str]:
    """The DuckDB twin of html_meta_cols: identical regex constants
    rendered as SQL expressions (oracle side of the driver query)."""
    out = {}
    for name, legs in HTML_META_LEGS.items():
        parts = [
            "nullif(regexp_extract({h}, '{p}', 1), '')".format(
                h=html_expr, p=leg.replace("'", "''")
            )
            for leg in legs
        ]
        expr = parts[0] if len(parts) == 1 else f"coalesce({', '.join(parts)})"
        if name == "title":
            # build the btrim set with chr() — SQL single-quoted literals
            # do not interpret backslash escapes
            trimset = "' ' || chr(9) || chr(13) || chr(10) || chr(12) || chr(11)"
            expr = f"nullif(trim({expr}, {trimset}), '')"
        out[name] = expr
    return out


# ---------------------------------------------------------------------------
# Publish-date / freshness extraction (the head-meta family's second half:
# selection pipelines weight recency, takedown audits need the claimed
# publication date next to the crawl date).
# ---------------------------------------------------------------------------

PUBLISH_DATE_LEGS: list[str] = (
    _attr_legs("meta", "property", "article:published_time", "content")
    + _attr_legs("meta", "name", "date", "content")
    + [
        rf"(?is)<time\b[^>]*\bdatetime\s*=\s*{q}([^{q}]*){q}"
        for q in ('"', "'")
    ]
)

# fixed ISO-8601 subset, one leg per shape; zone OFFSETS are out of scope
# (documented — the Z leg covers the crawl-dominant UTC form)
_TS_FORMATS = [
    ("yyyy-MM-dd'T'HH:mm:ss'Z'", "%Y-%m-%dT%H:%M:%SZ"),
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
]


def publish_date_raw_col(html_col: str = "html") -> Column:
    """The first matching date string from article:published_time /
    meta name=date / <time datetime=...> — raw, undecoded."""
    return F.coalesce(
        *[
            F.nullif(F.regexp_extract(F.col(html_col), leg, 1), F.lit(""))
            for leg in PUBLISH_DATE_LEGS
        ]
    )


def publish_ts_col(raw: Column) -> Column:
    """Raw date string -> timestamp via the fixed ISO legs (try_to_
    timestamp: a malformed date yields NULL, never a job failure)."""
    return F.coalesce(
        *[F.try_to_timestamp(raw, F.lit(spark_fmt)) for spark_fmt, _ in _TS_FORMATS]
    )


def extract_publish_dates(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds publish_date_raw + publish_ts. Zero-shuffle projection."""
    raw = publish_date_raw_col(html_col)
    out = df.select("*", raw.alias("publish_date_raw"))
    return out.select(
        "*", publish_ts_col(F.col("publish_date_raw")).alias("publish_ts")
    )


def publish_date_sql_exprs(html_expr: str = "html") -> dict[str, str]:
    """DuckDB twin: identical regex legs; try_strptime mirrors each
    Spark format leg in order."""
    raw = "coalesce({})".format(
        ", ".join(
            "nullif(regexp_extract({h}, '{p}', 1), '')".format(
                h=html_expr, p=leg.replace("'", "''")
            )
            for leg in PUBLISH_DATE_LEGS
        )
    )
    ts = "coalesce({})".format(
        ", ".join(
            f"try_strptime(({raw}), '{duck_fmt}')" for _, duck_fmt in _TS_FORMATS
        )
    )
    return {"publish_date_raw": raw, "publish_ts": ts}


def py_html_meta(html: str | None) -> dict[str, str | None]:
    """Pure-python mirror of html_meta_cols + publish_date_raw_col (fuzz
    tests pin Spark == mirror). Python re accepts the shared constants
    verbatim — (?is), \\b, lazy quantifiers and character classes behave
    identically to Java regex over these patterns."""
    import re as _re

    out: dict[str, str | None] = {}
    if html is None:
        for name in list(HTML_META_LEGS) + ["publish_date_raw"]:
            out[name] = None
        return out
    for name, legs in list(HTML_META_LEGS.items()) + [
        ("publish_date_raw", PUBLISH_DATE_LEGS)
    ]:
        val = None
        for leg in legs:
            m = _re.search(leg, html)
            if m is not None and m.group(1) != "":
                val = m.group(1)
                break
        if name == "title" and val is not None:
            val = val.strip(_WS) or None
        out[name] = val
    return out


def canonical_dedup_key_col(html_col: str = "html", url_col: str = "url") -> Column:
    """The dedup key the crawler intended: the page's own
    ``<link rel=canonical>`` when it is an absolute http(s) URL
    (relative canonicals can't resolve without a base — out of scope),
    else the fetch URL; both normalized (case-folded head, fragment +
    tracking params stripped) so syndicated copies and tracked links
    collapse to ONE key. Feed this to dedup.dedup_keep_first in place of
    the raw url — still a zero-shuffle projection."""
    from ..functions.text import normalize_url

    canon = html_meta_cols(html_col)["canonical_url"]
    canon_abs = F.when(canon.rlike(r"(?i)^https?://"), canon)
    return F.coalesce(
        normalize_url(canon_abs), normalize_url(F.col(url_col))
    )
