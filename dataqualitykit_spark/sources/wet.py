"""Common-Crawl WET (extracted-text) reader, Spark-first.

A WET file is a concatenation of records:

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: https://...
    WARC-Date: 2024-01-01T00:00:00Z
    ...headers...
    <blank line>
    <extracted text ...>

Instead of a custom InputFormat or a Python parser, we let the line reader
split records for us: ``spark.read.text`` with ``lineSep='WARC/1.0'``
yields one row per record (splittable at block boundaries like any text
read), and the header fields come out with native ``regexp_extract`` —
whole-stage codegen, no Python. The reference has no sources at all
(SURVEY.md §2.1); this is the ingest seam the north rule's Iceberg tables
are loaded from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import WS_CHARS


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET file(s) -> (url, warc_ts timestamp, text, lang) frame.

    Records without a Target-URI (e.g. the warcinfo prologue) are dropped.
    The record body is everything after the first blank line.
    """
    raw = spark.read.text(path, lineSep="WARC/1.0")
    v = F.col("value")
    url = F.regexp_extract(v, r"WARC-Target-URI:\s*(\S+)", 1)
    # try_to_timestamp: under Spark 4 ANSI mode a plain to_timestamp would
    # crash the whole ingest on one malformed/missing WARC-Date; fractional
    # seconds handled by the second format
    date_str = F.regexp_extract(v, r"WARC-Date:\s*(\S+)", 1)
    ts = F.coalesce(
        F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
    )
    lang = F.regexp_extract(v, r"WARC-Identified-Content-Language:\s*(\w+)", 1)
    # body = after the first blank line (\r\n\r\n or \n\n)
    body = F.regexp_replace(v, r"(?s)^.*?\r?\n\r?\n", "")
    return (
        raw.select(
            url.alias("url"),
            ts.alias("warc_ts"),
            # btrim, not trim: trim only strips 0x20, WET bodies end \r\n\r\n
            F.nullif(F.btrim(body, F.lit(WS_CHARS)), F.lit("")).alias("text"),
            F.nullif(lang, F.lit("")).alias("lang"),
        )
        .filter(F.col("url") != "")
    )


def write_wet_fixture(path: str, pages: list[dict]) -> None:
    """Test helper: serialize page dicts into a WET file."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nfixture\r\n\r\n")
        for p in pages:
            ts = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            f.write(
                "WARC/1.0\r\n"
                f"WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {p['url']}\r\n"
                f"WARC-Date: {ts}\r\n"
                f"Content-Length: {len(p.get('text') or '')}\r\n"
                "\r\n"
                f"{p.get('text') or ''}\r\n\r\n"
            )
