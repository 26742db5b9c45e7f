"""Common-Crawl WARC (response-record) reader, Spark-first.

A WARC file is a concatenation of records; the crawl's `response`
records wrap the raw HTTP exchange:

    WARC/1.0
    WARC-Type: response
    WARC-Target-URI: https://...
    WARC-Date: 2024-01-01T00:00:00Z
    ...warc headers...
    <blank line>
    HTTP/1.1 200 OK
    Content-Type: text/html; charset=UTF-8
    ...http headers...
    <blank line>
    <html payload>

This is the seam that loads the input_hint's
(url, warc_ts, html:binary, ...) Iceberg table. Two read modes, both
emitting (url, warc_ts, http_status, content_type, html binary):

- ``mode='text'`` (default): the WET trick — ``spark.read.text`` with
  ``lineSep='WARC/1.0'`` splits records at block boundaries, header
  fields come out with native regexp_extract, whole-stage codegen, no
  Python. The text reader DECODES as UTF-8 (invalid bytes become
  U+FFFD), so the html column — re-encoded to binary for schema parity
  — is byte-exact only for valid-UTF-8 payloads. The fast path for the
  overwhelmingly-UTF-8 modern crawl.
- ``mode='binary'``: ``binaryFile`` + one mapInPandas pass splitting on
  b'WARC/1.0' — BYTE-EXACT html for any encoding. Parallelism is
  per-file (a CC crawl ships ~90k x ~1 GB shards, so the file axis is
  the real-world parallelism; one shard never needs to split).

Compression: Spark's codec layer decompresses whole-stream gzip
transparently in text mode (Common Crawl's per-record gzip members
concatenate into a valid gzip stream), at the cost of splittability —
which per-file parallelism already forgoes. binary mode expects
uncompressed input (decompress upstream or extend the batch fn).

Reference parity: the reference has no sources at all (SURVEY.md §2.1);
this extends sources/wet.py (same record framing, plus the HTTP layer).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HTTP_STATUS_RE = r"\r?\n\r?\nHTTP/[0-9.]+\s+(\d{3})"
# anchored to the contiguous HTTP header block (header lines only, no blank
# line crossed) so a 'Content-Type:' inside the html body can never match;
# the WARC-level Content-Type sits BEFORE the blank line and is excluded too
_HTTP_CTYPE_RE = (
    r"(?i)\r?\n\r?\nHTTP/[^\n]*\n(?:[^\r\n]+\r?\n)*?Content-Type:\s*([^\r\n;]+)"
)


def read_warc(
    spark: SparkSession, path: str, mode: str = "text"
) -> DataFrame:
    """WARC file(s) -> (url, warc_ts timestamp, http_status int,
    content_type string, html binary). Only ``WARC-Type: response``
    records survive (warcinfo/request/metadata dropped)."""
    if mode == "binary":
        return _read_warc_binary(spark, path)
    if mode != "text":
        raise ValueError(f"unknown mode {mode!r}")
    raw = spark.read.text(path, lineSep="WARC/1.0")
    v = F.col("value")
    url = F.regexp_extract(v, r"WARC-Target-URI:\s*(\S+)", 1)
    wtype = F.regexp_extract(v, r"WARC-Type:\s*(\w+)", 1)
    date_str = F.regexp_extract(v, r"WARC-Date:\s*(\S+)", 1)
    ts = F.coalesce(
        F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
    )
    # regexp_extract only yields '' or \d{3}, so nullif+cast is total
    status = F.nullif(
        F.regexp_extract(v, _HTTP_STATUS_RE, 1), F.lit("")
    ).cast("int")
    ctype = F.nullif(
        F.btrim(F.regexp_extract(v, _HTTP_CTYPE_RE, 1)), F.lit("")
    )
    # payload = after the SECOND blank line (warc headers | http headers |
    # body); non-greedy across both header blocks
    body = F.regexp_replace(v, r"(?s)^.*?\r?\n\r?\n.*?\r?\n\r?\n", "")
    # WARC frames records with exactly two CRLFs before the next header;
    # strip that ONE frame only (further trailing newlines belong to the
    # payload)
    body = F.regexp_replace(body, r"\r?\n\r?\n$", "")
    return (
        raw.select(
            url.alias("url"),
            ts.alias("warc_ts"),
            status.alias("http_status"),
            F.lower(ctype).alias("content_type"),
            F.encode(body, "UTF-8").alias("html"),
        )
        .filter((F.col("url") != "") & (wtype == "response"))
    )


_B_URL_RE = re.compile(rb"WARC-Target-URI:\s*(\S+)")
_B_TYPE_RE = re.compile(rb"WARC-Type:\s*(\w+)")
_B_DATE_RE = re.compile(rb"WARC-Date:\s*(\S+)")
_B_STATUS_RE = re.compile(rb"^HTTP/[0-9.]+\s+(\d{3})")
_B_CTYPE_RE = re.compile(rb"\r?\nContent-Type:\s*([^\r\n;]+)", re.I)
_B_BLANK_RE = re.compile(rb"\r?\n\r?\n")


_B_CLEN_RE = re.compile(rb"Content-Length:\s*(\d+)")


def _parse_warc_bytes(blob: bytes):
    """Yield (url, warc_ts_str, http_status, content_type, html bytes)
    per response record. Shared by the binary batch fn and tests.

    Records are walked via the WARC ``Content-Length`` header (the spec's
    framing), so a payload that itself contains the magic ``WARC/1.0``
    bytes survives byte-exact — the naive magic-split (still the fallback
    for a record missing Content-Length) would tear it.
    """
    pos = 0
    while True:
        start = blob.find(b"WARC/1.0", pos)
        if start < 0:
            return
        hdr_end = _B_BLANK_RE.search(blob, start)
        if hdr_end is None:
            return
        head = blob[start : hdr_end.start()]
        mlen = _B_CLEN_RE.search(head)
        if mlen is not None:
            body_end = hdr_end.end() + int(mlen.group(1))
            http = blob[hdr_end.end() : body_end]
            pos = body_end
        else:
            nxt = blob.find(b"WARC/1.0", hdr_end.end())
            http = blob[hdr_end.end() : nxt if nxt >= 0 else len(blob)]
            pos = nxt if nxt >= 0 else len(blob)
            # strip the one two-CRLF record frame (exact mirror of the
            # text mode's \r?\n\r?\n$) — only needed on the magic-split
            # fallback; Content-Length framing is exact
            for frame in (b"\r\n\r\n", b"\r\n\n", b"\n\r\n", b"\n\n"):
                if http.endswith(frame):
                    http = http[: -len(frame)]
                    break
        m = _B_TYPE_RE.search(head)
        if m is None or m.group(1) != b"response":
            continue
        mu = _B_URL_RE.search(head)
        if mu is None:
            continue
        second = _B_BLANK_RE.search(http)
        ms = _B_STATUS_RE.match(http)
        mc = _B_CTYPE_RE.search(http[: second.start()] if second else http)
        body = http[second.end():] if second else b""
        md = _B_DATE_RE.search(head)
        yield (
            mu.group(1).decode("ascii", "replace"),
            md.group(1).decode("ascii", "replace") if md else None,
            int(ms.group(1)) if ms else None,
            mc.group(1).strip().lower().decode("ascii", "replace") if mc else None,
            body,
        )


def _read_warc_binary(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def batches(it):
        for pdf in it:
            rows = [
                rec
                for blob in pdf["content"]
                for rec in _parse_warc_bytes(bytes(blob))
            ]
            yield pd.DataFrame(
                rows,
                columns=["url", "_ts", "http_status", "content_type", "html"],
            )

    parsed = files.mapInPandas(
        batches,
        "url string, _ts string, http_status int, content_type string, "
        "html binary",
    )
    ts = F.coalesce(
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")),
    )
    return parsed.select(
        "url",
        ts.alias("warc_ts"),
        "http_status",
        "content_type",
        "html",
    )


def write_warc_fixture(path: str, pages: list[dict]) -> None:
    """Test helper: serialize page dicts (url, warc_ts, html bytes,
    status, content_type) into a WARC file with full HTTP framing."""
    with open(path, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nfixture\r\n\r\n")
        for p in pages:
            html: bytes = p["html"]
            ts = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            status = p.get("status", 200)
            ctype = p.get("content_type", "text/html; charset=UTF-8")
            ctype_line = f"Content-Type: {ctype}\r\n" if ctype else ""
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"{ctype_line}"
                f"Content-Length: {len(html)}\r\n\r\n"
            ).encode("ascii")
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {p['url']}\r\n"
                f"WARC-Date: {ts}\r\n"
                f"Content-Length: {len(http) + len(html)}\r\n\r\n"
            ).encode("ascii")
            f.write(head + http + html + b"\r\n\r\n")
