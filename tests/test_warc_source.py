"""WARC source reader: serialize fixture pages with full HTTP framing,
verify text mode (native regex, codegen) and binary mode (Content-Length
record walk in mapInPandas) agree on UTF-8 payloads, binary mode stays
byte-exact on non-UTF-8 and on payloads containing the WARC magic, and the
html payload feeds jusText -> run_pipeline end-to-end."""

from __future__ import annotations

import gzip
from datetime import datetime

from dataqualitykit_spark.fixtures import generate_pages
from dataqualitykit_spark.operators.justext import justext_extract
from dataqualitykit_spark.pipeline import run_pipeline
from dataqualitykit_spark.sources.warc import (
    _parse_warc_bytes,
    read_warc,
    write_warc_fixture,
)
from pyspark.sql import functions as F


def _html_pages(n):
    return [p for p in generate_pages(n) if p["html"] is not None]


def test_text_mode_round_trip(spark, tmp_path):
    pages = _html_pages(300)
    path = str(tmp_path / "fixture.warc")
    write_warc_fixture(path, pages)

    df = read_warc(spark, path)
    rows = {(r["url"], r["warc_ts"]): r for r in df.collect()}
    assert len(rows) == len({(p["url"], p["warc_ts"]) for p in pages})

    sample = pages[0]
    got = rows[(sample["url"], sample["warc_ts"])]
    assert bytes(got["html"]) == sample["html"]  # valid UTF-8 -> byte-exact
    assert got["http_status"] == 200
    assert got["content_type"] == "text/html"


def test_binary_mode_parity_with_text_mode(spark, tmp_path):
    pages = _html_pages(120)
    path = str(tmp_path / "fixture.warc")
    write_warc_fixture(path, pages)

    def key(df):
        return {
            (r["url"], r["warc_ts"], r["http_status"], r["content_type"],
             bytes(r["html"]))
            for r in df.collect()
        }

    assert key(read_warc(spark, path)) == key(
        read_warc(spark, path, mode="binary")
    )


def test_binary_mode_byte_exact_non_utf8(spark, tmp_path):
    latin1 = b"<html>caf\xe9 \xff raw latin-1</html>"
    pages = [
        {
            "url": "https://legacy.example/l1",
            "warc_ts": datetime(2024, 1, 2, 3, 4, 5),
            "html": latin1,
            "content_type": "text/html; charset=ISO-8859-1",
        }
    ]
    path = str(tmp_path / "latin1.warc")
    write_warc_fixture(path, pages)

    [row] = read_warc(spark, path, mode="binary").collect()
    assert bytes(row["html"]) == latin1
    assert row["content_type"] == "text/html"
    # text mode DECODES as UTF-8: invalid bytes become U+FFFD, not lost rows
    [trow] = read_warc(spark, path).collect()
    assert bytes(trow["html"]) != latin1
    assert "caf" in bytes(trow["html"]).decode("utf-8")


def test_content_length_walk_survives_embedded_magic():
    """A payload containing the literal b'WARC/1.0' must not tear the
    record: the parser walks Content-Length framing, not the magic."""
    evil = b"<html>quoting a header: WARC/1.0\r\nWARC-Type: response</html>"
    import io

    buf = io.BytesIO()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(evil)).encode() + b"\r\n\r\n" + evil
    )
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.example/a\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    tail_html = b"<html>second page</html>"
    http2 = b"HTTP/1.1 404 Not Found\r\n\r\n" + tail_html
    head2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.example/b\r\n"
        b"Content-Length: " + str(len(http2)).encode() + b"\r\n\r\n"
    )
    buf.write(head + http + b"\r\n\r\n" + head2 + http2 + b"\r\n\r\n")

    recs = list(_parse_warc_bytes(buf.getvalue()))
    assert [r[0] for r in recs] == [
        "https://evil.example/a",
        "https://evil.example/b",
    ]
    assert recs[0][4] == evil
    assert recs[0][2] == 200 and recs[0][3] == "text/html"
    assert recs[1][4] == tail_html and recs[1][2] == 404


def test_non_response_records_dropped(spark, tmp_path):
    pages = _html_pages(20)
    path = str(tmp_path / "mixed.warc")
    write_warc_fixture(path, pages)  # writes a warcinfo prologue
    with open(path, "ab") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"WARC-Target-URI: https://req.example/x\r\n\r\n"
            b"GET /x HTTP/1.1\r\nHost: req.example\r\n\r\n\r\n\r\n"
        )
    for mode in ("text", "binary"):
        got = read_warc(spark, path, mode=mode)
        assert got.count() == len(pages)
        assert got.filter(F.col("url").contains("req.example")).count() == 0


def test_body_content_type_not_misparsed(spark, tmp_path):
    """A 'Content-Type:' line inside the html body must not be picked up
    when the HTTP headers carry none."""
    html = b"<html><pre>\r\nContent-Type: application/evil\r\n</pre></html>"
    path = str(tmp_path / "nc.warc")
    write_warc_fixture(
        path,
        [
            {
                "url": "https://nc.example/a",
                "warc_ts": datetime(2024, 3, 1),
                "html": html,
                "content_type": None,
            }
        ],
    )
    for mode in ("text", "binary"):
        [row] = read_warc(spark, path, mode=mode).collect()
        assert row["content_type"] is None, mode
        assert bytes(row["html"]) == html


def test_gzip_text_mode(spark, tmp_path):
    pages = _html_pages(50)
    plain = tmp_path / "f.warc"
    write_warc_fixture(str(plain), pages)
    gz = tmp_path / "f.warc.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))

    df = read_warc(spark, str(gz))
    assert df.count() == len(pages)


def test_pipeline_over_warc(spark, tmp_path):
    """Ingest seam end-to-end: WARC -> jusText main-content extraction ->
    quality pipeline. The north rule's html:binary column is the input."""
    pages = _html_pages(150)
    path = str(tmp_path / "p.warc")
    write_warc_fixture(path, pages)

    df = read_warc(spark, path).withColumn(
        "html_str", F.col("html").cast("string")
    )
    extracted = justext_extract(df, html_col="html_str")
    labeled = run_pipeline(
        extracted.select(
            "url",
            "warc_ts",
            "html",
            F.col("justext_text").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    counts = {
        r["keep"]: r["count"]
        for r in labeled.groupBy("keep").count().collect()
    }
    assert counts.get(True, 0) + counts.get(False, 0) == df.count()
    assert counts.get(True, 0) > 0
