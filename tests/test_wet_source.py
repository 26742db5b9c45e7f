"""WET source reader: serialize fixture pages to a WET file, read it back
with the native-regex reader, and verify url/ts/text survive, then run the
full pipeline over the WET-read frame."""

from __future__ import annotations

from dataqualitykit_spark.fixtures import generate_pages
from dataqualitykit_spark.pipeline import run_pipeline
from dataqualitykit_spark.sources.wet import read_wet, write_wet_fixture


def test_wet_round_trip(spark, tmp_path):
    pages = [p for p in generate_pages(300) if p["text"] and "\n" not in p["text"]]
    # WET framing reserves blank lines; multi-line docs tested separately
    path = str(tmp_path / "fixture.wet")
    write_wet_fixture(path, pages)

    df = read_wet(spark, path)
    rows = {r["url"]: r for r in df.collect()}
    # urls may repeat (snapshots) — compare per (url, ts)
    by_key = {(r["url"], r["warc_ts"]) for r in df.collect()}
    assert len(by_key) == len({(p["url"], p["warc_ts"]) for p in pages})

    sample = pages[0]
    got = rows[sample["url"]]
    assert got["text"] == sample["text"].strip() or got["text"] == sample["text"]
    assert got["warc_ts"] is not None


def test_pipeline_over_wet(spark, tmp_path):
    pages = [p for p in generate_pages(200) if p["text"] and "\n" not in p["text"]]
    path = str(tmp_path / "p.wet")
    write_wet_fixture(path, pages)
    labeled = run_pipeline(read_wet(spark, path))
    counts = {r["keep"]: r["count"] for r in labeled.groupBy("keep").count().collect()}
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
