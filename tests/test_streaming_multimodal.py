"""Streaming quality filter (rate->memory sink round trip) and multimodal
mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import multimodal


def test_streaming_quality_filter(spark, tmp_path):
    from dataqualitykit_spark.fixtures import generate_pages
    from dataqualitykit_spark.fixtures.pages import PAGES_SCHEMA
    from dataqualitykit_spark.streaming import streaming_quality_filter

    # write fixture pages as a file source, stream them through the filter
    src = str(tmp_path / "src")
    spark.createDataFrame(generate_pages(200), PAGES_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    labeled = streaming_quality_filter(stream)
    assert labeled.isStreaming

    q = (
        labeled.select("url", "keep", "drop_reason")
        .writeStream.format("memory")
        .queryName("labeled_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from labeled_stream")
    assert out.count() > 200 * 0.9
    reasons = {r["drop_reason"] for r in out.select("drop_reason").distinct().collect()}
    assert None in reasons and "missing_text" in reasons


def test_multimodal_features(spark):
    media = multimodal.media_fixture(spark, 48)
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(r["feat_dim"] == 8 for r in rows)
    # deterministic: same payload -> same features
    again = {r["media_id"]: r["features"] for r in multimodal.extract_features(media, dim=8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_multimodal_frame_sampling(spark):
    media = multimodal.media_fixture(spark, 30).filter(F.col("kind") == "video")
    n_videos = media.count()
    frames = multimodal.sample_frames(media, every_ms=500)
    assert frames.count() >= n_videos  # fan-out >= 1 frame per video
    assert frames.filter(F.col("kind") != "frame").count() == 0


def test_multimodal_resize_quarantines_undecodable(spark):
    # round 6: resize is REAL for PNG (see test_multimodal_pixels.py);
    # the media_fixture payloads are header-only/garbage — all must take
    # the quarantine-in-place route, byte-identical, resized=false
    media = multimodal.media_fixture(spark, 6)
    out = multimodal.resize_images(media, 32, 32).collect()
    assert len(out) == 6
    assert all(not r["resized"] for r in out)
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(bytes(r["payload"]) == orig[r["media_id"]] for r in out)


def test_parse_image_headers(spark):
    from dataqualitykit_spark.operators.multimodal import (
        image_metadata,
        parse_image_header,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x06" + b"\x00" * 20
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 16
    # JPEG: SOI, APP0 (len 16), SOF0 (len 17) with h=99 w=77
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (15).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 8
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (99).to_bytes(2, "big") + (77).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )
    assert parse_image_header(png) == ("png", 640, 480)
    assert parse_image_header(gif) == ("gif", 320, 200)
    assert parse_image_header(jpeg) == ("jpeg", 77, 99)
    assert parse_image_header(b"garbage bytes here") == (None, None, None)
    assert parse_image_header(None) == (None, None, None)

    df = spark.createDataFrame(
        [
            (1, "image", png, "image/png", 0, 0, 0),
            (2, "image", gif, "image/gif", 0, 0, 0),
            (3, "image", jpeg, "image/jpeg", 0, 0, 0),
            (4, "image", b"junkjunkjunkjunk", "image/png", 0, 0, 0),
        ],
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = {r["media_id"]: r for r in image_metadata(df).collect()}
    assert (out[1]["detected_format"], out[1]["parsed_width"], out[1]["parsed_height"]) == ("png", 640, 480)
    assert (out[2]["detected_format"], out[2]["parsed_width"]) == ("gif", 320)
    assert (out[3]["detected_format"], out[3]["parsed_height"]) == ("jpeg", 99)
    assert out[4]["parse_ok"] is False


def _wav_bytes(channels=2, rate=44100, bits=16, n_samples=44100, junk_first=True):
    byte_rate = rate * channels * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data_size = n_samples * channels * bits // 8
    data = b"data" + data_size.to_bytes(4, "little") + b"\x00" * min(data_size, 64)
    junk = b"JUNK" + (3).to_bytes(4, "little") + b"xyz" + b"\x00"  # odd size -> pad
    body = (junk if junk_first else b"") + fmt + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _mp4_bytes(timescale=1000, duration=7500, version=0):
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big")
    if version == 0:
        mvhd_body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big") + b"\x00" * 80
    else:
        mvhd_body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big") + b"\x00" * 80
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    # a free box before moov exercises the top-level walk
    free = (12).to_bytes(4, "big") + b"free" + b"\x00" * 4
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + free + moov


def test_parse_audio_video_headers(spark):
    from dataqualitykit_spark.operators.multimodal import (
        media_metadata,
        parse_mp4_header,
        parse_wav_header,
    )

    wav = _wav_bytes()
    # 44100 samples at 44100 Hz = exactly 1000 ms regardless of channels
    assert parse_wav_header(wav) == ("wav", 2, 44100, 1000)
    assert parse_wav_header(_wav_bytes(channels=1, rate=8000, n_samples=4000)) == (
        "wav", 1, 8000, 500,
    )
    assert parse_wav_header(b"RIFFxxxxAVI LIST") == (None, None, None, None)
    assert parse_wav_header(None) == (None, None, None, None)

    mp4_v0 = _mp4_bytes()
    assert parse_mp4_header(mp4_v0) == ("mp4", "isom", 7500)
    mp4_v1 = _mp4_bytes(timescale=90000, duration=90000 * 3, version=1)
    assert parse_mp4_header(mp4_v1) == ("mp4", "isom", 3000)
    assert parse_mp4_header(b"\x00\x00\x00\x08junk....") == (None, None, None)

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x06" + b"\x00" * 20
    )
    df = spark.createDataFrame(
        [
            (1, "image", png, "image/png", 0, 0, 0),
            (2, "audio", wav, "audio/wav", 0, 0, 0),
            (3, "video", mp4_v0, "video/mp4", 0, 0, 0),
            (4, "audio", b"not a container at all", "audio/wav", 0, 0, 0),
        ],
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert (out[1]["detected_format"], out[1]["parsed_width"]) == ("png", 640)
    assert (out[2]["detected_format"], out[2]["channels"], out[2]["sample_rate_hz"],
            out[2]["parsed_duration_ms"]) == ("wav", 2, 44100, 1000)
    assert (out[3]["detected_format"], out[3]["parsed_duration_ms"]) == ("mp4", 7500)
    assert out[4]["parse_ok"] is False and out[4]["detected_format"] is None


def test_streaming_c4_and_repetition_columns(spark, tmp_path):
    """The round-4 cleaning ops are stateless projections, so they
    compose with Structured Streaming for free: c4_line_filter labels a
    file stream, and the repetition-fraction Columns project on it."""
    from dataqualitykit_spark.operators.c4_filter import c4_line_filter
    from dataqualitykit_spark.operators.repetition import (
        dup_5gram_frac_col,
        dup_line_char_frac_col,
    )

    src = str(tmp_path / "c4src")
    spark.createDataFrame(
        [
            (1, "One good sentence here today.\nTwo good sentences here today.\nThree good sentences here today."),
            (2, "Lorem ipsum dolor sit amet.\nSecond proper sentence here now.\nThird proper sentence here now."),
            (3, "repeat me now\nrepeat me now\nrepeat me now"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    cleaned = F.col("cleaned_text")
    out = (
        c4_line_filter(stream)
        .withColumn("dlcf", dup_line_char_frac_col(cleaned))
        .withColumn("d5g", dup_5gram_frac_col(cleaned))
    )
    assert out.isStreaming
    q = (
        out.select("id", "keep", "drop_reason", "dlcf")
        .writeStream.format("memory")
        .queryName("c4_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in spark.sql("select * from c4_stream").collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["drop_reason"] == "policy_phrase"
    assert rows[3]["keep"] is False  # no terminal punctuation anywhere


def test_streaming_quality_filter_blocklist(spark, tmp_path):
    """cfg.blocklist in the STREAMING filter: blocked rows labeled
    'blocked_domain' first, never scored (metric columns NULL) — the
    batch pipeline's exact semantics over readStream."""
    from dataqualitykit_spark.config import PipelineConfig
    from dataqualitykit_spark.fixtures import generate_pages
    from dataqualitykit_spark.fixtures.pages import PAGES_SCHEMA
    from dataqualitykit_spark.streaming import streaming_quality_filter

    src = str(tmp_path / "src_bl")
    spark.createDataFrame(generate_pages(200), PAGES_SCHEMA).write.parquet(src)

    cfg = PipelineConfig(blocklist=("hot-domain.example",))
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    labeled = streaming_quality_filter(stream, cfg)
    assert labeled.isStreaming

    q = (
        labeled.select("url", "keep", "drop_reason", "ppl", "scrubbed_text")
        .writeStream.format("memory")
        .queryName("labeled_bl_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from labeled_bl_stream")
    blocked = out.filter(F.col("drop_reason") == "blocked_domain")
    n = blocked.count()
    assert n > 0
    assert blocked.filter(F.col("url").contains("hot-domain")).count() == n
    # blocked rows never reach the scorer
    assert blocked.filter(F.col("ppl").isNotNull()).count() == 0
    assert blocked.filter(F.col("scrubbed_text").isNotNull()).count() == 0
    # non-blocked rows still flow through the quality stages
    assert out.filter(F.col("keep")).count() > 0


def test_streaming_quality_filter_url_keyword_gate(spark, tmp_path):
    """cfg.url_keyword_weights in the STREAMING filter: flagged urls take
    drop_reason='url_keywords' first and are never scored; when the
    blocklist is ALSO on, a url matching both takes 'blocked_domain'
    (the batch decide order)."""
    from dataqualitykit_spark.config import PipelineConfig
    from dataqualitykit_spark.fixtures import generate_pages
    from dataqualitykit_spark.fixtures.pages import PAGES_SCHEMA
    from dataqualitykit_spark.streaming import streaming_quality_filter

    rows = generate_pages(150)
    for i, r in enumerate(rows):
        if i % 11 == 0:
            r["url"] = r["url"].replace("/page", "/casino/page", 1)
    src = str(tmp_path / "src_kw")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(src)

    cfg = PipelineConfig(
        url_keyword_weights=(("casino", 1.0),),
        blocklist=("hot-domain.example",),
    )
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    labeled = streaming_quality_filter(stream, cfg)
    q = (
        labeled.select("url", "drop_reason", "ppl")
        .writeStream.format("memory")
        .queryName("labeled_kw_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from labeled_kw_stream")
    kw = out.filter(F.col("drop_reason") == "url_keywords")
    n = kw.count()
    assert n > 0
    assert kw.filter(~F.col("url").contains("casino")).count() == 0
    # url-gated rows never reach the scorer
    assert kw.filter(F.col("ppl").isNotNull()).count() == 0
    # a url matching BOTH gates takes blocked_domain (batch decide order)
    both = out.filter(
        F.col("url").contains("hot-domain") & F.col("url").contains("casino")
    )
    if both.count():
        assert (
            both.filter(F.col("drop_reason") != "blocked_domain").count() == 0
        )


def test_streaming_quality_filter_entropy_gate(spark, tmp_path):
    """cfg.min_token_entropy composes over readStream for free: the
    fused scorer's extras field flows through with_metrics/decide_quality
    unchanged, and a planted one-sentence-looped spam doc drops with
    drop_reason='low_entropy'."""
    from datetime import datetime

    from dataqualitykit_spark.config import PipelineConfig
    from dataqualitykit_spark.fixtures import generate_pages
    from dataqualitykit_spark.fixtures.pages import PAGES_SCHEMA
    from dataqualitykit_spark.streaming import streaming_quality_filter

    rows = generate_pages(120) + [
        {
            "url": "https://ent-stream.example/p",
            "warc_ts": datetime(2024, 6, 1),
            "html": None,
            "text": "the cat sat on the mat " * 30 + "unique stream closer",
            "lang": "en",
        }
    ]
    src = str(tmp_path / "src_ent")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(src)

    cfg = PipelineConfig(min_token_entropy=2.2)
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    labeled = streaming_quality_filter(stream, cfg)
    assert labeled.isStreaming

    q = (
        labeled.select("url", "keep", "drop_reason", "token_entropy")
        .writeStream.format("memory")
        .queryName("labeled_ent_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from labeled_ent_stream")
    spam = out.filter(F.col("url") == "https://ent-stream.example/p").collect()
    assert len(spam) == 1 and spam[0]["drop_reason"] == "low_entropy"
    assert spam[0]["token_entropy"] < 2.2
    assert out.filter(F.col("keep")).count() > 0
