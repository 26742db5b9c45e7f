"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief op family: the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested; the actual media decode
is stubbed behind a deterministic fake because no image/audio libs exist
in this container (swap `_fake_decode` for PIL/ffmpeg on a cluster).

Pattern: mapInPandas over an iterator of record batches — the right shape
for heavy per-row payloads because one output row can be larger/smaller
than its input row and batches stream through bounded memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat_dim int, features array<float>, "
    "sha256 string"
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: sha256-seeded
    unit-less floats. Replace with PIL/torchvision/ffmpeg on a cluster."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    return [((h[i] / 255.0) * 2.0 - 1.0) for i in range(dim)]


# ---------------------------------------------------------------------------
# REAL (dependency-free) image header parsing — PNG / JPEG / GIF dimensions
# straight from the container bytes. Pixel DECODE still needs PIL/ffmpeg
# (absent here); header metadata does not.
# ---------------------------------------------------------------------------


def parse_image_header(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from magic bytes; (None, None, None) when
    unrecognized. Pure python over the byte prefix — no decoder library.

    PNG: IHDR is always the first chunk — width/height at offsets 16/20.
    GIF87a/89a: logical screen size at offsets 6/8, little-endian.
    JPEG: walk the marker segments to the first SOF0-SOF15 frame header
    (skipping non-frame markers), height/width big-endian at +5/+7."""
    if not payload or len(payload) < 10:
        return None, None, None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return "png", w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return "gif", w, h
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def image_metadata(df: DataFrame) -> DataFrame:
    """binary media rows -> parsed (format, width, height) metadata via
    mapInPandas — a REAL decode-free extraction (magic-byte header parse),
    not a stub: the typical first stage of a multimodal ingest that
    validates payloads and routes undecodable rows to quarantine."""
    schema = (
        "media_id bigint, kind string, mime string, detected_format string, "
        "parsed_width int, parsed_height int, parse_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "detected_format": [p[0] for p in parsed],
                    "parsed_width": [p[1] for p in parsed],
                    "parsed_height": [p[2] for p in parsed],
                    "parse_ok": [p[0] is not None for p in parsed],
                }
            )

    return df.mapInPandas(batches, schema=schema)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """binary media rows -> fixed-dim feature vectors via mapInPandas.

    Input must follow MEDIA_SCHEMA; output follows FEATURE_SCHEMA."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda p: _fake_decode(p, dim))
            sha = pdf["payload"].map(
                lambda p: hashlib.sha256(p or b"").hexdigest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": feats,
                    "sha256": sha,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: plumbing is real (binary in -> binary out,
    metadata updated); pixel work raises until a decoder exists."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not present in this "
            "container; wire the real resize here on a cluster"
        )

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one input row -> N frame rows. The fan-out
    shape (mapInPandas, output rows > input rows) is the point; frame
    extraction itself is stubbed pending ffmpeg."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                n = max(1, int((r["duration_ms"] or 0) / every_ms))
                for k in range(n):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": "frame",
                            "payload": (r["payload"] or b"")[:64],  # stub bytes
                            "mime": "image/x-stub",
                            "width": r["width"],
                            "height": r["height"],
                            "duration_ms": k * every_ms,
                        }
                    )
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms",
            ])

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)


def media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic binary media table for tests."""
    rows = [
        (
            i,
            ("image", "audio", "video")[i % 3],
            hashlib.md5(f"media{i}".encode()).digest() * 4,
            ("image/png", "audio/wav", "video/mp4")[i % 3],
            64 + i % 128,
            48 + i % 96,
            (i % 3 == 2) * (1000 + 500 * (i % 7)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
