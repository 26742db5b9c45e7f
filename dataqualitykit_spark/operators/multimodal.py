"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief op family. What is REAL here (no media library involved):
container header parsing (PNG/JPEG/GIF/WAV/MP4 byte walks), PNG pixel
decode/encode via the stdlib-zlib codec (operators/png_codec.py) feeding
resize_images and the dHash perceptual near-dup, and PCM WAV sample
decode feeding audio_features. What is still a deterministic stand-in:
JPEG/GIF pixel decode and video frame extraction (`_fake_decode`,
sample_frames' stub bytes) — swap in PIL/ffmpeg on a cluster; undecodable
payloads always take the quarantine route, never a crash.

Pattern: mapInPandas over an iterator of record batches — the right shape
for heavy per-row payloads because one output row can be larger/smaller
than its input row and batches stream through bounded memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def parse_wav_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None]:
    """(format, channels, sample_rate_hz, duration_ms) from a RIFF/WAVE
    container; (None,)*4 when unrecognized. Walks the chunk list (fmt
    may follow LIST/JUNK chunks), duration = data bytes / byte rate."""
    if not payload or len(payload) < 12:
        return None, None, None, None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None, None, None, None
    i, n = 12, len(payload)
    channels = rate = byte_rate = data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    dur = (
        int(data_size * 1000 / byte_rate)
        if data_size is not None and byte_rate
        else None
    )
    return "wav", channels, rate, dur


def parse_mp4_header(
    payload: bytes | None,
) -> tuple[str | None, str | None, int | None]:
    """(format, major_brand, duration_ms) from an ISO-BMFF (MP4) box
    tree; (None, None, None) when unrecognized. Walks top-level boxes to
    ftyp (brand) and moov/mvhd (timescale + duration) — pure byte math,
    no ffmpeg. Handles 64-bit largesize boxes and mvhd versions 0/1."""
    if not payload or len(payload) < 12:
        return None, None, None

    def walk(buf: bytes, want: bytes):
        i, n = 0, len(buf)
        while i + 8 <= n:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1 and i + 16 <= n:  # 64-bit largesize
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:  # box extends to EOF
                size = n - i
            if size < hdr:
                return None
            if btype == want:
                return buf[i + hdr : i + size]
            i += size
        return None

    if payload[4:8] != b"ftyp":
        return None, None, None
    brand = payload[8:12].decode("ascii", "replace")
    dur_ms = None
    moov = walk(payload, b"moov")
    if moov is not None:
        mvhd = walk(moov, b"mvhd")
        if mvhd is not None and len(mvhd) >= 20:
            version = mvhd[0]
            if version == 1 and len(mvhd) >= 28:
                timescale = int.from_bytes(mvhd[20:24], "big")
                duration = int.from_bytes(mvhd[24:32], "big")
            else:
                timescale = int.from_bytes(mvhd[12:16], "big")
                duration = int.from_bytes(mvhd[16:20], "big")
            if timescale:
                dur_ms = int(duration * 1000 / timescale)
    return "mp4", brand, dur_ms


def media_metadata(df: DataFrame) -> DataFrame:
    """One typed-metadata pass over a mixed media table: image headers
    (PNG/JPEG/GIF), audio headers (RIFF/WAVE) and video headers
    (MP4 ftyp/mvhd) parsed from the container bytes in a single
    mapInPandas stage — rows whose payload matches NO container are
    parse_ok=false (the quarantine route). Pixel/sample DECODE still
    needs PIL/ffmpeg; container metadata does not."""
    schema = (
        "media_id bigint, kind string, mime string, detected_format string, "
        "parsed_width int, parsed_height int, channels int, "
        "sample_rate_hz int, parsed_duration_ms int, parse_ok boolean"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "mime": pdf["mime"],
                "detected_format": [],
                "parsed_width": [],
                "parsed_height": [],
                "channels": [],
                "sample_rate_hz": [],
                "parsed_duration_ms": [],
                "parse_ok": [],
            }
            for p in pdf["payload"]:
                fmt, w, h = parse_image_header(p)
                ch = rate = dur = None
                if fmt is None:
                    fmt, ch, rate, dur = parse_wav_header(p)
                if fmt is None:
                    fmt, _brand, dur = parse_mp4_header(p)
                out["detected_format"].append(fmt)
                out["parsed_width"].append(w)
                out["parsed_height"].append(h)
                out["channels"].append(ch)
                out["sample_rate_hz"].append(rate)
                out["parsed_duration_ms"].append(dur)
                out["parse_ok"].append(fmt is not None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=schema)


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


RESIZED_SCHEMA = MEDIA_SCHEMA + ", resized boolean"


def decode_image_pixels(payload: bytes | None):
    """Decoded pixel array for payloads the dependency-free codecs
    handle — PNG (operators/png_codec.py: stdlib zlib + unfiltering),
    GIF (operators/gif_codec.py: pure-python LZW, first frame) and
    baseline JPEG (operators/jpeg_codec.py: huffman + IDCT in numpy) —
    else None (the quarantine signal, e.g. progressive JPEG)."""
    from . import gif_codec, jpeg_codec, png_codec

    if payload is None:
        return None
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return png_codec.decode_png(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return gif_codec.decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            return jpeg_codec.decode_jpeg(payload)
    except (png_codec.PngError, gif_codec.GifError, jpeg_codec.JpegError):
        return None
    return None


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for PNG and GIF payloads (no longer a stub):
    decode via the dependency-free codecs (stdlib-zlib PNG; pure-python
    LZW GIF), exact integer nearest-neighbor center-sampling to
    (width, height), re-encode as PNG; width/height/mime columns updated
    and `resized`=true. Payloads the codecs reject (JPEG/garbage/
    corrupt) pass through byte-identical with `resized`=false: the same
    quarantine-in-place route media_metadata uses, so a downstream filter
    on `resized` splits clean output from rows needing a richer decoder.

    Scale shape: one Arrow-batched mapInPandas stage, zero shuffle; the
    payload bytes stream through bounded batch memory and never hit the
    driver. Deterministic: integer resampling + fixed zlib level, so the
    output bytes are bit-identical across partitionings (driver-oracle
    property)."""
    from . import png_codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes, ws, hs, flags = [], [], [], [], []
            for p, mime, w0, h0 in zip(
                pdf["payload"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                arr = decode_image_pixels(p)
                if arr is None:
                    payloads.append(p)
                    mimes.append(mime)
                    ws.append(w0)
                    hs.append(h0)
                    flags.append(False)
                    continue
                out = png_codec.resize_nearest(arr, width, height)
                payloads.append(png_codec.encode_png(out))
                mimes.append("image/png")
                ws.append(width)
                hs.append(height)
                flags.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pdf["duration_ms"],
                    "resized": flags,
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video/animation frame sampling: one input row -> N frame rows
    (mapInPandas fan-out; output rows > input rows, batches stream
    through bounded memory). ANIMATED GIFs extract REAL frames (round 6:
    gif_codec.decode_gif_frames — LZW decode + canvas compositing) and so
    do MJPEG MP4s (round 6: mp4_codec.demux_mjpeg walks the stbl sample
    tables, jpeg_codec decodes each sample): at each sample instant
    t = 0, every_ms, 2*every_ms, ... the frame active at t is re-encoded
    as PNG with duration_ms = t. Other payloads (AVC/HEVC MP4 needs a
    real entropy codec) keep the stub fan-out derived from the metadata
    duration, marked mime='image/x-stub'."""
    from . import gif_codec, jpeg_codec, mp4_codec, png_codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                frames = None
                if p is not None and bytes(p[:6]) in (b"GIF87a", b"GIF89a"):
                    try:
                        frames = gif_codec.decode_gif_frames(bytes(p))
                    except gif_codec.GifError:
                        frames = None
                elif p is not None and bytes(p[4:8]) == b"ftyp":
                    try:
                        _, _, samples = mp4_codec.demux_mjpeg(bytes(p))
                        frames = [
                            (jpeg_codec.decode_jpeg(jb), t)
                            for jb, t in samples
                        ]
                    except (mp4_codec.Mp4Error, jpeg_codec.JpegError):
                        frames = None  # non-MJPEG mp4 -> stub route
                # truthiness (not `is not None`): a structurally valid but
                # EMPTY frame list must take the stub route, not crash on
                # frames[-1] (ADVICE r6)
                if frames:
                    total = frames[-1][1]  # last frame's start time
                    n = max(1, total // every_ms + 1)
                    for k in range(n):
                        t = k * every_ms
                        # frame active at t: last start time <= t
                        canvas = [c for c, ts in frames if ts <= t][-1]
                        rows.append(
                            {
                                "media_id": r["media_id"],
                                "kind": "frame",
                                "payload": png_codec.encode_png(canvas),
                                "mime": "image/png",
                                "width": canvas.shape[1],
                                "height": canvas.shape[0],
                                "duration_ms": t,
                            }
                        )
                    continue
                dur = r["duration_ms"]
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                n = max(1, dur // every_ms)
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


def _fixture_payload(i: int, kind: str, w: int, h: int, dur_ms: int) -> bytes:
    """Even rows: a VALID minimal container (PNG/WAV/MP4) so header parsing
    exercises the happy path; odd rows: deterministic garbage (the
    quarantine path)."""
    if i % 2:
        return hashlib.md5(f"media{i}".encode()).digest() * 4
    if kind == "image":  # PNG signature + IHDR with the row's dimensions
        return (
            b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06" + b"\x00" * 8
        )
    if kind == "audio":  # RIFF/WAVE, 1 channel, 8 kHz, 16-bit, dur_ms of data
        rate, channels, bits = 8000, 1, 16
        byte_rate = rate * channels * bits // 8
        data_size = byte_rate * max(dur_ms, 250) // 1000
        fmt = (
            b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
            + byte_rate.to_bytes(4, "little")
            + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        data = b"data" + data_size.to_bytes(4, "little") + b"\x00" * 16
        return b"RIFF" + (4 + len(fmt) + len(data)).to_bytes(4, "little") + b"WAVE" + fmt + data
    # video: ftyp(isom) + moov/mvhd v0 with the row's duration
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big")
    mvhd_body = (
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + (1000).to_bytes(4, "big") + max(dur_ms, 0).to_bytes(4, "big") + b"\x00" * 80
    )
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    return ftyp + (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd


def media_fixture(spark, n: int = 64) -> DataFrame:
    """Deterministic binary media table for tests: half real minimal
    containers (parse_ok=true), half garbage payloads (quarantine)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 64 + i % 128, 48 + i % 96
        dur = (i % 3 == 2) * (1000 + 500 * (i % 7))
        rows.append(
            (
                i,
                kind,
                _fixture_payload(i, kind, w, h, dur),
                ("image/png", "audio/wav", "video/mp4")[i % 3],
                w,
                h,
                dur,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


EXPECTED_SCHEMA = (
    MEDIA_SCHEMA + ", exp_format string, exp_width int, exp_height int, "
    "exp_channels int, exp_sample_rate_hz int, exp_duration_ms int, "
    "exp_parse_ok boolean"
)


def media_fixture_expected(spark, n: int = 64) -> DataFrame:
    """media_fixture plus the metadata the parsers MUST recover, derived
    from the generator's construction parameters (NOT by running the
    parsers — that would be circular): odd rows are garbage (exp_parse_ok
    false, all fields null); even rows carry the container's real
    dimensions / fmt-chunk values / mvhd duration. The WAV fixture writes
    max(dur_ms, 250) ms of data at 16 kB/s, so its expected parsed
    duration is max(dur_ms, 250) regardless of the nominal column.

    This is the invariant side of the `media_metadata` driver query: the
    parse output joined against these columns must show ZERO mismatches."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 64 + i % 128, 48 + i % 96
        dur = (i % 3 == 2) * (1000 + 500 * (i % 7))
        base = (
            i,
            kind,
            _fixture_payload(i, kind, w, h, dur),
            ("image/png", "audio/wav", "video/mp4")[i % 3],
            w,
            h,
            dur,
        )
        if i % 2:  # garbage payload -> quarantine
            exp = (None, None, None, None, None, None, False)
        elif kind == "image":
            exp = ("png", w, h, None, None, None, True)
        elif kind == "audio":
            # fmt: 1 channel @ 8 kHz 16-bit -> 16000 B/s byte rate;
            # data chunk holds max(dur, 250) ms -> parser recovers it
            exp = ("wav", None, None, 1, 8000, max(dur, 250), True)
        else:  # video: mvhd timescale 1000, duration = dur
            exp = ("mp4", None, None, None, None, dur, True)
        rows.append(base + exp)
    return spark.createDataFrame(rows, EXPECTED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio sample decode (PCM WAV — pure byte math + numpy, no library)
# and per-clip signal features. The feature math is exact-integer until
# the final division/sqrt: one int64 sum per feature, so results are
# bit-identical across partitionings and platforms.
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_samples bigint, sample_rate_hz int, "
    "channels int, bits int, rms double, zero_cross_rate double, "
    "peak int, clip_ratio double, parse_ok boolean"
)


def decode_wav_samples(payload: bytes | None):
    """RIFF/WAVE PCM bytes -> (samples, rate, channels, bits) where
    samples is a numpy int32 array of shape (n_frames, channels),
    CENTERED at 0 (8-bit unsigned input is shifted by -128). Supports
    format tag 1 (PCM) at 8 or 16 bits; returns None for anything else
    (the quarantine route). Trailing bytes that don't fill a whole frame
    are dropped."""
    import numpy as np

    if not payload or len(payload) < 12:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt_tag = channels = rate = bits = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt_tag != 1 or not channels or not rate or data is None:
        return None
    if bits == 16:
        frames = len(data) // (2 * channels)
        if frames == 0:
            return None
        arr = np.frombuffer(
            data, dtype="<i2", count=frames * channels
        ).astype(np.int32)
    elif bits == 8:
        frames = len(data) // channels
        if frames == 0:
            return None
        arr = (
            np.frombuffer(data, dtype=np.uint8, count=frames * channels)
            .astype(np.int32)
            - 128
        )
    else:
        return None
    return arr.reshape(frames, channels), rate, channels, bits


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-clip signal features over REAL decoded PCM samples (channel 0):
    RMS (sqrt of the exact int64 energy sum / n), zero-crossing rate
    (strict sign products < 0 over n-1 adjacent pairs), integer peak
    |amplitude|, and clip ratio (|x| at full scale: 32767/127). One
    Arrow-batched mapInPandas stage, zero shuffle; undecodable payloads
    emit parse_ok=false with NULL features."""
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf[payload_col]
            ):
                dec = decode_wav_samples(p)
                if dec is None:
                    rows.append((mid, kind, None, None, None, None, None,
                                 None, None, None, False))
                    continue
                samples, rate, ch, bits = dec
                x = samples[:, 0].astype(np.int64)
                n = x.shape[0]
                energy = int((x * x).sum())
                rms = math.sqrt(energy / n)
                zc = (
                    int(((x[:-1] * x[1:]) < 0).sum()) / (n - 1)
                    if n > 1
                    else 0.0
                )
                peak = int(np.abs(x).max())
                full = 32767 if bits == 16 else 127
                clip = int((np.abs(x) >= full).sum()) / n
                rows.append(
                    (mid, kind, n, rate, ch, bits, rms, zc, peak, clip, True)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_samples", "sample_rate_hz",
                    "channels", "bits", "rms", "zero_cross_rate", "peak",
                    "clip_ratio", "parse_ok",
                ],
            )

    return df.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = (
    "media_id bigint, kind string, n_samples bigint, sample_rate_hz int, "
    "dominant_bin int, dominant_freq_hz double, parse_ok boolean"
)


def audio_spectral(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Dominant-frequency analysis over REAL decoded PCM samples
    (channel 0): one rfft per clip, dominant_bin = argmax |X[k]| over
    k >= 1 (DC excluded), dominant_freq_hz = bin * rate / n. The float
    FFT never crosses engines: the ORACLE-compared value is the integer
    bin, and for any periodic clip whose period divides n the fundamental
    wins argmax by a wide margin (a square wave's 3rd harmonic is 3x
    weaker), so ulp noise cannot flip it. Arrow-batched mapInPandas,
    zero shuffle; undecodable payloads -> parse_ok=false."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf[payload_col]
            ):
                dec = decode_wav_samples(p)
                if dec is None:
                    rows.append((mid, kind, None, None, None, None, False))
                    continue
                samples, rate, _ch, _bits = dec
                x = samples[:, 0].astype(np.float64)
                n = x.shape[0]
                mag = np.abs(np.fft.rfft(x))
                if mag.shape[0] < 2:
                    rows.append((mid, kind, n, rate, None, None, True))
                    continue
                k = int(np.argmax(mag[1:])) + 1
                rows.append(
                    (mid, kind, n, rate, k, k * rate / n, True)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_samples", "sample_rate_hz",
                    "dominant_bin", "dominant_freq_hz", "parse_ok",
                ],
            )

    return df.mapInPandas(batches, schema=AUDIO_SPECTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# Real-pixel / real-sample fixtures with CONSTRUCTION-TIME ground truth
# (the media_fixture_expected recipe): expected values derive from the
# generator's parameters and the documented resampling/feature SPEC —
# never by running the operator under test.
# ---------------------------------------------------------------------------


def _pattern_pixel(i: int, y: int, x: int, c: int) -> int:
    """Closed-form synthetic image: channel c of pixel (y, x) in image i.
    Shared by the fixture generator AND the expected-side mirror."""
    return (x * (7 + 2 * c) + y * (13 + 3 * c) + i * 31) % 251


IMAGE_RESIZE_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, exp_resized boolean, "
    "exp_sha256 string"
)


def image_resize_fixture_expected(
    spark, n: int = 48, out_w: int = 16, out_h: int = 12
) -> DataFrame:
    """n media rows for the resize oracle: even rows (mod 3 != 2) are
    REAL GIFs of the gray closed-form pattern (exercising the LZW +
    palette decode leg — a GIF decodes to 3 replicated channels), odd
    rows are REAL RGB PNGs; rows i % 3 == 2 are garbage
    (exp_resized=false). exp_sha256 is the sha256 of the resized pixel
    bytes computed INDEPENDENTLY from the pattern formula + the
    nearest-neighbor center-sampling spec
    src = floor(((2*t + 1) * in) / (2 * out)) — not by calling
    resize_nearest. decode_png / decode_gif are pinned against
    hand-built byte streams in tests/test_png_codec.py and
    tests/test_gif_codec.py, so an encode/decode pair cannot
    self-consistently hide a channel or orientation swap."""
    import numpy as np

    from . import gif_codec, png_codec

    rows = []
    for i in range(n):
        if i % 3 == 2:
            payload = hashlib.md5(f"img{i}".encode()).digest() * 3
            rows.append(
                (i, "image", payload, "application/octet-stream",
                 None, None, None, False, None)
            )
            continue
        w, h = 20 + (i * 5) % 40, 15 + (i * 7) % 30
        if i % 2 == 0:  # gray pattern shipped as a GIF (palette of grays)
            gray = np.zeros((h, w), dtype=np.uint8)
            xs = np.arange(w)[None, :] * 7
            ys = np.arange(h)[:, None] * 13
            gray[:, :] = ((xs + ys + i * 31) % 251).astype(np.uint8)
            payload, mime = gif_codec.encode_gif(gray), "image/gif"
            exp_ch, gif_gray = 3, True  # GIF decodes to replicated RGB
        else:
            arr = np.zeros((h, w, 3), dtype=np.uint8)
            for c in range(3):
                xs = np.arange(w)[None, :] * (7 + 2 * c)
                ys = np.arange(h)[:, None] * (13 + 3 * c)
                arr[:, :, c] = ((xs + ys + i * 31) % 251).astype(np.uint8)
            payload, mime = png_codec.encode_png(arr), "image/png"
            exp_ch, gif_gray = 3, False
        exp = np.zeros((out_h, out_w, exp_ch), dtype=np.uint8)
        for v in range(out_h):
            sy = ((2 * v + 1) * h) // (2 * out_h)
            for u in range(out_w):
                sx = ((2 * u + 1) * w) // (2 * out_w)
                for c in range(exp_ch):
                    exp[v, u, c] = _pattern_pixel(
                        i, sy, sx, 0 if gif_gray else c
                    )
        rows.append(
            (i, "image", payload, mime, w, h, None, True,
             hashlib.sha256(exp.tobytes()).hexdigest())
        )
    return spark.createDataFrame(rows, IMAGE_RESIZE_SCHEMA)


def jpeg_resize_fixture_expected(
    spark, n: int = 48, out_w: int = 16, out_h: int = 12
) -> DataFrame:
    """n media rows certifying the REAL baseline-JPEG pixel path
    (operators/jpeg_codec.py): rows i % 3 == 2 are garbage
    (exp_resized=false); the rest are grayscale JPEGs of a per-8x8-BLOCK
    constant pattern tile(by,bx) = (bx*7 + by*13 + 31i) % 251, encoded
    at quality 75 — where the luminance q00 is exactly 8, cancelling the
    DCT DC gain, so flat blocks round-trip EXACTLY (dc_q = v - 128 on
    encode, v back on decode; AC residue ~1e-13 quantizes to zero;
    rounding boundaries sit 0.5 away from every intermediate). That
    exactness makes exp_sha256 pure construction-time ground truth: the
    sha of the pattern values at the nearest-neighbor center-sample
    coordinates, never a codec output. decode_jpeg itself is pinned
    against a hand-assembled byte stream + an independent T.81 IDCT in
    tests/test_jpeg_codec.py."""
    import numpy as np

    from . import jpeg_codec

    rows = []
    for i in range(n):
        if i % 3 == 2:
            payload = hashlib.md5(f"jpg{i}".encode()).digest() * 3
            rows.append(
                (i, "image", payload, "application/octet-stream",
                 None, None, None, False, None)
            )
            continue
        bh, bw = 2 + i % 3, 3 + i % 4
        h, w = 8 * bh, 8 * bw
        bys = np.arange(bh, dtype=np.int64)[:, None]
        bxs = np.arange(bw, dtype=np.int64)[None, :]
        tiles = ((bxs * 7 + bys * 13 + i * 31) % 251).astype(np.uint8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        payload = jpeg_codec.encode_jpeg(img, quality=75)
        exp = np.zeros((out_h, out_w), dtype=np.uint8)
        for v in range(out_h):
            sy = ((2 * v + 1) * h) // (2 * out_h)
            for u in range(out_w):
                sx = ((2 * u + 1) * w) // (2 * out_w)
                exp[v, u] = tiles[sy // 8, sx // 8]
        rows.append(
            (i, "image", payload, "image/jpeg", w, h, None, True,
             hashlib.sha256(exp.tobytes()).hexdigest())
        )
    return spark.createDataFrame(rows, IMAGE_RESIZE_SCHEMA)


def _animation_params(i: int) -> tuple[int, int, list[int]]:
    """(h, w, frame gray values) for animated fixture row i — shared by
    the generator and the expected-side mirror."""
    n_frames = 2 + i % 4
    h, w = 10 + i % 6, 12 + i % 5
    values = [(i * 37 + k * 11) % 251 for k in range(n_frames)]
    return h, w, values


def animation_fixture(spark, n: int = 24) -> DataFrame:
    """n media rows: i % 3 == 2 garbage (stub route), the rest REAL
    animated GIFs — full-screen constant-gray frames from
    _animation_params, every frame 500 ms."""
    import numpy as np

    from . import gif_codec

    rows = []
    for i in range(n):
        if i % 3 == 2:
            payload = hashlib.md5(f"anim{i}".encode()).digest() * 2
            rows.append(
                (i, "video", payload, "application/octet-stream",
                 None, None, None)
            )
            continue
        h, w, values = _animation_params(i)
        frames = [np.full((h, w), v, dtype=np.uint8) for v in values]
        payload = gif_codec.encode_gif_animation(frames, [500] * len(frames))
        rows.append(
            (i, "video", payload, "image/gif", w, h, 500 * len(values))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def animation_frames_expected(
    spark, n: int = 24, every_ms: int = 250
) -> DataFrame:
    """One row per REAL frame sample_frames must emit for
    animation_fixture(n) at `every_ms`: timestamps t = k*every_ms up to
    the last frame's start (500*(F-1)), the active frame at t is
    floor(t/500), and exp_sha256 is the sha of that frame's composited
    canvas — all CLOSED FORMS of _animation_params, never produced by
    running the codec pipeline."""
    import numpy as np

    rows = []
    for i in range(n):
        if i % 3 == 2:
            continue
        h, w, values = _animation_params(i)
        total = 500 * (len(values) - 1)
        for k in range(total // every_ms + 1):
            t = k * every_ms
            v = values[min(t // 500, len(values) - 1)]
            canvas = np.full((h, w, 3), v, dtype=np.uint8)
            rows.append(
                (i, t, hashlib.sha256(canvas.tobytes()).hexdigest())
            )
    return spark.createDataFrame(
        rows, "media_id bigint, ts int, exp_sha256 string"
    )


def _mjpeg_params(i: int) -> tuple[int, int, int]:
    """(block_h, block_w, n_frames) for MJPEG fixture row i — shared by
    the generator and the expected-side mirror. Frame k's 8x8-block tile
    value is _mjpeg_tile(i, k, by, bx); flat blocks at quality 75
    round-trip EXACTLY through the JPEG codec (jpeg_resize fixture
    invariant), so frame pixels are construction-time ground truth."""
    return 2 + i % 3, 3 + i % 4, 2 + i % 4


def _mjpeg_tile(i: int, k: int, by: int, bx: int) -> int:
    return (bx * 7 + by * 13 + i * 31 + k * 11) % 251


def mjpeg_fixture(spark, n: int = 24) -> DataFrame:
    """n media rows: i % 3 == 2 garbage (stub route), the rest REAL
    MJPEG MP4s (mp4_codec.mux_mjpeg over jpeg_codec frames) — grayscale
    per-8x8-block-constant frames from _mjpeg_params, every frame
    500 ms."""
    import numpy as np

    from . import jpeg_codec, mp4_codec

    rows = []
    for i in range(n):
        if i % 3 == 2:
            payload = hashlib.md5(f"mjpg{i}".encode()).digest() * 2
            rows.append(
                (i, "video", payload, "application/octet-stream",
                 None, None, None)
            )
            continue
        bh, bw, n_frames = _mjpeg_params(i)
        h, w = 8 * bh, 8 * bw
        jpegs = []
        for k in range(n_frames):
            bys = np.arange(bh, dtype=np.int64)[:, None]
            bxs = np.arange(bw, dtype=np.int64)[None, :]
            tiles = ((bxs * 7 + bys * 13 + i * 31 + k * 11) % 251).astype(
                np.uint8
            )
            img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
            jpegs.append(jpeg_codec.encode_jpeg(img, quality=75))
        payload = mp4_codec.mux_mjpeg(jpegs, [500] * n_frames, w, h)
        rows.append(
            (i, "video", payload, "video/mp4", w, h, 500 * n_frames)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def mjpeg_frames_expected(
    spark, n: int = 24, every_ms: int = 250
) -> DataFrame:
    """One row per REAL frame sample_frames must emit for
    mjpeg_fixture(n) at `every_ms`: t = k*every_ms up to the last
    frame's start (500*(F-1)), active frame floor(t/500), exp_sha256 =
    sha of that frame's (h, w, 1) gray pixels — pure closed forms of
    _mjpeg_params/_mjpeg_tile (the flat-block q75 exact round-trip makes
    the JPEG decode a no-op on these values); the demux/decode pipeline
    is never run here."""
    import numpy as np

    rows = []
    for i in range(n):
        if i % 3 == 2:
            continue
        bh, bw, n_frames = _mjpeg_params(i)
        total = 500 * (n_frames - 1)
        for t in range(0, total + 1, every_ms):
            k = min(t // 500, n_frames - 1)
            canvas = np.zeros((8 * bh, 8 * bw, 1), dtype=np.uint8)
            for by in range(bh):
                for bx in range(bw):
                    canvas[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8, 0] = (
                        _mjpeg_tile(i, k, by, bx)
                    )
            rows.append(
                (i, t, hashlib.sha256(canvas.tobytes()).hexdigest())
            )
    return spark.createDataFrame(
        rows, "media_id bigint, ts int, exp_sha256 string"
    )


AUDIO_FIXTURE_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int, exp_parse_ok boolean, "
    "exp_n_samples bigint, exp_rms double, exp_zcr double, exp_peak int, "
    "exp_clip double"
)


def _square_wave_wav(
    amp: int, period: int, n: int, rate: int = 8000, bits: int = 16
) -> bytes:
    """Mono PCM WAV of a square wave: +amp for the first period/2 samples
    of each period, -amp for the rest. Closed-form features: RMS = amp
    exactly, peak = amp, zero crossings = floor((n-1) / (period/2))."""
    import numpy as np

    idx = np.arange(n) % period
    x = np.where(idx < period // 2, amp, -amp)
    if bits == 16:
        data = x.astype("<i2").tobytes()
        block, byte_rate = 2, rate * 2
    else:
        data = (x + 128).astype(np.uint8).tobytes()
        block, byte_rate = 1, rate
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little") + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunk = b"data" + len(data).to_bytes(4, "little") + data
    return (
        b"RIFF" + (4 + len(fmt) + len(chunk)).to_bytes(4, "little")
        + b"WAVE" + fmt + chunk
    )


AUDIO_SPECTRAL_FIXTURE_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "exp_parse_ok boolean, exp_n_samples bigint, exp_bin int, "
    "exp_freq double"
)


def audio_spectral_fixture_expected(spark, n: int = 32) -> DataFrame:
    """n audio rows for the spectral oracle: rows i % 4 == 3 garbage;
    the rest square waves whose period DIVIDES the sample count
    (n_samp = period * cycles -> zero spectral leakage), so the
    dominant bin is EXACTLY `cycles` and the dominant frequency is
    cycles * rate / n_samp — closed forms of the construction params.
    exp_freq mirrors the operator's float expression with the same
    integers, so the doubles are bit-identical."""
    rows = []
    for i in range(n):
        if i % 4 == 3:
            payload = hashlib.md5(f"spec{i}".encode()).digest() * 2
            rows.append(
                (i, "audio", payload, "application/octet-stream",
                 False, None, None, None)
            )
            continue
        period = 2 * (1 + i % 5)
        cycles = 60 + i
        n_samp = period * cycles
        amp = (300 + 41 * i) % 30000 + 1
        payload = _square_wave_wav(amp, period, n_samp)
        rows.append(
            (i, "audio", payload, "audio/wav", True, n_samp, cycles,
             cycles * 8000 / n_samp)
        )
    return spark.createDataFrame(rows, AUDIO_SPECTRAL_FIXTURE_SCHEMA)


def audio_fixture_expected(spark, n: int = 48) -> DataFrame:
    """n audio rows for the feature oracle: rows i % 4 == 3 are garbage
    (exp_parse_ok=false); the rest are REAL mono square-wave WAVs — 16-bit
    except every 8th row (8-bit), with amp/period varying per row and one
    full-scale clipping row per cycle. All expected values are CLOSED
    FORMS of (amp, period, n_samples): RMS of a square wave is exactly
    amp (|x| is constant), so the float column is reproducible without
    running the decoder."""
    rows = []
    for i in range(n):
        if i % 4 == 3:
            payload = hashlib.md5(f"aud{i}".encode()).digest() * 2
            rows.append(
                (i, "audio", payload, "application/octet-stream",
                 None, None, None, False, None, None, None, None, None)
            )
            continue
        bits = 8 if i % 8 == 0 else 16
        full = 127 if bits == 8 else 32767
        amp = full if i % 12 == 4 else (100 + 37 * i) % (full - 1) + 1
        period = 2 * (1 + i % 5)
        n_samp = 400 + 19 * i
        payload = _square_wave_wav(amp, period, n_samp, bits=bits)
        zcr = ((n_samp - 1) // (period // 2)) / (n_samp - 1)
        clip = 1.0 if amp >= full else 0.0
        rows.append(
            (i, "audio", payload, "audio/wav", None, None,
             n_samp * 1000 // 8000, True, n_samp, float(amp), zcr, amp,
             clip)
        )
    return spark.createDataFrame(rows, AUDIO_FIXTURE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup (dHash; the image analog of SimHash): 64-bit
# gradient hash per payload, then dedup.hamming_dup_pairs bands the codes
# for the candidate join. PNG payloads use REAL decoded pixels (stdlib
# zlib codec: luma plane -> exact integer 8x9 area-mean pool), so
# near-identical PNG IMAGES — not just identical bytes — hash within a
# small hamming distance. Payloads the codec rejects (JPEG/GIF/garbage)
# fall back to the sha256 fake stream: identical bytes still collide,
# and everything downstream (banding, XOR verify, components) is
# decoder-agnostic plumbing either way.
# ---------------------------------------------------------------------------


def _fake_pixel_stream(payload: bytes, n: int) -> bytes:
    """sha256-chained deterministic byte stream standing in for decoded
    grayscale pixels (fallback for payloads png_codec can't decode —
    same stand-in policy as _fake_decode)."""
    out = b""
    h = hashlib.sha256(payload).digest()
    while len(out) < n:
        out += h
        h = hashlib.sha256(h).digest()
    return out[:n]


def _pixel_grid_8x9(payload: bytes):
    """8x9 grayscale grid for dHash: real PNG/GIF decode -> integer luma
    -> exact-integer area-mean pool (grid_mean) when the image is at
    least 9x8, nearest-neighbor otherwise; undecodable payloads fall
    back to the deterministic fake stream. numpy uint8/int64 throughout
    — bit-identical across platforms and partitionings."""
    import numpy as np

    from . import png_codec

    arr = decode_image_pixels(payload)
    if arr is None:
        return np.frombuffer(
            _fake_pixel_stream(payload, 72), dtype=np.uint8
        ).reshape(8, 9)
    plane = png_codec.luma(arr)
    if plane.shape[0] >= 8 and plane.shape[1] >= 9:
        return png_codec.grid_mean(plane, 9, 8)
    return png_codec.resize_nearest(plane, 9, 8)


def phash64_bytes(payload: bytes | None) -> int | None:
    """64-bit dHash: an 8x9 grayscale grid, bit (r, c) set when
    pixel(r, c) > pixel(r, c+1) — horizontal gradient signs, the
    classic dHash. PNG payloads hash REAL pixels (_pixel_grid_8x9);
    undecodable payloads hash a deterministic byte-stream stand-in.
    Returned as a SIGNED 64-bit int (Spark LongType; bit 63 maps to
    the sign bit — the repo's 1<<63 ANSI-overflow lesson). None for
    NULL payloads."""
    if payload is None:
        return None
    px = _pixel_grid_8x9(payload)
    bits = 0
    for r in range(8):
        for c in range(8):
            if int(px[r, c]) > int(px[r, c + 1]):
                bits |= 1 << (r * 8 + c)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def perceptual_hashes(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds `phash`: the 64-bit dHash of each payload. One Arrow pass,
    zero shuffle (per-payload-local)."""

    def batch(payloads):  # no type hints (pandas_udf eval-type inference)
        return pd.Series(
            [phash64_bytes(p) for p in payloads], dtype="object"
        )

    udf = F.pandas_udf(batch, returnType="long")
    return df.withColumn("phash", udf(F.col(payload_col)))


def phash_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of perceptually-near media — dHash +
    the generic banded hamming join (dedup.hamming_dup_pairs: candidate
    generation is a per-band hash equi-join over (band-bits, id, code),
    never a nested loop; payload bytes never shuffle)."""
    from .dedup import hamming_dup_pairs

    hashed = perceptual_hashes(
        df.select(id_col, payload_col), payload_col
    ).select(F.col(id_col).alias("id"), "phash")
    return hamming_dup_pairs(
        hashed.filter(F.col("phash").isNotNull()), "phash", "id", max_hamming
    )


def audio_fingerprint64(payload: bytes | None) -> int | None:
    """64-bit energy-delta fingerprint of a PCM clip — the audio analog
    of dHash: decode channel 0, split the first 65*(n//65) samples into
    65 equal frames, per-frame energy = EXACT int64 sum of squares, bit
    j = energy[j+1] > energy[j]. Properties that make it a dedup key:
    VOLUME-INVARIANT (scaling amplitude by c scales every energy by c^2,
    preserving every strict comparison — provable, not approximate) and
    bit-exact across partitionings (integer math only, no FFT floats).
    None for undecodable payloads or clips shorter than 65 samples."""
    dec = decode_wav_samples(payload)
    if dec is None:
        return None
    samples = dec[0][:, 0].astype("int64")
    frame = samples.shape[0] // 65
    if frame == 0:
        return None
    import numpy as np

    e = (samples[: 65 * frame].reshape(65, frame) ** 2).sum(axis=1)
    fp = 0
    for j in range(64):
        if e[j + 1] > e[j]:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= 1 << 63 else fp


def audio_fingerprints(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, afp long) via one Arrow pass; undecodable -> NULL afp."""

    def batch(payloads):  # no type hints (pandas_udf eval-type inference)
        return pd.Series(
            [audio_fingerprint64(None if p is None else bytes(p)) for p in payloads],
            dtype="Int64",
        )

    udf = F.pandas_udf(batch, returnType="long")
    return df.select(
        F.col(id_col).alias("id"), udf(F.col(payload_col)).alias("afp")
    )


def audio_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of near-duplicate audio —
    audio_fingerprint64 + the generic banded hamming join
    (dedup.hamming_dup_pairs): candidate generation is a per-band hash
    equi-join; payload bytes never shuffle."""
    from .dedup import hamming_dup_pairs

    fps = audio_fingerprints(df, payload_col, id_col)
    return hamming_dup_pairs(
        fps.filter(F.col("afp").isNotNull()), "afp", "id", max_hamming
    )


def _afp_profile(i: int) -> list[int]:
    """65 per-frame amplitudes for audio-dedup fixture clip i —
    construction-time ground truth shared by the generator and the
    expected-fingerprint mirror (sha512 + sha256 of the clip tag: 65
    deterministic bytes)."""
    seed = hashlib.sha512(f"afp{i}".encode()).digest()
    seed += hashlib.sha256(f"afp{i}".encode()).digest()
    return [100 + b % 150 for b in seed[:65]]


def afp_expected_fingerprint(i: int) -> int:
    """The fingerprint audio_fingerprint64 MUST produce for fixture clip
    i, derived from the amplitude profile alone (energy ordering ==
    amplitude ordering for same-shape frames) — never by running the
    decoder."""
    a = _afp_profile(i)
    fp = 0
    for j in range(64):
        if a[j + 1] > a[j]:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= 1 << 63 else fp


def audio_dedup_fixture(spark, n_base: int = 24, frame: int = 16) -> DataFrame:
    """2*n_base WAV clips: base clip i carries a 65-frame square wave
    whose frame-j amplitude is _afp_profile(i)[j]; clip i+1000 is the
    SAME clip at DOUBLE VOLUME (the provably-fingerprint-preserving
    transform). Expected dedup pairs: exactly {(i, i+1000)} at hamming
    0 — cross-clip fingerprint distances for this fixed fixture are
    asserted > max_hamming in tests (deterministic profiles, checked
    once, pinned)."""
    import io
    import struct as _struct

    def clip(i: int, scale: int) -> bytes:
        amps = _afp_profile(i)
        body = io.BytesIO()
        for a in amps:
            v = a * scale
            half = [v, v, -v, -v] * (frame // 4)
            for s in half[:frame]:
                body.write(_struct.pack("<h", s))
        pcm = body.getvalue()
        hdr = (
            b"RIFF" + _struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + _struct.pack("<I", len(pcm))
        )
        return hdr + pcm

    rows = []
    for i in range(n_base):
        rows.append((i, "audio", clip(i, 1), "audio/wav", None, None, None))
        rows.append(
            (i + 1000, "audio", clip(i, 2), "audio/wav", None, None, None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
