"""Dependency-free GIF codec (pure-python LZW + numpy) — real pixels for
the second big web image format (PNG: operators/png_codec.py).

Decode scope: GIF87a/GIF89a, global or local color table, interlaced or
sequential rows, FIRST frame only (animation frames beyond the first are
ignored — the quality-pipeline use is perceptual hashing / thumbnailing,
where frame 1 is the convention). Transparency (GCE transparent index)
is surfaced as an alpha channel. Anything malformed raises GifError —
the quarantine route, mirroring PngError.

Encode scope (fixture/test support + thumbnail sink): single frame,
<=256-color palette built from the image's distinct colors, REAL LZW
compression (dictionary growth, code-width stepping, 4095-entry cap with
clear-code reset) — so decode round-trips exercise the multi-char
dictionary paths, not just literal codes.

Scale shape: used inside Arrow-batched mapInPandas like png_codec —
payload bytes stay executor-local. LZW is an inherently sequential
bit-stream (no vectorizing it); per-payload cost is linear in pixels,
and batches bound memory.
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    """Raised for anything this codec does not decode. Callers treat it
    as the quarantine route, never as a crash."""


_MAX_CODE = 4096  # 12-bit LZW ceiling per the GIF spec


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: variable-width codes read LSB-first, clear/end
    codes, dictionary capped at 4096 entries."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table):  # the cScSc self-reference case
            entry = prev + prev[:1]
            if len(table) < _MAX_CODE:
                table.append(entry)
        else:
            raise GifError("LZW: code past dictionary")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_pixels:
        raise GifError("LZW: pixel stream short")
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows 0,8,16.. then 4,12.. then 2,6.. then
    odd rows."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(payload: bytes | None) -> np.ndarray:
    """GIF bytes -> numpy uint8 array (h, w, 3) — or (h, w, 4) when the
    first frame's graphic-control extension marks a transparent index.
    First frame only; frame offsets within a larger logical screen are
    honored by decoding just the frame rectangle."""
    if payload is None or len(payload) < 13:
        raise GifError("not a GIF")
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    packed = payload[10]
    gct = None
    pos = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    transparent: int | None = None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(payload):
                raise GifError("truncated extension")
            label = payload[pos + 1]
            pos += 2
            sub_start = pos
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise GifError("unterminated extension")
            if label == 0xF9 and payload[sub_start] >= 4:
                flags = payload[sub_start + 1]
                if flags & 0x01:
                    transparent = payload[sub_start + 4]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        # image descriptor
        if pos + 10 > len(payload):
            raise GifError("truncated image descriptor")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise GifError("truncated local color table")
            table = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifError("no color table")
        if w == 0 or h == 0:
            raise GifError("zero dimension")
        if pos >= len(payload):
            raise GifError("missing LZW data")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            chunk = payload[pos + 1 : pos + 1 + n]
            if len(chunk) < n:
                raise GifError("truncated data sub-block")
            chunks.append(chunk)
            pos += 1 + n
        if pos >= len(payload):
            raise GifError("unterminated data sub-blocks")
        stream = _lzw_decode(b"".join(chunks), min_code, w * h)
        idx = np.frombuffer(stream, dtype=np.uint8).reshape(h, w)
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise GifError("palette index out of range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = table[idx]
        if transparent is not None and transparent < table.shape[0]:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise GifError("no image frame")


def _lzw_encode(indexes: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW: greedy longest-match dictionary, variable code
    width, clear-code reset at the 4096 ceiling."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    code_size = min_code_size + 1
    out_bits.append((clear, code_size))
    run = b""
    for b in indexes:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= _MAX_CODE:
            out_bits.append((clear, code_size))
            table = fresh()
            next_code = end + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        out_bits.append((table[run], code_size))
    out_bits.append((end, code_size))
    # pack LSB-first
    acc = bitlen = 0
    data = bytearray()
    for code, width in out_bits:
        acc |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        data.append(acc & 0xFF)
    return bytes(data)


def encode_gif(arr: np.ndarray) -> bytes:
    """numpy uint8 (h, w), (h, w, 1) or (h, w, 3) -> single-frame GIF89a
    with a palette of the image's distinct colors (<=256 required —
    GifError otherwise; quantization is out of scope). Gray input maps
    each level to an (v, v, v) palette entry. Deterministic output:
    palette sorted by color, real LZW."""
    if arr.dtype != np.uint8:
        raise GifError(f"unsupported dtype {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise GifError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    rgb = np.repeat(arr, 3, axis=2) if arr.shape[2] == 1 else arr
    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise GifError(f"{colors.shape[0]} distinct colors (>256)")
    # palette size must be a power of two >= 2 per the size field
    size_pow = 1
    while (2 << size_pow - 1) < max(colors.shape[0], 2):
        size_pow += 1
    n_pal = 2 << size_pow - 1
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    min_code = max(2, size_pow)
    indexes = inverse.astype(np.uint8).tobytes()
    lzw = _lzw_encode(indexes, min_code)
    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((size_pow - 1) & 0x07), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
