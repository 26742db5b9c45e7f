"""GIF codec — pure-python tests. Decode is pinned against byte streams
built here by hand (palette, descriptor, interlace flag, GCE), so the
encode/decode pair can't self-consistently hide a bug."""

import numpy as np
import pytest

from dataqualitykit_spark.operators import gif_codec as gc


def _descriptor_offset(payload: bytes) -> int:
    """Offset of the image descriptor in an encode_gif output (header +
    global color table)."""
    n_pal = 2 << (payload[10] & 0x07)
    return 13 + 3 * n_pal


class TestHandBuilt:
    def test_minimal_2color_gif(self):
        # 2x2 checkerboard, 2-entry GCT, literal LZW codes written by hand:
        # min code size 2 -> clear=4, end=5, first width 3. The decoder
        # adds a table entry per code after the first; after the THIRD
        # data code the table holds 8 entries, so the width steps to 4
        # — the last data code and end are packed at width 4.
        codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
        acc = bitlen = 0
        data = bytearray()
        for c, width in codes:
            acc |= c << bitlen
            bitlen += width
            while bitlen >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                bitlen -= 8
        if bitlen:
            data.append(acc & 0xFF)
        gif = (
            b"GIF89a"
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + bytes([0x80, 0, 0])  # GCT, 2 entries
            + bytes([10, 20, 30, 200, 210, 220])
            + b"\x2c" + b"\x00" * 4
            + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
            + bytes([2])  # LZW min code size
            + bytes([len(data)]) + bytes(data) + b"\x00\x3b"
        )
        arr = gc.decode_gif(gif)
        assert arr.shape == (2, 2, 3)
        assert tuple(arr[0, 0]) == (10, 20, 30)
        assert tuple(arr[0, 1]) == (200, 210, 220)
        assert tuple(arr[1, 0]) == (200, 210, 220)
        assert tuple(arr[1, 1]) == (10, 20, 30)


class TestRoundTrip:
    def test_gray(self):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 200, (23, 31), dtype=np.uint8)
        d = gc.decode_gif(gc.encode_gif(a))
        assert d.shape == (23, 31, 3)
        assert (d == a[:, :, None]).all()

    def test_rgb_few_colors(self):
        b = np.zeros((10, 10, 3), np.uint8)
        b[::2] = [255, 0, 0]
        b[1::2] = [0, 0, 255]
        assert (gc.decode_gif(gc.encode_gif(b)) == b).all()

    def test_lzw_self_reference_case(self):
        # runs like 5,5,5,5 hit the code == len(table) (cScSc) branch
        c = np.tile(np.array([[5, 5, 5, 5, 5, 7]], dtype=np.uint8), (8, 6))
        assert (gc.decode_gif(gc.encode_gif(c))[:, :, 0] == c).all()

    def test_dictionary_reset_past_4096(self):
        rng = np.random.default_rng(11)
        big = (rng.integers(0, 64, (200, 300), dtype=np.uint8) * 4).astype(
            np.uint8
        )
        assert (gc.decode_gif(gc.encode_gif(big))[:, :, 0] == big).all()

    def test_single_color(self):
        a = np.full((5, 7), 42, dtype=np.uint8)
        assert (gc.decode_gif(gc.encode_gif(a))[:, :, 0] == a).all()

    def test_deterministic(self):
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert gc.encode_gif(a) == gc.encode_gif(a.copy())

    def test_palette_cap(self):
        rng = np.random.default_rng(5)
        with pytest.raises(gc.GifError, match="256"):
            gc.encode_gif(rng.integers(0, 256, (30, 30, 3), dtype=np.uint8))


class TestFlags:
    def test_interlace(self):
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        order = (
            list(range(0, 8, 8)) + list(range(4, 8, 8))
            + list(range(2, 8, 4)) + list(range(1, 8, 2))
        )
        payload = bytearray(gc.encode_gif(a[order]))  # rows in file order
        i = _descriptor_offset(payload)
        assert payload[i] == 0x2C
        payload[i + 9] |= 0x40  # interlace flag
        out = gc.decode_gif(bytes(payload))
        assert (out[:, :, 0] == a).all()

    def test_transparency_gce(self):
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        payload = bytearray(gc.encode_gif(a))
        gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 3, 0])  # transparent idx 3
        j = _descriptor_offset(payload)
        payload[j:j] = gce
        out = gc.decode_gif(bytes(payload))
        assert out.shape == (8, 8, 4)
        assert out[0, 3, 3] == 0 and out[0, 4, 3] == 255

    def test_plain_extension_skipped(self):
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        payload = bytearray(gc.encode_gif(a))
        comment = bytes([0x21, 0xFE, 5]) + b"hello" + b"\x00"
        j = _descriptor_offset(payload)
        payload[j:j] = comment
        assert (gc.decode_gif(bytes(payload))[:, :, 0] == a).all()


class TestAnimation:
    def test_roundtrip_timestamps_and_frames(self):
        frames = [np.full((6, 8), 10 * k, dtype=np.uint8) for k in range(4)]
        frames[2][2:4, 3:5] = 99
        payload = gc.encode_gif_animation(frames, [100, 200, 300, 400])
        dec = gc.decode_gif_frames(payload)
        assert [t for _, t in dec] == [0, 100, 300, 600]
        for k, (canvas, _) in enumerate(dec):
            assert (canvas == np.repeat(frames[k][:, :, None], 3, axis=2)).all()

    def test_max_frames_stops_early(self):
        frames = [np.full((4, 4), k, dtype=np.uint8) for k in range(5)]
        payload = gc.encode_gif_animation(frames, [50] * 5)
        assert len(gc.decode_gif_frames(payload, max_frames=2)) == 2

    def test_decode_gif_returns_first_frame(self):
        frames = [np.full((4, 4), k * 30, dtype=np.uint8) for k in range(3)]
        payload = gc.encode_gif_animation(frames, [100] * 3)
        assert (gc.decode_gif(payload)[:, :, 0] == frames[0]).all()

    def test_partial_rect_transparency_composites(self):
        # hand-appended second frame: 2x2 rect at (1,1), local 2-color
        # table, index 0 transparent -> leaves the base canvas visible
        base = gc.encode_gif(np.full((6, 8), 50, dtype=np.uint8))
        gce = bytes([0x21, 0xF9, 4, 0x05, 5, 0, 0, 0])
        lct = bytes([0, 0, 0, 200, 100, 25])
        lzw = gc._lzw_encode(bytes([0, 1, 1, 0]), 2)
        desc = (
            b"\x2c" + (1).to_bytes(2, "little") * 2
            + (2).to_bytes(2, "little") * 2 + bytes([0x80])
        )
        frame2 = gce + desc + lct + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00"
        dec = gc.decode_gif_frames(base[:-1] + frame2 + b"\x3b")
        assert len(dec) == 2
        c2 = dec[1][0]
        assert tuple(c2[1, 1]) == (50, 50, 50)  # transparent -> canvas
        assert tuple(c2[1, 2]) == (200, 100, 25)
        assert tuple(c2[2, 1]) == (200, 100, 25)
        assert tuple(c2[0, 0]) == (50, 50, 50)

    def test_disposal_2_restores_background(self):
        base = gc.encode_gif(np.full((4, 4), 9, dtype=np.uint8))
        # disposal=2 GCE before frame 1, then a second full frame with
        # transparent index: restored-black shows through
        payload = bytearray(base[:-1])
        n_pal = 2 << (payload[10] & 0x07)
        j = 13 + 3 * n_pal
        payload[j:j] = bytes([0x21, 0xF9, 4, 0x08, 5, 0, 0, 0])  # disposal 2
        lct = bytes([0, 0, 0, 7, 7, 7])
        lzw = gc._lzw_encode(bytes([0, 1] * 8), 2)
        gce2 = bytes([0x21, 0xF9, 4, 0x05, 5, 0, 0, 0])  # transparent 0
        desc = (
            b"\x2c" + (0).to_bytes(2, "little") * 2
            + (4).to_bytes(2, "little") * 2 + bytes([0x80])
        )
        payload += gce2 + desc + lct + bytes([2]) + bytes([len(lzw)]) + lzw
        payload += b"\x00\x3b"
        dec = gc.decode_gif_frames(bytes(payload))
        assert len(dec) == 2
        c2 = dec[1][0]
        assert tuple(c2[0, 0]) == (0, 0, 0)  # transparent over restored bg
        assert tuple(c2[0, 1]) == (7, 7, 7)

    def test_animation_rejects_mismatched_dims(self):
        with pytest.raises(gc.GifError):
            gc.encode_gif_animation(
                [np.zeros((2, 2), np.uint8), np.zeros((3, 3), np.uint8)],
                [10, 10],
            )


class TestErrors:
    @pytest.mark.parametrize(
        "bad",
        [
            None,
            b"",
            b"GIF89a" + b"\x00" * 5,
            b"notagifnotagifnotagif",
            b"GIF89a" + (2).to_bytes(2, "little") * 2 + bytes([0, 0, 0]) + b"\x3b",
        ],
    )
    def test_quarantine(self, bad):
        with pytest.raises(gc.GifError):
            gc.decode_gif(bad)

    def test_truncated_lzw(self):
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        payload = bytearray(gc.encode_gif(a))
        with pytest.raises(gc.GifError):
            gc.decode_gif(bytes(payload[: len(payload) - 6]))
