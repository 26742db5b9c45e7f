"""Real-pixel multimodal paths: PNG resize_images, dHash over decoded
pixels, PCM WAV sample decode + audio features — the un-stubbed halves
of the media family (tests/test_png_codec.py pins the codec itself
against hand-built byte streams)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import png_codec as pc
from dataqualitykit_spark.operators.multimodal import (
    _square_wave_wav,
    audio_features,
    audio_fixture_expected,
    decode_wav_samples,
    image_resize_fixture_expected,
    phash64_bytes,
    resize_images,
)


def _png_of(arr: np.ndarray) -> bytes:
    return pc.encode_png(arr)


class TestResizeImages:
    def test_resizes_png_and_quarantines_garbage(self, spark):
        a = np.arange(300, dtype=np.uint8).reshape(10, 10, 3) % 251
        rows = [
            (0, "image", _png_of(a), "image/png", 10, 10, None),
            (1, "image", b"not a png at all....", "application/x", None, None, None),
        ]
        df = spark.createDataFrame(
            rows,
            "media_id bigint, kind string, payload binary, mime string, "
            "width int, height int, duration_ms int",
        )
        out = {r["media_id"]: r for r in resize_images(df, 4, 6).collect()}
        assert out[0]["resized"] and out[0]["width"] == 4 and out[0]["height"] == 6
        dec = pc.decode_png(bytes(out[0]["payload"]))
        assert dec.shape == (6, 4, 3)
        assert (dec == pc.resize_nearest(a, 4, 6)).all()
        assert not out[1]["resized"]
        assert bytes(out[1]["payload"]) == b"not a png at all...."

    def test_fixture_expected_matches_spec(self, spark):
        # the operator's output pixels == the fixture's closed-form
        # expectation for every decodable row (the driver-oracle join)
        fx = image_resize_fixture_expected(spark, 24, out_w=16, out_h=12)
        out = resize_images(
            fx.select(
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms",
            ),
            16,
            12,
        )
        got = {r["media_id"]: r for r in out.collect()}
        for e in fx.select("media_id", "exp_resized", "exp_sha256").collect():
            r = got[e["media_id"]]
            assert r["resized"] == e["exp_resized"]
            if e["exp_resized"]:
                pixels = pc.decode_png(bytes(r["payload"]))
                assert (
                    hashlib.sha256(pixels.tobytes()).hexdigest()
                    == e["exp_sha256"]
                )


class TestPhashRealPixels:
    def test_near_identical_images_hash_nearby(self):
        rng = np.random.default_rng(3)
        base = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
        noisy = base.copy()
        noisy[5, 5, 0] ^= 0xFF  # one pixel of 4096 barely moves the pool
        other = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
        h_base = phash64_bytes(_png_of(base))
        h_noisy = phash64_bytes(_png_of(noisy))
        h_other = phash64_bytes(_png_of(other))

        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        assert ham(h_base, h_noisy) <= 4
        assert ham(h_base, h_other) > 12

    def test_resized_image_hashes_identically(self):
        # dHash's point: the same picture at two sizes collides —
        # exact here because nearest-resampling a constant-gradient
        # pattern preserves the horizontal ordering the bits encode
        ys = np.arange(80)[:, None] * 0
        xs = np.arange(120)[None, :] * 2
        img = ((xs + ys) % 251).astype(np.uint8)[:, :, None]
        small = pc.resize_nearest(img, 60, 40)
        assert phash64_bytes(_png_of(img)) == phash64_bytes(_png_of(small))

    def test_small_image_uses_nearest_path(self):
        tiny = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
        assert phash64_bytes(_png_of(tiny)) is not None

    def test_gif_and_png_of_same_image_collide(self):
        # format-independence: the SAME picture shipped as GIF and PNG
        # hashes identically (GIF decodes to replicated-RGB whose luma
        # equals the gray plane)
        from dataqualitykit_spark.operators import gif_codec as gc

        rng = np.random.default_rng(9)
        gray = rng.integers(0, 200, (32, 40), dtype=np.uint8)
        h_gif = phash64_bytes(gc.encode_gif(gray))
        h_png = phash64_bytes(pc.encode_png(gray[:, :, None]))
        assert h_gif == h_png

    def test_non_png_falls_back_to_byte_hash(self):
        # identical garbage bytes still collide (phash_dedup twin rule)
        assert phash64_bytes(b"jpegish") == phash64_bytes(b"jpegish")
        assert phash64_bytes(b"jpegish") != phash64_bytes(b"jpegish2")


class TestSampleFramesReal:
    def test_gif_animation_extracts_real_frames(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            animation_fixture,
            animation_frames_expected,
            sample_frames,
        )

        fx = animation_fixture(spark, 12)
        out = sample_frames(fx, every_ms=250).collect()
        real = [r for r in out if r["mime"] == "image/png"]
        stub = [r for r in out if r["mime"] == "image/x-stub"]
        assert len(stub) == 4  # i % 3 == 2 garbage rows, one stub each
        exp = {
            (r["media_id"], r["ts"]): r["exp_sha256"]
            for r in animation_frames_expected(spark, 12, 250).collect()
        }
        assert len(real) == len(exp)
        for r in real:
            arr = pc.decode_png(bytes(r["payload"]))
            key = (r["media_id"], r["duration_ms"])
            assert hashlib.sha256(arr.tobytes()).hexdigest() == exp[key]
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])

    def test_mjpeg_mp4_extracts_real_frames(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            mjpeg_fixture,
            mjpeg_frames_expected,
            sample_frames,
        )

        fx = mjpeg_fixture(spark, 12)
        out = sample_frames(fx, every_ms=250).collect()
        real = [r for r in out if r["mime"] == "image/png"]
        stub = [r for r in out if r["mime"] == "image/x-stub"]
        assert len(stub) == 4  # i % 3 == 2 garbage rows, one stub each
        exp = {
            (r["media_id"], r["ts"]): r["exp_sha256"]
            for r in mjpeg_frames_expected(spark, 12, 250).collect()
        }
        assert len(real) == len(exp)
        for r in real:
            arr = pc.decode_png(bytes(r["payload"]))
            key = (r["media_id"], r["duration_ms"])
            assert hashlib.sha256(arr.tobytes()).hexdigest() == exp[key]
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])

    def test_non_gif_keeps_stub_fanout(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            media_fixture,
            sample_frames,
        )

        media = media_fixture(spark, 9)
        out = sample_frames(media, every_ms=1000).collect()
        assert all(r["mime"] == "image/x-stub" for r in out)


class TestWavDecode:
    def test_square_wave_roundtrip_16bit(self):
        payload = _square_wave_wav(1000, 4, 100)
        samples, rate, ch, bits = decode_wav_samples(payload)
        assert (rate, ch, bits) == (8000, 1, 16)
        assert samples.shape == (100, 1)
        assert list(samples[:5, 0]) == [1000, 1000, -1000, -1000, 1000]

    def test_8bit_centered(self):
        payload = _square_wave_wav(100, 2, 10, bits=8)
        samples, _, _, bits = decode_wav_samples(payload)
        assert bits == 8
        assert list(samples[:4, 0]) == [100, -100, 100, -100]

    @pytest.mark.parametrize(
        "bad",
        [None, b"", b"RIFFxxxxWAVE", b"RIFF\x00\x00\x00\x00JUNK" + b"\x00" * 40],
    )
    def test_garbage_returns_none(self, bad):
        assert decode_wav_samples(bad) is None

    def test_non_pcm_format_rejected(self):
        p = bytearray(_square_wave_wav(10, 2, 10))
        p[20] = 3  # fmt tag -> IEEE float
        assert decode_wav_samples(bytes(p)) is None


class TestAudioFeatures:
    def test_closed_form_square_wave(self, spark):
        fx = audio_fixture_expected(spark, 24)
        feats = audio_features(
            fx.select("media_id", "kind", "payload")
        )
        j = feats.join(
            fx.select(
                "media_id", "exp_parse_ok", "exp_n_samples", "exp_rms",
                "exp_zcr", "exp_peak", "exp_clip",
            ),
            "media_id",
        ).collect()
        assert len(j) == 24
        for r in j:
            assert r["parse_ok"] == r["exp_parse_ok"], r
            if not r["exp_parse_ok"]:
                assert r["rms"] is None and r["n_samples"] is None
                continue
            assert r["n_samples"] == r["exp_n_samples"]
            assert r["rms"] == r["exp_rms"]  # exact: square wave
            assert r["zero_cross_rate"] == r["exp_zcr"]
            assert r["peak"] == r["exp_peak"]
            assert r["clip_ratio"] == r["exp_clip"]

    def test_spectral_dominant_bin_closed_form(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            audio_spectral,
            audio_spectral_fixture_expected,
        )

        fx = audio_spectral_fixture_expected(spark, 16)
        j = audio_spectral(fx.select("media_id", "kind", "payload")).join(
            fx.select(
                "media_id", "exp_parse_ok", "exp_n_samples", "exp_bin",
                "exp_freq",
            ),
            "media_id",
        ).collect()
        assert len(j) == 16
        for r in j:
            assert r["parse_ok"] == r["exp_parse_ok"]
            if r["exp_parse_ok"]:
                assert r["dominant_bin"] == r["exp_bin"], r
                assert r["dominant_freq_hz"] == r["exp_freq"]

    def test_full_scale_row_clips(self, spark):
        payload = _square_wave_wav(32767, 4, 64)
        df = spark.createDataFrame(
            [(0, "audio", payload)], "media_id bigint, kind string, payload binary"
        )
        r = audio_features(df).collect()[0]
        assert r["clip_ratio"] == 1.0 and r["peak"] == 32767


class TestAudioFingerprint:
    def test_expected_fingerprints_and_volume_invariance(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            afp_expected_fingerprint,
            audio_dedup_fixture,
            audio_fingerprints,
        )

        fx = audio_dedup_fixture(spark, 8)
        got = {
            r["id"]: r["afp"] for r in audio_fingerprints(fx).collect()
        }
        assert len(got) == 16 and all(v is not None for v in got.values())
        for i in range(8):
            exp = afp_expected_fingerprint(i)
            assert got[i] == exp  # construction-time ground truth
            assert got[i + 1000] == exp  # double volume -> identical bits

    def test_cross_clip_separation_pinned(self):
        # the fixed fixture's cross-clip fingerprint distances must stay
        # far above the dedup threshold (deterministic, checked once)
        from dataqualitykit_spark.operators.multimodal import (
            afp_expected_fingerprint,
        )

        u = [afp_expected_fingerprint(i) & ((1 << 64) - 1) for i in range(24)]
        mn = min(
            bin(u[a] ^ u[b]).count("1")
            for a in range(24)
            for b in range(a + 1, 24)
        )
        assert mn > 12  # measured 20 for this fixture

    def test_dup_pairs_exactly_planted(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            audio_dedup_fixture,
            audio_dup_pairs,
        )

        fx = audio_dedup_fixture(spark, 10)
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in audio_dup_pairs(fx, max_hamming=6).collect()
        }
        assert pairs == {(i, i + 1000): 0 for i in range(10)}

    def test_undecodable_and_short_clips_null(self, spark):
        from dataqualitykit_spark.operators.multimodal import (
            audio_fingerprints,
        )

        rows = [
            (1, "audio", b"garbage bytes", "application/octet-stream",
             None, None, None),
            (2, "audio", None, None, None, None, None),
        ]
        from dataqualitykit_spark.operators.multimodal import MEDIA_SCHEMA

        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        got = {r["id"]: r["afp"] for r in audio_fingerprints(df).collect()}
        assert got == {1: None, 2: None}
