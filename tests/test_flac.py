"""FLAC codec (linref_ray.kernels.flac) — lossless round trips plus
hand-built frames for the decoder-only paths (LPC subframes, stereo
decorrelation, multi-partition Rice) the FIXED-only encoder never emits."""

import numpy as np
import pytest

from linref_ray.kernels import flac
from linref_ray.kernels.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    flac_decode,
    flac_encode,
)


def _tone(n, sr=8000, hz=440.0, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * hz * t) + 0.01 * rng.normal(size=n)
    return np.clip(x * 32767, -32768, 32767).astype(np.int16)


class TestRoundTrip:
    def test_tone_lossless(self):
        x = _tone(8000)
        dec, sr = flac_decode(flac_encode(x, 8000))
        assert sr == 8000
        assert np.array_equal(dec[:, 0], x.astype(np.int32))

    def test_noise_escape_path_lossless(self):
        rng = np.random.Generator(np.random.PCG64(9))
        x = rng.integers(-32768, 32768, 12000, dtype=np.int16)
        blob = flac_encode(x, 16000)
        dec, sr = flac_decode(blob)
        assert sr == 16000
        assert np.array_equal(dec[:, 0], x.astype(np.int32))

    def test_constant_subframe(self):
        x = np.full(5000, -123, dtype=np.int16)
        dec, _ = flac_decode(flac_encode(x, 8000))
        assert np.array_equal(dec[:, 0], x.astype(np.int32))

    def test_stereo_independent(self):
        x = _tone(4000)
        st = np.stack([x, (x // 2).astype(np.int16)], axis=1)
        dec, _ = flac_decode(flac_encode(st, 8000))
        assert np.array_equal(dec, st.astype(np.int32))

    def test_block_boundaries_and_short(self):
        rng = np.random.Generator(np.random.PCG64(3))
        for n in (1, 2, 5, 4095, 4096, 4097, 8193):
            x = rng.integers(-2000, 2000, n, dtype=np.int16)
            dec, _ = flac_decode(flac_encode(x, 8000))
            assert np.array_equal(dec[:, 0], x.astype(np.int32)), n

    def test_magic_and_streaminfo(self):
        blob = flac_encode(_tone(1000), 8000)
        assert blob[:4] == b"fLaC"
        with pytest.raises(ValueError):
            flac_decode(b"RIFFnope")


def _frame_header(w: _BitWriter, bs: int, nch_code: int) -> None:
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)   # 16-bit blocksize-1 at end
    w.write(0b0000, 4)   # rate from STREAMINFO
    w.write(nch_code, 4)
    w.write(0b100, 3)    # 16 bps
    w.write(0, 1)
    _utf8_number(w, 0)
    w.write(bs - 1, 16)
    w.align()
    w.write(_crc8(bytes(w.out)), 8)


def _streaminfo(sr: int, nch: int, total: int) -> bytes:
    import struct

    w = flac._BitWriter()
    w.write(4096, 16)
    w.write(4096, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(nch - 1, 3)
    w.write(15, 5)
    w.write(total, 36)
    body = bytes(w.out) + b"\x00" * 16
    return flac.FLAC_MAGIC + struct.pack(">BBH", 0x80, 0, len(body)) + body


class TestDecoderOnlyPaths:
    def test_lpc_subframe(self):
        # order-2 LPC with coefs [2, -1] shift 0 == FIXED order 2: a ramp
        # has zero residual under it, so expected output is closed-form
        bs = 64
        expected = np.arange(bs, dtype=np.int64) * 3 + 5
        w = _BitWriter()
        _frame_header(w, bs, nch_code=0)
        w.write(0, 1)
        w.write(0b100000 | (2 - 1), 6)  # LPC order 2
        w.write(0, 1)
        w.write(int(expected[0]) & 0xFFFF, 16)
        w.write(int(expected[1]) & 0xFFFF, 16)
        w.write(4 - 1, 4)   # precision 4 bits
        w.write(0, 5)       # shift 0
        w.write(2 & 0xF, 4)    # coef 2
        w.write(-1 & 0xF, 4)   # coef -1
        w.write(0b00, 2)
        w.write(0, 4)       # one partition
        w.write(0, 4)       # rice param 0 → each zero residual = one 1-bit
        for _ in range(bs - 2):
            w.write_unary(0)
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        blob = _streaminfo(8000, 1, bs) + bytes(w.out)
        dec, sr = flac_decode(blob)
        assert np.array_equal(dec[:, 0], expected)

    @pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
    def test_stereo_decorrelation(self, mode):
        bs = 16
        left = np.array([100 + 7 * i for i in range(bs)], dtype=np.int64)
        right = np.array([40 + 3 * i for i in range(bs)], dtype=np.int64)
        side = left - right
        code = {"left_side": 0b1000, "right_side": 0b1001,
                "mid_side": 0b1010}[mode]
        w = _BitWriter()
        _frame_header(w, bs, nch_code=code)

        def verbatim(vals, bits):
            w.write(0, 1)
            w.write(0b000001, 6)
            w.write(0, 1)
            for v in vals:
                w.write(int(v) & ((1 << bits) - 1), bits)

        if mode == "left_side":
            verbatim(left, 16)
            verbatim(side, 17)
        elif mode == "right_side":
            verbatim(side, 17)
            verbatim(right, 16)
        else:
            mid = (left + right) >> 1
            verbatim(mid, 16)
            verbatim(side, 17)
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        blob = _streaminfo(8000, 2, bs) + bytes(w.out)
        dec, _ = flac_decode(blob)
        assert np.array_equal(dec[:, 0], left), mode
        assert np.array_equal(dec[:, 1], right), mode

    def test_multi_partition_rice(self):
        bs = 32
        vals = np.arange(bs, dtype=np.int64)  # FIXED order 1, residual 1
        w = _BitWriter()
        _frame_header(w, bs, nch_code=0)
        w.write(0, 1)
        w.write(0b001000 | 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write(int(vals[0]) & 0xFFFF, 16)
        w.write(0b00, 2)
        w.write(2, 4)  # partition order 2 → 4 partitions of bs/4
        for p in range(4):
            cnt = bs // 4 - (1 if p == 0 else 0)
            w.write(1, 4)  # rice param 1; residual 1 → zigzag 2 → q=1 r=0
            for _ in range(cnt):
                w.write_unary(1)
                w.write(0, 1)
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        blob = _streaminfo(8000, 1, bs) + bytes(w.out)
        dec, _ = flac_decode(blob)
        assert np.array_equal(dec[:, 0], vals)

    def test_wasted_bits(self):
        bs = 8
        vals = np.array([v << 3 for v in range(bs)], dtype=np.int64)
        w = _BitWriter()
        _frame_header(w, bs, nch_code=0)
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(1, 1)         # wasted bits flag
        w.write_unary(2)      # k-1=2 → 3 wasted bits
        for v in vals:
            w.write(int(v) >> 3, 13)  # 16 - 3
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        blob = _streaminfo(8000, 1, bs) + bytes(w.out)
        dec, _ = flac_decode(blob)
        assert np.array_equal(dec[:, 0], vals)


class TestMediaDispatch:
    def test_decode_audio_flac(self):
        from linref_ray.media import decode_audio, encode_audio

        x = _tone(4000)
        blob = encode_audio(x, 8000, acodec="flac")
        assert blob[:4] == b"fLaC"
        s, sr = decode_audio(blob)
        assert sr == 8000 and s.dtype == np.int16
        assert np.array_equal(s, x)

    def test_mp3_still_out_of_scope(self):
        from linref_ray.media import decode_audio

        with pytest.raises(NotImplementedError, match="out of scope"):
            decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)

    def test_audio_features_over_flac(self, ray_session):
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.media import extract_audio_features

        auds = rd.from_arrow(
            synth.make_audio(6, seconds=0.25, acodec="flac")
        )
        out = extract_audio_features(auds, concurrency=2).to_pandas()
        assert len(out) == 6
        # zcr recovers each planted tone to ~1 Hz: tone = zcr * sr / 2
        tones = np.sort(out["zcr"].to_numpy() * 8000 / 2)
        assert np.allclose(tones, 100 + 50 * np.arange(6), atol=2.0)
