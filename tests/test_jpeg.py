"""Baseline JPEG codec (linref_ray.kernels.jpeg) — pure-spec round trips.

No external decoder exists in this container, so internal consistency is
validated structurally (marker layout a third-party parser would accept)
plus round-trip PSNR bounds that only hold if DCT/quant/Huffman agree with
the T.81 semantics on both sides.
"""

import numpy as np
import pyarrow as pa
import pytest

from linref_ray.kernels import codec, jpeg


def _noise(h, w, ch=3, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    shape = (h, w, ch) if ch else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _smooth(h, w):
    gy, gx = np.mgrid[0:h, 0:w]
    return np.stack(
        [gy * 4 % 256, gx * 3 % 256, (gy + gx) * 2 % 256], -1
    ).astype(np.uint8)


class TestRoundTrip:
    def test_noise_q100_444_over_40db(self):
        px = _noise(16, 16)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=100))
        assert dec.shape == px.shape
        assert codec.psnr(px, dec) >= 40.0

    def test_smooth_q85(self):
        px = _smooth(32, 48)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=85))
        assert codec.psnr(px, dec) >= 30.0

    def test_quality_monotone(self):
        px = _smooth(24, 24)
        psnrs = [
            codec.psnr(px, jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=q)))
            for q in (50, 85, 100)
        ]
        assert psnrs[0] <= psnrs[1] <= psnrs[2]

    def test_subsample_420(self):
        px = _smooth(32, 32)
        dec = jpeg.jpeg_decode(
            jpeg.jpeg_encode(px, quality=95, subsample=True)
        )
        assert dec.shape == px.shape
        assert codec.psnr(px, dec) >= 30.0

    def test_odd_dimensions(self):
        for shape in ((17, 13), (8, 9), (1, 1), (7, 23)):
            px = _noise(*shape, seed=shape[0] * 100 + shape[1])
            for sub in (False, True):
                dec = jpeg.jpeg_decode(
                    jpeg.jpeg_encode(px, quality=100, subsample=sub)
                )
                assert dec.shape == px.shape, (shape, sub)
        assert codec.psnr(px, jpeg.jpeg_decode(
            jpeg.jpeg_encode(px, quality=100))) >= 40.0

    def test_grayscale(self):
        g = _noise(16, 16, ch=0)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(g, quality=100))
        assert dec.shape == (16, 16, 3)
        assert codec.psnr(np.repeat(g[:, :, None], 3, 2), dec) >= 40.0

    def test_restart_interval(self):
        px = _noise(32, 32, seed=3)
        blob = jpeg.jpeg_encode(px, quality=100, restart_interval=2)
        assert b"\xff\xdd" in blob  # DRI marker present
        assert any(
            bytes([0xFF, 0xD0 + i]) in blob for i in range(8)
        )  # at least one RSTn
        assert codec.psnr(px, jpeg.jpeg_decode(blob)) >= 40.0


class TestStructure:
    def test_marker_layout(self):
        blob = jpeg.jpeg_encode(_noise(16, 16), quality=90)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in blob

    def test_sof_dimensions(self):
        blob = jpeg.jpeg_encode(_noise(13, 37), quality=90)
        i = blob.index(b"\xff\xc0")
        h = int.from_bytes(blob[i + 5 : i + 7], "big")
        w = int.from_bytes(blob[i + 7 : i + 9], "big")
        assert (h, w) == (13, 37)

    def test_byte_stuffing_no_stray_markers(self):
        # after SOS, only FF00 / RSTn / EOI may follow an FF byte
        blob = jpeg.jpeg_encode(_noise(32, 32, seed=11), quality=100)
        sos = blob.index(b"\xff\xda")
        scan = blob[sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big"):]
        j = 0
        while j < len(scan) - 1:
            if scan[j] == 0xFF:
                nxt = scan[j + 1]
                assert nxt == 0x00 or 0xD0 <= nxt <= 0xD9
                j += 2
            else:
                j += 1

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(b"\x00\x01\x02\x03")
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan

    def test_decode_rejects_progressive(self):
        blob = bytearray(jpeg.jpeg_encode(_noise(8, 8), quality=90))
        i = blob.index(b"\xff\xc0")
        blob[i + 1] = 0xC2  # rewrite SOF0 → SOF2
        with pytest.raises(NotImplementedError):
            jpeg.jpeg_decode(bytes(blob))

    def test_truncated_stream_raises(self):
        blob = jpeg.jpeg_encode(_noise(16, 16), quality=100)
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(blob[: len(blob) // 2])


class TestDispatch:
    def test_codec_roundtrip_via_dispatch(self):
        px = _noise(16, 16, seed=21)
        blob = codec.encode_image(px, fmt="jpeg")
        dec, fmt = codec.decode_image(blob)
        assert fmt == "jpeg"
        assert codec.psnr(px, dec) >= 40.0

    def test_verify_invariants_jpeg_rows(self, ray_session):
        import ray.data as rd

        from linref_ray.images import verify_invariants
        from linref_ray.synth import make_images_jpeg

        images = rd.from_arrow(make_images_jpeg(24))
        out = verify_invariants(images).to_pandas()
        assert len(out) == 24
        assert out["invariant_ok"].all()
        assert (out["psnr_db"] >= 40.0).all()
        assert (out["fmt"] == "jpeg").all()

    def test_flagship_pipeline_format_agnostic(self, ray_session):
        # the SAME image ids as a raw/qz corpus but with real JPEG bytes
        # must produce identical per-event counts and tiles: geocoding is
        # a pure function of image_id, and every jpeg row passes the
        # decoded-pixel invariant
        import pandas.testing as pdt
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.images import image_pipeline

        routes = synth.make_routes(8, seed=42)
        events = rd.from_arrow(synth.make_events(routes, density=0.08))
        kw = dict(buffer=6.0, cell_res=6, num_partitions=8,
                  snap_concurrency=2)
        pe_a, ti_a, _ = image_pipeline(
            rd.from_arrow(synth.make_images(120)), routes, events, **kw
        )
        pe_b, ti_b, _ = image_pipeline(
            rd.from_arrow(
                synth.make_images_jpeg(120, seed_prefix="img")
            ),
            routes, events, **kw,
        )
        a = pe_a.to_pandas().sort_values("event_id").reset_index(drop=True)
        b = pe_b.to_pandas().sort_values("event_id").reset_index(drop=True)
        pdt.assert_frame_equal(a, b[a.columns], check_dtype=False)
        ta = ti_a.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        tb = ti_b.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        pdt.assert_frame_equal(ta, tb[ta.columns], check_dtype=False)

    def test_stream_corpus_partitioning_independent(self, ray_session):
        # make_images_jpeg_stream content must be a pure function of row
        # index — identical bytes at any block count (the resume contract)
        from linref_ray import synth

        a = (
            synth.make_images_jpeg_stream(60, num_blocks=2, wrong_pixel_mod=100)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        b = (
            synth.make_images_jpeg_stream(60, num_blocks=7, wrong_pixel_mod=100)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert (a["image_id"] == b["image_id"]).all()
        assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
        driver = (
            synth.make_images_jpeg(60, wrong_pixel_mod=100)
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert all(x == y for x, y in zip(a["bytes"], driver["bytes"]))

    def test_undecodable_rows_flagged_not_fatal(self, ray_session):
        # truncated JPEG / garbage bytes must flag the row, not kill the
        # job — the realistic corruption mode of a web-scale crawl
        import pyarrow as pa
        import ray.data as rd

        from linref_ray.images import verify_invariants
        from linref_ray.synth import make_images_jpeg

        base = make_images_jpeg(30)
        blobs = base["bytes"].to_pylist()
        blobs[3] = blobs[3][: len(blobs[3]) // 2]   # truncated JPEG
        blobs[17] = b"\x00garbage-not-an-image"     # no known magic
        bad = base.set_column(
            base.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, pa.binary()),
        )
        out = (
            verify_invariants(rd.from_arrow(bad))
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert len(out) == 30
        flagged = set(out.index[~out["invariant_ok"]])
        assert flagged == {3, 17}
        assert np.isneginf(out.loc[3, "psnr_db"])
        # strict mode still raises with the offending ids
        import pytest as _pytest

        with _pytest.raises(Exception, match="invariant violated"):
            verify_invariants(rd.from_arrow(bad), strict=True).to_pandas()

    def test_resize_features_signatures_skip(self, ray_session):
        # undecodable rows drop out of resize / feature / signature stages
        # under on_error='skip' instead of killing the job
        import pyarrow as pa
        import ray.data as rd

        from linref_ray.images import (
            extract_features,
            image_signatures,
            resize_images,
        )
        from linref_ray.synth import make_images_jpeg

        base = make_images_jpeg(12)
        blobs = base["bytes"].to_pylist()
        blobs[5] = b"\x00not-an-image"
        bad = rd.from_arrow(
            base.set_column(
                base.schema.get_field_index("bytes"), "bytes",
                pa.array(blobs, pa.binary()),
            )
        )
        bad_id = base["image_id"][5].as_py()
        r = resize_images(bad, 8, 8, on_error="skip").to_pandas()
        assert len(r) == 11 and bad_id not in set(r["image_id"])
        f = extract_features(bad, on_error="skip").to_pandas()
        assert len(f) == 11 and bad_id not in set(f["image_id"])
        s = image_signatures(bad, on_error="skip").to_pandas()
        assert len(s) == 11 and bad_id not in set(s["image_id"])
        # default stays fail-fast
        import pytest as _pytest

        with _pytest.raises(Exception):
            resize_images(bad, 8, 8).to_pandas()
