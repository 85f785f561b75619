"""Tests for profiles, decay, distribute, cells, codec, hashing kernels."""

import numpy as np
import pytest

from linref_ray.kernels import codec
from linref_ray.kernels.cells import (
    cell_of_points,
    cell_size,
    cover_bbox,
    grid_of_points,
)
from linref_ray.kernels.decay import resolve_decay
from linref_ray.kernels.distribute import distribute_group
from linref_ray.kernels.hashing import (
    hamming64,
    lsh_bands,
    minhash_params,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash,
)
from linref_ray.kernels.profile import PROFILE_REGISTRY, resolve_profile


class TestProfiles:
    @pytest.mark.parametrize("name", list(PROFILE_REGISTRY))
    def test_total_integral_is_one(self, name):
        p = resolve_profile(name)
        assert p.integral(0.0, 1.0) == pytest.approx(1.0)

    @pytest.mark.parametrize("name", list(PROFILE_REGISTRY))
    def test_symmetric_halves(self, name):
        p = resolve_profile(name)
        assert p.integral(0.0, 0.5) == pytest.approx(p.integral(0.5, 1.0))

    def test_triangular_quarters(self):
        p = resolve_profile("triangular")
        assert p.integral(0.0, 0.25) == pytest.approx(0.125)
        assert p.integral(0.25, 0.5) == pytest.approx(0.375)

    def test_additivity(self):
        for name in PROFILE_REGISTRY:
            p = resolve_profile(name)
            total = p.integral(0.1, 0.9)
            parts = p.integral(0.1, 0.4) + p.integral(0.4, 0.9)
            assert parts == pytest.approx(total)


class TestDecay:
    def test_zero_distance_is_one(self):
        for name in ("linear", "exponential", "gaussian", "flat"):
            assert resolve_decay(name, 3)(0) == 1.0

    def test_linear_values(self):
        f = resolve_decay("linear", 3)
        assert f(1) == pytest.approx(0.75)
        assert f(3) == pytest.approx(0.25)

    def test_flat(self):
        f = resolve_decay("flat", 2)
        assert f(2) == 1.0


class TestDistribute:
    def test_no_decay_is_normalized_count(self):
        # 3 targets, 2 sources each matching one target.
        ti = np.array([0, 2])
        si = np.array([0, 1])
        w = np.array([1.0, 1.0])
        out = distribute_group(
            ti, si, w, 3, 2, np.ones(2), target_lengths=np.ones(3),
            decay_size=0,
        )
        np.testing.assert_allclose(out.ravel(), [1.0, 0.0, 1.0])

    def test_conservation(self):
        """Σ distributed == Σ source data (the HIN invariant,
        reference ``tests/test_integration.py:333-369``)."""
        rng = np.random.default_rng(0)
        n, m = 20, 7
        ti = rng.integers(0, n, 15)
        si = rng.integers(0, m, 15)
        w = rng.random(15)
        data = rng.random(m)
        lengths = rng.random(n) + 0.5
        for decay in ("linear", "gaussian", "flat"):
            out = distribute_group(
                ti, si, w, n, m, data, target_lengths=lengths,
                decay_size=2, decay_func=decay,
            )
            # Sources with at least one pair entry distribute fully.
            active = np.zeros(m, dtype=bool)
            active[si] = True
            assert out.sum() == pytest.approx(data[active].sum())

    def test_forward_direction(self):
        ti = np.array([2])
        si = np.array([0])
        w = np.array([1.0])
        out = distribute_group(
            ti, si, w, 5, 1, np.ones(1), target_lengths=np.ones(5),
            decay_size=1, decay_func="linear", direction="forward",
        )
        # 'forward': row i receives arr[i+step] → row 1 gets the shifted
        # share (reference relate.py:1476 row-offset convention).
        assert out[1, 0] > 0
        assert out[3, 0] == 0

    def test_length_normalize_favors_long(self):
        ti = np.array([0])
        si = np.array([0])
        w = np.array([1.0])
        out = distribute_group(
            ti, si, w, 2, 1, np.ones(1), target_lengths=np.array([1.0, 9.0]),
            decay_size=1, decay_func="flat",
        )
        assert out[1, 0] > out[0, 0]


class TestCells:
    def test_point_cell_stable(self):
        c1 = cell_of_points(np.array([1.0]), np.array([2.0]), 8)
        c2 = cell_of_points(np.array([1.0]), np.array([2.0]), 8)
        assert c1[0] == c2[0]

    def test_distinct_cells(self):
        g = cell_size(8)
        c = cell_of_points(np.array([0.0, g * 1.5]), np.array([0.0, 0.0]), 8)
        assert c[0] != c[1]

    def test_negative_coords(self):
        c = cell_of_points(np.array([-5.0, 5.0]), np.array([-5.0, 5.0]), 8)
        assert c[0] != c[1]

    def test_cover_contains_point_cell(self):
        rows, cells = cover_bbox(
            np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([3.0]),
            8, pad=0.5,
        )
        pc = cell_of_points(np.array([7.0]), np.array([2.0]), 8)[0]
        assert pc in set(cells.tolist())
        assert set(rows.tolist()) == {0}

    def test_grid_matches_floor(self):
        ix, iy = grid_of_points(np.array([-0.1, 3.9]), np.array([4.1, -7.2]), 10)
        g = cell_size(10)
        assert ix.tolist() == [int(np.floor(-0.1 / g)), int(np.floor(3.9 / g))]


class TestCodec:
    def test_raw_roundtrip(self):
        px = codec.reference_pixels("img-1", 8, 6)
        data = codec.encode_image(px, "raw")
        out, fmt = codec.decode_image(data)
        assert fmt == "raw"
        np.testing.assert_array_equal(out, px)
        assert codec.psnr(out, px) == np.inf

    def test_qz_lossy_psnr_above_40(self):
        px = codec.reference_pixels("img-2", 16, 16)
        out, fmt = codec.decode_image(codec.encode_image(px, "qz"))
        assert fmt == "qz"
        p = codec.psnr(out, px)
        assert 40.0 <= p < np.inf

    def test_psnr_batch(self):
        a = codec.reference_pixels("a", 4, 4).ravel()
        b = codec.reference_pixels("b", 4, 4).ravel()
        flat_a = np.concatenate([a, a])
        flat_b = np.concatenate([a, b])
        out = codec.psnr_batch(flat_a, flat_b, np.array([a.size, b.size]))
        assert out[0] == np.inf
        assert out[1] < 30

    def test_jpeg_format_round_trips(self):
        # round 5: JPEG is real (pure-spec baseline codec, q=100) — the
        # dispatch encodes/decodes through linref_ray.kernels.jpeg
        px = codec.reference_pixels("x", 16, 16)
        blob = codec.encode_image(px, "jpeg")
        assert blob[:2] == b"\xff\xd8"
        dec, fmt = codec.decode_image(blob)
        assert fmt == "jpeg"
        assert codec.psnr(px, dec) >= 40.0


class TestHashing:
    def test_minhash_similarity_ordering(self):
        a, b = minhash_params(64)
        t1 = "the quick brown fox jumps over the lazy dog again and again"
        t2 = "the quick brown fox jumps over the lazy cat again and again"
        t3 = "completely different text about ray data pipelines at scale"
        s1 = minhash_signature(shingle_hashes(t1, 3), a, b)
        s2 = minhash_signature(shingle_hashes(t2, 3), a, b)
        s3 = minhash_signature(shingle_hashes(t3, 3), a, b)
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > sim13

    def test_lsh_band_match_for_identical(self):
        a, b = minhash_params(64)
        s = minhash_signature(shingle_hashes("hello world " * 5, 3), a, b)
        assert (lsh_bands(s, 8) == lsh_bands(s.copy(), 8)).all()

    def test_simhash_near_vs_far(self):
        h1 = simhash("the quick brown fox jumps over the lazy dog")
        h2 = simhash("the quick brown fox jumps over the lazy dogs")
        h3 = simhash("zzz completely unrelated content 12345")
        assert hamming64(np.array([h1]), np.array([h2]))[0] < hamming64(
            np.array([h1]), np.array([h3])
        )[0]

    def test_batched_kernels_bit_identical_to_scalar(self):
        """shingle_hashes_many / minhash_signature_many / lsh_bands_many must
        reproduce the scalar kernels bit-for-bit, including the degenerate
        docs (empty string, fewer words than k, duplicate shingles)."""
        from linref_ray.kernels.hashing import (
            lsh_bands_many,
            minhash_signature_many,
            shingle_hashes_many,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "",
            "one two",
            "repeat repeat repeat repeat repeat repeat repeat",
            "zzz completely unrelated content 12345 " * 20,
            "Unicode héllo wörld ünïcode test words here",
        ]
        k = 3
        all_h, lens = shingle_hashes_many(texts, k)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        a, b = minhash_params(64)
        sigs = minhash_signature_many(all_h, lens, a, b)
        keys = lsh_bands_many(sigs, 16)
        for i, t in enumerate(texts):
            ref = shingle_hashes(t, k)
            got = all_h[starts[i] : starts[i] + lens[i]]
            assert (got == ref).all(), f"shingles differ for doc {i}"
            sref = minhash_signature(ref, a, b)
            assert (sigs[i] == sref).all(), f"signature differs for doc {i}"
            assert (keys[i] == lsh_bands(sref, 16)).all(), f"bands doc {i}"

    def test_shingle_matrix_mode_consistent_with_csr(self):
        """return_matrix=True must give the SAME flat/lens as the plain
        call, plus a matrix whose row i is exactly that doc's sorted-unique
        hashes followed by sentinels."""
        from linref_ray.kernels.hashing import shingle_hashes_many

        texts = [
            "repeat repeat repeat words repeat",   # duplicate shingles
            "one two three four five six seven",
            "",
        ]
        f1, l1 = shingle_hashes_many(texts, 3)
        f2, l2, mat = shingle_hashes_many(texts, 3, return_matrix=True)
        assert (l1 == l2).all() and (f1 == f2).all()
        sent = np.uint64(0xFFFFFFFFFFFFFFFF)
        offs = np.concatenate(([0], np.cumsum(l2)))
        for i in range(len(texts)):
            row = mat[i]
            assert (row[: l2[i]] == f2[offs[i] : offs[i + 1]]).all()
            assert (row[l2[i] :] == sent).all()

    def test_shingle_matrix_cap_fallback_identical(self, monkeypatch):
        """Above the padded-matrix cell cap the kernel must switch to the
        O(total) lexsort path with identical flat/lens (and mat=None)."""
        from linref_ray.kernels import hashing as H

        texts = [
            "many words " * 30,
            "tiny doc",
            "other content entirely here now " * 10,
        ]
        f1, l1, m1 = H.shingle_hashes_many(texts, 3, return_matrix=True)
        assert m1 is not None
        monkeypatch.setattr(H, "_MATRIX_CELL_CAP", 8)
        f2, l2, m2 = H.shingle_hashes_many(texts, 3, return_matrix=True)
        assert m2 is None
        assert (l1 == l2).all() and (f1 == f2).all()

    def test_simhash_many_bit_identical_to_scalar(self):
        from linref_ray.kernels.hashing import simhash_many

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dogs",
            "zzz completely unrelated content 12345",
            "",  # padded len 2 < ngram → scalar path
            "这是中文内容测试",  # non-ASCII → scalar path
            "MiXeD Case With  multiple   spaces",
        ]
        got = simhash_many(texts, 3)
        for i, t in enumerate(texts):
            assert got[i] == simhash(t, 3), f"doc {i}"
        # NUL anywhere forces the all-scalar path — still identical
        withnul = ["plain text", "has\x00nul"]
        got2 = simhash_many(withnul, 3)
        assert got2[0] == simhash(withnul[0], 3)
        assert got2[1] == simhash(withnul[1], 3)

    def test_simhash_many_chunked_identical(self, monkeypatch):
        """A tiny gram cap forces multiple doc chunks (and a
        bigger-than-cap single doc its own chunk) — still bit-identical."""
        from linref_ray.kernels import hashing as H

        texts = [f"doc {i} content words here vary {i}" for i in range(7)]
        texts.append("long " * 300)
        ref = [simhash(t, 3) for t in texts]
        monkeypatch.setattr(H, "_SIMHASH_GRAM_CAP", 16)
        got = H.simhash_many(texts, 3)
        assert [int(g) for g in got] == [int(r) for r in ref]

    def test_rolling_fingerprints_many_bit_identical(self):
        from linref_ray.kernels.hashing import rolling_fingerprints_many

        texts = [
            "shared content block that is long enough to fingerprint " * 3,
            "tiny",  # shorter than window → zero-padded scalar path
            "",
            "another document with different words entirely " * 2,
            "has\x00nul embedded somewhere in this longer text " * 2,
        ]
        flat, lens = rolling_fingerprints_many(texts, window=16, keep_mod=8)
        offs = np.concatenate(([0], np.cumsum(lens)))
        for i, t in enumerate(texts):
            ref = rolling_fingerprint(t, window=16, keep_mod=8).astype(
                np.int64
            )
            got = flat[offs[i] : offs[i + 1]]
            assert (got == ref).all(), f"doc {i}"

    def test_language_id_vectorized_matches_scalar(self, ray_session):
        """The ASCII fast path must agree with the regex scalar path on
        every doc; non-ASCII docs (zh, accented) route through the scalar
        path inside the same batch."""
        import pyarrow as pa
        import ray.data as rdata

        from linref_ray.text import language_id

        texts = [
            "the and of that with for the and of",        # en
            "der die das und nicht mit der die",          # de
            "le la les et dans pour le la",               # fr
            "el los las es en por para el",               # es
            "这是一个完全使用中文书写的文档内容",            # zh (scalar)
            "für die straße über münchen und der zug",    # non-ASCII de
            "",                                           # empty
            "xyzzy qwerty 12345 %%%",                     # no markers → en 0.0
        ]
        docs = rdata.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        out = (
            language_id(docs).to_pandas().set_index("doc_id").sort_index()
        )
        assert out.lang_pred.tolist() == [
            "en", "de", "fr", "es", "zh", "de", "en", "en",
        ]
        assert out.confidence[4] == 1.0
        assert out.confidence[7] == 0.0
        # fast-path scores equal hand-computed marker ratios
        assert out.confidence[0] == pytest.approx(9 / 9)
        assert out.confidence[1] == pytest.approx(8 / 8)

    def test_quality_features_vectorized_matches_scalar(self):
        """The batch codepoint kernel must match a straightforward per-doc
        computation of the same ASCII-class spec on every edge case."""
        import re

        from linref_ray.text import _STOPWORDS, _quality_features

        texts = [
            "The quick brown Fox, JUMPED over 2 lazy dogs!!",
            "",
            "    ",
            "12345 _under_ %%%",
            "the the the and and of",
            "word " * 50 + "unique",
            "Tabs\tand\nnewlines\r\nhere",
        ]
        feats = _quality_features(texts)
        word_re = re.compile(r"[A-Za-z]+")
        punct_re = re.compile(r"[^0-9A-Za-z_ \t\n\r\f\v]")
        upper_re = re.compile(r"[A-Z]")
        for i, s in enumerate(texts):
            words = word_re.findall(s)
            nw = max(len(words), 1)
            assert feats["n_chars"][i] == len(s)
            exp_mean = sum(map(len, words)) / nw if words else 0.0
            assert feats["mean_word_len"][i] == pytest.approx(exp_mean)
            assert feats["punct_ratio"][i] == pytest.approx(
                len(punct_re.findall(s)) / max(len(s), 1)
            )
            assert feats["upper_ratio"][i] == pytest.approx(
                len(upper_re.findall(s)) / max(len(s), 1)
            )
            assert feats["stop_ratio"][i] == pytest.approx(
                sum(w.lower() in set(_STOPWORDS) for w in words) / nw
            )
            assert feats["rep_ratio"][i] == pytest.approx(
                1.0 - len(set(words)) / nw
            )
        # NUL-containing batch falls back (returns None)
        assert _quality_features(["a\x00b"]) is None
        # lone surrogates cannot encode to utf-32 → scalar fallback
        assert _quality_features(["bad \ud800 char"]) is None

    def test_rolling_fingerprint_overlap_for_shared_content(self):
        base = "shared content block that is long enough to fingerprint " * 4
        f1 = rolling_fingerprint(base + " suffix one")
        f2 = rolling_fingerprint("prefix two " + base)
        assert len(np.intersect1d(f1, f2)) > 0


class TestBpeTokens:
    def test_counts_match_re(self, ray_session):
        import re

        import pandas as pd
        import ray.data as rd

        from linref_ray.text import BPE_ISH_PATTERN, bpe_token_counts

        texts = [
            "Hello, world! 42 times.",
            "  spaces   and\ttabs\nnewlines  ",
            "",
            "unicode naïve café — ok?",
        ]
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        out = (
            bpe_token_counts(docs).to_pandas().sort_values("doc_id")
        )
        pat = re.compile(BPE_ISH_PATTERN)
        assert out.n_bpe_tokens.tolist() == [
            len(pat.findall(s)) for s in texts
        ]


class TestFnvVectorized:
    def test_bit_identical_to_scalar_fnv1a(self):
        import random
        import string

        from linref_ray.kernels.hashing import _hash_tokens_u64

        def scalar(tokens):
            out = np.empty(len(tokens), dtype=np.uint64)
            for i, t in enumerate(tokens):
                h = 0xCBF29CE484222325
                for b in t.encode("utf-8", "ignore"):
                    h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                out[i] = h
            return out

        random.seed(3)
        toks = ["", "a", "héllo", "中文字"] + [
            "".join(random.choices(string.printable, k=random.randint(1, 25)))
            for _ in range(300)
        ]
        np.testing.assert_array_equal(_hash_tokens_u64(toks), scalar(toks))
        assert len(_hash_tokens_u64([])) == 0


class TestPngCodec:
    def test_roundtrip_rgb(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
        data = codec.png_encode(px)
        assert data[:8] == codec._PNG_MAGIC
        out, fmt = codec.decode_image(data)
        assert fmt == "png"
        np.testing.assert_array_equal(out, px)

    def test_all_filter_types_against_reference(self):
        # Hand-build a PNG whose rows use every filter type and check the
        # decoder against a straight-line pure-python reconstruction.
        import struct
        import zlib

        rng = np.random.default_rng(9)
        h, w, nch = 5, 7, 3
        px = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
        flat = px.reshape(h, w * nch).astype(np.int64)
        stride = w * nch
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int64)
        for r, ft in enumerate([0, 1, 2, 3, 4]):
            cur = flat[r]
            if ft == 0:
                enc = cur.copy()
            elif ft == 1:
                enc = cur - np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            elif ft == 2:
                enc = cur - prev
            elif ft == 3:
                enc = np.array([
                    cur[i] - (((cur[i - nch] if i >= nch else 0) + prev[i]) >> 1)
                    for i in range(stride)
                ])
            else:
                def paeth(a, b, c):
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        return a
                    if pb <= pc:
                        return b
                    return c
                enc = np.array([
                    cur[i] - paeth(
                        cur[i - nch] if i >= nch else 0,
                        prev[i],
                        prev[i - nch] if i >= nch else 0,
                    )
                    for i in range(stride)
                ])
            raw.append(ft)
            raw.extend((enc & 255).astype(np.uint8).tobytes())
            prev = cur

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        data = (codec._PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        out = codec.png_decode(data)
        np.testing.assert_array_equal(out, px)

    def test_rgba_and_grey(self):
        import struct
        import zlib

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        rng = np.random.default_rng(2)
        # RGBA: alpha dropped
        px4 = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
        raw = bytearray()
        for r in range(4):
            raw.append(0)
            raw.extend(px4[r].tobytes())
        data = (codec._PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 6, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        np.testing.assert_array_equal(codec.png_decode(data), px4[:, :, :3])
        # greyscale: broadcast to RGB
        g = rng.integers(0, 256, (3, 5, 1), dtype=np.uint8)
        raw = bytearray()
        for r in range(3):
            raw.append(0)
            raw.extend(g[r].tobytes())
        data = (codec._PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        np.testing.assert_array_equal(
            codec.png_decode(data), np.repeat(g, 3, axis=2)
        )

    def test_unsupported_shapes_raise(self):
        import pytest as _pytest

        # JPEG magic now dispatches to the real decoder, which rejects a
        # garbage body as a malformed stream (round 5)
        with _pytest.raises(ValueError):
            codec.decode_image(b"\xff\xd8rest-of-jpeg")
        with _pytest.raises(ValueError):
            codec.png_decode(b"not a png at all")


class TestBatchedPerceptualHashes:
    def test_bit_parity_with_scalar(self):
        from linref_ray.kernels.phash import (
            ahash64, ahash64_batch, phash64, phash64_batch,
        )

        rng = np.random.default_rng(21)
        for h, w in ((16, 16), (9, 13), (40, 24), (7, 5)):
            g = rng.uniform(0, 255, (40, h, w)).astype(np.float32)
            assert (
                ahash64_batch(g)
                == np.array([ahash64(x) for x in g], np.uint64)
            ).all()
            assert (
                phash64_batch(g)
                == np.array([phash64(x) for x in g], np.uint64)
            ).all()
