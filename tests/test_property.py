"""Hypothesis property tests for the interval kernels — shrinkable random
fuzzing on top of the seeded differential suite."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from linref_ray.kernels.intervals import overlay_pairs
from linref_ray.kernels.modify import dissolve_sorted, resegment_rows, separate

finite = st.floats(
    min_value=0, max_value=1000, allow_nan=False, allow_infinity=False
)


def intervals_strategy(max_n=40):
    return st.lists(
        st.tuples(finite, st.floats(min_value=0, max_value=50,
                                    allow_nan=False)),
        min_size=0,
        max_size=max_n,
    )


def to_sorted_arrays(pairs):
    if not pairs:
        return np.empty(0), np.empty(0)
    begs = np.array([b for b, _ in pairs])
    ends = begs + np.array([l for _, l in pairs])
    order = np.lexsort([ends, begs])
    return begs[order], ends[order]


class TestOverlayProperties:
    @settings(max_examples=200, deadline=None)
    @given(intervals_strategy(), intervals_strategy())
    def test_total_overlap_symmetry(self, lp, rp):
        """Σ overlap is symmetric in the two sides."""
        lb, le = to_sorted_arrays(lp)
        rb, re = to_sorted_arrays(rp)
        _, _, w1 = overlay_pairs(lb, le, rb, re, normalize=False)
        _, _, w2 = overlay_pairs(rb, re, lb, le, normalize=False)
        assert np.isclose(w1.sum(), w2.sum())

    @settings(max_examples=200, deadline=None)
    @given(intervals_strategy(), intervals_strategy(),
           st.floats(min_value=1, max_value=40, allow_nan=False))
    def test_window_partition_additivity(self, lp, rp, bucket):
        """Σ over any disjoint window partition == unsharded weights —
        the invariant the salted shuffle rests on."""
        lb, le = to_sorted_arrays(lp)
        rb, re = to_sorted_arrays(rp)
        li, ri, w = overlay_pairs(lb, le, rb, re, normalize=False)
        full = {}
        for a, b, v in zip(li, ri, w):
            full[(a, b)] = full.get((a, b), 0.0) + v
        acc = {}
        lo = 0.0
        while lo < 1100:
            wi, wj, wv = overlay_pairs(
                lb, le, rb, re, normalize=False, window=(lo, lo + bucket)
            )
            for a, b, v in zip(wi, wj, wv):
                acc[(a, b)] = acc.get((a, b), 0.0) + v
            lo += bucket
        assert set(acc) == set(full)
        for k in full:
            assert np.isclose(acc[k], full[k])

    @settings(max_examples=150, deadline=None)
    @given(intervals_strategy(), intervals_strategy())
    def test_normalized_weights_bounded(self, lp, rp):
        lb, le = to_sorted_arrays(lp)
        rb, re = to_sorted_arrays(rp)
        _, _, w = overlay_pairs(lb, le, rb, re, normalize=True, norm_by="right")
        assert (w <= 1.0 + 1e-9).all()
        assert (w >= 0.0).all()


class TestModifyProperties:
    @settings(max_examples=150, deadline=None)
    @given(intervals_strategy(max_n=30))
    def test_dissolve_conserves_coverage_bounds(self, pairs):
        if not pairs:
            return
        begs, ends = to_sorted_arrays(pairs)
        g = np.zeros(len(begs), dtype=np.int64)
        _, _, ob, oe = dissolve_sorted(g, begs, ends)
        # Output intervals nest inside the input hull, cover all input begs.
        assert ob.min() == begs.min()
        assert oe.max() >= ends.max() or np.isclose(oe.max(), ends.max())
        assert len(ob) <= len(begs)
        # Dissolve of the dissolve is a no-op (idempotence).
        order = np.lexsort([oe, ob])
        _, _, ob2, oe2 = dissolve_sorted(
            np.zeros(len(ob), dtype=np.int64), ob[order], oe[order]
        )
        assert len(ob2) == len(ob)

    @settings(max_examples=150, deadline=None)
    @given(intervals_strategy(max_n=25),
           st.sampled_from(["cut", "left", "right", "extend", "none",
                            "balance"]),
           st.floats(min_value=0.5, max_value=10, allow_nan=False))
    def test_resegment_pieces_cover_or_nest(self, pairs, fill, length):
        if not pairs:
            return
        begs, ends = to_sorted_arrays(pairs)
        src, nb, ne = resegment_rows(begs, ends, length, fill)
        assert (ne >= nb).all()
        # Every output nests in (or, for right/extend, starts within) its
        # source row.
        assert (nb >= begs[src] - 1e-9).all() or fill == "left"
        if fill in ("cut", "balance"):
            total_in = (ends - begs).sum()
            total_out = (ne - nb).sum()
            assert np.isclose(total_in, total_out)

    @settings(max_examples=150, deadline=None)
    @given(intervals_strategy(max_n=25),
           st.sampled_from(["balanced", "center", "left", "right"]))
    def test_separate_removes_overlaps(self, pairs, method):
        if len(pairs) < 2:
            return
        begs, ends = to_sorted_arrays(pairs)
        g = np.zeros(len(begs), dtype=np.int64)
        nb, ne = separate(g, begs, ends, method=method)
        keep = ne - nb > 1e-12
        b, e = nb[keep], ne[keep]
        order = np.lexsort([e, b])
        b, e = b[order], e[order]
        # No remaining pairwise overlaps beyond float tolerance.
        assert (b[1:] >= e[:-1] - 1e-9).all()
        if method in ("left", "right"):
            # Only the one-sided methods guarantee envelope containment —
            # 'center' deliberately splits at the centers midpoint, which can
            # extend an event past its original bounds (reference
            # ``modify.py:545-548`` behavior, reproduced).
            assert (nb >= begs - 1e-9).all()
            assert (ne <= ends + 1e-9).all()


class TestSegmentedCummax:
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=60
        ),
        st.integers(1, 8),
    )
    @settings(max_examples=120, deadline=None)
    def test_matches_naive_loop(self, values, n_segments):
        from linref_ray.kernels.intervals import segmented_cummax

        x = np.asarray(values)
        rng = np.random.Generator(np.random.PCG64(n_segments))
        new_seg = np.zeros(len(x), dtype=bool)
        new_seg[0] = True
        extra = rng.choice(
            len(x), size=min(n_segments, len(x)), replace=False
        )
        new_seg[extra] = True
        expected = np.empty_like(x)
        run = -np.inf
        for i in range(len(x)):
            run = x[i] if new_seg[i] else max(run, x[i])
            expected[i] = run
        got = segmented_cummax(x, new_seg)
        np.testing.assert_array_equal(got, expected)


class TestSplitMaskProperties:
    @given(
        st.lists(
            st.tuples(
                st.floats(0, 90, allow_nan=False),
                st.floats(0.1, 10, allow_nan=False),
            ),
            min_size=1,
            max_size=15,
        ),
        st.lists(st.floats(1, 99, allow_nan=False), min_size=1, max_size=6),
    )
    @settings(max_examples=60, deadline=None)
    def test_split_conserves_mileage(self, ray_session, ev_pairs, cut_xs):
        """split_events keeps every piece: total mileage and per-event
        coverage are conserved for any set of vertical line masks."""
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from linref_ray.lrs import LRS
        from linref_ray.spatial import split_events

        routes = pa.table(
            {
                "route_id": ["A"],
                "xs": pa.array([[0.0, 100.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0]], pa.list_(pa.float64())),
                "ms": pa.array([[0.0, 100.0]], pa.list_(pa.float64())),
            }
        )
        ev = pd.DataFrame(
            {
                "event_id": range(len(ev_pairs)),
                "route_id": "A",
                "beg": [b for b, _ in ev_pairs],
                "end": [min(b + l, 100.0) for b, l in ev_pairs],
            }
        )
        masks = [
            ("line", np.array([cx, cx]), np.array([-1.0, 1.0]))
            for cx in cut_xs
        ]
        out = split_events(
            rd.from_pandas(ev), routes, masks,
            LRS(key_col=("route_id",), beg_col="beg", end_col="end"),
        ).to_pandas()
        got = out.groupby("event_id").apply(
            lambda g: (g.end - g.beg).sum(), include_groups=False
        )
        for eid, b, e in zip(ev.event_id, ev.beg, ev.end):
            assert abs(got.get(eid, 0.0) - (e - b)) < 1e-9
        # pieces within each event are contiguous and ordered
        for eid, g in out.groupby("event_id"):
            assert (g.beg.values[1:] == g.end.values[:-1]).all()


class TestPrefixFilterCompleteness:
    """The exact-Jaccard candidate cascade (prefix postings + length +
    positional filters) must never lose a qualifying pair — pure-kernel
    property check, no Ray session."""

    @settings(max_examples=120, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        thr=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
        vocab=st.integers(4, 12),
        ndocs=st.integers(2, 25),
    )
    def test_candidates_superset_of_qualifying_pairs(
        self, seed, thr, vocab, ndocs
    ):
        import pyarrow as pa

        from linref_ray.dedup import _PrefixPostingsStage, _token_pairs_kernel
        from linref_ray.kernels.hashing import shingle_hashes

        rng = np.random.default_rng(seed)
        docs = [
            " ".join(
                f"w{w}" for w in rng.integers(0, vocab, rng.integers(1, 15))
            )
            for _ in range(ndocs)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(ndocs), pa.int64()),
                "text": pa.array(docs),
            }
        )
        stage = _PrefixPostingsStage(
            threshold=thr, shingle_k=3, num_partitions=1
        )
        cands = _token_pairs_kernel(stage(tbl), thr, max_bucket=10_000)
        got = set(
            zip(
                cands["id_a"].to_pylist(),
                cands["id_b"].to_pylist(),
            )
        )
        sets = [set(shingle_hashes(d, 3).tolist()) for d in docs]
        for a in range(ndocs):
            for b in range(a + 1, ndocs):
                u = sets[a] | sets[b]
                j = len(sets[a] & sets[b]) / len(u) if u else 0.0
                if j >= thr:
                    assert (a, b) in got, (seed, thr, a, b, j)


class TestPngRoundtripProperty:
    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_png_roundtrip(self, w, h, seed):
        from linref_ray.kernels import codec

        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        out, fmt = codec.decode_image(codec.png_encode(px))
        assert fmt == "png"
        np.testing.assert_array_equal(out, px)


class TestJpegRoundtripProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.booleans(),
    )
    def test_jpeg_q100_psnr_bound(self, w, h, seed, subsample):
        # quality=100 bounds round-trip error by color-convert + DCT
        # rounding on the LUMA path; chroma subsampling adds loss, so the
        # 40 dB invariant bound is asserted only for 4:4:4
        from linref_ray.kernels import codec
        from linref_ray.kernels.jpeg import jpeg_decode, jpeg_encode

        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        dec = jpeg_decode(jpeg_encode(px, quality=100, subsample=subsample))
        assert dec.shape == px.shape
        if not subsample:
            assert codec.psnr(px, dec) >= 40.0

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=6),
    )
    def test_jpeg_restart_intervals(self, seed, rst):
        from linref_ray.kernels import codec
        from linref_ray.kernels.jpeg import jpeg_decode, jpeg_encode

        px = np.random.default_rng(seed).integers(
            0, 256, (24, 24, 3), dtype=np.uint8
        )
        dec = jpeg_decode(
            jpeg_encode(px, quality=100, restart_interval=rst)
        )
        assert codec.psnr(px, dec) >= 40.0


class TestFlacRoundtripProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=10000),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from([16, 64, 4096]),
        st.sampled_from(["noise", "tone", "ramp", "const"]),
    )
    def test_flac_lossless(self, n, seed, block_size, shape):
        from linref_ray.kernels.flac import flac_decode, flac_encode

        rng = np.random.default_rng(seed)
        if shape == "noise":
            x = rng.integers(-32768, 32768, n, dtype=np.int16)
        elif shape == "tone":
            t = np.arange(n)
            x = (10000 * np.sin(t * 0.05)).astype(np.int16)
        elif shape == "ramp":
            x = (np.arange(n) % 65536 - 32768).astype(np.int16)
        else:
            x = np.full(n, int(rng.integers(-32768, 32768)), dtype=np.int16)
        dec, sr = flac_decode(flac_encode(x, 8000, block_size=block_size))
        assert sr == 8000
        np.testing.assert_array_equal(dec[:, 0], x.astype(np.int32))


class TestCodecCorruptionRobustness:
    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_jpeg_decode_never_hangs_on_corruption(self, seed, mutseed):
        # a decode stage over untrusted bytes must terminate with a clean
        # result or a Python exception on ANY corruption
        from linref_ray.kernels.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(seed)
        blob = bytearray(
            jpeg_encode(
                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                quality=100,
            )
        )
        mrng = np.random.default_rng(mutseed)
        for _ in range(int(mrng.integers(1, 8))):
            blob[int(mrng.integers(2, len(blob)))] = int(
                mrng.integers(0, 256)
            )
        try:
            out = jpeg_decode(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 3
        except Exception:
            pass  # clean rejection is fine; hanging / native crash is not

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_flac_decode_never_hangs_on_corruption(self, seed, mutseed):
        from linref_ray.kernels.flac import flac_decode, flac_encode

        rng = np.random.default_rng(seed)
        blob = bytearray(
            flac_encode(
                rng.integers(-5000, 5000, 2000, dtype=np.int16), 8000
            )
        )
        mrng = np.random.default_rng(mutseed)
        for _ in range(int(mrng.integers(1, 8))):
            blob[int(mrng.integers(4, len(blob)))] = int(
                mrng.integers(0, 256)
            )
        try:
            out, sr = flac_decode(bytes(blob))
            assert out.ndim == 2
        except Exception:
            pass
