"""Spatial layer + flagship image pipeline tests."""

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import synth
from linref_ray.images import geotag, image_pipeline, verify_invariants
from linref_ray.kernels.geometry import project_point_to_polyline
from linref_ray.lrs import LRS
from linref_ray.spatial import (
    RouteIndex,
    build_route_index,
    cluster_events,
    intersection_pairs,
    snap_points,
    tile_histogram,
)


@pytest.fixture(scope="module")
def routes():
    return synth.make_routes(12, seed=42)


class TestSynth:
    def test_routes_deterministic(self, routes):
        again = synth.make_routes(12, seed=42)
        assert routes.equals(again)
        assert len(routes) == 12
        ms = routes["ms"].to_pylist()
        for m in ms:
            assert all(b >= a for a, b in zip(m, m[1:]))

    def test_mega_route_skew(self, routes):
        lens = routes["len_m"].to_pylist()
        assert lens[0] > 5 * np.median(lens)

    def test_images_schema(self):
        t = synth.make_images(10)
        assert t.schema.names == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        ]
        assert t["bytes"].type == pa.binary()
        assert t["phash"].type == pa.int64()


class TestSnap:
    def test_exact_on_route_points(self, ray_session, routes):
        # Take known positions exactly on route polylines → snap_dist ~ 0 and
        # loc equals the M at that position.
        xs = routes["xs"].to_pylist()
        ys = routes["ys"].to_pylist()
        ms = routes["ms"].to_pylist()
        pts, exp_route, exp_m = [], [], []
        for i in (1, 3, 7):
            x, y, m = map(np.asarray, (xs[i], ys[i], ms[i]))
            pts.append((x[1], y[1]))
            exp_route.append(routes["route_id"][i].as_py())
            exp_m.append(m[1])
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "pid": range(3),
                    "x": [p[0] for p in pts],
                    "y": [p[1] for p in pts],
                }
            )
        )
        ref = build_route_index(routes, res=6, pad=10.0)
        out = (
            snap_points(ds, ref, buffer=10.0, concurrency=1)
            .to_pandas()
            .sort_values("pid")
        )
        assert len(out) == 3
        # Points lie exactly on a polyline → zero snap distance; M matches
        # the vertex M whenever the point's own route wins the tie.
        assert (out.snap_dist <= 1e-9).all()
        for i in range(3):
            if out.route_id.iloc[i] == exp_route[i]:
                assert out["loc"].iloc[i] == pytest.approx(exp_m[i])

    def test_buffer_filters(self, ray_session, routes):
        ds = rd.from_pandas(
            pd.DataFrame({"pid": [0], "x": [1e6], "y": [1e6]})
        )
        ref = build_route_index(routes, res=6, pad=3.0)
        out = snap_points(ds, ref, buffer=3.0, concurrency=1).to_pandas()
        assert len(out) == 0

    def test_matches_brute_force(self, ray_session, routes):
        rng = np.random.default_rng(5)
        xs = routes["xs"].to_pylist()
        ys = routes["ys"].to_pylist()
        ms = routes["ms"].to_pylist()
        n = 40
        # Scatter near route vertices to guarantee in-buffer points.
        ridx = rng.integers(0, len(xs), n)
        px = np.array([xs[r][1] for r in ridx]) + rng.normal(0, 1.0, n)
        py = np.array([ys[r][1] for r in ridx]) + rng.normal(0, 1.0, n)
        ds = rd.from_pandas(pd.DataFrame({"pid": range(n), "x": px, "y": py}))
        ref = build_route_index(routes, res=6, pad=6.0)
        out = (
            snap_points(ds, ref, buffer=6.0, concurrency=2)
            .to_pandas()
            .set_index("pid")
        )
        for pid in out.index:
            # Brute force over all routes.
            best = (np.inf, None, np.nan)
            for i in range(len(xs)):
                m, d = project_point_to_polyline(
                    np.asarray(xs[i]), np.asarray(ys[i]), np.asarray(ms[i]),
                    px[pid], py[pid],
                )
                if d < best[0] - 1e-12:
                    best = (d, routes["route_id"][i].as_py(), m)
            assert out.loc[pid, "route_id"] == best[1]
            assert out.loc[pid, "snap_dist"] == pytest.approx(best[0])
            assert out.loc[pid, "loc"] == pytest.approx(best[2])


class TestTilesIntersections:
    def test_tile_histogram_counts(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "x": [0.5, 0.6, 100.0],
                    "y": [0.5, 0.4, 100.0],
                }
            )
        )
        out = tile_histogram(ds, res=10).to_pandas()
        assert out.n.sum() == 3
        assert len(out) == 2

    def test_intersection_pairs_cross(self):
        # Two crossing straight routes + one distant route.
        t = pa.table(
            {
                "route_id": ["A", "B", "C"],
                "xs": pa.array(
                    [[0.0, 10.0], [5.0, 5.0], [100.0, 110.0]],
                    pa.list_(pa.float64()),
                ),
                "ys": pa.array(
                    [[0.0, 0.0], [-5.0, 5.0], [100.0, 100.0]],
                    pa.list_(pa.float64()),
                ),
                "ms": pa.array(
                    [[0.0, 10.0], [0.0, 10.0], [0.0, 10.0]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        out = intersection_pairs(t, res=8).to_pandas()
        assert len(out) == 1
        assert out.route_a[0] == "A" and out.route_b[0] == "B"
        assert out.x[0] == pytest.approx(5.0)
        assert out.y[0] == pytest.approx(0.0)


class TestCluster:
    def test_transitive_chain(self, ray_session):
        L = LRS(key_col=("route",), beg_col="beg", end_col="end")
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2, 3, 4],
                    "route": ["A", "A", "A", "A", "B"],
                    "beg": [0.0, 4.0, 9.0, 20.0, 0.0],
                    "end": [5.0, 10.0, 12.0, 25.0, 5.0],
                }
            )
        )
        out = (
            cluster_events(ds, L, max_gap=0.0, num_partitions=4)
            .to_pandas()
            .set_index("event_id")
        )
        assert out.loc[0, "cluster"] == out.loc[1, "cluster"] == out.loc[2, "cluster"]
        assert out.loc[3, "cluster"] != out.loc[0, "cluster"]
        assert out.loc[4, "cluster"] != out.loc[0, "cluster"]

    def test_max_gap_links(self, ray_session):
        L = LRS(key_col=("route",), beg_col="beg", end_col="end")
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["A", "A"],
                    "beg": [0.0, 6.0],
                    "end": [5.0, 10.0],
                }
            )
        )
        apart = cluster_events(ds, L, 0.0, num_partitions=4).to_pandas().set_index("event_id")
        assert apart.loc[0, "cluster"] != apart.loc[1, "cluster"]
        near = cluster_events(ds, L, 2.0, num_partitions=4).to_pandas().set_index("event_id")
        assert near.loc[0, "cluster"] == near.loc[1, "cluster"]

    def test_label_modes_identical(self, ray_session):
        # driver vs distributed labeling must agree in VALUES, with and
        # without cross-route links (mirror of dedup_corpus(method=...)).
        L = LRS(key_col=("route",), beg_col="beg", end_col="end")
        rng = np.random.default_rng(11)
        n = 400
        beg = rng.uniform(0, 100, n).round(2)
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": np.arange(n, dtype=np.int64),
                    "route": rng.choice(list("ABCDEFG"), n),
                    "beg": beg,
                    "end": beg + rng.uniform(0.1, 6, n).round(2),
                    "link": rng.integers(0, 40, n),
                }
            )
        )
        for link in (None, "link"):
            a = (
                cluster_events(ds, L, 1.0, link_col=link, num_partitions=4,
                               label_mode="driver")
                .to_pandas().sort_values("event_id").reset_index(drop=True)
            )
            b = (
                cluster_events(ds, L, 1.0, link_col=link, num_partitions=4,
                               label_mode="distributed")
                .to_pandas().sort_values("event_id").reset_index(drop=True)
            )
            cols = sorted(set(a.columns) & set(b.columns))
            pdt.assert_frame_equal(a[cols], b[cols], check_dtype=False)


class TestImagePipeline:
    def test_invariants_pass_and_detect_corruption(self, ray_session):
        imgs = synth.make_images(30)
        ds = rd.from_arrow(imgs)
        out = verify_invariants(ds, concurrency=1).to_pandas()
        assert out.invariant_ok.all()
        assert (out[out.fmt == "qz"].psnr_db >= 40).all()
        assert np.isinf(out[out.fmt == "raw"].psnr_db).all()
        # Corrupt one caption → flagged.
        bad = imgs.set_column(
            imgs.schema.get_field_index("caption"),
            "caption",
            pa.array(["WRONG"] + imgs["caption"].to_pylist()[1:]),
        )
        out2 = verify_invariants(rd.from_arrow(bad), concurrency=1).to_pandas()
        assert int((~out2.invariant_ok).sum()) == 1

    def test_end_to_end_counts(self, ray_session):
        routes = synth.make_routes(8, seed=42)
        events = rd.from_arrow(synth.make_events(routes, density=0.08))
        images = rd.from_arrow(synth.make_images(200))
        per_event, tiles, snapped = image_pipeline(
            images, routes, events,
            buffer=6.0, cell_res=6, num_partitions=8, snap_concurrency=2,
        )
        sn = snapped.to_pandas()
        assert len(sn) > 100  # most images geocode within jitter of a route
        te = tiles.to_pandas()
        assert te.n.sum() == len(sn)
        pe = per_event.to_pandas()
        assert pe.n_images.sum() > 0

    def test_shuffled_events_fallback_parity(self, ray_session):
        # events_broadcast_budget=0 forces the co-partitioned relation-join
        # fallback; outputs must match the broadcast path exactly.
        routes = synth.make_routes(8, seed=42)
        events = rd.from_arrow(synth.make_events(routes, density=0.08))
        images = rd.from_arrow(synth.make_images(200))
        pe_b, ti_b, _ = image_pipeline(
            images, routes, events, buffer=6.0, cell_res=6, num_partitions=8,
        )
        pe_s, ti_s, _ = image_pipeline(
            images, routes, events, buffer=6.0, cell_res=6, num_partitions=8,
            events_broadcast_budget=0,
        )
        a = pe_b.to_pandas().sort_values("event_id").reset_index(drop=True)
        b = pe_s.to_pandas().sort_values("event_id").reset_index(drop=True)
        pdt.assert_frame_equal(a, b[a.columns], check_dtype=False)
        ta = ti_b.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        tb = ti_s.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        pdt.assert_frame_equal(ta, tb[ta.columns], check_dtype=False)

    def test_id_seeds_arrow_parity(self):
        from linref_ray.kernels import codec

        ids = ["img-%08d" % i for i in range(50)] + ["x", "", "abcdef" * 3]
        arr = pa.array(ids, pa.string())
        assert (codec.id_seeds_arrow(arr) == codec.id_seeds(ids)).all()
        # Sliced (non-zero offset) and chunked arrays hit the buffer-offset
        # arithmetic.
        assert (
            codec.id_seeds_arrow(arr.slice(3, 20)) == codec.id_seeds(ids[3:23])
        ).all()
        chunked = pa.chunked_array([ids[:10], ids[10:]], pa.string())
        assert (codec.id_seeds_arrow(chunked) == codec.id_seeds(ids)).all()

    def test_caption_fastpath_matches_caption_for(self, ray_session):
        # VerifyInvariants builds the expected caption in Arrow C++; it must
        # stay bit-equal to synth.caption_for.
        imgs = synth.make_images(10)
        expected = [synth.caption_for(i) for i in imgs["image_id"].to_pylist()]
        assert imgs["caption"].to_pylist() == expected
        out = verify_invariants(rd.from_arrow(imgs)).to_pandas()
        assert out.invariant_ok.all()

    def test_event_index_match_codes_parity(self):
        from linref_ray.spatial import EventRangeIndex

        routes = synth.make_routes(6, seed=7)
        events = synth.make_events(routes, density=0.2)
        order = np.asarray(routes["route_id"].to_pylist())
        idx = EventRangeIndex(events, closed="left_mod", route_order=order)
        rng = np.random.default_rng(3)
        n = 500
        codes = rng.integers(0, len(order), n).astype(np.int32)
        locs = rng.uniform(-5, 60, n)
        p1, e1 = idx.match(order[codes], locs)
        p2, e2 = idx.match_codes(codes, locs)
        k1 = np.lexsort([e1, p1])
        k2 = np.lexsort([e2, p2])
        assert (p1[k1] == p2[k2]).all() and (e1[k1] == e2[k2]).all()
        # Out-of-range and unmatched codes are silently skipped.
        p3, e3 = idx.match_codes(np.array([-1, len(order) + 5], np.int64),
                                 np.array([1.0, 1.0]))
        assert len(p3) == 0 and len(e3) == 0


class TestCheckpointedPipeline:
    def test_resume_reproduces_results(self, ray_session, tmp_path):
        import shutil, os
        from linref_ray.images import image_pipeline_checkpointed
        from linref_ray.lineage import completed_partitions

        routes = synth.make_routes(8, seed=42)
        events = rd.from_arrow(synth.make_events(routes, density=0.08))
        images = rd.from_arrow(synth.make_images(300))
        out = str(tmp_path / "ckpt")
        pe1, t1, _, s1 = image_pipeline_checkpointed(
            images, routes, events, out,
            buffer=6.0, cell_res=6, num_partitions=8,
        )
        ref_pe = pe1.to_pandas().sort_values("event_id").reset_index(drop=True)
        ref_tiles = t1.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        assert s1["rows"] > 100

        # Crash simulation: drop one partition, rerun.
        victim = sorted(completed_partitions(out))[0]
        shutil.rmtree(os.path.join(out, f"part={victim}"))
        os.remove(os.path.join(out, "_manifest", f"{victim}.json"))
        pe2, t2, _, s2 = image_pipeline_checkpointed(
            images, routes, events, out,
            buffer=6.0, cell_res=6, num_partitions=8,
        )
        assert s2["written"] == 1  # only the missing partition recomputed
        pe2df = pe2.to_pandas().sort_values("event_id").reset_index(drop=True)
        t2df = t2.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        assert pe2df.equals(ref_pe)
        assert t2df.equals(ref_tiles)


class TestImageNearDup:
    def test_planted_copies_found_strings_ids(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.images import image_near_duplicates

        base = synth.make_images(300)
        idx = [i for i in range(300) if i % 60 == 3]  # 5 families
        sel = base.take([i for i in idx for _ in range(2)])
        ids = [
            f"{base['image_id'][i].as_py()}#d{j}"
            for i in idx for j in range(1, 3)
        ]
        sel = sel.set_column(
            sel.schema.get_field_index("image_id"), "image_id",
            pa.array(ids),
        )
        out = (
            image_near_duplicates(
                rd.from_arrow(pa.concat_tables([base, sel]))
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        # 5 families x C(3,2)=3 within-family pairs, all byte-identical
        assert len(out) == 15
        assert (out.hamming == 0).all()
        assert out.id_a.str.len().ge(12).all()
        # string ids ordered lexicographically (min/max path)
        assert (out.id_a < out.id_b).all()

    def test_phash_method_and_affine_robustness(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from linref_ray import synth
        from linref_ray.images import image_near_duplicates
        from linref_ray.kernels import codec
        from linref_ray.kernels.phash import phash64

        base = synth.make_images(120)
        # contrast/brightness-edited copy of image 7: decode, affine-map
        # pixels (no clipping range hit at 0.8x+20), re-encode raw
        blob = base["bytes"][7].as_py()
        px, _ = codec.decode_image(blob)
        edited = (px.astype(np.float32) * 0.8 + 20).astype(np.uint8)
        copy = codec.encode_image(edited, "raw")
        tbl = pa.concat_tables([
            base,
            pa.table({
                "image_id": pa.array([base["image_id"][7].as_py() + "#edit"]),
                "bytes": pa.array([copy], pa.binary()),
                "w": base["w"][7:8], "h": base["h"][7:8],
                "fmt": pa.array(["raw"]),
                "caption": base["caption"][7:8],
                "phash": base["phash"][7:8],
            }).cast(base.schema),
        ])
        out = image_near_duplicates(
            rd.from_arrow(tbl), method="phash", max_hamming=6
        ).to_pandas()
        pairs = set(zip(out.id_a, out.id_b))
        orig = base["image_id"][7].as_py()
        assert (orig, orig + "#edit") in pairs
        # kernel-level: affine map leaves pHash bits unchanged
        g = px.astype(np.float32).mean(axis=2)
        assert phash64(g) == phash64(g * 1.3 + 10.0)


class TestRealPngInvariants:
    def test_invariants_on_real_png_corpus(self, ray_session):
        # input_hint fmt='png' rows: pixels stored as REAL PNG bytes (pure
        # stdlib codec), decoded by the invariant stage and PSNR-checked
        # against the deterministic reference — lossless, so psnr = inf.
        from linref_ray.kernels import codec

        ids = [f"img-{i:08d}" for i in range(40)]
        blobs, caps = [], []
        for i, iid in enumerate(ids):
            px = codec.reference_pixels(iid, 12, 9)
            blobs.append(codec.png_encode(px))
            caps.append(synth.caption_for(iid))
        tbl = pa.table(
            {
                "image_id": pa.array(ids),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array([12] * len(ids), pa.int32()),
                "h": pa.array([9] * len(ids), pa.int32()),
                "fmt": pa.array(["png"] * len(ids)),
                "caption": pa.array(caps),
                "phash": pa.array([0] * len(ids), pa.int64()),
            }
        )
        out = verify_invariants(rd.from_arrow(tbl)).to_pandas()
        assert out.invariant_ok.all()
        assert np.isinf(out.psnr_db).all()
        # A corrupted PNG payload is flagged, not crashed.
        bad_px = 255 - codec.reference_pixels(ids[0], 12, 9)
        blobs[0] = codec.png_encode(bad_px)
        tbl2 = tbl.set_column(
            tbl.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, pa.binary()),
        )
        out2 = verify_invariants(rd.from_arrow(tbl2)).to_pandas()
        assert int((~out2.invariant_ok).sum()) == 1


class TestPointInPolygon:
    def test_concave_parity_with_brute(self, ray_session):
        from linref_ray.spatial import (
            build_polygon_index,
            points_in_polygons,
        )

        # L-shape (concave) + a triangle + a far-away square.
        polys = pa.table(
            {
                "polygon_id": pa.array([0, 1, 2], pa.int64()),
                "xs": pa.array(
                    [[0.0, 4.0, 4.0, 2.0, 2.0, 0.0],
                     [10.0, 14.0, 12.0],
                     [100.0, 104.0, 104.0, 100.0]],
                    pa.list_(pa.float64()),
                ),
                "ys": pa.array(
                    [[0.0, 0.0, 2.0, 2.0, 4.0, 4.0],
                     [10.0, 10.0, 14.0],
                     [100.0, 100.0, 104.0, 104.0]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        rng = np.random.default_rng(13)
        n = 2000
        px = rng.uniform(-2, 16, n)
        py = rng.uniform(-2, 16, n)
        pts = rd.from_arrow(
            pa.table(
                {
                    "pid": pa.array(np.arange(n), pa.int64()),
                    "x": pa.array(px),
                    "y": pa.array(py),
                }
            )
        )
        ref = build_polygon_index(polys, res=6)
        out = points_in_polygons(pts, ref).to_pandas()

        def brute(px1, py1, xs, ys):
            inside = False
            m = len(xs)
            for i in range(m):
                x0, y0 = xs[i], ys[i]
                x1, y1 = xs[(i + 1) % m], ys[(i + 1) % m]
                if (y0 > py1) != (y1 > py1) and px1 < (x1 - x0) * (
                    py1 - y0
                ) / (y1 - y0) + x0:
                    inside = not inside
            return inside

        expected = set()
        for i in range(n):
            for pid_, xs, ys in zip(
                polys["polygon_id"].to_pylist(),
                polys["xs"].to_pylist(),
                polys["ys"].to_pylist(),
            ):
                if brute(px[i], py[i], xs, ys):
                    expected.add((i, pid_))
        got = set(zip(out.pid, out.polygon_id))
        assert got == expected
        assert len(got) > 50  # sanity: the scatter actually hits shapes

    def test_overlapping_polygons_emit_both(self, ray_session):
        from linref_ray.spatial import (
            build_polygon_index,
            points_in_polygons,
        )

        polys = pa.table(
            {
                "polygon_id": pa.array(["a", "b"], pa.string()),
                "xs": pa.array(
                    [[0.0, 10.0, 10.0, 0.0], [5.0, 15.0, 15.0, 5.0]],
                    pa.list_(pa.float64()),
                ),
                "ys": pa.array(
                    [[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        pts = rd.from_arrow(
            pa.table({"x": pa.array([7.0, 2.0, 20.0]),
                      "y": pa.array([5.0, 5.0, 5.0])})
        )
        ref = build_polygon_index(polys, res=6)
        out = points_in_polygons(pts, ref).to_pandas()
        both = out[out.x == 7.0].polygon_id.tolist()
        assert sorted(both) == ["a", "b"]
        assert out[out.x == 2.0].polygon_id.tolist() == ["a"]
        assert (out.x != 20.0).all()


class TestDenseRankAndIO:
    def test_dense_rank_labels_direct(self, ray_session):
        from linref_ray.spatial import dense_rank_labels

        df = pd.DataFrame(
            {
                "__ckey": ["b", "a", "c", "a", "b"],
                "__cpos": [0, 1, 0, 0, 1],
            }
        ).drop_duplicates()
        out = (
            dense_rank_labels(rd.from_pandas(df), ("__ckey", "__cpos"))
            .to_pandas()
            .sort_values(["__ckey", "__cpos"])
            .reset_index(drop=True)
        )
        # dense rank in (__ckey, __cpos) order: a0,a1,b0,b1,c0 → 0..4
        assert out.cluster.tolist() == [0, 1, 2, 3, 4]

    def test_read_parquet_clean_strips_metadata(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from linref_ray.io import read_parquet_clean

        p = str(tmp_path / "t.parquet")
        pd.DataFrame({"a": [1, 2, 3]}).to_parquet(p)  # writes b'pandas' meta
        assert pq.read_schema(p).metadata is not None
        batch = read_parquet_clean(p).take_batch(3, batch_format="pyarrow")
        assert batch.schema.metadata is None
        assert isinstance(hash(batch.schema), int)  # dedup-able again

    def test_points_in_polygons_keep_unmatched(self, ray_session):
        from linref_ray.spatial import build_polygon_index, points_in_polygons

        polys = pa.table(
            {
                "polygon_id": pa.array([7], pa.int64()),
                "xs": pa.array([[0.0, 10.0, 10.0, 0.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0, 10.0, 10.0]], pa.list_(pa.float64())),
            }
        )
        pts = rd.from_arrow(
            pa.table({"x": pa.array([5.0, 50.0]), "y": pa.array([5.0, 5.0])})
        )
        ref = build_polygon_index(polys, res=6)
        out = (
            points_in_polygons(pts, ref, keep_unmatched=True)
            .to_pandas()
            .sort_values("x")
            .reset_index(drop=True)
        )
        assert len(out) == 2
        assert out.loc[0, "polygon_id"] == 7
        assert pd.isna(out.loc[1, "polygon_id"])
