"""The flagship image pipeline (BASELINE.json north star).

Stages (all streaming ``ray.data`` — nothing materializes the corpus):

1. read image+caption table (parquet here; Lance at deployment — same Arrow
   schema ``(image_id, bytes, w, h, fmt, caption, phash)``)
2. ``verify_invariants`` — decode pixels, PSNR vs the deterministic
   reference decode (≥40 dB for lossy) + caption equality, per row. Runs
   BEFORE any shuffle so wide ``bytes`` payloads never move; downstream
   stages carry only the slim sidecar columns.
3. ``geotag`` — deterministic geocode of each image to a capture point
4. snap to route network (broadcast cell index, actor pool)
5. point×linear intersect join to event ranges (per-route sweep)
6. tile histogram per Morton cell + per-event image counts

The per-row invariant (decoded-pixel PSNR + caption equality) is checked in
stage 2 and re-checkable at any stage because reference pixels/captions are
pure functions of ``image_id`` (retry- and resume-safe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

import struct

from linref_ray.kernels import codec
from linref_ray.synth import caption_for, geocode_for


class VerifyInvariants:
    """Actor stage: decode + PSNR + caption equality per row.

    ``psnr_min`` mirrors input_hint's "PSNR≥40dB for lossy; allclose for
    lossless". Emits ``psnr_db`` and ``invariant_ok``; set ``strict`` to
    raise instead (pipeline-stopping data corruption signal).
    """

    def __init__(self, psnr_min: float = 40.0, strict: bool = False):
        self.psnr_min = psnr_min
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        seeds = codec.id_seeds_arrow(batch["image_id"])
        try:
            # Uniform-record fast path: pixels_2d is a zero-copy strided
            # view into the Arrow data buffer — no per-row Python at all.
            # (Both the reference pixel stream and flat-buffer PSNR depend
            # only on the pixel COUNT, which the uniform record length
            # pins, so one (w, h) serves the whole batch.)
            pixels_2d, _fmt_codes, w, h = codec.decode_batch_arrow(
                batch["bytes"]
            )
            refs = codec.reference_pixels_batch(seeds, w, h).reshape(n, -1)
            sizes = np.full(n, h * w * 3, dtype=np.int64)
            psnr = codec.psnr_batch(pixels_2d, refs, sizes)
        except ValueError:
            psnr = self._psnr_rowwise(batch, seeds)
        # Caption check stays in Arrow C++: the expected caption is the
        # same string :func:`linref_ray.synth.caption_for` builds
        # (parity-tested in tests/test_images.py).
        expected = pc.binary_join_element_wise(
            "capture ", batch["image_id"], " near route", ""
        )
        cap_ok = pc.equal(batch["caption"], expected).to_numpy(
            zero_copy_only=False
        )
        ok = (psnr >= self.psnr_min) & cap_ok
        if self.strict and not ok.all():
            bad = batch["image_id"].take(
                pa.array(np.flatnonzero(~ok)[:5])
            ).to_pylist()
            raise ValueError(f"invariant violated for images {bad}")
        out = batch.append_column("psnr_db", pa.array(psnr))
        return out.append_column("invariant_ok", pa.array(ok))

    def _psnr_rowwise(self, batch: pa.Table, seeds: np.ndarray) -> np.ndarray:
        # Fallback for non-uniform record sizes: per-row decode. A row
        # whose bytes do not decode AT ALL (truncated JPEG, garbage
        # container — the realistic corruption mode of a web-scale crawl)
        # must flag that row, not kill the task: any decoder exception
        # maps to psnr = -inf → invariant_ok False (strict mode then
        # raises with the ids, same as every other violation).
        blobs = batch["bytes"].to_pylist()
        n = len(blobs)
        flat_px = []
        sizes = np.empty(n, dtype=np.int64)
        whs: list[tuple[int, int]] = []
        failed = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                px, _fmt = codec.decode_image(blobs[i])
            except Exception:
                failed[i] = True
                px = np.zeros((1, 1, 3), dtype=np.uint8)
            flat_px.append(px.ravel())
            sizes[i] = px.size
            whs.append((px.shape[1], px.shape[0]))
        if n and len(set(whs)) == 1:
            w, h = whs[0]
            flat_ref = codec.reference_pixels_batch(seeds, w, h).reshape(
                n, -1
            ).ravel()
        else:
            flat_ref = np.concatenate(
                [
                    codec.reference_pixels_batch(seeds[i : i + 1], w, h)
                    .ravel()
                    .copy()
                    for i, (w, h) in enumerate(whs)
                ]
            ) if n else np.empty(0, dtype=np.uint8)
        psnr = codec.psnr_batch(
            np.concatenate(flat_px) if flat_px else np.empty(0, np.uint8),
            flat_ref, sizes,
        )
        if failed.any():
            psnr = np.where(failed, -np.inf, psnr)
        return psnr


def verify_invariants(
    images: ray.data.Dataset,
    psnr_min: float = 40.0,
    strict: bool = False,
    concurrency: int | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Invariant stage. Default: stateless tasks (fully elastic — our codec
    stub carries no per-worker state). Pass ``concurrency`` to run as an
    actor pool instead — the right shape when decode needs real per-worker
    state (loaded codecs/models); measured here, the autoscaling pool ramps
    far slower than tasks for cheap kernels."""
    if concurrency is not None:
        return images.map_batches(
            VerifyInvariants,
            fn_constructor_kwargs=dict(psnr_min=psnr_min, strict=strict),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, concurrency),
            num_cpus=1,
        )
    fn = VerifyInvariants(psnr_min=psnr_min, strict=strict)
    return images.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size
    )


def _geotag_table(
    t: pa.Table, routes: pa.Table | None, jitter: float = 2.0,
    geocoder=None,
) -> pa.Table:
    if geocoder is None:
        from linref_ray.synth import Geocoder

        geocoder = Geocoder(routes, jitter=jitter)
    ids = t["image_id"].to_numpy(zero_copy_only=False)
    px, py = geocoder(ids)
    keep = [c for c in t.column_names if c != "bytes"]
    out = t.select(keep)
    out = out.append_column("x", pa.array(px))
    return out.append_column("y", pa.array(py))


def geotag(
    images: ray.data.Dataset, routes: pa.Table, jitter: float = 2.0
) -> ray.data.Dataset:
    """Deterministic geocode: image_id → (x, y) capture point.

    Drops the wide ``bytes`` column first — only the slim sidecar
    (image_id, x, y) continues into shuffled stages (SURVEY §7.5 item 8).
    The Geocoder's per-route arrays build once on the driver and ship with
    the task closure — never rebuilt per batch.
    """
    from linref_ray.synth import Geocoder

    geocoder = Geocoder(routes, jitter=jitter)

    def fn(t: pa.Table) -> pa.Table:
        return _geotag_table(t, None, geocoder=geocoder)

    return images.map_batches(fn, batch_format="pyarrow")


def fused_sidecar_stage(
    routes: pa.Table,
    index_ref,
    buffer: float = 5.0,
    check_invariants: bool = True,
    cell_res: int | None = None,
    psnr_min: float = 40.0,
    emit_code: bool = False,
):
    """Per-batch callable composing verify → filter → geotag → snap
    (→ cell assignment): the manually-fused image stage. One map operator
    means the wide ``bytes`` column never crosses an operator boundary —
    Ray's plan optimizer can otherwise split a long map chain at a point
    where bytes-bearing blocks queue and backpressure throttles the
    pipeline (measured 2x slowdown; see BASELINE.md round-2 notes)."""
    from linref_ray.kernels.cells import cell_of_points, cell_size
    from linref_ray.spatial import SnapPoints

    from linref_ray.synth import Geocoder

    verify = VerifyInvariants(psnr_min=psnr_min) if check_invariants else None
    geocoder = Geocoder(routes)
    snapper = SnapPoints(
        index_ref=index_ref, buffer=buffer, x_col="x", y_col="y",
        keep_unmatched=False, emit_code=emit_code,
    )

    def fn(batch: pa.Table) -> pa.Table:
        t = batch
        if verify is not None:
            t = verify(t)
            t = t.filter(t["invariant_ok"])
        t = _geotag_table(t, None, geocoder=geocoder)
        t = snapper(t)
        if cell_res is not None:
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
            y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
            g = cell_size(cell_res)
            t = t.append_column("cell", pa.array(cell_of_points(x, y, cell_res)))
            t = t.append_column("ix", pa.array(np.floor(x / g).astype(np.int64)))
            t = t.append_column("iy", pa.array(np.floor(y / g).astype(np.int64)))
        return t

    return fn


def image_pipeline(
    images: ray.data.Dataset,
    routes: pa.Table,
    events: ray.data.Dataset,
    buffer: float = 5.0,
    cell_res: int = 8,
    num_partitions: int = 64,
    snap_concurrency: int = 4,
    check_invariants: bool = True,
    materialize_sidecar: bool = False,
    events_broadcast_budget: int = 1 << 30,
):
    """Full flagship pipeline; returns (per_event_counts, tile_histogram,
    snapped) datasets.

    ``events`` schema: event_id, route_id, beg, end (+attrs).

    Streaming contract: event counts and tile counts are fused into ONE
    partial-aggregation pass over the snapped sidecar, so the sidecar
    streams block-by-block through the object store and peak usage stays
    flat with corpus size. The returned ``snapped`` dataset is LAZY —
    consuming it re-runs decode+snap; callers that need the sidecar itself
    should use :func:`image_pipeline_checkpointed`, which persists it as
    resumable partitioned parquet. ``materialize_sidecar=True`` restores
    the old pin-everything behavior for small corpora.
    """
    from linref_ray.spatial import build_route_index, snap_points, tile_histogram

    ds = images
    if check_invariants:
        ds = verify_invariants(ds)
        ds = ds.filter(expr="invariant_ok == True")
    pts = geotag(ds, routes)
    index_ref = build_route_index(routes, res=cell_res, pad=buffer)
    snapped = snap_points(pts, index_ref, buffer=buffer)
    if materialize_sidecar:
        snapped = snapped.materialize()
    # Event ranges are the small side (events ≪ images): broadcast a
    # per-route interval index and probe it per batch — the snapped stream
    # never shuffles for the join. Event counts AND tile counts are partial-
    # aggregated in ONE pass over the sidecar (tagged rows), so the whole
    # post-snap phase is a single tiny shuffle.
    import ray as _ray

    from linref_ray.kernels.cells import cell_size
    from linref_ray.spatial import EventRangeIndex

    # Broadcast guard: the single-pass design assumes events ≪ images. If
    # the event table exceeds the object-store budget, fall back to the
    # co-partitioned relation join (events shuffle WITH the sidecar instead
    # of being pulled to the driver) — parity-tested against this path.
    ev_bytes = events.size_bytes() or 0
    if ev_bytes > events_broadcast_budget:
        return _image_pipeline_shuffled_events(
            images, routes, events, buffer=buffer, cell_res=cell_res,
            num_partitions=num_partitions, check_invariants=check_invariants,
            materialize_sidecar=materialize_sidecar,
        )
    ev_tbl = pa.concat_tables(
        _ray.get(events.to_arrow_refs()), promote_options="default"
    )
    # route_order mirrors RouteIndex.route_ids (routes-table order), so the
    # int32 codes SnapPoints emits index straight into the event index —
    # route keys stay integers through the whole fused hot path.
    ev_index_ref = _ray.put(
        EventRangeIndex(
            ev_tbl, closed="left_mod",
            route_order=np.asarray(routes["route_id"].to_pylist()),
        )
    )
    g = cell_size(cell_res)

    def combined_partials(batch: pa.Table) -> pa.Table:
        idx: EventRangeIndex = _ray.get(ev_index_ref)
        locs = batch["loc"].to_numpy(zero_copy_only=False).astype(np.float64)
        if "route_code" in batch.column_names:
            codes = batch["route_code"].to_numpy(zero_copy_only=False)
            _, eids = idx.match_codes(codes, locs)
        else:
            rids = np.asarray(batch["route_id"].to_pylist())
            _, eids = idx.match(rids, locs)
        ev, ev_n = np.unique(eids, return_counts=True)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        ix = np.floor(x / g).astype(np.int64)
        iy = np.floor(y / g).astype(np.int64)
        # (ix, iy) histogram via a packed-key sort — no pandas round-trip in
        # the flagship hot path. Grid indices fit comfortably in 32 bits.
        packed = (ix << np.int64(32)) | (iy & np.int64(0xFFFFFFFF))
        _, tfirst, tn = np.unique(packed, return_index=True, return_counts=True)
        t_ix, t_iy = ix[tfirst], iy[tfirst]
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(ev), np.int8),
                         np.ones(len(tfirst), np.int8)]
                    )
                ),
                "ka": pa.array(
                    np.concatenate([ev, t_ix]).astype(np.int64)
                ),
                "kb": pa.array(
                    np.concatenate(
                        [np.zeros(len(ev), np.int64), t_iy]
                    ).astype(np.int64)
                ),
                "__n": pa.array(
                    np.concatenate([ev_n, tn]).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    if materialize_sidecar:
        partial_rows = snapped.map_batches(
            combined_partials, batch_format="pyarrow", batch_size=16384
        )
    else:
        # Manual fusion: ONE map operator from raw images to slim partial
        # rows. Left to the plan optimizer, the seven-map chain can split at
        # a boundary where bytes-bearing blocks still queue between
        # operators; object-store backpressure on those wide blocks then
        # throttles the verify stage (measured: 2x flagship slowdown at 8
        # CPUs from exactly that split). Fusing by hand guarantees the wide
        # column never crosses an operator boundary.
        sidecar_fn = fused_sidecar_stage(
            routes, index_ref, buffer=buffer,
            check_invariants=check_invariants, emit_code=True,
        )

        def fused(batch: pa.Table) -> pa.Table:
            return combined_partials(sidecar_fn(batch))

        partial_rows = images.map_batches(
            fused, batch_format="pyarrow", batch_size=8192
        )

    # No repartition before this groupby: the fused map emits one slim
    # partial block per task (tens of blocks), so the coalesce would cost a
    # full extra exchange of the same rows it feeds to the sort shuffle.
    combined = (
        partial_rows
        .groupby(["kind", "ka", "kb"])
        .aggregate(Sum("__n", alias_name="n"))
        .materialize()  # tiny (events + occupied tiles rows)
    )
    per_event = (
        combined.filter(expr="kind == 0")
        .select_columns(["ka", "n"])
        .rename_columns({"ka": "event_id", "n": "n_images"})
    )
    tiles = combined.filter(expr="kind == 1").select_columns(
        ["ka", "kb", "n"]
    ).rename_columns({"ka": "ix", "kb": "iy"})
    return per_event, tiles, snapped


def _image_pipeline_shuffled_events(
    images: ray.data.Dataset,
    routes: pa.Table,
    events: ray.data.Dataset,
    buffer: float = 5.0,
    cell_res: int = 8,
    num_partitions: int = 64,
    check_invariants: bool = True,
    materialize_sidecar: bool = False,
):
    """Flagship fallback when the event table exceeds the broadcast budget:
    events co-shuffle with the snapped sidecar through the relation join
    (``relate.Relation``) instead of being pulled to the driver.

    Two streaming passes over the sidecar (tiles, then the event join) —
    at a scale where events don't broadcast, the sidecar doesn't pin in the
    object store either; callers that want single-decode semantics should
    checkpoint the sidecar (:func:`image_pipeline_checkpointed`) and feed
    the checkpoint back in.
    """
    from ray.data.aggregate import Sum

    from linref_ray.kernels.cells import cell_size
    from linref_ray.lrs import LRS
    from linref_ray.relate import Relation
    from linref_ray.spatial import build_route_index

    index_ref = build_route_index(routes, res=cell_res, pad=buffer)
    sidecar_fn = fused_sidecar_stage(
        routes, index_ref, buffer=buffer, check_invariants=check_invariants,
    )
    snapped = images.map_batches(
        sidecar_fn, batch_format="pyarrow", batch_size=8192
    )
    if materialize_sidecar:
        snapped = snapped.materialize()
    g = cell_size(cell_res)

    def tile_partials(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        ix = np.floor(x / g).astype(np.int64)
        iy = np.floor(y / g).astype(np.int64)
        packed = (ix << np.int64(32)) | (iy & np.int64(0xFFFFFFFF))
        _, tfirst, tn = np.unique(packed, return_index=True, return_counts=True)
        return pa.table(
            {
                "ix": pa.array(ix[tfirst]),
                "iy": pa.array(iy[tfirst]),
                "__n": pa.array(tn.astype(np.int64)),
            }
        )

    tiles = (
        snapped.map_batches(
            tile_partials, batch_format="pyarrow", batch_size=16384
        )
        .groupby(["ix", "iy"])
        .aggregate(Sum("__n", alias_name="n"))
    )

    def with_pt_id(batch: pa.Table) -> pa.Table:
        # The relation kernel packs int64 ids; point identity is unused for
        # counting, so a constant placeholder keeps the sidecar slim.
        return batch.append_column(
            "__pt", pa.array(np.zeros(len(batch), np.int64))
        )

    pts = snapped.map_batches(with_pt_id, batch_format="pyarrow")
    rel = Relation(
        pts,
        events,
        LRS(key_col=("route_id",), beg_col=None, end_col=None,
            loc_col="loc", closed="left_mod"),
        LRS(key_col=("route_id",), beg_col="beg", end_col="end",
            closed="left_mod"),
        id_col="__pt",
        right_id_col="event_id",
        num_partitions=num_partitions,
    )
    per_event = rel.count(target="right", out_col="n_images")
    return per_event, tiles, snapped


def image_pipeline_checkpointed(
    images: ray.data.Dataset,
    routes: pa.Table,
    events: ray.data.Dataset,
    out_dir: str,
    buffer: float = 5.0,
    cell_res: int = 8,
    num_partitions: int = 64,
    check_invariants: bool = True,
):
    """Flagship with per-partition lineage checkpointing (the north-rule
    resume contract): the snapped sidecar is written as route-hash
    partitions with manifests (rows in/out, measure ranges, content hash,
    Morton-cell histogram). A crashed run resumes by recomputing only the
    missing partitions; downstream joins/tiles read the checkpoint, so a
    resumed run produces byte-identical outputs (geocode/snap are pure
    functions of image_id + routes).

    Returns (per_event_counts, tiles, snapped_from_checkpoint, summary).
    """
    import ray as _ray

    from linref_ray.lineage import read_resumable, write_resumable
    from linref_ray.spatial import (
        EventRangeIndex,
        broadcast_event_join_counts,
        build_route_index,
        tile_histogram,
    )

    index_ref = build_route_index(routes, res=cell_res, pad=buffer)
    # One fused map from raw images to the slim cell-tagged sidecar — same
    # manual fusion as image_pipeline (bytes never cross an operator
    # boundary), feeding the partitioned checkpoint writer.
    sidecar_fn = fused_sidecar_stage(
        routes, index_ref, buffer=buffer,
        check_invariants=check_invariants, cell_res=cell_res,
    )
    snapped = images.map_batches(
        sidecar_fn, batch_format="pyarrow", batch_size=8192
    )
    summary = write_resumable(
        snapped, out_dir, ("route_id",), num_partitions=num_partitions,
        cell_col="cell",
    )
    ckpt = read_resumable(out_dir)
    ev_tbl = pa.concat_tables(
        _ray.get(events.to_arrow_refs()), promote_options="default"
    )
    ev_index_ref = _ray.put(EventRangeIndex(ev_tbl, closed="left_mod"))
    per_event = broadcast_event_join_counts(ckpt, ev_index_ref)
    tiles = tile_histogram(ckpt, cell_res)
    return per_event, tiles, ckpt, summary


def resize_images(
    images: ray.data.Dataset, out_w: int, out_h: int, batch_size: int = 2048,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Real (not stubbed) nearest-neighbor resize stage: decode → index-map
    subsample → re-encode, vectorized per batch. The plumbing pattern for any
    heavier resampler (bilinear/Lanczos would drop into the same stage).
    ``on_error='skip'`` drops undecodable rows instead of failing the job
    (same per-row tolerance posture as VerifyInvariants)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        try:
            # Uniform-record fast path: one zero-copy decode, ONE strided
            # gather for the whole batch, one Arrow-native batch encode.
            pixels_2d, fmt_codes, w0, h0 = codec.decode_batch_arrow(
                t["bytes"]
            )
            px = pixels_2d.reshape(n, h0, w0, 3)
            yi = (np.arange(out_h) * h0 // out_h).astype(np.int64)
            xi = (np.arange(out_w) * w0 // out_w).astype(np.int64)
            small = np.ascontiguousarray(px[:, yi][:, :, xi])
            blobs = codec.encode_batch_arrow(small, fmt_codes)
        except ValueError:
            out_blobs = []
            ok = np.ones(n, dtype=bool)
            for i, blob in enumerate(t["bytes"].to_pylist()):
                try:
                    px1, fmt = codec.decode_image(blob)
                except Exception:
                    if on_error == "skip":
                        ok[i] = False
                        continue
                    raise
                h, w = px1.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small1 = np.ascontiguousarray(px1[yi][:, xi])
                out_blobs.append(codec.encode_image(small1, fmt))
            blobs = pa.array(out_blobs, pa.binary())
            if not ok.all():
                t = t.filter(pa.array(ok))
        out = t.set_column(
            t.schema.get_field_index("bytes"), "bytes", blobs
        )
        out = out.set_column(
            out.schema.get_field_index("w"), "w",
            pa.array(np.full(len(t), out_w, np.int32)),
        )
        return out.set_column(
            out.schema.get_field_index("h"), "h",
            pa.array(np.full(len(t), out_h, np.int32)),
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def extract_features(
    images: ray.data.Dataset, batch_size: int = 2048,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Feature-extract stage: decode → per-channel means + luma std + aHash,
    dropping the wide bytes column (the classic embed-then-discard shape).
    ``on_error='skip'`` drops undecodable rows instead of failing."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        means = np.empty((n, 3))
        stds = np.empty(n)
        hashes = np.empty(n, dtype=np.int64)
        from linref_ray.kernels.phash import ahash64, ahash64_batch

        try:
            pixels_2d, _fmt, w0, h0 = codec.decode_batch_arrow(t["bytes"])
            px = pixels_2d.reshape(n, h0, w0, 3)
            means[:] = px.reshape(n, -1, 3).mean(axis=1)
            gray = px.astype(np.float32).mean(axis=3)
            stds[:] = gray.reshape(n, -1).std(axis=1)
            hashes[:] = ahash64_batch(gray).astype(np.int64)
        except ValueError:
            ok = np.ones(n, dtype=bool)
            for i, blob in enumerate(t["bytes"].to_pylist()):
                try:
                    px1, _ = codec.decode_image(blob)
                except Exception:
                    if on_error == "skip":
                        ok[i] = False
                        means[i] = 0.0
                        stds[i] = 0.0
                        hashes[i] = 0
                        continue
                    raise
                means[i] = px1.reshape(-1, 3).mean(axis=0)
                gray = px1.astype(np.float32).mean(axis=2)
                stds[i] = gray.std()
                hashes[i] = np.int64(
                    np.uint64(ahash64(gray)).astype(np.int64)
                )
            if not ok.all():
                t = t.filter(pa.array(ok))
                means, stds, hashes = means[ok], stds[ok], hashes[ok]
        out = t.drop_columns(["bytes"])
        out = out.append_column("mean_r", pa.array(means[:, 0]))
        out = out.append_column("mean_g", pa.array(means[:, 1]))
        out = out.append_column("mean_b", pa.array(means[:, 2]))
        out = out.append_column("luma_std", pa.array(stds))
        return out.append_column("ahash", pa.array(hashes))

    return images.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def image_signatures(
    images: ray.data.Dataset,
    method: str = "ahash",
    batch_size: int = 2048,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Slim per-image perceptual signatures ``(image_id, sig)``.

    ``method``: 'ahash' (8×8 mean threshold) or 'phash' (32×32 DCT
    median threshold — robust to brightness/contrast edits). Decode and
    hashing run in one pre-shuffle batch stage; bytes never leave it.
    ``on_error='skip'`` drops undecodable rows instead of failing."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    from linref_ray.kernels.phash import (
        ahash64,
        ahash64_batch,
        phash64,
        phash64_batch,
    )

    if method not in ("ahash", "phash"):
        raise ValueError(f"unknown signature method: {method!r}")
    hash_fn = ahash64 if method == "ahash" else phash64
    batch_fn = ahash64_batch if method == "ahash" else phash64_batch

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        try:
            # Uniform-record fast path: one zero-copy batch decode, one
            # batched gray conversion, one batched hash — bit-identical
            # to the scalar loop (kernel parity tests).
            pixels_2d, _fmt, w, h = codec.decode_batch_arrow(t["bytes"])
            gray = pixels_2d.reshape(n, h, w, 3).astype(np.float32).mean(
                axis=3
            )
            sigs = batch_fn(gray).astype(np.int64)
        except ValueError:
            sigs = np.zeros(n, dtype=np.int64)
            ok = np.ones(n, dtype=bool)
            for i, blob in enumerate(t["bytes"].to_pylist()):
                try:
                    px, _ = codec.decode_image(blob)
                except Exception:
                    if on_error == "skip":
                        ok[i] = False
                        continue
                    raise
                gray = px.astype(np.float32).mean(axis=2)
                sigs[i] = np.int64(np.uint64(hash_fn(gray)).astype(np.int64))
            if not ok.all():
                return pa.table(
                    {
                        "image_id": t["image_id"].filter(pa.array(ok)),
                        "sig": pa.array(sigs[ok]),
                    }
                )
        return pa.table({"image_id": t["image_id"], "sig": pa.array(sigs)})

    return images.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def image_near_duplicates(
    images: ray.data.Dataset,
    max_hamming: int = 4,
    prefix_bits: int = 12,
    max_bucket: int = 4096,
    batch_size: int = 2048,
    method: str = "ahash",
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Perceptual near-duplicate image pairs (id_a < id_b, hamming ≤
    ``max_hamming``) via a 64-bit perceptual hash ('ahash' or 'phash').

    Modality composition: the decode + hash stage runs pre-shuffle in
    batches (wide ``bytes`` never cross an operator boundary — only slim
    ``(image_id, sig)`` rows shuffle), then the generic prefix-bucketed
    Hamming verify shared with text SimHash
    (:func:`linref_ray.dedup.hash_near_duplicates`) finds the pairs."""
    from linref_ray.dedup import hash_near_duplicates

    return hash_near_duplicates(
        image_signatures(images, method=method, batch_size=batch_size,
                         on_error=on_error),
        max_hamming=max_hamming,
        prefix_bits=prefix_bits,
        max_bucket=max_bucket,
        id_col="image_id",
        hash_col="sig",
    )
