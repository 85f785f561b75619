"""Deterministic synthetic data: route network, events, capture points, images.

BASELINE.json's input is a Lance/parquet table of image+caption pairs at
10^12 scale over a synthetic route network; in this sandbox we synthesize the
same shapes deterministically (seeded PCG64 — identical across runs and
workers, safe for retries and resume). No external data.

Scale knobs mirror the skew the engine must handle: route lengths are
Zipf-skewed with one mega-route (exercises the salted-bucket shuffle), and
vertex spacing is non-uniform (exercises the m↔distance interpolation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from linref_ray.kernels import codec


def make_routes(n_routes: int = 20, seed: int = 42) -> pa.Table:
    """Route network: ``route_id, xs, ys, ms, len_m`` (list<double> geometry).

    Random-walk polylines; route 0 is a mega-route ~20× median length. M
    equals chord distance except every 5th route where M = 2 × distance
    (non-trivial measure calibration).
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, xs, ys, ms, lens = [], [], [], [], []
    for i in range(n_routes):
        n_vert = int(rng.integers(4, 12))
        if i == 0:
            n_vert = 60
        ox, oy = rng.uniform(0, 500, 2)
        steps = rng.uniform(2.0, 15.0, n_vert - 1)
        if i == 0:
            steps = steps * 20
        ang0 = rng.uniform(0, 2 * np.pi)
        angs = ang0 + np.cumsum(rng.normal(0, 0.35, n_vert - 1))
        dx = np.cos(angs) * steps
        dy = np.sin(angs) * steps
        x = np.concatenate([[ox], ox + np.cumsum(dx)])
        y = np.concatenate([[oy], oy + np.cumsum(dy)])
        seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        cd = np.concatenate([[0.0], np.cumsum(seg)])
        m = cd * (2.0 if i % 5 == 4 else 1.0)
        ids.append(f"R{i:04d}")
        xs.append(x.tolist())
        ys.append(y.tolist())
        ms.append(m.tolist())
        lens.append(float(m[-1]))
    return pa.table(
        {
            "route_id": pa.array(ids),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
            "ms": pa.array(ms, pa.list_(pa.float64())),
            "len_m": pa.array(lens),
        }
    )


def make_events(
    routes: pa.Table, density: float = 0.05, seed: int = 43
) -> pa.Table:
    """Linear events along each route: consecutive runs, overlaps, and gaps so
    every operator has work (FIXTURES.md C3). ``density`` = events per measure
    unit."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rids, begs, ends, vals, cats = [], [], [], [], []
    eid = 0
    cats_pool = np.array(["asphalt", "concrete", "gravel"])
    for rid, ln in zip(
        routes["route_id"].to_pylist(), routes["len_m"].to_pylist()
    ):
        n = max(2, int(ln * density))
        edges = np.sort(rng.uniform(0, ln, n + 1))
        b = edges[:-1].copy()
        e = edges[1:].copy()
        kind = rng.random(n)
        # ~20% overlaps (extend into the next), ~20% gaps (shrink).
        e = np.where(kind < 0.2, np.minimum(e + (e - b) * 0.5, ln), e)
        e = np.where(kind > 0.8, b + (e - b) * 0.5, e)
        rids.extend([rid] * n)
        begs.extend(b.tolist())
        ends.extend(e.tolist())
        vals.extend(rng.uniform(10, 100, n).tolist())
        cats.extend(cats_pool[rng.integers(0, 3, n)].tolist())
        eid += n
    return pa.table(
        {
            "event_id": pa.array(np.arange(len(rids), dtype=np.int64)),
            "route_id": pa.array(rids),
            "beg": pa.array(begs, pa.float64()),
            "end": pa.array(ends, pa.float64()),
            "value": pa.array(vals, pa.float64()),
            "category": pa.array(cats),
        }
    )


def _image_rng(image_id: str) -> np.random.Generator:
    seed = np.frombuffer(
        image_id.encode()[:16].ljust(16, b"\0"), dtype=np.uint64
    )
    return np.random.Generator(np.random.PCG64(seed))


def caption_for(image_id: str) -> str:
    return f"capture {image_id} near route"


class Geocoder:
    """Precomputed deterministic geocoder: per-route polyline arrays and
    cumulative distances are built ONCE (driver or per-task deserialize)
    instead of per batch — the per-batch cumdist rebuild was the largest
    single cost of the flagship geotag stage. Output is bit-identical to
    the original :func:`geocode_for` (same hash, same interpolation)."""

    def __init__(self, routes: pa.Table, jitter: float = 2.0):
        from linref_ray.kernels.geometry import cumdist

        self.jitter = jitter
        self.n_routes = len(routes)
        xs_l = routes["xs"].combine_chunks().to_pylist()
        ys_l = routes["ys"].combine_chunks().to_pylist()
        self.xs = [np.asarray(x, dtype=np.float64) for x in xs_l]
        self.ys = [np.asarray(y, dtype=np.float64) for y in ys_l]
        self.cd = [cumdist(x, y) for x, y in zip(self.xs, self.ys)]

    def __call__(
        self, image_ids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        import pandas as pd

        h = pd.util.hash_array(image_ids.astype(str))
        n_routes = self.n_routes
        ridx = (h % np.uint64(n_routes)).astype(np.int64)
        frac = ((h // np.uint64(n_routes)) % np.uint64(10_000)).astype(
            np.float64
        ) / 10_000.0
        ang = (
            (h // np.uint64(7)) % np.uint64(6283)
        ).astype(np.float64) / 1000.0
        off = (
            (h // np.uint64(13)) % np.uint64(1000)
        ).astype(np.float64) / 1000.0
        px = np.empty(len(image_ids))
        py = np.empty(len(image_ids))
        for r in np.unique(ridx):
            m = ridx == r
            x, y, cd = self.xs[r], self.ys[r], self.cd[r]
            d = frac[m] * cd[-1]
            idx = np.clip(np.searchsorted(cd, d), 1, len(cd) - 1)
            t = (d - cd[idx - 1]) / np.maximum(cd[idx] - cd[idx - 1], 1e-12)
            bx = x[idx - 1] + t * (x[idx] - x[idx - 1])
            by = y[idx - 1] + t * (y[idx] - y[idx - 1])
            px[m] = bx + np.cos(ang[m]) * off[m] * self.jitter
            py[m] = by + np.sin(ang[m]) * off[m] * self.jitter
        return px, py


def geocode_for(
    image_ids: np.ndarray, routes: pa.Table, jitter: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic capture point per image id: a position along a route
    plus perpendicular jitter. Pure function of (id, routes) so any stage can
    recompute it. (One-shot convenience over :class:`Geocoder`.)"""
    return Geocoder(routes, jitter=jitter)(image_ids)


def images_dataset(
    n: int,
    w: int = 16,
    h: int = 16,
    seed_prefix: str = "img",
    num_blocks: int | None = None,
):
    """Distributed deterministic image corpus: ``rd.range(n)`` →
    ``map_batches`` generator. Content depends only on the row index, never
    on partitioning — identical across runs, block sizes, and retries (the
    property exact resume relies on). This is the 10^12-scale generation
    path; ``make_images`` is the driver-side convenience for tests."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=num_blocks)

    def gen(t: pa.Table) -> pa.Table:
        ids = [f"{seed_prefix}-{int(i):08d}" for i in t["id"].to_pylist()]
        return _images_table(ids, w, h)

    # Batch size balances per-batch Ray overhead (~ms each) against worker
    # heap; scratch-buffer reuse in the codec makes larger batches safe.
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def _images_table(ids: list[str], w: int, h: int) -> pa.Table:
    fmts = ["raw" if int(i.rsplit("-", 1)[1]) % 3 == 0 else "qz" for i in ids]
    n = len(ids)
    # Vectorized: one batched pixel generation, one batched quantize, one
    # batched aHash; only the final bytes assembly is per-row.
    px = codec.reference_pixels_batch(codec.id_seeds(ids), w, h)
    fmt_codes = np.array([0 if f == "raw" else 1 for f in fmts], np.uint8)
    # Arrow-native batch encode: one buffer + offsets, no per-row bytes.
    blob_array = codec.encode_batch_arrow(px, fmt_codes)
    # aHash: downsample FIRST (8×8 grid), then gray-mean — avoids a
    # full-resolution float conversion of the whole batch.
    small_px = px[:, :: max(h // 8, 1), :: max(w // 8, 1), :][:, :8, :8, :]
    small = small_px.astype(np.float32).mean(axis=3)
    bits = small > small.mean(axis=(1, 2), keepdims=True)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)[
        : bits.shape[1], : bits.shape[2]
    ]
    phashes = (
        (bits * weights[None]).reshape(n, -1).sum(axis=1, dtype=np.uint64)
    ).astype(np.int64)
    return pa.table(
        {
            "image_id": pa.array(ids),
            "bytes": blob_array,
            "w": pa.array([w] * len(ids), pa.int32()),
            "h": pa.array([h] * len(ids), pa.int32()),
            "fmt": pa.array(fmts),
            "caption": pa.array([caption_for(i) for i in ids]),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def make_images(
    n: int = 1000, w: int = 16, h: int = 16, seed_prefix: str = "img"
) -> pa.Table:
    """Image+caption table exactly matching BASELINE.json's ``input_hint``:
    (image_id, bytes, w, h, fmt, caption, phash). The ``phash`` column is
    the standard public aHash (8×8 mean-threshold) construction."""
    ids = [f"{seed_prefix}-{i:08d}" for i in range(n)]
    return _images_table(ids, w, h)


def _images_table_jpeg(
    ids: list[str], w: int, h: int, wrong_pixel_mod: int | None = None
) -> pa.Table:
    from linref_ray.kernels.jpeg import jpeg_encode

    n = len(ids)
    px = codec.reference_pixels_batch(codec.id_seeds(ids), w, h).copy()
    phashes = _ahash_batch(px)
    blobs = []
    for j, pid in enumerate(ids):
        i = int(pid.rsplit("-", 1)[1])
        if wrong_pixel_mod and i % wrong_pixel_mod == 57 % wrong_pixel_mod:
            wrong = codec.reference_pixels(pid + "~corrupt", w, h)
            blobs.append(jpeg_encode(wrong, quality=100))
        else:
            blobs.append(jpeg_encode(px[j], quality=100))
    return pa.table(
        {
            "image_id": pa.array(ids),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([w] * n, pa.int32()),
            "h": pa.array([h] * n, pa.int32()),
            "fmt": pa.array(["jpeg"] * n),
            "caption": pa.array([caption_for(i) for i in ids]),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def make_images_jpeg(
    n: int = 1000,
    w: int = 16,
    h: int = 16,
    seed_prefix: str = "jpg",
    wrong_pixel_mod: int | None = None,
) -> pa.Table:
    """Image corpus whose ``bytes`` are REAL baseline JPEG (input_hint
    schema, ``fmt='jpeg'``) — the codec is the pure-spec encoder in
    :mod:`linref_ray.kernels.jpeg` at quality=100, whose round-trip error
    stays under the 40 dB PSNR invariant even on the noise reference.

    ``wrong_pixel_mod=m`` plants pixel corruption: rows with index
    ``i % m == 57 % m`` encode the reference pixels of a DIFFERENT seed —
    a perfectly valid JPEG whose decode mismatches the reference (~8 dB),
    the JPEG analog of the raw-corpus bit-inversion (entropy-coded bytes
    cannot be bit-flipped without breaking the Huffman stream)."""
    ids = [f"{seed_prefix}-{i:08d}" for i in range(n)]
    return _images_table_jpeg(ids, w, h, wrong_pixel_mod)


def make_images_jpeg_stream(
    n: int,
    w: int = 16,
    h: int = 16,
    seed_prefix: str = "jpg",
    wrong_pixel_mod: int | None = None,
    num_blocks: int = 16,
):
    """Distributed variant of :func:`make_images_jpeg`: generation (and
    the sequential entropy coding it entails) runs inside ``map_batches``
    tasks keyed only by row index — content is partitioning-independent,
    same contract as :func:`make_images_stream`."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=num_blocks)

    def gen(t: pa.Table) -> pa.Table:
        ids = [f"{seed_prefix}-{int(i):08d}" for i in t["id"].to_pylist()]
        return _images_table_jpeg(ids, w, h, wrong_pixel_mod)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=128)


def _ahash_batch(px: np.ndarray) -> np.ndarray:
    """aHash (8×8 mean-threshold) — same construction as _images_table."""
    n, h, w = px.shape[:3]
    small_px = px[:, :: max(h // 8, 1), :: max(w // 8, 1), :][:, :8, :8, :]
    small = small_px.astype(np.float32).mean(axis=3)
    bits = small > small.mean(axis=(1, 2), keepdims=True)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)[
        : bits.shape[1], : bits.shape[2]
    ]
    return (
        (bits * weights[None]).reshape(n, -1).sum(axis=1, dtype=np.uint64)
    ).astype(np.int64)


def make_videos(
    n: int = 20, frames: int = 12, w: int = 16, h: int = 16, fps: float = 30.0
) -> pa.Table:
    """Deterministic video corpus in the fake LRVD container: frame f of
    video i reuses the image reference-pixel generator with seed (i, f), so
    sampled frames are reproducible pure functions of (video_id, frame)."""
    from linref_ray.media import encode_video

    ids, blobs = [], []
    for i in range(n):
        seeds = codec.id_seeds([f"vid-{i:06d}-{f:04d}" for f in range(frames)])
        px = codec.reference_pixels_batch(seeds, w, h).copy()
        ids.append(f"vid-{i:06d}")
        blobs.append(encode_video(px))
    return pa.table(
        {
            "video_id": pa.array(ids),
            "bytes": pa.array(blobs, pa.binary()),
            "n_frames": pa.array([frames] * n, pa.int32()),
            "fps": pa.array([fps] * n, pa.float64()),
            "w": pa.array([w] * n, pa.int32()),
            "h": pa.array([h] * n, pa.int32()),
        }
    )


def make_audio(
    n: int = 20, seconds: float = 1.0, sample_rate: int = 8000,
    acodec: str = "pcm16",
) -> pa.Table:
    """Deterministic audio corpus: clip i is a pure tone at (100 + 50*i)
    Hz plus seeded noise — spectral features have known expected ordering
    for tests. ``acodec='pcm16'`` emits the fake LRAU container;
    ``'flac'`` emits REAL lossless FLAC (pure-spec codec), bit-identical
    samples after decode."""
    from linref_ray.media import encode_audio

    ids, blobs, tones = [], [], []
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(1000 + i))
        freq = 100.0 + 50.0 * i
        x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.002 * rng.normal(size=len(t))
        s = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        ids.append(f"aud-{i:06d}")
        blobs.append(encode_audio(s, sample_rate, acodec=acodec))
        tones.append(freq)
    return pa.table(
        {
            "audio_id": pa.array(ids),
            "bytes": pa.array(blobs, pa.binary()),
            "sample_rate": pa.array([sample_rate] * n, pa.int32()),
            "tone_hz": pa.array(tones, pa.float64()),
        }
    )
