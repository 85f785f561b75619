"""Deterministic image codecs + PSNR — the multimodal invariant layer.

The container has no image libraries (no PIL/libjpeg), so per the build brief
the *codec* is a deterministic stand-in while the Ray-side plumbing (binary
columns, decode actor stages, PSNR verification) is real:

- ``raw``: header + raw uint8 RGB bytes (lossless).
- ``qz``:  quantize each channel to 6 bits (value -> (v >> 2 << 2) + 2), a
  "lossy" codec with max per-pixel error 2 → worst-case PSNR
  20·log10(255/2) ≈ 42.1 dB, satisfying the ≥40 dB invariant from
  BASELINE.json's ``input_hint`` by construction while still exercising a
  real decoded-pixel comparison.

Real-format decode is implemented from the public specs: PNG below
(stdlib zlib + numpy) and baseline JPEG in :mod:`linref_ray.kernels.jpeg`
(pure numpy ITU-T T.81 — encoder and decoder, no libjpeg).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"LRIM"
_HEADER = struct.Struct("<4sHHB3s")  # magic, w, h, fmt code, pad
_FMT_CODES = {"raw": 0, "qz": 1}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}


def encode_image(pixels: np.ndarray, fmt: str = "raw") -> bytes:
    """Encode an (h, w, 3) uint8 array: our container, or a real PNG."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt == "raw":
        payload = pixels.tobytes()
    elif fmt == "qz":
        payload = (((pixels >> 2) << 2) + 2).astype(np.uint8).tobytes()
    elif fmt == "png":
        return png_encode(pixels)
    elif fmt == "jpeg":
        from linref_ray.kernels.jpeg import jpeg_encode

        # quality=100: quantization step 1 everywhere, so round-trip error
        # is color-convert + DCT rounding only — stays above the 40 dB
        # invariant even on the white-noise reference corpus.
        return jpeg_encode(pixels, quality=100)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _HEADER.pack(MAGIC, w, h, _FMT_CODES[fmt], b"\x00" * 3) + payload


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode image bytes → ((h, w, 3) uint8, fmt name).

    Dispatches on magic: our deterministic container ('raw'/'qz') or a
    real PNG (pure-stdlib zlib decoder, :func:`png_decode`). JPEG stays
    stubbed (no codec library in this container).
    """
    if data[:8] == _PNG_MAGIC:
        return png_decode(data), "png"
    if data[:2] == b"\xff\xd8":
        from linref_ray.kernels.jpeg import jpeg_decode

        return jpeg_decode(data), "jpeg"
    magic, w, h, code, _ = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("bad image magic")
    fmt = _FMT_NAMES[code]
    pixels = np.frombuffer(data, dtype=np.uint8, offset=_HEADER.size)
    return pixels.reshape(h, w, 3).copy(), fmt


# ---------------------------------------------------------------------------
# Real PNG codec — pure stdlib (zlib) + numpy, no image libraries.
# Decoder: 8-bit greyscale/RGB/RGBA (color types 0/2/6), non-interlaced,
# all five scanline filters. Encoder: filter-0 RGB (valid baseline PNG any
# reader accepts). Enough for the input_hint's fmt='png' rows to run the
# decoded-pixel PSNR invariant for real.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 → baseline truecolor PNG bytes (filter 0 rows)."""
    import zlib

    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 (alpha dropped, grey broadcast to RGB).

    Supports the baseline-corpus shapes: bit depth 8, color types 0/2/6,
    no interlacing. Filters None/Sub/Up are vectorized per row; Average
    and Paeth reconstruct left-to-right (inherently sequential) — our own
    encoder emits filter 0, so the slow path only runs on foreign files.
    """
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if ctype not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG color type {ctype} (only grey/RGB/RGBA)"
                )
            if comp != 0 or filt != 0 or inter != 0:
                raise NotImplementedError("PNG interlace/nonzero methods")
            nch = {0: 1, 2: 3, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * nch
    raw = raw[: h * (stride + 1)].reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        line = raw[r, 1:].astype(np.int32)
        ft = int(filters[r])
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: cumulative sum with lag nch, mod 256
            rec = np.cumsum(line.reshape(w, nch), axis=0).reshape(stride) & 255
        elif ft == 2:  # Up
            rec = (line + prev) & 255
        elif ft == 3:  # Average — left-dependent, sequential
            rec = line.copy()
            for i in range(stride):
                left = rec[i - nch] if i >= nch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth — left-dependent, sequential
            rec = line.copy()
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pp = a + b - c
                pa, pb, pc2 = abs(pp - a), abs(pp - b), abs(pp - c)
                if pa <= pb and pa <= pc2:
                    pred = a
                elif pb <= pc2:
                    pred = b
                else:
                    pred = c
                rec[i] = (rec[i] + pred) & 255
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = rec
        prev = rec.astype(np.int32)
    px = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def psnr_batch(flat_a: np.ndarray, flat_b: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Vectorized PSNR over concatenated flat pixel buffers, split by sizes.

    Equal-size fast path: reshape + an einsum row reduction in int16/float32
    (pixel diffs fit int16; squares sum within float32 precision for any
    realistic image size) — ~20× faster than per-segment reduceat.
    """
    sizes = np.asarray(sizes, dtype=np.int64)
    if len(sizes) and (sizes == sizes[0]).all() and sizes[0] > 0:
        n, m = len(sizes), int(sizes[0])
        d = _scratch("psnr_d", (n, m), np.float32)
        np.subtract(
            flat_a.reshape(n, m), flat_b.reshape(n, m),
            out=d, dtype=np.float32, casting="unsafe",
        )
        mse = np.einsum("ij,ij->i", d, d, dtype=np.float32) / np.float32(m)
        mse = mse.astype(np.float64)
    else:
        diff = flat_a.astype(np.float64) - flat_b.astype(np.float64)
        sq = diff * diff
        bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        sums = np.add.reduceat(sq, bounds[:-1])
        mse = sums / np.maximum(sizes, 1)
    with np.errstate(divide="ignore"):
        out = 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
    return np.where(mse == 0, np.inf, out)


def _fnv64(s: str) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    for b in s.encode():
        h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return h


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain counter-based PRNG). Fully
    IN-PLACE on ``x`` (plus one scratch buffer) — this runs over every
    generated byte, so allocation churn here dominated profiles."""
    with np.errstate(over="ignore"):
        x = np.add(x, np.uint64(0x9E3779B97F4A7C15), out=x)
        t = _scratch("sm64_t", x.shape, np.uint64)
        np.right_shift(x, np.uint64(30), out=t)
        np.bitwise_xor(x, t, out=x)
        np.multiply(x, np.uint64(0xBF58476D1CE4E5B9), out=x)
        np.right_shift(x, np.uint64(27), out=t)
        np.bitwise_xor(x, t, out=x)
        np.multiply(x, np.uint64(0x94D049BB133111EB), out=x)
        np.right_shift(x, np.uint64(31), out=t)
        np.bitwise_xor(x, t, out=x)
        return x


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic ground-truth pixels for a synthetic image id.

    Counter-based (splitmix64 over a per-id seed): pure function of the id,
    so any stage regenerates the reference decode independently (retry- and
    resume-safe), and fully vectorizable per batch — see
    :func:`reference_pixels_batch`.
    """
    return reference_pixels_batch(np.array([_fnv64(image_id)]), w, h)[0].copy()


_SCRATCH: dict = {}


def _scratch(key: str, shape: tuple, dtype) -> np.ndarray:
    """Per-process reusable buffer: map_batches workers are long-lived, and
    re-allocating multi-MB temporaries every batch pays first-touch
    page-zeroing (measured to dominate this host). Buffers are keyed by
    stage+shape; batch sizes are constant per stage so each key stays one
    allocation."""
    buf = _SCRATCH.get(key)
    if buf is None or buf.shape != shape or buf.dtype != dtype:
        buf = np.empty(shape, dtype=dtype)
        _SCRATCH[key] = buf
    return buf


def reference_pixels_batch(seeds: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n, h, w, 3) uint8 reference pixels for an array of 64-bit id seeds."""
    n = len(seeds)
    npix = h * w * 3
    nwords = (npix + 7) // 8
    ctr = _scratch("refpx_ctr", (n, nwords), np.uint64)
    with np.errstate(over="ignore"):
        np.multiply(
            seeds.astype(np.uint64)[:, None],
            np.uint64(0x9E3779B97F4A7C15),
            out=ctr,
        )
        ctr += np.arange(nwords, dtype=np.uint64)[None, :]
    words = _splitmix64(ctr)  # in-place on ctr
    raw = words.view(np.uint8).reshape(n, nwords * 8)
    if nwords * 8 == npix:
        # Zero-copy view into the scratch buffer — valid until the next
        # call on this worker; every in-repo caller consumes (or copies)
        # before then. Copy if you retain the result.
        return raw.reshape(n, h, w, 3)
    return np.ascontiguousarray(raw[:, :npix]).reshape(n, h, w, 3)


def id_seeds(image_ids: list[str]) -> np.ndarray:
    """FNV-1a seeds for a list of image ids."""
    return np.array([_fnv64(i) for i in image_ids], dtype=np.uint64)


def id_seeds_arrow(arr) -> np.ndarray:
    """FNV-1a seeds straight off a pyarrow string array — bit-identical to
    :func:`id_seeds` (parity-tested) without materializing Python strings.

    Reads the Arrow offsets/data buffers zero-copy and folds one byte
    position per pass (ids are short fixed-width strings, so this is a
    handful of vectorized passes instead of a per-row Python loop — the
    per-batch loop dominated the flagship verify stage).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dt: type = np.int64
    else:
        off_dt = np.int32
    if arr.null_count:
        raise ValueError("id column must not contain nulls")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    h = np.full(len(arr), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    maxlen = int(lens.max(initial=0))
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lens > j
            if m.all():
                h ^= data[starts + j].astype(np.uint64)
                h *= prime
            else:
                hm = h[m]
                hm ^= data[starts[m] + j].astype(np.uint64)
                hm *= prime
                h[m] = hm
    return h


def encode_batch_arrow(
    pixel_batch: np.ndarray, fmt_codes: np.ndarray
) -> "pa.Array":
    """Arrow-native batch encode: one contiguous buffer + offsets, zero
    per-row Python ``bytes`` objects (they dominated the hot path).

    ``pixel_batch``: (n, h, w, 3) uint8; ``fmt_codes``: per-row 0=raw 1=qz.
    The qz quantization is applied here for qz rows.
    """
    import pyarrow as pa

    n, h, w, _ = pixel_batch.shape
    npix = h * w * 3
    rec = _HEADER.size + npix
    out = _scratch("enc_out", (n, rec), np.uint8)
    hdr_raw = np.frombuffer(
        _HEADER.pack(MAGIC, w, h, 0, b"\x00" * 3), dtype=np.uint8
    )
    hdr_qz = np.frombuffer(
        _HEADER.pack(MAGIC, w, h, 1, b"\x00" * 3), dtype=np.uint8
    )
    is_qz = fmt_codes.astype(bool)
    out[:, : _HEADER.size] = np.where(is_qz[:, None], hdr_qz, hdr_raw)
    payload = out[:, _HEADER.size :]
    flat_px = pixel_batch.reshape(n, npix)
    np.copyto(payload, flat_px)
    if is_qz.any():
        qz_rows = payload[is_qz]
        np.right_shift(qz_rows, 2, out=qz_rows)
        np.left_shift(qz_rows, 2, out=qz_rows)
        np.add(qz_rows, 2, out=qz_rows)
        payload[is_qz] = qz_rows
    offsets = pa.py_buffer(
        np.arange(0, (n + 1) * rec, rec, dtype=np.int32).tobytes()
    )
    data = pa.py_buffer(out.tobytes())  # one copy into an Arrow buffer
    return pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])


def decode_batch_arrow(col) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Arrow-native batch decode for uniform-size records: returns
    ``(flat_pixels (n, npix) uint8 view, fmt_codes, w, h)`` with ZERO copies
    when the binary column is contiguous and all rows share one shape
    (the generated-corpus fast path); raises ValueError otherwise so the
    caller can fall back to the per-row decoder."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    widths = np.diff(offs)
    if len(widths) == 0 or not (widths == widths[0]).all():
        raise ValueError("non-uniform record sizes")
    rec = int(widths[0])
    values = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    table = values[offs[0] : offs[-1]].reshape(len(col), rec)
    hdr = table[:, : _HEADER.size]
    magic_ok = (hdr[:, :4] == np.frombuffer(MAGIC, np.uint8)).all()
    if not magic_ok:
        raise ValueError("bad magic")
    w = int(hdr[0, 4]) | (int(hdr[0, 5]) << 8)
    h = int(hdr[0, 6]) | (int(hdr[0, 7]) << 8)
    # Per-row header sanity: every record must declare a shape whose pixel
    # count matches the uniform payload length (a corrupt header would
    # otherwise silently mis-split the flat buffer).
    ws = hdr[:, 4].astype(np.int64) | (hdr[:, 5].astype(np.int64) << 8)
    hs = hdr[:, 6].astype(np.int64) | (hdr[:, 7].astype(np.int64) << 8)
    if not ((ws * hs * 3) == rec - _HEADER.size).all():
        raise ValueError("record/header pixel-count mismatch")
    fmt_codes = hdr[:, 8].copy()
    return table[:, _HEADER.size :], fmt_codes, w, h
