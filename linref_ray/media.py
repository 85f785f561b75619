"""Video frame-sampling and audio feature-extraction stages (the remaining
multimodal training-pipeline ops from the brief).

Media payloads are opaque ``binary`` columns with typed metadata, exactly
like the image corpus. Audio decodes REAL formats from the public specs —
RIFF/WAVE PCM16 (:func:`wav_decode`) and FLAC
(:mod:`linref_ray.kernels.flac`, pure numpy) — plus the deterministic
``LRAU`` container; mp3 is explicitly out of scope (``_MP3_MSG`` names
the integration point). Video containers (mp4/h264) have no stdlib
decode path, so the deterministic ``LRVD`` container carries real
per-frame pixels and other codecs raise ``NotImplementedError``.
Everything Ray-side — schema, batch sizing, actor signature,
row-expansion output layout — is real and tested, and sampled frames
re-encode into the IMAGE container so the existing image stages
(verify / resize / feature-extract) compose downstream.

Scale notes: frame sampling is a row-expansion ``map_batches`` (small
batches — each input row fans out to k wide rows); audio features drop the
payload column before any shuffle, same rule as the image sidecar.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from linref_ray.kernels import codec

_VID_HEADER = struct.Struct("<4sHHHB3s")  # magic, w, h, n_frames, codec, pad
_AUD_HEADER = struct.Struct("<4sIIB3s")   # magic, sample_rate, n_samples, codec, pad
VID_MAGIC = b"LRVD"
AUD_MAGIC = b"LRAU"
def _check_on_error(on_error: str) -> str:
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    return on_error


_VCODEC = {"rawv": 0}
_ACODEC = {"pcm16": 0}
_MP3_MSG = (
    "mp3 decode is out of scope: a conformant layer-III decoder needs the "
    "full polyphase filterbank + Huffman machinery with no stdlib "
    "shortcut and no codec library ships in this container — plug "
    "soundfile/librosa here. WAV PCM, FLAC "
    "(linref_ray.kernels.flac, pure-spec) and the LRAU container decode."
)


# -- fake containers (deterministic; the stub decode target) ----------------


def encode_video(pixels: np.ndarray, vcodec: str = "rawv") -> bytes:
    """(n_frames, h, w, 3) uint8 → fake container bytes."""
    if vcodec not in _VCODEC:
        raise NotImplementedError(
            f"video codec {vcodec!r}: real encoders (h264/vp9) are not in "
            "this container — plug pyav/ffmpeg here"
        )
    n, h, w, _ = pixels.shape
    return (
        _VID_HEADER.pack(VID_MAGIC, w, h, n, _VCODEC[vcodec], b"\x00" * 3)
        + pixels.tobytes()
    )


def decode_video(data: bytes) -> np.ndarray:
    """Fake-container bytes → (n_frames, h, w, 3) uint8. The stub decode:
    anything that is not the deterministic ``LRVD`` container raises, naming
    the integration point for a real decoder."""
    magic, w, h, n, code, _ = _VID_HEADER.unpack_from(data, 0)
    if magic != VID_MAGIC:
        raise NotImplementedError(
            "real video decode (h264/vp9 via pyav/ffmpeg) is stubbed in "
            "this container; only the deterministic LRVD container decodes"
        )
    px = np.frombuffer(data, dtype=np.uint8, offset=_VID_HEADER.size)
    return px.reshape(n, h, w, 3).copy()


def encode_audio(samples: np.ndarray, sample_rate: int, acodec: str = "pcm16") -> bytes:
    """int16 PCM samples → audio bytes (LRAU container, or real FLAC via
    ``acodec='flac'`` — the pure-spec codec in
    :mod:`linref_ray.kernels.flac`)."""
    if acodec == "flac":
        from linref_ray.kernels.flac import flac_encode

        return flac_encode(np.asarray(samples, dtype=np.int16), sample_rate)
    if acodec not in _ACODEC:
        raise NotImplementedError(
            f"audio codec {acodec!r}: " + _MP3_MSG
        )
    s = np.asarray(samples, dtype=np.int16)
    return (
        _AUD_HEADER.pack(AUD_MAGIC, sample_rate, len(s), _ACODEC[acodec], b"\x00" * 3)
        + s.tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Audio bytes → (mono int16 samples, sample_rate).

    Dispatches on magic: real RIFF/WAVE PCM (pure-stdlib parser,
    :func:`wav_decode`), real FLAC (pure-spec decoder,
    :mod:`linref_ray.kernels.flac` — multi-channel streams downmix to mono
    by averaging), or the deterministic ``LRAU`` container. mp3 is
    explicitly out of scope (see ``_MP3_MSG``).
    """
    if data[:4] == b"RIFF":
        return wav_decode(data)
    if data[:4] == b"fLaC":
        from linref_ray.kernels.flac import flac_decode

        s, sr = flac_decode(data)
        mono = s[:, 0] if s.shape[1] == 1 else np.round(
            s.mean(axis=1)
        ).astype(np.int64)
        return np.clip(mono, -32768, 32767).astype(np.int16), sr
    if len(data) < _AUD_HEADER.size or data[:4] != AUD_MAGIC:
        raise NotImplementedError(_MP3_MSG)
    magic, sr, n, code, _ = _AUD_HEADER.unpack_from(data, 0)
    if magic != AUD_MAGIC:
        raise NotImplementedError(_MP3_MSG)
    s = np.frombuffer(data, dtype=np.int16, offset=_AUD_HEADER.size)[:n]
    return s.copy(), sr


# -- real WAV codec (pure stdlib; RIFF/WAVE PCM16) ---------------------------


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 PCM → canonical 44-byte-header WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    payload = s.tobytes()
    n = len(payload)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", n) + payload
    )


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 samples, sample_rate).

    PCM (format 1) 16-bit only; multi-channel input downmixes to mono by
    integer-mean across channels. Walks RIFF chunks, so extra chunks
    (LIST/INFO, fact) are skipped correctly.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    sr = nch = bits = fmt_code = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, nch, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif tag == b"data":
            payload = body
    if fmt_code is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format {fmt_code}/{bits}-bit: only PCM16 decodes here"
        )
    s = np.frombuffer(
        payload[: (len(payload) // (2 * nch)) * 2 * nch], dtype=np.int16
    )
    if nch > 1:
        s = (
            s.reshape(-1, nch).astype(np.int32).mean(axis=1)
        ).astype(np.int16)
    return s.copy(), sr


# -- stages ------------------------------------------------------------------


class SampleFrames:
    """Actor stage: decode each video and emit ``k`` uniformly-spaced frames
    as IMAGE-container rows (so the image verify/resize/feature stages
    compose downstream). Setup (nothing heavy here, but a real decoder's
    codec context would init once per actor) in ``__init__``; per-batch work
    in ``__call__``."""

    def __init__(self, k: int = 4, fmt: str = "raw",
                 on_error: str = "raise"):
        self.k = k
        self.fmt = fmt
        self.on_error = _check_on_error(on_error)

    def __call__(self, t: pa.Table) -> pa.Table:
        vids = t["video_id"].to_pylist()
        blobs = t["bytes"].to_pylist()
        fps = (
            t["fps"].to_numpy(zero_copy_only=False)
            if "fps" in t.column_names
            else np.full(len(t), 30.0)
        )
        out_id, out_vid, out_idx, out_ts = [], [], [], []
        out_w, out_h = [], []
        sampled: list[np.ndarray] = []
        for i, blob in enumerate(blobs):
            try:
                frames = decode_video(blob)
            except Exception:
                if self.on_error == "skip":
                    continue  # undecodable video: emit no frames
                raise
            n = len(frames)
            take = np.unique(
                np.linspace(0, n - 1, num=min(self.k, n)).round().astype(int)
            )
            for j in take:
                out_id.append(f"{vids[i]}#f{int(j):04d}")
                out_vid.append(vids[i])
                out_idx.append(int(j))
                out_ts.append(float(j) / float(fps[i] or 30.0))
                sampled.append(frames[j])
                out_h.append(frames.shape[1])
                out_w.append(frames.shape[2])
        out_bytes = self._encode_frames(sampled)
        return pa.table(
            {
                "image_id": pa.array(out_id),
                "video_id": pa.array(out_vid),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_sec": pa.array(out_ts, pa.float64()),
                "bytes": out_bytes,
                "w": pa.array(out_w, pa.int32()),
                "h": pa.array(out_h, pa.int32()),
                "fmt": pa.array([self.fmt] * len(out_id)),
            }
        )

    def _encode_frames(self, sampled: list[np.ndarray]) -> pa.Array:
        """Arrow-native batch encode per uniform-shape group (container
        formats only); per-frame encode otherwise (png etc.)."""
        if not sampled:
            return pa.array([], pa.binary())
        from linref_ray.kernels.codec import _FMT_CODES

        if self.fmt in _FMT_CODES:
            shapes = np.array([f.shape[:2] for f in sampled])
            code = _FMT_CODES[self.fmt]
            parts: list[pa.Array] = []
            pos: list[np.ndarray] = []
            for hw in np.unique(shapes, axis=0):
                m = (shapes == hw).all(axis=1)
                stack = np.stack(
                    [f for f, keep in zip(sampled, m) if keep]
                )
                parts.append(
                    codec.encode_batch_arrow(
                        stack, np.full(len(stack), code, np.uint8)
                    )
                )
                pos.append(np.flatnonzero(m))
            combined = pa.concat_arrays(parts)
            inv = np.empty(len(sampled), dtype=np.int64)
            inv[np.concatenate(pos)] = np.arange(len(sampled))
            return combined.take(pa.array(inv))
        return pa.array(
            [codec.encode_image(f, self.fmt) for f in sampled], pa.binary()
        )


def sample_frames(
    videos: ray.data.Dataset,
    k: int = 4,
    fmt: str = "raw",
    concurrency: int = 4,
    batch_size: int = 64,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Uniform k-frame sampling as an actor-pool stage. Batches are SMALL
    (64 videos) because each row fans out to k wide frame rows — the
    memory-aware sizing rule for large binary payloads.
    ``on_error='skip'`` drops undecodable videos instead of failing the
    job (the web-scale default posture; see VerifyInvariants)."""
    return videos.map_batches(
        SampleFrames,
        fn_constructor_kwargs=dict(k=k, fmt=fmt, on_error=on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class AudioFeatures:
    """Actor stage: decode PCM and compute real spectral features with
    numpy's rFFT (no external audio lib needed for the math): RMS level,
    zero-crossing rate, spectral centroid and rolloff (85%). The wide
    payload column is dropped — only the slim feature sidecar continues."""

    def __init__(self, n_fft: int = 1024, on_error: str = "raise"):
        self.n_fft = n_fft
        self.on_error = _check_on_error(on_error)
        # Hann window (built once per actor): a rectangular window's slow
        # sidelobe falloff smears tones across the spectrum and biases the
        # centroid high by hundreds of Hz.
        self.window = np.hanning(n_fft)

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = t["bytes"].to_pylist()
        n = len(blobs)
        rms = np.empty(n)
        zcr = np.empty(n)
        centroid = np.empty(n)
        rolloff = np.empty(n)
        # Decode + time-domain stats per row (variable track lengths), but
        # run ONE batched rFFT over the stacked fixed-length segments — the
        # per-row FFT was the stage wall. Same values: numpy's FFT applies
        # the identical per-row transform along axis=-1.
        segs = np.zeros((n, self.n_fft), dtype=np.float64)
        srs = np.empty(n, dtype=np.float64)
        ok = np.ones(n, dtype=bool)
        for i, blob in enumerate(blobs):
            try:
                s, sr = decode_audio(blob)
            except Exception:
                if self.on_error == "skip":
                    ok[i] = False
                    srs[i] = 0.0
                    rms[i] = zcr[i] = 0.0
                    continue
                raise
            srs[i] = sr
            x = s.astype(np.float64) / 32768.0
            if len(x) == 0:
                rms[i] = zcr[i] = 0.0
                continue
            rms[i] = float(np.sqrt(np.mean(x * x)))
            zcr[i] = float(
                np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))
            ) if len(x) > 1 else 0.0
            m = min(len(x), self.n_fft)
            segs[i, :m] = x[:m]
        mags = np.abs(np.fft.rfft(segs * self.window[None, :], axis=1))
        base = np.fft.rfftfreq(self.n_fft, d=1.0)  # × sr per row below
        tots = mags.sum(axis=1)
        safe = np.maximum(tots, 1e-300)
        centroid = (mags @ base) / safe * srs
        cums = np.cumsum(mags, axis=1)
        idx = np.minimum(
            (cums < (0.85 * tots)[:, None]).sum(axis=1), mags.shape[1] - 1
        )
        rolloff = base[idx] * srs
        dead = tots <= 0
        centroid[dead] = 0.0
        rolloff[dead] = 0.0
        keep = [c for c in t.column_names if c != "bytes"]
        out = t.select(keep)
        for name, arr in (
            ("rms", rms), ("zcr", zcr),
            ("spectral_centroid", centroid), ("spectral_rolloff", rolloff),
        ):
            out = out.append_column(name, pa.array(arr))
        if not ok.all():
            out = out.filter(pa.array(ok))  # drop undecodable rows
        return out


def extract_audio_features(
    audios: ray.data.Dataset,
    n_fft: int = 1024,
    concurrency: int = 4,
    batch_size: int = 256,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Audio feature-extract as an actor-pool stage (decoder/FFT plan state
    lives per actor). ``on_error='skip'`` drops undecodable rows instead
    of failing the job."""
    return audios.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(n_fft=n_fft, on_error=on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class VideoSignatures:
    """Actor stage: per-video perceptual signature in ONE decode pass —
    sample ``k`` uniform frames, pHash (or aHash) each frame's gray plane,
    combine by strict per-bit majority into a 64-bit video signature.
    No frame re-encode, no second decode; only (video_id, sig) leaves."""

    def __init__(self, k: int = 4, method: str = "phash",
                 on_error: str = "raise"):
        from linref_ray.kernels.phash import (
            ahash64_batch,
            phash64_batch,
        )

        if method not in ("ahash", "phash"):
            raise ValueError(f"unknown signature method: {method!r}")
        self.on_error = _check_on_error(on_error)
        self.k = k
        self.batch_fn = ahash64_batch if method == "ahash" else phash64_batch

    def __call__(self, t: pa.Table) -> pa.Table:
        vids = t["video_id"].to_pylist()
        n_vid = len(t)
        # One decode pass collecting every sampled gray frame, then ONE
        # batched hash over the whole (video, frame) stack — the per-frame
        # Python hash loop was the stage wall. Frames stack per uniform
        # shape group (mixed shapes hash per group, still batched).
        grays: list[np.ndarray] = []
        owner: list[int] = []
        n_take = np.zeros(n_vid, dtype=np.int64)
        ok = np.ones(n_vid, dtype=bool)
        for i, blob in enumerate(t["bytes"].to_pylist()):
            try:
                frames = decode_video(blob)
            except Exception:
                if self.on_error == "skip":
                    ok[i] = False
                    continue
                raise
            n = len(frames)
            take = np.unique(
                np.linspace(0, n - 1, num=min(self.k, n)).round().astype(int)
            )
            n_take[i] = len(take)
            for j in take:
                grays.append(frames[j].astype(np.float32).mean(axis=2))
                owner.append(i)
        if not grays:
            return pa.table(
                {
                    "video_id": pa.array(vids, pa.string()),
                    "sig": pa.array(
                        np.zeros(n_vid, np.int64)
                    ),
                }
            )
        own = np.asarray(owner)
        fh = np.empty(len(grays), dtype=np.uint64)
        shapes = np.array([g.shape for g in grays])
        for hw in np.unique(shapes, axis=0):
            m = (shapes == hw).all(axis=1)
            stack = np.stack([g for g, keep in zip(grays, m) if keep])
            fh[m] = self.batch_fn(stack)
        bits = (
            fh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]
        ) & np.uint64(1)
        # per-video strict bit majority, vectorized over videos
        sums = np.zeros((n_vid, 64), dtype=np.int64)
        np.add.at(sums, own, bits.astype(np.int64))
        maj = sums * 2 > n_take[:, None]
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        sigs = (
            (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        ).astype(np.int64)
        out = pa.table(
            {"video_id": pa.array(vids, pa.string()), "sig": pa.array(sigs)}
        )
        return out.filter(pa.array(ok)) if not ok.all() else out


def video_near_duplicates(
    videos: ray.data.Dataset,
    k: int = 4,
    method: str = "phash",
    max_hamming: int = 6,
    prefix_bits: int = 12,
    max_bucket: int = 4096,
    concurrency: int = 4,
    batch_size: int = 64,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Near-duplicate video pairs (id_a < id_b, hamming ≤ ``max_hamming``)
    via frame-sampled majority-bit perceptual signatures, verified by the
    generic prefix-bucketed Hamming stage shared with text SimHash and
    image near-dup (:func:`linref_ray.dedup.hash_near_duplicates`).
    Wide video payloads never leave the signature stage.
    ``on_error='skip'`` drops undecodable videos instead of failing."""
    from linref_ray.dedup import hash_near_duplicates

    sigs = videos.map_batches(
        VideoSignatures,
        fn_constructor_kwargs=dict(k=k, method=method, on_error=on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    return hash_near_duplicates(
        sigs,
        max_hamming=max_hamming,
        prefix_bits=prefix_bits,
        max_bucket=max_bucket,
        id_col="video_id",
        hash_col="sig",
    )


class AudioSignatures:
    """Actor stage: 64-bit audio fingerprint per clip — 9 equal windows,
    8 linear FFT energy bands each, bit = band energy rises between
    consecutive windows (8 transitions × 8 bands). The sign-of-difference
    construction (Philips-robust-hash style, public) is invariant to
    volume scaling; only (audio_id, sig) rows leave the stage."""

    _WINDOWS = 9
    _BANDS = 8

    def __init__(self, on_error: str = "raise"):
        self.on_error = _check_on_error(on_error)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["audio_id"].to_pylist()
        sigs = np.zeros(len(t), dtype=np.int64)
        ok = np.ones(len(t), dtype=bool)
        for i, blob in enumerate(t["bytes"].to_pylist()):
            try:
                samples, _sr = decode_audio(blob)
            except Exception:
                if self.on_error == "skip":
                    ok[i] = False
                    continue
                raise
            x = samples.astype(np.float64)
            w, b = self._WINDOWS, self._BANDS
            n = max(len(x) // w, 1)
            if len(x) < w * n:
                x = np.pad(x, (0, w * n - len(x)))
            spec = np.abs(np.fft.rfft(x[: w * n].reshape(w, n), axis=1)) ** 2
            edges = np.linspace(
                0, spec.shape[1], b + 1
            ).astype(int)[:-1]
            bands = np.add.reduceat(spec, edges, axis=1)
            bits = (bands[1:] > bands[:-1]).ravel()
            val = np.uint64(0)
            for j in np.flatnonzero(bits):
                val |= np.uint64(1) << np.uint64(int(j))
            sigs[i] = np.int64(val.astype(np.int64))
        out = pa.table(
            {"audio_id": pa.array(ids, pa.string()), "sig": pa.array(sigs)}
        )
        return out.filter(pa.array(ok)) if not ok.all() else out


def audio_near_duplicates(
    audio: ray.data.Dataset,
    max_hamming: int = 6,
    prefix_bits: int = 12,
    max_bucket: int = 4096,
    concurrency: int = 4,
    batch_size: int = 128,
    on_error: str = "raise",
) -> ray.data.Dataset:
    """Near-duplicate audio pairs (id_a < id_b, hamming ≤ ``max_hamming``)
    via the spectral-difference fingerprint, verified by the generic
    prefix-bucketed Hamming stage shared with text/image/video dedup."""
    from linref_ray.dedup import hash_near_duplicates

    sigs = audio.map_batches(
        AudioSignatures,
        fn_constructor_kwargs=dict(on_error=on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    return hash_near_duplicates(
        sigs,
        max_hamming=max_hamming,
        prefix_bits=prefix_bits,
        max_bucket=max_bucket,
        id_col="audio_id",
        hash_col="sig",
    )
