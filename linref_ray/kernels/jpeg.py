"""Pure-stdlib baseline JPEG codec (ITU-T T.81, public spec) — no libjpeg.

The container ships no image libraries, so the engine's real-format decode
layer implements baseline sequential DCT JPEG from the public standard:

- **Encoder**: JFIF baseline, 8-bit, greyscale or YCbCr 4:4:4 / 4:2:0,
  Annex K quantization tables scaled by the IJG quality formula, Annex K.3
  standard Huffman tables, optional restart intervals. Block DCT /
  quantization are vectorized (einsum over all 8×8 blocks at once); only
  the entropy coder is sequential, as the format demands.
- **Decoder**: baseline SOF0 — DQT/DHT/DRI/SOS parsing, per-stream Huffman
  tables (T.81 F.16 mincode/maxcode/valptr decode), restart markers,
  arbitrary sampling factors h,v ∈ {1,2}, byte unstuffing. Entropy decode
  fills per-component coefficient arrays first; dequantization, inverse
  zigzag, IDCT and color conversion then run as single vectorized numpy
  passes over every block of the image.

Wired into :func:`linref_ray.kernels.codec.decode_image` magic dispatch
(``FF D8``) exactly like the PNG path, so JPEG corpora flow through the
``VerifyInvariants`` actor stage unchanged. Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ``NotImplementedError``.

At quality=100 with 4:4:4 the quantization step is 1 everywhere, so
round-trip error is bounded by color-convert + DCT rounding (~±2/pixel):
PSNR stays ≥40 dB even on white-noise pixels — that property lets the
deterministic-noise reference corpus run the decoded-pixel PSNR invariant
over real JPEG bytes (see ``image_invariants_jpeg``).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Public constant tables from ITU-T T.81 (Annex K) — spec data, not code.
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QTAB_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTAB_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public formula):
    scale = 5000/q (q<50) else 200-2q; entries clipped to [1, 255].
    quality=100 → every step is 1 (near-lossless baseline)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for tab in (QTAB_LUMA, QTAB_CHROMA):
        t = (tab * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (H//8 * W//8, 8, 8), raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 64) zigzag-ordered quantized coefficients."""
    coefs = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
    q = qtab[UNZIGZAG].reshape(8, 8)
    quant = np.round(coefs / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical Huffman assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size class, amplitude bits) with one's-complement negatives."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(w: _BitWriter, coefs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(coefs[0])
    s, amp = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(amp, s)
    run = 0
    nz = np.flatnonzero(coefs[1:])
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        pos = int(idx) + 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, amp = _magnitude(int(coefs[1 + idx]))
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(amp, s)
    if pos < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (chroma box-averaged 2×2); default is
    4:4:4. ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (exercises the decoder's restart path)."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("pixels must be (h, w[, 3]) uint8")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qy, qc = quality_tables(quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        yp, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            cb2 = _pad_to_block(cb, 2, 2)
            cr2 = _pad_to_block(cr, 2, 2)
            cb = cb2.reshape(cb2.shape[0] // 2, 2, cb2.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = cr2.reshape(cr2.shape[0] // 2, 2, cr2.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yp, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Per component: pad to the full MCU grid, block, transform, quantize.
    comp_coefs: list[np.ndarray] = []
    comp_bw: list[int] = []
    for plane, (hs, vs), qi in zip(planes, samp, qsel):
        plane = _pad_to_block(plane, mcuy * vs * 8, mcux * hs * 8)
        blocks = _blockify(plane)
        comp_coefs.append(_fdct_quant(blocks, qy if qi == 0 else qc))
        comp_bw.append(mcux * hs)  # blocks per row for this component

    dc_y = _encode_codes(*_DC_LUMA)
    ac_y = _encode_codes(*_AC_LUMA)
    dc_c = _encode_codes(*_DC_CHROMA)
    ac_c = _encode_codes(*_AC_CHROMA)
    tabs = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0))
    for tid, tab in ((0, qy), (1, qc))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in tab
        )
    nf = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for i, ((hs, vs), qi) in enumerate(zip(samp, qsel)):
        out += struct.pack(">BBB", i + 1, (hs << 4) | vs, qi)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (cls << 4) | tid
        ) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for i in range(nf):
        td_ta = 0 if i == 0 else 0x11
        out += struct.pack(">BB", i + 1, td_ta)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    preds = [0] * nf
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nf
            for ci, (hs, vs) in enumerate(samp):
                bw = comp_bw[ci]
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * bw + (mx * hs + bx)
                        preds[ci] = _encode_block(
                            writer, comp_coefs[ci][bi], preds[ci], *tabs[ci]
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _HuffTable:
    """T.81 F.16 decode structure: mincode/maxcode/valptr per code length."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over an unstuffed entropy-coded segment."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[ln]:
                return table.values[table.valptr[ln] + code - table.mincode[ln]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _unstuff_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded data at RST markers and unstuff FF00.

    Returns (segments, position of the terminating marker's FF byte)."""
    segments: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = data[pos + 1]
        if m == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # a real marker (EOI or next segment) terminates the scan
            break
    segments.append(bytes(cur))
    return segments, pos


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grey broadcast to RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body[o : o + 64], dtype=np.uint8
                    ).astype(np.int64)
                    o += 64
                else:
                    tab = np.frombuffer(
                        body[o : o + 128], dtype=">u2"
                    ).astype(np.int64)
                    o += 128
                qtables[tq] = tab
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                cnt = sum(bits)
                vals = list(body[o + 17 : o + 17 + cnt])
                htables[(cls, tid)] = _HuffTable(bits, vals)
                o += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, fh, fw, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            comps = []
            for i in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scomps.append((cs, tdta >> 4, tdta & 15))
            segments, pos = _unstuff_segments(data, pos)
            return _decode_scan(
                frame, scomps, qtables, htables, segments, restart_interval
            )
        # APPn / COM / everything else: skipped
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, scomps, qtables, htables, segments,
                 restart_interval) -> np.ndarray:
    fh, fw, comps = frame
    byid = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    total_mcus = mcux * mcuy

    # Guard untrusted inputs: a corrupted SOF can claim 65535x65535 and
    # drive a multi-TB coefficient allocation BEFORE entropy decode would
    # fail — bound the per-component coefficient memory instead (512 MiB
    # covers any plausible baseline image at 8 bytes/coefficient).
    if total_mcus * hmax * vmax * 64 * 8 > 512 << 20:
        raise ValueError(
            f"implausible JPEG dimensions {fw}x{fh} (coefficient store "
            "over 512 MiB)"
        )

    order = []  # (comp index, hs, vs, dc table, ac table, blocks per row)
    coef_store: list[np.ndarray] = []
    for ci, (cs, td, ta) in enumerate(scomps):
        _, hs, vs, _tq = byid[cs]
        order.append(
            (ci, hs, vs, htables[(0, td)], htables[(1, ta)], mcux * hs)
        )
        coef_store.append(
            np.zeros((mcuy * vs * mcux * hs, 64), dtype=np.int64)
        )

    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        reader = _BitReader(seg)
        preds = [0] * len(scomps)
        limit = (
            min(mcu + restart_interval, total_mcus)
            if restart_interval
            else total_mcus
        )
        while mcu < limit:
            my, mx = divmod(mcu, mcux)
            for ci, hs, vs, dct, act, bw in order:
                for by in range(vs):
                    for bx in range(hs):
                        coefs = coef_store[ci][
                            (my * vs + by) * bw + (mx * hs + bx)
                        ]
                        s = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu += 1
    if mcu < total_mcus:
        raise ValueError(
            f"JPEG scan ended early ({mcu}/{total_mcus} MCUs)"
        )

    # Vectorized reconstruction: dequant → unzigzag → IDCT per component.
    planes = []
    for (ci, hs, vs, _dct, _act, bw), coefs in zip(order, coef_store):
        cs = scomps[ci][0]
        qtab = qtables[byid[cs][3]]
        dq = (coefs * qtab[None, :])[:, UNZIGZAG].reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _DCT, dq.astype(np.float64),
                            _DCT) + 128.0
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        plane = (
            spatial.reshape(ph // 8, pw // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph, pw)
        )
        # upsample to the full grid and crop
        if hs < hmax or vs < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
