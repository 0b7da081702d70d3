"""JPEG codec (ITU-T T.81 / ISO 10918-1), pure stdlib + NumPy.

Closes the last real-world image-format gap behind the optional Pillow
lane (VERDICT r9 ask #8; progressive added r11 per r10 ask #4):
baseline sequential AND progressive DCT JPEGs — the formats of
essentially every web-crawl photo — decode for real in-sandbox. Scope:

- SOF0/SOF1 (Huffman sequential, 8-bit) and SOF2 (progressive, Annex G:
  spectral selection + successive approximation, DC and AC refinement
  scans, EOBn run codes); arithmetic/lossless/hierarchical SOFs are
  rejected loudly by marker.
- Huffman entropy coding with 0xFF00 byte unstuffing and RSTn restart
  markers (DRI honored; DC predictors and EOB runs reset at restarts).
- 1-component (grayscale) and 3-component (YCbCr) scans, any sampling
  factors up to 4 (4:4:4, 4:2:2, 4:2:0 in the wild); chroma upsampling
  is sample replication (nearest), the spec's suggested simple filter.
- Dequantize → dezigzag → 8x8 IDCT (separable orthonormal DCT matrix,
  float64) → level shift → BT.601 YCbCr→RGB (JFIF full-range).
  Progressive accumulates scans into an int64 coefficient store and
  runs the identical IDCT at EOI — baseline and progressive decodes of
  equal coefficients are equal to the byte (the matmul association is
  deliberately shared; see _quantize_blocks/_finalize_progressive).

The encoder emits baseline 4:4:4, 4:2:2 or 4:2:0 with the Annex K
example quantization (IJG quality scaling) and Huffman tables, and with
``progressive=True`` a real SOF2 scan script (interleaved DC at Al=1 →
DC refinement → per-component AC scans, optionally with AC successive
approximation) — it
exists so the decode path can be pinned: for block-constant GRAY images with EVEN
sample values at quality 50, encode→decode is EXACT (the DC quantizer
16 divides 8·(v-128); every AC and chroma coefficient is exactly zero),
which gives the x4 family a cross-engine md5-arithmetic oracle over a
genuinely lossy format — through BOTH processes. General-image fidelity
is pinned by error-bound round-trip tests plus the differential pin
that progressive and baseline encodes of the same input decode
bit-identically (same coefficients, reordered scans).

Threat model (same as :mod:`imagecodec`): header dimensions are
attacker-controlled, so the frame surface is capped by
``imagecodec.MAX_DECODE_PIXELS`` BEFORE any plane allocates, and every
entropy-decode loop is bounded by the block count the header implies —
a crafted stream can waste its own bytes, never multi-GB allocations.

No reference counterpart (the reference imports CMS assets as opaque
resources); layout and tables follow the public spec (T.81 Annexes B,
C, F, K) and the JFIF 1.02 color conventions.
"""

from __future__ import annotations

import struct

import numpy as np

from wwwision_importservice_spark.operators.imagecodec import (
    MAX_DECODE_PIXELS,
    ImageDecodeError,
)

#: JPEG shares the family's surface ceiling: shrinking it would silently
#: reject real 24-61 MP camera photos (standard DSLR output since ~2012),
#: which is worse than the honest cost of float planes. That cost is
#: bounded and documented: float32 planes + rgb out + one reused float32
#: conversion temp, measured 20.5 bytes/pixel peak at 4:4:4 (tracemalloc
#: test pins < 32 B/px), ≈ 1.4 GB transient at the 64M-px ceiling —
#: per-image, within a 4 GB/thread executor budget; size Arrow batches
#: accordingly (``spark.sql.execution.arrow.maxRecordsPerBatch``). The
#: cap's job is the 65535x65535 (4.3 Gpx, 80+ GB) crafted-header case,
#: not taxing legitimate photographs.
MAX_JPEG_PIXELS = MAX_DECODE_PIXELS

# --------------------------------------------------------------------------
# spec tables

#: zigzag scan order: ZIGZAG[k] = (row*8 + col) of the k-th coefficient
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: T.81 Annex K.1 example luminance/chrominance quantization (zigzag order
#: is NOT used here — these are in natural row-major order)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 typical Huffman tables: (BITS counts for lengths 1..16,
# HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: encoder chroma grids: (horizontal, vertical) luma sampling factors
_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}

#: orthonormal 8-point DCT-II matrix: IDCT(B) = C.T @ B @ C, FDCT = C @ b @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )


def _canonical_codes(bits: list[int], vals: list[int]):
    """T.81 Annex C code generation: (symbol → (code, length)) and the
    decode map ((length, code) → symbol)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (libjpeg convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((STD_LUMA_Q * scale + 50) // 100, 1, 255)
    chroma = np.clip((STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    return luma, chroma


# --------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, raw bits) of a DC diff / AC value (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a, bits = abs(v), v
    size = a.bit_length()
    if v < 0:
        bits = v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_enc: dict, ac_enc: dict,
) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    # JPEG's DCT scaling is 8x the orthonormal one per axis pair: the
    # orthonormal matrix already matches the spec's S(u,v) definition
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qz.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, ln = dc_enc[size]
    w.write(code, ln)
    w.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_enc[(run << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 50,
    subsampling: str = "420",
    grayscale: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    ac_successive: bool = False,
) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (Annex K tables, IJG
    quality scaling, ``'444'``, ``'422'`` or ``'420'`` chroma). Lossy in
    general; exact for block-constant gray with even values at quality
    50 (see module docstring — the property the oracle row rests on).
    ``grayscale=True`` writes a 1-component scan from the luma plane;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart resync path).
    ``progressive=True`` (r11) emits SOF2 with a real multi-scan
    script — interleaved DC first scan at Al=1, a DC refinement scan
    restoring bit 0, then one full-band AC scan per component — the
    same coefficients as the baseline stream, reordered, so
    decode(progressive) == decode(baseline) bit for bit and the exact
    even-gray q50 construction round-trips through BOTH paths."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"image dimensions must be positive, got {h}x{w}")
    if h > 65535 or w > 65535:
        # SOF0 stores dimensions as big-endian u16; fail loudly rather
        # than letting struct.pack raise an opaque struct.error later.
        raise ValueError(f"JPEG dimensions capped at 65535, got {h}x{w}")
    rgb = arr.astype(np.float64)
    y = np.clip(np.round(
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ), 0, 255)

    def pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
        ph = (-plane.shape[0]) % mh
        pw = (-plane.shape[1]) % mw
        return np.pad(plane, ((0, ph), (0, pw)), mode="edge")

    luma_q, chroma_q = _quality_tables(quality)
    sh, sv = (1, 1) if grayscale else _SUBSAMPLING[subsampling]
    cb = cr = None
    if not grayscale:
        cb = np.clip(np.round(
            128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
            + 0.5 * rgb[:, :, 2]
        ), 0, 255)
        cr = np.clip(np.round(
            128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
            - 0.081312 * rgb[:, :, 2]
        ), 0, 255)
        if sh > 1 or sv > 1:
            # pad to the pooling grid with edge replication, then mean
            # over each sv x sh cell (horizontal-only for 4:2:2)
            def pool(p):
                p = np.pad(p, ((0, (-h) % sv), (0, (-w) % sh)), mode="edge")
                hh, ww = p.shape[0] // sv, p.shape[1] // sh
                return np.round(p.reshape(hh, sv, ww, sh).mean(axis=(1, 3)))

            cb, cr = pool(cb), pool(cr)
        cb = pad_to(cb, 8, 8)
        cr = pad_to(cr, 8, 8)
    y = pad_to(y, 8 * sv, 8 * sh)

    if progressive:
        return _encode_progressive(
            y, cb, cr, luma_q, chroma_q, grayscale, sh, sv, h, w,
            restart_interval, ac_sa=ac_successive,
        )

    dc_l_enc, _ = _canonical_codes(*_DC_LUMA)
    ac_l_enc, _ = _canonical_codes(*_AC_LUMA)
    dc_c_enc, _ = _canonical_codes(*_DC_CHROMA)
    ac_c_enc, _ = _canonical_codes(*_AC_CHROMA)

    wtr = _BitWriter()
    pred = [0, 0, 0]
    mcuy, mcux = y.shape[0] // (8 * sv), y.shape[1] // (8 * sh)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    r0, c0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    pred[0] = _encode_block(
                        wtr, y[r0 : r0 + 8, c0 : c0 + 8], luma_q,
                        pred[0], dc_l_enc, ac_l_enc,
                    )
            if not grayscale:
                for ci, plane in ((1, cb), (2, cr)):
                    r0, c0 = my * 8, mx * 8
                    pred[ci] = _encode_block(
                        wtr, plane[r0 : r0 + 8, c0 : c0 + 8], chroma_q,
                        pred[ci], dc_c_enc, ac_c_enc,
                    )
            mcu_count += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table[ZIGZAG]))

    def dht(cls: int, tid: int, spec: tuple) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    if grayscale:
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        tables = dqt(0, luma_q) + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    else:
        sof = seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        tables = (
            dqt(0, luma_q) + dqt(1, chroma_q)
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
        )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + tables + dri
        + sof + sos + bytes(wtr.out) + b"\xff\xd9"
    )


def _quantize_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize a padded 8-multiple plane to (bh, bw, 64)
    zigzag-order int64 coefficients — the progressive encoder computes
    every block up front because each scan revisits all of them."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    b = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    # batched matmul in the SAME association as _encode_block's
    # (C @ b) @ C.T — bit-identical float64, so baseline and
    # progressive encodes quantize to the SAME coefficients even at
    # exact-.5 rounding boundaries (einsum's own contraction order
    # diverged there by one quantum)
    coef = np.matmul(np.matmul(_C, b), _C.T)
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    return qz.reshape(bh, bw, 64)[:, :, ZIGZAG]


def _encode_block_ac_refine(wtr, zz, ss, se, al, ac_enc) -> None:
    """AC refinement-scan emission for one block (T.81 G.1.2.3),
    mirroring the decoder's consumption order exactly: newly nonzero
    coefficients (history zero at Al+1 precision, bit one at Al) are
    run-coded with s=1 plus a sign bit, correction bits for passed
    nonzero-history coefficients follow each code in positional order,
    ZRL advances over 16 zero-history positions, and a terminal EOB
    carries the remaining correction bits. No cross-block EOB runs
    (every EOB is a run of one — spec-valid, simpler)."""
    shift = al + 1

    def hist(j):  # magnitude the decoder already holds before this scan
        return abs(int(zz[j])) >> shift

    def corrbit(j):
        return (abs(int(zz[j])) >> al) & 1

    k = ss
    newpos = [j for j in range(ss, se + 1) if hist(j) == 0 and corrbit(j)]
    for np_k in newpos:
        zh = [j for j in range(k, np_k) if hist(j) == 0]
        r = len(zh)
        while r > 15:
            boundary = zh[15]  # the 16th zero-history position
            code, ln = ac_enc[0xF0]  # ZRL
            wtr.write(code, ln)
            for j in range(k, boundary):
                if hist(j) != 0:
                    wtr.write(corrbit(j), 1)
            k = boundary + 1
            zh = zh[16:]
            r -= 16
        code, ln = ac_enc[(r << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if int(zz[np_k]) > 0 else 0, 1)
        for j in range(k, np_k):
            if hist(j) != 0:
                wtr.write(corrbit(j), 1)
        k = np_k + 1
    if k <= se:
        code, ln = ac_enc[0x00]  # EOB: run of one block
        wtr.write(code, ln)
        for j in range(k, se + 1):
            if hist(j) != 0:
                wtr.write(corrbit(j), 1)


def _encode_progressive(
    y, cb, cr, luma_q, chroma_q, grayscale, sh, sv, h, w, restart_interval,
    ac_sa=False,
) -> bytes:
    """SOF2 progressive emission (T.81 Annex G): interleaved DC first
    scan at Al=1, DC refinement scan restoring bit 0 (successive
    approximation), then per-component AC scans (spectral selection,
    non-interleaved as the spec requires) — full-band Ss=1..63 at Al=0
    by default, or with ``ac_sa`` a first scan at Al=1 plus a
    refinement scan at Al=0 (AC successive approximation, exercising
    the decoder's G.1.2.3 correction-bit path). The final coefficients
    are identical to the baseline stream's — only the scan order
    differs — so progressive and baseline decodes of the same input are
    bit-identical, the differential pin the tests use."""
    dc_l_enc, _ = _canonical_codes(*_DC_LUMA)
    ac_l_enc, _ = _canonical_codes(*_AC_LUMA)
    dc_c_enc, _ = _canonical_codes(*_DC_CHROMA)
    ac_c_enc, _ = _canonical_codes(*_AC_CHROMA)
    # (comp id, plane, q, dc_enc, ac_enc, h, v, Td, Ta)
    if grayscale:
        comps = [(1, y, luma_q, dc_l_enc, ac_l_enc, 1, 1, 0, 0)]
    else:
        comps = [
            (1, y, luma_q, dc_l_enc, ac_l_enc, sh, sv, 0, 0),
            (2, cb, chroma_q, dc_c_enc, ac_c_enc, 1, 1, 1, 1),
            (3, cr, chroma_q, dc_c_enc, ac_c_enc, 1, 1, 1, 1),
        ]
    qb = [_quantize_blocks(c[1], c[2]) for c in comps]
    n = len(comps)
    mcuy, mcux = y.shape[0] // (8 * sv), y.shape[1] // (8 * sh)

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                blocks = []
                for ci, c in enumerate(comps):
                    hc, vc = c[5], c[6]
                    for by in range(vc):
                        for bx in range(hc):
                            blocks.append((ci, my * vc + by, mx * hc + bx))
                yield blocks

    def rst_marker(wtr, state):
        wtr.flush()
        wtr.out += bytes([0xFF, 0xD0 + state["rst"]])
        state["rst"] = (state["rst"] + 1) % 8

    # scan 1: DC first, all components interleaved, Ah=0 Al=1 — values
    # arrive point-transformed (arithmetic >> Al, matching G.1.2.1)
    wtr = _BitWriter()
    pred = [0] * n
    state = {"rst": 0}
    cnt = 0
    for blocks in mcu_blocks():
        if restart_interval and cnt and cnt % restart_interval == 0:
            rst_marker(wtr, state)
            pred = [0] * n
        for ci, byi, bxi in blocks:
            v = int(qb[ci][byi, bxi, 0]) >> 1
            size, bits = _magnitude(v - pred[ci])
            pred[ci] = v
            code, ln = comps[ci][3][size]
            wtr.write(code, ln)
            wtr.write(bits, size)
        cnt += 1
    wtr.flush()
    dc_first = bytes(wtr.out)

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block, no
    # Huffman (G.1.2.1: the bit is simply appended)
    wtr = _BitWriter()
    state = {"rst": 0}
    cnt = 0
    for blocks in mcu_blocks():
        if restart_interval and cnt and cnt % restart_interval == 0:
            rst_marker(wtr, state)
        for ci, byi, bxi in blocks:
            wtr.write(int(qb[ci][byi, bxi, 0]) & 1, 1)
        cnt += 1
    wtr.flush()
    dc_refine = bytes(wtr.out)

    # AC scans: per component, non-interleaved raster over the
    # component's OWN grid (which can be narrower than the MCU-padded
    # store on odd dimensions — padding blocks keep only their DC,
    # which is cropped away at decode)
    hmax = max(c[5] for c in comps)
    vmax = max(c[6] for c in comps)

    def emit_ac_first(wtr, zz, al_):
        # run/size coding of the point-transformed band (G.1.2.2);
        # per-block EOB (an EOB run of one)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            v = (abs(v) >> al_) * (1 if v > 0 else -1)  # trunc toward 0
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_enc[(run << 4) | size]
            wtr.write(code, ln)
            wtr.write(bits, size)
            run = 0
        if run:
            code, ln = ac_enc[0x00]  # EOB
            wtr.write(code, ln)

    ac_scans = []
    for ci, c in enumerate(comps):
        cid, _, _, _, ac_enc, hc, vc, _, ta = c
        bw_ni = -(-(-(-w * hc // hmax)) // 8)
        bh_ni = -(-(-(-h * vc // vmax)) // 8)
        passes = (
            [("first", 0, 1), ("refine", 1, 0)] if ac_sa
            else [("first", 0, 0)]
        )
        for kind, ah_, al_ in passes:
            wtr = _BitWriter()
            state = {"rst": 0}
            cnt = 0
            for byi in range(bh_ni):
                for bxi in range(bw_ni):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        rst_marker(wtr, state)
                    zz = qb[ci][byi, bxi]
                    if kind == "first":
                        emit_ac_first(wtr, zz, al_)
                    else:
                        _encode_block_ac_refine(wtr, zz, 1, 63, al_, ac_enc)
                    cnt += 1
            wtr.flush()
            ac_scans.append((cid, ta, ah_, al_, bytes(wtr.out)))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table[ZIGZAG]))

    def dht(cls: int, tid: int, spec: tuple) -> bytes:
        bits_, vals = spec
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits_) + bytes(vals)
        )

    def sos(specs, ss_, se_, ah_, al_) -> bytes:
        body = bytes([len(specs)])
        for cid, td, ta in specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss_, se_, (ah_ << 4) | al_])
        return seg(0xFFDA, body)

    if grayscale:
        sof = seg(
            0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        )
        tables = dqt(0, luma_q) + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
        dc_specs = [(1, 0, 0)]
    else:
        sof = seg(
            0xFFC2,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        tables = (
            dqt(0, luma_q) + dqt(1, chroma_q)
            + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
            + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
        )
        dc_specs = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out = b"\xff\xd8" + app0 + tables + dri + sof
    out += sos(dc_specs, 0, 0, 0, 1) + dc_first
    out += sos(dc_specs, 0, 0, 1, 0) + dc_refine
    for cid, ta, ah_, al_, blob in ac_scans:
        out += sos([(cid, 0, ta)], 1, 63, ah_, al_) + blob
    return out + b"\xff\xd9"


# --------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; RSTn markers surface through :meth:`at_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        # Mask consumed bits out of the accumulator (mirrors _BitWriter):
        # without this, acc grows ~8 bits per entropy byte and every shift
        # copies an ever-growing bignum, making decode quadratic in stream
        # length (measured 225s for a 0.49 MB stream; linear after masking).
        self.acc &= (1 << self.n) - 1
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                return False
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    return True  # restart marker: stop filling
                else:
                    return True  # EOI or next segment
                self.acc = (self.acc << 8) | 0xFF
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise ImageDecodeError("JPEG: entropy data exhausted")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = dec.get((length, code))
            if sym is not None:
                return sym
        raise ImageDecodeError("JPEG: invalid Huffman code")

    def sync_restart(self) -> None:
        """Consume a RSTn marker and realign to the byte boundary."""
        self.acc, self.n = 0, 0
        d = self.data
        # skip any pad bits already consumed; marker begins at self.pos
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ImageDecodeError("JPEG: expected restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` raw bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB. Grayscale files are
    replicated to RGB (the family's canonical layout). Rejects loudly:
    non-baseline SOFs, >4 sampling factors, missing tables, truncated
    entropy data, frames past the ``MAX_DECODE_PIXELS`` ceiling."""
    if data[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    comps: list[dict] = []
    progressive = False
    geom: dict | None = None
    store: list[np.ndarray] | None = None
    scans_done = 0
    saw_eoi = False

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ImageDecodeError(f"JPEG: expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — skip them or a spec-valid file misparses its length
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break  # fill bytes ran to EOF → the no-SOS error below
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI: ends a progressive file; else no-scan
            saw_eoi = True
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ImageDecodeError("JPEG: truncated segment")
        nxt = pos + 2 + seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                if p + n > len(body):
                    raise ImageDecodeError("JPEG: truncated DQT")
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, p).astype(np.int64)
                else:
                    vals = np.frombuffer(body, np.uint8, 64, p).astype(np.int64)
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = table
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise ImageDecodeError("JPEG: truncated DHT header")
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                total = sum(bits)
                vals = list(body[p + 17 : p + 17 + total])
                if len(vals) < total:
                    raise ImageDecodeError("JPEG: truncated DHT")
                _, dec = _canonical_codes(bits, vals)
                if cls == 0 and vals and max(vals) > 11:
                    # 8-bit baseline caps DC categories at 11 (T.81
                    # F.1.2.1.2); a crafted table mapping a code to e.g.
                    # 255 would make the magnitude read produce a 2^255
                    # int that overflows the int64 coefficient store —
                    # reject the table ONCE at parse, keeping the hot
                    # per-block decode loop validation-free
                    raise ImageDecodeError(
                        f"JPEG: DC category {max(vals)} out of range"
                    )
                (huff_ac if cls else huff_dc)[tid] = dec
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ImageDecodeError("JPEG: truncated SOF header")
            prec, fh, fw, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ImageDecodeError(f"JPEG: unsupported precision {prec}")
            if nf not in (1, 3):
                raise ImageDecodeError(f"JPEG: {nf} components unsupported")
            if fw == 0 or fh == 0:
                # 0 <= ceiling passes the pixel check but would yield a
                # degenerate (0, W, 3) array; spec-invalid, reject loudly.
                raise ImageDecodeError(f"JPEG: zero frame dimension {fw}x{fh}")
            if fw * fh > MAX_JPEG_PIXELS:
                raise ImageDecodeError(
                    f"JPEG {fw}x{fh} exceeds the {MAX_JPEG_PIXELS}-pixel "
                    "decode ceiling (SOF dims are untrusted; see "
                    "MAX_JPEG_PIXELS for the float-plane byte budget)"
                )
            if len(body) < 6 + 3 * nf:
                raise ImageDecodeError("JPEG: truncated SOF component list")
            comps = []
            for i in range(nf):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ImageDecodeError(f"JPEG: bad sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = (fw, fh, nf)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                f"JPEG: non-baseline SOF 0x{marker:02x} unsupported "
                "(arithmetic/lossless/hierarchical out of scope)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ImageDecodeError("JPEG: truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ImageDecodeError("JPEG: SOS before SOF")
            if not body:
                raise ImageDecodeError("JPEG: truncated SOS")
            ns = body[0]
            if not 1 <= ns <= 4:
                # T.81 B.2.3: 1 <= Ns <= 4. ns=0 would reach the
                # progressive units() with an empty member list and die
                # on a bare IndexError instead of the typed error the
                # fake/strict policy catches (r11 review catch).
                raise ImageDecodeError(f"JPEG: invalid SOS component count {ns}")
            if len(body) < 1 + 2 * ns + 3:
                raise ImageDecodeError("JPEG: truncated SOS component list")
            scan_sel = {}
            scan_ids = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_sel[cs] = (tt >> 4, tt & 0x0F)
                scan_ids.append(cs)
            if not progressive:
                if ns != frame[2]:
                    raise ImageDecodeError(
                        "JPEG: non-interleaved multi-scan files unsupported"
                    )
                return _decode_scan(
                    data, nxt, frame, comps, scan_sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if geom is None:
                geom, store = _progressive_init(frame, comps)
            pos = _progressive_scan(
                data, nxt, comps, geom, store, scan_ids, scan_sel,
                ss, se, ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval,
            )
            scans_done += 1
            continue
        # APPn / COM / others: skipped
        pos = nxt
    if progressive and scans_done:
        # the marker loop needs 4 lookahead bytes (marker + length) but
        # EOI is bare 2 — accept it at the tail directly
        if not saw_eoi and not (
            pos + 2 <= len(data)
            and data[pos] == 0xFF
            and data[pos + 1] == 0xD9
        ):
            raise ImageDecodeError("JPEG: truncated progressive stream")
        return _finalize_progressive(frame, comps, geom, store, qt)
    raise ImageDecodeError("JPEG: no scan data (missing SOS)")


def _decode_scan(
    data, pos, frame, comps, scan_sel, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    fw, fh, nf = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            # spec-legal but wild sampling grids (e.g. luma 3x3 over
            # chroma 2x2) need fractional upsampling — out of scope,
            # rejected loudly like every other unsupported shape
            raise ImageDecodeError(
                f"JPEG: non-integral sampling ratio {c['h']}x{c['v']} "
                f"vs max {hmax}x{vmax} unsupported"
            )
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        # float32, not float64: integral sample values to 255 are exact
        # in both, and the planes are the decoder's dominant allocation
        # (see MAX_JPEG_PIXELS — the ceiling and this dtype are one
        # budget decision)
        planes.append(np.zeros((ph, pw), dtype=np.float32))
        if c["tq"] not in qt:
            raise ImageDecodeError(f"JPEG: missing quant table {c['tq']}")
        if c["id"] not in scan_sel:
            raise ImageDecodeError(
                f"JPEG: scan does not cover frame component {c['id']}"
            )
        dc_id, ac_id = scan_sel[c["id"]]
        if dc_id not in huff_dc or ac_id not in huff_ac:
            raise ImageDecodeError("JPEG: missing Huffman table")
        c["q"] = qt[c["tq"]].reshape(8, 8)
        c["dc"] = huff_dc[dc_id]
        c["ac"] = huff_ac[ac_id]

    rdr = _BitReader(data, pos)
    pred = [0] * nf
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rdr.sync_restart()
                pred = [0] * nf
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        # size <= 11 guaranteed: DC tables are rejected
                        # at DHT parse if any symbol exceeds the 8-bit
                        # baseline category maximum
                        size = rdr.decode_huffman(c["dc"])
                        diff = _extend(rdr.receive(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_huffman(c["ac"])
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ImageDecodeError(
                                    "JPEG: AC run past block end"
                                )
                            zz[k] = _extend(rdr.receive(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        block = _C.T @ (
                            coef.reshape(8, 8) * c["q"]
                        ).astype(np.float64) @ _C + 128.0
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_count += 1

    return _planes_to_rgb(planes, comps, fw, fh, nf, hmax, vmax)


def _planes_to_rgb(planes, comps, fw, fh, nf, hmax, vmax) -> np.ndarray:
    """Shared decode tail (baseline and progressive): crop + upsample
    (sample replication) to full resolution, then the in-place BT.601
    conversion whose byte budget MAX_JPEG_PIXELS is priced against."""
    out = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:fh, :fw])
    if nf == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    # channel-at-a-time conversion: ONE reused float32 temp plus the
    # float32 planes themselves (shifted/scaled in place through the
    # cropped views) — measured peak 20.5 bytes/pixel, the budget
    # MAX_JPEG_PIXELS is priced against (pinned by the bytes-per-pixel
    # tracemalloc test).
    # float32 arithmetic error on values ≤ ~440 is ~3e-5 — five orders
    # of magnitude under the 0.5 integer-rounding boundary, and the
    # exact-gray oracle path carries integer values where it is zero.
    y, cb, cr = out
    cb -= np.float32(128.0)
    cr -= np.float32(128.0)
    rgb = np.empty((fh, fw, 3), dtype=np.uint8)
    tmp = np.empty((fh, fw), dtype=np.float32)
    # R = y + 1.402 cr
    np.multiply(cr, np.float32(1.402), out=tmp)
    tmp += y
    np.round(tmp, out=tmp)
    rgb[:, :, 0] = np.clip(tmp, 0, 255, out=tmp)
    # G = y - 0.344136 cb - 0.714136 cr; cr is dead after this row, so
    # scale it in place instead of allocating a transient
    np.multiply(cb, np.float32(-0.344136), out=tmp)
    tmp += y
    cr *= np.float32(0.714136)
    tmp -= cr
    np.round(tmp, out=tmp)
    rgb[:, :, 1] = np.clip(tmp, 0, 255, out=tmp)
    # B = y + 1.772 cb
    np.multiply(cb, np.float32(1.772), out=tmp)
    tmp += y
    np.round(tmp, out=tmp)
    rgb[:, :, 2] = np.clip(tmp, 0, 255, out=tmp)
    return rgb


# --------------------------------------------------------------------------
# progressive decoding (T.81 Annex G, spectral selection + successive
# approximation; r11, VERDICT r10 ask #4)


def _progressive_init(frame, comps):
    """Geometry + the per-component coefficient store a progressive
    file accumulates scans into. Stores are MCU-padded (interleaved DC
    scans address the full padded grid) and int64 in zigzag order —
    int64 because a crafted DC scan can walk the predictor up to
    ~2^11 x block-count before the point-transform shift, which
    overflows int32 on large frames; the honest cost is ~8 bytes per
    sample on top of the float planes (≈ 770 MB extra at the shared
    64M-px ceiling, still inside the documented per-image budget)."""
    fw, fh, _ = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ImageDecodeError(
                f"JPEG: non-integral sampling ratio {c['h']}x{c['v']} "
                f"vs max {hmax}x{vmax} unsupported"
            )
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    geom = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy, "ni": []}
    store = []
    for c in comps:
        # non-interleaved grid: ceil(component samples / 8) per axis
        # (T.81 A.2.2) — smaller than the padded grid when the frame
        # doesn't fill its last MCU column/row
        cw = -(-fw * c["h"] // hmax)
        ch = -(-fh * c["v"] // vmax)
        geom["ni"].append((-(-ch // 8), -(-cw // 8)))
        store.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        )
    return geom, store


def _progressive_scan(
    data, pos, comps, geom, store, scan_ids, scan_sel,
    ss, se, ah, al, huff_dc, huff_ac, restart_interval,
):
    """Decode ONE progressive scan into the coefficient store and
    return the stream position of the next marker. DC scans (Ss=0) may
    interleave components; AC scans are single-component over the
    non-interleaved grid (T.81 G.2). First scans (Ah=0) Huffman-decode
    point-transformed values; refinement scans append one bit per
    coefficient (DC) or run the Annex G.1.2.3 correction-bit algorithm
    (AC)."""
    if al > 13 or ah > 13:
        raise ImageDecodeError("JPEG: successive approximation out of range")
    if ah and ah != al + 1:
        raise ImageDecodeError("JPEG: refinement scan with Ah != Al + 1")
    if ss > 63 or se > 63:
        raise ImageDecodeError("JPEG: bad spectral selection")
    idx = {c["id"]: i for i, c in enumerate(comps)}
    members = []
    for cid in scan_ids:
        if cid not in idx:
            raise ImageDecodeError(
                f"JPEG: scan component {cid} not in frame"
            )
        ci = idx[cid]
        td, ta = scan_sel[cid]
        if ss == 0:
            table = huff_dc.get(td) if ah == 0 else None
            if ah == 0 and table is None:
                raise ImageDecodeError("JPEG: missing Huffman table")
        else:
            table = huff_ac.get(ta)
            if table is None:
                raise ImageDecodeError("JPEG: missing Huffman table")
        members.append((ci, comps[ci], table))

    if ss == 0:
        if se != 0:
            raise ImageDecodeError("JPEG: DC scan with nonzero Se")
    else:
        if len(members) != 1:
            raise ImageDecodeError(
                "JPEG: progressive AC scans must be single-component"
            )
        if ss > se:
            raise ImageDecodeError("JPEG: bad spectral selection")

    def units():
        # one yielded list per restart unit: an MCU (interleaved) or a
        # single block (non-interleaved), T.81 G.2 / A.2
        if len(members) > 1:
            for my in range(geom["mcuy"]):
                for mx in range(geom["mcux"]):
                    blocks = []
                    for ci, c, tbl in members:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blocks.append(
                                    (ci, my * c["v"] + by, mx * c["h"] + bx,
                                     tbl)
                                )
                    yield blocks
        else:
            ci, c, tbl = members[0]
            bh, bw = geom["ni"][ci]
            for byi in range(bh):
                for bxi in range(bw):
                    yield [(ci, byi, bxi, tbl)]

    rdr = _BitReader(data, pos)
    pred = {ci: 0 for ci, _, _ in members}
    eobrun = 0
    unit_count = 0
    for blocks in units():
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            rdr.sync_restart()
            pred = {ci: 0 for ci, _, _ in members}
            eobrun = 0
        for ci, byi, bxi, tbl in blocks:
            zz = store[ci][byi, bxi]
            if ss == 0:
                if ah == 0:
                    size = rdr.decode_huffman(tbl)
                    pred[ci] += _extend(rdr.receive(size), size)
                    zz[0] = pred[ci] << al
                elif rdr.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(rdr, zz, ss, se, al, tbl, eobrun)
            else:
                eobrun = _ac_refine(rdr, zz, ss, se, al, tbl, eobrun)
        unit_count += 1

    # the reader prefetches whole bytes, so rdr.pos may sit a few
    # entropy/pad bytes before the next marker — scan forward to it
    # (unstuffed 0xFF + non-zero, non-RSTn IS a marker by definition;
    # spurious trailing RSTn are skipped as scan debris)
    p = rdr.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _ac_first(rdr, zz, ss, se, al, ac, eobrun):
    """AC first scan for one block (T.81 G.1.2.2): baseline RLE plus
    EOBn end-of-band run codes; values arrive point-transformed."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rdr.decode_huffman(ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rdr.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ImageDecodeError("JPEG: AC run past spectral band")
        zz[k] = _extend(rdr.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(rdr, zz, ss, se, al, ac, eobrun):
    """AC refinement for one block (T.81 G.1.2.3): each
    nonzero-history coefficient passed over consumes one correction
    bit; newly nonzero coefficients arrive as ±1 << Al placed after a
    zero-history run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode_huffman(ac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.receive(r)
                    break
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ImageDecodeError(
                        "JPEG: bad AC refinement magnitude"
                    )
                val = p1 if rdr.read_bit() else m1
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if rdr.read_bit() and (cur & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(zz[k])
            if cur != 0:
                if rdr.read_bit() and (cur & p1) == 0:
                    zz[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finalize_progressive(frame, comps, geom, store, qt):
    """All scans consumed: dequantize + IDCT the coefficient store and
    hand off to the shared crop/upsample/convert tail. The IDCT runs
    one block-row stripe at a time so the float64 temp stays at
    8 x plane-width, never a second full-plane allocation."""
    fw, fh, nf = frame
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ImageDecodeError(f"JPEG: missing quant table {c['tq']}")
        q = qt[c["tq"]].reshape(8, 8).astype(np.float64)
        zzs = store[ci]
        bh, bw = zzs.shape[:2]
        plane = np.empty((bh * 8, bw * 8), dtype=np.float32)
        for row in range(bh):
            # dezigzag INSIDE the stripe loop (r11 review catch): a
            # whole-plane `nat` would be a second full int64 store —
            # ~another 770 MB transient at the 64M-px ceiling — exactly
            # what the stripe-at-a-time rationale above exists to avoid
            nat_row = np.zeros_like(zzs[row])
            nat_row[:, ZIGZAG] = zzs[row]
            m = nat_row.reshape(bw, 8, 8).astype(np.float64) * q
            # batched matmul in the SAME association as the baseline
            # per-block (C.T @ M) @ C — bit-identical float64 results,
            # so progressive and baseline decodes of equal coefficients
            # are equal to the byte (einsum picks its own contraction
            # order and rounds differently at 0.5 boundaries)
            blocks = np.matmul(np.matmul(_C.T, m), _C) + 128.0
            plane[row * 8 : row * 8 + 8] = (
                blocks.transpose(1, 0, 2).reshape(8, bw * 8)
            )
        planes.append(plane)
    hmax, vmax = geom["hmax"], geom["vmax"]
    return _planes_to_rgb(planes, comps, fw, fh, nf, hmax, vmax)
