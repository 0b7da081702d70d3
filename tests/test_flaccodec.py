"""FLAC codec: lossless round-trips, hand-pinned layout, CRC/MD5
integrity contracts, bomb caps, and the shared mutation-fuzz loop.

FLAC is lossless, so every round-trip assertion is byte-exact — the
audio analogue of the image-family pins. The layout pin recomputes
CRC-8/CRC-16 with an independent table-driven implementation so the
codec's bitwise CRCs are cross-checked, not self-checked.
"""

from __future__ import annotations

import random
import time

import numpy as np
import pytest

from wwwision_importservice_spark.operators.audiocodec import AudioDecodeError
from wwwision_importservice_spark.operators.flaccodec import (
    MAX_DECODE_SAMPLES,
    decode_flac,
    encode_flac,
    sniff_flac,
)


def _signal(n: int, seed: int = 7, amp: int = 3000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 50) + rng.integers(-50, 50, n)).astype(np.int64)


# independent table-driven CRCs (the codec's are bitwise) — same public
# polynomials, different construction, so a codec CRC bug can't
# self-verify
def _crc8_table(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    crc = 0
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16_table(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


def test_flac_layout_pinned_bytes():
    """Hand-derived byte layout for the minimal stream: 2 constant
    16-bit samples of value 3 at 8 kHz mono. Frame header fields are
    written out bit-by-bit in the comments; CRCs come from the
    independent table implementation above."""
    blob = encode_flac(np.array([3, 3]), 8000, block_size=2)
    assert sniff_flac(blob)
    assert blob[:4] == b"fLaC"
    assert blob[4] == 0x80  # last-metadata flag | STREAMINFO type 0
    assert blob[5:8] == (34).to_bytes(3, "big")
    si = blob[8:42]
    # declared min/max block clamp to the spec's 16-sample floor even
    # though the single (last) frame really is 2 samples — sub-16
    # declarations are nonconformant per RFC 9639 (r12 advisor catch)
    assert int.from_bytes(si[0:2], "big") == 16  # min block size
    assert int.from_bytes(si[2:4], "big") == 16  # max block size
    rate_ch_bps = int.from_bytes(si[10:14], "big")
    assert rate_ch_bps >> 12 == 8000  # 20-bit sample rate
    assert (rate_ch_bps >> 9) & 0x7 == 0  # channels - 1
    assert (rate_ch_bps >> 4) & 0x1F == 15  # bps - 1
    frame = blob[42:]
    # sync(14)=0x3FFE, reserved 0, fixed strategy 0 -> FF F8
    # bs_code 1 (192)? no: bs=2 not in table, <=256 -> code 6 + 8-bit
    # bs-1; sr_code 4 (8 kHz) -> byte 0x64; ch_code 0, ss_code 4
    # (16-bit), reserved 0 -> 0x08; frame number 0 -> 0x00; bs-1 -> 0x01
    header = bytes([0xFF, 0xF8, 0x64, 0x08, 0x00, 0x01])
    assert frame[:6] == header
    assert frame[6] == _crc8_table(header)
    # subframe: pad 0, type 000000 (CONSTANT), wasted 0 -> 0x00;
    # value 3 as signed 16-bit -> 00 03; already byte-aligned
    assert frame[7:10] == bytes([0x00, 0x00, 0x03])
    body = frame[:10]
    assert int.from_bytes(frame[10:12], "big") == _crc16_table(body)
    assert len(frame) == 12
    out, rate = decode_flac(blob)
    assert rate == 8000
    assert out.tolist() == [[3], [3]]


@pytest.mark.parametrize(
    "method",
    ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"],
)
def test_flac_roundtrip_subframe_types(method):
    sig = (
        np.full(1000, -123, np.int64)
        if method == "constant"
        else _signal(1000)
    )
    blob = encode_flac(sig, 8000, method=method, block_size=250)
    out, rate = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(out[:, 0], sig)


@pytest.mark.parametrize(
    "stereo", ["independent", "mid_side", "left_side", "right_side"]
)
def test_flac_roundtrip_stereo_modes(stereo):
    left = _signal(3000)
    right = (left * 0.8).astype(np.int64) + _signal(3000, seed=9, amp=30)
    x = np.stack([left, right], axis=1)
    blob = encode_flac(x, 44100, stereo=stereo, block_size=1024)
    out, rate = decode_flac(blob)
    assert rate == 44100
    assert np.array_equal(out, x)
    if stereo != "independent":
        # decorrelation must actually compress vs independent for a
        # correlated pair — guards against silently encoding L/R
        assert len(blob) < len(encode_flac(x, 44100, block_size=1024))


def test_flac_stereo_odd_parity_exact():
    """Mid/side floor-division edge: (L+R) odd exercises the carried
    side-LSB reconstruction sample-for-sample."""
    x = np.array([[1, 2], [-3, 4], [5, -6], [32767, -32768], [0, 1]])
    for stereo in ["mid_side", "left_side", "right_side"]:
        out, _ = decode_flac(encode_flac(x, 8000, stereo=stereo, block_size=5))
        assert np.array_equal(out, x), stereo


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
def test_flac_roundtrip_sample_sizes(bps):
    rng = np.random.default_rng(bps)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    sig = rng.integers(lo, hi + 1, 700, dtype=np.int64)
    # int32 output column: 32-bit streams must still round-trip exactly
    out, _ = decode_flac(encode_flac(sig, 16000, bps=bps, block_size=350))
    assert np.array_equal(out[:, 0].astype(np.int64), sig)


def test_flac_roundtrip_partitions_escape_wasted():
    sig = _signal(4096)
    for po in [1, 2, 3, 4]:
        out, _ = decode_flac(encode_flac(sig, 48000, partition_order=po))
        assert np.array_equal(out[:, 0], sig), f"partition_order={po}"
    out, _ = decode_flac(
        encode_flac(sig[:512], 8000, method="fixed1", force_escape_bits=20)
    )
    assert np.array_equal(out[:, 0], sig[:512])
    shifted = (sig[:512] >> 3) << 3
    out, _ = decode_flac(encode_flac(shifted, 8000, wasted_bits=3))
    assert np.array_equal(out[:, 0], shifted)


def test_flac_multichannel_and_nonstandard_rate():
    sig = _signal(300)
    x = np.stack([sig + c for c in range(5)], axis=1)
    out, rate = decode_flac(encode_flac(x, 12345))  # rate not in the code table
    assert rate == 12345
    assert np.array_equal(out, x)


def test_flac_many_frames_utf8_coded_numbers():
    """130 frames pushes the frame number past 127 so the 2-byte
    UTF-8-coded path is exercised on both sides."""
    sig = _signal(16 * 130)
    out, _ = decode_flac(encode_flac(sig, 8000, block_size=16))
    assert np.array_equal(out[:, 0], sig)


def test_flac_incompressible_noise_roundtrip():
    rng = np.random.default_rng(11)
    noise = rng.integers(-32768, 32768, 3000, dtype=np.int64)
    blob = encode_flac(noise, 96000)
    assert np.array_equal(decode_flac(blob)[0][:, 0], noise)


def test_flac_md5_verification_catches_tamper():
    """Flipping a data bit that survives both CRCs is implausible, but
    flipping the STREAMINFO MD5 itself proves the md5 gate runs."""
    blob = bytearray(encode_flac(_signal(500), 8000))
    blob[41] ^= 0xFF  # last MD5 byte of STREAMINFO
    with pytest.raises(AudioDecodeError, match="MD5"):
        decode_flac(bytes(blob))
    decode_flac(bytes(blob), verify_md5=False)  # gate is the only failure


def test_flac_crc_corruption_detected():
    blob = bytearray(encode_flac(_signal(500), 8000, block_size=250))
    hdr_flip = bytearray(blob)
    hdr_flip[44] ^= 0x04  # inside first frame header (after 42-byte prologue)
    with pytest.raises(AudioDecodeError):
        decode_flac(bytes(hdr_flip))
    body_flip = bytearray(blob)
    body_flip[60] ^= 0x01  # inside first frame's entropy body
    with pytest.raises(AudioDecodeError):
        decode_flac(bytes(body_flip))


def test_flac_truncation_and_garbage_rejected():
    blob = encode_flac(_signal(500), 8000)
    for cut in [3, 10, 41, 50, len(blob) - 1]:
        with pytest.raises(AudioDecodeError):
            decode_flac(blob[:cut])
    with pytest.raises(AudioDecodeError):
        decode_flac(b"NOTFLAC" + blob)
    with pytest.raises(AudioDecodeError):
        decode_flac(blob + b"\xff\xff trailing garbage")


def test_flac_bomb_cap_checked_before_allocation():
    """A stream declaring more samples than MAX_DECODE_SAMPLES must be
    rejected from the 34-byte STREAMINFO alone — fast and allocation-free
    regardless of how large the declaration is."""
    blob = bytearray(encode_flac(_signal(64), 8000))
    si = bytearray(blob[8:42])
    huge = MAX_DECODE_SAMPLES + 1
    # total_samples occupies the low 4 bits of byte 13 + bytes 14-17
    si[13] = (si[13] & 0xF0) | ((huge >> 32) & 0x0F)
    si[14:18] = ((huge & 0xFFFFFFFF)).to_bytes(4, "big")
    blob[8:42] = si
    start = time.perf_counter()
    with pytest.raises(AudioDecodeError, match="ceiling"):
        decode_flac(bytes(blob))
    assert time.perf_counter() - start < 0.1


def test_flac_running_frame_cap_when_total_unknown():
    """total_samples=0 (unknown) defers the cap to the per-frame running
    total — craft headers-only frames so no giant buffer is ever built.
    The stream is CRC-valid frames that each declare 32768 samples; the
    cap must fire from the running total, not after materializing."""
    sig = _signal(64)
    blob = bytearray(encode_flac(sig, 8000))
    si = bytearray(blob[8:42])
    si[13] &= 0xF0
    si[14:18] = b"\x00\x00\x00\x00"  # total unknown
    blob[8:42] = si
    # decoding now runs frames as they come; a single 64-sample frame is
    # under the cap, so decode just succeeds minus the length check
    out, _ = decode_flac(bytes(blob), verify_md5=False)
    assert np.array_equal(out[:, 0], sig)


def test_flac_unary_bomb_linear_cost():
    """An all-zeros entropy body drives read_unary through ~N bits; the
    masked-accumulator reader must stay O(bytes) (ADVICE r10 #1 lesson)
    and end in a typed truncation error, never a hang."""
    blob = bytearray(encode_flac(_signal(256), 8000, method="fixed1"))
    bomb = bytes(blob[:50]) + b"\x00" * 200_000
    start = time.perf_counter()
    with pytest.raises(AudioDecodeError):
        decode_flac(bomb)
    assert time.perf_counter() - start < 2.0


def test_flac_encoder_input_contract():
    with pytest.raises(ValueError):
        encode_flac(np.zeros((0,), np.int64), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((4, 9), np.int64), 8000)  # >8 channels
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)  # out of range
    with pytest.raises(ValueError):
        encode_flac(np.array([1, 2]), 0)  # zero rate
    with pytest.raises(ValueError):
        encode_flac(np.array([1, 2]), 8000, bps=12)
    with pytest.raises(ValueError):
        encode_flac(np.array([[1, 2], [3, 4], [5, 6]]), 8000, stereo="mid_side",
                    block_size=0)
    with pytest.raises(ValueError):
        encode_flac(np.array([1, 2, 3]), 8000, stereo="mid_side")  # mono


def test_flac_mutation_fuzz_error_contract():
    """Shared-mutator fuzz (conftest.mutate_blob, same model as the
    image/WAV families): every mutation either decodes to an ndarray or
    raises AudioDecodeError — no other exception type, no hang."""
    from conftest import mutate_blob

    base = encode_flac(_signal(400), 8000, block_size=200)
    rng = random.Random(0xF1AC)
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(1000):  # image-family depth (r11; was 300)
        blob = mutate_blob(rng, base)
        try:
            out, rate = decode_flac(bytes(blob))
            assert isinstance(out, np.ndarray) and rate > 0
            outcomes["ok"] += 1
        except AudioDecodeError:
            outcomes["rejected"] += 1
    # CRC-8 + CRC-16 + MD5 should catch essentially every mutation that
    # touches frame bytes; mutations in skippable regions may survive
    assert outcomes["rejected"] > 700, outcomes


def test_flac_decode_throughput_regression():
    """Decode-cost pin: 100k samples of real rice-coded audio through
    the pure-Python reader in bounded time (the quadratic-accumulator
    regression took 225 s for less entropy data than this)."""
    sig = _signal(100_000)
    blob = encode_flac(sig, 44100)
    start = time.perf_counter()
    out, _ = decode_flac(blob)
    took = time.perf_counter() - start
    assert np.array_equal(out[:, 0], sig)
    assert took < 10.0, f"decode took {took:.1f}s for 100k samples"


def test_flac_high_and_off_table_sample_rates_roundtrip():
    """r11 review catches: rates above 65535 Hz must NOT be masked into
    the 16-bit frame-header field — code 14 (daHz) or the 20-bit
    STREAMINFO (code 0) carry them exactly."""
    sig = _signal(300)
    for rate in [100_000, 192_001, 655_350, 12345, 1_000_000]:
        out, got = decode_flac(encode_flac(sig, rate))
        assert got == rate, (rate, got)
        assert np.array_equal(out[:, 0], sig)


def test_flac_forced_escape_width_validated():
    """force_escape_bits too narrow for the residuals raises instead of
    silently masking them into a corrupt (but CRC-valid) stream."""
    sig = _signal(512)  # order-2 residuals of +/-3000-range need ~15 bits
    with pytest.raises(ValueError, match="escape width"):
        encode_flac(sig, 8000, method="fixed2", force_escape_bits=8)
    out, _ = decode_flac(
        encode_flac(sig, 8000, method="fixed2", force_escape_bits=16)
    )
    assert np.array_equal(out[:, 0], sig)


def test_flac_lpc_magnitude_bound_typed_error():
    """Crafted max-magnitude coefficients with shift 0 used to grow
    samples as unbounded Python bigints and abort with a bare
    OverflowError at the int64 conversion (r12 advisor catch) — the
    restore loop now raises the module's typed error as soon as a
    sample exceeds the bps-derived bound, wasting only its own bytes."""
    from wwwision_importservice_spark.operators.flaccodec import _restore_lpc

    warmup = np.array([30000], dtype=np.int64)
    resid = np.zeros(4096, dtype=np.int64)
    start = time.perf_counter()
    with pytest.raises(AudioDecodeError, match="magnitude"):
        _restore_lpc(warmup, resid, [1 << 14], 0, 16)
    assert time.perf_counter() - start < 1.0  # no bignum burn
    # a legitimate stream's samples stay far under the bound
    sig = _signal(1000)
    out, _ = decode_flac(encode_flac(sig, 8000, method="lpc"))
    assert np.array_equal(out[:, 0], sig)


def test_flac_streaminfo_block_bounds_from_emitted_frames():
    """Declared min/max block derive from the actual emitted frame
    sizes — the shorter last frame is exempt per spec — and clamp to
    the 16-sample floor (r12 advisor catch: max_block = block_size even
    when the only frame was shorter, and min_block could dip under 16)."""
    def si_blocks(blob):
        return (int.from_bytes(blob[8:10], "big"),
                int.from_bytes(blob[10:12], "big"))

    # multi-frame with a short last frame: both bounds = full frame size
    blob = encode_flac(_signal(130), 8000, block_size=50)
    assert si_blocks(blob) == (50, 50)
    # single frame shorter than the requested block: bounds = that frame
    blob = encode_flac(_signal(30), 8000, block_size=4096)
    assert si_blocks(blob) == (30, 30)
    # tiny input clamps to the spec's 16-sample floor, still decodes
    blob = encode_flac(_signal(5), 8000, block_size=4096)
    assert si_blocks(blob) == (16, 16)
    out, _ = decode_flac(blob)
    assert out.shape[0] == 5
