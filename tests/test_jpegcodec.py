"""Baseline JPEG codec (operators/jpegcodec.py) — spec pins, exact
round-trips, lossy error bounds, bomb guards, family integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wwwision_importservice_spark.operators.imagecodec import (
    ImageDecodeError,
    decode_image,
    sniff_format,
)
from wwwision_importservice_spark.operators.jpegcodec import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _block_gray(bh, bw, seed=7):
    """Block-constant gray image with EVEN sample values — the exact
    round-trip construction (see jpegcodec module docstring)."""
    rng = np.random.RandomState(seed)
    g = (rng.randint(0, 128, (bh, bw)) * 2).astype(np.uint8)
    img = np.repeat(np.repeat(g, 8, 0), 8, 1)
    return np.repeat(img[:, :, None], 3, axis=2)


# --- spec pins ---------------------------------------------------------------


def test_annex_k_huffman_codes_match_published_values():
    """The canonical-code generator reproduces the PUBLISHED T.81 Annex
    K.3 codes — the cross-check that encoder and decoder can't share a
    mirrored table bug: DC luma category 1 is '010', the luminance EOB
    is the famous '1010', the chrominance EOB is '00', ZRL is
    11 bits of 0x7F9 = '11111111001'."""
    dc_l, _ = _canonical_codes(*_DC_LUMA)
    ac_l, _ = _canonical_codes(*_AC_LUMA)
    dc_c, _ = _canonical_codes(*_DC_CHROMA)
    ac_c, _ = _canonical_codes(*_AC_CHROMA)
    assert dc_l[0] == (0b00, 2) and dc_l[1] == (0b010, 3)
    assert ac_l[0x00] == (0b1010, 4)  # EOB
    assert ac_l[0xF0] == (0b11111111001, 11)  # ZRL
    assert dc_c[0] == (0b00, 2)
    assert ac_c[0x00] == (0b00, 2)  # chroma EOB


def test_entropy_bytes_hand_pinned():
    """One 8x8 constant-gray (130) block at q50/444: the entropy segment
    is exactly two bytes, hand-derived from the published codes —
    Y DC cat1 '010'+bit '1', Y EOB '1010', Cb/Cr DC cat0 '00' + EOB
    '00' each → 0101 1010 0000 0000 = 0x5A 0x00."""
    blob = encode_jpeg(np.full((8, 8, 3), 130, np.uint8), quality=50,
                       subsampling="444")
    i = blob.index(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", blob, i + 2)
    entropy = blob[i + 2 + seglen : blob.rindex(b"\xff\xd9")]
    assert entropy == bytes([0x5A, 0x00])


# --- exact round-trips -------------------------------------------------------


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("bh,bw", [(1, 1), (2, 2), (3, 4)])
def test_block_gray_roundtrip_exact(sub, bh, bw):
    """Block-constant gray with even values at q50 is EXACT through the
    lossy pipeline (DC quantizer 16 divides 8·(v-128); every AC and
    chroma coefficient is exactly zero) — for all three subsamplings
    (4:2:2 exercises the decoder's ASYMMETRIC upsample path) and for
    dims that force MCU edge padding (3x4 blocks under 4:2:0)."""
    arr = _block_gray(bh, bw, seed=40 + bh * 4 + bw)
    out = decode_jpeg(encode_jpeg(arr, quality=50, subsampling=sub))
    np.testing.assert_array_equal(out, arr)


def test_grayscale_scan_roundtrip_exact():
    arr = _block_gray(2, 3, seed=3)
    blob = encode_jpeg(arr, quality=50, grayscale=True)
    np.testing.assert_array_equal(decode_jpeg(blob), arr)


def test_restart_markers_roundtrip():
    """DRI + RSTn: the decoder resyncs at restart markers and resets DC
    predictors; output is identical to the no-restart encode."""
    arr = _block_gray(4, 4, seed=11)
    with_rst = encode_jpeg(arr, quality=50, subsampling="444",
                           restart_interval=3)
    assert any(
        with_rst[i] == 0xFF and 0xD0 <= with_rst[i + 1] <= 0xD7
        for i in range(len(with_rst) - 1)
    )
    np.testing.assert_array_equal(decode_jpeg(with_rst), arr)
    rng = np.random.RandomState(5)
    noisy = rng.randint(0, 256, (32, 48, 3), dtype=np.uint8)
    d1 = decode_jpeg(encode_jpeg(noisy, quality=80, subsampling="420",
                                 restart_interval=2))
    d2 = decode_jpeg(encode_jpeg(noisy, quality=80, subsampling="420"))
    np.testing.assert_array_equal(d1, d2)


# --- lossy fidelity ----------------------------------------------------------


def test_lossy_error_bounds():
    """JPEG is lossy; the pin is an error BOUND, not equality: a smooth
    gradient at q95/444 is near-lossless (max err ≤ 2), and even noise
    at q95/444 keeps mean abs error under 8."""
    xs = np.linspace(0, 255, 64)
    grad = np.round(np.add.outer(xs, xs) / 2).astype(np.uint8)
    arr = np.stack([grad, grad, grad], axis=2)
    out = decode_jpeg(encode_jpeg(arr, quality=95, subsampling="444"))
    assert int(np.abs(out.astype(int) - arr.astype(int)).max()) <= 2

    rng = np.random.RandomState(9)
    noise = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=95, subsampling="444"))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 8


def test_odd_dimensions_crop():
    rng = np.random.RandomState(13)
    arr = rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
    for sub in ("420", "422"):
        out = decode_jpeg(encode_jpeg(arr, quality=90, subsampling=sub))
        assert out.shape == (13, 21, 3), sub


# --- rejection + bomb guards -------------------------------------------------


def test_rejects_non_baseline_and_malformed():
    arr = _block_gray(1, 1)
    blob = bytearray(encode_jpeg(arr, quality=50, subsampling="444"))
    # flip SOF0 -> SOF9 (arithmetic sequential): loud, named rejection
    # (SOF2 progressive is SUPPORTED since r11; a baseline-shaped scan
    # under a progressive header is spec-invalid and also rejected)
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 1] = 0xC9
    with pytest.raises(ImageDecodeError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    blob[i + 1] = 0xC2  # progressive header, baseline Ss/Se scan
    with pytest.raises(ImageDecodeError, match="DC scan with nonzero Se"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ImageDecodeError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # truncated entropy data
    whole = encode_jpeg(arr, quality=50, subsampling="444")
    with pytest.raises(ImageDecodeError):
        decode_jpeg(whole[:-4] )
    # 12-bit precision rejected
    blob = bytearray(whole)
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 4] = 12
    with pytest.raises(ImageDecodeError, match="precision"):
        decode_jpeg(bytes(blob))


def test_bomb_huge_sof_rejected_before_alloc():
    """A sub-KB JPEG declaring 65535x65535 in SOF dies on the shared
    pixel ceiling before any plane allocates (same threat model as the
    PNG/GIF caps)."""
    import tracemalloc

    blob = bytearray(encode_jpeg(_block_gray(1, 1), quality=50,
                                 subsampling="444"))
    i = bytes(blob).index(b"\xff\xc0")
    struct.pack_into(">HH", blob, i + 5, 65535, 65535)
    assert len(blob) < 1024
    tracemalloc.start()
    with pytest.raises(ImageDecodeError, match="decode ceiling"):
        decode_jpeg(bytes(blob))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 1 << 20, f"peak {peak} bytes — SOF dims were trusted"


# --- family integration ------------------------------------------------------


def test_family_sniff_and_decode_image():
    arr = _block_gray(2, 2, seed=21)
    blob = encode_jpeg(arr, quality=50, subsampling="444")
    assert sniff_format(blob) == "jpeg"
    out, fmt = decode_image(blob)
    assert fmt == "jpeg"
    np.testing.assert_array_equal(out, arr)


# --- r10 review-pass regressions ---------------------------------------------


def test_decode_bytes_per_pixel_budget():
    """The decoder's working set is priced at ~20.5 bytes/pixel
    measured (float32 planes 12 + rgb 3 + one reused float32 temp 4 +
    small block transients) — the figure the shared 64M-px ceiling is
    justified by in MAX_JPEG_PIXELS' docs. Pin it: decoding a 256x256
    4:4:4 photo-like image stays under 24 B/px traced peak (measured
    20.9), so either a float64-stack regression (~50+ B/px) or even ONE
    reintroduced full-size float32 transient (+4 B/px → 24.9, measured)
    fails here instead of silently inflating executor memory at crawl
    scale. Also: a 24 MP frame header — a real
    camera's output, UNDER the family ceiling — must reach entropy
    decode, not die at the SOF gate (the over-eager quarter-ceiling
    regression)."""
    import tracemalloc

    from wwwision_importservice_spark.operators.imagecodec import (
        MAX_DECODE_PIXELS,
    )
    from wwwision_importservice_spark.operators.jpegcodec import (
        MAX_JPEG_PIXELS,
    )

    assert MAX_JPEG_PIXELS == MAX_DECODE_PIXELS  # 24-61 MP photos decode
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (256, 256, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=75, subsampling="444")
    decode_jpeg(blob)  # warm numpy/zlib internals out of the trace
    tracemalloc.start()
    decode_jpeg(blob)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 256 * 256 * 24, f"peak {peak} = {peak/65536:.1f} B/px"

    # 6000x4000 (24 MP) header passes the gate; it fails later only for
    # lack of entropy data — proving the ceiling doesn't tax real photos
    big = bytearray(encode_jpeg(_block_gray(1, 1), quality=50,
                                subsampling="444"))
    i = bytes(big).index(b"\xff\xc0")
    struct.pack_into(">HH", big, i + 5, 4000, 6000)
    with pytest.raises(ImageDecodeError, match="exhausted|Huffman"):
        decode_jpeg(bytes(big))


def test_malformed_headers_raise_decode_error_not_struct_error():
    """Truncated SOF/DRI/SOS bodies and a scan that doesn't cover a
    frame component all surface as ImageDecodeError — the same contract
    the PNG short-IHDR fix pinned, applied to this codec's own headers."""
    arr = _block_gray(1, 1)
    whole = encode_jpeg(arr, quality=50, subsampling="444")

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    i = whole.index(b"\xff\xc0")
    (soflen,) = struct.unpack_from(">H", whole, i + 2)
    head, sof, tail = whole[:i], whole[i : i + 2 + soflen], whole[i + 2 + soflen :]

    # SOF body shorter than its component list
    with pytest.raises(ImageDecodeError, match="SOF"):
        decode_jpeg(head + seg(0xFFC0, sof[4:10]) + tail)
    # empty DRI body
    with pytest.raises(ImageDecodeError, match="DRI"):
        decode_jpeg(head + seg(0xFFDD, b"") + sof + tail)
    # scan selector naming a component id the frame doesn't have
    j = whole.index(b"\xff\xda")
    mutated = bytearray(whole)
    mutated[j + 5] = 9  # first scan component id 1 -> 9
    with pytest.raises(ImageDecodeError, match="component"):
        decode_jpeg(bytes(mutated))


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; real encoders emit them, so decode must skip them instead
    of misparsing the padded marker's length."""
    arr = _block_gray(2, 2, seed=33)
    whole = encode_jpeg(arr, quality=50, subsampling="444")
    i = whole.index(b"\xff\xdb")  # pad before DQT
    padded = whole[:i] + b"\xff\xff\xff" + whole[i:]
    np.testing.assert_array_equal(decode_jpeg(padded), arr)


def test_non_integral_sampling_ratio_rejected():
    """Spec-legal but wild sampling grids (luma 3x3 over chroma 2x2)
    need fractional upsampling; they must be rejected loudly as
    ImageDecodeError, not crash the conversion with a numpy shape
    ValueError (r10 review catch)."""
    blob = bytearray(encode_jpeg(_block_gray(1, 1), quality=50,
                                 subsampling="444"))
    i = bytes(blob).index(b"\xff\xc0")
    # component params start at i+4 (marker+len) +6 (fixed header):
    # [id, hv, tq] per component
    blob[i + 4 + 6 + 1] = 0x33  # luma 3x3
    blob[i + 4 + 6 + 4] = 0x22  # Cb 2x2
    blob[i + 4 + 6 + 7] = 0x22  # Cr 2x2
    with pytest.raises(ImageDecodeError, match="non-integral sampling"):
        decode_jpeg(bytes(blob))


def test_crafted_dht_huge_dc_category_rejected():
    """A spec-valid DHT mapping a 1-bit code to symbol 255 makes the DC
    magnitude receive 255 bits → a 2^255 Python int → numpy
    OverflowError on the int64 store, escaping the error contract
    (found by targeted fuzzing, r10). The decoder caps DC categories at
    the 8-bit baseline maximum of 11 (T.81 F.1.2.1.2)."""
    blob = bytearray(encode_jpeg(np.full((8, 8, 3), 130, np.uint8),
                                 quality=50, subsampling="444"))
    i = bytes(blob).index(b"\xff\xc4")
    (seglen,) = struct.unpack_from(">H", blob, i + 2)
    body = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([255])
    seg = struct.pack(">HH", 0xFFC4, len(body) + 2) + body
    head = bytes(blob[:i]) + seg + bytes(blob[i + 2 + seglen:])
    j = head.rindex(b"\xff\xd9")
    attack = head[:j] + b"\x55" * 200 + b"\xff\xd9"
    with pytest.raises(ImageDecodeError, match="DC category"):
        decode_jpeg(attack)


def test_mutation_fuzz_error_contract():
    """Seeded mutation fuzz over every codec in the family: byte flips,
    truncations, and garbage insertions on valid BMP/PPM/PNG/GIF/JPEG
    blobs must either decode or raise ImageDecodeError — never
    struct.error / IndexError / OverflowError / numpy errors (the
    escape classes three r10 review passes found one at a time). 200
    mutations per format, deterministic seed."""
    import random

    from conftest import mutate_blob

    from wwwision_importservice_spark.operators.imagecodec import (
        encode_bmp,
        encode_gif,
        encode_ppm,
        encode_png,
    )

    rng = random.Random(1234)
    npr = np.random.RandomState(7)
    arr = npr.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    pal = (npr.randint(0, 4, (4, 4)) * 60).astype(np.uint8)
    gif_frame = np.repeat(np.repeat(pal, 6, 0), 6, 1)[:, :, None].repeat(3, 2)
    bases = {
        "bmp": encode_bmp(arr),
        "ppm": encode_ppm(arr),
        "png": encode_png(arr),
        "gif": encode_gif([gif_frame]),
        "jpeg": encode_jpeg(_block_gray(3, 3), quality=50,
                            subsampling="420"),
    }
    escapes = []
    for fmt, base in bases.items():
        for _ in range(200):
            blob = mutate_blob(rng, base)
            try:
                decode_image(blob)
            except ImageDecodeError:
                pass
            except Exception as exc:  # noqa: BLE001 — the assertion itself
                escapes.append((fmt, type(exc).__name__, str(exc)[:60]))
    assert not escapes, escapes[:5]


# --- r11 ADVICE regressions ---------------------------------------------------


def test_decode_throughput_linear_on_large_stream():
    """Decode time must stay linear in entropy-stream length: the r10
    _BitReader never masked consumed bits out of its accumulator, so
    acc grew ~8 bits per entropy byte and every shift copied the
    growing bignum — 512x512 (0.49 MB stream) took 225 s. With the
    mask restored the same decode is ~1 s. Pin it with a wall-clock
    ceiling generous enough for a loaded CI box but far below the
    quadratic regime."""
    import time

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=90, subsampling="444")
    assert len(blob) > 300_000, "stream too small to exercise the regime"
    t0 = time.monotonic()
    out = decode_jpeg(blob)
    elapsed = time.monotonic() - t0
    assert out.shape == (512, 512, 3)
    assert elapsed < 30.0, (
        f"512x512 decode took {elapsed:.1f}s — quadratic _BitReader "
        "accumulator regressed (expected ~1-2s, 225s unmasked)"
    )


def test_zero_dimension_sof_rejected():
    """SOF with fw=0 or fh=0 passes the pixel ceiling (0 <= MAX) but is
    spec-invalid; the decoder must reject it rather than return a
    degenerate (0, W, 3) array."""
    for axis in (0, 1):
        blob = bytearray(encode_jpeg(_block_gray(1, 1), quality=50,
                                     subsampling="444"))
        i = bytes(blob).index(b"\xff\xc0")
        dims = [8, 8]
        dims[axis] = 0
        struct.pack_into(">HH", blob, i + 5, *dims)
        with pytest.raises(ImageDecodeError, match="zero frame dimension"):
            decode_jpeg(bytes(blob))


def test_encoder_rejects_oversized_and_empty_dims():
    """Encoder input is trusted but the error contract is loud
    ValueError, not struct.error from pack('>H', ...)."""
    with pytest.raises(ValueError, match="capped at 65535"):
        encode_jpeg(np.zeros((65536, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="capped at 65535"):
        encode_jpeg(np.zeros((8, 70000, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="must be positive"):
        encode_jpeg(np.zeros((0, 8, 3), dtype=np.uint8))


# --- progressive (SOF2, r11 — VERDICT r10 ask #4) -----------------------------


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_block_gray_roundtrip_exact(sub):
    """The exact even-gray q50 construction survives the progressive
    scan script too: DC successive approximation (Al=1 + refinement)
    splits the even DC values losslessly, and every AC scan is pure
    EOBs — encode→decode is byte-exact through SOF2."""
    arr = _block_gray(4, 6)
    for acsa in (False, True):
        blob = encode_jpeg(arr, quality=50, subsampling=sub,
                           progressive=True, ac_successive=acsa)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob.split(
            b"\xff\xda"
        )[0]
        np.testing.assert_array_equal(decode_jpeg(blob), arr)


def test_progressive_grayscale_and_restart_roundtrip_exact():
    arr = _block_gray(3, 3, seed=11)
    blob = encode_jpeg(arr, quality=50, grayscale=True, progressive=True)
    np.testing.assert_array_equal(decode_jpeg(blob), arr)
    blob = encode_jpeg(arr, quality=50, subsampling="420",
                       progressive=True, restart_interval=2,
                       ac_successive=True)
    assert b"\xff\xdd" in blob  # DRI present
    np.testing.assert_array_equal(decode_jpeg(blob), arr)


def test_progressive_decodes_bit_identical_to_baseline():
    """The structural pin: progressive carries the SAME quantized
    coefficients as baseline, reordered — so decode(progressive) ==
    decode(baseline) to the byte, across subsamplings, qualities, odd
    dimensions, restart intervals, and both AC scan scripts (spectral
    selection only, and AC successive approximation whose refinement
    scans drive the G.1.2.3 correction-bit decoder)."""
    rng = np.random.RandomState(1)
    for trial in range(24):
        hh, ww = int(rng.randint(8, 60)), int(rng.randint(8, 60))
        sub = ["444", "422", "420"][trial % 3]
        q = [10, 30, 50, 75, 90, 95][trial % 6]
        ri = [0, 0, 3][trial % 3]
        img = rng.randint(0, 256, (hh, ww, 3), dtype=np.uint8)
        base = decode_jpeg(
            encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
        )
        for acsa in (False, True):
            prog = decode_jpeg(encode_jpeg(
                img, quality=q, subsampling=sub, restart_interval=ri,
                progressive=True, ac_successive=acsa,
            ))
            np.testing.assert_array_equal(
                prog, base, err_msg=f"{trial} {sub} q{q} ri{ri} acsa{acsa}"
            )


def test_progressive_entropy_bytes_hand_pinned():
    """One 8x8 constant-gray (130) block at q50/444, progressive:
    every scan's entropy bytes hand-derived from the published Annex K
    codes — the anchor that encoder and decoder can't share a mirrored
    scan-script bug. Quantized DCs are (1, 0, 0) (see the baseline
    hand-pin), so:
      DC first (Al=1): values >>1 are all 0 → three cat-0 codes
        '00 00 00' + '11' pad = 0x03
      DC refine (Al=0): raw bits 1,0,0 + '11111' pad = 0x9F
      AC luma: EOB '1010' + '1111' pad = 0xAF
      AC chroma x2: EOB '00' + '111111' pad = 0x3F"""
    arr = np.full((8, 8, 3), 130, dtype=np.uint8)
    blob = encode_jpeg(arr, quality=50, subsampling="444", progressive=True)
    # collect (per SOS) the entropy bytes between the SOS body and the
    # next marker
    scans = []
    i = 0
    while True:
        j = blob.find(b"\xff\xda", i)
        if j < 0:
            break
        (seglen,) = struct.unpack_from(">H", blob, j + 2)
        ent_start = j + 2 + seglen
        k = ent_start
        while k + 1 < len(blob) and not (
            blob[k] == 0xFF and blob[k + 1] != 0x00
        ):
            k += 1
        scans.append(blob[ent_start:k])
        i = k
    assert scans == [b"\x03", b"\x9f", b"\xaf", b"\x3f", b"\x3f"]
    np.testing.assert_array_equal(decode_jpeg(blob), arr)


def test_progressive_mutation_fuzz_error_contract():
    """The codec-family fuzz contract extended to progressive streams
    (both scan scripts): mutations decode or raise ImageDecodeError,
    never escape types."""
    import random

    from conftest import mutate_blob

    rng = random.Random(777)
    npr = np.random.RandomState(9)
    img = npr.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    bases = [
        encode_jpeg(_block_gray(3, 3), quality=50, subsampling="420",
                    progressive=True),
        encode_jpeg(img, quality=75, subsampling="420", progressive=True,
                    ac_successive=True),
    ]
    escapes = []
    for base in bases:
        for _ in range(500):  # image-family 1000-case depth across the
            # two scan scripts (r12 — the SOF2 accumulator/refinement
            # state machine gets the same fuzz budget as baseline)
            blob = mutate_blob(rng, base)
            try:
                decode_image(blob)
            except ImageDecodeError:
                pass
            except Exception as exc:  # noqa: BLE001 — the assertion itself
                escapes.append((type(exc).__name__, str(exc)[:60]))
    assert not escapes, escapes[:5]


def test_sos_zero_components_rejected_typed():
    """Regression (r11 review catch): SOS with ns=0 under a progressive
    header reached units() with an empty member list and raised a bare
    IndexError — outside the fake/strict policy's typed contract. Both
    process types must reject it as ImageDecodeError."""
    import numpy as np

    for progressive in (False, True):
        blob = bytearray(encode_jpeg(
            np.full((8, 8, 3), 130, np.uint8), quality=50,
            progressive=progressive,
        ))
        i = blob.find(b"\xff\xda")
        assert i > 0
        blob[i + 4] = 0  # Ns byte
        with pytest.raises(ImageDecodeError, match="component count"):
            decode_jpeg(bytes(blob))


def test_progressive_decode_bytes_per_pixel_budget():
    """Progressive necessarily holds the whole int64 coefficient store
    across scans (24 B/px at 4:4:4) on top of the shared finalize tail
    — measured 44.2 B/px with the dezigzag done stripe-at-a-time
    inside the IDCT loop (r11 review catch: a whole-plane dezigzag
    temp doubled the store, +24 B/px → ~68, measured). Pin at 52 B/px
    so a reintroduced full-plane transient fails loudly."""
    import tracemalloc

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (256, 256, 3), dtype=np.uint8)
    blob = encode_jpeg(arr, quality=75, subsampling="444", progressive=True)
    decode_jpeg(blob)  # warm numpy internals out of the trace
    tracemalloc.start()
    decode_jpeg(blob)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 256 * 256 * 52, f"peak {peak} = {peak/65536:.1f} B/px"
