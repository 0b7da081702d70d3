"""WebP container metadata codec (r13): RIFF/VP8/VP8L/VP8X header
conformance, re-containerization-invariant content addressing, bomb
caps, and the family mutation-fuzz/error contract. Pure codec tests —
the Spark-side routing sits under the x4_media_metadata oracle and
test_media_row_routes_webp."""

from __future__ import annotations

import hashlib
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.webpcodec import (
    MAX_WEBP_CHUNKS,
    WebpDecodeError,
    encode_webp,
    media_payload,
    parse_webp,
    sniff_webp,
)


def test_webp_layout_pinned_bytes():
    """Hand-derived layout (RFC 9649): RIFF + u32le size + WEBP, VP8L
    chunk with the 0x2F signature and the 14+14+1+3-bit LSB-packed
    dims field."""
    blob = encode_webp(320, 200, codec="vp8l", payload=b"pp", alpha=True)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    assert struct.unpack_from("<I", blob, 4)[0] == len(blob) - 8
    assert blob[12:16] == b"VP8L"
    assert blob[20] == 0x2F
    (packed,) = struct.unpack_from("<I", blob, 21)
    assert (packed & 0x3FFF) + 1 == 320
    assert ((packed >> 14) & 0x3FFF) + 1 == 200
    assert (packed >> 28) & 1 == 1  # alpha
    assert packed >> 29 == 0  # version
    assert sniff_webp(blob)
    # VP8 lossy: 3-byte tag, start code 9D 01 2A, u16le dims
    lossy = encode_webp(640, 480, codec="vp8", payload=b"q" * 9)
    body = lossy[20:]
    assert body[3:6] == b"\x9d\x01\x2a"
    assert struct.unpack_from("<HH", body, 6) == (640, 480)
    assert not body[0] & 1  # keyframe bit clear


@pytest.mark.parametrize("codec,w,h,alpha", [
    ("vp8l", 1, 1, False), ("vp8l", 16383, 4000, True),
    ("vp8", 320, 200, False), ("vp8", 16383, 16383, False),
    ("vp8l", 16384, 16384, False),
])
def test_webp_roundtrip(codec, w, h, alpha):
    blob = encode_webp(w, h, codec=codec, payload=b"x" * 33, alpha=alpha)
    m = parse_webp(blob)
    assert (m["width"], m["height"], m["codec"]) == (w, h, codec)
    assert m["alpha"] == alpha and m["n_frames"] == 1 and not m["animated"]


def test_webp_recontainerization_invariant_address():
    """The content address is the coded bitstream: wrapping the same
    image in a VP8X extended shell (new canvas/flags chunks) changes
    the container bytes but not the hash — the property the x4 oracle
    pins with its b-varied `extended` arm."""
    simple = encode_webp(100, 50, codec="vp8l", payload=b"bits" * 8)
    ext = encode_webp(100, 50, codec="vp8l", payload=b"bits" * 8,
                      extended=True)
    assert simple != ext
    ms, me = parse_webp(simple), parse_webp(ext)
    assert media_payload(simple, ms) == media_payload(ext, me)
    assert (ms["width"], ms["height"]) == (me["width"], me["height"])
    assert ms["codec"] == me["codec"] == "vp8l"


def test_webp_animation_frames():
    anim = encode_webp(64, 32, codec="vp8", payload=b"fr" * 6,
                       anim_frames=7)
    m = parse_webp(anim)
    assert m["animated"] and m["n_frames"] == 7
    assert m["codec"] == "vp8"  # sniffed from the ANMF sub-chunk
    assert (m["width"], m["height"]) == (64, 32)  # VP8X canvas


def test_webp_truncation_and_error_contract():
    blob = encode_webp(10, 10, codec="vp8l", payload=b"z" * 20)
    with pytest.raises(WebpDecodeError, match="magic"):
        parse_webp(b"RIFXjunk" + blob)
    assert not sniff_webp(b"RIFF\x00\x00\x00\x00WAVE")
    # chunk size past the RIFF payload
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 16, 1 << 30)
    with pytest.raises(WebpDecodeError, match="past the RIFF"):
        parse_webp(bytes(bad))
    # bad VP8L signature / nonzero version
    sig = bytearray(blob)
    sig[20] = 0x30
    with pytest.raises(WebpDecodeError, match="signature"):
        parse_webp(bytes(sig))
    ver = bytearray(blob)
    ver[24] |= 0xE0  # top 3 bits of the packed field
    with pytest.raises(WebpDecodeError, match="version"):
        parse_webp(bytes(ver))
    # lossy: interframe tag / bad start code
    lossy = encode_webp(10, 10, codec="vp8", payload=b"z" * 20)
    inter = bytearray(lossy)
    inter[20] |= 1
    with pytest.raises(WebpDecodeError, match="keyframe"):
        parse_webp(bytes(inter))
    sc = bytearray(lossy)
    sc[23] = 0
    with pytest.raises(WebpDecodeError, match="start code"):
        parse_webp(bytes(sc))
    # RIFF shell with only a metadata chunk, no image chunk
    shell_body = b"WEBP" + b"META" + struct.pack("<I", 0)
    empty = b"RIFF" + struct.pack("<I", len(shell_body)) + shell_body
    with pytest.raises(WebpDecodeError, match="no image chunk"):
        parse_webp(empty)
    # encoder contract (VP8 caps at 16383, VP8L at 16384)
    with pytest.raises(ValueError, match="14-bit"):
        encode_webp(0, 5)
    with pytest.raises(ValueError, match="14-bit"):
        encode_webp(5, 1 << 15)
    with pytest.raises(ValueError, match="16383"):
        encode_webp(16384, 5, codec="vp8")
    with pytest.raises(ValueError, match="codec"):
        encode_webp(5, 5, codec="av1")
    with pytest.raises(ValueError, match="anim_frames"):
        encode_webp(5, 5, anim_frames=0)
    with pytest.raises(ValueError, match="VP8L header"):
        encode_webp(5, 5, codec="vp8", alpha=True)


def test_webp_chunk_bomb_cap(monkeypatch):
    """A stream of tiny chunks hits the chunk budget with a typed
    error instead of an unbounded walk."""
    from wwwision_importservice_spark.operators import webpcodec

    monkeypatch.setattr(webpcodec, "MAX_WEBP_CHUNKS", 4)
    filler = b"META" + struct.pack("<I", 0)
    body = b"WEBP" + filler * 10
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(WebpDecodeError, match="chunks"):
        webpcodec.parse_webp(blob)
    monkeypatch.setattr(webpcodec, "MAX_WEBP_CHUNKS", MAX_WEBP_CHUNKS)


def test_webp_odd_chunk_padding():
    """Odd-size chunks are padded to even offsets (RFC 9649 §2.3) —
    an odd VP8L payload must not desync the following chunk."""
    blob = encode_webp(10, 10, codec="vp8l", payload=b"z" * 21,
                       extended=True)
    m = parse_webp(blob)
    assert (m["width"], m["height"]) == (10, 10)
    assert media_payload(blob, m).endswith(b"z" * 21)


def test_webp_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    WebpDecodeError — no other exception, no hang."""
    from conftest import mutate_blob

    rng = random.Random(0x3EB9)
    bases = [
        encode_webp(320, 200, codec="vp8l", payload=b"a" * 40,
                    alpha=True, extended=True),
        encode_webp(64, 48, codec="vp8", payload=b"b" * 24,
                    anim_frames=3),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_webp(blob):
                continue
            try:
                meta = parse_webp(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except WebpDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_media_row_routes_webp():
    """The regression pin: WebP bytes route as kind='image' with real
    dims/codec — previously the most common modern web image format
    fell to kind='unknown'. RIFF stays disjoint from WAV; corrupt
    bodies quarantine in non-strict mode."""
    import numpy as np

    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    blob = encode_webp(1280, 720, codec="vp8", payload=b"w" * 30)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "image" and row[2] == "webp"
    assert (row[3], row[4], row[5], row[10]) == (1280, 720, 1, "vp8")
    # extended twin hashes identically
    ext = encode_webp(1280, 720, codec="vp8", payload=b"w" * 30,
                      extended=True)
    row_e = _media_row(2, ext, img, wavc, flacc, vidc, False, hex_sha)
    assert row_e[12] == row[12] and row_e[11] == len(ext)
    # WAV still routes as wav (RIFF form disambiguation)
    wav = wavc.encode_wav(np.zeros(16, "<i2"), 8000)
    roww = _media_row(3, wav, img, wavc, flacc, vidc, False, hex_sha)
    assert roww[1] == "audio" and roww[2] == "wav"
    # corrupt VP8L header: quarantine, not a crash; strict raises
    bad = bytearray(blob)
    bad[23] = 0  # start code
    row_c = _media_row(4, bytes(bad), img, wavc, flacc, vidc, False,
                       hex_sha)
    assert row_c[1] == "corrupt" and row_c[2] == "webp"
    with pytest.raises(WebpDecodeError):
        _media_row(4, bytes(bad), img, wavc, flacc, vidc, True, hex_sha)
