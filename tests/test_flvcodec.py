"""FLV container metadata codec (r14): tag-walk layout conformance,
the minimal AMF0 onMetaData reader, the demux-invariant per-stream
content address, bomb caps, and the family mutation-fuzz/error
contract. Pure codec tests — the Spark-side routing sits under the
x4_media_metadata oracle and test_media_row_routes_flv."""

from __future__ import annotations

import hashlib
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.flvcodec import (
    MAX_FLV_TAGS,
    FlvDecodeError,
    encode_flv,
    media_payload,
    parse_flv,
    sniff_flv,
)

VF = [bytes([i]) * 20 for i in range(5)]
AC = [bytes([100 + i]) * 15 for i in range(3)]


def test_flv_layout_pinned_bytes():
    """Hand-derived layout (Adobe FLV spec v10): FLV + version 1 +
    flags + u32be offset 9 + zero PreviousTagSize; tags are
    type/u24be-size/u24be-timestamp+ext/u24be-stream-id, each followed
    by a u32be back-pointer of 11+size."""
    blob = encode_flv(320, 240, 2000, VF[:2], "avc", AC[:1])
    assert blob[:5] == b"FLV\x01\x05"  # video+audio flags
    assert struct.unpack_from(">I", blob, 5)[0] == 9
    assert struct.unpack_from(">I", blob, 9)[0] == 0
    # first tag is the onMetaData script tag
    assert blob[13] == 18
    size = int.from_bytes(blob[14:17], "big")
    # script body: AMF0 string 'onMetaData' + ECMA array
    assert blob[24] == 0x02
    assert blob[25:27] == struct.pack(">H", 10)
    assert blob[27:37] == b"onMetaData"
    assert blob[37] == 0x08
    # back-pointer after the body
    assert struct.unpack_from(">I", blob, 24 + size)[0] == 11 + size
    # next tag: video, keyframe nibble 1 + AVC codec id 7
    vt = 24 + size + 4
    assert blob[vt] == 9
    assert blob[vt + 11] == 0x17
    assert sniff_flv(blob)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(interleave=2),
    dict(extra_meta=True),
    dict(interleave=1, extra_meta=True),
])
def test_flv_demux_invariant_address(kwargs):
    """The content address is the per-stream tag-body concatenation:
    re-interleaving and a rewritten (padded) onMetaData must not move
    the hash."""
    blob = encode_flv(640, 360, 5000, VF, "avc", AC, 44100, 2, **kwargs)
    m = parse_flv(blob)
    assert (m["width"], m["height"], m["duration_ms"], m["n_frames"]) \
        == (640, 360, 5000, 5)
    assert m["codec"] == "avc"
    assert (m["sample_rate"], m["channels"]) == (44100, 2)
    expected = b"".join(
        bytes([((1 if i == 0 else 2) << 4) | 7]) + fb
        for i, fb in enumerate(VF)
    )
    hdr = (10 << 4) | (3 << 2) | 0x02 | 1
    expected += b"".join(bytes([hdr]) + ab for ab in AC)
    assert media_payload(blob, m) == expected


def test_flv_metadata_honest_nones_and_duration_roundtrip():
    # no script tag: dims/duration honestly None, frames still counted
    b2 = encode_flv(64, 48, 1000, VF[:2], "h263", with_metadata=False)
    m2 = parse_flv(b2)
    assert m2["width"] is None and m2["duration_ms"] is None
    assert m2["n_frames"] == 2 and m2["codec"] == "h263"
    assert m2["sample_rate"] is None and m2["channels"] is None
    # fractional-second duration survives the f64 round-trip exactly
    b3 = encode_flv(64, 48, 5123, VF[:2], "vp6")
    assert parse_flv(b3)["duration_ms"] == 5123
    # mono MP3-rate audio header decodes
    b4 = encode_flv(64, 48, 1000, VF[:1], "avc", AC[:1],
                    sample_rate=11025, channels=1)
    m4 = parse_flv(b4)
    assert (m4["sample_rate"], m4["channels"]) == (11025, 1)


def test_flv_truncation_and_error_contract():
    blob = encode_flv(320, 240, 3000, VF, "avc", AC)
    # truncation mid-tag: trailing tags drop out (crawl posture)
    m = parse_flv(blob[:-10])
    assert m["n_frames"] < 5 or len(m["payload_regions"]) < 8
    # garbage after the last complete tag is invisible
    full = parse_flv(blob)
    assert media_payload(blob + b"\xde\xad" * 3,
                         parse_flv(blob + b"\xde\xad" * 3)) \
        == media_payload(blob, full)
    # no tags at all
    with pytest.raises(FlvDecodeError, match="tags"):
        parse_flv(b"FLV\x01\x05" + struct.pack(">I", 9) + b"\x00" * 4)
    # malformed AMF: a marker outside the onMetaData surface
    bad = bytearray(blob)
    bad[24] = 0x0B  # date marker where the name string should be
    with pytest.raises(FlvDecodeError, match="marker"):
        parse_flv(bytes(bad))
    # truncated AMF number
    bad2 = bytearray(blob)
    size = int.from_bytes(bad2[14:17], "big")
    bad2[14:17] = (40).to_bytes(3, "big")  # shrink the script body
    # (keeps the tag walk aligned wrong — either typed error or a
    # tolerated partial parse, never a crash)
    try:
        parse_flv(bytes(bad2))
    except FlvDecodeError:
        pass
    assert not sniff_flv(b"FLV\x02" + b"\x00" * 16)  # version 2


def test_flv_tag_bomb_cap(monkeypatch):
    import wwwision_importservice_spark.operators.flvcodec as fc

    blob = encode_flv(64, 48, 1000, [b"x"] * 30, "avc",
                      with_metadata=False)
    monkeypatch.setattr(fc, "MAX_FLV_TAGS", 10)
    with pytest.raises(FlvDecodeError, match="tags"):
        fc.parse_flv(blob)
    monkeypatch.undo()
    assert parse_flv(blob)["n_frames"] == 30


def test_flv_amf_depth_cap():
    """A nesting bomb in the script tag trips the AMF depth budget
    instead of recursing."""
    # object nested 12 deep: {"a": {"a": ... 1.0}}
    inner = b"\x00" + struct.pack(">d", 1.0)
    for _ in range(12):
        inner = b"\x03" + struct.pack(">H", 1) + b"a" + inner \
            + struct.pack(">H", 0) + b"\x09"
    script = b"\x02" + struct.pack(">H", 10) + b"onMetaData" + inner
    tag = bytes([18]) + len(script).to_bytes(3, "big") + b"\x00" * 7 \
        + script + struct.pack(">I", 11 + len(script))
    blob = b"FLV\x01\x05" + struct.pack(">I", 9) + b"\x00" * 4 + tag
    with pytest.raises(FlvDecodeError, match="nesting"):
        parse_flv(blob)


def test_flv_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    FlvDecodeError — no other exception, no hang."""
    from conftest import mutate_blob

    rng = random.Random(0xF17)
    bases = [
        encode_flv(320, 200, 4000, VF, "avc", AC, interleave=2),
        encode_flv(64, 48, 1500, VF[:3], "vp6", extra_meta=True),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_flv(blob):
                continue
            try:
                meta = parse_flv(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except FlvDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_flv_encoder_input_contract():
    with pytest.raises(ValueError, match="codec"):
        encode_flv(4, 4, 1, VF[:1], codec="mpeg9")
    with pytest.raises(ValueError, match="dims"):
        encode_flv(0, 4, 1, VF[:1])
    with pytest.raises(ValueError, match="frame"):
        encode_flv(4, 4, 1, [])
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flv(4, 4, 1, VF[:1], audio_chunks=AC[:1], sample_rate=48000)
    with pytest.raises(ValueError, match="channels"):
        encode_flv(4, 4, 1, VF[:1], audio_chunks=AC[:1], channels=6)


def test_media_row_routes_flv():
    """The r14 regression pin: FLV bytes route as kind='video' with
    real fields — a decade of Flash-era crawls previously fell to
    kind='unknown'. Corrupt script tags quarantine in non-strict
    mode."""
    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    blob = encode_flv(1280, 720, 8000, VF, "avc", AC, 22050, 2)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "video" and row[2] == "flv"
    assert (row[3], row[4], row[5]) == (1280, 720, 5)
    assert (row[6], row[7]) == (22050, 2)
    assert row[9] == 8000 and row[10] == "avc"
    # re-interleaved + re-described twin hashes identically
    twin = encode_flv(1280, 720, 8000, VF, "avc", AC, 22050, 2,
                      interleave=1, extra_meta=True)
    row_t = _media_row(2, twin, img, wavc, flacc, vidc, False, hex_sha)
    assert row_t[12] == row[12] and row_t[11] == len(twin)
    # corrupt AMF: quarantine, not a crash; strict raises
    bad = bytearray(blob)
    bad[24] = 0x0B
    row_c = _media_row(3, bytes(bad), img, wavc, flacc, vidc, False,
                       hex_sha)
    assert row_c[1] == "corrupt" and row_c[2] == "flv"
    with pytest.raises(FlvDecodeError):
        _media_row(3, bytes(bad), img, wavc, flacc, vidc, True, hex_sha)
