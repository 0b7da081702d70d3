"""AVI (RIFF) container metadata codec (r14): header layout
conformance, the demux-invariant per-stream content address, bomb
caps, and the family mutation-fuzz/error contract. Pure codec tests —
the Spark-side routing sits under the x4_media_metadata oracle and
test_media_row_routes_avi."""

from __future__ import annotations

import hashlib
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.avicodec import (
    MAX_AVI_CHUNKS,
    AviDecodeError,
    encode_avi,
    media_payload,
    parse_avi,
    sniff_avi,
)


def test_avi_layout_pinned_bytes():
    """Hand-derived layout (AVI RIFF File Reference): RIFF + u32le
    size + 'AVI ', LIST/hdrl with the 56-byte avih (µs/frame at +0,
    total frames at +16, canvas at +32) and a strl per stream whose
    strh leads with fccType/fccHandler."""
    blob = encode_avi(320, 240, 10, 40000, b"v" * 50, "MJPG")
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    assert struct.unpack_from("<I", blob, 4)[0] == len(blob) - 8
    assert blob[12:16] == b"LIST" and blob[20:24] == b"hdrl"
    assert blob[24:28] == b"avih"
    assert struct.unpack_from("<I", blob, 28)[0] == 56
    avih = 32
    assert struct.unpack_from("<I", blob, avih)[0] == 40000  # us/frame
    assert struct.unpack_from("<I", blob, avih + 16)[0] == 10  # frames
    assert struct.unpack_from("<II", blob, avih + 32) == (320, 240)
    strh_at = blob.index(b"strh") + 8
    assert blob[strh_at : strh_at + 4] == b"vids"
    assert blob[strh_at + 4 : strh_at + 8] == b"MJPG"
    assert struct.unpack_from("<I", blob, blob.index(b"strh") + 4)[0] == 56
    assert sniff_avi(blob)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(interleave=3, audio_chunks=4),
    dict(junk=True, with_idx1=True),
    dict(interleave=1, audio_chunks=2, junk=True),
    dict(audio_chunks=5, with_idx1=True),
])
def test_avi_demux_invariant_address(kwargs):
    """The content address is the per-stream concatenated movi chunk
    bodies: re-interleaving, re-chunking the audio, adding JUNK
    padding, or appending an idx1 index must not move the hash."""
    vp, ap = bytes(range(200)), bytes(range(100, 200))
    blob = encode_avi(320, 240, 10, 40000, vp, "MJPG", ap, 22050, 2,
                      **kwargs)
    m = parse_avi(blob)
    assert (m["width"], m["height"], m["n_frames"], m["duration_ms"]) \
        == (320, 240, 10, 400)
    assert m["codec"] == "mjpg" and m["has_video"]
    assert (m["sample_rate"], m["channels"]) == (22050, 2)
    assert media_payload(blob, m) == vp + ap


def test_avi_video_only_and_honest_none_codec():
    b2 = encode_avi(100, 80, 3, 33000, b"xyz" * 5, "XVID")
    m2 = parse_avi(b2)
    assert m2["sample_rate"] is None and m2["channels"] is None
    assert (m2["n_frames"], m2["duration_ms"]) == (3, 99)
    assert m2["codec"] == "xvid"
    assert media_payload(b2, m2) == b"xyz" * 5
    # zero fccHandler: honest None, not an empty-string guess
    z = bytearray(b2)
    at = z.index(b"strh") + 8 + 4
    z[at : at + 4] = b"\x00" * 4
    assert parse_avi(bytes(z))["codec"] is None


def test_avi_truncation_and_error_contract():
    vp = bytes(range(60))
    blob = encode_avi(64, 48, 4, 25000, vp, "DIB ")
    # truncation inside movi: trailing chunks drop out (crawl posture)
    m = parse_avi(blob[:-10])
    assert m["n_frames"] == 4  # header intact; fewer payload regions
    assert len(m["payload_regions"]) < 4
    # garbage after the RIFF payload is invisible
    assert media_payload(blob + b"\xde\xad" * 9,
                         parse_avi(blob + b"\xde\xad" * 9)) == vp
    # no avih: typed error
    noh = blob.replace(b"avih", b"avXh")
    with pytest.raises(AviDecodeError, match="avih"):
        parse_avi(noh)
    # no movi
    nom = blob.replace(b"movi", b"moXi")
    with pytest.raises(AviDecodeError, match="movi"):
        parse_avi(nom)
    # zero canvas
    z = bytearray(blob)
    struct.pack_into("<I", z, 32 + 32, 0)
    with pytest.raises(AviDecodeError, match="canvas"):
        parse_avi(bytes(z))
    # auds strf declaring zero rate
    ab = bytearray(encode_avi(64, 48, 2, 40000, b"vv", "MJPG",
                              b"aaaa", 8000, 1))
    sa = ab.index(b"auds")  # strh body; its strf follows
    fa = ab.index(b"strf", sa) + 8
    struct.pack_into("<I", ab, fa + 4, 0)
    with pytest.raises(AviDecodeError, match="zero"):
        parse_avi(bytes(ab))
    assert not sniff_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_avi_chunk_bomb_cap(monkeypatch):
    import wwwision_importservice_spark.operators.avicodec as ac

    blob = encode_avi(64, 48, 40, 1000, bytes(80), "MJPG")
    monkeypatch.setattr(ac, "MAX_AVI_CHUNKS", 10)
    with pytest.raises(AviDecodeError, match="chunks"):
        ac.parse_avi(blob)
    monkeypatch.undo()
    assert parse_avi(blob)["n_frames"] == 40


def test_avi_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    AviDecodeError — no other exception, no hang."""
    from conftest import mutate_blob

    rng = random.Random(0xAB1)
    bases = [
        encode_avi(320, 200, 6, 40000, bytes(range(120)), "MJPG",
                   bytes(range(60)), 11025, 1, interleave=2,
                   audio_chunks=3),
        encode_avi(64, 48, 5, 20000, bytes(range(50)), "XVID",
                   junk=True, with_idx1=True),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_avi(blob):
                continue
            try:
                meta = parse_avi(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except AviDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_avi_encoder_input_contract():
    with pytest.raises(ValueError, match=">= 1"):
        encode_avi(0, 4, 1, 1, b"x")
    with pytest.raises(ValueError, match="fourcc"):
        encode_avi(4, 4, 1, 1, b"x", codec="TOOLONG")
    with pytest.raises(ValueError, match=">= 1"):
        encode_avi(4, 4, 1, 1, b"x", audio_payload=b"a", sample_rate=0)


def test_media_row_routes_avi():
    """The r14 regression pin: AVI bytes route as kind='video' (or
    'audio' for audio-only files) with real header fields — previously
    the archive-video staple fell to kind='unknown'. RIFF stays
    disjoint from WAV/WebP; corrupt headers quarantine in non-strict
    mode."""
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

    vp, ap = bytes(range(90)), bytes(range(30, 90))
    blob = encode_avi(640, 480, 9, 50000, vp, "MJPG", ap, 44100, 2)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "video" and row[2] == "avi"
    assert (row[3], row[4], row[5]) == (640, 480, 9)
    assert (row[6], row[7]) == (44100, 2)  # first audio stream
    assert row[9] == 9 * 50000 // 1000 and row[10] == "mjpg"
    assert row[12] == hex_sha(vp + ap)
    # re-interleaved + indexed twin hashes identically
    twin = encode_avi(640, 480, 9, 50000, vp, "MJPG", ap, 44100, 2,
                      interleave=2, audio_chunks=3, junk=True,
                      with_idx1=True)
    row_t = _media_row(2, twin, img, wavc, flacc, vidc, False, hex_sha)
    assert row_t[12] == row[12] and row_t[11] == len(twin)
    # WAV still routes as wav (RIFF form disambiguation)
    wav = wavc.encode_wav(np.zeros(16, "<i2"), 8000)
    roww = _media_row(3, wav, img, wavc, flacc, vidc, False, hex_sha)
    assert roww[1] == "audio" and roww[2] == "wav"
    # corrupt avih: quarantine, not a crash; strict raises
    bad = blob.replace(b"avih", b"avXh")
    row_c = _media_row(4, bad, img, wavc, flacc, vidc, False, hex_sha)
    assert row_c[1] == "corrupt" and row_c[2] == "avi"
    with pytest.raises(AviDecodeError):
        _media_row(4, bad, img, wavc, flacc, vidc, True, hex_sha)
