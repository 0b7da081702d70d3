"""ISO-BMFF box-walk codec tests (operators/videocodec.py, r12):
layout pins, v0/v1 roundtrips, bomb caps, and the codec-family mutation
fuzz contract."""
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.videocodec import (
    MAX_BOXES,
    MAX_BOX_DEPTH,
    VideoDecodeError,
    encode_mp4,
    mdat_payload,
    parse_mp4,
    sniff_mp4,
)


def test_mp4_layout_pinned_bytes():
    """Hand-derived header layout: ftyp is the first box (sniff magic),
    sizes are u32 BE + fourcc, tkhd carries 16.16 dims, stsd the codec
    fourcc — all offsets restated independently here so the encoder and
    walker can't drift together."""
    blob = encode_mp4(320, 240, 1500, payload=b"pay", codec="avc1")
    assert sniff_mp4(blob)
    # ftyp: size 20, brand isom, minor 0, compat isom
    assert blob[:20] == struct.pack(">I", 20) + b"ftyp" + b"isom" + b"\x00" * 4 + b"isom"
    # moov follows; its declared size spans to the mdat box
    (moov_size,) = struct.unpack_from(">I", blob, 20)
    assert blob[24:28] == b"moov"
    mdat_at = 20 + moov_size
    (mdat_size,) = struct.unpack_from(">I", blob, mdat_at)
    assert blob[mdat_at + 4 : mdat_at + 8] == b"mdat"
    assert mdat_size == 8 + 3
    assert blob[mdat_at + 8 :] == b"pay"
    # mvhd v0: timescale at body+12, duration at body+16 (after
    # version/flags + creation + modification)
    mvhd_body = 28 + 8 + 4  # moov body + mvhd header + ver/flags
    timescale, duration = struct.unpack_from(">II", blob, mvhd_body + 8)
    assert (timescale, duration) == (1000, 1500)
    # spec box lengths (ISO 14496-12 §8.2.2): mvhd v0 = 108, v1 = 120 —
    # the first cut wrote 2 extra reserved bytes (caught in self-review)
    (mvhd_size,) = struct.unpack_from(">I", blob, 28)
    assert mvhd_size == 108
    from wwwision_importservice_spark.operators.videocodec import (
        encode_mp4 as _enc,
    )
    v1 = _enc(320, 240, 1500, version=1)
    (v1_size,) = struct.unpack_from(">I", v1, v1.index(b"mvhd") - 4)
    assert v1_size == 120
    # tkhd 16.16 dims sit in the last 8 bytes of the tkhd box
    tkhd_at = blob.index(b"tkhd") - 4
    (tkhd_size,) = struct.unpack_from(">I", blob, tkhd_at)
    w16, h16 = struct.unpack_from(">II", blob, tkhd_at + tkhd_size - 8)
    assert (w16 >> 16, h16 >> 16) == (320, 240)
    # stsd's first sample entry fourcc is the codec
    stsd_at = blob.index(b"stsd") - 4
    assert blob[stsd_at + 20 : stsd_at + 24] == b"avc1"
    meta = parse_mp4(blob)
    assert meta == {
        "format": "mp4", "major_brand": "isom", "width": 320,
        "height": 240, "duration_ms": 1500, "codec": "avc1",
        "has_video": True, "n_frames": None,
        "sample_rate": None, "channels": None,
        "mdat_spans": [(mdat_at + 8, len(blob))],
    }
    assert mdat_payload(blob) == b"pay"


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("timescale", [1000, 90000, 600])
def test_mp4_roundtrip_versions_and_timescales(version, timescale):
    """v0 (u32 times) and v1 (u64 times) mvhd/tkhd both roundtrip; the
    duration survives the ms→timescale→ms floor for every timescale
    that divides 1000 into it exactly, and the floor is deterministic
    otherwise."""
    blob = encode_mp4(
        1920, 1080, 123456, payload=b"z" * 17, codec="hvc1",
        timescale=timescale, version=version,
    )
    meta = parse_mp4(blob)
    assert (meta["width"], meta["height"]) == (1920, 1080)
    assert meta["codec"] == "hvc1"
    expect = (123456 * timescale // 1000) * 1000 // timescale
    assert meta["duration_ms"] == expect
    assert mdat_payload(blob) == b"z" * 17


def test_mp4_multiple_mdat_spans_concatenate():
    base = encode_mp4(64, 48, 100, payload=b"first", codec="avc1")
    blob = base + struct.pack(">I", 8 + 6) + b"mdat" + b"second"
    assert mdat_payload(blob) == b"firstsecond"


def test_mp4_audio_only_track_reports_codec_null_dims():
    """An hdlr of 'soun' (built by patching the fixture's handler) is
    not a video track: codec still reported, dims stay NULL."""
    blob = bytearray(encode_mp4(64, 48, 100, codec="mp4a"))
    at = bytes(blob).index(b"vide")
    blob[at : at + 4] = b"soun"
    meta = parse_mp4(bytes(blob))
    assert meta["codec"] == "mp4a"
    assert meta["width"] is None and meta["height"] is None
    assert meta["duration_ms"] == 100  # mvhd is track-independent


def test_mp4_zero_timescale_reports_null_duration():
    blob = bytearray(encode_mp4(64, 48, 100))
    mvhd_body = 28 + 8 + 4
    struct.pack_into(">I", blob, mvhd_body + 8, 0)  # timescale := 0
    assert parse_mp4(bytes(blob))["duration_ms"] is None


def test_mp4_largesize_and_size_zero_boxes():
    """size==1 promotes to a u64 largesize; size==0 runs to the end of
    the enclosing container — both per ISO 14496-12 §4.2."""
    base = encode_mp4(64, 48, 100, payload=b"")
    large = (
        base
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 4) + b"big!"
    )
    assert mdat_payload(large) == b"big!"
    to_end = base + struct.pack(">I", 0) + b"mdat" + b"tail-bytes"
    assert mdat_payload(to_end) == b"tail-bytes"


def test_mp4_bomb_caps_and_typed_errors():
    from wwwision_importservice_spark.operators.videocodec import _walk

    base = encode_mp4(64, 48, 100)
    # depth cap: parse_mp4's recursion is structural (moov→trak→mdia→
    # minf→stbl, fixed ≤6), so the guard is defense-in-depth for any
    # future recursive walker — pinned directly on _walk
    with pytest.raises(VideoDecodeError, match="nesting"):
        list(_walk(b"\x00" * 16, 0, 16, MAX_BOX_DEPTH + 1, [0]))
    # box-count bomb: a flat run of minimal boxes past MAX_BOXES —
    # must reject by COUNT in bounded time, cost ∝ its own bytes
    flat = base[:20] + (struct.pack(">I", 8) + b"free") * (MAX_BOXES + 10)
    start = time.perf_counter()
    with pytest.raises(VideoDecodeError, match="boxes"):
        parse_mp4(flat)
    assert time.perf_counter() - start < 2.0
    # declared size past the container
    with pytest.raises(VideoDecodeError, match="past its container"):
        parse_mp4(base[:20] + struct.pack(">I", 999) + b"mdat")
    # size < header
    with pytest.raises(VideoDecodeError, match="< header"):
        parse_mp4(base[:20] + struct.pack(">I", 4) + b"mdat")
    # truncated header
    with pytest.raises(VideoDecodeError, match="truncated"):
        parse_mp4(base[:20] + b"\x00\x00")
    # not BMFF at all
    with pytest.raises(VideoDecodeError, match="ftyp"):
        parse_mp4(b"RIFFxxxxWAVE")


def test_mp4_encoder_input_contract():
    with pytest.raises(ValueError, match="dims"):
        encode_mp4(0, 48, 100)
    with pytest.raises(ValueError, match="dims"):
        encode_mp4(64, 1 << 16, 100)
    with pytest.raises(ValueError, match="duration"):
        encode_mp4(64, 48, -1)
    with pytest.raises(ValueError, match="timescale"):
        encode_mp4(64, 48, 100, timescale=0)
    with pytest.raises(ValueError, match="fourcc"):
        encode_mp4(64, 48, 100, codec="toolong")
    with pytest.raises(ValueError, match="version"):
        encode_mp4(64, 48, 100, version=2)


def test_mp4_mutation_fuzz_error_contract():
    """Codec-family fuzz (conftest.mutate_blob): every mutation either
    parses to a metadata dict or raises VideoDecodeError — no other
    exception type, no hang. Seeds cover both mvhd/tkhd versions."""
    from conftest import mutate_blob

    rng = random.Random(0xB0CE5)
    bases = [
        encode_mp4(640, 360, 2500, payload=b"p" * 40, codec="avc1"),
        encode_mp4(320, 200, 987, payload=b"q" * 9, codec="hvc1",
                   version=1, timescale=90000),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_mp4(blob):
                continue  # out of this codec's contract; media_metadata
                # routes non-ftyp bytes to other codecs or 'unknown'
            try:
                meta = parse_mp4(blob)
                assert isinstance(meta, dict)
                mdat_payload(blob, meta)
                outcomes["ok"] += 1
            except VideoDecodeError:
                outcomes["rejected"] += 1
    # the walk is tolerant of payload-byte mutations (most of the file)
    # but must reject structural damage; both outcomes must occur
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


# --------------------------------------------------------------------------
# Matroska / WebM (EBML walk)


def test_webm_roundtrip_and_layout():
    from wwwision_importservice_spark.operators.videocodec import (
        encode_webm,
        media_payload,
        parse_webm,
        sniff_webm,
    )

    blob = encode_webm(1280, 720, 4321, payload=b"frame-bytes", codec="V_VP9")
    assert sniff_webm(blob) and blob[:4] == b"\x1a\x45\xdf\xa3"
    meta = parse_webm(blob)
    assert meta["format"] == "webm" and meta["has_video"]
    assert (meta["width"], meta["height"]) == (1280, 720)
    assert meta["duration_ms"] == 4321 and meta["codec"] == "V_VP9"
    # payload address covers the Cluster body (Timestamp + SimpleBlock
    # header + frame bytes) — this mux's media region, documented
    assert len(meta["payload_spans"]) == 1
    s, e = meta["payload_spans"][0]
    assert blob[s:e].endswith(b"frame-bytes")
    assert media_payload(blob, meta) == blob[s:e]
    # matroska doctype reports through format
    mkv = encode_webm(64, 48, 10, doctype="matroska", codec="V_AV1")
    assert parse_webm(mkv)["format"] == "matroska"


def test_webm_audio_only_routes_as_audio_in_media_row():
    """An audio-only container reports codec + sample_rate/channels
    (Matroska Audio element / ISO-BMFF AudioSampleEntry, r12) with NULL
    dims and has_video=False; _media_row routes it kind='audio'."""
    import hashlib

    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    blob = vidc.encode_webm(64, 48, 777, codec="A_OPUS", track="audio",
                            channels=2, sample_rate_hz=48000)
    meta = vidc.parse_webm(blob)
    assert not meta["has_video"] and meta["codec"] == "A_OPUS"
    assert meta["width"] is None and meta["height"] is None
    assert (meta["sample_rate"], meta["channels"]) == (48000, 2)

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    row = _media_row(9, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "audio" and row[2] == "webm" and row[10] == "A_OPUS"
    assert (row[6], row[7]) == (48000, 2)  # sample_rate, channels
    # and the ISO-BMFF twin of the same policy (M4A shape)
    m4a = vidc.encode_mp4(64, 48, 500, codec="mp4a", track="audio",
                          channels=1, sample_rate_hz=16000)
    meta = vidc.parse_mp4(m4a)
    assert (meta["sample_rate"], meta["channels"]) == (16000, 1)
    row = _media_row(10, m4a, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "audio" and row[2] == "mp4" and row[10] == "mp4a"
    assert (row[6], row[7]) == (16000, 1)
    # the legacy patched-handler path (no audio entry fields present in
    # a VisualSampleEntry... they parse as garbage-guarded None/values;
    # the routing itself must still hold)
    patched = bytearray(vidc.encode_mp4(64, 48, 500, codec="mp4a"))
    at = bytes(patched).index(b"vide")
    patched[at : at + 4] = b"soun"
    row = _media_row(11, bytes(patched), img, wavc, flacc, vidc, False,
                     hex_sha)
    assert row[1] == "audio" and row[2] == "mp4"
    # video files keep NULL sample fields
    v = vidc.parse_mp4(vidc.encode_mp4(64, 48, 500))
    assert v["sample_rate"] is None and v["channels"] is None


def test_webm_bomb_caps_and_typed_errors():
    import struct as _s

    from wwwision_importservice_spark.operators.videocodec import (
        MAX_EBML_ELEMENTS,
        VideoDecodeError,
        encode_webm,
        parse_webm,
    )

    base = encode_webm(64, 48, 100)
    # element-count bomb: a flat run of tiny elements inside Segment
    flood = b"\xec\x80" * (MAX_EBML_ELEMENTS + 10)  # Void, size 0
    seg = b"\x18\x53\x80\x67" + bytes([0x01]) + len(flood).to_bytes(7, "big")
    start = time.perf_counter()
    with pytest.raises(VideoDecodeError, match="elements"):
        parse_webm(base[: base.index(b"\x18\x53\x80\x67")] + seg + flood)
    assert time.perf_counter() - start < 2.0
    # size past container
    with pytest.raises(VideoDecodeError, match="past its container"):
        parse_webm(base[:-3])
    # zero TimestampScale
    blob = bytearray(base)
    at = bytes(blob).index(b"\x2a\xd7\xb1")
    blob[at + 4 : at + 7] = b"\x00\x00\x00"
    with pytest.raises(VideoDecodeError, match="TimestampScale"):
        parse_webm(bytes(blob))
    # not EBML
    with pytest.raises(VideoDecodeError, match="EBML"):
        parse_webm(b"RIFFxxxxWAVE" + b"\x00" * 8)
    # encoder contract
    with pytest.raises(ValueError, match="dims"):
        encode_webm(0, 48, 100)
    with pytest.raises(ValueError, match="duration"):
        encode_webm(64, 48, -5)
    _ = _s  # silence unused when asserts are trimmed


def test_webm_mutation_fuzz_error_contract():
    from conftest import mutate_blob

    from wwwision_importservice_spark.operators.videocodec import (
        VideoDecodeError,
        encode_webm,
        media_payload,
        parse_webm,
        sniff_webm,
    )

    rng = random.Random(0xEB31)
    base = encode_webm(640, 360, 2500, payload=b"p" * 64, codec="V_VP9")
    outcomes = {"ok": 0, "rejected": 0}
    for _ in range(1000):
        blob = bytes(mutate_blob(rng, base))
        if not sniff_webm(blob):
            continue
        try:
            meta = parse_webm(blob)
            media_payload(blob, meta)
            outcomes["ok"] += 1
        except VideoDecodeError:
            outcomes["rejected"] += 1
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp4_fragmented_duration_sources():
    """CMAF/DASH files write mvhd duration 0 and declare the real
    length in mvex/mehd or per-segment sidx indexes (r12): precedence
    is nonzero mvhd > mehd (movie timescale) > sidx subsegment sum."""
    for frag in ("mehd", "sidx"):
        blob = encode_mp4(640, 360, 12345, payload=b"pp", codec="avc1",
                          fragmented=frag)
        meta = parse_mp4(blob)
        assert meta["duration_ms"] == 12345, frag
        assert (meta["width"], meta["height"]) == (640, 360)
        assert mdat_payload(blob, meta) == b"pp"
        # the mvhd itself really declares empty (fragmented shape)
        mvhd_body = blob.index(b"mvhd") + 4 + 4
        ts, dur = struct.unpack_from(">II", blob, mvhd_body + 8)
        assert dur == 0 and ts == 1000
    # sidx sums MULTIPLE references (odd split exercises the remainder)
    blob = encode_mp4(64, 48, 101, fragmented="sidx")
    assert parse_mp4(blob)["duration_ms"] == 101
    # a nonzero mvhd wins over a trailing sidx: append a sidx declaring
    # a different total to a progressive (non-fragmented) file
    base = encode_mp4(64, 48, 500)
    extra = encode_mp4(64, 48, 999, fragmented="sidx")
    sidx_box_at = extra.index(b"sidx") - 4
    (sz,) = struct.unpack_from(">I", extra, sidx_box_at)
    blob = base + extra[sidx_box_at : sidx_box_at + sz]
    assert parse_mp4(blob)["duration_ms"] == 500
    with pytest.raises(ValueError, match="fragmented"):
        encode_mp4(64, 48, 100, fragmented="moof")


def test_mp4_fragmented_mutation_fuzz():
    """The mehd/sidx/moof parsers are new attack surface — fuzz from a
    fragmented seed under the same typed-error contract."""
    from conftest import mutate_blob

    rng = random.Random(0xF4A6)
    bases = [
        encode_mp4(320, 200, 4444, payload=b"f" * 21, fragmented="sidx"),
        encode_mp4(320, 200, 4444, payload=b"f" * 9, fragmented="mehd"),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_mp4(blob):
                continue
            try:
                meta = parse_mp4(blob)
                mdat_payload(blob, meta)
                outcomes["ok"] += 1
            except VideoDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0 and outcomes["rejected"] > 0, outcomes


def test_mp4_stts_frame_count_and_mandatory_sample_tables():
    """stbl carries the spec-mandatory stts/stsc/stsz/stco (§8.5.1);
    n_frames reports the stts sample total for the video track and
    stays None when the table is empty (the fragmented convention —
    samples live in unparsed moof/trun runs)."""
    blob = encode_mp4(64, 48, 900, n_frames=27)
    for fourcc in (b"stts", b"stsc", b"stsz", b"stco"):
        assert fourcc in blob
    meta = parse_mp4(blob)
    assert meta["n_frames"] == 27
    # empty stts -> None, not 0
    assert parse_mp4(encode_mp4(64, 48, 900))["n_frames"] is None
    assert parse_mp4(encode_mp4(64, 48, 900, fragmented="sidx"))["n_frames"] is None
    # multi-entry stts sums runs: append a second (count, delta) entry
    raw = bytearray(encode_mp4(64, 48, 900, n_frames=5))
    at = bytes(raw).index(b"stts") - 4
    (sz,) = struct.unpack_from(">I", raw, at)
    entry2 = struct.pack(">II", 7, 33)
    patched = (bytes(raw[:at]) + struct.pack(">I", sz + 8) + bytes(raw[at + 4 : at + 12])
               + struct.pack(">I", 2) + bytes(raw[at + 16 : at + sz]) + entry2
               + bytes(raw[at + sz :]))
    # fix the enclosing chain (stbl/minf/mdia/trak/moov) sizes
    out = bytearray(patched)
    for parent in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        p_at = bytes(out).index(parent) - 4
        (p_sz,) = struct.unpack_from(">I", out, p_at)
        struct.pack_into(">I", out, p_at, p_sz + 8)
    assert parse_mp4(bytes(out))["n_frames"] == 12
    with pytest.raises(ValueError, match="n_frames"):
        encode_mp4(64, 48, 900, n_frames=-1)


def test_webm_block_frame_counting():
    """n_frames header-hops the video track's cluster blocks: lacing
    flags carry frame_count-1 (RFC 9559 §10), BlockGroup/Block counts
    like SimpleBlock, and other tracks' blocks are excluded."""
    from wwwision_importservice_spark.operators.videocodec import (
        _ebml,
        encode_webm,
        parse_webm,
    )

    blob = encode_webm(64, 48, 900, payload=b"xy", n_frames=5)
    assert parse_webm(blob)["n_frames"] == 5
    # append a second cluster holding: an EBML-laced block with 3
    # frames (lacing bits 0b11 -> frame_count-1 byte = 2), a track-2
    # block (ignored), and a BlockGroup/Block (counted)
    laced = _ebml(0xA3, b"\x81\x00\x00\x06\x02" + b"fff")
    other_track = _ebml(0xA3, b"\x82\x00\x00\x00" + b"zz")
    grouped = _ebml(0xA0, _ebml(0xA1, b"\x81\x00\x00\x00" + b"g"))
    cluster2 = _ebml(0x1F43B675, _ebml(0xE7, b"\x01") + laced
                     + other_track + grouped)
    # rebuild the Segment with the extra cluster (the original 1-byte
    # size vint can't hold the grown body)
    seg_at = blob.index(b"\x18\x53\x80\x67")
    size_pos = seg_at + 4
    length = 9 - blob[size_pos].bit_length()
    seg_body = blob[size_pos + length :]
    patched = blob[:seg_at] + _ebml(0x18538067, seg_body + cluster2)
    meta = parse_webm(patched)
    # 5 original + 3 laced + 1 grouped; the track-2 block is excluded
    assert meta["n_frames"] == 9


# --------------------------------------------------------------------------
# r13: mux-order independence, fragmented trun counts, unknown-duration
# sentinel, streamed (unknown-size) clusters, typed block-walk budget


def test_mp4_two_track_reporting_is_mux_order_independent():
    """An A/V file reports the video track's dims/codec AND the first
    audio track's rate/channels in BOTH trak orders (r12 advisor catch:
    audio-first used to leak partial fields, video-first reported
    NULLs)."""
    for audio_first in (False, True):
        blob = encode_mp4(640, 360, 2500, payload=b"av", codec="avc1",
                          n_frames=12, with_audio=True,
                          audio_first=audio_first, audio_codec="mp4a",
                          channels=2, sample_rate_hz=44100)
        meta = parse_mp4(blob)
        assert meta["has_video"], audio_first
        assert (meta["width"], meta["height"]) == (640, 360)
        assert meta["codec"] == "avc1"
        assert meta["n_frames"] == 12
        assert (meta["sample_rate"], meta["channels"]) == (44100, 2)
        assert mdat_payload(blob, meta) == b"av"
    with pytest.raises(ValueError, match="with_audio"):
        encode_mp4(64, 48, 100, track="audio", with_audio=True)


def test_webm_two_track_reporting_is_mux_order_independent():
    from wwwision_importservice_spark.operators.videocodec import (
        encode_webm,
        parse_webm,
    )

    for audio_first in (False, True):
        blob = encode_webm(1280, 720, 4321, payload=b"f", codec="V_VP9",
                           n_frames=3, with_audio=True,
                           audio_first=audio_first, audio_codec="A_OPUS",
                           channels=6, sample_rate_hz=48000)
        meta = parse_webm(blob)
        assert meta["has_video"], audio_first
        assert (meta["width"], meta["height"]) == (1280, 720)
        assert meta["codec"] == "V_VP9"
        assert meta["n_frames"] == 3  # blocks are track-1 (video) only
        assert (meta["sample_rate"], meta["channels"]) == (48000, 6)
    with pytest.raises(ValueError, match="with_audio"):
        encode_webm(64, 48, 100, track="audio", with_audio=True)


def test_media_row_av_file_reports_both_lanes():
    """media_metadata's video row for an A/V mux carries dims + codec +
    the audio track's rate/channels (r13 contract)."""
    import hashlib

    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    for audio_first in (False, True):
        blob = vidc.encode_mp4(320, 200, 999, payload=b"x" * 9,
                               with_audio=True, audio_first=audio_first)
        row = _media_row(1, blob, img, wavc, flacc, vidc, True, hex_sha)
        assert row[1] == "video" and row[2] == "mp4"
        assert (row[3], row[4]) == (320, 200)  # width, height
        assert (row[6], row[7]) == (44100, 2)  # sample_rate, channels


def test_mp4_fragmented_trun_frame_counts():
    """Fragmented files report real n_frames from the moof/traf/trun
    sample_count sum (tfhd-keyed to the video track), with the stts
    staying empty — the CMAF convention (r12 VERDICT ask #5)."""
    for frag in ("mehd", "sidx"):
        blob = encode_mp4(640, 360, 12345, payload=b"pp", codec="avc1",
                          fragmented=frag, n_frames=25)
        meta = parse_mp4(blob)
        assert meta["n_frames"] == 25, frag       # 12+13 across two truns
        assert meta["duration_ms"] == 12345, frag
        # the stts really is empty (the count does NOT come from it)
        at = blob.index(b"stts") + 4 + 4
        assert struct.unpack_from(">I", blob, at)[0] == 0
    # single-sample run exercises the one-trun path
    blob = encode_mp4(64, 48, 100, fragmented="mehd", n_frames=1)
    assert parse_mp4(blob)["n_frames"] == 1
    # a trun keyed to a NON-video track_ID is excluded
    raw = bytearray(encode_mp4(64, 48, 100, fragmented="mehd", n_frames=7))
    at = bytes(raw).index(b"tfhd") + 4 + 4
    struct.pack_into(">I", raw, at, 9)  # track_ID := 9 (no such track)
    assert parse_mp4(bytes(raw))["n_frames"] is None


def test_mp4_unknown_duration_sentinel_falls_through():
    """An all-ones mvhd duration is the ISO-BMFF 'unknown' sentinel
    (14496-12 §8.2.2), not a real length: it must report None — or let
    the mehd/sidx fallbacks take over — instead of a bogus enormous
    duration (r12 advisor catch)."""
    # v0 sentinel, no fallback -> None
    raw = bytearray(encode_mp4(64, 48, 500))
    mvhd_body = 28 + 8 + 4
    struct.pack_into(">I", raw, mvhd_body + 12, 0xFFFFFFFF)
    assert parse_mp4(bytes(raw))["duration_ms"] is None
    # v1 sentinel -> None
    raw = bytearray(encode_mp4(64, 48, 500, version=1))
    at = bytes(raw).index(b"mvhd") + 4 + 4  # body after ver/flags
    struct.pack_into(">Q", raw, at + 20, (1 << 64) - 1)  # after 8+8+4
    assert parse_mp4(bytes(raw))["duration_ms"] is None
    # sentinel + mehd -> the mehd duration wins (fragmented real-world
    # files commonly write the sentinel)
    raw = bytearray(encode_mp4(64, 48, 12345, fragmented="mehd"))
    struct.pack_into(">I", raw, mvhd_body + 12, 0xFFFFFFFF)
    assert parse_mp4(bytes(raw))["duration_ms"] == 12345


def test_webm_streamed_unknown_size_cluster_counts_all_blocks():
    """An unknown-size Cluster (the live/streamed shape) spans to the
    Segment end; later clusters nest INSIDE that span and their blocks
    must still count (r12 advisor catch: the walk now recurses into
    nested Cluster elements)."""
    from wwwision_importservice_spark.operators.videocodec import (
        encode_webm,
        parse_webm,
    )

    blob = encode_webm(64, 48, 900, payload=b"xy", n_frames=5,
                       streamed=True)
    meta = parse_webm(blob)
    # one span (cluster 2's framing sits inside cluster 1's span)...
    assert len(meta["payload_spans"]) == 1
    # ...but every block in both clusters is counted exactly once
    assert meta["n_frames"] == 5
    # n_frames=1 -> the second cluster is empty, still counts right
    one = encode_webm(64, 48, 900, payload=b"z", streamed=True)
    assert parse_webm(one)["n_frames"] == 1
    # non-streamed twin agrees
    assert parse_webm(encode_webm(64, 48, 900, payload=b"xy",
                                  n_frames=5))["n_frames"] == 5


def test_webm_block_walk_budget_is_typed(monkeypatch):
    """Budget exhaustion in the block walk is a TYPED soft path
    (EbmlBudgetExceeded -> n_frames=None); structural corruption in a
    cluster stays a hard VideoDecodeError (r12 advisor catch: the old
    message-substring match would flip on a reword)."""
    from wwwision_importservice_spark.operators import videocodec as vidc
    from wwwision_importservice_spark.operators.videocodec import (
        EbmlBudgetExceeded,
        VideoDecodeError,
        _ebml,
        encode_webm,
        parse_webm,
    )

    assert issubclass(EbmlBudgetExceeded, VideoDecodeError)
    blob = encode_webm(64, 48, 900, n_frames=10)
    assert parse_webm(blob)["n_frames"] == 10
    # shrink the block-walk budget below the element count -> None
    monkeypatch.setattr(vidc, "MAX_BLOCK_WALK", 4)
    assert parse_webm(blob)["n_frames"] is None
    monkeypatch.undo()
    # a truncated block HEADER inside a cluster is structural: hard error
    bad = _ebml(0x1F43B675, _ebml(0xE7, b"\x00") + _ebml(0xA3, b"\x81\x00"))
    seg_at = blob.index(b"\x18\x53\x80\x67")
    size_pos = seg_at + 4
    length = 9 - blob[size_pos].bit_length()
    seg_body = blob[size_pos + length:]
    patched = blob[:seg_at] + _ebml(0x18538067, seg_body + bad)
    with pytest.raises(VideoDecodeError, match="truncated block"):
        parse_webm(patched)


# --------------------------------------------------------------------------
# HEIF / AVIF image items (r13) — the misrouting fix: image-item
# ISO-BMFF (every iPhone HEIC, web AVIF) previously fell through the
# empty track walk as kind='audio' format='mp4' all-NULL.

def _heif_imports():
    from wwwision_importservice_spark.operators.videocodec import (
        encode_heif,
        parse_heif,
        sniff_heif,
    )
    return encode_heif, parse_heif, sniff_heif


def test_heif_roundtrip_and_decoy_resolution():
    """The PRIMARY item's ispe wins through pitm→ipma→ipco, not
    whichever ispe is first: the encoder writes the decoy thumbnails'
    half-size properties BEFORE the primary's in ipco, so a
    first-ispe-wins parser reports wrong dims here."""
    encode_heif, parse_heif, sniff_heif = _heif_imports()
    blob = encode_heif(640, 480, codec="av01", payload=b"coded" * 10,
                       extra_items=3)
    assert sniff_heif(blob)
    meta = parse_heif(blob)
    assert (meta["width"], meta["height"]) == (640, 480)
    assert meta["codec"] == "av01" and meta["format"] == "avif"
    assert meta["n_frames"] == 1 and not meta["animated"]
    assert mdat_payload(blob, meta) == b"coded" * 10
    # no decoys: same report
    plain = parse_heif(encode_heif(640, 480, codec="av01",
                                   payload=b"coded" * 10))
    assert (plain["width"], plain["height"], plain["codec"]) == \
        (640, 480, "av01")


def test_heif_brands_and_sequences():
    encode_heif, parse_heif, sniff_heif = _heif_imports()
    heic = encode_heif(4032, 3024, codec="hvc1")
    m = parse_heif(heic)
    assert m["format"] == "heic" and m["codec"] == "hvc1"
    assert m["major_brand"] == "heic"
    # sequence brand: animated, frame count honestly unknown (None, the
    # trak carries it) rather than a false 1
    avis = encode_heif(64, 64, codec="av01", brand="avis")
    m2 = parse_heif(avis)
    assert m2["animated"] and m2["n_frames"] is None
    assert m2["format"] == "avif"
    # compatible-brand detection: major mif1, codec brand in compat list
    mif = encode_heif(32, 32, codec="hvc1", brand="mif1")
    assert sniff_heif(mif) and parse_heif(mif)["format"] == "heif"
    # plain movie brands must not sniff as heif (order-based dispatch)
    movie = encode_mp4(64, 48, 1000, payload=b"x" * 8, codec="avc1",
                       n_frames=2)
    assert not sniff_heif(movie) and sniff_mp4(movie)


def test_heif_fallbacks_without_pitm_and_metadata_items():
    """Minimal encoders omit pitm/ipma: the first IMAGE item and first
    ispe drive the report, and metadata item types (Exif/mime) never
    do."""
    from wwwision_importservice_spark.operators.videocodec import (
        _box,
        _full,
        parse_heif,
    )

    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"pict" + b"\x00" * 13)
    infes = (
        _box(b"infe", bytes([2, 0, 0, 0]) + struct.pack(">HH", 1, 0)
             + b"Exif" + b"\x00")
        + _box(b"infe", bytes([2, 0, 0, 0]) + struct.pack(">HH", 2, 0)
               + b"av01" + b"\x00")
    )
    iinf = _full(b"iinf", 0, struct.pack(">H", 2) + infes)
    ipco = _box(b"ipco", _full(b"ispe", 0, struct.pack(">II", 100, 50)))
    iprp = _box(b"iprp", ipco)
    meta = _box(b"meta", bytes(4) + hdlr + iinf + iprp)
    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    blob = ftyp + meta + _box(b"mdat", b"p")
    m = parse_heif(blob)
    assert m["codec"] == "av01"  # Exif item skipped
    assert (m["width"], m["height"]) == (100, 50)


def test_heif_error_contract():
    from wwwision_importservice_spark.operators.videocodec import (
        _box,
        _full,
        parse_heif,
    )

    encode_heif, _parse, sniff_heif = _heif_imports()
    with pytest.raises(VideoDecodeError, match="image brand"):
        parse_heif(encode_mp4(32, 32, 100, payload=b"x"))
    # meta whose handler is not 'pict'
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avif")
    blob = ftyp + _box(b"meta", bytes(4) + hdlr)
    with pytest.raises(VideoDecodeError, match="pict"):
        parse_heif(blob)
    # truncated pitm / ispe
    good = encode_heif(10, 10, codec="av01", payload=b"z")
    pitm_at = good.index(b"pitm")
    bad = bytearray(good)
    struct.pack_into(">I", bad, pitm_at - 4, 8 + 4)  # body ends after flags
    with pytest.raises(VideoDecodeError):
        parse_heif(bytes(bad))
    # encoder contract
    with pytest.raises(ValueError, match="positive"):
        encode_heif(0, 5)
    with pytest.raises(ValueError, match="fourcc"):
        encode_heif(5, 5, codec="toolong")
    with pytest.raises(ValueError, match="image brand"):
        encode_heif(5, 5, brand="isom")
    with pytest.raises(ValueError, match="0..126"):
        encode_heif(5, 5, extra_items=127)


def test_heif_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    VideoDecodeError — no other exception, no hang."""
    from conftest import mutate_blob

    encode_heif, parse_heif, sniff_heif = _heif_imports()
    rng = random.Random(0x43E1F)
    bases = [
        encode_heif(320, 200, codec="av01", payload=b"q" * 40,
                    extra_items=2),
        encode_heif(64, 64, codec="hvc1", payload=b"h" * 16),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_heif(blob):
                continue
            try:
                meta = parse_heif(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except VideoDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_media_row_routes_heif_not_audio():
    """THE regression pin: AVIF/HEIC bytes route as kind='image' with
    real dims/codec — before r13 they fell through the track walk as
    kind='audio' format='mp4' with every field NULL. Corrupt meta
    quarantines; strict raises."""
    import hashlib

    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    encode_heif, _parse, _sniff = _heif_imports()
    blob = encode_heif(1920, 1080, codec="av01", payload=b"payload" * 5,
                       extra_items=1)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "image" and row[2] == "avif"
    assert (row[3], row[4], row[5]) == (1920, 1080, 1)
    assert row[10] == "av01"
    assert row[12] == hex_sha(b"payload" * 5)  # coded-payload address
    # corrupt: truncate inside meta -> quarantine as heif, not a crash
    bad = blob[: blob.index(b"ispe") + 6]
    row_c = _media_row(2, bad, img, wavc, flacc, vidc, False, hex_sha)
    assert row_c[1] == "corrupt" and row_c[2] == "heif"
    with pytest.raises(VideoDecodeError):
        _media_row(2, bad, img, wavc, flacc, vidc, True, hex_sha)
