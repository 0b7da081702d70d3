"""Ogg container metadata codec (r13): page-walk conformance, granule
duration arithmetic, repagination-invariant content addressing, bomb
caps, and the family mutation-fuzz/error contract. No Spark session —
pure codec tests (the Spark-side routing is pinned in the
x4_media_metadata oracle and test_media_row_routes_ogg)."""

from __future__ import annotations

import hashlib
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.oggcodec import (
    MAX_OGG_PAGES,
    OggDecodeError,
    _parse_page_header,
    encode_ogg,
    media_payload,
    parse_ogg,
    sniff_ogg,
)


def _naive_crc(data: bytes) -> int:
    """Independent bitwise RFC 3533 CRC-32 (poly 0x04c11db7, no
    reflection, zero init/xorout) — the table-driven encoder CRC must
    agree with this from-the-spec implementation."""
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def test_ogg_layout_pinned_bytes():
    """Hand-derived first page (RFC 3533 §6): capture pattern, version
    0, BOS flag, 8-byte granule, serial, sequence 0, real CRC, one
    lacing value for the 19-byte OpusHead — and the OpusHead fields at
    their RFC 7845 §5.1 offsets."""
    blob = encode_ogg("opus", 24000, 2, [b"pkt"], granule_end=4800,
                      pre_skip=312, serial=0xABCD1234)
    assert blob[:6] == b"OggS\x00\x02"  # version 0, BOS
    assert struct.unpack_from("<Q", blob, 6)[0] == 0  # header granule
    assert struct.unpack_from("<I", blob, 14)[0] == 0xABCD1234
    assert struct.unpack_from("<I", blob, 18)[0] == 0  # sequence
    assert blob[26] == 1 and blob[27] == 19  # one 19-byte lacing run
    head = blob[28:47]
    assert head[:8] == b"OpusHead" and head[8] == 1 and head[9] == 2
    assert struct.unpack_from("<HI", head, 10) == (312, 24000)
    # stored CRC == from-the-spec bitwise CRC over the zeroed-CRC page
    page_end = _parse_page_header(blob, 0)["end"]
    page = blob[:page_end]
    stored = struct.unpack_from("<I", page, 22)[0]
    assert stored == _naive_crc(page[:22] + b"\x00" * 4 + page[26:])
    assert sniff_ogg(blob)


@pytest.mark.parametrize("rate,chans,pre_skip,granule", [
    (48000, 1, 0, 48000), (24000, 2, 312, 96000), (8000, 1, 3840, 3839),
])
def test_ogg_opus_roundtrip(rate, chans, pre_skip, granule):
    pkts = [bytes([i]) * (5 + 7 * i) for i in range(4)]
    blob = encode_ogg("opus", rate, chans, pkts, granule_end=granule,
                      pre_skip=pre_skip)
    meta = parse_ogg(blob)
    assert meta["codec"] == "opus" and meta["format"] == "ogg"
    assert meta["sample_rate"] == rate and meta["channels"] == chans
    assert meta["n_frames"] == 4
    # Opus granules run at 48 kHz minus pre-skip, floored at zero
    assert meta["duration_ms"] == max(granule - pre_skip, 0) * 1000 // 48000
    assert media_payload(blob, meta) == b"".join(pkts)


@pytest.mark.parametrize("rate,chans", [(44100, 1), (48000, 2), (11025, 6)])
def test_ogg_vorbis_roundtrip(rate, chans):
    pkts = [b"audio-frame-%d" % i for i in range(3)]
    blob = encode_ogg("vorbis", rate, chans, pkts, granule_end=rate * 2)
    meta = parse_ogg(blob)
    assert meta["codec"] == "vorbis"
    assert meta["sample_rate"] == rate and meta["channels"] == chans
    # Vorbis granules are PCM positions at the stream rate; the three
    # header packets (ident/comment/setup) are excluded from the count
    assert meta["n_frames"] == 3 and meta["duration_ms"] == 2000
    assert media_payload(blob, meta) == b"".join(pkts)


def test_ogg_repagination_invariant_content_address():
    """The content address is the concatenated media-packet payloads:
    the same audio re-paginated (different page sizes, continued
    packets) yields different container bytes but the identical
    payload and counts — the property the x4 oracle pins."""
    pkts = [bytes(range(256))[i:] * 3 for i in range(6)]
    blobs = [
        encode_ogg("opus", 48000, 2, pkts, granule_end=9600,
                   max_page_segments=m)
        for m in (255, 4, 1)
    ]
    assert len({b for b in blobs}) == 3  # genuinely different containers
    metas = [parse_ogg(b) for b in blobs]
    payloads = {media_payload(b, m) for b, m in zip(blobs, metas)}
    assert payloads == {b"".join(pkts)}
    assert {m["n_frames"] for m in metas} == {6}
    assert {m["duration_ms"] for m in metas} == {9600 * 1000 // 48000}


def test_ogg_continued_packet_across_pages():
    """A packet bigger than a page's lacing budget splits mid-packet:
    the next page carries the continued flag (RFC 3533 §5) and the
    packet counts ONCE (only its terminating lacing value < 255)."""
    big = bytes(range(256)) * 5  # 1280 bytes -> 6 lacing values
    blob = encode_ogg("opus", 48000, 1, [big, b"tail"], granule_end=960,
                      max_page_segments=2)
    meta = parse_ogg(blob)
    assert meta["n_frames"] == 2
    assert media_payload(blob, meta) == big + b"tail"
    # at least one page carries the continued flag
    pos, flags = 0, []
    while (page := _parse_page_header(blob, pos)) is not None:
        flags.append(page["flags"])
        pos = page["end"]
    assert any(f & 0x01 for f in flags)
    # a 255-multiple packet needs its explicit 0 terminator
    exact = b"x" * 510
    meta2 = parse_ogg(encode_ogg("opus", 48000, 1, [exact], granule_end=1))
    assert meta2["n_frames"] == 1


def test_ogg_secondary_stream_pages_skipped():
    """Grouped-multiplex pages of ANOTHER serial are skipped: counts,
    duration, and the content address follow the first BOS stream
    only."""
    pkts = [b"mine-%d" % i for i in range(3)]
    blob = encode_ogg("opus", 48000, 1, pkts, granule_end=480,
                      serial=0x11111111)
    other = encode_ogg("vorbis", 44100, 2, [b"theirs"] * 4,
                       granule_end=44100, serial=0x22222222)
    # splice a foreign page in after our second page
    p0 = _parse_page_header(blob, 0)["end"]
    p1 = _parse_page_header(blob, p0)["end"]
    foreign = other[: _parse_page_header(other, 0)["end"]]
    spliced = blob[:p1] + foreign + blob[p1:]
    meta = parse_ogg(spliced)
    assert meta["codec"] == "opus" and meta["n_frames"] == 3
    assert meta["duration_ms"] == 480 * 1000 // 48000
    assert media_payload(spliced, meta) == b"".join(pkts)


def test_ogg_truncation_and_garbage_tolerance():
    """Crawl posture: truncation and trailing garbage end the stream
    region instead of erroring (the parse_mp3 convention); bytes after
    our stream's EOS page are ignored entirely."""
    pkts = [b"p%d" % i * 10 for i in range(4)]
    blob = encode_ogg("opus", 48000, 1, pkts, granule_end=1920,
                      max_page_segments=2)
    # truncate inside the last page: that page drops out of the walk
    meta = parse_ogg(blob[:-3])
    assert meta["codec"] == "opus"
    assert meta["n_frames"] is not None and meta["n_frames"] < 4
    # garbage after EOS is invisible
    meta2 = parse_ogg(blob + b"\xde\xad\xbe\xef" * 8)
    assert meta2["n_frames"] == 4
    assert meta2["duration_ms"] == 1920 * 1000 // 48000


def test_ogg_unknown_codec_container_fields_still_real():
    """An Ogg stream of a codec we don't know is still a valid Ogg
    stream: codec/rate/channels report None, packet counts come from
    the lacing walk (no header packets to exclude), duration stays
    None (no granule rate to divide by)."""
    blob = encode_ogg("opus", 48000, 1, [b"x"], granule_end=1)
    # rewrite the OpusHead magic to an unknown fourcc (CRC no longer
    # matches — the parser documents not checking it)
    blob = blob.replace(b"OpusHead", b"XcodecYZ", 1)
    meta = parse_ogg(blob)
    assert meta["codec"] is None and meta["sample_rate"] is None
    # all completed packets count: 2 headers + 1 media = 3
    assert meta["n_frames"] == 3 and meta["duration_ms"] is None


def test_ogg_error_contract():
    blob = encode_ogg("opus", 48000, 1, [b"x"], granule_end=1)
    with pytest.raises(OggDecodeError, match="capture pattern"):
        parse_ogg(b"NotAnOggStream" + blob)
    assert not sniff_ogg(b"NotAnOggStream")
    # BOS flag cleared on the first page
    no_bos = blob[:5] + b"\x00" + blob[6:]
    assert not sniff_ogg(no_bos)
    with pytest.raises(OggDecodeError, match="BOS"):
        parse_ogg(no_bos)
    # recognized magic, malformed identification header
    zero_ch = bytearray(blob)
    zero_ch[28 + 9] = 0  # OpusHead channel count
    with pytest.raises(OggDecodeError, match="zero channels"):
        parse_ogg(bytes(zero_ch))
    bad_ver = bytearray(blob)
    bad_ver[28 + 8] = 0x20  # OpusHead major version 2
    with pytest.raises(OggDecodeError, match="version"):
        parse_ogg(bytes(bad_ver))
    # vorbis: nonzero version / zero rate
    vblob = encode_ogg("vorbis", 44100, 1, [b"x"], granule_end=1)
    bad = bytearray(vblob)
    struct.pack_into("<I", bad, 28 + 7, 9)  # version field
    with pytest.raises(OggDecodeError, match="Vorbis version"):
        parse_ogg(bytes(bad))
    # first packet spilling past the BOS page (lacing 255 unterminated;
    # padding keeps the declared 255-byte body inside the buffer so the
    # page itself stays structurally valid)
    spill = blob[:27] + b"\xff" + blob[28:] + b"\x00" * 300
    with pytest.raises(OggDecodeError, match="complete"):
        parse_ogg(spill)


def test_ogg_budget_soft_path(monkeypatch):
    """Past MAX_OGG_PAGES the walk reports n_frames/duration None (the
    family's soft-budget convention) instead of burning the pass."""
    from wwwision_importservice_spark.operators import oggcodec

    blob = encode_ogg("opus", 48000, 1, [b"p"] * 6, granule_end=2880,
                      max_page_segments=1)
    monkeypatch.setattr(oggcodec, "MAX_OGG_PAGES", 3)
    meta = oggcodec.parse_ogg(blob)
    assert meta["n_frames"] is None and meta["duration_ms"] is None
    assert meta["codec"] == "opus"  # identity still reported
    monkeypatch.setattr(oggcodec, "MAX_OGG_PAGES", MAX_OGG_PAGES)
    assert oggcodec.parse_ogg(blob)["n_frames"] == 6


def test_ogg_encoder_input_contract():
    with pytest.raises(ValueError, match="codec"):
        encode_ogg("mp3", 48000, 1, [b"x"], granule_end=1)
    with pytest.raises(ValueError, match="channels"):
        encode_ogg("opus", 48000, 0, [b"x"], granule_end=1)
    with pytest.raises(ValueError, match=">= 0"):
        encode_ogg("opus", 48000, 1, [b"x"], granule_end=-1)
    with pytest.raises(ValueError, match="max_page_segments"):
        encode_ogg("opus", 48000, 1, [b"x"], granule_end=1,
                   max_page_segments=0)
    with pytest.raises(ValueError, match="pre_skip is an Opus field"):
        encode_ogg("vorbis", 44100, 1, [b"x"], granule_end=1, pre_skip=10)
    with pytest.raises(ValueError, match="at least one media packet"):
        encode_ogg("opus", 48000, 1, [], granule_end=1)


def test_ogg_sniffs_disjoint_from_sibling_codecs():
    from wwwision_importservice_spark.operators import (
        audiocodec,
        flaccodec,
        mp3codec,
        videocodec,
    )

    ogg = encode_ogg("opus", 48000, 2, [b"voice"], granule_end=960)
    assert sniff_ogg(ogg)
    assert not mp3codec.sniff_mp3(ogg) and not mp3codec.sniff_adts(ogg)
    assert not audiocodec.sniff_wav(ogg) and not flaccodec.sniff_flac(ogg)
    assert not videocodec.sniff_mp4(ogg) and not videocodec.sniff_webm(ogg)
    mp3 = mp3codec.encode_mp3(44100, 128, n_frames=2)
    assert not sniff_ogg(mp3)
    assert not sniff_ogg(mp3codec.encode_adts(48000, n_frames=2))


def test_ogg_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    OggDecodeError — no other exception, no hang. The page walk is
    tolerant by design (truncation ends the region), so 'ok' dominates;
    the identification headers supply the rejections."""
    from conftest import mutate_blob

    rng = random.Random(0x0660)
    bases = [
        encode_ogg("opus", 24000, 2, [bytes([i]) * (20 + i) for i in
                                      range(5)], granule_end=48000,
                   pre_skip=312, max_page_segments=3),
        encode_ogg("vorbis", 44100, 1, [b"frame" * 9] * 4,
                   granule_end=44100),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_ogg(blob):
                continue
            try:
                meta = parse_ogg(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except OggDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_media_row_routes_ogg():
    """media_metadata's per-blob policy routes Ogg bytes as
    kind='audio' with the page-walk fields; the content address is
    repagination-invariant; a recognized-but-corrupt identification
    header quarantines as kind='corrupt' in non-strict mode."""
    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        mp3codec as mp3c,
        oggcodec as oggc,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    pkts = [b"opus-frame-%d" % i for i in range(7)]
    blob = encode_ogg("opus", 16000, 1, pkts, granule_end=48000 * 2,
                      pre_skip=600)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha,
                     mp3c, oggc)
    assert row[1] == "audio" and row[2] == "ogg" and row[10] == "opus"
    assert (row[5], row[6], row[7]) == (7, 16000, 1)
    assert row[9] == (96000 - 600) * 1000 // 48000
    # the lazy-default arg path (driver-side unit callers) agrees
    assert _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha) == row
    # repaginated twin hashes identically (packet payloads, not pages)
    repag = encode_ogg("opus", 16000, 1, pkts, granule_end=48000 * 2,
                       pre_skip=600, max_page_segments=2)
    assert repag != blob
    row_r = _media_row(2, repag, img, wavc, flacc, vidc, False, hex_sha,
                       mp3c, oggc)
    assert row_r[12] == row[12] and row_r[11] == len(repag)
    # corrupt OpusHead (zero channels): quarantine, not a crash
    bad = bytearray(blob)
    bad[28 + 9] = 0
    row_c = _media_row(3, bytes(bad), img, wavc, flacc, vidc, False,
                       hex_sha, mp3c, oggc)
    assert row_c[1] == "corrupt" and row_c[2] == "ogg"
    with pytest.raises(OggDecodeError):
        _media_row(3, bytes(bad), img, wavc, flacc, vidc, True, hex_sha,
                   mp3c, oggc)


def test_ogg_flac_mapping():
    """Ogg-FLAC (the xiph mapping): the identification packet wraps a
    NATIVE fLaC signature + STREAMINFO, granules are PCM positions at
    the stream rate, and the declared header-packet count excludes
    the media packets from n_frames."""
    pkts = [b"flacframe-%d" % i for i in range(4)]
    blob = encode_ogg("flac", 96000, 2, pkts, granule_end=96000 * 3)
    assert sniff_ogg(blob)
    meta = parse_ogg(blob)
    assert meta["codec"] == "flac"
    assert meta["sample_rate"] == 96000 and meta["channels"] == 2
    assert meta["n_frames"] == 4 and meta["duration_ms"] == 3000
    assert media_payload(blob, meta) == b"".join(pkts)
    # malformed: zero rate in STREAMINFO
    bad = bytearray(blob)
    at = bad.index(b"fLaC") + 4 + 4  # STREAMINFO body start
    bad[at + 10] = bad[at + 11] = 0
    bad[at + 12] &= 0x0F
    with pytest.raises(OggDecodeError, match="zero rate"):
        parse_ogg(bytes(bad))
    # malformed: wrong mapping version
    ver = bytearray(blob)
    ver[28 + 5] = 9  # packet offset 5 inside the BOS page body
    with pytest.raises(OggDecodeError, match="mapping version"):
        parse_ogg(bytes(ver))
    # encoder contract
    with pytest.raises(ValueError, match="pre_skip"):
        encode_ogg("flac", 48000, 1, [b"x"], granule_end=1, pre_skip=5)
    with pytest.raises(ValueError, match="caps"):
        encode_ogg("flac", 48000, 9, [b"x"], granule_end=1)


def test_ogg_header_only_stream_counts_zero_not_none():
    """A structurally valid stream with ZERO completed media packets
    (headers only) reports n_frames == 0 — a real count. None is
    reserved for the MAX_OGG_PAGES budget-exhausted soft path (r13
    advisor catch: `media_packets or None` collapsed the two, making a
    header-only stream indistinguishable from a bomb)."""
    blob = encode_ogg("opus", 48000, 1, [b"pkt"], granule_end=960)
    # cut at the third page boundary: BOS + comment header survive,
    # the media page does not (the walk tolerates truncation)
    third = blob.index(b"OggS", blob.index(b"OggS", 4) + 4)
    headers_only = blob[:third]
    meta = parse_ogg(headers_only)
    assert meta["codec"] == "opus"
    assert meta["n_frames"] == 0 and meta["n_frames"] is not None
    assert media_payload(headers_only, meta) == b""
