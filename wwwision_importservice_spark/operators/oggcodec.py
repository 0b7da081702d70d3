"""Pure-stdlib Ogg container METADATA codec: page walk, no sample
decode.

The r13 lane the MP3/ADTS round opened (the r12 VERDICT's "next lane a
user hits" pattern): real crawls carry Ogg bytes — Opus is the web's
voice/WebRTC codec, Vorbis the legacy web-audio one — and
``media_metadata`` routed them all to ``kind='unknown'``. Full
Opus/Vorbis *decode* stays out of scope by the family rule (no
bit-exact cross-decoder oracle — see ``flaccodec.py``), but the
container layer is EXACT: Ogg framing (RFC 3533) is a page walk —
capture pattern, 27-byte header, lacing table — and the two codecs'
identification headers (OpusHead, RFC 7845 §5.1; Vorbis identification,
Vorbis I §4.2.2) carry ``sample_rate``/``channels`` as plain
little-endian fields. Duration is granule arithmetic: Opus granules run
at 48 kHz minus the declared pre-skip (RFC 7845 §4.4); Vorbis granules
are PCM sample positions at the stream rate. All integer — the oracle
restates it.

Packet counting costs only the lacing tables (a lacing value < 255
terminates a packet; 255 continues it, across pages via the continued
flag — RFC 3533 §5): ``n_frames`` reports completed MEDIA packets
(past the codec's header packets: 2 for Opus — OpusHead/OpusTags — 3
for Vorbis). The content address is the CONCATENATED media-packet
payload bytes, NOT the raw page region: the same audio re-paginated
(different page sizes, re-muxed) hashes identically, and the oracle
restates payload hex directly with no CRC arithmetic.

Threat model, the family contract (``imagecodec.py``/``videocodec.py``/
``mp3codec.py``): header fields are UNTRUSTED. Malformed constructs
raise :class:`OggDecodeError` (an ``AudioDecodeError``, so
``_media_row``'s quarantine catch-list needs no new type); the page
walk is bomb-capped (:data:`MAX_OGG_PAGES` — budget exhaustion is the
SOFT path: ``n_frames``/``duration_ms`` report None, the
``videocodec``/``mp3codec`` convention) and every declared length is
validated before use. The parser does NOT verify page CRCs (framing
never depends on them and the walk stays header+lacing-only); the
ENCODER writes real RFC 3533 CRC-32 checksums (poly 0x04c11db7,
unreflected, zero init/xorout) so fixtures demux in any real player.
Mutation-fuzz pinned in ``tests/test_oggcodec.py``.

Reference parallel: none (``Classes/`` is records-in/records-out);
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.audiocodec import AudioDecodeError


class OggDecodeError(AudioDecodeError):
    """Malformed/hostile Ogg input (typed, family contract)."""


#: Page-walk bomb cap (soft budget: past it, counts report None rather
#: than burning the pass — the ``mp3codec.MAX_AUDIO_FRAMES`` convention).
MAX_OGG_PAGES = 1 << 20

#: granule sentinel: no packet completes on the page (RFC 3533 §6)
_NO_GRANULE = (1 << 64) - 1

# RFC 3533 CRC-32: poly 0x04c11db7, not reflected, init 0, xorout 0 —
# NOT the zlib CRC. Table built once at import.
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ byte) & 0xFF]
    return crc


def _parse_page_header(data: bytes, pos: int) -> dict | None:
    """The Ogg page at ``pos`` (header + lacing table bounds validated),
    or None when the bytes there are not a valid page — the caller's
    walk-termination convention (first page → error, later → stream
    end, the crawl posture)."""
    if pos + 27 > len(data):
        return None
    if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
        return None
    flags = data[pos + 5]
    granule, serial, seq = struct.unpack_from("<QII", data, pos + 6)
    n_segs = data[pos + 26]
    table_end = pos + 27 + n_segs
    if table_end > len(data):
        return None
    lacing = data[pos + 27 : table_end]
    body_len = sum(lacing)
    if table_end + body_len > len(data):
        return None
    return {
        "flags": flags,
        "granule": None if granule == _NO_GRANULE else granule,
        "serial": serial,
        "seq": seq,
        "lacing": lacing,
        "body_start": table_end,
        "end": table_end + body_len,
    }


def sniff_ogg(data: bytes) -> bool:
    """Ogg magic: a structurally valid first page carrying the BOS
    (beginning-of-stream) flag. The full header+lacing bounds check
    (not just the 4-byte capture pattern) keeps the false-positive
    surface in line with the chained-header MP3/ADTS sniffs."""
    page = _parse_page_header(data, 0)
    return page is not None and bool(page["flags"] & 0x02)


def _ident_from_first_packet(pkt: bytes) -> dict:
    """Codec identity from a logical stream's first packet. Unknown
    first-packet magic reports ``codec=None`` (an Ogg stream of a codec
    we don't know is still a valid Ogg stream — the container fields
    stay real); a RECOGNIZED magic with a malformed identification
    header raises (hostile/corrupt, the family posture)."""
    if pkt[:8] == b"OpusHead":
        # RFC 7845 §5.1: version(1) channels(1) pre_skip(2LE)
        # input_sample_rate(4LE) output_gain(2LE) mapping_family(1)
        if len(pkt) < 19:
            raise OggDecodeError("truncated OpusHead")
        if pkt[8] >> 4 != 0:  # major version must be 0 (§5.1)
            raise OggDecodeError(f"unsupported OpusHead version {pkt[8]}")
        channels = pkt[9]
        if channels == 0:
            raise OggDecodeError("OpusHead declares zero channels")
        pre_skip, rate = struct.unpack_from("<HI", pkt, 10)
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": rate or None,  # informational; 0 = unknown
            "pre_skip": pre_skip,
            "n_header_packets": 2,  # OpusHead + OpusTags (§5)
            "granule_rate": 48000,  # granules ALWAYS at 48 kHz (§4)
        }
    if pkt[:5] == b"\x7fFLAC":
        # Ogg-FLAC mapping (xiph.org/flac/ogg_mapping): 0x7F 'FLAC',
        # major/minor mapping version, a 2-byte BE count of header
        # packets AFTER this one (0 = unknown), then the NATIVE fLaC
        # signature + STREAMINFO block verbatim
        if len(pkt) < 51:  # 9 + 'fLaC' + 4-byte block header + 34 body
            raise OggDecodeError("truncated Ogg-FLAC identification packet")
        if pkt[5] != 1:
            raise OggDecodeError(
                f"unsupported Ogg-FLAC mapping version {pkt[5]}"
            )
        (hdr_count,) = struct.unpack_from(">H", pkt, 7)
        if pkt[9:13] != b"fLaC":
            raise OggDecodeError("Ogg-FLAC packet missing fLaC signature")
        body = pkt[17:51]  # STREAMINFO body (RFC 9639 §8.2 layout)
        rate = body[10] << 12 | body[11] << 4 | body[12] >> 4
        channels = ((body[12] >> 1) & 7) + 1
        if rate == 0:
            raise OggDecodeError("Ogg-FLAC STREAMINFO declares zero rate")
        return {
            "codec": "flac",
            "channels": channels,
            "sample_rate": rate,
            "pre_skip": 0,
            # +1 for this packet; a 0 (unknown) count assumes only the
            # MANDATORY VorbisComment follows — the spec minimum; real
            # encoders write the true count
            "n_header_packets": 1 + (hdr_count or 1),
            "granule_rate": rate,  # granules are PCM positions
        }
    if pkt[:7] == b"\x01vorbis":
        # Vorbis I §4.2.2: version(4LE) channels(1) rate(4LE)
        # bitrate max/nominal/min(3×4LE) blocksizes(1) framing(1)
        if len(pkt) < 30:
            raise OggDecodeError("truncated Vorbis identification header")
        version, channels, rate = struct.unpack_from("<IBI", pkt, 7)
        if version != 0:
            raise OggDecodeError(f"unsupported Vorbis version {version}")
        if channels == 0 or rate == 0:
            raise OggDecodeError("Vorbis header declares zero channels/rate")
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "pre_skip": 0,
            "n_header_packets": 3,  # ident + comment + setup (§4.2)
            "granule_rate": rate,
        }
    return {"codec": None, "channels": None, "sample_rate": None,
            "pre_skip": 0, "n_header_packets": 0, "granule_rate": None}


def parse_ogg(data: bytes) -> dict:
    """Ogg bytes → metadata dict:

    ``{"format": "ogg", "codec": "opus"|"vorbis"|"flac"|None,
    "sample_rate": int|None, "channels": int|None, "pre_skip": int,
    "n_frames": int|None, "duration_ms": int|None, "payload_regions":
    [(start, end), ...]}``

    The walk follows the FIRST logical stream (the first page's BOS
    serial; grouped-multiplex secondary streams' pages are skipped but
    still consume the page budget) and stops at the first byte run
    that is not a valid page — trailing garbage and truncation end the
    stream region rather than erroring, the crawl convention shared
    with ``parse_mp3``. ``n_frames`` counts completed MEDIA packets
    (lacing-terminated, past the codec's header packets — continuation
    across pages via the 0x01 flag merges correctly because only a
    terminating lacing value < 255 counts). ``duration_ms`` derives
    from the last non-sentinel granule on the stream: Opus
    ``(granule - pre_skip) × 1000 // 48000`` (floored at 0), Vorbis
    ``granule × 1000 // sample_rate`` — exact integer arithmetic.
    ``payload_regions`` are the byte ranges of media-packet payloads
    (header packets excluded) for :func:`media_payload`'s
    container-independent content address. Budget exhaustion reports
    ``n_frames``/``duration_ms`` as None (soft path)."""
    first = _parse_page_header(data, 0)
    if first is None:
        raise OggDecodeError("no Ogg capture pattern")
    if not first["flags"] & 0x02:
        raise OggDecodeError("first Ogg page is not a stream start (no BOS)")
    serial = first["serial"]
    # first packet of the stream = the BOS page's first lacing run
    # (RFC 7845 §3 / Vorbis I §4.2.1 both REQUIRE the id header to be
    # alone on the first page, but the walk only needs its first run)
    pkt_len, seen_end = 0, False
    for lace in first["lacing"]:
        pkt_len += lace
        if lace < 255:
            seen_end = True
            break
    if not seen_end:
        raise OggDecodeError("first packet does not complete on BOS page")
    ident = _ident_from_first_packet(
        data[first["body_start"] : first["body_start"] + pkt_len]
    )
    pos, pages, exhausted = 0, 0, False
    completed = 0  # packets fully terminated so far (headers included)
    last_granule: int | None = None
    regions: list[tuple[int, int]] = []
    n_hdr = ident["n_header_packets"]
    while True:
        page = _parse_page_header(data, pos)
        if page is None:
            break
        pages += 1
        if pages > MAX_OGG_PAGES:
            exhausted = True
            break
        if page["serial"] == serial:
            seg_pos = page["body_start"]
            for lace in page["lacing"]:
                if completed >= n_hdr and lace:
                    regions.append((seg_pos, seg_pos + lace))
                seg_pos += lace
                if lace < 255:
                    completed += 1
            if page["granule"] is not None:
                last_granule = page["granule"]
        pos = page["end"]
        if page["serial"] == serial and page["flags"] & 0x04:
            break  # EOS for our stream: done regardless of trailing bytes
    media_packets: int | None = max(completed - n_hdr, 0)
    duration_ms: int | None = None
    if exhausted:
        media_packets = None
    elif last_granule is not None and ident["granule_rate"]:
        duration_ms = (
            max(last_granule - ident["pre_skip"], 0) * 1000
            // ident["granule_rate"]
        )
    return {
        "format": "ogg",
        "codec": ident["codec"],
        "sample_rate": ident["sample_rate"],
        "channels": ident["channels"],
        "pre_skip": ident["pre_skip"],
        # 0 is a real count (header-only stream); None is reserved for
        # the MAX_OGG_PAGES budget-exhausted soft path (r13 advisor
        # catch: `or None` collapsed the two)
        "n_frames": media_packets,
        "duration_ms": duration_ms,
        "payload_regions": regions,
    }


def media_payload(data: bytes, meta: dict) -> bytes:
    """The concatenated media-packet payload bytes — the
    container-independent content address (same audio re-paginated or
    re-tagged hashes identically; the ``videocodec.media_payload``
    convention)."""
    return b"".join(data[s:e] for s, e in meta["payload_regions"])


def _lacing(length: int) -> bytes:
    """RFC 3533 §5 lacing for one complete packet: ⌊len/255⌋ bytes of
    255 + one terminator byte len%255 (a 255-multiple needs the 0)."""
    return b"\xff" * (length // 255) + bytes([length % 255])


def encode_ogg(
    codec: str,
    sample_rate: int,
    channels: int,
    packets: list[bytes],
    granule_end: int,
    pre_skip: int = 0,
    max_page_segments: int = 255,
    serial: int = 0x0D15EA5E,
) -> bytes:
    """Minimal conformant Ogg stream for the fixture/oracle playbook:
    the codec's identification header alone on the BOS page (as RFC
    7845 §3 / Vorbis I §4.2.1 mandate), the comment header (+ empty
    Vorbis setup packet) on page 1, then ``packets`` as media packets
    paginated ``max_page_segments`` lacing values per page — values
    below a packet's lacing length split MID-PACKET, exercising the
    continued-packet flag. Intermediate media pages carry a
    proportional granule (uniform-duration assumption — only the final
    page's ``granule_end`` is a timing contract) or the RFC 3533 §6
    sentinel when no packet completes on the page; the final page
    carries ``granule_end`` and EOS. Real RFC 3533 CRCs throughout.
    Trusted-but-validated inputs, the family's encoder contract."""
    if codec not in ("opus", "vorbis", "flac"):
        raise ValueError(
            f"codec must be 'opus'|'vorbis'|'flac', got {codec!r}"
        )
    if not 0 < channels < 256:
        raise ValueError(f"channels must be 1..255, got {channels}")
    if sample_rate <= 0 or granule_end < 0 or pre_skip < 0:
        raise ValueError("sample_rate/granule_end/pre_skip must be >= 0")
    if not 0 < max_page_segments <= 255:
        raise ValueError("max_page_segments must be 1..255")
    if codec == "opus":
        head = (b"OpusHead" + bytes([1, channels])
                + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0))
        headers = [head, b"OpusTags" + struct.pack("<II", 0, 0)]
    elif codec == "flac":
        if pre_skip:
            raise ValueError("pre_skip is an Opus field (RFC 7845)")
        if channels > 8 or sample_rate >= 1 << 20:
            raise ValueError("FLAC caps: channels<=8, rate<2^20")
        # STREAMINFO body: min/max block, min/max frame, then the
        # packed rate(20)/channels-1(3)/bps-1(5)/total(36) bits + md5
        si = (struct.pack(">HH", 16, 16) + b"\x00" * 6
              + bytes([
                  sample_rate >> 12, (sample_rate >> 4) & 0xFF,
                  ((sample_rate & 0xF) << 4) | ((channels - 1) << 1)
                  | ((16 - 1) >> 4),
                  ((16 - 1) & 0xF) << 4,
              ]) + b"\x00" * 20)
        head = (b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 1)
                + b"fLaC" + bytes([0]) + len(si).to_bytes(3, "big") + si)
        # the mandatory VorbisComment, as a native metadata block
        vc = struct.pack("<II", 0, 0)
        headers = [head, bytes([0x84]) + len(vc).to_bytes(3, "big") + vc]
    else:
        if pre_skip:
            raise ValueError("pre_skip is an Opus field (RFC 7845)")
        head = (b"\x01vorbis" + struct.pack("<IBI", 0, channels, sample_rate)
                + struct.pack("<iii", 0, 0, 0) + bytes([0xB8, 0x01]))
        headers = [
            head,
            b"\x03vorbis" + struct.pack("<II", 0, 0) + b"\x01",
            b"\x05vorbis",  # setup stand-in: first-byte type 5 packet
        ]

    pages: list[bytes] = []
    seq = 0

    def emit(lacing: bytes, body: bytes, flags: int, granule: int) -> None:
        nonlocal seq
        hdr = (b"OggS\x00" + bytes([flags])
               + struct.pack("<QII", granule & ((1 << 64) - 1), serial, seq)
               + b"\x00\x00\x00\x00" + bytes([len(lacing)]) + lacing)
        crc = _ogg_crc(hdr + body)
        pages.append(hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body)
        seq += 1

    emit(_lacing(len(headers[0])), headers[0], 0x02, 0)  # BOS: id header
    lace2 = b"".join(_lacing(len(p)) for p in headers[1:])
    if len(lace2) > 255:
        raise ValueError("comment/setup headers too large for one page")
    emit(lace2, b"".join(headers[1:]), 0, 0)

    # media packets: stream of (lacing byte, payload slice) pairs packed
    # max_page_segments per page; a page boundary between a packet's
    # lacing bytes sets the next page's continued flag (RFC 3533 §5)
    laces: list[tuple[int, bytes]] = []
    for pkt in packets:
        full, last = divmod(len(pkt), 255)
        off = 0
        for _ in range(full):
            laces.append((255, pkt[off : off + 255]))
            off += 255
        laces.append((last, pkt[off:]))
    if not laces:
        raise ValueError("at least one media packet is required")
    continued = False
    done_packets = 0
    while laces:
        chunk, laces = laces[:max_page_segments], laces[max_page_segments:]
        is_last = not laces
        ends_mid_packet = chunk[-1][0] == 255
        if is_last and ends_mid_packet:
            raise ValueError("stream may not end mid-packet (lacing 255)")
        flags = (0x01 if continued else 0) | (0x04 if is_last else 0)
        page_completes = sum(1 for v, _ in chunk if v < 255)
        done_packets += page_completes
        if is_last:
            granule = granule_end
        elif page_completes == 0:
            granule = _NO_GRANULE  # no packet completes here (§6)
        else:
            # proportional placeholder: monotone, ≤ granule_end
            granule = granule_end * done_packets // len(packets)
        emit(bytes(v for v, _ in chunk), b"".join(b for _, b in chunk),
             flags, granule)
        continued = ends_mid_packet
    return b"".join(pages)


__all__ = [
    "AudioDecodeError",
    "OggDecodeError",
    "MAX_OGG_PAGES",
    "sniff_ogg",
    "parse_ogg",
    "media_payload",
    "encode_ogg",
]
