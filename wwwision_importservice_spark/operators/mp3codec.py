"""Pure-stdlib MPEG-audio (MP3) and ADTS-AAC container METADATA
codecs: frame-header walks, no sample decode.

The r12 VERDICT's #1 ask: real crawls are full of MP3/AAC bytes and
``media_metadata`` routed them all to ``kind='unknown'``. Full MP3/AAC
*decode* stays out of scope by the family rule (no bit-exact
cross-decoder oracle — see ``flaccodec.py``), but the r12 video lane
proved the pattern that supersedes the old scope note: a pure HEADER
walk — MPEG audio frame headers + the Xing/Info VBR tag; ADTS frame
headers — yields ``sample_rate``/``channels``/``bitrate``/
``duration_ms``/``n_frames`` with EXACT integer arithmetic over
constructed streams, the same no-decode, byte-exact-oracle shape as the
ISO-BMFF box walk (``videocodec.py``).

MPEG audio framing (ISO/IEC 11172-3 §2.4.1 / 13818-3): a 4-byte header
per frame — 11-bit sync, version (1/2/2.5), layer (I/II/III), bitrate
and sample-rate table indexes, padding bit, channel mode — fully
determines the frame's byte length and sample count, so the stream
walks header-to-header without touching payload bytes. The Xing/Info
tag (the de-facto VBR header LAME standardized) rides the first frame's
side-info region and carries the media frame count.

ADTS framing (ISO/IEC 13818-7 §6.2 / 14496-3): a 7-byte header (9 with
CRC) per frame — 12-bit sync, MPEG-4/2 ID, AAC profile, sampling-
frequency index, channel configuration, 13-bit frame_length, and a
raw-data-block count — each block carrying 1024 samples.

Threat model, the family contract (``imagecodec.py``/``videocodec.py``):
header fields are UNTRUSTED. Malformed constructs raise
:class:`Mp3DecodeError` (an ``AudioDecodeError``, so ``_media_row``'s
quarantine catch-list needs no new type); the frame walks are
bomb-capped (:data:`MAX_AUDIO_FRAMES` — budget exhaustion is the SOFT
path, reporting ``n_frames=None``, the ``videocodec`` convention) and
every declared length is validated before use. Mutation-fuzz pinned in
``tests/test_mp3codec.py``.

Reference parallel: the reference pipeline has no media handling at all
(``Classes/`` is records-in/records-out); this module exists for the
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.audiocodec import AudioDecodeError


class Mp3DecodeError(AudioDecodeError):
    """Malformed/hostile MPEG-audio or ADTS input (typed, family
    contract)."""


#: Frame-walk bomb cap: the walk hops one 4-byte header per frame
#: (cost linear in the file's own bytes), and a stream with more media
#: frames than this reports ``n_frames=None`` (unknown) rather than
#: burning the pass — the soft-budget convention of
#: ``videocodec.MAX_BLOCK_WALK``.
MAX_AUDIO_FRAMES = 1 << 20

#: An ID3v2 tag longer than this is not a real tag prefix (the syncsafe
#: field can declare up to 256 MiB; tags in the wild are KBs).
MAX_ID3V2_BYTES = 64 << 20

# bitrate tables, kbps, indexed by the header's 4-bit bitrate index
# (ISO 11172-3 Table B.2 / 13818-3 Table B.1). Index 0 is "free
# format" (frame length not derivable from the header — rejected as
# invalid for a header-hop walk), index 15 is forbidden.
_BITRATE_KBPS = {
    ("1", 1): (None, 32, 64, 96, 128, 160, 192, 224,
               256, 288, 320, 352, 384, 416, 448, None),
    ("1", 2): (None, 32, 48, 56, 64, 80, 96, 112,
               128, 160, 192, 224, 256, 320, 384, None),
    ("1", 3): (None, 32, 40, 48, 56, 64, 80, 96,
               112, 128, 160, 192, 224, 256, 320, None),
    ("2", 1): (None, 32, 48, 56, 64, 80, 96, 112,
               128, 144, 160, 176, 192, 224, 256, None),
    ("2", 2): (None, 8, 16, 24, 32, 40, 48, 56,
               64, 80, 96, 112, 128, 144, 160, None),
}
_BITRATE_KBPS[("2", 3)] = _BITRATE_KBPS[("2", 2)]  # MPEG2 L2 ≡ L3 table

# sample-rate tables indexed by the 2-bit header field (index 3 reserved)
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _parse_frame_header(data: bytes, pos: int) -> dict | None:
    """The 4-byte MPEG audio frame header at ``pos``, or None when the
    bytes there are not a valid header (walk-termination convention:
    the caller decides whether that's an error — first frame — or the
    end of the stream region)."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3  # 0=2.5, 1=reserved, 2=2, 3=1
    layer_bits = (b1 >> 1) & 3  # 0=reserved, 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    layer = 4 - layer_bits
    br_i, sr_i, padding = b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1
    if sr_i == 3:
        return None
    kbps = _BITRATE_KBPS[("1" if version == "1" else "2", layer)][br_i]
    if kbps is None:
        return None  # free format (0) or forbidden (15)
    sample_rate = _SAMPLE_RATES[version][sr_i]
    channels = 1 if (b3 >> 6) & 3 == 3 else 2
    # samples per frame: Layer I 384, Layer II 1152, Layer III 1152
    # (MPEG1) / 576 (MPEG2/2.5) — 11172-3 §2.4.2.1 / 13818-3
    if layer == 1:
        spf = 384
        size = (12 * kbps * 1000 // sample_rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        size = spf // 8 * kbps * 1000 // sample_rate + padding
    return {
        "version": version, "layer": layer, "kbps": kbps,
        "sample_rate": sample_rate, "channels": channels,
        "spf": spf, "size": size,
    }


def _skip_id3v2(data: bytes) -> int:
    """Offset past a leading ID3v2 tag (none → 0). The tag size is
    syncsafe (4×7 bits, ID3v2 §3.1); a set high bit or a declared size
    past EOF is a malformed tag, raised loudly."""
    if data[:3] != b"ID3":
        return 0
    if len(data) < 10:
        raise Mp3DecodeError("truncated ID3v2 header")
    flags = data[5]
    size_bytes = data[6:10]
    if any(b & 0x80 for b in size_bytes):
        raise Mp3DecodeError("non-syncsafe ID3v2 size")
    size = 0
    for b in size_bytes:
        size = (size << 7) | b
    total = 10 + size + (10 if flags & 0x10 else 0)  # footer flag
    if total > MAX_ID3V2_BYTES:
        raise Mp3DecodeError(f"ID3v2 tag over {MAX_ID3V2_BYTES} bytes")
    if total > len(data):
        raise Mp3DecodeError("ID3v2 tag overruns the file")
    return total


def _xing_offset(version: str, channels: int) -> int:
    """Side-info width the Xing/Info tag sits after (MPEG1: 17 mono /
    32 stereo; MPEG2/2.5: 9 / 17 — the LAME convention)."""
    if version == "1":
        return 4 + (17 if channels == 1 else 32)
    return 4 + (9 if channels == 1 else 17)


def sniff_mp3(data: bytes) -> bool:
    """MPEG-audio magic: an optional ID3v2 tag, then a valid frame
    header whose DECLARED length lands exactly at EOF, at another valid
    header, or at an ID3v1 ``TAG`` trailer. The two-frame check matters:
    an 11-bit sync plus valid table indexes alone false-positives on
    random bytes; chained headers don't."""
    try:
        pos = _skip_id3v2(data)
    except Mp3DecodeError:
        return False
    h = _parse_frame_header(data, pos)
    if h is None or pos + h["size"] > len(data):
        return False
    nxt = pos + h["size"]
    return (nxt == len(data)
            or _parse_frame_header(data, nxt) is not None
            or data[nxt : nxt + 3] == b"TAG")


def parse_mp3(data: bytes) -> dict:
    """MPEG-audio bytes → metadata dict:

    ``{"format": "mp3", "version": "1"|"2"|"2.5", "layer": 1|2|3,
    "sample_rate": int, "channels": 1|2, "bitrate_kbps": int|None,
    "vbr": bool, "n_frames": int|None, "duration_ms": int|None,
    "frames_span": (start, end)}``

    The walk hops header-to-header from the first frame (past any
    ID3v2 tag) and stops at the first position that is not a valid
    continuation header with the SAME version/layer/sample-rate
    (trailing garbage, an ID3v1 tag, or a truncated final frame all end
    the stream region rather than erroring — crawl bytes are routinely
    cut off). ``frames_span`` is the region of counted frames, the
    content-address for "same audio, re-tagged" (ID3 tags excluded).

    A first-frame Xing/Info tag is the VBR header convention: the tag
    frame is NOT a media frame (excluded from ``n_frames``/duration),
    ``vbr`` reports tag=="Xing", and when the frame walk exhausts its
    budget the tag's own frame count is trusted instead. Fixed fields:
    ``bitrate_kbps`` is the common per-frame nominal when constant,
    None when frames vary (true VBR); ``duration_ms = n_frames ×
    samples_per_frame × 1000 // sample_rate`` — exact integer
    arithmetic, the oracle restates it.
    """
    start = _skip_id3v2(data)
    first = _parse_frame_header(data, start)
    if first is None:
        raise Mp3DecodeError("no MPEG audio frame sync")
    # Xing/Info VBR tag in the first frame's side-info region
    tag_at = start + _xing_offset(first["version"], first["channels"])
    tag = data[tag_at : tag_at + 4]
    has_tag = tag in (b"Xing", b"Info")
    xing_frames = None
    if has_tag and tag_at + 8 <= len(data):
        (flags,) = struct.unpack_from(">I", data, tag_at + 4)
        if flags & 1 and tag_at + 12 <= len(data):
            (xing_frames,) = struct.unpack_from(">I", data, tag_at + 8)
    pos, count, kbps_set, exhausted = start, 0, set(), False
    while True:
        h = _parse_frame_header(data, pos)
        if (h is None or h["version"] != first["version"]
                or h["layer"] != first["layer"]
                or h["sample_rate"] != first["sample_rate"]
                or pos + h["size"] > len(data)):
            break
        count += 1
        kbps_set.add(h["kbps"])
        pos += h["size"]
        if count > MAX_AUDIO_FRAMES:
            exhausted = True  # soft budget: unknown beats an error
            break
    media_frames: int | None = max(count - 1, 0) if has_tag else count
    if exhausted:
        media_frames = xing_frames  # the tag's count or unknown
    duration_ms = (media_frames * first["spf"] * 1000 // first["sample_rate"]
                   if media_frames else None)
    return {
        "format": "mp3",
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "bitrate_kbps": (next(iter(kbps_set))
                         if len(kbps_set) == 1 and tag != b"Xing" else None),
        "vbr": tag == b"Xing",
        "n_frames": media_frames or None,
        "duration_ms": duration_ms,
        "frames_span": (start, pos),
    }


def encode_mp3(
    sample_rate: int,
    kbps: int,
    n_frames: int,
    channels: int = 1,
    payload: bytes = b"",
    xing: str | None = None,
    version: str = "1",
    layer: int = 3,
    id3: bytes | None = None,
) -> bytes:
    """Minimal conformant CBR MPEG-audio stream for the fixture/oracle
    playbook: ``n_frames`` media frames, each the table-derived frame
    length — a 4-byte header + ``payload`` zero-padded/truncated to
    fit (the fixture passes exact-length md5 bytes so every byte is
    SQL-restatable). ``xing`` prepends a tag frame (``"Xing"`` = VBR
    marker, ``"Info"`` = CBR) carrying the media frame count;
    ``id3`` prepends a raw ID3v2 tag body (header synthesized).
    Trusted-but-validated inputs, the family's encoder contract."""
    if version not in _SAMPLE_RATES:
        raise ValueError(f"version must be '1'|'2'|'2.5', got {version!r}")
    if layer not in (1, 2, 3):
        raise ValueError(f"layer must be 1|2|3, got {layer}")
    if sample_rate not in _SAMPLE_RATES[version]:
        raise ValueError(f"sample_rate {sample_rate} not in the "
                         f"MPEG{version} table {_SAMPLE_RATES[version]}")
    table = _BITRATE_KBPS[("1" if version == "1" else "2", layer)]
    if kbps not in table:
        raise ValueError(f"bitrate {kbps} kbps not in the table")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1|2, got {channels}")
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    if xing not in (None, "Xing", "Info"):
        raise ValueError(f"xing must be None|'Xing'|'Info', got {xing!r}")
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    b1 = 0xE0 | (ver_bits << 3) | ((4 - layer) << 1) | 1  # protection=1
    b2 = (table.index(kbps) << 4) | (_SAMPLE_RATES[version].index(sample_rate) << 2)
    b3 = 0xC0 if channels == 1 else 0x00  # mono / stereo mode
    header = bytes([0xFF, b1, b2, b3])
    if layer == 1:
        size = (12 * kbps * 1000 // sample_rate) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        size = spf // 8 * kbps * 1000 // sample_rate
    if len(payload) > size - 4:
        raise ValueError(
            f"payload {len(payload)}B exceeds the frame body "
            f"({size - 4}B at {kbps} kbps / {sample_rate} Hz)"
        )
    body = (payload + b"\x00" * size)[: size - 4]
    frames = (header + body) * n_frames
    if xing is not None:
        side = _xing_offset(version, channels) - 4
        tag_body = (b"\x00" * side + xing.encode("ascii")
                    + struct.pack(">II", 1, n_frames))
        tag_frame = header + (tag_body + b"\x00" * size)[: size - 4]
        frames = tag_frame + frames
    if id3 is not None:
        if len(id3) >= 1 << 28:
            raise ValueError("id3 body too large for a syncsafe size")
        ss = bytes((len(id3) >> s) & 0x7F for s in (21, 14, 7, 0))
        frames = b"ID3\x04\x00\x00" + ss + id3 + frames
    return frames


# --------------------------------------------------------------------------
# ADTS (AAC) — the same header-walk posture.

# sampling_frequency_index table (ISO 14496-3 §1.6.3.4); 13/14
# reserved, 15 escape (explicit rate, not valid in ADTS)
_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)
_ADTS_PROFILES = ("aac-main", "aac-lc", "aac-ssr", "aac-ltp")


def _parse_adts_header(data: bytes, pos: int) -> dict | None:
    """The 7-byte (9 with CRC) ADTS frame header at ``pos``, or None
    when invalid — same walk-termination convention as
    :func:`_parse_frame_header`."""
    if pos + 7 > len(data):
        return None
    b = data[pos : pos + 7]
    if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:  # sync + layer 00
        return None
    sfi = (b[2] >> 2) & 0xF
    if sfi >= len(_ADTS_RATES):
        return None
    chanconf = ((b[2] & 1) << 2) | (b[3] >> 6)
    frame_length = ((b[3] & 3) << 11) | (b[4] << 3) | (b[5] >> 5)
    header_len = 7 if b[1] & 1 else 9  # protection_absent
    if frame_length < header_len:
        return None
    return {
        "profile": _ADTS_PROFILES[b[2] >> 6],
        "sample_rate": _ADTS_RATES[sfi],
        "channels": chanconf,
        "size": frame_length,
        "blocks": (b[6] & 3) + 1,  # raw_data_blocks + 1, 1024 samples each
    }


def sniff_adts(data: bytes) -> bool:
    """ADTS magic with the same chained-header guard as
    :func:`sniff_mp3` (a 12-bit sync alone false-positives; note the
    ADTS sync + ``layer 00`` is disjoint from MPEG-audio headers, whose
    layer bits are nonzero)."""
    h = _parse_adts_header(data, 0)
    if h is None or h["size"] > len(data):
        return False
    return (h["size"] == len(data)
            or _parse_adts_header(data, h["size"]) is not None)


def parse_adts(data: bytes) -> dict:
    """ADTS-AAC bytes → metadata dict:

    ``{"format": "aac", "profile": "aac-main"|"aac-lc"|"aac-ssr"|
    "aac-ltp", "sample_rate": int, "channels": int, "n_frames":
    int|None, "duration_ms": int|None, "frames_span": (start, end)}``

    ``n_frames`` counts raw data blocks (1024 samples each, ISO
    13818-7 §8.2) across the frame walk; ``duration_ms = n_frames ×
    1024 × 1000 // sample_rate`` — exact. The walk stops at the first
    non-continuation header (trailing garbage / truncation end the
    region, the crawl convention); budget exhaustion reports
    ``n_frames=None``, the soft path. ``channels`` is the channel
    configuration (0 = "in a PCE", reported as None — parsing program
    config elements would be payload decode, out of scope)."""
    first = _parse_adts_header(data, 0)
    if first is None:
        raise Mp3DecodeError("no ADTS frame sync")
    pos, blocks, exhausted = 0, 0, False
    while True:
        h = _parse_adts_header(data, pos)
        if (h is None or h["sample_rate"] != first["sample_rate"]
                or h["profile"] != first["profile"]
                or pos + h["size"] > len(data)):
            break
        blocks += h["blocks"]
        pos += h["size"]
        if blocks > MAX_AUDIO_FRAMES:
            exhausted = True
            break
    n_frames = None if exhausted else (blocks or None)
    return {
        "format": "aac",
        "profile": first["profile"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"] or None,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1024 * 1000 // first["sample_rate"]
                        if n_frames else None),
        "frames_span": (0, pos),
    }


def encode_adts(
    sample_rate: int,
    n_frames: int,
    channels: int = 1,
    payload: bytes = b"",
    profile: str = "aac-lc",
) -> bytes:
    """Minimal conformant ADTS stream: ``n_frames`` frames, each a
    7-byte header (protection_absent=1, one raw data block, buffer
    fullness all-ones — the VBR convention) + ``payload`` verbatim.
    Every byte is header arithmetic or caller bytes, so the oracle
    restates the whole stream as hex. Trusted-but-validated inputs."""
    if sample_rate not in _ADTS_RATES:
        raise ValueError(f"sample_rate {sample_rate} not in the ADTS table")
    if profile not in _ADTS_PROFILES:
        raise ValueError(f"profile must be one of {_ADTS_PROFILES}")
    if not 0 < channels < 8:
        raise ValueError(f"channels must be 1..7, got {channels}")
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    frame_length = 7 + len(payload)
    if frame_length >= 1 << 13:
        raise ValueError("payload too large for the 13-bit frame_length")
    sfi = _ADTS_RATES.index(sample_rate)
    hdr = bytes([
        0xFF,
        0xF1,  # MPEG-4 ID, layer 00, protection_absent=1
        (_ADTS_PROFILES.index(profile) << 6) | (sfi << 2) | (channels >> 2),
        ((channels & 3) << 6) | ((frame_length >> 11) & 3),
        (frame_length >> 3) & 0xFF,
        ((frame_length & 7) << 5) | 0x1F,  # fullness high 5 bits (all-ones)
        0xFC,  # fullness low 6 bits, raw_data_blocks = 0 (1 block)
    ])
    return (hdr + payload) * n_frames


__all__ = [
    "AudioDecodeError",
    "Mp3DecodeError",
    "MAX_AUDIO_FRAMES",
    "sniff_mp3",
    "parse_mp3",
    "encode_mp3",
    "sniff_adts",
    "parse_adts",
    "encode_adts",
]
