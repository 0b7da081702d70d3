"""Pure-stdlib FLV container METADATA codec: tag walk + minimal AMF0
``onMetaData`` read, no frame decode.

The r14 misrouting sweep's third lane (TIFF → AVI → FLV, the classes
VERDICT r13 named): FLV was the web's video container for a decade of
Flash-era crawls and ``media_metadata`` routed every FLV blob to
``kind='unknown'``. Frame decode stays out of scope by the family
rule; the container is exact no-decode arithmetic (the public Adobe
Video File Format Specification v10):

- Header: ``FLV`` + u8 version + a flags byte (bit0 video, bit2
  audio) + u32be data offset, then a zero ``PreviousTagSize``.
- Tags: u8 type (8 audio / 9 video / 18 script), u24be data size,
  u24be+u8 timestamp, u24be stream id, the body, then a u32be
  ``PreviousTagSize`` trailer (= 11 + size).
- Video tag byte 0: frame type high nibble, codec id low nibble
  (2 = Sorenson H.263, 4 = VP6, 7 = AVC).
- Audio tag byte 0: sound format high nibble (2 = MP3, 10 = AAC),
  2-bit rate index (5512/11025/22050/44100), 1-bit sample size,
  1-bit channel type (mono/stereo).
- Dims/duration: the ``onMetaData`` script tag — an AMF0 string +
  ECMA-array of named doubles (``width``, ``height``, ``duration``
  seconds). The AMF0 reader here handles exactly the types a real
  onMetaData carries (number, boolean, string, ECMA array, strict
  array, object, null) with a size budget, nothing more.

The content address is **demux-invariant**: video tag bodies
concatenated in file order, then audio tag bodies — so the same A/V
re-timestamped, re-interleaved, or re-described (script tag rewritten)
hashes identically, the ``avicodec`` per-stream convention.

Threat model, the family contract: header fields are UNTRUSTED —
malformed constructs raise :class:`FlvDecodeError` (a
``VideoDecodeError``); the tag walk is bomb-capped
(:data:`MAX_FLV_TAGS`) and the AMF reader depth/size-capped. Mutation-
fuzz pinned in ``tests/test_flvcodec.py``.

Reference parallel: none (``Classes/`` is records-in/records-out);
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.videocodec import VideoDecodeError


class FlvDecodeError(VideoDecodeError):
    """Malformed/hostile FLV input (typed, family contract)."""


#: tag-walk bomb cap (each tag consumes ≥15 bytes, so the walk is
#: linear; the cap bounds zero-size pathologies)
MAX_FLV_TAGS = 1 << 18

#: AMF0 nesting cap — real onMetaData is depth ≤ 2
MAX_AMF_DEPTH = 8

_AUDIO_RATES = (5512, 11025, 22050, 44100)
_VIDEO_CODECS = {2: "h263", 3: "screen", 4: "vp6", 5: "vp6a", 7: "avc"}
_AUDIO_FORMATS = {0: "pcm", 2: "mp3", 3: "pcm-le", 10: "aac", 11: "speex"}


def sniff_flv(data: bytes) -> bool:
    """FLV magic: ``FLV`` + version 1 + a sane data offset."""
    return (
        len(data) >= 13
        and data[:3] == b"FLV"
        and data[3] == 1
        and struct.unpack_from(">I", data, 5)[0] >= 9
    )


def _amf0(data: bytes, pos: int, end: int, depth: int = 0):
    """Read one AMF0 value; returns ``(value, new_pos)``. Only the
    types a real ``onMetaData`` carries; anything else is malformed
    for our purposes (typed error, quarantine row)."""
    if depth > MAX_AMF_DEPTH:
        raise FlvDecodeError("AMF0 nesting beyond the metadata budget")
    if pos >= end:
        raise FlvDecodeError("AMF0 value truncated")
    marker = data[pos]
    pos += 1
    if marker == 0x00:  # number (f64be)
        if pos + 8 > end:
            raise FlvDecodeError("AMF0 number truncated")
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if marker == 0x01:  # boolean
        if pos + 1 > end:
            raise FlvDecodeError("AMF0 boolean truncated")
        return bool(data[pos]), pos + 1
    if marker == 0x02:  # string
        if pos + 2 > end:
            raise FlvDecodeError("AMF0 string header truncated")
        (ln,) = struct.unpack_from(">H", data, pos)
        pos += 2
        if pos + ln > end:
            raise FlvDecodeError("AMF0 string body truncated")
        return data[pos : pos + ln].decode("utf-8", "replace"), pos + ln
    if marker == 0x05:  # null
        return None, pos
    if marker in (0x03, 0x08):  # object / ECMA array (skippable count)
        if marker == 0x08:
            if pos + 4 > end:
                raise FlvDecodeError("AMF0 ECMA array count truncated")
            pos += 4  # the count is advisory; the end marker is the law
        out: dict = {}
        while True:
            if pos + 2 > end:
                raise FlvDecodeError("AMF0 property name truncated")
            (ln,) = struct.unpack_from(">H", data, pos)
            pos += 2
            if ln == 0:
                if pos >= end or data[pos] != 0x09:
                    raise FlvDecodeError("AMF0 object missing end marker")
                return out, pos + 1
            if pos + ln > end:
                raise FlvDecodeError("AMF0 property name truncated")
            key = data[pos : pos + ln].decode("utf-8", "replace")
            pos += ln
            val, pos = _amf0(data, pos, end, depth + 1)
            out[key] = val
    if marker == 0x0A:  # strict array
        if pos + 4 > end:
            raise FlvDecodeError("AMF0 strict array count truncated")
        (n,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if n > (end - pos):  # each element is ≥1 byte
            raise FlvDecodeError("AMF0 strict array count past the buffer")
        vals = []
        for _ in range(n):
            v, pos = _amf0(data, pos, end, depth + 1)
            vals.append(v)
        return vals, pos
    raise FlvDecodeError(f"AMF0 marker 0x{marker:02x} outside the "
                         "onMetaData surface")


def parse_flv(data: bytes) -> dict:
    """FLV bytes → metadata dict (the ``parse_avi`` convention):

    ``{"format": "flv", "has_video": bool, "width": int|None,
    "height": int|None, "n_frames": int|None, "duration_ms":
    int|None, "codec": str|None, "sample_rate": int|None,
    "channels": int|None, "payload_regions": [(start, end), ...]}``

    ``n_frames`` counts video tags; ``codec`` is the first video
    tag's codec id; ``sample_rate``/``channels`` come from the first
    audio tag's header byte; ``width``/``height``/``duration_ms``
    come from ``onMetaData`` (doubles — integer-valued in practice;
    duration seconds → ms via round) and are None when the script tag
    or the key is absent (honest over guessed). ``payload_regions``
    are the video then audio tag bodies — the demux-invariant address
    :func:`media_payload` concatenates."""
    if not sniff_flv(data):
        raise FlvDecodeError("no FLV magic")
    flags = data[4]
    (offset,) = struct.unpack_from(">I", data, 5)
    if offset + 4 > len(data):
        raise FlvDecodeError("FLV data offset past the buffer")
    out: dict = {
        "format": "flv", "has_video": bool(flags & 0x01),
        "width": None, "height": None, "n_frames": 0,
        "duration_ms": None, "codec": None, "sample_rate": None,
        "channels": None, "payload_regions": [],
    }
    video_regions: list[tuple[int, int]] = []
    audio_regions: list[tuple[int, int]] = []
    pos = offset + 4  # skip PreviousTagSize0
    tags = 0
    while pos + 11 <= len(data):
        tags += 1
        if tags > MAX_FLV_TAGS:
            raise FlvDecodeError(f"more than {MAX_FLV_TAGS} FLV tags")
        ttype = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = pos + 11
        if body + size + 4 > len(data):
            break  # truncated tail ends the walk (crawl posture)
        if ttype == 9:
            out["n_frames"] += 1
            video_regions.append((body, body + size))
            if out["codec"] is None and size >= 1:
                cid = data[body] & 0x0F
                out["codec"] = _VIDEO_CODECS.get(cid, f"video-{cid}")
        elif ttype == 8:
            audio_regions.append((body, body + size))
            if out["sample_rate"] is None and size >= 1:
                hdr = data[body]
                out["sample_rate"] = _AUDIO_RATES[(hdr >> 2) & 0x03]
                out["channels"] = (hdr & 0x01) + 1
        elif ttype == 18:
            name, p2 = _amf0(data, body, body + size)
            if name == "onMetaData":
                meta, _ = _amf0(data, p2, body + size)
                if isinstance(meta, dict):
                    w, h = meta.get("width"), meta.get("height")
                    if isinstance(w, float) and w > 0:
                        out["width"] = int(w)
                    if isinstance(h, float) and h > 0:
                        out["height"] = int(h)
                    dur = meta.get("duration")
                    if isinstance(dur, float) and dur >= 0:
                        out["duration_ms"] = int(round(dur * 1000))
        # other tag types: skip (spec reserves them)
        pos = body + size + 4  # skip the PreviousTagSize trailer
    if not video_regions and not audio_regions:
        raise FlvDecodeError("no audio/video tags in FLV body")
    if video_regions and not out["has_video"]:
        # tolerate a wrong header flag, the tags are the truth
        out["has_video"] = True
    out["payload_regions"] = video_regions + audio_regions
    if not video_regions:
        out["n_frames"] = None if out["has_video"] else 0
    return out


def media_payload(data: bytes, meta: dict) -> bytes:
    """Concatenated tag bodies, video stream then audio stream — the
    demux-invariant content address (re-timestamped, re-interleaved,
    or re-described twins hash identically)."""
    return b"".join(data[s:e] for s, e in meta["payload_regions"])


def _amf_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _amf_num(x: float) -> bytes:
    return b"\x00" + struct.pack(">d", x)


def encode_flv(
    width: int,
    height: int,
    duration_ms: int,
    video_frames: list[bytes],
    codec: str = "avc",
    audio_chunks: list[bytes] | None = None,
    sample_rate: int = 44100,
    channels: int = 2,
    interleave: int = 0,
    with_metadata: bool = True,
    extra_meta: bool = False,
) -> bytes:
    """Minimal conformant FLV for the fixture/oracle playbook: real
    header/tag/AMF0 arithmetic with the caller's frame bytes carried
    verbatim in tag bodies after the 1-byte codec header the spec
    mandates (the parser never decodes frames). ``interleave`` > 0
    interleaves one audio tag after every that-many video tags (else
    audio trails); ``extra_meta`` pads ``onMetaData`` with extra keys
    — both provably outside the demux-invariant address. Trusted-but-
    validated inputs."""
    codec_ids = {v: k for k, v in _VIDEO_CODECS.items()}
    if codec not in codec_ids:
        raise ValueError(f"codec must be one of {sorted(codec_ids)}")
    if width < 1 or height < 1 or duration_ms < 0:
        raise ValueError("dims must be >= 1 and duration_ms >= 0")
    if not video_frames:
        raise ValueError("at least one video frame is required")
    if sample_rate not in _AUDIO_RATES:
        raise ValueError(f"sample_rate must be one of {_AUDIO_RATES}")
    if channels not in (1, 2):
        raise ValueError("channels must be 1 (mono) or 2 (stereo)")

    def tag(ttype: int, ts_ms: int, body: bytes) -> bytes:
        head = bytes([ttype]) + len(body).to_bytes(3, "big") \
            + (ts_ms & 0xFFFFFF).to_bytes(3, "big") \
            + bytes([(ts_ms >> 24) & 0xFF]) + b"\x00\x00\x00"
        return head + body + struct.pack(">I", 11 + len(body))

    frame_ms = duration_ms // max(len(video_frames), 1)
    vtags = [
        # byte 0: keyframe (1) for frame 0 else inter (2), + codec id
        tag(9, i * frame_ms,
            bytes([((1 if i == 0 else 2) << 4) | codec_ids[codec]]) + fb)
        for i, fb in enumerate(video_frames)
    ]
    atags = []
    if audio_chunks:
        fmt = 10 if sample_rate == 44100 else 2  # aac at 44.1k else mp3
        hdr = (fmt << 4) | (_AUDIO_RATES.index(sample_rate) << 2) \
            | 0x02 | (channels - 1)
        atags = [
            tag(8, i * frame_ms, bytes([hdr]) + ab)
            for i, ab in enumerate(audio_chunks)
        ]
    body = b""
    if with_metadata:
        meta = _amf_str("width") + _amf_num(float(width)) \
            + _amf_str("height") + _amf_num(float(height)) \
            + _amf_str("duration") + _amf_num(duration_ms / 1000.0)
        if extra_meta:
            meta += _amf_str("encoder") + b"\x02" + _amf_str("fixture") \
                + _amf_str("canSeekToEnd") + b"\x01\x01"
        script = b"\x02" + _amf_str("onMetaData") \
            + b"\x08" + struct.pack(">I", 3) + meta \
            + struct.pack(">H", 0) + b"\x09"
        body += tag(18, 0, script)
    if interleave > 0 and atags:
        ai = 0
        for i, vt in enumerate(vtags):
            body += vt
            if (i + 1) % interleave == 0 and ai < len(atags):
                body += atags[ai]
                ai += 1
        for rest in atags[ai:]:
            body += rest
    else:
        body += b"".join(vtags) + b"".join(atags)
    flags = 0x01 | (0x04 if atags else 0)
    return (b"FLV\x01" + bytes([flags]) + struct.pack(">I", 9)
            + b"\x00\x00\x00\x00" + body)


__all__ = [
    "MAX_AMF_DEPTH",
    "MAX_FLV_TAGS",
    "FlvDecodeError",
    "encode_flv",
    "media_payload",
    "parse_flv",
    "sniff_flv",
]
