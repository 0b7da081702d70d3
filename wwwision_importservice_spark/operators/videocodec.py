"""Pure-stdlib ISO-BMFF (MP4/MOV) container METADATA codec.

The video lane of the multimodal family (r12, VERDICT r11 ask #2): real
crawls are full of MP4/WebM blobs, and ``media_metadata`` previously
routed every one to ``kind='unknown'``. Full video *decode* is out of
scope by the same rule as MP3/AAC (no exact cross-decoder oracle — see
``flaccodec.py``), but container metadata is a deterministic BOX WALK:
``ftyp``/``moov``/``trak``/``mdhd``/``stsd`` arithmetic over untrusted
bytes, which gets byte-exact oracles over constructed files exactly like
the WAV/BMP lanes.

Box grammar (ISO/IEC 14496-12 §4.2): a box is ``size(u32 BE) +
fourcc(4)`` followed by the body; ``size == 1`` promotes to a u64
``largesize`` after the fourcc; ``size == 0`` means "to the end of the
enclosing container". FullBoxes prepend ``version(u8) + flags(u24)``.
Parsed surface:

- ``ftyp``  → major brand (sniff + ``format``)
- ``mvhd``  → movie timescale + duration → ``duration_ms`` (v0 and v1)
- ``trak/tkhd`` → presentation width/height (16.16 fixed point; first
  video track wins)
- ``trak/mdia/hdlr`` → handler type (``vide``/``soun``) routing which
  track is the video one
- ``trak/mdia/minf/stbl/stsd`` → first sample-entry fourcc = ``codec``
- ``mdat`` spans → the media payload the metadata lane content-addresses
  (the container bytes themselves are not a stable address: two muxes of
  one payload differ)

Threat model, same contract as every codec in the family
(``imagecodec.py``/``flaccodec.py``): header fields are UNTRUSTED.
Every malformed construct raises :class:`VideoDecodeError` (a
ValueError); the walk is bomb-capped — recursion depth and total box
count are bounded, every declared size is validated against the
enclosing bounds before use — so a crafted file wastes only its own
bytes. Mutation-fuzz pinned in ``tests/test_videocodec.py``.

Reference parallel: the reference pipeline has no media handling at all
(``Classes/`` is records-in/records-out); this module exists for the
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.audiocodec import AudioDecodeError


class VideoDecodeError(ValueError):
    """Malformed/hostile ISO-BMFF input (typed, like Image/Audio)."""


#: Walk bomb caps: a box tree deeper than this is not a real mux (files
#: in the wild nest ~5: moov/trak/mdia/minf/stbl/stsd), and more boxes
#: than this in a METADATA walk means a crafted size chain.
MAX_BOX_DEPTH = 10
MAX_BOXES = 4096

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def sniff_mp4(data: bytes) -> bool:
    """ISO-BMFF magic: the first box is ``ftyp`` (every MP4/MOV/M4A
    mux writes it first per ISO 14496-12 §4.3)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk(data: bytes, start: int, end: int, depth: int, counter: list[int]):
    """Yield ``(fourcc, body_start, body_end)`` for each box in
    ``data[start:end]``, validating every declared size against the
    enclosing bounds BEFORE trusting it."""
    if depth > MAX_BOX_DEPTH:
        raise VideoDecodeError(f"box nesting exceeds {MAX_BOX_DEPTH}")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise VideoDecodeError("truncated box header")
        counter[0] += 1
        if counter[0] > MAX_BOXES:
            raise VideoDecodeError(f"more than {MAX_BOXES} boxes")
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 0:  # to the end of the enclosing container
            box_end = end
        elif size == 1:  # 64-bit largesize follows the fourcc
            if body + 8 > end:
                raise VideoDecodeError("truncated largesize")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            if size < 16:
                raise VideoDecodeError(f"largesize {size} < header size")
            box_end = pos + size
        else:
            if size < 8:
                raise VideoDecodeError(f"box size {size} < header size")
            box_end = pos + size
        if box_end > end or box_end < body:
            raise VideoDecodeError(
                f"box {fourcc!r} declares size past its container"
            )
        yield fourcc, body, box_end, depth
        pos = box_end


def _full_box(data: bytes, start: int, end: int) -> tuple[int, int]:
    if start + 4 > end:
        raise VideoDecodeError("truncated FullBox header")
    return data[start], start + 4


def _mvhd(data: bytes, start: int, end: int) -> int | None:
    """Movie duration in ms (None when timescale is 0 — declared-empty
    movies exist in the wild and a ZeroDivision here would crash the
    crawl pass)."""
    version, pos = _full_box(data, start, end)
    if version == 0:
        need, fmt, skip = 16, ">II", 8  # creation+modification u32 each
    elif version == 1:
        need, fmt, skip = 28, ">IQ", 16  # ... u64 each
    else:
        raise VideoDecodeError(f"mvhd version {version}")
    if pos + need > end:
        raise VideoDecodeError("truncated mvhd")
    timescale, duration = struct.unpack_from(fmt, data, pos + skip)
    if timescale == 0:
        return None
    return duration * 1000 // timescale


def _tkhd(data: bytes, start: int, end: int) -> tuple[int, int]:
    """Track presentation (width, height): integer part of the 16.16
    fixed-point fields at the END of the tkhd body."""
    version, pos = _full_box(data, start, end)
    if version == 0:
        off = pos + 20 + 8 + 8 + 36  # times/ids + reserved + layer.. + matrix
    elif version == 1:
        off = pos + 32 + 8 + 8 + 36
    else:
        raise VideoDecodeError(f"tkhd version {version}")
    if off + 8 > end:
        raise VideoDecodeError("truncated tkhd")
    w_fixed, h_fixed = struct.unpack_from(">II", data, off)
    return w_fixed >> 16, h_fixed >> 16


def _hdlr(data: bytes, start: int, end: int) -> bytes:
    _, pos = _full_box(data, start, end)
    if pos + 8 > end:
        raise VideoDecodeError("truncated hdlr")
    return data[pos + 4 : pos + 8]  # skip pre_defined


def _stsd_codec(data: bytes, start: int, end: int) -> str | None:
    _, pos = _full_box(data, start, end)
    if pos + 4 > end:
        raise VideoDecodeError("truncated stsd")
    (count,) = struct.unpack_from(">I", data, pos)
    if count == 0:
        return None
    if pos + 12 > end:
        raise VideoDecodeError("truncated stsd sample entry")
    (entry_size,) = struct.unpack_from(">I", data, pos + 4)
    if entry_size < 8 or pos + 4 + entry_size > end:
        raise VideoDecodeError("stsd sample entry overruns box")
    try:
        return data[pos + 8 : pos + 12].decode("ascii")
    except UnicodeDecodeError as exc:
        raise VideoDecodeError("non-ASCII sample-entry fourcc") from exc


def parse_mp4(data: bytes) -> dict:
    """ISO-BMFF bytes → metadata dict:

    ``{"format": "mp4", "major_brand": str, "width": int|None,
    "height": int|None, "duration_ms": int|None, "codec": str|None,
    "mdat_spans": [(start, end), ...]}``

    Width/height/codec come from the FIRST track whose ``hdlr`` is
    ``vide`` (falling back to the first track when no handler says so —
    audio-only M4A then reports codec with NULL dims). ``mdat_spans``
    locate the media payload for content-addressing; the walk never
    reads payload bytes itself.
    """
    if not sniff_mp4(data):
        raise VideoDecodeError("not an ISO-BMFF stream (no ftyp box)")
    counter = [0]
    out: dict = {
        "format": "mp4", "major_brand": "", "width": None, "height": None,
        "duration_ms": None, "codec": None, "mdat_spans": [],
    }
    picked_video = False

    def walk_trak(body: int, box_end: int, depth: int) -> None:
        nonlocal picked_video
        dims = handler = codec = None
        for fc, b, e, d in _walk(data, body, box_end, depth + 1, counter):
            if fc == b"tkhd":
                dims = _tkhd(data, b, e)
            elif fc == b"mdia":
                for fc2, b2, e2, d2 in _walk(data, b, e, d + 1, counter):
                    if fc2 == b"hdlr":
                        handler = _hdlr(data, b2, e2)
                    elif fc2 == b"minf":
                        for fc3, b3, e3, d3 in _walk(
                            data, b2, e2, d2 + 1, counter
                        ):
                            if fc3 == b"stbl":
                                for fc4, b4, e4, _ in _walk(
                                    data, b3, e3, d3 + 1, counter
                                ):
                                    if fc4 == b"stsd":
                                        codec = _stsd_codec(data, b4, e4)
        is_video = handler == b"vide"
        if picked_video:
            return
        if is_video or out["codec"] is None:
            out["codec"] = codec
            if is_video and dims is not None:
                out["width"], out["height"] = dims
            picked_video = is_video

    for fourcc, body, box_end, depth in _walk(
        data, 0, len(data), 0, counter
    ):
        if fourcc == b"ftyp":
            if body + 4 > box_end:
                raise VideoDecodeError("truncated ftyp")
            try:
                out["major_brand"] = data[body : body + 4].decode("ascii")
            except UnicodeDecodeError as exc:
                raise VideoDecodeError("non-ASCII major brand") from exc
        elif fourcc == b"mdat":
            out["mdat_spans"].append((body, box_end))
        elif fourcc == b"moov":
            for fc, b, e, d in _walk(data, body, box_end, depth + 1, counter):
                if fc == b"mvhd":
                    out["duration_ms"] = _mvhd(data, b, e)
                elif fc == b"trak":
                    walk_trak(b, e, d)
    return out


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + body)


def encode_mp4(
    width: int,
    height: int,
    duration_ms: int,
    payload: bytes = b"",
    codec: str = "avc1",
    timescale: int = 1000,
    version: int = 0,
) -> bytes:
    """Minimal-but-conformant ISO-BMFF file for the fixture/oracle
    playbook (the WAV/BMP pattern: construct the container bytes, then
    restate the box arithmetic in SQL). One video track; ``payload``
    lands in ``mdat`` verbatim (no frame encoding — the metadata lane
    never decodes frames). ``version`` selects v0/v1 mvhd+tkhd so tests
    cover both time-field widths. Inputs are trusted but validated
    loudly, the family's encoder contract."""
    if not 0 < width < (1 << 16) or not 0 < height < (1 << 16):
        raise ValueError(f"dims {width}x{height} out of 16.16 range")
    if duration_ms < 0 or timescale <= 0:
        raise ValueError("negative duration or non-positive timescale")
    if len(codec) != 4:
        raise ValueError(f"codec fourcc must be 4 chars, got {codec!r}")
    if version not in (0, 1):
        raise ValueError(f"mvhd/tkhd version {version}")
    duration = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    if version == 0:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + struct.pack(">iI", 0x00010000, 0x01000000) + b"\x00" * 10
            + _IDENTITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _full(b"tkhd", 0, struct.pack(
            ">IIIII", 0, 0, 1, 0, duration
        ) + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + _IDENTITY_MATRIX
            + struct.pack(">II", width << 16, height << 16))
    else:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + struct.pack(">iI", 0x00010000, 0x01000000) + b"\x00" * 10
            + _IDENTITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _full(b"tkhd", 1, struct.pack(
            ">QQIIQ", 0, 0, 1, 0, duration
        ) + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + _IDENTITY_MATRIX
            + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">HH", 0x55C4, 0))  # 'und' language, pre_defined
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"graft\x00")
    # VisualSampleEntry (14496-12 §12.1.3): 6 reserved + data_ref_index,
    # 16 pre_defined/reserved, width/height u16, 72dpi fixed, frame
    # count 1, 32-byte compressorname, depth 24, pre_defined -1
    entry = (
        struct.pack(">6xH", 1) + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                 + _box(codec.encode("ascii"), entry))
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", payload)
    return ftyp + moov + mdat


_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mdat_payload(data: bytes, meta: dict | None = None) -> bytes:
    """The concatenated ``mdat`` payload bytes — what the metadata lane
    content-addresses (two muxes of one payload hash identically; the
    container bytes don't). Raises :class:`VideoDecodeError` (via
    :func:`parse_mp4`) on malformed input; an mdat-less file addresses
    the empty payload."""
    spans = (meta or parse_mp4(data))["mdat_spans"]
    return b"".join(data[s:e] for s, e in spans)


# re-exported so multimodal's catch-list stays one import wide
__all__ = [
    "AudioDecodeError",
    "VideoDecodeError",
    "sniff_mp4",
    "parse_mp4",
    "encode_mp4",
    "mdat_payload",
]
