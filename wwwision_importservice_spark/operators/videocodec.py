"""Pure-stdlib video-container METADATA codecs: ISO-BMFF (MP4/MOV)
box walk and Matroska/WebM EBML walk.

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


class EbmlBudgetExceeded(VideoDecodeError):
    """EBML element budget exhausted mid-walk. A dedicated type (r12
    advisor catch): the block-count walk treats budget exhaustion as a
    soft ``n_frames=None`` while every structural error stays hard — a
    substring match on the message would flip silently if the message
    were ever reworded. Still a :class:`VideoDecodeError`, so metadata
    walks that hit the bomb cap keep rejecting loudly."""


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


def _mvhd(data: bytes, start: int, end: int) -> tuple[int | None, int | None]:
    """``(timescale, duration_ms)`` — duration None when timescale is 0
    (declared-empty movies exist in the wild and a ZeroDivision here
    would crash the crawl pass) or when it is the all-ones "unknown
    duration" sentinel (ISO 14496-12 §8.2.2: fragmented real-world
    files commonly write 0xFFFFFFFF / 2^64-1; the mehd/sidx fallbacks
    take over — r12 advisor catch). The timescale is returned
    separately because ``mehd``'s fragment_duration is expressed in
    it."""
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
    unknown = (1 << (32 if version == 0 else 64)) - 1
    if timescale == 0 or duration == unknown:
        return timescale or None, None
    return timescale, duration * 1000 // timescale


def _mehd(data: bytes, start: int, end: int) -> int:
    """``mvex/mehd`` fragment_duration (in the MOVIE timescale) — the
    whole-presentation duration a fragmented file declares while its
    ``mvhd`` duration is 0 (ISO 14496-12 §8.8.2)."""
    version, pos = _full_box(data, start, end)
    if version == 0:
        if pos + 4 > end:
            raise VideoDecodeError("truncated mehd")
        return struct.unpack_from(">I", data, pos)[0]
    if version == 1:
        if pos + 8 > end:
            raise VideoDecodeError("truncated mehd")
        return struct.unpack_from(">Q", data, pos)[0]
    raise VideoDecodeError(f"mehd version {version}")


def _sidx_duration_ms(data: bytes, start: int, end: int) -> int | None:
    """Segment-index total: sum of subsegment_durations over the sidx's
    OWN timescale (ISO 14496-12 §8.16.3) — the duration source for
    DASH/CMAF segments that carry neither mvhd nor mehd durations."""
    version, pos = _full_box(data, start, end)
    if pos + 8 > end:
        raise VideoDecodeError("truncated sidx")
    timescale = struct.unpack_from(">I", data, pos + 4)[0]
    pos += 8
    pos += 8 if version == 0 else 16  # earliest_pts + first_offset
    if pos + 4 > end:
        raise VideoDecodeError("truncated sidx reference count")
    count = struct.unpack_from(">HH", data, pos)[1]  # reserved, count
    pos += 4
    if pos + 12 * count > end:
        raise VideoDecodeError("sidx references overrun box")
    if timescale == 0:
        return None
    total = 0
    for i in range(count):
        total += struct.unpack_from(">I", data, pos + 12 * i + 4)[0]
    return total * 1000 // timescale


def _tkhd(data: bytes, start: int, end: int) -> tuple[int, int, int]:
    """``(track_id, width, height)``: the track_ID after the creation/
    modification times, and the integer part of the 16.16 fixed-point
    dims at the END of the tkhd body. track_ID keys the moof/tfhd/trun
    sample runs back to this track (fragmented n_frames, r13)."""
    version, pos = _full_box(data, start, end)
    if version == 0:
        id_off = pos + 8   # after creation+modification (u32 each)
        off = pos + 20 + 8 + 8 + 36  # times/ids + reserved + layer.. + matrix
    elif version == 1:
        id_off = pos + 16  # ... u64 each
        off = pos + 32 + 8 + 8 + 36
    else:
        raise VideoDecodeError(f"tkhd version {version}")
    if off + 8 > end:
        raise VideoDecodeError("truncated tkhd")
    (track_id,) = struct.unpack_from(">I", data, id_off)
    w_fixed, h_fixed = struct.unpack_from(">II", data, off)
    return track_id, w_fixed >> 16, h_fixed >> 16


def _hdlr(data: bytes, start: int, end: int) -> bytes:
    _, pos = _full_box(data, start, end)
    if pos + 8 > end:
        raise VideoDecodeError("truncated hdlr")
    return data[pos + 4 : pos + 8]  # skip pre_defined


def _stts_samples(data: bytes, start: int, end: int) -> int:
    """Total sample (frame) count: sum of ``sample_count`` over the
    time-to-sample entries (ISO 14496-12 §8.6.1.2) — the real frame
    count the metadata lane reports for video, no decode needed."""
    _, pos = _full_box(data, start, end)
    if pos + 4 > end:
        raise VideoDecodeError("truncated stts")
    (count,) = struct.unpack_from(">I", data, pos)
    pos += 4
    if pos + 8 * count > end:
        raise VideoDecodeError("stts entries overrun box")
    return sum(
        struct.unpack_from(">I", data, pos + 8 * i)[0] for i in range(count)
    )


def _tfhd_track_id(data: bytes, start: int, end: int) -> int:
    """``moof/traf/tfhd`` track_ID — always the first field after the
    FullBox header regardless of the tf_flags-gated optionals that
    follow (ISO 14496-12 §8.8.7)."""
    _, pos = _full_box(data, start, end)
    if pos + 4 > end:
        raise VideoDecodeError("truncated tfhd")
    return struct.unpack_from(">I", data, pos)[0]


def _trun_sample_count(data: bytes, start: int, end: int) -> int:
    """``moof/traf/trun`` sample_count — first field after the FullBox
    header (ISO 14496-12 §8.8.8); the per-sample arrays that follow are
    tr_flags-gated and never read (the metadata lane only counts)."""
    _, pos = _full_box(data, start, end)
    if pos + 4 > end:
        raise VideoDecodeError("truncated trun")
    return struct.unpack_from(">I", data, pos)[0]


def _stsd_entry(
    data: bytes, start: int, end: int
) -> tuple[str, int, int] | None:
    """First stsd sample entry: ``(fourcc, body_start, body_end)`` —
    the caller interprets the body by the track's handler type."""
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
        fourcc = data[pos + 8 : pos + 12].decode("ascii")
    except UnicodeDecodeError as exc:
        raise VideoDecodeError("non-ASCII sample-entry fourcc") from exc
    return fourcc, pos + 12, pos + 4 + entry_size


def _audio_entry_fields(
    data: bytes, body: int, body_end: int
) -> tuple[int | None, int | None]:
    """AudioSampleEntry (ISO 14496-12 §12.2.3) ``(channels,
    sample_rate)``: after the 8-byte reserved/data_ref_index prefix and
    8 reserved bytes sit channelcount(u16), samplesize(u16),
    pre_defined(u16), reserved(u16), samplerate(16.16). Entries too
    short for the fixed layout report (None, None) rather than erroring
    — stsd bodies for exotic codecs vary and the walk is metadata-only."""
    if body + 28 > body_end:
        return None, None
    channels = struct.unpack_from(">H", data, body + 16)[0]
    rate = struct.unpack_from(">I", data, body + 24)[0] >> 16
    return channels or None, rate or None


def parse_mp4(data: bytes) -> dict:
    """ISO-BMFF bytes → metadata dict:

    ``{"format": "mp4", "major_brand": str, "width": int|None,
    "height": int|None, "duration_ms": int|None, "codec": str|None,
    "has_video": bool, "n_frames": int|None,
    "mdat_spans": [(start, end), ...]}``

    ``n_frames`` is the video track's stts sample total; fragmented
    files (empty stts) fall back to the sum of ``moof/traf/trun``
    sample_counts whose ``tfhd`` track_ID matches the video track
    (r13) — None only when neither table carries samples.

    Width/height/codec/n_frames come from the FIRST track whose
    ``hdlr`` is ``vide`` (falling back to the first track for codec
    when no handler says so). ``sample_rate``/``channels`` come from
    the FIRST ``soun`` track's AudioSampleEntry REGARDLESS of mux
    order (r13, advisor catch: the old pick-loop leaked the audio
    fields only when the audio trak happened to precede the video
    trak) — so an A/V file reports the video dims AND its audio
    track's rate/channels, and audio-only M4A reports codec with NULL
    dims and ``has_video=False``, which ``media_metadata`` routes as
    ``kind='audio'``. ``mdat_spans`` locate the media payload for
    content-addressing; the walk never reads payload bytes itself.
    """
    if not sniff_mp4(data):
        raise VideoDecodeError("not an ISO-BMFF stream (no ftyp box)")
    counter = [0]
    out: dict = {
        "format": "mp4", "major_brand": "", "width": None, "height": None,
        "duration_ms": None, "codec": None, "has_video": False,
        "n_frames": None, "sample_rate": None, "channels": None,
        "mdat_spans": [],
    }
    tracks: list[dict] = []  # file order
    trun_by_track: dict[int, int] = {}
    movie_timescale = mvhd_ms = mehd_units = sidx_total = None

    def walk_trak(body: int, box_end: int, depth: int) -> None:
        info: dict = {"handler": None, "track_id": None, "dims": None,
                      "entry": None, "n_samples": None}
        for fc, b, e, d in _walk(data, body, box_end, depth + 1, counter):
            if fc == b"tkhd":
                tid, w, h = _tkhd(data, b, e)
                info["track_id"], info["dims"] = tid, (w, h)
            elif fc == b"mdia":
                for fc2, b2, e2, d2 in _walk(data, b, e, d + 1, counter):
                    if fc2 == b"hdlr":
                        info["handler"] = _hdlr(data, b2, e2)
                    elif fc2 == b"minf":
                        for fc3, b3, e3, d3 in _walk(
                            data, b2, e2, d2 + 1, counter
                        ):
                            if fc3 == b"stbl":
                                for fc4, b4, e4, _ in _walk(
                                    data, b3, e3, d3 + 1, counter
                                ):
                                    if fc4 == b"stsd":
                                        info["entry"] = _stsd_entry(data, b4, e4)
                                    elif fc4 == b"stts":
                                        info["n_samples"] = _stts_samples(
                                            data, b4, e4
                                        )
        tracks.append(info)

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
        elif fourcc == b"sidx":
            sidx_ms = _sidx_duration_ms(data, body, box_end)
            if sidx_ms is not None:
                sidx_total = (sidx_total or 0) + sidx_ms
        elif fourcc == b"moof":
            # fragmented sample runs: per-track trun sample_count sums,
            # keyed by the traf's tfhd track_ID (ISO 14496-12 §8.8)
            for fc, b, e, d in _walk(data, body, box_end, depth + 1, counter):
                if fc == b"traf":
                    tid = None
                    runs = 0
                    for fc2, b2, e2, _d2 in _walk(
                        data, b, e, d + 1, counter
                    ):
                        if fc2 == b"tfhd":
                            tid = _tfhd_track_id(data, b2, e2)
                        elif fc2 == b"trun":
                            runs += _trun_sample_count(data, b2, e2)
                    if tid is not None and runs:
                        trun_by_track[tid] = trun_by_track.get(tid, 0) + runs
        elif fourcc == b"moov":
            for fc, b, e, d in _walk(data, body, box_end, depth + 1, counter):
                if fc == b"mvhd":
                    movie_timescale, mvhd_ms = _mvhd(data, b, e)
                elif fc == b"mvex":
                    for fc2, b2, e2, _d2 in _walk(
                        data, b, e, d + 1, counter
                    ):
                        if fc2 == b"mehd":
                            mehd_units = _mehd(data, b2, e2)
                elif fc == b"trak":
                    walk_trak(b, e, d)

    video = next((t for t in tracks if t["handler"] == b"vide"), None)
    audio = next((t for t in tracks if t["handler"] == b"soun"), None)
    pick = video or (tracks[0] if tracks else None)
    if pick is not None and pick["entry"] is not None:
        out["codec"] = pick["entry"][0]
    if video is not None:
        out["has_video"] = True
        if video["dims"] is not None:
            out["width"], out["height"] = video["dims"]
        # frame count: the time-to-sample table when it carries samples,
        # else the fragmented moof/trun sum for this track_ID (r13);
        # zero/absent both ways reports None rather than a false 0
        n = video["n_samples"] or trun_by_track.get(video["track_id"])
        out["n_frames"] = n or None
    if audio is not None and audio["entry"] is not None:
        out["channels"], out["sample_rate"] = _audio_entry_fields(
            data, audio["entry"][1], audio["entry"][2]
        )
    # Duration precedence for fragmented files (CMAF/DASH write mvhd
    # duration 0 and declare the real length in mvex/mehd, or only in
    # per-segment sidx indexes): a nonzero mvhd wins; else mehd (movie
    # timescale); else the sidx subsegment sum; else whatever mvhd said
    # (0 or absent).
    if mvhd_ms:
        out["duration_ms"] = mvhd_ms
    elif mehd_units is not None and movie_timescale:
        out["duration_ms"] = mehd_units * 1000 // movie_timescale
    elif sidx_total is not None:
        out["duration_ms"] = sidx_total
    else:
        out["duration_ms"] = mvhd_ms
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
    fragmented: str | None = None,
    n_frames: int = 0,
    track: str = "video",
    channels: int = 2,
    sample_rate_hz: int = 44100,
    with_audio: bool = False,
    audio_first: bool = False,
    audio_codec: str = "mp4a",
) -> bytes:
    """Minimal-but-conformant ISO-BMFF file for the fixture/oracle
    playbook (the WAV/BMP pattern: construct the container bytes, then
    restate the box arithmetic in SQL). ``payload`` lands in ``mdat``
    verbatim (no frame encoding — the metadata lane never decodes
    frames). ``version`` selects v0/v1 mvhd+tkhd so tests cover both
    time-field widths.

    ``with_audio`` adds a second, audio trak (track_ID 2,
    ``audio_codec``/``channels``/``sample_rate_hz``) to a video file —
    the A/V mux shape; ``audio_first`` writes it BEFORE the video trak
    so both track orders are pinnable (r13, the mux-order-independence
    fixture).

    ``fragmented`` builds the CMAF/DASH shape real crawls carry —
    ``mvhd`` duration 0, the real length declared elsewhere:
    ``'mehd'`` puts it in ``moov/mvex/mehd`` (movie timescale),
    ``'sidx'`` in a two-reference segment index (own timescale), plus a
    minimal ``moof`` before the ``mdat``. ``n_frames > 0`` writes a
    one-run ``stts`` declaring that sample count — except when
    fragmented, where the stts stays empty (the real-world convention)
    and the count goes into a ``moof/traf`` ``tfhd(track_ID=1)`` +
    ``trun(sample_count)`` run instead (r13). Inputs are trusted but
    validated loudly, the family's encoder contract."""
    if not 0 < width < (1 << 16) or not 0 < height < (1 << 16):
        raise ValueError(f"dims {width}x{height} out of 16.16 range")
    if duration_ms < 0 or timescale <= 0:
        raise ValueError("negative duration or non-positive timescale")
    if n_frames < 0:
        raise ValueError("negative n_frames")
    if track not in ("video", "audio"):
        raise ValueError(f"track must be 'video'|'audio', got {track!r}")
    if (track == "audio" or with_audio) and not (
        0 < channels < 1 << 16 and 0 < sample_rate_hz < 1 << 16
    ):
        raise ValueError("channels/sample_rate_hz out of AudioSampleEntry range")
    if with_audio and track != "video":
        raise ValueError("with_audio adds an audio trak to a video file")
    if len(codec) != 4 or (with_audio and len(audio_codec) != 4):
        raise ValueError(f"codec fourcc must be 4 chars, got {codec!r}")
    if version not in (0, 1):
        raise ValueError(f"mvhd/tkhd version {version}")
    if fragmented not in (None, "mehd", "sidx"):
        raise ValueError(f"fragmented must be None|'mehd'|'sidx', got {fragmented!r}")
    duration = duration_ms * timescale // 1000
    frag_frames = 0
    if fragmented:
        real_duration, duration = duration, 0  # mvhd/tkhd declare empty
        frag_frames, n_frames = n_frames, 0  # samples ride moof/trun
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    if version == 0:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + struct.pack(">iI", 0x00010000, 0x01000000) + b"\x00" * 8
            + _IDENTITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    else:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + struct.pack(">iI", 0x00010000, 0x01000000) + b"\x00" * 8
            + _IDENTITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))

    def build_trak(tid: int, kind: str, fourcc: str, frames: int,
                   w: int, h: int) -> bytes:
        if version == 0:
            tkhd = _full(b"tkhd", 0, struct.pack(
                ">IIIII", 0, 0, tid, 0, duration
            ) + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                + _IDENTITY_MATRIX
                + struct.pack(">II", w << 16, h << 16))
        else:
            tkhd = _full(b"tkhd", 1, struct.pack(
                ">QQIIQ", 0, 0, tid, 0, duration
            ) + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                + _IDENTITY_MATRIX
                + struct.pack(">II", w << 16, h << 16))
        mdhd = _full(b"mdhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration
        ) + struct.pack(">HH", 0x55C4, 0))  # 'und' language, pre_defined
        handler = b"vide" if kind == "video" else b"soun"
        hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + handler
                     + b"\x00" * 12 + b"graft\x00")
        # VisualSampleEntry (14496-12 §12.1.3): 6 reserved +
        # data_ref_index, 16 pre_defined/reserved, width/height u16,
        # 72dpi fixed, frame count 1, 32-byte compressorname, depth 24,
        # pre_defined -1
        if kind == "video":
            entry = (
                struct.pack(">6xH", 1) + b"\x00" * 16
                + struct.pack(">HH", w, h)
                + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
                + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
            )
        else:
            # AudioSampleEntry (§12.2.3): 8 reserved, channelcount,
            # samplesize 16, pre_defined, reserved, samplerate 16.16
            entry = (
                struct.pack(">6xH", 1) + b"\x00" * 8
                + struct.pack(">HHHH", channels, 16, 0, 0)
                + struct.pack(">I", sample_rate_hz << 16)
            )
        stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                     + _box(fourcc.encode("ascii"), entry))
        # the sample tables the spec makes mandatory in every stbl
        # (§8.5.1); stts carries the REAL frame count the walker reports
        # (one run of frames samples, delta = duration/n when sensible)
        if frames > 0:
            delta = max(1, duration // frames)
            stts = _full(b"stts", 0, struct.pack(">III", 1, frames, delta))
        else:
            stts = _full(b"stts", 0, struct.pack(">I", 0))
        stsc = _full(b"stsc", 0, struct.pack(">I", 0))
        stsz = _full(b"stsz", 0, struct.pack(">III", 0, 0, 0))
        stco = _full(b"stco", 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    trak = build_trak(1, track, codec, n_frames, width, height)
    if with_audio:
        # audio traks carry 0x0 tkhd dims (the real-mux convention);
        # audio_first swaps the trak ORDER, track_IDs stay 1=video 2=audio
        audio_trak = build_trak(2, "audio", audio_codec, 0, 0, 0)
        trak = audio_trak + trak if audio_first else trak + audio_trak
    if fragmented == "mehd":
        mvex = _box(b"mvex", _full(b"mehd", 0, struct.pack(">I", real_duration))
                    + _full(b"trex", 0, struct.pack(">IIIII", 1, 1, 0, 0, 0)))
        moov = _box(b"moov", mvhd + mvex + trak)
    else:
        moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", payload)
    if fragmented is None:
        return ftyp + moov + mdat
    pre_mdat = b""
    if fragmented == "sidx":
        # two references splitting the duration (floor + remainder), so
        # the parser's SUM is exercised, not just a single entry
        half = real_duration // 2
        refs = b"".join(
            struct.pack(">III", 0, d, 0x90000000)
            for d in (half, real_duration - half)
        )
        pre_mdat = _full(b"sidx", 0, struct.pack(
            ">II", 1, timescale) + struct.pack(">II", 0, 0)
            + struct.pack(">HH", 0, 2) + refs)
    moof_body = _full(b"mfhd", 0, struct.pack(">I", 1))
    if frag_frames > 0:
        # CMAF-shaped sample run: tfhd names the video track, two truns
        # split the count (floor + remainder) so the parser's SUM over
        # multiple truns is exercised
        half = frag_frames // 2
        runs = [half, frag_frames - half] if half else [frag_frames]
        traf = _full(b"tfhd", 0, struct.pack(">I", 1)) + b"".join(
            _full(b"trun", 0, struct.pack(">I", n)) for n in runs if n
        )
        moof_body += _box(b"traf", traf)
    moof = _box(b"moof", moof_body)
    return ftyp + moov + pre_mdat + moof + mdat


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


# --------------------------------------------------------------------------
# HEIF / AVIF — ISO-BMFF *image-item* files (ISO/IEC 23008-12): the
# picture is an untimed ITEM inside a top-level `meta` box, not a trak,
# so the track walk above sees an empty movie. Before r13 every iPhone
# photo (HEIC) and modern web AVIF routed as kind='audio' format='mp4'
# with all-NULL fields — the misrouting class this family exists to
# prevent. Same posture as the rest of the file: box arithmetic only
# (ispe dims, infe item types, ipma/ipco associations), no bitstream
# decode, bomb-capped via the shared _walk counters, typed errors.

#: ftyp brands that mark an image-item file → reported format family.
#: Sequence brands (avis/msf1) are animated variants of the same
#: containers (ISO 23008-12 §10).
_HEIF_BRAND_FORMAT = {
    b"avif": "avif", b"avis": "avif",
    b"heic": "heic", b"heix": "heic", b"hevc": "heic", b"hevx": "heic",
    b"mif1": "heif", b"msf1": "heif",
}
_HEIF_SEQUENCE_BRANDS = {b"avis", b"msf1", b"hevc", b"hevx"}


def _ftyp_brands(data: bytes) -> list[bytes]:
    """Major + compatible brands from a leading ftyp box, or [] when
    the prefix is not a well-formed ftyp (sniff convention: malformed
    means 'not this format', never an exception)."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        return []
    (size,) = struct.unpack_from(">I", data, 0)
    if size < 16 or size > len(data) or size % 4:
        return []
    return [data[8:12]] + [
        data[off : off + 4] for off in range(16, size, 4)
    ]


def sniff_heif(data: bytes) -> bool:
    """Image-item ISO-BMFF magic: any ftyp brand (major OR compatible —
    real encoders commonly write major ``mif1`` with the codec brand in
    the compatible list) is a HEIF/AVIF image brand. Disjoint from
    :func:`sniff_mp4` routing by ORDER, not by bytes — ``media_metadata``
    checks this first, so plain movies (brands isom/mp42/...) still
    reach the track walk."""
    return any(b in _HEIF_BRAND_FORMAT for b in _ftyp_brands(data))


def parse_heif(data: bytes) -> dict:
    """HEIF/AVIF bytes → metadata dict:

    ``{"format": "avif"|"heic"|"heif", "major_brand": str,
    "width": int|None, "height": int|None, "codec": str|None,
    "n_frames": int|None, "animated": bool,
    "mdat_spans": [(start, end), ...]}``

    The PRIMARY item (``pitm``) drives the report: its ``infe``
    item_type is the codec (``av01``/``hvc1``/...), and its ``ispe``
    property — resolved through the ``ipma`` association table into the
    ordered ``ipco`` property list (ISO 14496-12 §8.11.14) — carries
    the dims, so a file with thumbnail/alpha auxiliary items reports
    the full-resolution image, not whichever ispe happens first. Files
    without pitm/ipma (minimal single-item encoders) fall back to the
    first image item and the first ispe. ``n_frames`` is 1 for still
    images and None for sequence brands (avis/msf1 — the frame count
    lives in a trak the still-image walk does not parse; None beats a
    false 1). ``mdat_spans`` locate the coded payload for
    content-addressing (:func:`mdat_payload` accepts this dict), the
    video-lane convention — item payloads are codec bitstreams, so
    unlike plain images the address is the CODED payload, not decoded
    pixels."""
    brands = _ftyp_brands(data)
    fmt = next(
        (_HEIF_BRAND_FORMAT[b] for b in brands if b in _HEIF_BRAND_FORMAT),
        None,
    )
    if fmt is None:
        raise VideoDecodeError("no HEIF/AVIF image brand in ftyp")
    counter = [0]
    out: dict = {
        "format": fmt, "major_brand": brands[0].decode("latin-1"),
        "width": None, "height": None, "codec": None,
        "n_frames": None if any(
            b in _HEIF_SEQUENCE_BRANDS for b in brands
        ) else 1,
        "animated": any(b in _HEIF_SEQUENCE_BRANDS for b in brands),
        "mdat_spans": [],
    }
    pitm_id: int | None = None
    items: list[tuple[int, str]] = []  # (item_id, item_type) file order
    ipco_props: list[tuple[bytes, int, int]] = []
    ipma: dict[int, list[int]] = {}  # item_id -> 1-based ipco indices
    for fourcc, body, box_end, depth in _walk(data, 0, len(data), 0, counter):
        if fourcc == b"mdat":
            out["mdat_spans"].append((body, box_end))
        elif fourcc == b"meta":
            version, pos = _full_box(data, body, box_end)
            for fc, b, e, d in _walk(data, pos, box_end, depth + 1, counter):
                if fc == b"hdlr":
                    if _hdlr(data, b, e) != b"pict":
                        raise VideoDecodeError(
                            "meta handler is not 'pict' (not an image-item "
                            "meta box)"
                        )
                elif fc == b"pitm":
                    v, p = _full_box(data, b, e)
                    width = 2 if v == 0 else 4
                    if p + width > e:
                        raise VideoDecodeError("truncated pitm")
                    pitm_id = int.from_bytes(data[p : p + width], "big")
                elif fc == b"iinf":
                    v, p = _full_box(data, b, e)
                    p += 2 if v == 0 else 4  # entry_count (walk finds them)
                    for fc2, b2, e2, _d2 in _walk(data, p, e, d + 1, counter):
                        if fc2 != b"infe":
                            continue
                        v2, p2 = _full_box(data, b2, e2)
                        if v2 < 2:
                            # pre-HEIF infe (no item_type field): skip —
                            # image items require version >= 2 (23008-12)
                            continue
                        idw = 2 if v2 == 2 else 4
                        if p2 + idw + 2 + 4 > e2:
                            raise VideoDecodeError("truncated infe")
                        iid = int.from_bytes(data[p2 : p2 + idw], "big")
                        itype = data[p2 + idw + 2 : p2 + idw + 6]
                        items.append((iid, itype.decode("latin-1")))
                elif fc == b"iprp":
                    for fc2, b2, e2, d2 in _walk(data, b, e, d + 1, counter):
                        if fc2 == b"ipco":
                            ipco_props = [
                                (fc3, b3, e3)
                                for fc3, b3, e3, _ in _walk(
                                    data, b2, e2, d2 + 1, counter
                                )
                            ]
                        elif fc2 == b"ipma":
                            v2, p2 = _full_box(data, b2, e2)
                            flags = int.from_bytes(data[b2 + 1 : b2 + 4], "big")
                            if p2 + 4 > e2:
                                raise VideoDecodeError("truncated ipma")
                            (n_entries,) = struct.unpack_from(">I", data, p2)
                            p2 += 4
                            for _i in range(n_entries):
                                idw = 2 if v2 < 1 else 4
                                if p2 + idw + 1 > e2:
                                    raise VideoDecodeError("truncated ipma")
                                iid = int.from_bytes(
                                    data[p2 : p2 + idw], "big"
                                )
                                p2 += idw
                                n_assoc = data[p2]
                                p2 += 1
                                aw = 2 if flags & 1 else 1
                                if p2 + n_assoc * aw > e2:
                                    raise VideoDecodeError("truncated ipma")
                                idxs = []
                                for _j in range(n_assoc):
                                    raw = int.from_bytes(
                                        data[p2 : p2 + aw], "big"
                                    )
                                    p2 += aw
                                    # high bit = essential; rest = 1-based
                                    # ipco index (0 = none)
                                    idx = raw & (0x7FFF if aw == 2 else 0x7F)
                                    if idx:
                                        idxs.append(idx)
                                ipma[iid] = idxs
    # metadata-only item types never drive the report
    image_items = [
        (iid, t) for iid, t in items if t not in ("mime", "Exif", "uri ")
    ]
    primary = next(
        ((iid, t) for iid, t in image_items if iid == pitm_id),
        image_items[0] if image_items else None,
    )
    if primary is not None:
        out["codec"] = primary[1]
        assoc = ipma.get(primary[0])
        candidates = (
            [ipco_props[i - 1] for i in assoc if 0 < i <= len(ipco_props)]
            if assoc is not None
            else ipco_props
        )
        for fc, b, e in candidates:
            if fc == b"ispe":
                _v, p = _full_box(data, b, e)
                if p + 8 > e:
                    raise VideoDecodeError("truncated ispe")
                out["width"], out["height"] = struct.unpack_from(
                    ">II", data, p
                )
                break
    return out


def encode_heif(
    width: int,
    height: int,
    codec: str = "av01",
    payload: bytes = b"",
    brand: str | None = None,
    extra_items: int = 0,
) -> bytes:
    """Minimal conformant HEIF/AVIF still image for the fixture/oracle
    playbook: ftyp (brand + mif1 compatible), a ``pict`` meta box with
    pitm → infe(v2, ``codec``) → ipco(ispe) + ipma association, an iloc
    whose 4-byte extent points at the real mdat payload offset, and the
    payload itself in mdat. ``brand`` defaults to ``avif`` for av01 and
    ``heic`` otherwise. ``extra_items`` appends that many decoy
    thumbnail items (half-size ispe properties, own ipma rows) BEFORE
    the primary's property in ipco — a file where "first ispe wins"
    reports the wrong dims, pinning the pitm/ipma resolution. Trusted-
    but-validated inputs, the family's encoder contract."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    if len(codec) != 4:
        raise ValueError(f"codec must be a fourcc, got {codec!r}")
    if not 0 <= extra_items <= 126:
        # the v0 ipma association index is 7 bits; 0x80|idx would
        # silently alias past 127
        raise ValueError("extra_items must be 0..126")
    brand = brand or ("avif" if codec == "av01" else "heic")
    if brand.encode() not in _HEIF_BRAND_FORMAT:
        raise ValueError(f"brand {brand!r} is not an image brand")
    primary_id = extra_items + 1  # decoys first: order must not matter
    ftyp = _box(
        b"ftyp", brand.encode() + struct.pack(">I", 0)
        + brand.encode() + b"mif1"
    )

    def build_meta(mdat_offset: int) -> bytes:
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"pict" + b"\x00" * 13)
        pitm = _full(b"pitm", 0, struct.pack(">H", primary_id))
        infes = b"".join(
            _box(b"infe", bytes([2, 0, 0, 0])
                 + struct.pack(">HH", iid, 0) + codec.encode() + b"\x00")
            for iid in range(1, extra_items + 2)
        )
        iinf = _full(
            b"iinf", 0, struct.pack(">H", extra_items + 1) + infes
        )
        # ipco: decoy half-size ispe properties FIRST, primary's last
        props = [
            _full(b"ispe", 0, struct.pack(
                ">II", max(width // 2, 1), max(height // 2, 1)
            ))
            for _ in range(extra_items)
        ] + [_full(b"ispe", 0, struct.pack(">II", width, height))]
        ipco = _box(b"ipco", b"".join(props))
        assoc_rows = b"".join(
            struct.pack(">HB", iid, 1) + bytes([0x80 | idx])
            for idx, iid in enumerate(range(1, extra_items + 2), start=1)
        )
        ipma = _full(
            b"ipma", 0, struct.pack(">I", extra_items + 1) + assoc_rows
        )
        iprp = _box(b"iprp", ipco + ipma)
        iloc = _full(
            b"iloc", 0,
            bytes([0x44, 0x00])  # offset_size=4, length_size=4, base=0
            + struct.pack(">H", 1)  # item_count
            + struct.pack(">HHH", primary_id, 0, 1)  # id, dref, extents
            + struct.pack(">II", mdat_offset, len(payload)),
        )
        return _box(
            b"meta",
            bytes([0, 0, 0, 0]) + hdlr + pitm + iinf + iprp + iloc,
        )

    # two-pass: iloc's extent offset is absolute, but its own width is
    # fixed (4 bytes), so the meta size is offset-independent
    meta_size = len(build_meta(0))
    mdat_offset = len(ftyp) + meta_size + 8
    return ftyp + build_meta(mdat_offset) + _box(b"mdat", payload)


# --------------------------------------------------------------------------
# Matroska / WebM (EBML) — the other container real crawls are full of.
# Same posture as the ISO-BMFF walk: metadata only (Info duration,
# Tracks video dims + codec id), no block decode, bomb-capped, typed
# errors. IDs per the Matroska spec (RFC 9559) / EBML (RFC 8794).

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element IDs, raw (marker bits kept, the EBML convention)
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TS_SCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE
_ID_TRACK_TYPE = 0x83
_ID_CODEC_ID = 0x86
_ID_VIDEO = 0xE0
_ID_PIXEL_W = 0xB0
_ID_PIXEL_H = 0xBA
_ID_AUDIO = 0xE1
_ID_SAMPLING_FREQ = 0xB5
_ID_CHANNELS = 0x9F
_ID_CLUSTER = 0x1F43B675
_ID_DOCTYPE = 0x4282
_ID_TRACK_NUM = 0xD7
_ID_SIMPLE_BLOCK = 0xA3
_ID_BLOCK_GROUP = 0xA0
_ID_BLOCK = 0xA1

#: Dedicated budget for the block-count walk: one element per block,
#: cost linear in the file's own bytes (the threat-model bound); a file
#: with more blocks reports n_frames=None (unknown), never an error.
MAX_BLOCK_WALK = 1 << 20

#: EBML element budget — a metadata walk that sees more is a crafted
#: size chain, same rationale as MAX_BOXES.
MAX_EBML_ELEMENTS = 4096


def sniff_webm(data: bytes) -> bool:
    """EBML magic (Matroska and WebM both start with the EBML header)."""
    return data[:4] == _EBML_MAGIC


def _vint(data: bytes, pos: int, end: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos``: element IDs keep the
    length-marker bit (the spec's raw-ID convention), sizes strip it."""
    if pos >= end:
        raise VideoDecodeError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise VideoDecodeError("invalid EBML varint (zero lead byte)")
    length = 9 - first.bit_length()
    if pos + length > end:
        raise VideoDecodeError("EBML varint runs past its container")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


_EBML_UNKNOWN = object()


def _ebml_walk(data: bytes, start: int, end: int, counter: list[int]):
    """Yield ``(element_id, body_start, body_end)`` for the elements in
    ``data[start:end]``. An all-ones (unknown) size — legal on Segment
    and Cluster — runs to the end of the enclosing range."""
    pos = start
    while pos < end:
        counter[0] += 1
        if counter[0] > MAX_EBML_ELEMENTS:
            raise EbmlBudgetExceeded(
                f"more than {MAX_EBML_ELEMENTS} EBML elements"
            )
        eid, pos = _vint(data, pos, end, keep_marker=True)
        if pos >= end:
            raise VideoDecodeError("EBML element without a size field")
        size_len = 9 - data[pos].bit_length() if data[pos] else 0
        size, body = _vint(data, pos, end, keep_marker=False)
        unknown = size == (1 << (7 * size_len)) - 1 if size_len else False
        body_end = end if unknown else body + size
        if body_end > end or body_end < body:
            raise VideoDecodeError("EBML element declares size past its container")
        yield eid, body, body_end
        pos = body_end


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    if end - start > 8:
        raise VideoDecodeError("EBML uint wider than 8 bytes")
    return int.from_bytes(data[start:end], "big")


def _ebml_float(data: bytes, start: int, end: int) -> float:
    width = end - start
    if width == 4:
        return struct.unpack(">f", data[start:end])[0]
    if width == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise VideoDecodeError(f"EBML float of width {width}")


def _block_info(data: bytes, start: int, end: int) -> tuple[int, int]:
    """(track_number, frame_count) of a (Simple)Block: track vint, i16
    timestamp, flags; lacing != 0 carries a frame_count-1 byte (RFC
    9559 §10). Content bytes are never read."""
    track, pos = _vint(data, start, end, keep_marker=False)
    if pos + 3 > end:
        raise VideoDecodeError("truncated block header")
    lacing = (data[pos + 2] >> 1) & 0x3
    if lacing == 0:
        return track, 1
    if pos + 4 > end:
        raise VideoDecodeError("truncated laced block header")
    return track, data[pos + 3] + 1


def _count_track_frames(data: bytes, spans, track_num: int) -> int | None:
    """Total frames the given track carries across the Cluster spans —
    header-hopping only (one element per block, content skipped).
    Returns None past MAX_BLOCK_WALK blocks (:class:`EbmlBudgetExceeded`,
    the typed soft path — r12 advisor catch: a message-substring match
    would flip on a reword): unknown beats an error for a pure
    observability field; structural errors stay hard.

    An unknown-size Cluster (the normal live/streamed shape) spans to
    the end of the Segment, so LATER clusters sit inside its span as
    nested elements — the walk pushes nested ``Cluster`` elements onto
    the work list instead of skipping them (r12 advisor catch), so
    multi-cluster streamed files count every block exactly once."""
    # start the shared-cap counter negative so the effective budget is
    # MAX_BLOCK_WALK (the walk raises past MAX_EBML_ELEMENTS)
    budget_counter = [MAX_EBML_ELEMENTS - MAX_BLOCK_WALK]
    total = 0
    stack = list(spans)
    try:
        while stack:
            s, e = stack.pop()
            for eid, b, e2 in _ebml_walk(data, s, e, budget_counter):
                if eid == _ID_SIMPLE_BLOCK:
                    t, fr = _block_info(data, b, e2)
                    if t == track_num:
                        total += fr
                elif eid == _ID_BLOCK_GROUP:
                    for eid2, b2, e3 in _ebml_walk(data, b, e2, budget_counter):
                        if eid2 == _ID_BLOCK:
                            t, fr = _block_info(data, b2, e3)
                            if t == track_num:
                                total += fr
                elif eid == _ID_CLUSTER:
                    stack.append((b, e2))
    except EbmlBudgetExceeded:
        return None  # block-walk budget exhausted: unknown
    return total


def parse_webm(data: bytes) -> dict:
    """Matroska/WebM bytes → the same metadata dict shape as
    :func:`parse_mp4`:

    ``{"format": doctype ('webm'/'matroska'), "width", "height",
    "duration_ms", "codec", "has_video", "payload_spans"}``

    ``duration_ms`` = Info.Duration (float, TimestampScale units) ×
    TimestampScale (ns, default 10^6) / 10^6, floored — exact for the
    constructed-fixture convention (integer-valued Duration at the
    default scale). Dims/codec/n_frames come from the first video
    TrackEntry; ``sample_rate``/``channels`` from the first AUDIO
    TrackEntry regardless of mux order (r13, the same contract as
    :func:`parse_mp4`). ``payload_spans`` are the raw Cluster bodies:
    unlike the lossless audio lanes, Matroska payload equality across
    muxes is NOT a goal (block headers interleave with frame bytes), so
    the content-address covers this mux's media region, documented as
    such — an unknown-size Cluster's span runs to the Segment end and
    therefore covers later clusters' framing bytes too (the streamed
    shape; frame COUNTING still visits each block exactly once via the
    nested-cluster walk).
    """
    if not sniff_webm(data):
        raise VideoDecodeError("not an EBML stream (no EBML magic)")
    counter = [0]
    out: dict = {
        "format": "webm", "width": None, "height": None,
        "duration_ms": None, "codec": None, "has_video": False,
        "n_frames": None, "sample_rate": None, "channels": None,
        "payload_spans": [],
    }
    ts_scale = 1_000_000  # spec default: 1 ms per unit
    duration_units: float | None = None
    entries: list[dict] = []  # TrackEntry dicts in file order

    def walk_track_entry(start: int, end: int) -> None:
        info: dict = {"type": None, "codec": None, "dims": (None, None),
                      "freq": None, "chans": None, "num": None}
        for eid, b, e in _ebml_walk(data, start, end, counter):
            if eid == _ID_TRACK_NUM:
                info["num"] = _ebml_uint(data, b, e)
            elif eid == _ID_TRACK_TYPE:
                info["type"] = _ebml_uint(data, b, e)
            elif eid == _ID_CODEC_ID:
                try:
                    info["codec"] = data[b:e].decode("ascii")
                except UnicodeDecodeError as exc:
                    raise VideoDecodeError("non-ASCII CodecID") from exc
            elif eid == _ID_VIDEO:
                dims_w = dims_h = None
                for eid2, b2, e2 in _ebml_walk(data, b, e, counter):
                    if eid2 == _ID_PIXEL_W:
                        dims_w = _ebml_uint(data, b2, e2)
                    elif eid2 == _ID_PIXEL_H:
                        dims_h = _ebml_uint(data, b2, e2)
                info["dims"] = (dims_w, dims_h)
            elif eid == _ID_AUDIO:
                for eid2, b2, e2 in _ebml_walk(data, b, e, counter):
                    if eid2 == _ID_SAMPLING_FREQ:
                        f = _ebml_float(data, b2, e2)
                        if not (0 < f < 2**31):
                            raise VideoDecodeError("SamplingFrequency out of range")
                        info["freq"] = int(f)
                    elif eid2 == _ID_CHANNELS:
                        info["chans"] = _ebml_uint(data, b2, e2)
        entries.append(info)

    for eid, body, body_end in _ebml_walk(data, 0, len(data), counter):
        if eid == 0x1A45DFA3:  # EBML header
            for eid2, b, e in _ebml_walk(data, body, body_end, counter):
                if eid2 == _ID_DOCTYPE:
                    try:
                        out["format"] = data[b:e].rstrip(b"\x00").decode("ascii")
                    except UnicodeDecodeError as exc:
                        raise VideoDecodeError("non-ASCII DocType") from exc
        elif eid == _ID_SEGMENT:
            for eid2, b, e in _ebml_walk(data, body, body_end, counter):
                if eid2 == _ID_INFO:
                    for eid3, b3, e3 in _ebml_walk(data, b, e, counter):
                        if eid3 == _ID_TS_SCALE:
                            ts_scale = _ebml_uint(data, b3, e3)
                            if ts_scale == 0:
                                raise VideoDecodeError("zero TimestampScale")
                        elif eid3 == _ID_DURATION:
                            duration_units = _ebml_float(data, b3, e3)
                elif eid2 == _ID_TRACKS:
                    for eid3, b3, e3 in _ebml_walk(data, b, e, counter):
                        if eid3 == _ID_TRACK_ENTRY:
                            walk_track_entry(b3, e3)
                elif eid2 == _ID_CLUSTER:
                    out["payload_spans"].append((b, e))
    if duration_units is not None:
        if not (duration_units >= 0 and duration_units < 2**53):
            raise VideoDecodeError("Duration out of range")
        out["duration_ms"] = int(duration_units * ts_scale / 1_000_000)
    # first-video-track wins dims/codec/frame-count; the first AUDIO
    # track's rate/channels report regardless of mux order (r13,
    # advisor catch — the old pick-loop only surfaced them when the
    # audio TrackEntry came first); codec falls back to the first track
    # when no track declares type video
    video = next((t for t in entries if t["type"] == 1), None)
    audio = next((t for t in entries if t["type"] == 2), None)
    pick = video or (entries[0] if entries else None)
    if pick is not None:
        out["codec"] = pick["codec"]
    if audio is not None:
        out["sample_rate"], out["channels"] = audio["freq"], audio["chans"]
    if video is not None:
        out["has_video"] = True
        out["width"], out["height"] = video["dims"]
        if video["num"] is not None:
            # REAL frame count: header-hop the cluster blocks of the
            # video track (lacing-aware, content never read); None past
            # the block-walk budget or when no block was found
            frames = _count_track_frames(data, out["payload_spans"],
                                         video["num"])
            out["n_frames"] = frames if frames else None
    return out


def _ebml_id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size_bytes(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved (unknown)
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError(f"EBML size {n} too large")


def _ebml(eid: int, body: bytes) -> bytes:
    return _ebml_id_bytes(eid) + _ebml_size_bytes(len(body)) + body


def encode_webm(
    width: int,
    height: int,
    duration_ms: int,
    payload: bytes = b"",
    codec: str = "V_VP9",
    doctype: str = "webm",
    track: str = "video",
    channels: int = 2,
    sample_rate_hz: int = 48000,
    n_frames: int = 1,
    with_audio: bool = False,
    audio_first: bool = False,
    audio_codec: str = "A_OPUS",
    streamed: bool = False,
) -> bytes:
    """Minimal conformant Matroska/WebM file for fixtures: EBML header
    (DocType), Segment(Info(TimestampScale=10^6, Duration float8),
    Tracks(video TrackEntry with dims + CodecID), one Cluster whose body
    is ``Timestamp 0`` + a track-1 SimpleBlock carrying ``payload``).

    ``with_audio`` adds a second, audio TrackEntry (TrackNumber 2,
    ``audio_codec``/``channels``/``sample_rate_hz``); ``audio_first``
    writes it BEFORE the video entry so both mux orders are pinnable
    (r13). ``streamed`` writes the live/streamed shape: the first
    Cluster declares the UNKNOWN (all-ones) size — legal per RFC 8794
    §6.2 — and the frames split across TWO clusters, so the later
    cluster nests inside the first's span and the block walk must
    recurse (r12 advisor catch). Trusted-but-validated inputs, the
    family's encoder contract."""
    if width <= 0 or height <= 0:
        raise ValueError(f"dims {width}x{height} must be positive")
    if duration_ms < 0:
        raise ValueError("negative duration")
    if with_audio and track != "video":
        raise ValueError("with_audio adds an audio entry to a video file")
    header = _ebml(0x1A45DFA3, b"".join([
        _ebml(0x4286, b"\x01"),          # EBMLVersion
        _ebml(0x42F7, b"\x01"),          # EBMLReadVersion
        _ebml(0x42F2, b"\x04"),          # EBMLMaxIDLength
        _ebml(0x42F3, b"\x08"),          # EBMLMaxSizeLength
        _ebml(_ID_DOCTYPE, doctype.encode("ascii")),
        _ebml(0x4287, b"\x04"),          # DocTypeVersion
        _ebml(0x4285, b"\x02"),          # DocTypeReadVersion
    ]))
    info = _ebml(_ID_INFO, b"".join([
        _ebml(_ID_TS_SCALE, (1_000_000).to_bytes(3, "big")),
        _ebml(_ID_DURATION, struct.pack(">d", float(duration_ms))),
    ]))
    if track not in ("video", "audio"):
        raise ValueError(f"track must be 'video'|'audio', got {track!r}")
    if track == "video":
        media = _ebml(_ID_VIDEO, b"".join([
            _ebml(_ID_PIXEL_W, width.to_bytes(2, "big")),
            _ebml(_ID_PIXEL_H, height.to_bytes(2, "big")),
        ]))
        ttype = b"\x01"
    else:
        if not (0 < channels < 256 and 0 < sample_rate_hz < 2**31):
            raise ValueError("channels/sample_rate_hz out of range")
        media = _ebml(_ID_AUDIO, b"".join([
            _ebml(_ID_SAMPLING_FREQ, struct.pack(">d", float(sample_rate_hz))),
            _ebml(_ID_CHANNELS, bytes([channels])),
        ]))
        ttype = b"\x02"
    def build_entry(num: int, ttype_b: bytes, codec_str: str,
                    media_b: bytes) -> bytes:
        return _ebml(_ID_TRACK_ENTRY, b"".join([
            _ebml(0xD7, bytes([num])),       # TrackNumber
            _ebml(0x73C5, bytes([num])),     # TrackUID
            _ebml(_ID_TRACK_TYPE, ttype_b),
            _ebml(_ID_CODEC_ID, codec_str.encode("ascii")),
            media_b,
        ]))

    entry = build_entry(1, ttype, codec, media)
    if with_audio:
        if not (0 < channels < 256 and 0 < sample_rate_hz < 2**31):
            raise ValueError("channels/sample_rate_hz out of range")
        audio_media = _ebml(_ID_AUDIO, b"".join([
            _ebml(_ID_SAMPLING_FREQ, struct.pack(">d", float(sample_rate_hz))),
            _ebml(_ID_CHANNELS, bytes([channels])),
        ]))
        audio_entry = build_entry(2, b"\x02", audio_codec, audio_media)
        entry = audio_entry + entry if audio_first else entry + audio_entry
    tracks = _ebml(_ID_TRACKS, entry)
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    # SimpleBlock: track varint (0x81 = track 1) + i16 ts + flags; the
    # payload rides the first block, further frames are empty blocks so
    # the Cluster bytes stay SQL-restatable (constant framing hex)
    block = _ebml(0xA3, b"\x81\x00\x00\x00" + payload)
    extra_one = _ebml(0xA3, b"\x81\x00\x00\x00")
    if streamed:
        # live shape: cluster 1 carries the payload block + half the
        # extras under an UNKNOWN (all-ones) size, cluster 2 the rest —
        # cluster 2's framing sits INSIDE cluster 1's declared span
        half = (n_frames - 1) // 2
        body1 = _ebml(0xE7, b"\x00") + block + extra_one * half
        body2 = _ebml(0xE7, b"\x01") + extra_one * (n_frames - 1 - half)
        cluster = (_ebml_id_bytes(_ID_CLUSTER) + b"\xff" + body1
                   + _ebml(_ID_CLUSTER, body2))
    else:
        extra = extra_one * (n_frames - 1)
        cluster = _ebml(_ID_CLUSTER, _ebml(0xE7, b"\x00") + block + extra)
    segment = _ebml(_ID_SEGMENT, info + tracks + cluster)
    return header + segment


def media_payload(data: bytes, meta: dict) -> bytes:
    """Container-appropriate payload bytes for content-addressing:
    ``mdat`` payload for ISO-BMFF (:func:`mdat_payload`), raw Cluster
    bodies for Matroska."""
    spans = meta.get("mdat_spans", meta.get("payload_spans", []))
    return b"".join(data[s:e] for s, e in spans)


# re-exported so multimodal's catch-list stays one import wide
__all__ = [
    "AudioDecodeError",
    "VideoDecodeError",
    "EbmlBudgetExceeded",
    "sniff_mp4",
    "parse_mp4",
    "encode_mp4",
    "mdat_payload",
    "sniff_heif",
    "parse_heif",
    "encode_heif",
    "sniff_webm",
    "parse_webm",
    "encode_webm",
    "media_payload",
]
