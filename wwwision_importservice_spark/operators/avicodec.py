"""Pure-stdlib AVI (RIFF) container METADATA codec: chunk/LIST walk +
``avih``/``strh``/``strf`` header arithmetic, no frame decode.

The r14 misrouting sweep's second lane (after TIFF; VERDICT r13 ask
#7): legacy AVI is still a large slice of archived/long-tail video
crawls, and ``media_metadata`` routed every AVI blob to
``kind='unknown'`` (the ISO-BMFF/Matroska walkers don't match RIFF).
Frame decode stays out of scope by the family rule; the container is
exact no-decode arithmetic (the public AVI RIFF File Reference /
OpenDML spec):

- RIFF framing: ``RIFF`` + u32le size + ``AVI ``, then fourcc+size
  chunks with odd-size padding; containers are ``LIST`` chunks whose
  body leads with a list type (``hdrl``, ``strl``, ``movi``).
- ``avih`` (MainAVIHeader, 56 bytes): µs-per-frame, total frames,
  stream count, canvas width/height.
- per-stream ``strl`` → ``strh`` (AVIStreamHeader, 56 bytes):
  ``fccType`` (``vids``/``auds``), ``fccHandler`` (the codec fourcc),
  scale/rate/length; ``strf``: BITMAPINFOHEADER for video,
  WAVEFORMATEX (``nChannels``, ``nSamplesPerSec``) for audio.
- ``movi``: the payload — ``##dc``/``##db`` video and ``##wb`` audio
  chunks, where ``##`` is the two-digit stream index.

The content address is **demux-invariant**: each stream's chunk bodies
are concatenated in file order, streams concatenated in stream-index
order — so the same A/V re-interleaved (different chunking
granularity, different interleave ratio, an added ``idx1`` index or
``JUNK`` padding) hashes identically, the ``oggcodec`` packet-
concatenation convention applied per stream.

Threat model, the family contract: header fields are UNTRUSTED —
malformed constructs raise :class:`AviDecodeError` (a
``VideoDecodeError``, so ``_media_row``'s quarantine catch-list needs
no new type); the chunk walk is bomb-capped (:data:`MAX_AVI_CHUNKS`)
and every declared size is validated before use. Mutation-fuzz pinned
in ``tests/test_avicodec.py``.

Reference parallel: none (``Classes/`` is records-in/records-out);
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.videocodec import VideoDecodeError


class AviDecodeError(VideoDecodeError):
    """Malformed/hostile AVI input (typed, family contract)."""


#: chunk-walk bomb cap across the whole file (each chunk consumes ≥8
#: bytes so the walk is linear; the cap bounds zero-size pathologies)
MAX_AVI_CHUNKS = 1 << 18


def sniff_avi(data: bytes) -> bool:
    """AVI magic: ``RIFF`` + the ``AVI `` form type — disjoint from
    WAV (``WAVE``) and WebP (``WEBP``) by the form fourcc."""
    return (
        len(data) >= 16
        and data[:4] == b"RIFF"
        and data[8:12] == b"AVI "
        and struct.unpack_from("<I", data, 4)[0] >= 4
    )


def _chunks(data: bytes, start: int, end: int, counter: list[int]):
    """Yield ``(fourcc, body_start, body_end)`` for the RIFF chunks in
    ``[start, end)``, honoring odd-size padding. Truncated trailing
    bytes end the walk (crawl posture — the callers decide whether a
    missing mandatory header is an error)."""
    pos = start
    while pos + 8 <= end:
        counter[0] += 1
        if counter[0] > MAX_AVI_CHUNKS:
            raise AviDecodeError(f"more than {MAX_AVI_CHUNKS} RIFF chunks")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            if fourcc == b"LIST":
                # a truncated container still yields its intact leading
                # children (a cut-off movi keeps its complete frames) —
                # the leaf-chunk case below just ends the walk
                yield fourcc, body, end
            break  # truncated tail: stop, like the WebP/Ogg walks
        yield fourcc, body, body + size
        pos = body + size + (size & 1)


def parse_avi(data: bytes) -> dict:
    """AVI bytes → metadata dict (the ``parse_mp4`` convention):

    ``{"format": "avi", "has_video": bool, "width": int|None,
    "height": int|None, "n_frames": int|None, "duration_ms":
    int|None, "codec": str|None, "sample_rate": int|None,
    "channels": int|None, "payload_regions": [(start, end), ...]}``

    Canvas dims and total frames come from ``avih``; ``duration_ms`` =
    ``total_frames * µs_per_frame // 1000`` (integer, the container's
    own timing contract); ``codec`` is the first ``vids`` stream's
    ``fccHandler`` fourcc, lowercased and stripped (``None`` when the
    handler field is zero — honest over guessed);
    ``sample_rate``/``channels`` come from the first ``auds`` stream's
    WAVEFORMATEX. ``payload_regions`` lists each stream's ``movi``
    chunk bodies grouped by stream index (stream order, then file
    order) — the demux-invariant address :func:`media_payload`
    concatenates."""
    if not sniff_avi(data):
        raise AviDecodeError("no RIFF/AVI magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    counter = [0]
    out: dict = {
        "format": "avi", "has_video": False, "width": None,
        "height": None, "n_frames": None, "duration_ms": None,
        "codec": None, "sample_rate": None, "channels": None,
        "payload_regions": [],
    }
    stream_types: list[bytes] = []  # fccType per stream index
    per_stream: dict[int, list[tuple[int, int]]] = {}
    saw_avih = saw_movi = False

    def walk_strl(body: int, bend: int) -> None:
        fcc_type = fcc_handler = None
        for fourcc, s, e in _chunks(data, body, bend, counter):
            if fourcc == b"strh":
                if e - s < 56:
                    raise AviDecodeError("strh shorter than 56 bytes")
                fcc_type = data[s : s + 4]
                fcc_handler = data[s + 4 : s + 8]
            elif fourcc == b"strf" and fcc_type == b"auds":
                if e - s < 16:
                    raise AviDecodeError("auds strf shorter than "
                                         "WAVEFORMATEX core")
                channels, rate = struct.unpack_from("<HI", data, s + 2)
                if out["sample_rate"] is None:
                    if rate < 1 or channels < 1:
                        raise AviDecodeError("auds strf declares zero "
                                             "rate/channels")
                    out["sample_rate"], out["channels"] = rate, channels
        if fcc_type is None:
            raise AviDecodeError("strl LIST without a strh header")
        stream_types.append(fcc_type)
        if fcc_type == b"vids":
            out["has_video"] = True
            if out["codec"] is None and fcc_handler not in (None, b"\x00" * 4):
                out["codec"] = (
                    fcc_handler.decode("ascii", "replace").strip().lower()
                    or None
                )

    def walk_list(body: int, bend: int) -> None:
        nonlocal saw_avih, saw_movi
        if bend - body < 4:
            return
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for fourcc, s, e in _chunks(data, body + 4, bend, counter):
                if fourcc == b"avih":
                    if e - s < 56:
                        raise AviDecodeError("avih shorter than 56 bytes")
                    (usf,) = struct.unpack_from("<I", data, s)
                    frames, _initial, _streams = struct.unpack_from(
                        "<III", data, s + 16
                    )
                    w, h = struct.unpack_from("<II", data, s + 32)
                    if w < 1 or h < 1:
                        raise AviDecodeError("avih declares zero canvas")
                    out["width"], out["height"] = w, h
                    out["n_frames"] = frames
                    if usf:
                        out["duration_ms"] = frames * usf // 1000
                    saw_avih = True
                elif fourcc == b"LIST" and data[s : s + 4] == b"strl":
                    walk_strl(s + 4, e)
        elif ltype == b"movi":
            saw_movi = True
            for fourcc, s, e in _chunks(data, body + 4, bend, counter):
                if fourcc == b"LIST":
                    # OpenDML 'rec ' interleave groups: recurse one level
                    for f2, s2, e2 in _chunks(data, s + 4, e, counter):
                        _movi_chunk(f2, s2, e2)
                else:
                    _movi_chunk(fourcc, s, e)

    def _movi_chunk(fourcc: bytes, s: int, e: int) -> None:
        # data chunks are '##dc'/'##db'/'##wb'/'##pc' with a 2-digit
        # stream index; anything else (ix##, JUNK) is not payload
        if (len(fourcc) == 4 and fourcc[:2].isdigit()
                and fourcc[2:] in (b"dc", b"db", b"wb", b"pc")):
            per_stream.setdefault(int(fourcc[:2]), []).append((s, e))

    for fourcc, body, bend in _chunks(data, 12, end, counter):
        if fourcc == b"LIST":
            walk_list(body, bend)
    if not saw_avih:
        raise AviDecodeError("no avih main header (hdrl missing)")
    if not saw_movi:
        raise AviDecodeError("no movi payload LIST")
    # demux-invariant region order: stream index, then file order
    for sid in sorted(per_stream):
        out["payload_regions"].extend(per_stream[sid])
    return out


def media_payload(data: bytes, meta: dict) -> bytes:
    """Concatenated movi chunk bodies, grouped per stream in stream-
    index order — the demux-invariant content address (the same A/V
    re-interleaved, re-chunked, re-indexed, or JUNK-padded hashes
    identically)."""
    return b"".join(data[s:e] for s, e in meta["payload_regions"])


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(
    width: int,
    height: int,
    n_frames: int,
    us_per_frame: int,
    video_payload: bytes = b"",
    codec: str = "MJPG",
    audio_payload: bytes | None = None,
    sample_rate: int = 8000,
    channels: int = 1,
    interleave: int = 0,
    audio_chunks: int = 1,
    junk: bool = False,
    with_idx1: bool = False,
) -> bytes:
    """Minimal conformant AVI for the fixture/oracle playbook: real
    RIFF/avih/strh/strf arithmetic with the caller's payload bytes
    carried verbatim in ``movi`` chunks (the parser never decodes
    frames — the ``encode_mp4`` mdat posture). ``video_payload`` is
    split evenly into ``n_frames`` ``00dc`` chunks (remainder to the
    last); ``audio_payload`` (when given) adds an ``auds`` stream
    split into ``audio_chunks`` ``01wb`` chunks; ``interleave`` > 0
    interleaves one audio chunk after every that-many video chunks
    (else audio trails) — the demux-invariant address must not move
    under any of it; ``junk``/``with_idx1`` add a JUNK pad and an
    idx1 index, both outside the hash. Trusted-but-validated
    inputs."""
    if width < 1 or height < 1 or n_frames < 1 or us_per_frame < 1:
        raise ValueError("dims, n_frames, us_per_frame must be >= 1")
    if len(codec) != 4:
        raise ValueError("codec must be a 4-char fourcc")
    if audio_payload is not None and (sample_rate < 1 or channels < 1
                                      or audio_chunks < 1):
        raise ValueError("sample_rate/channels/audio_chunks must be >= 1")

    def strh(fcc_type: bytes, handler: bytes, scale: int, rate: int,
             length: int) -> bytes:
        # AVIStreamHeader, 56 bytes: fccType, fccHandler, dwFlags,
        # wPriority, wLanguage, dwInitialFrames, dwScale, dwRate,
        # dwStart, dwLength, dwSuggestedBufferSize, dwQuality (-1 =
        # default), dwSampleSize, rcFrame[4]
        return _chunk(b"strh", struct.pack(
            "<4s4sIHHIIIIIIiI4H",
            fcc_type, handler, 0, 0, 0, 0, scale, rate, 0, length,
            0, -1, 0, 0, 0, 0, 0,
        ))

    streams = b""
    # video strl: BITMAPINFOHEADER strf
    strf_v = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24,
        codec.encode("ascii"), 0, 0, 0, 0, 0,
    ))
    streams += _list(b"strl", strh(
        b"vids", codec.encode("ascii"), us_per_frame, 1_000_000, n_frames
    ) + strf_v)
    n_streams = 1
    if audio_payload is not None:
        strf_a = _chunk(b"strf", struct.pack(
            "<HHIIHH", 1, channels, sample_rate,
            sample_rate * channels * 2, channels * 2, 16,
        ))
        streams += _list(b"strl", strh(
            b"auds", b"\x00" * 4, 1, sample_rate, len(audio_payload) // 2
        ) + strf_a)
        n_streams += 1

    avih = _chunk(b"avih", struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, n_frames, 0, n_streams, 0,
        width, height, 0, 0, 0, 0,
    ))
    hdrl = _list(b"hdrl", avih + streams)

    per = len(video_payload) // n_frames
    vchunks = [
        video_payload[i * per : (i + 1) * per] if i < n_frames - 1
        else video_payload[i * per :]
        for i in range(n_frames)
    ]
    achunks: list[bytes] = []
    if audio_payload is not None:
        aper = len(audio_payload) // audio_chunks
        achunks = [
            audio_payload[i * aper : (i + 1) * aper]
            if i < audio_chunks - 1 else audio_payload[i * aper :]
            for i in range(audio_chunks)
        ]
    movi_body = b""
    if interleave > 0 and achunks:
        ai = 0
        for i, vc in enumerate(vchunks):
            movi_body += _chunk(b"00dc", vc)
            if (i + 1) % interleave == 0 and ai < len(achunks):
                movi_body += _chunk(b"01wb", achunks[ai])
                ai += 1
        for rest in achunks[ai:]:
            movi_body += _chunk(b"01wb", rest)
    else:
        for vc in vchunks:
            movi_body += _chunk(b"00dc", vc)
        for ac in achunks:
            movi_body += _chunk(b"01wb", ac)
    movi = _list(b"movi", movi_body)

    parts = hdrl
    if junk:
        parts += _chunk(b"JUNK", b"\x00" * 18)
    parts += movi
    if with_idx1:
        # one idx1 entry per movi data chunk (fourcc, flags, offset,
        # size) — index content is outside the content address
        entries = b""
        pos = 4  # offsets are movi-body-relative per the spec
        for fcc, body in (
            [(b"00dc", c) for c in vchunks] + [(b"01wb", c) for c in achunks]
        ):
            entries += struct.pack("<4sIII", fcc, 0x10, pos, len(body))
            pos += 8 + len(body) + (len(body) & 1)
        parts += _chunk(b"idx1", entries)
    riff = b"AVI " + parts
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


__all__ = [
    "MAX_AVI_CHUNKS",
    "AviDecodeError",
    "encode_avi",
    "media_payload",
    "parse_avi",
    "sniff_avi",
]
