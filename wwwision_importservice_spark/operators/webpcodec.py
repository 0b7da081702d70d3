"""Pure-stdlib WebP container METADATA codec: RIFF chunk walk + codec
frame headers, no pixel decode.

The r13 misrouting sweep's third find (after MP3/ADTS→unknown and
AVIF/HEIC→audio): WebP is the most common modern web image format and
``media_metadata`` routed every WebP blob to ``kind='unknown'`` (the
pure image codecs decode BMP/PPM/PNG/GIF/JPEG; WebP fell through to
the Pillow-or-fake path). Full VP8/VP8L *pixel* decode stays out of
scope by the family rule (no bit-exact cross-decoder oracle), but the
headers are EXACT arithmetic (RFC 9649):

- RIFF framing: ``RIFF`` + u32le size + ``WEBP``, then fourcc+u32le
  chunks, odd sizes padded (§2.3).
- ``VP8 `` (lossy): 3-byte frame tag (keyframe bit, version,
  first-partition size), the 0x9D012A start code, then 14-bit
  width/height in two u16le fields (§2.5 / RFC 6386 §9.1).
- ``VP8L`` (lossless): 0x2F signature then width-1/height-1 as two
  14-bit fields packed LSB-first with the alpha bit and a 3-bit
  version that must be 0 (§2.6).
- ``VP8X`` (extended): a flags byte (animation = 0x02, alpha = 0x10)
  and the canvas as 24-bit little-endian minus-one fields (§2.7);
  animated files carry one ``ANMF`` chunk per frame (§2.7.2), so the
  frame count is a chunk count — no bitstream read.

The content address is the concatenated CODED payload bytes (VP8/VP8L
bitstream, ANMF frame data) — the same image re-containerized (e.g.
wrapped in VP8X with new metadata chunks) hashes identically, the
``videocodec.mdat_payload``/``oggcodec`` convention.

Threat model, the family contract: header fields are UNTRUSTED —
malformed constructs raise :class:`WebpDecodeError` (an
``ImageDecodeError``, so ``_media_row``'s quarantine catch-list needs
no new type); the chunk walk is bomb-capped (:data:`MAX_WEBP_CHUNKS`)
and every declared size is validated before use. Mutation-fuzz pinned
in ``tests/test_webpcodec.py``.

Reference parallel: none (``Classes/`` is records-in/records-out);
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.imagecodec import ImageDecodeError


class WebpDecodeError(ImageDecodeError):
    """Malformed/hostile WebP input (typed, family contract)."""


#: chunk-walk bomb cap (each chunk consumes ≥8 bytes, so the walk is
#: already linear in the file; the cap bounds pathological zero-size
#: loops the size validation would otherwise have to prove impossible)
MAX_WEBP_CHUNKS = 1 << 16

_VP8_START_CODE = b"\x9d\x01\x2a"


def sniff_webp(data: bytes) -> bool:
    """WebP magic: ``RIFF`` + ``WEBP`` with a self-consistent RIFF
    size. Disjoint from WAV by the form fourcc (``WAVE`` vs
    ``WEBP``)."""
    return (
        len(data) >= 16
        and data[:4] == b"RIFF"
        and data[8:12] == b"WEBP"
        and struct.unpack_from("<I", data, 4)[0] >= 4
    )


def _chunks(data: bytes):
    """Yield ``(fourcc, body_start, body_end)`` for the RIFF chunks,
    validating declared sizes against the buffer and honoring the
    odd-size pad byte (RFC 9649 §2.3). The walk ends at the declared
    RIFF size or the buffer end, whichever is first — truncated crawl
    bytes end the walk (the callers decide whether a missing mandatory
    chunk is an error)."""
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    pos, count = 12, 0
    while pos + 8 <= end:
        count += 1
        if count > MAX_WEBP_CHUNKS:
            raise WebpDecodeError(f"more than {MAX_WEBP_CHUNKS} RIFF chunks")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise WebpDecodeError(
                f"chunk {fourcc!r} declares size past the RIFF payload"
            )
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # odd sizes are padded


def _vp8_dims(data: bytes, start: int, end: int) -> tuple[int, int]:
    """Width/height from a lossy VP8 keyframe header (RFC 6386 §9.1):
    3-byte frame tag, 3-byte start code, two u16le fields whose low 14
    bits are the dims (the top 2 bits are upscaling hints)."""
    if end - start < 10:
        raise WebpDecodeError("truncated VP8 chunk")
    tag = data[start] | data[start + 1] << 8 | data[start + 2] << 16
    if tag & 1:
        raise WebpDecodeError("VP8 chunk is not a keyframe (interframe tag)")
    if data[start + 3 : start + 6] != _VP8_START_CODE:
        raise WebpDecodeError("bad VP8 start code")
    w, h = struct.unpack_from("<HH", data, start + 6)
    return (w & 0x3FFF, h & 0x3FFF)


def _vp8l_dims(data: bytes, start: int, end: int) -> tuple[int, int, bool]:
    """Width/height/alpha from a lossless VP8L header (RFC 9649 §2.6):
    0x2F signature, then 14+14+1+3 bits packed LSB-first."""
    if end - start < 5:
        raise WebpDecodeError("truncated VP8L chunk")
    if data[start] != 0x2F:
        raise WebpDecodeError("bad VP8L signature byte")
    (packed,) = struct.unpack_from("<I", data, start + 1)
    if packed >> 29:
        raise WebpDecodeError(f"VP8L version {packed >> 29} (must be 0)")
    return (
        (packed & 0x3FFF) + 1,
        ((packed >> 14) & 0x3FFF) + 1,
        bool((packed >> 28) & 1),
    )


def parse_webp(data: bytes) -> dict:
    """WebP bytes → metadata dict:

    ``{"format": "webp", "codec": "vp8"|"vp8l"|None, "width":
    int|None, "height": int|None, "alpha": bool, "animated": bool,
    "n_frames": int|None, "payload_regions": [(start, end), ...]}``

    Simple files report the VP8/VP8L frame dims; extended (VP8X) files
    report the canvas dims and the feature flags, with ``n_frames`` =
    the ANMF chunk count for animations (still-with-metadata files
    keep n_frames=1 from their single image chunk). ``codec`` is the
    first image bitstream's flavor (an animation mixing lossy and
    lossless frames reports the first frame's; None for a VP8X shell
    whose frames are all in unparsed formats — honest over guessed).
    ``payload_regions`` are the coded-bitstream byte ranges (VP8/VP8L
    bodies, ANMF frame data past the 16-byte frame header) for
    :func:`media_payload`'s re-containerization-invariant address."""
    if not sniff_webp(data):
        raise WebpDecodeError("no RIFF/WEBP magic")
    out: dict = {
        "format": "webp", "codec": None, "width": None, "height": None,
        "alpha": False, "animated": False, "n_frames": None,
        "payload_regions": [],
    }
    dims_set = False  # VP8X canvas dims win over per-frame dims
    anmf_frames = 0
    for fourcc, body, body_end in _chunks(data):
        if fourcc == b"VP8 ":
            if not dims_set:
                out["width"], out["height"] = _vp8_dims(data, body, body_end)
                dims_set = True
            if out["codec"] is None:
                out["codec"] = "vp8"
            out["payload_regions"].append((body, body_end))
        elif fourcc == b"VP8L":
            w, h, alpha = _vp8l_dims(data, body, body_end)
            if not dims_set:
                out["width"], out["height"] = w, h
                dims_set = True
            out["alpha"] = out["alpha"] or alpha
            if out["codec"] is None:
                out["codec"] = "vp8l"
            out["payload_regions"].append((body, body_end))
        elif fourcc == b"VP8X":
            if body_end - body < 10:
                raise WebpDecodeError("truncated VP8X chunk")
            flags = data[body]
            out["alpha"] = bool(flags & 0x10)
            out["animated"] = bool(flags & 0x02)
            out["width"] = 1 + int.from_bytes(data[body + 4 : body + 7], "little")
            out["height"] = 1 + int.from_bytes(data[body + 7 : body + 10], "little")
            dims_set = True
        elif fourcc == b"ANMF":
            # frame header: 16 bytes (frame x/y/w/h minus-one, duration,
            # blend/dispose flags), then the frame's image chunks
            if body_end - body < 16:
                raise WebpDecodeError("truncated ANMF chunk")
            anmf_frames += 1
            if out["codec"] is None and body_end - body > 24:
                sub = data[body + 16 : body + 20]
                if sub == b"VP8 ":
                    out["codec"] = "vp8"
                elif sub == b"VP8L":
                    out["codec"] = "vp8l"
            out["payload_regions"].append((body + 16, body_end))
    if out["width"] is None:
        raise WebpDecodeError("no image chunk (VP8/VP8L/VP8X) in WebP")
    out["n_frames"] = anmf_frames if out["animated"] else (
        1 if out["payload_regions"] else None
    )
    return out


def media_payload(data: bytes, meta: dict) -> bytes:
    """Concatenated coded-bitstream bytes — the re-containerization-
    invariant content address (same image wrapped in a VP8X shell with
    new metadata chunks hashes identically)."""
    return b"".join(data[s:e] for s, e in meta["payload_regions"])


def encode_webp(
    width: int,
    height: int,
    codec: str = "vp8l",
    payload: bytes = b"",
    alpha: bool = False,
    extended: bool = False,
    anim_frames: int | None = None,
    frame_ms: int = 40,
) -> bytes:
    """Minimal conformant WebP for the fixture/oracle playbook: a RIFF
    container whose VP8/VP8L header arithmetic is real (start codes,
    14-bit dims, LSB-packed VP8L fields) and whose entropy-coded
    remainder is the caller's ``payload`` verbatim — the parser never
    reads past the header, the ``encode_mp4`` mdat posture.
    ``extended`` wraps in a VP8X shell (re-containerization under the
    oracle hash); ``anim_frames`` builds an animation with that many
    identical ANMF frames. Trusted-but-validated inputs."""
    if codec not in ("vp8", "vp8l"):
        raise ValueError(f"codec must be 'vp8'|'vp8l', got {codec!r}")
    # VP8 stores the dims raw in 14 bits (max 16383); VP8L stores
    # value-1 (max 16384)
    cap = 0x4000 if codec == "vp8l" else 0x3FFF
    if not 0 < width <= cap or not 0 < height <= cap:
        raise ValueError(f"dims must be 1..{cap} (14-bit fields)")
    if anim_frames is not None and anim_frames < 1:
        raise ValueError("anim_frames must be >= 1")
    if alpha and codec == "vp8":
        raise ValueError("alpha rides the VP8L header (or an ALPH chunk, "
                         "not emitted); use codec='vp8l'")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    if codec == "vp8":
        # keyframe tag: show_frame bit + a first-partition size that
        # covers the payload (19-bit field, bits 5..23)
        part = min(len(payload), (1 << 19) - 1)
        tag = (part << 5) | 0x10
        body = (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
                + _VP8_START_CODE
                + struct.pack("<HH", width, height) + payload)
        image = chunk(b"VP8 ", body)
    else:
        packed = (width - 1) | (height - 1) << 14 | (1 << 28 if alpha else 0)
        image = chunk(b"VP8L", b"\x2f" + struct.pack("<I", packed) + payload)

    if anim_frames is not None:
        extended = True
    chunks = b""
    if extended:
        flags = (0x10 if alpha else 0) | (0x02 if anim_frames else 0)
        vp8x = chunk(
            b"VP8X",
            bytes([flags, 0, 0, 0])
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little"),
        )
        chunks += vp8x
        if anim_frames:
            # RFC 9649 §2.5.2: background color u32 + loop count u16 —
            # 6 bytes, not 8 (r13 advisor catch; own parser skips ANIM
            # so only external decoders would have noticed)
            chunks += chunk(b"ANIM", struct.pack("<IH", 0, 0))
            frame_hdr = (
                (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little")
                + frame_ms.to_bytes(3, "little") + bytes([0])
            )
            chunks += chunk(b"ANMF", frame_hdr + image) * anim_frames
        else:
            chunks += image
    else:
        chunks = image
    riff = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


__all__ = [
    "ImageDecodeError",
    "WebpDecodeError",
    "MAX_WEBP_CHUNKS",
    "sniff_webp",
    "parse_webp",
    "media_payload",
    "encode_webp",
]
