"""Pure-stdlib/NumPy WAV (RIFF PCM) codec — real audio decode in-sandbox.

The audio twin of :mod:`~wwwision_importservice_spark.operators.
imagecodec` (VERDICT r8 ask #3 carried to the audio path): canonical
RIFF/WAVE with 16-bit PCM needs nothing beyond ``struct`` + numpy, so
the X4 audio lane gets a REAL decoder instead of treating sample-rate
as caller-supplied metadata. ``decode_wav`` walks the chunk list
(tolerating extra chunks like LIST/fact, and fmt extensions), returns
``((n_frames, channels) int16, sample_rate)``; ``encode_wav`` emits the
minimal 44-byte-header canonical file.

FLAC (lossless compression) is real since r11 — see
:mod:`~wwwision_importservice_spark.operators.flaccodec`. Perceptual
codecs (MP3/AAC) stay out of scope: their decode is bit-inexact across
implementations (no byte-exact oracle is possible) and genuinely needs
third-party libraries; such payloads fall to the callers' fake/strict
policy exactly like non-BMP/PPM/PNG/GIF/JPEG images.

Layout follows the public RIFF/WAVE spec (format tag 1 = PCM, 3 =
IEEE float rejected loudly). Little-endian throughout, like the spec.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    """Malformed or unsupported audio bytes."""


def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """``(n,)`` or ``(n, channels)`` int16 → canonical 44-byte-header
    PCM WAV bytes (interleaved frames, little-endian)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise ValueError(f"expected (n,) or (n, ch) int16, got {arr.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # row-major == interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → ``((n_frames, channels) int16, sample_rate)``.

    Chunk-walks the RIFF body: unknown chunks (LIST, fact, cue) are
    skipped per spec (chunks are word-aligned — odd sizes carry a pad
    byte), oversized ``data`` declarations are clamped to the bytes
    actually present (files truncated in flight still decode their
    prefix deterministically rather than erroring — the manifest/hash
    layer is where truncation must be CAUGHT, not the decoder)."""
    if not sniff_wav(data) or len(data) < 12:
        raise AudioDecodeError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise AudioDecodeError(f"fmt chunk too short ({len(body)})")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
            break  # fmt must precede data per spec; nothing else needed
    if fmt is None or pcm is None:
        raise AudioDecodeError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise AudioDecodeError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only 16-bit PCM is supported"
        )
    if ch < 1:
        raise AudioDecodeError("zero channels")
    if sample_rate < 1:
        # a declared rate of 0 would turn every downstream duration
        # computation into a ZeroDivisionError — fail as a decode error
        raise AudioDecodeError(f"bad sample rate {sample_rate}")
    frame = ch * 2
    usable = len(pcm) - len(pcm) % frame
    arr = np.frombuffer(pcm, dtype="<i2", count=usable // 2).reshape(-1, ch)
    return arr.copy(), sample_rate
