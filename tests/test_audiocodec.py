"""WAV codec tests: byte-level header pin (encoder and decoder can't be
wrong together), mono/stereo round-trips, chunk-walking past LIST/fact,
odd-size chunk padding, truncation clamping, and loud unsupported-format
errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wwwision_importservice_spark.operators.audiocodec import (
    AudioDecodeError,
    decode_wav,
    encode_wav,
    sniff_wav,
)


def sig(n, ch=1, seed=3):
    rng = np.random.RandomState(seed)
    a = rng.randint(-32768, 32768, size=(n, ch), dtype=np.int64)
    return a.astype(np.int16)


def test_wav_layout_pinned_bytes():
    """3 mono frames at 8 kHz against the hand-computed RIFF layout."""
    samples = np.array([1, -2, 300], dtype=np.int16)
    data = encode_wav(samples, 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    assert data[12:16] == b"fmt " and struct.unpack_from("<I", data, 16)[0] == 16
    # PCM(1), mono, 8000 Hz, byte rate 16000, block align 2, 16 bits
    assert struct.unpack_from("<HHIIHH", data, 20) == (1, 1, 8000, 16000, 2, 16)
    assert data[36:40] == b"data" and struct.unpack_from("<I", data, 40)[0] == 6
    assert data[44:] == struct.pack("<hhh", 1, -2, 300)
    arr, sr = decode_wav(data)
    assert sr == 8000
    np.testing.assert_array_equal(arr, samples[:, None])


@pytest.mark.parametrize("n,ch", [(1, 1), (7, 1), (5, 2), (4, 3)])
def test_wav_roundtrip(n, ch):
    samples = sig(n, ch, seed=n * 10 + ch)
    arr, sr = decode_wav(encode_wav(samples, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(arr, samples)
    assert sniff_wav(encode_wav(samples, 16000))


def test_wav_skips_extra_chunks_and_pads():
    """LIST before fmt, an ODD-size junk chunk (word-aligned pad byte),
    and a fact chunk between fmt and data — all walked past per spec."""
    samples = sig(4)
    canonical = encode_wav(samples, 8000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    body = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
        + fmt_chunk
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", 4)
        + data_chunk
    )
    exotic = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    arr, sr = decode_wav(exotic)
    assert sr == 8000
    np.testing.assert_array_equal(arr, samples)


def test_wav_truncation_clamps_to_whole_frames():
    samples = sig(6, 2)
    data = encode_wav(samples, 8000)
    # cut mid-frame: decoder keeps the whole-frame prefix
    arr, _ = decode_wav(data[:-5])
    np.testing.assert_array_equal(arr, samples[:4])


def test_wav_rejects_unsupported():
    with pytest.raises(AudioDecodeError):
        decode_wav(b"OggS not a wav")
    # IEEE float (format 3) is a loud error, not garbage samples
    data = bytearray(encode_wav(sig(3), 8000))
    struct.pack_into("<H", data, 20, 3)
    with pytest.raises(AudioDecodeError, match="only 16-bit PCM"):
        decode_wav(bytes(data))
    # missing data chunk
    with pytest.raises(AudioDecodeError, match="missing fmt or data"):
        decode_wav(bytes(data[:36]))


def test_wav_rejects_zero_sample_rate():
    """sample_rate=0 in the fmt chunk must be a decode error, not a
    downstream ZeroDivisionError in duration math."""
    data = bytearray(encode_wav(sig(3), 8000))
    struct.pack_into("<I", data, 24, 0)  # fmt.sample_rate = 0
    with pytest.raises(AudioDecodeError, match="bad sample rate"):
        decode_wav(bytes(data))


def test_mutation_fuzz_error_contract_wav():
    """Seeded mutation fuzz (flips, truncations, garbage insertions) on
    a valid RIFF PCM WAV: decode_wav must either decode or raise
    AudioDecodeError — never struct.error/IndexError/numpy errors (the
    image-family fuzz's audio twin, r10)."""
    import random

    import numpy as np

    from conftest import mutate_blob

    from wwwision_importservice_spark.operators.audiocodec import (
        AudioDecodeError,
        decode_wav,
        encode_wav,
    )

    sig = np.round(1000 * np.sin(np.arange(800) * 0.1)).astype(np.int16)
    base = encode_wav(sig.reshape(-1, 1), 16000)
    rng = random.Random(99)
    escapes = []
    for _ in range(300):
        blob = mutate_blob(rng, base)
        try:
            decode_wav(blob)
        except AudioDecodeError:
            pass
        except Exception as exc:  # noqa: BLE001 — the assertion itself
            escapes.append((type(exc).__name__, str(exc)[:60]))
    assert not escapes, escapes[:5]
