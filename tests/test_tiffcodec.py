"""TIFF container metadata codec (r14): header/IFD layout conformance
in both endians, re-bake-invariant content addressing, the IFD-cycle
bomb, and the family mutation-fuzz/error contract. Pure codec tests —
the Spark-side routing sits under the x4_media_metadata oracle and
test_media_row_routes_tiff."""

from __future__ import annotations

import hashlib
import random
import struct
import time

import pytest

from wwwision_importservice_spark.operators.tiffcodec import (
    MAX_TIFF_IFDS,
    TiffDecodeError,
    encode_tiff,
    media_payload,
    parse_tiff,
    sniff_tiff,
)


def test_tiff_layout_pinned_bytes():
    """Hand-derived layout (TIFF 6.0 §2): II + 42le + first-IFD offset;
    the IFD's u16 entry count, ascending 12-byte entries, u32 next-IFD
    terminator; SHORT values inline-packed in the low bytes of the
    4-byte value field."""
    pay = b"\x01\x02\x03\x04\x05\x06"
    blob = encode_tiff(3, 2, pay, "lzw", bits=8)
    assert blob[:4] == b"II\x2a\x00"
    (ifd,) = struct.unpack_from("<I", blob, 4)
    assert ifd == 8 + len(pay)  # data-first layout by default
    (n,) = struct.unpack_from("<H", blob, ifd)
    assert n == 9
    # entries ascend by tag; spot-check width/height/compression
    tags = [struct.unpack_from("<H", blob, ifd + 2 + 12 * k)[0]
            for k in range(n)]
    assert tags == sorted(tags)
    assert tags[:4] == [256, 257, 258, 259]
    tag, etype, count = struct.unpack_from("<HHI", blob, ifd + 2)
    assert (tag, etype, count) == (256, 4, 1)  # LONG width
    assert struct.unpack_from("<I", blob, ifd + 2 + 8)[0] == 3
    # compression entry: SHORT, LZW=5, inline in the low 2 bytes
    at = ifd + 2 + 12 * 3
    tag, etype, count = struct.unpack_from("<HHI", blob, at)
    assert (tag, etype, count) == (259, 3, 1)
    assert struct.unpack_from("<H", blob, at + 8)[0] == 5
    # next-IFD terminator
    assert struct.unpack_from("<I", blob, ifd + 2 + 12 * n)[0] == 0
    # big-endian twin: MM + 42be magic, same fields byte-swapped
    bb = encode_tiff(3, 2, pay, "lzw", bits=8, endian=">")
    assert bb[:4] == b"MM\x00\x2a"
    mb = parse_tiff(bb)
    assert (mb["width"], mb["height"], mb["codec"]) == (3, 2, "lzw")


@pytest.mark.parametrize("endian,pages,strips,ifd_first,comp,bits", [
    ("<", 1, 1, False, "raw", 1),
    ("<", 1, 4, True, "lzw", 8),
    (">", 3, 1, False, "ccitt-g4", 1),
    (">", 2, 3, True, "deflate", 16),
    ("<", 4, 2, False, "packbits", 8),
    ("<", 1, 1, True, "jpeg", 8),
])
def test_tiff_roundtrip(endian, pages, strips, ifd_first, comp, bits):
    pay = bytes((i * 37 + 11) % 251 for i in range(97))
    blob = encode_tiff(800, 600, pay, comp, bits=bits, pages=pages,
                       strips=strips, endian=endian, ifd_first=ifd_first)
    assert sniff_tiff(blob)
    m = parse_tiff(blob)
    assert (m["width"], m["height"], m["bits_per_sample"], m["codec"],
            m["n_pages"]) == (800, 600, bits, comp, pages)
    assert media_payload(blob, m) == pay


def test_tiff_rebake_invariant_address():
    """The content address is the strip/tile payload bytes: moving the
    IFD before the data, re-splitting strips, flipping endianness, and
    re-chaining pages must not move the hash — only changing the
    payload may."""
    pay = bytes(range(90))
    base = media_payload(*(lambda b: (b, parse_tiff(b)))(
        encode_tiff(10, 9, pay)))
    for kwargs in [
        dict(strips=5), dict(ifd_first=True), dict(endian=">"),
        dict(pages=3), dict(pages=2, strips=3, ifd_first=True, endian=">"),
        dict(compression="lzw", bits=16),
    ]:
        blob = encode_tiff(10, 9, pay, **{"compression": "raw",
                                          **kwargs})
        assert media_payload(blob, parse_tiff(blob)) == base, kwargs
    changed = encode_tiff(10, 9, pay[:-1] + b"\xff")
    assert media_payload(changed, parse_tiff(changed)) != base


def test_tiff_multipage_chain_and_first_ifd_primacy():
    """Dims/bits/codec come from the FIRST IFD (every EXIF reader's
    convention); n_pages counts the chain; payload concatenates in
    directory order across pages."""
    pay = bytes(range(60))
    blob = encode_tiff(33, 44, pay, "g3" if False else "ccitt-g3",
                       bits=1, pages=3, strips=2)
    m = parse_tiff(blob)
    assert m["n_pages"] == 3
    assert (m["width"], m["height"], m["bits_per_sample"]) == (33, 44, 1)
    assert m["codec"] == "ccitt-g3"
    assert media_payload(blob, m) == pay


def test_tiff_cycle_bomb_and_chain_cap(monkeypatch):
    """A next-IFD offset that revisits ANY previous IFD is the classic
    TIFF bomb — typed error, not a hang; an acyclic mega-chain trips
    the MAX_TIFF_IFDS cap."""
    blob = bytearray(encode_tiff(4, 4, b"abcd"))
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    struct.pack_into("<I", blob, ifd + 2 + 12 * n, ifd)  # self-loop
    with pytest.raises(TiffDecodeError, match="cycle"):
        parse_tiff(bytes(blob))
    import wwwision_importservice_spark.operators.tiffcodec as tc

    monkeypatch.setattr(tc, "MAX_TIFF_IFDS", 2)
    long_chain = encode_tiff(4, 4, b"abcdefgh", pages=4)
    with pytest.raises(TiffDecodeError, match="IFDs"):
        tc.parse_tiff(long_chain)
    monkeypatch.undo()
    assert parse_tiff(long_chain)["n_pages"] == 4  # cap restored


def test_tiff_truncation_and_error_contract():
    pay = bytes(range(40))
    blob = encode_tiff(16, 16, pay, "lzw", strips=2)
    # strip span truncated: typed error (strict placement validation —
    # a half-present scan is corrupt, not a shorter document)
    with pytest.raises(TiffDecodeError, match="past the buffer"):
        parse_tiff(blob[:-10])
    # IFD table truncated (data-first layout puts the IFD last)
    with pytest.raises(TiffDecodeError, match="truncated|past the buffer"):
        parse_tiff(blob[: 8 + len(pay) + 5])
    # zero first-IFD offset: sniff rejects (offset < 8)
    z = bytearray(blob)
    struct.pack_into("<I", z, 4, 0)
    assert not sniff_tiff(bytes(z))
    with pytest.raises(TiffDecodeError, match="magic"):
        parse_tiff(bytes(z))
    # missing dims: drop tag 256 by renumbering it to a tag we ignore
    b2 = bytearray(encode_tiff(16, 16, pay))
    (ifd,) = struct.unpack_from("<I", b2, 4)
    struct.pack_into("<H", b2, ifd + 2, 4096)  # 256 -> unknown tag
    with pytest.raises(TiffDecodeError, match="ImageWidth"):
        parse_tiff(bytes(b2))
    # strip offsets/counts cardinality mismatch
    b3 = bytearray(encode_tiff(16, 16, pay, strips=3))
    (ifd,) = struct.unpack_from("<I", b3, 4)
    (n,) = struct.unpack_from("<H", b3, ifd)
    for k in range(n):
        at = ifd + 2 + 12 * k
        if struct.unpack_from("<H", b3, at)[0] == 279:
            struct.pack_into("<I", b3, at + 4, 2)  # count 3 -> 2
    with pytest.raises(TiffDecodeError, match="offsets vs"):
        parse_tiff(bytes(b3))
    # garbage after the last structure is invisible (crawl posture)
    assert parse_tiff(blob + b"\xde\xad" * 20)["n_pages"] == 1


def test_tiff_defaults_per_spec():
    """Missing Compression defaults to 1 (raw) and missing
    BitsPerSample to 1 (bilevel) — the spec's defaults, exercised by
    renumbering the tags to unknowns (readers must skip unknown
    tags)."""
    blob = bytearray(encode_tiff(8, 8, b"\xaa" * 8, "lzw", bits=16))
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    for k in range(n):
        at = ifd + 2 + 12 * k
        tag = struct.unpack_from("<H", blob, at)[0]
        if tag in (258, 259):
            struct.pack_into("<H", blob, at, 60000 + tag)
    m = parse_tiff(bytes(blob))
    assert m["bits_per_sample"] == 1 and m["codec"] == "raw"
    # unknown compression value: honest label, not a guess
    b2 = bytearray(encode_tiff(8, 8, b"\xaa" * 8))
    (ifd,) = struct.unpack_from("<I", b2, 4)
    for k in range(9):
        at = ifd + 2 + 12 * k
        if struct.unpack_from("<H", b2, at)[0] == 259:
            struct.pack_into("<H", b2, at + 8, 31337)
    assert parse_tiff(bytes(b2))["codec"] == "compression-31337"


def test_tiff_mutation_fuzz_error_contract():
    """Family fuzz: every mutation either parses to a dict or raises
    TiffDecodeError — no other exception, no hang."""
    from conftest import mutate_blob

    rng = random.Random(0x71FF)
    bases = [
        encode_tiff(320, 200, bytes(range(80)), "lzw", strips=3),
        encode_tiff(64, 48, bytes(range(60)), "raw", pages=3,
                    endian=">", ifd_first=True),
    ]
    outcomes = {"ok": 0, "rejected": 0}
    start = time.perf_counter()
    for base in bases:
        for _ in range(500):
            blob = bytes(mutate_blob(rng, base))
            if not sniff_tiff(blob):
                continue
            try:
                meta = parse_tiff(blob)
                assert isinstance(meta, dict)
                outcomes["ok"] += 1
            except TiffDecodeError:
                outcomes["rejected"] += 1
    assert outcomes["ok"] > 0, outcomes
    assert time.perf_counter() - start < 20.0


def test_tiff_encoder_input_contract():
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(4, 4, b"x", "zstd")
    with pytest.raises(ValueError, match="dims"):
        encode_tiff(0, 4, b"x")
    with pytest.raises(ValueError, match="endian"):
        encode_tiff(4, 4, b"x", endian="|")
    with pytest.raises(ValueError, match="strips"):
        encode_tiff(4, 4, b"xy", strips=9)
    with pytest.raises(ValueError, match=">= 1"):
        encode_tiff(4, 4, b"x", pages=0)


def test_media_row_routes_tiff():
    """The r14 regression pin: TIFF bytes route as kind='image' with
    real dims/bit-depth/compression and the page count in n_frames —
    previously the scanned-document staple fell to kind='unknown'.
    Corrupt directories quarantine in non-strict mode."""
    from wwwision_importservice_spark.operators import (
        audiocodec as wavc,
        flaccodec as flacc,
        imagecodec as img,
        videocodec as vidc,
    )
    from wwwision_importservice_spark.operators.multimodal import _media_row

    def hex_sha(b):
        return hashlib.sha256(b.hex().encode()).hexdigest()

    pay = bytes(range(70))
    blob = encode_tiff(2480, 3508, pay, "ccitt-g4", bits=1, pages=2)
    row = _media_row(1, blob, img, wavc, flacc, vidc, False, hex_sha)
    assert row[1] == "image" and row[2] == "tiff"
    assert (row[3], row[4], row[5]) == (2480, 3508, 2)  # w, h, pages
    assert row[8] == 1 and row[10] == "ccitt-g4"  # bits, codec
    assert row[12] == hex_sha(pay)
    # re-baked twin (big-endian, IFD-first, re-stripped): same hash
    rebaked = encode_tiff(2480, 3508, pay, "ccitt-g4", bits=1, pages=2,
                          strips=4, endian=">", ifd_first=True)
    row_r = _media_row(2, rebaked, img, wavc, flacc, vidc, False, hex_sha)
    assert row_r[12] == row[12] and row_r[11] == len(rebaked)
    # IFD cycle: quarantine, not a crash; strict raises
    bad = bytearray(blob)
    (ifd,) = struct.unpack_from("<I", bad, 4)
    (n,) = struct.unpack_from("<H", bad, ifd)
    struct.pack_into("<I", bad, ifd + 2 + 12 * n, ifd)
    row_c = _media_row(3, bytes(bad), img, wavc, flacc, vidc, False,
                       hex_sha)
    assert row_c[1] == "corrupt" and row_c[2] == "tiff"
    with pytest.raises(TiffDecodeError):
        _media_row(3, bytes(bad), img, wavc, flacc, vidc, True, hex_sha)
