"""Pure-stdlib TIFF container METADATA codec: endian-aware IFD entry
walk, no raster decode.

The r14 misrouting sweep's find (VERDICT r13 "what's missing"): TIFF
is the staple of scanned-document and scientific corpora — exactly the
corpora an LLM-data pipeline curates — and ``media_metadata`` routed
every TIFF blob to ``kind='unknown'`` (the pure image codecs decode
BMP/PPM/PNG/GIF/JPEG; WebP/HEIF have their own walks; TIFF fell
through to the fake path). Raster decode stays out of scope by the
family rule (a baseline-TIFF decoder would be the JPEG codec's size
again for one container), but the directory structure is the same
exact no-decode arithmetic as the r12/r13 lanes (TIFF 6.0 spec,
Adobe 1992):

- Header: ``II`` (little-endian) or ``MM`` (big-endian) + the 42
  magic + u32 offset of the first IFD (§2, "Image File Header").
- Each IFD: u16 entry count, then 12-byte entries
  ``(tag u16, type u16, count u32, value-or-offset 4B)`` sorted by
  tag, then a u32 offset to the next IFD (0 terminates) — multi-page
  documents chain IFDs (§2, "Image File Directory").
- Fields read: ImageWidth 256 / ImageLength 257 (SHORT or LONG),
  BitsPerSample 258, Compression 259 (the codec family),
  SamplesPerPixel 277, and the payload location pairs
  StripOffsets 273 + StripByteCounts 279 (§3) or
  TileOffsets 324 + TileByteCounts 325 (§15).

The content address is the concatenated strip/tile payload bytes in
directory order — the same image re-baked (IFD moved before/after the
data, strips re-split, entries re-packed) hashes identically, the
``webpcodec``/``oggcodec`` convention.

Threat model, the family contract: header fields are UNTRUSTED —
malformed constructs raise :class:`TiffDecodeError` (an
``ImageDecodeError``, so ``_media_row``'s quarantine catch-list needs
no new type). The IFD chain is the classic TIFF bomb: a next-IFD
offset pointing back at itself (or a long cycle) loops a naive walker
forever, so the walk keeps a visited-offset set (cycles are malformed
→ typed error, not a soft budget) AND a chain cap
(:data:`MAX_TIFF_IFDS`); per-IFD entry counts are capped
(:data:`MAX_TIFF_ENTRIES`); every offset/size is validated against
the buffer before use. Mutation-fuzz pinned in
``tests/test_tiffcodec.py``.

Reference parallel: none (``Classes/`` is records-in/records-out);
training-data extension surface (SURVEY §2 X4).
"""

from __future__ import annotations

import struct

from wwwision_importservice_spark.operators.imagecodec import ImageDecodeError


class TiffDecodeError(ImageDecodeError):
    """Malformed/hostile TIFF input (typed, family contract)."""


#: IFD-chain bomb cap: real multi-page scans run to hundreds of pages;
#: past this the file is hostile, not a document (cycles are caught
#: exactly by the visited set — this bounds acyclic mega-chains)
MAX_TIFF_IFDS = 1 << 12

#: per-IFD entry cap: the spec's tag space is 16-bit and real files
#: carry dozens of entries; a count field near 65535 is a declared
#: walk of ~786 KB of entry bytes per IFD — validated against the
#: buffer anyway, capped to keep the loop honest
MAX_TIFF_ENTRIES = 1 << 12

#: Compression tag 259 → codec family label (TIFF 6.0 §7 + the
#: registered extensions everyone ships). Unlisted values report
#: ``"compression-<n>"`` — honest over guessed.
_COMPRESSION = {
    1: "raw",
    2: "ccitt-rle",
    3: "ccitt-g3",
    4: "ccitt-g4",
    5: "lzw",
    6: "ojpeg",
    7: "jpeg",
    8: "deflate",
    32773: "packbits",
    32946: "deflate",
}

# entry value types we evaluate: BYTE(1), SHORT(3), LONG(4) — the only
# types the tags we read are allowed to carry (widths/counts/offsets)
_TYPE_SIZE = {1: 1, 3: 2, 4: 4}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def sniff_tiff(data: bytes) -> bool:
    """TIFF magic: ``II*\\0`` or ``MM\\0*`` plus a first-IFD offset
    that lands inside the buffer — 4 magic bytes alone would match
    some random blobs, and the offset check is free."""
    if len(data) < 8:
        return False
    if data[:4] == b"II\x2a\x00":
        (off,) = struct.unpack_from("<I", data, 4)
    elif data[:4] == b"MM\x00\x2a":
        (off,) = struct.unpack_from(">I", data, 4)
    else:
        return False
    return 8 <= off <= len(data) - 2


def _read_values(data: bytes, e: str, etype: int, count: int,
                 raw: bytes) -> list[int]:
    """An entry's integer values: inline when they fit the 4-byte
    value field, else at the pointed-to offset (TIFF 6.0 §2, "Types").
    """
    size = _TYPE_SIZE[etype]
    fmt = _TYPE_FMT[etype]
    total = size * count
    if total <= 4:
        return list(struct.unpack_from(f"{e}{count}{fmt}", raw, 0))
    (off,) = struct.unpack_from(f"{e}I", raw, 0)
    if off + total > len(data):
        raise TiffDecodeError(
            f"entry value array (count {count}) points past the buffer"
        )
    return list(struct.unpack_from(f"{e}{count}{fmt}", data, off))


def parse_tiff(data: bytes) -> dict:
    """TIFF bytes → metadata dict:

    ``{"format": "tiff", "codec": str, "width": int, "height": int,
    "bits_per_sample": int, "samples_per_pixel": int, "n_pages": int,
    "payload_regions": [(start, end), ...]}``

    ``width``/``height``/``bits_per_sample``/``codec`` come from the
    FIRST IFD (the primary image — the convention every EXIF reader
    uses); ``n_pages`` counts the whole IFD chain (multi-page scans);
    ``payload_regions`` concatenate every page's strip/tile spans in
    directory order for :func:`media_payload`'s re-bake-invariant
    address. ``bits_per_sample`` is the first sample's depth (TIFF
    stores one value per sample; mixed-depth planes are exotic and the
    first value is what scanners write for all).

    Mandatory for the primary IFD: dims, strip/tile placement with
    matching offset/count cardinality. Missing Compression defaults to
    1 (= ``"raw"``, per spec); missing BitsPerSample defaults to 1
    (bilevel, per spec §3 — the fax/scan case)."""
    if not sniff_tiff(data):
        raise TiffDecodeError("no II*/MM* TIFF magic")
    e = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    out: dict = {
        "format": "tiff", "codec": None, "width": None, "height": None,
        "bits_per_sample": None, "samples_per_pixel": None,
        "n_pages": 0, "payload_regions": [],
    }
    seen: set[int] = set()
    while ifd_off:
        if ifd_off in seen:
            raise TiffDecodeError(
                f"IFD chain cycles back to offset {ifd_off} (bomb)"
            )
        seen.add(ifd_off)
        if len(seen) > MAX_TIFF_IFDS:
            raise TiffDecodeError(f"more than {MAX_TIFF_IFDS} IFDs")
        if ifd_off + 2 > len(data):
            raise TiffDecodeError("IFD offset past the buffer")
        (n_entries,) = struct.unpack_from(f"{e}H", data, ifd_off)
        if n_entries > MAX_TIFF_ENTRIES:
            raise TiffDecodeError(
                f"IFD declares {n_entries} entries (> {MAX_TIFF_ENTRIES})"
            )
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(data):
            raise TiffDecodeError("IFD entry table truncated")
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_entries):
            at = ifd_off + 2 + 12 * i
            tag, etype = struct.unpack_from(f"{e}HH", data, at)
            (count,) = struct.unpack_from(f"{e}I", data, at + 4)
            tags[tag] = (etype, count, data[at + 8 : at + 12])

        def val(tag: int, default: int | None = None) -> int | None:
            if tag not in tags:
                return default
            etype, count, raw = tags[tag]
            if etype not in _TYPE_SIZE or count < 1:
                raise TiffDecodeError(
                    f"tag {tag} has unsupported type {etype}/count {count}"
                )
            return _read_values(data, e, etype, count, raw)[0]

        def arr(tag: int) -> list[int] | None:
            if tag not in tags:
                return None
            etype, count, raw = tags[tag]
            if etype not in _TYPE_SIZE or count < 1:
                raise TiffDecodeError(
                    f"tag {tag} has unsupported type {etype}/count {count}"
                )
            return _read_values(data, e, etype, count, raw)

        width, height = val(256), val(257)
        if width is None or height is None or width < 1 or height < 1:
            raise TiffDecodeError("IFD missing/invalid ImageWidth|Length")
        offsets = arr(273)
        counts = arr(279)
        if offsets is None or counts is None:
            offsets, counts = arr(324), arr(325)
            if offsets is None or counts is None:
                raise TiffDecodeError(
                    "IFD has neither strip (273/279) nor tile (324/325) "
                    "placement"
                )
        if len(offsets) != len(counts):
            raise TiffDecodeError(
                f"{len(offsets)} strip/tile offsets vs {len(counts)} "
                "byte counts"
            )
        for s, c in zip(offsets, counts):
            if s + c > len(data):
                raise TiffDecodeError("strip/tile span past the buffer")
            out["payload_regions"].append((s, s + c))
        if out["n_pages"] == 0:  # primary image fields
            out["width"], out["height"] = width, height
            out["bits_per_sample"] = val(258, 1)
            out["samples_per_pixel"] = val(277, 1)
            comp = val(259, 1)
            out["codec"] = _COMPRESSION.get(comp, f"compression-{comp}")
        out["n_pages"] += 1
        (ifd_off,) = struct.unpack_from(f"{e}I", data, end)
    if out["n_pages"] == 0:
        raise TiffDecodeError("zero-offset first IFD (no image)")
    return out


def media_payload(data: bytes, meta: dict) -> bytes:
    """Concatenated strip/tile payload bytes in directory order — the
    re-bake-invariant content address (IFD position, entry packing,
    and strip boundaries are all outside the hash)."""
    return b"".join(data[s:e] for s, e in meta["payload_regions"])


def encode_tiff(
    width: int,
    height: int,
    payload: bytes = b"",
    compression: str = "raw",
    bits: int = 8,
    pages: int | None = None,
    strips: int = 1,
    endian: str = "<",
    ifd_first: bool = False,
) -> bytes:
    """Minimal conformant TIFF for the fixture/oracle playbook: real
    header/IFD/entry arithmetic, with the strip payload being the
    caller's bytes verbatim (the parser never decodes rasters — the
    ``encode_webp`` posture, so ``compression`` is a label the entries
    carry, not an actual codec pass). ``pages`` chains that many IFDs,
    splitting ``payload`` evenly across them (remainder to the last);
    ``strips`` splits each page's bytes into that many strips (strip
    boundaries are provably outside the content address);
    ``ifd_first`` writes directory-before-data vs data-before-
    directory — the re-bake the content address must survive. Entries
    are emitted in ascending tag order as the spec mandates. Trusted-
    but-validated inputs."""
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' or '>'")
    if not 0 < width < 1 << 32 or not 0 < height < 1 << 32:
        raise ValueError("dims must be positive 32-bit")
    comp_code = {v: k for k, v in _COMPRESSION.items() if k != 32946}
    if compression not in comp_code:
        raise ValueError(
            f"compression must be one of {sorted(comp_code)}, "
            f"got {compression!r}"
        )
    n_pages = 1 if pages is None else pages
    if n_pages < 1 or strips < 1:
        raise ValueError("pages and strips must be >= 1")
    if strips > max(len(payload) // max(n_pages, 1), 1) + 1:
        # zero-length strips are legal but pointless in fixtures; keep
        # the split arithmetic honest instead of emitting empties
        raise ValueError("more strips than payload bytes per page")

    e = endian
    magic = b"II\x2a\x00" if e == "<" else b"MM\x00\x2a"
    per_page = len(payload) // n_pages
    page_bytes = [
        payload[i * per_page : (i + 1) * per_page] if i < n_pages - 1
        else payload[i * per_page :]
        for i in range(n_pages)
    ]

    def entry(tag: int, etype: int, values: list[int]) -> tuple[bytes, bytes]:
        """(12-byte entry with inline value, '') or (entry needing an
        offset patch, out-of-line value bytes) — the caller lays out
        out-of-line arrays after the entry table."""
        fmt = _TYPE_FMT[etype]
        body = struct.pack(f"{e}{len(values)}{fmt}", *values)
        head = struct.pack(f"{e}HHI", tag, etype, len(values))
        if len(body) <= 4:
            return head + body + b"\x00" * (4 - len(body)), b""
        return head, body  # offset patched during layout

    # Layout: [header][data pages][IFDs] or [header][IFDs][data pages].
    # Build per-page IFD blobs with placeholders, then patch offsets.
    blobs: list[bytes] = []
    strip_tables: list[list[tuple[int, int]]] = []  # (local_off, len)
    for pb in page_bytes:
        per = len(pb) // strips
        spans, at = [], 0
        for s in range(strips):
            ln = per if s < strips - 1 else len(pb) - at
            spans.append((at, ln))
            at += ln
        strip_tables.append(spans)

    # sizes first: each IFD = 2 + 12*n + 4 (+ out-of-line arrays)
    def build_ifd(page_i: int, data_base: int, next_off: int) -> bytes:
        spans = strip_tables[page_i]
        offsets = [data_base + s for s, _ in spans]
        counts = [ln for _, ln in spans]
        entries = [
            entry(256, 4, [width]),
            entry(257, 4, [height]),
            entry(258, 3, [bits]),
            entry(259, 3, [comp_code[compression]]),
            entry(262, 3, [1]),  # PhotometricInterpretation: BlackIsZero
            entry(273, 4, offsets),
            entry(277, 3, [1]),
            entry(278, 4, [height]),  # RowsPerStrip: all rows
            entry(279, 4, counts),
        ]
        table_at = 2 + 12 * len(entries)
        tail = b""
        fixed: list[bytes] = []
        for head, extra in entries:
            if extra:
                # patched to the absolute position later via base_fix
                fixed.append(head + struct.pack(f"{e}I", table_at + 4
                                                + len(tail)))
                tail += extra
            else:
                fixed.append(head)
        body = (struct.pack(f"{e}H", len(entries)) + b"".join(fixed)
                + struct.pack(f"{e}I", next_off) + tail)
        return body

    # two-pass layout: compute IFD sizes with dummy offsets, then emit
    dummy = [build_ifd(i, 0, 0) for i in range(n_pages)]
    ifd_sizes = [len(b) for b in dummy]
    if ifd_first:
        ifd_base = 8
        data_base = 8 + sum(ifd_sizes)
    else:
        data_base = 8
        ifd_base = 8 + len(payload)
    ifd_offs = []
    at = ifd_base
    for sz in ifd_sizes:
        ifd_offs.append(at)
        at += sz
    data_offs = []
    at = data_base
    for pb in page_bytes:
        data_offs.append(at)
        at += len(pb)
    for i in range(n_pages):
        nxt = ifd_offs[i + 1] if i + 1 < n_pages else 0
        raw = bytearray(build_ifd(i, data_offs[i], nxt))
        # out-of-line value offsets inside this IFD were emitted
        # relative to the IFD start — rebase to absolute
        (n_entries,) = struct.unpack_from(f"{e}H", raw, 0)
        for k in range(n_entries):
            eat = 2 + 12 * k
            _tag, etype = struct.unpack_from(f"{e}HH", raw, eat)
            (count,) = struct.unpack_from(f"{e}I", raw, eat + 4)
            if _TYPE_SIZE[etype] * count > 4:
                (rel,) = struct.unpack_from(f"{e}I", raw, eat + 8)
                struct.pack_into(f"{e}I", raw, eat + 8,
                                 rel + ifd_offs[i])
        blobs.append(bytes(raw))

    out = bytearray(magic + struct.pack(f"{e}I", ifd_offs[0]))
    if ifd_first:
        for b in blobs:
            out += b
        for pb in page_bytes:
            out += pb
    else:
        for pb in page_bytes:
            out += pb
        for b in blobs:
            out += b
    return bytes(out)


__all__ = [
    "MAX_TIFF_ENTRIES",
    "MAX_TIFF_IFDS",
    "TiffDecodeError",
    "encode_tiff",
    "media_payload",
    "parse_tiff",
    "sniff_tiff",
]
