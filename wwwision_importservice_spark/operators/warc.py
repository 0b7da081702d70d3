"""WARC (Web ARChive, ISO 28500) corpus ingestion: record walk +
HTTP-response split, one Arrow pass, no external deps.

Common-Crawl-style WARC is the canonical raw input of an LLM data
pipeline — petabytes of crawl data arrive as concatenated WARC
records (usually one gzip member per record), and the FIRST operator
any curation chain runs is "split the container into typed records".
This module is that operator, in the repo's pure-codec style:

- A WARC file is a sequence of records: a ``WARC/1.0`` (or 1.1)
  version line, CRLF-terminated named headers, CRLF CRLF, then
  exactly ``Content-Length`` payload bytes, then CRLF CRLF
  (ISO 28500 §4). Record framing is BYTE-EXACT — a parser that
  scans for the next version line instead of honoring Content-Length
  corrupts on payloads containing "WARC/1.0".
- The Common Crawl convention wraps EACH record in its own gzip
  member; members are concatenated. :func:`parse_warc` accepts both
  the plain and per-member-gzip forms (sniffed by the 1f8b magic),
  decompressing member-at-a-time with a decompressed-size budget —
  a gzip bomb fails loudly instead of eating the executor.
- ``response`` records carry an HTTP message as payload: status line
  + headers + CRLF CRLF + body. The body (the actual web content) is
  what curation wants; :func:`warc_records` splits it and content-
  addresses the BODY, so the same page re-crawled into a different
  WARC envelope (new record ids, new dates, re-gzipped) hashes
  identically.

Scale shape: ``warc_records`` is ONE ``mapInPandas`` pass over
``(id, blob)`` — per-file CPU, no shuffle, the ``media_metadata``
posture. At 100 TB the unit of parallelism is the WARC file (Common
Crawl ships ~1 GB files); per-file records explode to rows inside the
Arrow batch with no driver involvement.

Threat model: crawl bytes are UNTRUSTED — malformed framing raises
:class:`WarcDecodeError`; record count and decompressed size are
budgeted (:data:`MAX_WARC_RECORDS`, :data:`MAX_WARC_BYTES`).

Reference parallel: ``FileSource.load`` is the reference's "read the
raw feed" step (``Classes/DataSource/File/FileSource.php:37-41``);
WARC is that step for crawl corpora. Training-data extension surface
(SURVEY §2 X-family).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame

#: record-count bomb cap per input blob
MAX_WARC_RECORDS = 1 << 20

#: decompressed-bytes budget per input blob (gzip-bomb guard):
#: Common Crawl files are ~1 GB compressed / ~4-5 GB raw; the cap is
#: per-BLOB, and blobs at that size should be split upstream anyway
MAX_WARC_BYTES = 1 << 31


class WarcDecodeError(ValueError):
    """Malformed/hostile WARC input (typed, family contract)."""


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record Common
    Crawl layout) with a total-size budget."""
    out: list[bytes] = []
    total = 0
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise WarcDecodeError(
                f"expected a gzip member at offset {pos} (trailing "
                "garbage between members)"
            )
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        chunk = d.decompress(data[pos:], MAX_WARC_BYTES - total + 1)
        if d.unconsumed_tail:
            raise WarcDecodeError(
                f"decompressed size exceeds the {MAX_WARC_BYTES}-byte "
                "budget (gzip bomb)"
            )
        total += len(chunk)
        if total > MAX_WARC_BYTES:
            raise WarcDecodeError(
                f"decompressed size exceeds the {MAX_WARC_BYTES}-byte "
                "budget (gzip bomb)"
            )
        out.append(chunk)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcDecodeError("gzip member consumed zero bytes")
        pos += consumed
    return b"".join(out)


def _parse_headers(data: bytes, pos: int) -> tuple[dict, int]:
    """Read CRLF-terminated ``Name: value`` headers up to the blank
    line; returns (headers lowercase-keyed, position after CRLFCRLF).
    Continuation lines (ISO 28500 §4: leading SP/TAB) fold into the
    previous value."""
    headers: dict[str, str] = {}
    last_key: str | None = None
    while True:
        nl = data.find(b"\r\n", pos)
        if nl < 0:
            raise WarcDecodeError("header block truncated (no CRLF)")
        line = data[pos:nl]
        pos = nl + 2
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t") and last_key is not None:
            headers[last_key] += " " + line.strip().decode(
                "utf-8", "replace")
            continue
        sep = line.find(b":")
        if sep < 1:
            raise WarcDecodeError(f"malformed header line {line[:40]!r}")
        key = line[:sep].decode("ascii", "replace").strip().lower()
        headers[key] = line[sep + 1 :].strip().decode("utf-8", "replace")
        last_key = key
    # unreachable


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or per-member gzip) → list of record dicts:

    ``{"warc_type": str, "record_id": str|None, "target_uri":
    str|None, "date": str|None, "content_type": str|None,
    "content_length": int, "headers": dict, "payload": bytes}``

    Framing is strict: Content-Length is mandatory and exact, and
    each record's payload must be followed by the CRLF CRLF record
    separator (a missing separator on the FINAL record is tolerated —
    real files end both ways)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    while pos < len(data):
        if len(records) >= MAX_WARC_RECORDS:
            raise WarcDecodeError(f"more than {MAX_WARC_RECORDS} records")
        nl = data.find(b"\r\n", pos)
        if nl < 0:
            raise WarcDecodeError("version line truncated")
        version = data[pos:nl]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise WarcDecodeError(
                f"expected a WARC version line at offset {pos}, got "
                f"{version[:20]!r}"
            )
        headers, body = _parse_headers(data, nl + 2)
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise WarcDecodeError("record missing Content-Length") from None
        except ValueError:
            raise WarcDecodeError(
                f"non-integer Content-Length {headers['content-length']!r}"
            ) from None
        if clen < 0 or body + clen > len(data):
            raise WarcDecodeError("Content-Length past the buffer")
        payload = data[body : body + clen]
        pos = body + clen
        if data[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
        elif pos != len(data):
            raise WarcDecodeError(
                "record payload not followed by the CRLF CRLF separator "
                "(Content-Length framing violated)"
            )
        records.append({
            "warc_type": headers.get("warc-type", "unknown"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "headers": headers,
            "payload": payload,
        })
    if not records:
        raise WarcDecodeError("empty WARC (no records)")
    return records


def split_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """An HTTP message payload → ``(status, headers, body)``. Returns
    ``(None, {}, payload)`` when the payload does not start with an
    HTTP status line (curation treats it as an opaque body)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    nl = payload.find(b"\r\n")
    if nl < 0:
        return None, {}, payload
    parts = payload[:nl].split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        return None, {}, payload
    status = int(parts[1])
    try:
        headers, body = _parse_headers(payload, nl + 2)
    except WarcDecodeError:
        return status, {}, b""
    return status, headers, payload[body:]


def warc_records(
    df: DataFrame,
    id_col: str,
    blob_col: str = "blob",
    include_body: bool = False,
) -> DataFrame:
    """One Arrow pass over ``(id, blob)`` WARC files → one typed row
    per record:

    ``(id, record_idx, warc_type, target_uri, date, content_type,
    content_length, http_status, body_len, body_sha[, body])``

    ``http_status``/``body_len``/``body_sha`` come from the HTTP split
    for ``response`` records (body = the web content curation wants);
    for every other record type the payload IS the body. ``body_sha``
    is the hex-sha256 of the body's hex form (the repo's md5-
    arithmetic oracle convention) — the same page re-enveloped
    (new record ids/dates, re-gzipped, reordered siblings) hashes
    identically. ``include_body=True`` ships the body bytes too, for
    the in-pipeline chain (WARC → HTML extract → quality) where the
    next stage consumes the content rather than its address.
    Malformed files raise (strict: a corrupt crawl shard should fail
    the task and be retried/quarantined at file level, not silently
    drop records)."""
    out_schema = (
        f"{id_col} long, record_idx int, warc_type string, "
        "target_uri string, date string, content_type string, "
        "content_length long, http_status int, body_len long, "
        "body_sha string"
    )
    if include_body:
        out_schema += ", body binary"

    def batches(it):
        import hashlib as _hashlib

        import pandas as pd

        rows = []
        cols = [
            id_col, "record_idx", "warc_type", "target_uri", "date",
            "content_type", "content_length", "http_status",
            "body_len", "body_sha",
        ] + (["body"] if include_body else [])
        for pdf in it:
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                for i, rec in enumerate(parse_warc(bytes(blob))):
                    status, _h, body = (
                        split_http_response(rec["payload"])
                        if rec["warc_type"] == "response"
                        else (None, {}, rec["payload"])
                    )
                    row = (
                        int(rid), i, rec["warc_type"], rec["target_uri"],
                        rec["date"], rec["content_type"],
                        rec["content_length"], status, len(body),
                        _hashlib.sha256(body.hex().encode()).hexdigest(),
                    )
                    if include_body:
                        row += (bytearray(body),)
                    rows.append(row)
            out = pd.DataFrame(rows, columns=cols)
            rows = []
            yield out.astype({"http_status": "Int32"})

    return df.select(id_col, blob_col).mapInPandas(batches, schema=out_schema)


def encode_warc(
    records: list[dict],
    gzip_members: bool = False,
    version: str = "WARC/1.0",
    final_separator: bool = True,
) -> bytes:
    """Minimal conformant WARC for the fixture/oracle playbook. Each
    record dict: ``{"warc_type", "payload", and optional "record_id",
    "target_uri", "date", "content_type", "extra": dict}``.
    ``gzip_members`` emits the Common Crawl one-member-per-record
    layout; ``final_separator=False`` drops the last record's trailing
    CRLF CRLF (both endings occur in the wild and must parse).
    Trusted-but-validated inputs."""
    if version not in ("WARC/1.0", "WARC/1.1"):
        raise ValueError("version must be WARC/1.0 or WARC/1.1")
    if not records:
        raise ValueError("at least one record is required")
    blobs: list[bytes] = []
    for i, rec in enumerate(records):
        payload = rec["payload"]
        lines = [version.encode()]
        lines.append(b"WARC-Type: " + rec["warc_type"].encode())
        for key, attr in (("WARC-Record-ID", "record_id"),
                          ("WARC-Target-URI", "target_uri"),
                          ("WARC-Date", "date"),
                          ("Content-Type", "content_type")):
            if rec.get(attr):
                lines.append(key.encode() + b": " + rec[attr].encode())
        for k, v in (rec.get("extra") or {}).items():
            lines.append(f"{k}: {v}".encode())
        lines.append(b"Content-Length: " + str(len(payload)).encode())
        raw = b"\r\n".join(lines) + b"\r\n\r\n" + payload
        if final_separator or i < len(records) - 1:
            raw += b"\r\n\r\n"
        blobs.append(raw)
    if gzip_members:
        out = []
        for raw in blobs:
            c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out.append(c.compress(raw) + c.flush())
        return b"".join(out)
    return b"".join(blobs)


def encode_http_response(
    status: int,
    body: bytes,
    content_type: str = "text/html",
    extra_headers: dict | None = None,
) -> bytes:
    """An HTTP/1.1 message payload for ``response`` records."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              500: "Internal Server Error"}.get(status, "Status")
    lines = [f"HTTP/1.1 {status} {reason}".encode(),
             b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(body)).encode()]
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}".encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + body


__all__ = [
    "MAX_WARC_BYTES",
    "MAX_WARC_RECORDS",
    "WarcDecodeError",
    "encode_http_response",
    "encode_warc",
    "parse_warc",
    "split_http_response",
    "warc_records",
]
