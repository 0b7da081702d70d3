"""WARC ingestion (r14): ISO 28500 framing conformance, the Common
Crawl per-record-gzip layout, the gzip-bomb budget, HTTP response
splitting, and the envelope-invariant body address. The Spark-side
pass sits under the x11_warc_ingest oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
import zlib

import pytest

from wwwision_importservice_spark.operators.warc import (
    WarcDecodeError,
    encode_http_response,
    encode_warc,
    parse_warc,
    split_http_response,
)

RECS = [
    {"warc_type": "warcinfo", "payload": b"software: fixture\r\n",
     "record_id": "<urn:uuid:1>"},
    {"warc_type": "request", "target_uri": "http://x/",
     "payload": b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"},
    {"warc_type": "response", "target_uri": "http://x/",
     "date": "2026-08-17T00:00:00Z",
     "content_type": "application/http; msgtype=response",
     "payload": encode_http_response(
         200, b"<html>body containing WARC/1.0 on its own\r\n\r\nline"
              b"</html>")},
]


def test_warc_layout_pinned_bytes():
    """Hand-derived framing (ISO 28500 s4): version line, CRLF
    headers, CRLF CRLF, exactly Content-Length payload bytes, CRLF
    CRLF separator."""
    blob = encode_warc(RECS[:1])
    assert blob.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    head, _, rest = blob.partition(b"\r\n\r\n")
    assert b"Content-Length: 19" in head
    assert rest == b"software: fixture\r\n" + b"\r\n\r\n"


@pytest.mark.parametrize("gz,final", [
    (False, True), (False, False), (True, True), (True, False),
])
def test_warc_roundtrip_both_layouts(gz, final):
    """Plain and per-member-gzip layouts parse identically, with or
    without the final record's trailing separator; Content-Length
    framing means a payload containing the literal 'WARC/1.0' (plus
    blank lines) cannot split a record."""
    blob = encode_warc(RECS, gzip_members=gz, final_separator=final)
    parsed = parse_warc(blob)
    assert [r["warc_type"] for r in parsed] == [
        "warcinfo", "request", "response"]
    assert parsed[1]["target_uri"] == "http://x/"
    status, headers, body = split_http_response(parsed[2]["payload"])
    assert status == 200 and headers["content-type"] == "text/html"
    assert body.startswith(b"<html>body containing WARC/1.0")


def test_warc_envelope_invariant_body_address():
    """The body content address must not move when the ENVELOPE
    changes: new record ids, re-gzipped, different final separator."""
    def sha_of(blob):
        rec = parse_warc(blob)[-1]
        _, _, body = split_http_response(rec["payload"])
        return hashlib.sha256(body.hex().encode()).hexdigest()

    base = sha_of(encode_warc(RECS))
    renamed = [dict(r) for r in RECS]
    renamed[0]["record_id"] = "<urn:uuid:other>"
    for blob in [
        encode_warc(RECS, gzip_members=True),
        encode_warc(RECS, final_separator=False),
        encode_warc(renamed),
    ]:
        assert sha_of(blob) == base
    changed = [dict(r) for r in RECS]
    changed[2] = dict(changed[2], payload=encode_http_response(
        200, b"<html>different</html>"))
    assert sha_of(encode_warc(changed)) != base


def test_warc_error_contract():
    blob = encode_warc(RECS)
    # truncated payload: Content-Length past the buffer
    with pytest.raises(WarcDecodeError, match="past the buffer"):
        parse_warc(blob[:-30])
    # framing violated: separator overwritten mid-file
    at = blob.index(b"\r\n\r\nWARC/1.0", 10)
    broken = blob[:at] + b"XXXX" + blob[at + 4 :]
    with pytest.raises(WarcDecodeError, match="separator|version"):
        parse_warc(broken)
    # not WARC at all
    with pytest.raises(WarcDecodeError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(WarcDecodeError, match="empty"):
        parse_warc(b"")
    # missing Content-Length
    with pytest.raises(WarcDecodeError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
    # garbage between gzip members
    gzblob = encode_warc(RECS, gzip_members=True)
    member_end = len(encode_warc(RECS[:1], gzip_members=True))
    with pytest.raises(WarcDecodeError, match="gzip member"):
        parse_warc(gzblob[:member_end] + b"JUNK" + gzblob[member_end:])


def test_warc_gzip_bomb_budget(monkeypatch):
    import wwwision_importservice_spark.operators.warc as wm

    c = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    bomb = c.compress(b"\x00" * (1 << 22)) + c.flush()
    monkeypatch.setattr(wm, "MAX_WARC_BYTES", 1 << 20)
    with pytest.raises(WarcDecodeError, match="bomb"):
        wm.parse_warc(bomb)
    monkeypatch.undo()
    # under the real budget the same bytes fail on framing, not size
    with pytest.raises(WarcDecodeError, match="version"):
        parse_warc(bomb)


def test_warc_header_folding_and_http_edge_cases():
    # continuation line folds into the previous header (ISO 28500 s4)
    raw = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
           b"X-Long: part one\r\n and two\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    rec = parse_warc(raw)[0]
    assert rec["headers"]["x-long"] == "part one and two"
    # non-HTTP payload in a response split: opaque body, no status
    assert split_http_response(b"not http") == (None, {}, b"not http")
    # status line without a numeric code
    assert split_http_response(b"HTTP/1.1 abc\r\n\r\n")[0] is None


def test_warc_encoder_input_contract():
    with pytest.raises(ValueError, match="version"):
        encode_warc(RECS, version="WARC/9")
    with pytest.raises(ValueError, match="at least one"):
        encode_warc([])
