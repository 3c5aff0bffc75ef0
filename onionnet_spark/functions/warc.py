"""Pure-Python WARC (Web ARChive, ISO 28500) reader/writer.

The ingest format of web-scale training data: Common Crawl ships
~100 TB per crawl as `.warc.gz` files where EVERY record is its own
gzip member and members are concatenated — the layout that lets a
reader seek to a record without decompressing the file prefix, and
the reason a distributed ingest can split one archive across tasks.

This module implements that layout faithfully with stdlib zlib:

- `encode_warc(records, gzip_members=True)` — spec-shaped WARC/1.0
  records (version line, CRLF headers incl. Content-Length and
  WARC-Record-ID, blank line, payload, record terminator), each
  record compressed as an independent gzip member.
- `decode_warc(data)` — member-by-member inflate (zlib wbits=31,
  `unused_data` chaining), strict record parse: bad version line,
  missing Content-Length, truncated payload or a missing CRLF CRLF
  terminator all raise.

The Spark surface (multimodal.read_warc_records) runs this inside
Arrow-batched mapInPandas over a binary payload column; HTTP
response parsing beyond the WARC envelope (status line, HTTP
headers) is out of scope here — `http_headers` payloads pass
through as opaque blocks exactly as the spec stores them.

Reference parity: the reference engine has no ingest surface; this
serves the training-data-pipeline brief (SURVEY §2) where corpus
ingest begins at WARC.
"""

from __future__ import annotations

import zlib

__all__ = ["is_warc", "encode_warc", "decode_warc"]

_CRLF = b"\r\n"


def is_warc(data: bytes) -> bool:
    head = bytes(data[:10])
    return head.startswith(b"WARC/") or head.startswith(b"\x1f\x8b")


def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Encode records as a WARC file. Each record dict: `warc_type`
    (e.g. 'warcinfo', 'response'), `payload` (bytes), optional `url`
    (WARC-Target-URI) and `date`. With gzip_members=True (the
    Common Crawl .warc.gz layout) every record becomes its own gzip
    member."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = bytes(rec["payload"])
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["warc_type"].encode(),
            b"WARC-Record-ID: <urn:onionnet:%d>" % i,
            b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode(),
            b"Content-Length: %d" % len(payload),
        ]
        if rec.get("url"):
            headers.insert(3, b"WARC-Target-URI: " + rec["url"].encode())
        raw = (
            _CRLF.join(headers)
            + _CRLF * 2
            + payload
            + _CRLF * 2  # record terminator (spec §4)
        )
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper
            out += co.compress(raw) + co.flush()
        else:
            out += raw
    return bytes(out)


def _inflate_members(data: bytes) -> bytes:
    """Concatenated-gzip-member inflate via unused_data chaining."""
    out = bytearray()
    rest = data
    while rest:
        do = zlib.decompressobj(31)
        out += do.decompress(rest)
        out += do.flush()
        if not do.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = do.unused_data
    return bytes(out)


def decode_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or member-gzipped) into records:
    [{'warc_type', 'url' | None, 'headers', 'payload'}], strict."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    records = []
    pos = 0
    while pos < len(data):
        head_end = data.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("WARC record without header terminator")
        lines = data[pos:head_end].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {lines[0][:20]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b": ")
            if not sep:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            headers[k.decode().lower()] = v.decode()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        n = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + n]
        if len(payload) != n:
            raise ValueError("truncated WARC payload")
        if data[body_start + n : body_start + n + 4] != _CRLF * 2:
            raise ValueError("missing WARC record terminator")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri"),
                "headers": headers,
                "payload": payload,
            }
        )
        pos = body_start + n + 4
    return records
