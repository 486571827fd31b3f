"""WARC 1.0 reader/writer (pure Python, ISO 28500 subset).

Common-Crawl-style web corpora ship as WARC: a concatenation of
records, each a CRLF-delimited header block (version line + named
fields), a Content-Length-sized payload, and a CRLF CRLF trailer.
`response` records carry an HTTP/1.1 response as payload (status line,
headers, body) — the html bytes a crawl pipeline actually wants.

This is the NORMATIVE codec for the Spark WARC source
(sources/warc.py): the Arrow UDFs call these functions per blob, and
the fixture builder uses build_record/build_warc so tests and the
driver-contract oracle can reconstruct the expected relational output
generatively (same pattern as pycore/sitemap.py).

Scope (documented subset of ISO 28500 / WARC 1.0 + 1.1):
- record types: all parse; only `response` yields page rows (warcinfo /
  request / metadata / resource are structural and skipped by callers).
- gzip: Common Crawl stores one gzip member per record; `parse_warc`
  transparently decompresses multi-member gzip input (magic-sniffed).
- robustness: a malformed record (bad version line, unparseable
  Content-Length, truncated payload) is SKIPPED by resyncing to the
  next `\\r\\nWARC/` boundary — corrupt-row-skip semantics match the
  reference ingest contract (reference src/main.py:21-28: decode
  failures drop the document, never the job).

No external deps — stdlib `zlib` only (same constraint as pycore/png.py).
"""

from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass, field

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


@dataclass
class WarcRecord:
    rec_type: str
    url: str | None = None
    date: str | None = None
    record_id: str | None = None
    content_type: str | None = None  # WARC-block content type
    http_status: int | None = None
    http_content_type: str | None = None
    body: bytes = b""
    headers: dict = field(default_factory=dict)


def _det_record_id(rec_type: str, url: str | None, date: str | None) -> str:
    """Deterministic WARC-Record-ID (md5-derived urn:uuid) — the spec
    wants globally unique; the fixture wants byte-stable builds."""
    h = hashlib.md5(
        f"{rec_type}|{url or ''}|{date or ''}".encode()
    ).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              500: "Internal Server Error"}.get(status, "Unknown")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def build_record(
    rec_type: str,
    payload: bytes,
    url: str | None = None,
    date: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """One WARC 1.0 record, byte-deterministic for fixed inputs."""
    if content_type is None:
        content_type = {
            "response": "application/http; msgtype=response",
            "request": "application/http; msgtype=request",
            "warcinfo": "application/warc-fields",
        }.get(rec_type, "application/octet-stream")
    lines = [b"WARC/1.0"]
    lines.append(f"WARC-Type: {rec_type}".encode())
    lines.append(
        f"WARC-Record-ID: {_det_record_id(rec_type, url, date)}".encode()
    )
    if date is not None:
        lines.append(f"WARC-Date: {date}".encode())
    if url is not None:
        lines.append(f"WARC-Target-URI: {url}".encode())
    lines.append(f"Content-Type: {content_type}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _CRLF * 2 + payload + _CRLF * 2


def build_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into one WARC blob. gzip_members=True wraps
    EACH record in its own gzip member (the Common Crawl layout — a
    reader can seek to a record and decompress it alone); mtime/OS
    fields are pinned so builds are byte-deterministic."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for r in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        # zlib's gzip header has mtime=0 / OS=255 by construction
        out.append(co.compress(r) + co.flush())
    return b"".join(out)


def _gunzip_all(data: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (multi-member stream)."""
    out = []
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        data = d.unused_data
        if not out[-1] and not data:
            break
    if data and not out:
        return data  # was never gzip
    out.append(data)
    return b"".join(out)


def _parse_headers(block: bytes) -> dict:
    hdrs = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            hdrs[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return hdrs


def _parse_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP/1.1 response payload → (status, content_type, body)."""
    sep = payload.find(_CRLF * 2)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    first, _, rest = head.partition(_CRLF)
    parts = first.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(rest).get("content-type")
    if ctype is not None:
        ctype = ctype.split(";")[0].strip()
    return status, ctype, body


def parse_warc(data: bytes) -> tuple[list[WarcRecord], int]:
    """WARC blob (plain or gzip) → (records, n_skipped).

    Malformed records are skipped by resyncing to the next record
    boundary; n_skipped counts them so callers can surface a metric
    (never an exception — one bad record must not kill a 1 GB blob)."""
    data = _gunzip_all(data)
    records: list[WarcRecord] = []
    skipped = 0
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"\r\nWARC/", pos)
            skipped += 1
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        hdr_end = data.find(_CRLF * 2, pos)
        if hdr_end < 0:
            skipped += 1
            break
        head = data[pos:hdr_end]
        _, _, field_block = head.partition(_CRLF)
        hdrs = _parse_headers(field_block)
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            nxt = data.find(b"\r\nWARC/", hdr_end)
            skipped += 1
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        body_start = hdr_end + 4
        if body_start + clen > n:
            skipped += 1
            break
        payload = data[body_start:body_start + clen]
        rec = WarcRecord(
            rec_type=hdrs.get("warc-type", "unknown"),
            url=hdrs.get("warc-target-uri"),
            date=hdrs.get("warc-date"),
            record_id=hdrs.get("warc-record-id"),
            content_type=hdrs.get("content-type"),
            headers=hdrs,
        )
        if rec.rec_type == "response" and (rec.content_type or "").startswith(
            "application/http"
        ):
            rec.http_status, rec.http_content_type, rec.body = (
                _parse_http_response(payload)
            )
        else:
            rec.body = payload
        records.append(rec)
        pos = body_start + clen
    return records, skipped
