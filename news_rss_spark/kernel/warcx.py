"""From-scratch WARC (Web ARChive, ISO 28500) record parsing — the input
format of real web-scale crawls (Common Crawl ships WARC; the reference's
fetch loop, src/feeds/rss_feeds/mod.rs:119, is the single-feed analog of
reading one crawl record).

Pure stdlib: header parsing by hand, per-record gzip members via zlib
(Common Crawl compresses each record as its own gzip member so readers can
split files without decompressing everything).  No warcio / external
libraries (north rule: parsers from scratch).

The parser never raises on malformed input — it yields the records it can
parse and stops at the first structurally broken one (same skip-row
contract as kernel/pdfx.py): a truncated tail in a 100 TB crawl must cost
one record, not the task.
"""

from __future__ import annotations

import zlib

CRLF2 = b"\r\n\r\n"


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl WARC
    layout); plain data passes through untouched."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break  # truncated/corrupt member: keep what decoded so far
        out.append(d.flush())
        data = d.unused_data
        if not data.startswith(b"\x1f\x8b"):
            break
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header lines -> dict with lower-cased keys; first occurrence wins
    (mirrors _parse_attrs' first-wins rule for duplicate names)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        key = k.strip().lower().decode("latin-1")
        if key not in headers:
            headers[key] = v.strip().decode("latin-1", "replace")
    return headers


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC file (optionally gzip-membered) into record dicts:
    ``{warc_type, url, date, status, http_headers, body}``.

    ``status``/``http_headers``/``body`` are populated for ``response``
    records carrying an HTTP message; other record types (warcinfo,
    request, metadata) keep their raw payload in ``body`` with status -1.
    """
    data = gunzip_members(data)
    records: list[dict] = []
    i, n = 0, len(data)
    while i < n:
        # skip inter-record padding
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            break  # structurally broken: stop, keep parsed prefix
        hdr_end = data.find(CRLF2, i)
        if hdr_end == -1:
            break
        headers = _parse_headers(data[i:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = data[hdr_end + 4:hdr_end + 4 + length]
        if len(payload) < length:
            break  # truncated record
        i = hdr_end + 4 + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "status": -1,
            "http_headers": {},
            "body": payload,
        }
        ctype = headers.get("content-type", "")
        # case-insensitive gates: WARC-Type tokens and MIME parameters are
        # matched by real readers regardless of producer casing (RFC 2045
        # makes parameter names/values case-insensitive; the round-2 HTML
        # tokenizer review caught exactly this class with CLASS=) — the
        # OUTPUT values stay raw
        if (rec["warc_type"].lower() == "response"
                and "msgtype=response" in ctype.replace(" ", "").lower()):
            he = payload.find(CRLF2)
            if he != -1:
                status_block = payload[:he]
                first, _, rest = status_block.partition(b"\r\n")
                parts = first.split(None, 2)
                if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                    try:
                        rec["status"] = int(parts[1])
                    except ValueError:
                        pass
                    rec["http_headers"] = _parse_headers(rest)
                    rec["body"] = payload[he + 4:]
        records.append(rec)
    return records


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records into WARC bytes (the synth/test writer; also the
    shape a crawl sink would emit).  Each record dict:
    ``{url, date, status, http_headers: dict, body: bytes}``."""
    out = []
    for idx, r in enumerate(records):
        http = b"HTTP/1.1 %d OK\r\n" % r.get("status", 200)
        for k, v in r.get("http_headers", {}).items():
            http += k.encode("latin-1") + b": " + v.encode("latin-1") + b"\r\n"
        body = r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
        payload = http + b"\r\n" + body
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:%08d>\r\n" % idx
            + b"WARC-Date: " + r.get("date", "2025-01-05T10:00:00Z").encode()
            + b"\r\n"
            + b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(payload)
        )
        rec = hdr + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)
