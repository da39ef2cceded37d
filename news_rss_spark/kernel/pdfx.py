"""Minimal PDF text extraction from scratch (north-rule "PDF/layout
parse" clause; engine-new — the reference ingests HTML only).

Real parsing, no external library:

- object/stream discovery by direct scan (``stream``/``endstream``
  delimiters with the preceding object dictionary) — robust to missing or
  damaged xref tables, which is what you want over a web-scale crawl;
- ``/FlateDecode`` content streams really decompressed (stdlib zlib);
- text extraction from content-stream operators: ``BT``/``ET`` text
  blocks, ``Tj`` (show string), ``'`` and ``"`` (next-line show), ``TJ``
  (array show with kerning numbers), with line-advance operators
  (``Td``/``TD``/``T*``) rendered as newlines — the layout heuristic a
  reading-order extractor needs;
- PDF literal strings with the full escape set (``\\(`` ``\\)`` ``\\\\``
  ``\\n`` ``\\r`` ``\\t`` ``\\b`` ``\\f``, octal ``\\ddd``, and
  line-continuation backslash) plus ``<hex>`` strings.

Unsupported (compressed-codec analog): encrypted PDFs, CID/Type0 composite
fonts (bytes are not char codes there), and non-Flate filters raise
``ValueError`` — callers surface those as skip rows, mirroring the
kernel's log-and-continue semantics.

``synth_pdf`` builds a small single-page PDF (optionally Flate-compressed)
so every parser path is exercised round-trip with no external fixtures.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/(\w+)")
# (?!\d) pins the capture to the FULL digit run before the indirect-ref
# lookahead applies: without it, '/Length 123 0 R' backtracks to '12' and
# the '(?! 0 R)' guard is defeated — mis-slicing the stream
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _find_streams(payload: bytes) -> list[tuple[bytes, bytes]]:
    """[(object dict bytes, raw stream bytes)] by direct delimiter scan."""
    out = []
    pos = 0
    while True:
        m = _STREAM_RE.search(payload, pos)
        if not m:
            return out
        dict_start = payload.rfind(b"<<", 0, m.start())
        obj_dict = payload[dict_start:m.start()] if dict_start != -1 else b""
        lm = _LENGTH_RE.search(obj_dict)
        if lm:
            # exact byte count from the dict — binary-safe (a trailing-EOL
            # trim would eat real data when a compressed stream happens to
            # end in \r or \n)
            length = int(lm.group(1))
            data = payload[m.end():m.end() + length]
            end = payload.find(b"endstream", m.end() + length)
        else:
            end = payload.find(b"endstream", m.end())
            if end == -1:
                return out
            data = payload[m.end():end]
            # spec: an EOL may precede endstream and is not stream data
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n") or data.endswith(b"\r"):
                data = data[:-1]
        if end == -1:
            out.append((obj_dict, data))
            return out
        out.append((obj_dict, data))
        pos = end + 9


# per-stream decompressed-size cap: crawl PDFs are untrusted, and an
# unbounded zlib.decompress lets a crafted FlateDecode stream (a
# decompression bomb — ~1000:1 ratios are trivial) OOM the executor, a
# failure mode the skip-row contract cannot catch after the fact
MAX_STREAM_BYTES = 64 << 20


def decompress_capped(data: bytes, max_out: int = MAX_STREAM_BYTES) -> bytes:
    """zlib inflate with a hard output cap.  Mirrors one-shot
    ``zlib.decompress`` semantics otherwise: trailing bytes after a
    complete stream are ignored, a truncated stream raises.  Oversized
    output raises ValueError so callers' skip-row contract absorbs it."""
    d = zlib.decompressobj()
    out = d.decompress(data, max_out)
    if d.unconsumed_tail:
        raise ValueError(
            f"FlateDecode output exceeds {max_out} bytes "
            "(decompression bomb?)")
    if not d.eof:
        raise ValueError("incomplete or truncated FlateDecode stream")
    return out


def _decode_stream(obj_dict: bytes, data: bytes) -> bytes:
    m = _FILTER_RE.search(obj_dict)
    if m is None:
        return data
    filt = m.group(1)
    if filt == b"FlateDecode":
        try:
            return decompress_capped(data)
        except zlib.error as exc:
            # zlib.error is NOT a ValueError — without this translation a
            # corrupt stream escapes the skip-row contract and kills the job
            raise ValueError(f"corrupt FlateDecode stream: {exc}") from exc
    raise ValueError(f"unsupported PDF stream filter /{filt.decode()}")


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at the '('; returns (text, next)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        b = data[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                j = i
                while j < n and j - i < 3 and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8)))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(e))
                i += 1
        elif b == 0x28:  # nested (
            depth += 1
            out.append("(")
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(b))
            i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i)
    if end == -1:
        end = len(data)
    hexdigits = re.sub(rb"\s", b"", data[i + 1:end])
    if len(hexdigits) % 2:
        hexdigits += b"0"  # spec: odd count -> trailing zero
    return bytes.fromhex(hexdigits.decode("ascii", "ignore")).decode(
        "latin-1"), end + 1


_TOKEN_RE = re.compile(rb"\(|<(?![<])|\[|\]|BT|ET|TJ|Tj|T\*|Td|TD|'|\"")


def _extract_content_text(content: bytes) -> list[str]:
    """Text runs from one content stream, line-advance ops -> new lines."""
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    pending: list[str] = []  # strings seen since the last operator

    def flush_line():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    i, n = 0, len(content)
    while i < n:
        m = _TOKEN_RE.search(content, i)
        if not m:
            break
        tok = m.group(0)
        i = m.end()
        if tok == b"(":
            s, i = _parse_literal_string(content, m.start())
            pending.append(s)
        elif tok == b"<":
            s, i = _parse_hex_string(content, m.start())
            pending.append(s)
        elif tok == b"BT":
            in_text = True
            pending.clear()
        elif tok == b"ET":
            flush_line()
            in_text = False
            pending.clear()
        elif tok in (b"Tj", b"TJ"):
            if in_text and pending:
                cur.extend(pending)
            pending.clear()
        elif tok in (b"T*", b"Td", b"TD"):
            # line advance: Td/TD arguments already consumed as numbers
            if in_text:
                flush_line()
            pending.clear()
        elif tok in (b"'", b'"'):
            # move to next line and show
            if in_text:
                flush_line()
                cur.extend(pending)
            pending.clear()
        elif tok in (b"[", b"]"):
            continue  # TJ array delimiters; numbers (kerning) are skipped
    flush_line()
    return lines


def extract_pdf_text(payload: bytes | None) -> str:
    """All text shown by the document's content streams, reading order,
    lines joined with newlines.  Raises ValueError on unsupported filters
    (callers convert to skip rows)."""
    if not payload or not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF payload")
    lines: list[str] = []
    for obj_dict, raw in _find_streams(payload):
        content = _decode_stream(obj_dict, raw)
        if b"BT" not in content:
            continue
        lines.extend(_extract_content_text(content))
    return "\n".join(lines)


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def synth_pdf(lines: list[str], compress: bool = False) -> bytes:
    """A minimal single-page PDF showing ``lines`` via BT/Td/Tj; optional
    real FlateDecode compression.  Deterministic."""
    shows = "\n".join(
        f"1 0 0 1 72 {720 - 14 * i} Tm ({_escape_pdf_string(line)}) Tj T*"
        for i, line in enumerate(lines)
    )
    content = f"BT /F1 12 Tf 14 TL\n{shows}\nET".encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj",
        b"4 0 obj << /Length %d%s >> stream\n%s\nendstream endobj"
        % (len(content), filt, content),
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj",
    ]
    body = b"%PDF-1.4\n" + b"\n".join(objs)
    return body + b"\ntrailer << /Root 1 0 R >>\n%%EOF\n"
