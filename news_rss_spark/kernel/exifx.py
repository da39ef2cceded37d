"""EXIF metadata extraction (JPEG APP1 / TIFF IFD walk) — from scratch.

Media documents carry provenance in their EXIF block: camera make/model,
capture time, orientation — and GPS coordinates, which are PII a
training corpus must surface to its governance gates (the multimodal
counterpart of pii_redact/k_anonymity).  This kernel walks the JPEG
marker stream to the ``APP1 "Exif\\0\\0"`` segment, then the TIFF
structure inside it: byte-order header (II little / MM big endian),
IFD0 entries, the ExifIFD and GPS sub-IFDs via their pointer tags.

Supported (the fields pipelines act on):

- Make (0x010F), Model (0x0110), Orientation (0x0112),
  DateTime (0x0132) from IFD0;
- DateTimeOriginal (0x9003) from the Exif sub-IFD (0x8769);
- GPS latitude/longitude (0x0002/0x0004 with 0x0001/0x0003 refs) from
  the GPS sub-IFD (0x8825), converted to signed decimal degrees.

Never raises: truncated segments, bad offsets, absent IFDs all degrade
to absent fields.  ``synth_exif_jpeg`` builds a minimal valid JPEG with
a chosen EXIF block for tests/oracles (both endiannesses).
"""

from __future__ import annotations

import struct

__all__ = ["extract_exif", "synth_exif_jpeg", "EXIF_FIELDS"]

EXIF_FIELDS = ("make", "model", "orientation", "datetime",
               "datetime_original", "gps_lat", "gps_lon")

_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5
_TYPE_SIZE = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, _RATIONAL: 8, 7: 1}


def _read_ifd(data: bytes, offset: int, e: str) -> dict[int, tuple]:
    """One IFD -> {tag: (type, count, value_bytes_or_offset_payload)}."""
    out: dict[int, tuple] = {}
    if offset + 2 > len(data):
        return out
    (n,) = struct.unpack_from(e + "H", data, offset)
    pos = offset + 2
    for _ in range(n):
        if pos + 12 > len(data):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, pos)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = data[pos + 8:pos + 8 + size]
        else:
            (off,) = struct.unpack_from(e + "I", data, pos + 8)
            raw = data[off:off + size]
        out[tag] = (typ, cnt, raw)
        pos += 12
    return out


def _ascii(entry: tuple | None) -> str | None:
    if entry is None or entry[0] != _ASCII:
        return None
    s = entry[2].split(b"\0", 1)[0]
    try:
        return s.decode("ascii").strip() or None
    except UnicodeDecodeError:
        return None


def _short(entry: tuple | None, e: str) -> int | None:
    if entry is None or entry[0] != _SHORT or len(entry[2]) < 2:
        return None
    return struct.unpack_from(e + "H", entry[2])[0]


def _long(entry: tuple | None, e: str) -> int | None:
    if entry is None or len(entry[2]) < 4:
        return None
    return struct.unpack_from(e + "I", entry[2])[0]


def _dms(entry: tuple | None, e: str) -> float | None:
    """GPS rational triple (deg, min, sec) -> decimal degrees."""
    if entry is None or entry[0] != _RATIONAL or len(entry[2]) < 24:
        return None
    vals = []
    for i in range(3):
        num, den = struct.unpack_from(e + "II", entry[2], i * 8)
        vals.append(num / den if den else 0.0)
    return vals[0] + vals[1] / 60.0 + vals[2] / 3600.0


def extract_exif(payload: bytes | None) -> dict:
    """JPEG bytes -> dict of :data:`EXIF_FIELDS` (absent -> None)."""
    out: dict = {k: None for k in EXIF_FIELDS}
    if not payload or payload[:2] != b"\xff\xd8":
        return out
    # marker walk to APP1/Exif
    pos, n = 2, len(payload)
    tiff: bytes | None = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, stop scanning
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if marker == 0xE1 and payload[pos + 4:pos + 10] == b"Exif\x00\x00":
            tiff = payload[pos + 10:pos + 2 + seglen]
            break
        pos += 2 + seglen
    if tiff is None or len(tiff) < 8:
        return out
    order = tiff[:2]
    e = "<" if order == b"II" else ">" if order == b"MM" else None
    if e is None or struct.unpack_from(e + "H", tiff, 2)[0] != 42:
        return out
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, e)
    out["make"] = _ascii(ifd0.get(0x010F))
    out["model"] = _ascii(ifd0.get(0x0110))
    out["orientation"] = _short(ifd0.get(0x0112), e)
    out["datetime"] = _ascii(ifd0.get(0x0132))
    exif_off = _long(ifd0.get(0x8769), e)
    if exif_off is not None:
        sub = _read_ifd(tiff, exif_off, e)
        out["datetime_original"] = _ascii(sub.get(0x9003))
    gps_off = _long(ifd0.get(0x8825), e)
    if gps_off is not None:
        gps = _read_ifd(tiff, gps_off, e)
        lat = _dms(gps.get(0x0002), e)
        lon = _dms(gps.get(0x0004), e)
        lat_ref = _ascii(gps.get(0x0001))
        lon_ref = _ascii(gps.get(0x0003))
        if lat is not None:
            out["gps_lat"] = round(-lat if lat_ref == "S" else lat, 6)
        if lon is not None:
            out["gps_lon"] = round(-lon if lon_ref == "W" else lon, 6)
    return out


def _entry(e: str, tag: int, typ: int, cnt: int, payload: bytes,
           heap: bytearray, heap_base: int) -> bytes:
    if len(payload) <= 4:
        return struct.pack(e + "HHI", tag, typ, cnt) + payload.ljust(4, b"\0")
    off = heap_base + len(heap)
    heap.extend(payload)
    return struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(e + "I", off)


def synth_exif_jpeg(make: str = "Cam", model: str = "M1",
                    orientation: int = 1,
                    datetime_str: str = "2025:01:01 10:00:00",
                    lat: tuple | None = None, lat_ref: str = "N",
                    lon: tuple | None = None, lon_ref: str = "E",
                    little_endian: bool = True) -> bytes:
    """Minimal JPEG (SOI + APP1 Exif + EOI) carrying the given fields;
    ``lat``/``lon`` are ((dn,dd),(mn,md),(sn,sd)) rational triples."""
    e = "<" if little_endian else ">"
    order = b"II" if little_endian else b"MM"

    entries: list[tuple[int, int, int, bytes]] = [
        (0x010F, _ASCII, len(make) + 1, make.encode() + b"\0"),
        (0x0110, _ASCII, len(model) + 1, model.encode() + b"\0"),
        (0x0112, _SHORT, 1, struct.pack(e + "H", orientation)),
        (0x0132, _ASCII, len(datetime_str) + 1,
         datetime_str.encode() + b"\0"),
    ]
    n_ifd0 = len(entries) + (1 if lat is not None else 0)
    ifd0_off = 8
    ifd0_size = 2 + n_ifd0 * 12 + 4
    gps_off = ifd0_off + ifd0_size
    gps_entries = []
    if lat is not None:
        gps_entries = [
            (0x0001, _ASCII, 2, lat_ref.encode() + b"\0"),
            (0x0002, _RATIONAL, 3,
             b"".join(struct.pack(e + "II", *p) for p in lat)),
            (0x0003, _ASCII, 2, lon_ref.encode() + b"\0"),
            (0x0004, _RATIONAL, 3,
             b"".join(struct.pack(e + "II", *p) for p in lon)),
        ]
        entries.append((0x8825, _LONG, 1, struct.pack(e + "I", gps_off)))
    gps_size = (2 + len(gps_entries) * 12 + 4) if gps_entries else 0
    heap_base = gps_off + gps_size
    heap = bytearray()

    def build_ifd(ents, base_off):
        body = struct.pack(e + "H", len(ents))
        for tag, typ, cnt, payload in sorted(ents):
            body += _entry(e, tag, typ, cnt, payload, heap, heap_base)
        return body + struct.pack(e + "I", 0)

    ifd0 = build_ifd(entries, ifd0_off)
    gps = build_ifd(gps_entries, gps_off) if gps_entries else b""
    tiff = order + struct.pack(e + "H", 42) + struct.pack(e + "I", 8) \
        + ifd0 + gps + bytes(heap)
    app1 = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xE1, len(app1) + 2) + app1
            + b"\xff\xd9")
