"""ID3 audio-tag extraction (ID3v2.3/2.4 text frames + ID3v1 trailer) —
from scratch.

The audio leg of the media-provenance family (EXIF images —
``exifx.py``; caption files — ``subx.py``): title/artist/album/year from
the tag block without decoding any audio.  A crawl's podcast/audio
documents get dedup keys and attribution metadata from exactly these
frames.

Supported:

- ID3v2 header (``ID3``, version, sync-safe 28-bit size), v2.3 frames
  (plain 32-bit size) and v2.4 frames (sync-safe size); text frames
  TIT2/TPE1/TALB/TYER/TDRC with encodings 0 (latin-1), 1 (utf-16 BOM),
  2 (utf-16be), 3 (utf-8);
- ID3v1: the 128-byte ``TAG`` trailer as the fallback when no v2 block
  is present (fixed 30-byte latin-1 fields, zero/space padded).

Never raises: truncated/garbled tags degrade to absent fields.
``synth_id3_mp3`` builds a minimal payload (v2.3, v2.4 or v1) for
tests/oracles.
"""

from __future__ import annotations

import struct

__all__ = ["extract_id3", "synth_id3_mp3", "ID3_FIELDS"]

ID3_FIELDS = ("title", "artist", "album", "year", "tag_version")

_FRAME_FIELDS = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                 "TYER": "year", "TDRC": "year"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(data: bytes) -> str | None:
    if not data:
        return None
    enc, body = data[0], data[1:]
    try:
        if enc == 0:
            s = body.decode("latin-1")
        elif enc == 1:
            s = body.decode("utf-16")
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    s = s.split("\x00", 1)[0].strip()
    return s or None


def extract_id3(payload: bytes | None) -> dict:
    """MP3 (or any) bytes -> dict of :data:`ID3_FIELDS`."""
    out: dict = {k: None for k in ID3_FIELDS}
    if not payload:
        return out
    if payload[:3] == b"ID3" and len(payload) >= 10:
        major = payload[3]
        flags = payload[5]
        size = _syncsafe(payload[6:10])
        end = min(10 + size, len(payload))
        pos = 10
        if flags & 0x80:
            # tag-level unsynchronisation shifts every frame offset; we
            # don't re-synchronise, so emit absent fields (the v1 tail
            # fallback below may still recover them) rather than walking
            # garbled offsets
            out["tag_version"] = f"id3v2.{major}"
            pos = end
        elif flags & 0x40 and pos + 4 <= end:
            # skip the extended header: v2.4 stores its length syncsafe
            # and INCLUDES the 4 length bytes; v2.3 stores it big-endian
            # EXCLUDING them
            if major >= 4:
                pos += max(_syncsafe(payload[pos:pos + 4]), 6)
            else:
                (ehlen,) = struct.unpack_from(">I", payload, pos)
                pos += 4 + ehlen
        while pos + 10 <= end:
            fid = payload[pos:pos + 4]
            if not fid.strip(b"\x00"):
                break
            if major >= 4:
                fsize = _syncsafe(payload[pos + 4:pos + 8])
            else:
                (fsize,) = struct.unpack_from(">I", payload, pos + 4)
            fflags = payload[pos + 9] if pos + 10 <= len(payload) else 0
            # per-frame compression/encryption/unsync: data is not plain
            # text — leave the field absent instead of decoding garbage
            skip = (fflags & 0x0F) if major >= 4 else (fflags & 0xC0)
            data = payload[pos + 10:pos + 10 + fsize]
            field = _FRAME_FIELDS.get(fid.decode("latin-1", "replace"))
            if field and out[field] is None and not skip:
                out[field] = _decode_text(data)
            pos += 10 + fsize
        out["tag_version"] = f"id3v2.{major}"
        if any(out[k] is not None for k in ID3_FIELDS if k != "tag_version") \
                or not (flags & 0x80):
            return out
        # unsync tag with nothing recovered: fall through to the v1 tail
    if len(payload) >= 128 and payload[-128:-125] == b"TAG":
        t = payload[-128:]

        def fld(a: int, b: int) -> str | None:
            s = t[a:b].split(b"\x00", 1)[0].decode("latin-1").strip()
            return s or None

        out["title"] = fld(3, 33)
        out["artist"] = fld(33, 63)
        out["album"] = fld(63, 93)
        out["year"] = fld(93, 97)
        out["tag_version"] = "id3v1"
    return out


def synth_id3_mp3(title: str = "T", artist: str = "A", album: str = "L",
                  year: str = "2025", version: str = "v2.3") -> bytes:
    """Minimal payload carrying the fields in the chosen tag flavor,
    followed by a fake audio byte."""
    if version == "v1":
        tag = (b"TAG"
               + title.encode("latin-1").ljust(30, b"\x00")
               + artist.encode("latin-1").ljust(30, b"\x00")
               + album.encode("latin-1").ljust(30, b"\x00")
               + year.encode("latin-1").ljust(4, b"\x00")
               + b"\x00" * 31)
        return b"\xffaudio" + tag
    v4 = version == "v2.4"
    frames = b""
    pairs = [(b"TIT2", title), (b"TPE1", artist), (b"TALB", album),
             (b"TDRC" if v4 else b"TYER", year)]
    for fid, val in pairs:
        data = b"\x03" + val.encode("utf-8") if v4 \
            else b"\x00" + val.encode("latin-1")
        if v4:
            n = len(data)
            size = bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F,
                          (n >> 7) & 0x7F, n & 0x7F))
        else:
            size = struct.pack(">I", len(data))
        frames += fid + size + b"\x00\x00" + data
    n = len(frames)
    header = (b"ID3" + (b"\x04" if v4 else b"\x03") + b"\x00\x00"
              + bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F,
                       (n >> 7) & 0x7F, n & 0x7F)))
    return header + frames + b"\xffaudio"
