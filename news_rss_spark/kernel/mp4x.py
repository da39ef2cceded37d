"""MP4 / ISO BMFF box-walk metadata parser, from scratch (no codec).

The container-level complement of ``kernel/mp3x.py``: H.264/AAC sample
decode needs a real codec stack and stays behind the marked
``decode_real`` fallback, but the ISO base-media container (ISO/IEC
14496-12) is plain length-prefixed box structure — duration, track
count, and video dimensions are exact integer reads.  Same honesty
posture as the ID3/EXIF/MP3-frame kernels: report what a byte walk can
prove, never fabricate.

Box layout: ``[size:u32][type:4cc][payload]``, nested; ``size == 1``
means a u64 largesize follows, ``size == 0`` means "to end of file".
We walk ``moov`` for ``mvhd`` (timescale + duration; version 0 = u32
fields, version 1 = u64), count ``trak`` boxes, classify handlers from
``hdlr`` (``vide``/``soun``), and read the first video track's
width/height from ``tkhd`` (16.16 fixed point).  Unknown boxes are
skipped by size — the parser never assumes an exhaustive grammar.
Malformed sizes (truncated, below header width) stop the walk; fields
already read stay reported.

Reference anchor: engine-new (the reference stores fetched media as
opaque bytes — src/feeds/rss_feeds/mod.rs photo path); grouped with
the multimodal metadata kernels SURVEY.md §6 adds.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4_boxes", "synth_mp4", "MP4_FIELDS"]

MP4_FIELDS = ("is_bmff", "major_brand", "n_tracks", "timescale",
              "duration_ms", "has_video", "has_audio", "width", "height")


def _boxes(p: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the sibling boxes in
    p[start:end]; stops (never raises) on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", p, pos)
        btype = p[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", p, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def parse_mp4_boxes(payload: bytes | None) -> dict:
    """Bytes -> dict of :data:`MP4_FIELDS`.  ``is_bmff`` is False (all
    other fields None) unless the payload leads with a valid ``ftyp``."""
    out: dict = {k: None for k in MP4_FIELDS}
    out["is_bmff"] = False
    if not payload or len(payload) < 12:
        return out
    top = list(_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        return out
    ft_s, ft_e = top[0][1], top[0][2]
    if ft_e - ft_s < 4:
        return out
    out["is_bmff"] = True
    out["major_brand"] = payload[ft_s:ft_s + 4].decode("latin-1").strip()
    n_tracks = 0
    has_video = has_audio = False
    for btype, s, e in top:
        if btype != b"moov":
            continue
        for ctype, cs, ce in _boxes(payload, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                version = payload[cs]
                if version == 1:
                    # v1 layout: the >IQ unpack at cs+20 needs 12 bytes
                    # (through cs+32).  A shorter v1 box is malformed —
                    # skip it rather than raise at end-of-payload or
                    # silently read the next sibling's bytes mid-file
                    # (ADVICE r4, fixed round 5).
                    if ce - cs < 32:
                        continue
                    timescale, duration = struct.unpack_from(
                        ">IQ", payload, cs + 20)
                else:
                    timescale, duration = struct.unpack_from(
                        ">II", payload, cs + 12)
                out["timescale"] = timescale
                if timescale:
                    out["duration_ms"] = duration * 1000 // timescale
            elif ctype == b"trak":
                n_tracks += 1
                t_kind = None
                t_w = t_h = None
                for ttype, ts, te in _boxes(payload, cs, ce):
                    if ttype == b"tkhd" and te - ts >= 84:
                        version = payload[ts]
                        # width/height are the LAST 8 bytes, 16.16 fixed
                        t_w = struct.unpack_from(">I", payload, te - 8)[0] >> 16
                        t_h = struct.unpack_from(">I", payload, te - 4)[0] >> 16
                    elif ttype == b"mdia":
                        for mtype, ms, me in _boxes(payload, ts, te):
                            if mtype == b"hdlr" and me - ms >= 12:
                                t_kind = payload[ms + 8:ms + 12]
                if t_kind == b"vide":
                    has_video = True
                    if out["width"] is None and t_w:
                        out["width"], out["height"] = t_w, t_h
                elif t_kind == b"soun":
                    has_audio = True
        break  # first moov wins
    out.update(n_tracks=n_tracks, has_video=has_video, has_audio=has_audio)
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def synth_mp4(duration_ms: int, timescale: int = 1000,
              width: int = 0, height: int = 0,
              with_audio: bool = False,
              major_brand: bytes = b"isom") -> bytes:
    """Deterministic minimal BMFF file: ftyp + moov(mvhd + traks).
    ``width > 0`` adds a video track; ``with_audio`` adds a sound track.
    Duration is stored exactly as ``duration_ms * timescale // 1000``
    movie-timescale units."""
    mvhd = (b"\x00" + b"\x00\x00\x00"            # version 0 + flags
            + struct.pack(">II", 0, 0)           # ctime, mtime
            + struct.pack(">II", timescale,
                          duration_ms * timescale // 1000)
            + b"\x00" * 80)                      # rate..next_track_id
    traks = b""

    def trak(kind: bytes, w: int, h: int) -> bytes:
        tkhd = (b"\x00" + b"\x00\x00\x07"
                + b"\x00" * 72                   # v0 fields up to matrix end
                + struct.pack(">II", w << 16, h << 16))
        hdlr = (b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" + kind
                + b"\x00" * 12 + b"\x00")
        mdia = _box(b"mdia", _box(b"hdlr", hdlr))
        return _box(b"trak", _box(b"tkhd", tkhd) + mdia)

    if width > 0:
        traks += trak(b"vide", width, height)
    if with_audio:
        traks += trak(b"soun", 0, 0)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", major_brand + struct.pack(">I", 0) + b"isom")
    return ftyp + moov
