"""MP3 frame-header metadata parser, from scratch (no DSP decode).

The engine's posture for compressed audio whose full decode would need a
real codec stack: parse the FRAME HEADERS (pure byte arithmetic, spec
tables) and report exact integer metadata — the same honesty contract as
``kernel/id3x.py`` for tags and ``kernel/exifx.py`` for images.  Full
MP3 sample decode (hybrid filterbank + Huffman) stays behind the marked
``decode_real`` fallback with ``decoded=False``.

Header layout (ISO/IEC 11172-3): each frame starts with an 11-bit sync
(``0xFF`` then top 3 bits of the next byte set), followed by version,
layer, bitrate index, sampling-rate index, and padding bit.  Frame
length for Layer III is ``samples_per_frame/8 * bitrate / samplerate +
padding`` bytes; Layer I uses 4-byte slots.  The walk skips a leading
ID3v2 tag (syncsafe size, same arithmetic as id3x) and STOPS at the
first byte run that is not a valid frame header — no mid-stream resync
(a resync heuristic can misparse arbitrary binary as audio; the honest
contract is "frames parsed from the start").

Reference anchor: engine-new (the reference fetches article media as
opaque bytes — src/feeds/rss_feeds/mod.rs photo path); grouped with the
multimodal metadata kernels SURVEY.md §6 adds for training-data
pipelines.
"""

from __future__ import annotations

__all__ = ["parse_mp3_frames", "synth_mp3", "MP3_FIELDS"]

MP3_FIELDS = ("has_id3", "n_frames", "version", "layer", "sample_rate",
              "bitrate_kbps_min", "bitrate_kbps_max", "vbr",
              "total_samples")

# bitrate tables, kbps, index 1..14 (0 = free format, 15 = invalid) —
# ISO 11172-3 Table B.1 / the MPEG2 LSF extension
_BITRATE = {
    # (version_key, layer): 14-entry table
    ("v1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
                416, 448),
    ("v1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384),
    ("v1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320),
    ("v2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                224, 256),
    ("v2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160),
    ("v2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160),
}

# sampling-rate tables by version bits (b1>>3 & 3): 0=MPEG2.5, 2=MPEG2,
# 3=MPEG1 (1 is reserved)
_SAMPLERATE = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

# samples per frame by (version_key, layer)
_SPF = {("v1", 1): 384, ("v1", 2): 1152, ("v1", 3): 1152,
        ("v2", 1): 384, ("v2", 2): 1152, ("v2", 3): 576}


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) \
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def _frame_at(p: bytes, pos: int):
    """Parse one frame header at pos; returns
    ``(frame_len, version_key, layer, samplerate, bitrate_kbps, spf)``
    or None if the bytes are not a valid supported frame header."""
    if pos + 4 > len(p):
        return None
    b0, b1, b2 = p[pos], p[pos + 1], p[pos + 2]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 3
    if vbits == 1:  # reserved
        return None
    lbits = (b1 >> 1) & 3
    if lbits == 0:  # reserved layer
        return None
    layer = 4 - lbits  # bits 3->layer1, 2->layer2, 1->layer3
    vkey = "v1" if vbits == 3 else "v2"  # MPEG2 and 2.5 share LSF tables
    br_idx = (b2 >> 4) & 0xF
    if br_idx in (0, 15):  # free-format / invalid: length unknowable
        return None
    sr_idx = (b2 >> 2) & 3
    if sr_idx == 3:
        return None
    bitrate = _BITRATE[(vkey, layer)][br_idx - 1]
    samplerate = _SAMPLERATE[vbits][sr_idx]
    padding = (b2 >> 1) & 1
    spf = _SPF[(vkey, layer)]
    if layer == 1:
        flen = (12 * bitrate * 1000 // samplerate + padding) * 4
    else:
        flen = spf // 8 * bitrate * 1000 // samplerate + padding
    if flen < 4:
        return None
    return flen, vkey, layer, samplerate, bitrate, spf


def parse_mp3_frames(payload: bytes | None) -> dict:
    """Bytes -> dict of :data:`MP3_FIELDS` (all None when no valid
    frame parses at the start; ``has_id3`` is still reported)."""
    out: dict = {k: None for k in MP3_FIELDS}
    out["has_id3"] = False
    if not payload:
        return out
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        out["has_id3"] = True
        pos = 10 + _syncsafe(payload[6:10])
    n = 0
    bitrates: list[int] = []
    total_samples = 0
    first = None
    while True:
        fr = _frame_at(payload, pos)
        if fr is None:
            break
        flen, vkey, layer, samplerate, bitrate, spf = fr
        if first is None:
            first = (vkey, layer, samplerate)
        elif (vkey, layer, samplerate) != first:
            break  # version/layer/rate change mid-stream: stop, honest
        if pos + flen > len(payload):
            break  # truncated final frame doesn't count
        n += 1
        bitrates.append(bitrate)
        total_samples += spf
        pos += flen
    if n == 0:
        return out
    vkey, layer, samplerate = first
    out.update(n_frames=n, version=vkey, layer=layer,
               sample_rate=samplerate,
               bitrate_kbps_min=min(bitrates),
               bitrate_kbps_max=max(bitrates),
               vbr=len(set(bitrates)) > 1,
               total_samples=total_samples)
    return out


def synth_mp3(n_frames: int, samplerate: int = 44100,
              bitrates_kbps: list[int] | int = 128,
              with_id3: bool = False, title: str = "T") -> bytes:
    """Deterministic CBR/VBR MPEG1 Layer III byte stream: real frame
    headers + zeroed frame bodies (header arithmetic is what the parser
    reads; the body content is irrelevant to metadata).  ``bitrates_kbps``
    may be a constant or a per-frame list (cycled)."""
    sr_table = _SAMPLERATE[3]
    if samplerate not in sr_table:
        raise ValueError(f"samplerate must be one of {sr_table}")
    sr_idx = sr_table.index(samplerate)
    rates = ([bitrates_kbps] if isinstance(bitrates_kbps, int)
             else list(bitrates_kbps))
    table = _BITRATE[("v1", 3)]
    body = b""
    for j in range(n_frames):
        kbps = rates[j % len(rates)]
        br_idx = table.index(kbps) + 1
        flen = 1152 // 8 * kbps * 1000 // samplerate
        hdr = bytes((0xFF, 0xFB,  # sync + MPEG1 + Layer III + no CRC
                     (br_idx << 4) | (sr_idx << 2),  # no padding
                     0x00))
        body += hdr + b"\x00" * (flen - 4)
    if with_id3:
        from news_rss_spark.kernel.id3x import synth_id3_mp3
        tag = synth_id3_mp3(title, version="v2.3")
        # synth_id3_mp3 appends a fake audio tail; keep only the tag
        tag = tag[:10 + _syncsafe(tag[6:10])]
        return tag + body
    return body
