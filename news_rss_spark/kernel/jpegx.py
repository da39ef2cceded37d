"""From-scratch baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

Implements the mainline still-image profile with no library beyond
numpy: marker walk (SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI), Huffman entropy
coding driven entirely by the DHT tables in the file (the decoder reads
ANY valid table, including the Annex K defaults other encoders write),
differential DC + run/size AC coefficient coding with byte stuffing,
zigzag ordering, dequantization, and an exact orthonormal 8x8 IDCT —
for grayscale (1 component) and non-subsampled 4:4:4 YCbCr/RGB-as-3-
component images.  Out-of-profile files (progressive SOF2, chroma
subsampling, 16-bit quant tables, restart intervals, arithmetic coding)
raise ValueError so the pipeline's skip-row / fallback contracts absorb
them — the same contract as decode_png / decode_gif.

The encoder exists so tests and the synthesis generators can produce
real JPEG payloads deterministically.  It writes simple canonical
Huffman tables (every DC category at 4 bits, every AC run/size symbol
at 8 bits) instead of the Annex K defaults — legal JPEG, since the DHT
segment carries the table and the decoder trusts only the file.  JPEG
is lossy in general, but an image whose every 8x8 block is a single
flat colour has energy only in the DC coefficient, which baseline JPEG
represents EXACTLY (quant table of ones): for such images
``decode_jpeg(encode_jpeg(x)) == x`` bit-for-bit, which is what lets a
SQL oracle check the full Huffman/zigzag/dequant/IDCT chain integer-
exactly (see synth_jpeg_media / the ``jpeg_decode_stats`` query).

Reference intent analog: the news-rss photo handling
(src/feeds/rss_feeds/mod.rs:194-197) treats article images as opaque
payloads; this module is the decode stage a training-data pipeline
bolts on top.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: C @ block @ C.T is exactly the
    T.81 FDCT (the 1/4 C(u)C(v) normalization folds into orthonormal
    row scaling), and C.T @ coeffs @ C is the exact IDCT."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c

_C = _dct_matrix()


# ----------------------------------------------------------------- Huffman

def _build_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical code assignment per T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), same canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


# encoder-side tables: trivially canonical, valid, carried in DHT
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = _AC_SYMBOLS


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; a marker (0xFF xx, xx != 0) ends the stream."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(d) and d[self.pos] == 0x00:
                self.pos += 1          # stuffed byte
            else:
                raise ValueError("unexpected marker in JPEG entropy stream")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits back to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------------ encode

def encode_jpeg(arr: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Baseline sequential JPEG encode: (h, w) grayscale or (h, w, 3)
    colour (stored as non-subsampled 4:4:4, components written as-is —
    callers wanting standards-typical colour should pass YCbCr) ->
    SOI + DQT + SOF0 + DHT + SOS + entropy data + EOI.

    ``qtable`` is the 8x8 quantization table (natural order); default is
    all-ones — lossless for flat 8x8 blocks, near-lossless elsewhere."""
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = [arr[:, :, i] for i in range(3)]
    else:
        raise ValueError("encode_jpeg wants (h, w) or (h, w, 3) uint8")
    h, w = arr.shape[:2]
    if h <= 0 or w <= 0 or h > 65535 or w > 65535:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    q = (np.ones((8, 8), dtype=np.int64) if qtable is None
         else np.asarray(qtable, dtype=np.int64).reshape(8, 8))
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant table entries must be in 1..255")
    n_comp = len(planes)

    dc_enc = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _build_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)

    # pad each plane to multiples of 8 by edge replication
    bh, bw = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp - 128.0)

    bw_writer = _BitWriter()
    pred = [0] * n_comp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(n_comp):
                block = padded[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = _C @ block @ _C.T
                qc = np.round(coef / q).astype(np.int64)
                zz = qc.reshape(64)[ZIGZAG]
                # DC (differential)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = dc_enc[t]
                bw_writer.write(code, ln)
                if t:
                    bw_writer.write(
                        diff if diff >= 0 else diff + (1 << t) - 1, t)
                # AC (run/size)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_enc[0xF0]  # ZRL
                        bw_writer.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_enc[(run << 4) | s]
                    bw_writer.write(code, ln)
                    bw_writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, ln = ac_enc[0x00]  # EOB
                    bw_writer.write(code, ln)
    bw_writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz_q = q.reshape(64)[ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_q))
    comps = b"".join(struct.pack(">BBB", i + 1, 0x11, 0)
                     for i in range(n_comp))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, n_comp) + comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
              + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    scomps = b"".join(struct.pack(">BB", i + 1, 0x00)
                      for i in range(n_comp))
    sos = seg(0xDA, bytes([n_comp]) + scomps + bytes([0, 63, 0]))
    return (b"\xFF\xD8" + dqt + sof + dht + sos + bytes(bw_writer.out)
            + b"\xFF\xD9")


# ------------------------------------------------------------------ decode

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Skip-row boundary for :func:`_decode_jpeg_impl`: segments whose
    declared lengths lie about their contents surface as IndexError /
    struct.error from the slicing — exactly the errors malformed bytes
    produce and nothing a correct file can raise — translated here to
    the one contracted ValueError (same rationale as decode_wav's
    wave.Error translation; found by the mutated-bytes hypothesis
    fuzz)."""
    try:
        return _decode_jpeg_impl(payload)[0]
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def encode_mjpeg(frames: list[np.ndarray],
                 qtable: np.ndarray | None = None) -> bytes:
    """Raw MJPEG stream: the concatenation of independently-coded
    baseline JPEG frames (the payload shape of multipart MJPEG HTTP
    streams and AVI ``MJPG`` chunks, minus the container framing)."""
    if not frames:
        raise ValueError("MJPEG stream needs at least one frame")
    return b"".join(encode_jpeg(f, qtable) for f in frames)


def decode_mjpeg(payload: bytes) -> list[np.ndarray]:
    """Decode a raw MJPEG stream into its frames.

    Frame boundaries are NOT found by scanning for 0xFFD9 (an APPn/COM
    segment may legally contain those bytes): each frame is decoded by
    the real marker walk + entropy decode, which knows exactly where its
    scan data ends, and the EOI marker is then required at that position
    before the next SOI.  Same skip-row error translation as
    :func:`decode_jpeg`."""
    frames: list[np.ndarray] = []
    pos = 0
    try:
        while pos < len(payload):
            arr, pos = _decode_jpeg_impl(payload, pos)
            frames.append(arr)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed MJPEG: {exc}") from exc
    if not frames:
        raise ValueError("empty MJPEG payload")
    return frames


def _decode_jpeg_impl(payload: bytes, start: int = 0) -> tuple[np.ndarray, int]:
    """Baseline sequential JPEG decode, from scratch: marker walk, DQT /
    SOF0 / DHT / SOS parse, Huffman + differential-DC + run/size-AC
    entropy decode with byte unstuffing, dezigzag, dequantize, exact
    orthonormal IDCT, level shift + clamp -> (h, w) or (h, w, 3) uint8.

    Profile: 8-bit baseline (SOF0), 1 or 3 components, no subsampling
    (all sampling factors 1x1), no restart intervals.  Anything else
    raises ValueError (skip-row contract).

    Returns ``(array, end)`` where ``end`` is the offset just past this
    frame's EOI marker — what lets :func:`decode_mjpeg` walk a
    concatenated-frame stream without guessing at boundaries."""
    if len(payload) < start + 4 or payload[start:start + 2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = start + 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:
            raise ValueError("JPEG has no scan data")
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg_data = payload[pos + 4:pos + 2 + ln]
        if len(seg_data) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            p = 0
            while p < len(seg_data):
                pq, tq = seg_data[p] >> 4, seg_data[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant table unsupported")
                vals = np.frombuffer(seg_data, dtype=np.uint8,
                                     count=64, offset=p + 1)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg_data):
                tc, th = seg_data[p] >> 4, seg_data[p] & 0x0F
                bits = list(seg_data[p + 1:p + 17])
                nv = sum(bits)
                vals = seg_data[p + 17:p + 17 + nv]
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", seg_data[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg_data[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 "
                                     "and grayscale only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:
            ns = seg_data[0]
            scan = [(seg_data[1 + 2 * i], seg_data[2 + 2 * i])
                    for i in range(ns)]
            pos = pos + 2 + ln
            break
        # APPn / COM / others: skip
        pos += 2 + ln
    if sof is None:
        raise ValueError("JPEG missing SOF0 before SOS")
    h, w, comps = sof
    if h <= 0 or w <= 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    tsel = {cid: (td >> 4, td & 0x0F) for cid, td in scan}
    order = []
    for cid, tq in comps:
        if cid not in tsel:
            raise ValueError("JPEG scan does not cover every component")
        td, ta = tsel[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references a missing Huffman table")
        if tq not in qtables:
            raise ValueError("JPEG component references a missing DQT")
        order.append((huff[(0, td)], huff[(1, ta)], qtables[tq]))

    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64)
              for _ in order]
    reader = _BitReader(payload, pos)
    pred = [0] * len(order)
    for by in range(bh):
        for bx in range(bw):
            for ci, (dc_tbl, ac_tbl, q) in enumerate(order):
                zz = np.zeros(64, dtype=np.int64)
                t = reader.read_symbol(dc_tbl)
                if t > 11:
                    raise ValueError("invalid JPEG DC category")
                diff = _extend(reader.read_bits(t), t) if t else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:      # ZRL
                            k += 16
                            continue
                        break            # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    zz[k] = _extend(reader.read_bits(s), s)
                    k += 1
                coef = (zz[_UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                block = _C.T @ coef @ _C
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = block
    out = [np.clip(np.round(p[:h, :w] + 128.0), 0, 255).astype(np.uint8)
           for p in planes]
    arr = out[0] if len(out) == 1 else np.stack(out, axis=2)
    # the entropy reader stops exactly past the last scan byte (pad bits
    # live inside a byte it already consumed), so EOI must sit at
    # reader.pos; require it so a concatenated stream can't silently
    # resync mid-garbage
    end = reader.pos
    if payload[end:end + 2] != b"\xFF\xD9":
        raise ValueError("JPEG missing EOI after scan data")
    return arr, end + 2
