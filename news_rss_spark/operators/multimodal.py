"""Multimodal column plumbing (engine-new, training-data pipeline).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as Arrow-
batched functions over ``mapInPandas``.

Decode is REAL for the formats a pure-Python codec can handle — binary
PPM (P6) images and 16-bit PCM WAV audio (``decode_ppm`` / ``decode_wav``
below; ``synth_media`` generates decodable payloads deterministically) —
including an actual nearest-neighbour image resize.  Compressed codecs
(JPEG/PNG/MP3/H.264) would need PIL/librosa/av, which are not in this
container: those payloads fall back to a deterministic sha1 stand-in
feature at a clearly-marked call site.  The Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is identical either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id string, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURES_DDL = (
    "media_id string, kind string, n_bytes bigint, sha1 string, "
    "feature array<float>"
)

FEATURE_DIM = 8


def media_from_documents(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Build a media table shape from any text source (test fixture path:
    payload = utf-8 bytes standing in for encoded image/audio data)."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.when(F.col(id_col).cast("long") % 3 == 0, F.lit("image"))
         .when(F.col(id_col).cast("long") % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real image decode for binary PPM (P6): header ``P6 <w> <h> <maxval>``
    then raw RGB triplets -> (h, w, 3) uint8.  Pure Python + numpy — no
    external codec library needed."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header tokens may be separated by any whitespace and '#' comments
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    if w <= 0 or h <= 0:
        # a zero/negative dimension decodes to an empty axis that later
        # fancy indexing (e.g. resize) would IndexError on — reject here so
        # every malformed payload fails with the one contracted exception
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=i + 1)
    return pixels.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real audio decode for PCM WAV via the stdlib wave module ->
    (int16 sample array [n_frames, n_channels] flattened, sample_rate).

    Raises ValueError on ANY malformed payload: wave.open raises
    wave.Error / EOFError / struct.error on truncated or non-WAV RIFF data
    (an AVI also starts with RIFF), none of which subclass ValueError —
    translated here so callers keep the single skip/fallback contract."""
    import io
    import struct
    import wave
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM supported")
            raw = wf.readframes(wf.getnframes())
            return np.frombuffer(raw, dtype=np.int16), wf.getframerate()
    except (wave.Error, EOFError, struct.error) as exc:
        # exactly the errors malformed RIFF data produces — anything else
        # (e.g. RuntimeError) is a real bug and must surface, not be
        # rewritten into a silent feature fallback
        raise ValueError(f"malformed WAV payload: {exc}") from exc


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def decode_real(payload: bytes, kind: str):
    """Real decode where a pure-Python codec exists; the compressed-codec
    paths (JPEG/PNG/MP3/H.264) still require PIL/librosa/av and raise.

    - image + P6 magic   -> decode_ppm -> (h, w, 3) uint8 array
    - audio + RIFF magic -> decode_wav -> (int16 samples, rate)
    - anything else      -> NotImplementedError (library call goes here,
      e.g. PIL.Image.open(io.BytesIO(payload)))
    """
    if kind == "image" and payload and payload.startswith(b"P6"):
        return decode_ppm(payload)
    if kind == "audio" and payload and payload.startswith(b"RIFF"):
        return decode_wav(payload)
    raise NotImplementedError(
        f"no pure-Python codec for kind={kind} with this payload; "
        "wire PIL/librosa/av here for compressed formats"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature for undecodable payloads:
    bytes -> sha1 -> 8 floats in [0,1)."""
    digest = hashlib.sha1(payload or b"").digest()
    arr = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65536.0


def _feature_of(payload: bytes, kind: str) -> np.ndarray:
    """Real features for the decodable formats (PPM image, PCM WAV audio):
    marker 1.0 + shape/colour or rate/energy stats.  Falls back to the
    sha1 stand-in (marker < 1.0 w.h.p.) for compressed codecs."""
    try:
        decoded = decode_real(payload, kind)
    except (NotImplementedError, ValueError):
        return _fake_feature(payload)
    if kind == "image":
        arr = decoded.astype(np.float32)
        h, w = arr.shape[:2]
        mean = arr.mean(axis=(0, 1)) / 255.0
        return np.array([1.0, w / 4096.0, h / 4096.0, mean[0], mean[1],
                         mean[2], arr.std() / 255.0, 0.0], dtype=np.float32)
    samples, rate = decoded
    x = samples.astype(np.float32) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if x.size > 1 else 0.0
    return np.array([1.0, x.size / 1e6, rate / 48000.0, rms, zcr,
                     0.0, 0.0, 0.0], dtype=np.float32)


def extract_features(media: DataFrame, batch_kind: str | None = None) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    PPM images and PCM WAV audio are REALLY decoded (pure-Python codecs
    above); compressed formats use the deterministic sha1 stand-in at the
    marked fallback.  The batch shape (pandas DataFrame per Arrow batch,
    vectorized numpy inside) is exactly what a PIL/librosa implementation
    would use.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_feature_of(p, k).tolist()
                     for p, k in zip(payloads, pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                "sha1": payloads.map(lambda b: hashlib.sha1(b or b"").hexdigest()),
                "feature": feats,
            })

    src = media if batch_kind is None else media.filter(F.col("kind") == batch_kind)
    return src.select("media_id", "kind", "payload").mapInPandas(fn, FEATURES_DDL)


DECODE_STATS_DDL = (
    "media_id string, kind string, n_bytes bigint, decoded boolean, "
    "width int, height int, px_sum bigint, n_samples int, sample_rate int"
)


def decode_stats(media: DataFrame) -> DataFrame:
    """Integer-exact decode statistics over ``mapInPandas`` — the
    oracle-checkable face of the REAL decoders.

    Per media row: payload byte count, whether a pure-Python codec decoded
    it, and codec-derived integers — image width/height and the exact sum
    of all decoded pixel bytes (``px_sum``), audio sample count and rate.
    Everything here is an integer, so a SQL oracle that re-derives the
    values from the synthesis rule checks the decoders bit-exactly (the
    float feature vectors stay pytest-verified — float32 summation order
    is not SQL-reproducible)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                n_bytes = len(payload or b"")
                try:
                    decoded = decode_real(payload, kind)
                except (NotImplementedError, ValueError):
                    rows.append((mid, kind, n_bytes, False,
                                 None, None, None, None, None))
                    continue
                if kind == "image":
                    h, w = decoded.shape[:2]
                    rows.append((mid, kind, n_bytes, True, w, h,
                                 int(decoded.astype(np.int64).sum()),
                                 None, None))
                else:
                    samples, rate = decoded
                    rows.append((mid, kind, n_bytes, True, None, None,
                                 None, int(samples.size), int(rate)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "n_bytes", "decoded", "width", "height",
                "px_sum", "n_samples", "sample_rate",
            ]).astype({"n_bytes": "int64", "width": "Int32",
                       "height": "Int32", "px_sum": "Int64",
                       "n_samples": "Int32", "sample_rate": "Int32"})

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(fn, DECODE_STATS_DDL))


def _resize_nn(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbour resample via numpy fancy indexing (vectorized)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
    cols = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
    return arr[rows[:, None], cols[None, :]]


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize stage over ``mapInPandas`` — same schema in and out.

    PPM payloads are REALLY resized (decode -> nearest-neighbour resample
    -> re-encode); compressed formats pass through with only the metadata
    updated at the marked PIL call site.  Non-images pass through
    untouched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_payloads = []
            for payload, kind in zip(out["payload"], out["kind"]):
                if kind == "image" and payload and payload.startswith(b"P6"):
                    try:
                        arr = _resize_nn(decode_ppm(payload), target_w, target_h)
                        new_payloads.append(encode_ppm(arr))
                    except ValueError:
                        # truncated/garbage P6: pass through like any other
                        # undecodable payload — one bad image never aborts
                        # the stage
                        new_payloads.append(payload)
                else:
                    # PIL.Image.open(...).resize(...) re-encode goes here
                    new_payloads.append(payload)
            out["payload"] = new_payloads
            is_img = out["kind"] == "image"
            out.loc[is_img, "width"] = target_w
            out.loc[is_img, "height"] = target_h
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(fn, MEDIA_DDL)


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads, distributed (mapInPandas):
    id%3==0 -> a decodable P6 PPM (size and pixel gradient derived from the
    id), id%3==1 -> a decodable 16-bit PCM WAV tone, else an opaque
    video-ish payload exercising the fallback path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                i = int(mid)
                if i % 3 == 0:
                    w, h = 4 + i % 5, 3 + i % 4
                    grid = (np.arange(h * w * 3, dtype=np.int64) * 7 + i)
                    arr = (grid % 256).astype(np.uint8).reshape(h, w, 3)
                    rows.append((str(i), "image", encode_ppm(arr),
                                 "image/x-portable-pixmap", w, h, None))
                elif i % 3 == 1:
                    rate = 8000
                    n = 64 + i % 64
                    t = np.arange(n, dtype=np.float32)
                    samples = (np.sin(t * (0.1 + (i % 7) * 0.05)) * 12000)
                    rows.append((str(i), "audio", encode_wav(samples, rate),
                                 "audio/wav", None, None,
                                 int(n * 1000 / rate)))
                else:
                    payload = hashlib.sha1(str(i).encode()).digest() * 40
                    rows.append((str(i), "video", payload, "video/mp4",
                                 None, None, 1000 + i % 5000))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms",
            ]).astype({"width": "Int32", "height": "Int32",
                       "duration_ms": "Int32"})

    return df.select(id_col).mapInPandas(fn, MEDIA_DDL)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per (media, frame_ts).

    The decode is stubbed, but the fan-out shape (explode on a JVM-generated
    sequence — no Python in the row-multiplication step) is the real one.
    """
    video = media.filter(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.coalesce(F.col("duration_ms"), F.length("payload")) / every_ms)
        .cast("int"), F.lit(1)
    )
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
