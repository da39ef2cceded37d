"""Multimodal column plumbing (engine-new, training-data pipeline).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as Arrow-
batched functions over ``mapInPandas``.  The actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_stub`` produces
a deterministic fake feature vector from the bytes, and ``decode_real``
raises ``NotImplementedError`` with the intended library call.  The Spark-
side plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested.
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


def decode_real(payload: bytes, kind: str):
    """The real decode step — intentionally stubbed in this container."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/av which are not installed; "
        "wire the library call here (e.g. PIL.Image.open(io.BytesIO(payload)))"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature: bytes -> sha1 -> 8 floats in [0,1)."""
    digest = hashlib.sha1(payload or b"").digest()
    arr = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65536.0


def extract_features(media: DataFrame, batch_kind: str | None = None) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    Real-decode call sites are marked; the batch shape (pandas DataFrame per
    Arrow batch, vectorized numpy inside) is exactly what a PIL/librosa
    implementation would use.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_fake_feature(p).tolist() for p in payloads]  # decode_real(p, k) in prod
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                "sha1": payloads.map(lambda b: hashlib.sha1(b or b"").hexdigest()),
                "feature": feats,
            })

    src = media if batch_kind is None else media.filter(F.col("kind") == batch_kind)
    return src.select("media_id", "kind", "payload").mapInPandas(fn, FEATURES_DDL)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize stage over ``mapInPandas`` — same schema in and out,
    width/height set to the target.  The pixel work is STUBBED (no PIL in
    this container): the payload passes through unchanged where
    ``PIL.Image.open(...).resize((target_w, target_h))`` would re-encode it;
    every Spark-side aspect (schema, batch shape, non-image passthrough) is
    the real plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            out = pdf.copy()
            # decode_real(payload, "image") -> resize -> re-encode in prod
            out.loc[is_img, "width"] = target_w
            out.loc[is_img, "height"] = target_h
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(fn, MEDIA_DDL)


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
