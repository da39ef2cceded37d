"""spark-submit driver: perceptual image-dedup (dHash) scale probe.

Usage:
    spark-submit --master local[N] --py-files pkg.zip \
        BENCH/dhash_scale_driver.py <n_images> <cores> <work_dir>

Demonstrates the full perceptual dedup path at ~1M REAL images:

    synthesize distinct 16x16 PNGs (md5-expanded pixels, so every base
    image is unique -- unlike the oracle corpus's tiny periodic rule,
    which would alias 1M images onto ~1,280 distinct pictures and turn
    banding into an all-pairs join) -> land to parquet ->
    dhash_images (from-scratch PNG decode + 56-bit difference hash) ->
    simhash_near_dup_pairs (pigeonhole banding, hamming <= 2).

Planted structure per 100-image block b (base = 100*b):
    id % 100 == 99  -> byte-identical re-encode of the base image
                       (hamming 0: the "same lead image re-hosted" case)
    id % 100 == 98  -> base image with one sampled pixel bumped +64
                       (hamming 1-2: the near-dup case)
so ~n/100 blocks plant 3 intra-block pairs each; everything else is
md5-random and must NOT pair.  Prints one JSON line with per-stage
timings, found-pair counts, and the planted-pair recall.
"""

import json
import shutil
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _pixels(content_id: int) -> np.ndarray:
    import hashlib
    base = hashlib.md5(str(content_id).encode()).digest()
    raw = (np.frombuffer((base * 48)[: 16 * 16 * 3], dtype=np.uint8)
           .astype(np.int64) + np.arange(768)) % 256
    return raw.astype(np.uint8).reshape(16, 16, 3)


def synth_probe_media(df, id_col="id"):
    from news_rss_spark.operators.multimodal import MEDIA_DDL, encode_png

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                i = int(mid)
                r = i % 100
                arr = _pixels(i - r if r >= 98 else i)
                if r == 98:
                    arr = arr.copy()
                    # pixel (0,0) is on the 8x8 NN-resample grid
                    # (src = dst*16//8), so the bump lands in the hash
                    arr[0, 0] = (arr[0, 0].astype(np.int64) + 64) % 256
                rows.append((str(i), "image", encode_png(arr),
                             "image/png", 16, 16, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms",
            ]).astype({"width": "Int32", "height": "Int32",
                       "duration_ms": "Int32"})

    return df.select(id_col).mapInPandas(fn, MEDIA_DDL)


def main() -> None:
    n_images, cores, work = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from news_rss_spark.operators.multimodal import dhash_images
    from news_rss_spark.operators.text_dedup import simhash_near_dup_pairs

    spark = (
        SparkSession.builder.appName(f"dhash-scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up JVM + python worker pool on the full chain shape
    warm = synth_probe_media(spark.range(512).repartition(cores))
    dhash_images(warm).filter("decoded").count()

    # land the corpus (synthesis is input generation, not the operator)
    media_path = f"{work}/media"
    shutil.rmtree(media_path, ignore_errors=True)
    t0 = time.perf_counter()
    (synth_probe_media(spark.range(n_images).repartition(cores * 4))
     .write.mode("overwrite").parquet(media_path))
    t_synth = time.perf_counter() - t0
    media = spark.read.parquet(media_path)

    wide = len(sys.argv) > 4 and sys.argv[4] == "wide"

    # stage 1: decode + hash (the Arrow/pandas kernel stage)
    t0 = time.perf_counter()
    if wide:
        # 120-bit pre-banded variant — the documented >=10M path after
        # the 10M 56-bit run measured birthday collisions within 2x of
        # the planted signal (BENCH/BASELINE.md round 4)
        from news_rss_spark.operators.multimodal import dhash_wide_images
        from news_rss_spark.operators.text_dedup import (
            simhash_bands_near_dup_pairs)
        sig = (dhash_wide_images(media).filter("decoded")
               .select("media_id", "sig"))
    else:
        sig = (dhash_images(media).filter("decoded")
               .select("media_id", F.col("dhash").alias("simhash")))
    sig_path = f"{work}/sig"
    sig.write.mode("overwrite").parquet(sig_path)
    t_hash = time.perf_counter() - t0
    sig = spark.read.parquet(sig_path)
    n_hashed = sig.count()
    n_distinct = sig.select("sig" if wide else "simhash") \
                    .distinct().count()

    # stage 2: near-dup pair mining (pigeonhole banding, ONE equi-join)
    t0 = time.perf_counter()
    if wide:
        pairs = simhash_bands_near_dup_pairs(
            None, max_hamming=2, id_col="media_id",
            band_bits=30, n_bands=4, sig=sig)
    else:
        pairs = simhash_near_dup_pairs(sig, max_hamming=2,
                                       id_col="media_id",
                                       n_bits=56, sig=sig)
    planted = pairs.filter(
        (F.col("a").cast("long") / 100).cast("long")
        == (F.col("b").cast("long") / 100).cast("long"))
    n_pairs, n_planted = (
        pairs.count(),
        planted.filter(
            (F.col("a").cast("long") % 100 >= 98)
            | (F.col("b").cast("long") % 100 >= 98)).count(),
    )
    t_pairs = time.perf_counter() - t0

    print(json.dumps({
        "variant": "wide120" if wide else "dhash56",
        "cores": cores,
        "images": n_images,
        "hashed": n_hashed,
        "distinct_hashes": n_distinct,
        "pairs_found": n_pairs,
        "planted_pairs_found": n_planted,
        "synth_sec": round(t_synth, 2),
        "hash_sec": round(t_hash, 2),
        "pairs_sec": round(t_pairs, 2),
        "hash_imgs_per_sec": round(n_images / t_hash, 1),
        "dedup_imgs_per_sec": round(n_images / (t_hash + t_pairs), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
