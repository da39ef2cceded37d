"""spark-submit probe: media-provenance metadata at corpus scale.

Usage:
    spark-submit --master local[32] --driver-memory 16g --py-files pkg.zip \
        BENCH/mediameta_scale_driver.py <n_docs>

Synthesizes 1M media payloads distributed (JPEG+EXIF with GPS on every
3rd doc and alternating endianness; MP3 tags rotating v2.3/v2.4/v1; a
two-cue SRT per doc), lands them to parquet, and times the three
extractors with exact planted-structure checks — the per-executor
numbers for the metadata leg of a multimodal ingest.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.multimodal import (
    extract_exif_df,
    extract_id3_df,
    synth_exif_documents,
    synth_id3_documents,
)
from news_rss_spark.operators.subtitles import parse_subtitles_df


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.appName("mediameta-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    ids = spark.range(n).select(F.col("id").alias("doc_id")) \
        .repartition(64)
    base = "/dev/shm/mediameta"
    synth_exif_documents(ids).write.mode("overwrite") \
        .parquet(f"{base}-exif")
    synth_id3_documents(ids).write.mode("overwrite") \
        .parquet(f"{base}-id3")
    srt = F.concat(
        F.lit("1\n00:00:01,000 --> 00:00:02,000\nCue one "),
        F.col("doc_id").cast("string"),
        F.lit("\n\n2\n00:00:03,000 --> 00:00:04,000\nCue two\n"))
    ids.select(F.col("doc_id").cast("string").alias("doc_id"),
               srt.alias("content")) \
       .write.mode("overwrite").parquet(f"{base}-srt")

    exif_in = spark.read.parquet(f"{base}-exif")
    id3_in = spark.read.parquet(f"{base}-id3")
    srt_in = spark.read.parquet(f"{base}-srt")
    for df in (exif_in, id3_in, srt_in):
        df.count()  # warm cache

    t0 = time.time()
    ex = extract_exif_df(exif_in).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("gps_lat").isNotNull(), 1).otherwise(0))
         .alias("gps"),
        F.countDistinct("make").alias("makes")).collect()[0]
    t1 = time.time()
    want_gps = (n + 2) // 3
    print(json.dumps({
        "stage": "exif", "docs": n, "sec": round(t1 - t0, 1),
        "docs_per_sec": round(n / (t1 - t0)), "gps_rows": ex["gps"],
        "exact": ex["rows"] == n and ex["gps"] == want_gps
                 and ex["makes"] == 7}), flush=True)

    t2 = time.time()
    i3 = extract_id3_df(id3_in).agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("tag_version").alias("vers"),
        F.countDistinct("title").alias("titles")).collect()[0]
    t3 = time.time()
    print(json.dumps({
        "stage": "id3", "docs": n, "sec": round(t3 - t2, 1),
        "docs_per_sec": round(n / (t3 - t2)),
        "exact": i3["rows"] == n and i3["vers"] == 3
                 and i3["titles"] == 11}), flush=True)

    t4 = time.time()
    cues = parse_subtitles_df(srt_in).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("start_ms").alias("sum_start")).collect()[0]
    t5 = time.time()
    print(json.dumps({
        "stage": "subtitles", "docs": n, "sec": round(t5 - t4, 1),
        "docs_per_sec": round(n / (t5 - t4)),
        "exact": cues["rows"] == 2 * n
                 and cues["sum_start"] == n * (1000 + 3000)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
