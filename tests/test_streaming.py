"""Streaming parity (SURVEY.md §7 M5): availableNow trigger = the interval
poller (S3, src/feeds/rss_feeds/mod.rs:71-92); dropDuplicatesWithinWatermark
= the TTL dedup cache (D1/D2, src/cache/local/mod.rs:31-54)."""

from datetime import datetime

import pyspark.sql.functions as F

from news_rss_spark.operators.extraction import extract_articles, to_publish_news
from news_rss_spark.sources.synth import documents_df
from news_rss_spark.streaming.stream import run_streaming_extraction

NOW = datetime(2025, 1, 15, 12, 0, 0)


def test_available_now_matches_batch(spark, tmp_path):
    """One availableNow pass over landed files equals the batch pipeline."""
    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    docs = documents_df(spark, 80, seed=7, num_partitions=4)
    docs.write.parquet(inp)

    run_streaming_extraction(spark, inp, sink, ckpt, now_utc=NOW)

    got = spark.read.parquet(sink)
    want = to_publish_news(extract_articles(docs, now_utc=NOW)).dropDuplicates(["id"])
    assert sorted(got.columns) == sorted(want.columns)
    g = {tuple(str(r[c]) for c in sorted(got.columns)) for r in got.collect()}
    w = {tuple(str(r[c]) for c in sorted(got.columns)) for r in want.collect()}
    assert g == w


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Second pass with the same checkpoint ingests only newly landed files
    (the poller's 'seen feed state' upgraded to exactly-once offsets)."""
    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    first = documents_df(spark, 40, seed=1, num_partitions=2)
    first.write.parquet(inp)
    run_streaming_extraction(spark, inp, sink, ckpt, now_utc=NOW)
    n1 = spark.read.parquet(sink).count()

    second = documents_df(spark, 40, seed=2, num_partitions=2)
    second.write.mode("append").parquet(inp)
    run_streaming_extraction(spark, inp, sink, ckpt, now_utc=NOW)
    n2 = spark.read.parquet(sink).count()

    ok2 = (extract_articles(second, now_utc=NOW)
           .filter(F.col("status") == "ok").dropDuplicates(["id"]).count())
    assert n2 - n1 == ok2  # first batch not re-emitted, second fully ingested
