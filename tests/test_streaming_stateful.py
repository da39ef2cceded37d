"""Custom-stateful TTL dedup (applyInPandasWithState) tests — the
reference's moka cache semantics driven end-to-end through streaming."""

from datetime import datetime

import pyspark.sql.functions as F

from news_rss_spark.operators.extraction import extract_articles, to_publish_news
from news_rss_spark.sources.synth import documents_df
from news_rss_spark.streaming.stateful import run_stateful_dedup_extraction

NOW = datetime(2025, 1, 15, 12, 0, 0)


def test_stateful_dedup_within_and_across_batches(spark, tmp_path):
    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    docs = documents_df(spark, 60, seed=4, num_partitions=3)
    # duplicate every doc within the first landing: dedup must keep one each
    docs.write.parquet(inp)
    docs.write.mode("append").parquet(inp)

    run_stateful_dedup_extraction(spark, inp, sink, ckpt, NOW)
    n1 = spark.read.parquet(sink).count()
    expected = (to_publish_news(extract_articles(docs, now_utc=NOW))
                .dropDuplicates(["id"]).count())
    assert n1 == expected

    # land the SAME docs again: state in the checkpoint suppresses all of
    # them (cross-run dedup, TTL not yet expired), plus some fresh docs
    docs.write.mode("append").parquet(inp)
    fresh = documents_df(spark, 20, seed=9, num_partitions=2)
    fresh.write.mode("append").parquet(inp)
    run_stateful_dedup_extraction(spark, inp, sink, ckpt, NOW)
    n2 = spark.read.parquet(sink).count()
    fresh_ok = (to_publish_news(extract_articles(fresh, now_utc=NOW))
                .dropDuplicates(["id"]).count())
    assert n2 == n1 + fresh_ok

    # emitted rows keep the PublishNews schema
    assert sorted(spark.read.parquet(sink).columns) == sorted(
        ["id", "message_url", "datetime", "source", "photo_path", "text"])


def test_ttl_expiry_republishes(spark, tmp_path):
    """After the insertion-time TTL lapses, the same guid publishes again
    (moka time_to_live expiry -> reference re-publish path)."""
    import time

    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    docs = documents_df(spark, 15, seed=6, num_partitions=2)
    docs.write.parquet(inp)
    run_stateful_dedup_extraction(spark, inp, sink, ckpt, NOW, ttl_secs=1)
    n1 = spark.read.parquet(sink).count()

    time.sleep(2)  # let every key's insertion time fall outside the TTL
    docs.write.mode("append").parquet(inp)
    run_stateful_dedup_extraction(spark, inp, sink, ckpt, NOW, ttl_secs=1)
    n2 = spark.read.parquet(sink).count()
    assert n2 == 2 * n1  # every article re-published after expiry
