"""Custom stateful streaming operator: the reference's TTL dedup cache
(D1/D2, src/cache/local/mod.rs:31-54) implemented EXPLICITLY with
``applyInPandasWithState`` — per-guid state carrying the insertion time,
expiring by comparing against the TTL, exactly moka's ``time_to_live``
(expiry measured from ``cache.set``, not from last access; moka also
evicts lazily).

``dropDuplicatesWithinWatermark`` (streaming/stream.py) is the built-in
route; this operator exists for semantics the built-in cannot express —
per-key insertion-time TTL independent of any event-time column with
re-publish after expiry — and demonstrates the engine's custom-stateful
surface.

Engine note: GroupStateTimeout.ProcessingTimeTimeout is deliberately NOT
used — registered processing-time timeouts make a ``trigger(availableNow)``
query spin empty micro-batches forever instead of terminating (measured:
170+ empty batches in 180 s after the single data batch).  Lazy expiry
keeps the availableNow contract intact; a continuously-running deployment
that needs eager state eviction would layer a watermark-scoped variant.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_TTL_SECS = 10_368_000  # config/production.toml:8 (120 days)


def dedup_with_ttl_state(news: DataFrame, ttl_secs: int = DEFAULT_TTL_SECS,
                         key: str = "id") -> DataFrame:
    """Streaming DataFrame -> first occurrence per key within the TTL.

    State per key: ``first_seen`` (epoch seconds at insertion).  A key seen
    while its state is younger than ``ttl_secs`` is suppressed; once the
    insertion is older than the TTL the next occurrence publishes again and
    re-arms the state (the reference's cache-expired-then-republish path).
    """
    out_schema = news.schema

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        now = time.time()
        live = False
        if state.exists:
            (first_seen,) = state.get
            live = (now - first_seen) < ttl_secs
        if live:
            for _ in pdfs:  # drain; every occurrence is a duplicate
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.head(1)
        state.update((now,))
        if first is not None:
            yield first

    return news.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="first_seen double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_dedup_extraction(
    spark,
    input_path: str,
    sink_path: str,
    checkpoint_path: str,
    now_utc,
    ttl_secs: int = DEFAULT_TTL_SECS,
    timeout_secs: int = 300,
) -> None:
    """availableNow pass of extract -> custom-state TTL dedup -> sink."""
    from news_rss_spark.operators.extraction import extract_articles, to_publish_news
    from news_rss_spark.streaming.stream import stream_documents

    docs = stream_documents(spark, input_path)
    news = to_publish_news(extract_articles(docs, now_utc=now_utc))
    deduped = dedup_with_ttl_state(news, ttl_secs)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_secs)
    if q.isActive:
        q.stop()
