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


def test_feed_xml_stream_polls_and_dedupes(spark, tmp_path):
    """S1 x S3 on raw XML: tick 1 lands the NDTV snapshot (20 items);
    tick 2 re-fetches the same feed (19 repeat guids) plus one new item —
    the TTL dedup state admits only the new article."""
    import os
    from news_rss_spark.streaming.stream import run_streaming_feed_ingestion

    ndtv_path = "/root/reference/tests/resources/ndtv-world-news.xml"
    if not os.path.exists(ndtv_path):
        import pytest
        pytest.skip("reference checkout absent")
    xml = open(ndtv_path, encoding="utf-8").read()
    feeds, sink, ckpt = (str(tmp_path / p) for p in ("feeds", "sink", "ckpt"))

    def land(batch_xml, name):
        spark.createDataFrame([("ndtv", batch_xml, NOW)],
                              "feed_id string, xml string, fetched_at timestamp") \
             .coalesce(1).write.mode("append").parquet(feeds)

    land(xml, "t1")
    run_streaming_feed_ingestion(spark, feeds, sink, ckpt, now_utc=NOW)
    first = spark.read.parquet(sink)
    assert first.count() == 20

    new_item = ("<item><guid>https://www.ndtv.com/world-news/brand-new-1</guid>"
                "<title>Brand New</title><description>Something new happened."
                "</description></item>")
    # drop one old item, add one new -> 19 repeats + 1 fresh
    xml2 = xml.replace("</channel>", new_item + "</channel>", 1)
    land(xml2, "t2")
    run_streaming_feed_ingestion(spark, feeds, sink, ckpt, now_utc=NOW)
    after = spark.read.parquet(sink)
    assert after.count() == 21  # only the fresh guid passed the dedup
    ids = {r["id"] for r in after.select("id").collect()}
    assert "https://www.ndtv.com/world-news/brand-new-1" in ids


def test_exactly_once_sink_survives_batch_replay(spark, tmp_path):
    """foreachBatch exactly-once: a replayed batch (checkpoint wiped -> same
    input re-delivered as the same batch ids) overwrites its own batch_id
    partition instead of appending duplicates; even a corrupted partition
    heals on replay."""
    import os
    import shutil
    ndtv_path = "/root/reference/tests/resources/ndtv-world-news.xml"
    if not os.path.exists(ndtv_path):
        import pytest
        pytest.skip("reference checkout absent")
    from news_rss_spark.streaming.stream import (
        run_streaming_feed_ingestion_exactly_once)
    xml = open(ndtv_path, encoding="utf-8").read()
    feeds, sink, ckpt = (str(tmp_path / p) for p in ("feeds", "sink", "ckpt"))
    spark.createDataFrame([("ndtv", xml, NOW)],
                          "feed_id string, xml string, fetched_at timestamp") \
         .coalesce(1).write.mode("append").parquet(feeds)

    run_streaming_feed_ingestion_exactly_once(spark, feeds, sink, ckpt,
                                              now_utc=NOW)
    first = spark.read.parquet(sink)
    assert first.count() == 20
    rows_before = {(r["id"], r["text"]) for r in first.collect()}

    # crash scenario: the data landed but the checkpoint commit was lost —
    # the batch is re-delivered with the same batch_id
    shutil.rmtree(ckpt)
    run_streaming_feed_ingestion_exactly_once(spark, feeds, sink, ckpt,
                                              now_utc=NOW)
    after = spark.read.parquet(sink)
    assert after.count() == 20  # no duplicate append
    assert {(r["id"], r["text"]) for r in after.collect()} == rows_before

    # a new poller tick with one genuinely new item appends exactly one row
    new_item = ("<item><guid>https://www.ndtv.com/world-news/fresh-2</guid>"
                "<title>Fresh</title><description>New thing.</description>"
                "</item>")
    xml2 = xml.replace("</channel>", new_item + "</channel>", 1)
    spark.createDataFrame([("ndtv", xml2, NOW)],
                          "feed_id string, xml string, fetched_at timestamp") \
         .coalesce(1).write.mode("append").parquet(feeds)
    run_streaming_feed_ingestion_exactly_once(spark, feeds, sink, ckpt,
                                              now_utc=NOW)
    final = spark.read.parquet(sink)
    assert final.count() == 21


def test_exactly_once_sink_handles_empty_dir_and_uri_path(spark, tmp_path):
    """A pre-created empty sink dir counts as first-batch (not a crash),
    and a file:-URI sink path still performs dedup (the existence probe is
    not a driver-local os.path check)."""
    import os
    from news_rss_spark.streaming.stream import exactly_once_news_sink
    sink_dir = tmp_path / "sink"
    sink_dir.mkdir()  # empty dir pre-created by deployment tooling
    sink_uri = "file:" + str(sink_dir)
    news = spark.createDataFrame(
        [("a", "u", NOW, "s", None, "t1")],
        "id string, message_url string, datetime timestamp_ntz, "
        "source string, photo_path string, text string")
    fn = exactly_once_news_sink(sink_uri, now_utc=NOW)
    fn(news, 0)  # first batch over empty dir + URI path: must not raise
    assert spark.read.parquet(sink_uri).count() == 1
    # second batch with a repeated id: URI-addressed dedup must engage
    news2 = spark.createDataFrame(
        [("a", "u", NOW, "s", None, "t1"), ("b", "u", NOW, "s", None, "t2")],
        news.schema)
    fn(news2, 1)
    got = spark.read.parquet(sink_uri)
    assert got.count() == 2  # 'a' deduped, 'b' appended
    assert {r["id"] for r in got.collect()} == {"a", "b"}


def test_windowed_counts_watermark_drops_late_events(spark, tmp_path):
    """Watermarked tumbling-window agg (brief: "watermarks + windowed aggs
    for late data"): tick 1 lands 10:xx/11:xx events plus a 13:05 event
    whose watermark (13:05 - 2h = 11:05) closes the 10:00 window, so
    append mode emits 10:00 exactly once; tick 2 lands an 09:30 straggler
    (far behind the watermark) — the finalized 10:00 window must NOT be
    re-emitted or resurrected."""
    from datetime import datetime as dt

    from news_rss_spark.streaming.stream import streaming_windowed_counts

    inp, sink, ckpt = (str(tmp_path / d) for d in ("in", "sink", "ckpt"))
    ddl = "event_id long, ts timestamp, event_type string, value double"

    def tick(rows):
        spark.createDataFrame(rows, ddl).coalesce(1) \
            .write.mode("append").parquet(inp)
        src = spark.readStream.schema(ddl).parquet(inp)
        q = (streaming_windowed_counts(src, "1 hour", "2 hours")
             .writeStream.format("parquet").outputMode("append")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(str(r["window_start"]), r["event_type"], r["n_events"])
                for r in spark.read.parquet(sink).collect()}

    got1 = tick([
        (1, dt(2024, 1, 1, 10, 10), "view", 1.0),
        (2, dt(2024, 1, 1, 10, 40), "view", 2.0),
        (3, dt(2024, 1, 1, 11, 20), "view", 3.0),
        (4, dt(2024, 1, 1, 13, 5), "view", 4.0),   # advances watermark to 11:05
    ])
    assert got1 == {("2024-01-01 10:00:00", "view", 2)}  # 10:00 finalized once

    got2 = tick([(5, dt(2024, 1, 1, 9, 30), "view", 99.0)])  # hopeless straggler
    assert got2 == got1  # dropped: closed window not re-emitted or changed


def test_incremental_hll_two_ticks_equals_batch_and_replays_idempotently(
        spark, tmp_path):
    """Streaming HLL: fold two availableNow ticks into a batch_id-
    partitioned register table; the estimate equals the batch sketch
    over the union EXACTLY.  On replay each batch overwrites only its
    own partition, and registers max-merge at read time — so after a
    full checkpoint wipe the raw table may re-batch differently but the
    ESTIMATE is exactly unchanged (no lost history, no double count)."""
    import shutil

    from news_rss_spark.operators.sketch import hll_distinct
    from news_rss_spark.streaming.stream import (
        run_streaming_hll,
        streaming_hll_estimate,
    )

    inp, regs, ckpt = (str(tmp_path / p) for p in ("in", "regs", "ckpt"))
    ddl = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, "text %d" % (i % 700), "en", "s%d" % (i % 3), 10)
             for i in range(lo, hi)], ddl)

    batch(0, 500).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_hll(spark, inp, regs, ckpt)
    batch(500, 1200).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_hll(spark, inp, regs, ckpt)

    streamed = {r["source"]: r["n_est"] for r in
                streaming_hll_estimate(spark, regs, "source").collect()}
    batched = {r["source"]: r["n_est"] for r in
               hll_distinct(batch(0, 1200), "source", "text").collect()}
    assert streamed == batched

    # a tick with no new data is a no-op (checkpoint intact)
    regs_before = sorted(map(tuple, spark.read.parquet(regs).collect()))
    run_streaming_hll(spark, inp, regs, ckpt)
    assert sorted(map(tuple, spark.read.parquet(regs).collect())) == \
        regs_before

    # crash replay: checkpoint lost, the whole input re-delivered (the
    # replayed data may land under different batch boundaries, so the raw
    # table need not be byte-identical) — but each batch only overwrites
    # its OWN partition and registers max-merge, so the ESTIMATE is
    # exactly unchanged: no history lost, no double counting
    shutil.rmtree(ckpt)
    run_streaming_hll(spark, inp, regs, ckpt)
    after = {r["source"]: r["n_est"] for r in
             streaming_hll_estimate(spark, regs, "source").collect()}
    assert after == batched


def test_exactly_once_sink_does_not_mutate_session_confs(spark, tmp_path):
    """Overwrite mode / codec ride the DataFrameWriter, never the session
    (ADVICE r2: a per-batch session mutation leaks into concurrent jobs)."""
    from news_rss_spark.streaming.stream import exactly_once_news_sink

    before = (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None),
        spark.conf.get("spark.sql.parquet.compression.codec", None),
    )
    sink = str(tmp_path / "sink")
    fn = exactly_once_news_sink(sink)
    batch = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00")],
        "id int, text string, datetime string",
    ).withColumn("datetime", F.col("datetime").cast("timestamp"))
    fn(batch, 0)
    fn(batch, 1)  # second batch exercises the anti-join + overwrite path
    after = (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None),
        spark.conf.get("spark.sql.parquet.compression.codec", None),
    )
    assert after == before
    # dynamic overwrite still honored per-write: batch 0's partition intact
    got = spark.read.parquet(sink)
    assert sorted(r["batch_id"] for r in got.select("batch_id").collect()) == [0]


def test_incremental_cms_two_ticks_equals_batch_and_batch_replay_idempotent(
        spark, tmp_path):
    """Streaming CMS: two availableNow-style ticks folded into a
    batch_id-partitioned counter table; summed estimates equal the batch
    sketch over the union EXACTLY.  Re-running a batch under the SAME
    batch_id (the intact-checkpoint crash window) overwrites only its
    own partition — table content unchanged (the documented recovery
    contract; unlike HLL's max, a checkpoint WIPE is out of contract
    for sum-merge)."""
    from news_rss_spark.operators.sketch import cms_counters, cms_estimate
    from news_rss_spark.streaming.stream import (
        incremental_cms_sink,
        streaming_cms_estimate,
    )

    counters_path = str(tmp_path / "cms")
    ddl = "doc_id bigint, tok string"

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, "t%d" % (i % 50)) for i in range(lo, hi)], ddl)

    sink = incremental_cms_sink(counters_path, "tok")
    sink(batch(0, 400), 0)
    sink(batch(400, 1000), 1)

    cands = spark.createDataFrame([("t0",), ("t7",), ("t49",), ("zzz",)],
                                  "tok string")
    streamed = {r["value"]: r["est"] for r in
                streaming_cms_estimate(spark, counters_path, cands,
                                       "tok").collect()}
    batched = {r["value"]: r["est"] for r in
               cms_estimate(cms_counters(batch(0, 1000), "tok"), cands,
                            "tok").collect()}
    assert streamed == batched
    assert streamed["t0"] >= 20  # 1000/50 true count, never undercounts

    # intact-checkpoint replay: same batch_id + same data -> idempotent
    before = sorted(map(tuple, spark.read.parquet(counters_path).collect()))
    sink(batch(400, 1000), 1)
    after = sorted(map(tuple, spark.read.parquet(counters_path).collect()))
    assert after == before


def test_incremental_quantile_two_ticks_equals_batch_and_replays(
        spark, tmp_path):
    """Streaming bottom-k quantile sketch: two availableNow ticks land
    batch_id-partitioned sketch rows; the folded estimate equals the
    BATCH sketch over the union exactly (min-k merge is batch-split
    blind), and survives a full checkpoint wipe unchanged."""
    import shutil

    from news_rss_spark.operators.sketch import (
        quantile_sample_sketch,
        sketch_quantile_estimates,
    )
    from news_rss_spark.streaming.stream import (
        run_streaming_quantile,
        streaming_quantile_estimate,
    )

    inp, sk, ckpt = (str(tmp_path / p) for p in ("in", "sk", "ckpt"))
    ddl = ("doc_id bigint, text string, lang string, source string, "
           "n_chars bigint")

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, "t", "en", "s", (i * 7919) % 10007)
             for i in range(lo, hi)], ddl)

    batch(0, 800).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_quantile(spark, inp, sk, ckpt, k=256)
    batch(800, 2000).coalesce(1).write.mode("append").parquet(inp)
    run_streaming_quantile(spark, inp, sk, ckpt, k=256)

    streamed = {r["q"]: r["est"] for r in
                streaming_quantile_estimate(spark, sk, k=256).collect()}
    whole = spark.read.parquet(inp)
    want = {r["q"]: r["est"] for r in sketch_quantile_estimates(
        quantile_sample_sketch(whole, "n_chars", k=256)).collect()}
    assert streamed == want

    # wipe the checkpoint: ticks re-batch from scratch, estimates exact
    shutil.rmtree(ckpt)
    run_streaming_quantile(spark, inp, sk, ckpt, k=256)
    again = {r["q"]: r["est"] for r in
             streaming_quantile_estimate(spark, sk, k=256).collect()}
    assert again == want
