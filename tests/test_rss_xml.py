"""S1 proper: raw feed XML -> items -> documents -> extraction, locked
against the reference's real 103 KB RSS snapshot (20 <item>s with CDATA
content:encoded) read from the read-only reference checkout."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

NDTV = "/root/reference/tests/resources/ndtv-world-news.xml"
NOW = datetime(2025, 1, 15, 12, 0, 0)

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom"><title>T-Feed</title>
<entry><id>urn:a1</id><title>Atom One</title><summary>Sum one.</summary>
<link rel="alternate" href="http://x.example/a"/>
<published>2024-01-01T00:00:00Z</published>
<content type="html">&lt;p&gt;Hello &amp;amp; welcome&lt;/p&gt;</content></entry>
</feed>"""


def _feeds_df(spark, rows):
    return spark.createDataFrame(rows, "feed_id string, xml string")


@pytest.mark.skipif(not os.path.exists(NDTV), reason="reference absent")
class TestNdtvGolden:
    def test_item_fields(self, spark):
        from news_rss_spark.sources.rss_xml import feed_items
        xml = open(NDTV, encoding="utf-8").read()
        items = feed_items(_feeds_df(spark, [("ndtv", xml)])).collect()
        assert len(items) == 20
        assert all(r["channel_title"] == "NDTV News-World-news" for r in items)
        assert all(r["parse_error"] is None for r in items)
        first = next(r for r in items if r["item_index"] == 0)
        assert first["guid"].endswith("grid-failure-6833795")
        assert first["title"] == ("Millions Of Cubans Still Without Power "
                                  "After 3rd Grid Failure")
        assert first["link"] == first["guid"]  # permalink feed
        assert first["pub_date"] == "Sun, 20 Oct 2024 21:34:25 +0530"
        assert first["description"].startswith("Millions of Cubans awoke")
        assert first["content"].startswith("<p>Millions of Cubans awoke")
        assert [m["kind"] for m in first["media"]] == ["img"]
        assert first["media"][0]["url"].startswith("https://c.ndtvimg.com/")
        # every NDTV item carries content:encoded and one media:content
        assert all(r["content"] for r in items)
        assert all(len(r["media"]) == 1 for r in items)

    def test_end_to_end_extraction(self, spark):
        """XML -> documents -> kernel: all 20 items extract ok; the fast
        tag-strip path applies to content:encoded; feed-level media trail
        the text spans and supply photo_path."""
        from news_rss_spark.operators.extraction import extract_articles
        from news_rss_spark.sources.rss_xml import documents_from_feeds
        xml = open(NDTV, encoding="utf-8").read()
        docs = documents_from_feeds(_feeds_df(spark, [("ndtv", xml)]))
        assert docs.count() == 20
        out = extract_articles(docs, now_utc=NOW).collect()
        assert len(out) == 20
        assert all(r["status"] == "ok" for r in out)
        first = next(r for r in out
                     if r["id"].endswith("grid-failure-6833795"))
        assert first["source"] == "www.ndtv.com"
        assert str(first["pub_date"]) == "2024-10-20 16:04:25"  # +0530 -> UTC
        assert first["text"].startswith("Millions of Cubans awoke")
        kinds = [s["kind"] for s in first["spans"]]
        assert kinds[-1] == "img" and "text" in kinds
        assert first["photo_path"].startswith("https://c.ndtvimg.com/")

    def test_full_pipeline_over_feed_xml(self, spark, tmp_path):
        from news_rss_spark.plans.pipeline import run_extraction_job
        from news_rss_spark.sources.rss_xml import documents_from_feeds
        xml = open(NDTV, encoding="utf-8").read()
        docs = documents_from_feeds(_feeds_df(spark, [("ndtv", xml)]))
        res = run_extraction_job(spark, docs, str(tmp_path / "sink"),
                                 str(tmp_path / "lin"), NOW, "rss-e2e",
                                 n_buckets=4)
        assert res.published_count == 20


class TestFeedShapes:
    def test_atom(self, spark):
        from news_rss_spark.sources.rss_xml import feed_items
        rows = feed_items(_feeds_df(spark, [("a", ATOM)])).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["feed_format"] == "atom"
        assert r["channel_title"] == "T-Feed"
        assert r["guid"] == "urn:a1"
        assert r["link"] == "http://x.example/a"
        assert r["content"] == "<p>Hello &amp; welcome</p>"
        assert r["pub_date"] == "2024-01-01T00:00:00Z"

    def test_malformed_and_empty(self, spark):
        from news_rss_spark.sources.rss_xml import (
            documents_from_feed_items, feed_items)
        rows = feed_items(_feeds_df(spark, [
            ("bad", "<rss><channel><title>x"),
            ("empty", "   "),
            ("wrongroot", "<html><body/></html>"),
        ]))
        got = {r["feed_id"]: r["parse_error"] for r in rows.collect()}
        assert len(got) == 3 and all(v for v in got.values())
        # error rows never become documents
        assert documents_from_feed_items(rows).count() == 0

    def test_entity_and_guid_fallbacks(self, spark):
        """Entities unescape; a guid-less link-less item still parses; the
        kernel's link<-guid coalesce is downstream (P3)."""
        from news_rss_spark.sources.rss_xml import feed_items
        xml = """<rss version="2.0"><channel><title>C &amp; T</title>
        <item><guid>g1</guid><title>A &lt;b&gt; B</title>
        <description>d &amp; e</description></item>
        </channel></rss>"""
        r = feed_items(_feeds_df(spark, [("f", xml)])).collect()[0]
        assert r["channel_title"] == "C & T"
        assert r["title"] == "A <b> B"
        assert r["description"] == "d & e"
        assert r["link"] is None and r["content"] is None

    def test_itunes_image_to_photo_path(self, spark):
        from news_rss_spark.operators.extraction import extract_articles
        from news_rss_spark.sources.rss_xml import documents_from_feeds
        xml = """<rss version="2.0"
         xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
        <channel><title>Pod</title>
        <item><guid>https://pod.example/e1</guid><title>Ep 1</title>
        <description>A show about things.</description>
        <itunes:image href="https://pod.example/art.jpg"/></item>
        </channel></rss>"""
        docs = documents_from_feeds(_feeds_df(spark, [("p", xml)]))
        out = extract_articles(docs, now_utc=NOW).collect()[0]
        assert out["status"] == "ok"
        assert out["photo_path"] == "https://pod.example/art.jpg"
        assert out["text"] == "A show about things."  # desc fallback path

    def test_no_explode_exchange_in_plan(self, spark):
        """The item fan-out happens inside the Arrow batch: no generate/
        explode node and no shuffle between scan and items."""
        from news_rss_spark.sources.rss_xml import feed_items
        plan = feed_items(_feeds_df(spark, [("a", ATOM)])) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan and "Exchange" not in plan
