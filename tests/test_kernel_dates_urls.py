"""Date-parse (P7, mod.rs:183-192) and domain-extraction (P4, mod.rs:162-164)
unit tests."""

from datetime import datetime

from news_rss_spark.kernel.dates import EPOCH, parse_pub_date
from news_rss_spark.kernel.urls import url_domain

NOW = datetime(2025, 1, 15, 12, 0, 0)


class TestDates:
    def test_rfc822_offset(self):
        # fixture value: ndtv-world-news.xml pubDate
        assert parse_pub_date("Sun, 20 Oct 2024 21:34:25 +0530", NOW) == datetime(
            2024, 10, 20, 16, 4, 25
        )

    def test_rfc822_gmt(self):
        assert parse_pub_date("Mon, 01 Jan 2024 00:00:00 GMT", NOW) == datetime(2024, 1, 1)

    def test_rfc822_named_zone(self):
        assert parse_pub_date("Tue, 02 Jan 2024 10:00:00 EST", NOW) == datetime(
            2024, 1, 2, 15, 0, 0
        )

    def test_rfc822_no_weekday_no_seconds(self):
        assert parse_pub_date("2 Jan 2024 10:00 +0000", NOW) == datetime(2024, 1, 2, 10, 0)

    def test_iso_z(self):
        assert parse_pub_date("2024-10-20T21:34:25Z", NOW) == datetime(2024, 10, 20, 21, 34, 25)

    def test_iso_offset_colon(self):
        assert parse_pub_date("2024-10-20T21:34:25+05:30", NOW) == datetime(
            2024, 10, 20, 16, 4, 25
        )

    def test_iso_date_only(self):
        assert parse_pub_date("2024-10-20", NOW) == datetime(2024, 10, 20)

    def test_missing_returns_epoch(self):
        # NaiveDateTime::default() (mod.rs:192)
        assert parse_pub_date(None, NOW) == EPOCH
        assert parse_pub_date("", NOW) == EPOCH

    def test_garbage_returns_pinned_now(self):
        # Utc::now() fallback pinned to a job parameter (mod.rs:189)
        assert parse_pub_date("yesterday evening", NOW) == NOW
        assert parse_pub_date("0000-99-99", NOW) == NOW
        assert parse_pub_date("Sun, 99 Oct 2024 21:34:25 +0530", NOW) == NOW


class TestUrls:
    def test_domain(self):
        assert url_domain("https://www.ndtv.com/world-news/x-1") == "www.ndtv.com"

    def test_port_stripped(self):
        assert url_domain("http://example.com:8080/a") == "example.com"

    def test_invalid_falls_back_to_link(self):
        # Url::parse error -> Some(link) (mod.rs:164)
        assert url_domain("not a url") == "not a url"
        assert url_domain("/relative/path") == "/relative/path"

    def test_ip_host_is_none(self):
        # Url::domain() returns None for IP hosts
        assert url_domain("https://127.0.0.1/x") is None

    def test_no_authority_scheme(self):
        assert url_domain("mailto:a@b.com") is None

    def test_userinfo(self):
        assert url_domain("https://user:pw@example.com/x") == "example.com"
