"""Pure-Python extraction kernel — importable and unit-testable without Spark.

Every entry point is batch-shaped (lists / pandas Series in, lists out) so
the Spark adapters in ``news_rss_spark.operators.extraction`` can call it
once per Arrow record batch with zero per-row Python at the Spark API layer.
"""

from news_rss_spark.kernel.dates import parse_pub_date
from news_rss_spark.kernel.extract import extract_document, extract_batch
from news_rss_spark.kernel.htmlx import strip_tags, extract_html_spans, extract_page_spans
from news_rss_spark.kernel.urls import url_domain

__all__ = [
    "parse_pub_date",
    "extract_document",
    "extract_batch",
    "strip_tags",
    "extract_html_spans",
    "extract_page_spans",
    "url_domain",
]
