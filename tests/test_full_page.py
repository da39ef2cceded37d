"""Fused full-page bundle == per-kernel products (operators/full_page.py)."""

import pytest
from pyspark.sql import functions as F

PAGES = [
    ("p1",
     '<html><head><meta property="og:title" content="OG one">'
     '<link rel="canonical" href="https://c.example/p/1"><title>T1</title>'
     "</head><body>"
     "<p>This paragraph is comfortably long enough to clear the block "
     "minimum and be kept as body text by the density scorer.</p>"
     '<p><a href="/a">alpha</a> <a href="b.html" rel="nofollow">beta</a></p>'
     "<table><tr><th>H</th></tr><tr><td>v</td></tr></table>"
     "</body></html>",
     "https://s.example/d/page.html"),
    ("p2", "<p>short</p>", "https://s.example/"),
    ("p3", None, "https://s.example/"),
]
SCHEMA = "doc_id string, html string, base_url string"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, SCHEMA)


@pytest.fixture(scope="module")
def bundle(spark, pages):
    from news_rss_spark.operators.full_page import extract_page_bundle_df
    return {r["doc_id"]: r for r in extract_page_bundle_df(pages).collect()}


class TestFusedEqualsSeparate:
    def test_metadata_product(self, spark, pages, bundle):
        from news_rss_spark.operators.metadata import extract_metadata_df
        sep = {r["doc_id"]: r for r in extract_metadata_df(pages).collect()}
        for did, want in sep.items():
            got = bundle[did]
            for f in ("headline", "author", "description", "canonical_url",
                      "image", "published", "title", "n_meta_tags"):
                assert got[f] == want[f], (did, f)

    def test_links_product(self, spark, pages, bundle):
        from news_rss_spark.operators.links import extract_links_df
        sep = {}
        for r in extract_links_df(pages).collect():
            sep.setdefault(r["doc_id"], []).append(
                (r["target_url"], r["anchor_text"], r["nofollow"]))
        for did, row in bundle.items():
            got = [(x["target_url"], x["anchor_text"], x["nofollow"])
                   for x in row["links"]]
            assert got == sep.get(did, []), did

    def test_table_census_product(self, spark, pages, bundle):
        from news_rss_spark.operators.tables import extract_tables_df
        counts = {r["doc_id"]: r["n"] for r in
                  extract_tables_df(pages).groupBy("doc_id")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        for did, row in bundle.items():
            assert row["n_table_cells"] == counts.get(did, 0), did

    def test_spans_product(self, spark, bundle):
        from news_rss_spark.kernel.htmlx import extract_page_spans
        for did, html, _ in PAGES:
            want = [{"kind": k, "text": t, "media_ref": m}
                    for k, t, m in extract_page_spans(html or "")]
            got = [row.asDict() for row in bundle[did]["spans"]]
            assert got == want, did

    def test_degradation_shape(self, bundle):
        assert bundle["p3"]["spans"] == []
        assert bundle["p3"]["links"] == []
        assert bundle["p3"]["headline"] is None
        assert bundle["p3"]["n_table_cells"] == 0
        assert bundle["p1"]["headline"] == "OG one"
        assert [x["nofollow"] for x in bundle["p1"]["links"]] == [False, True]
        assert bundle["p1"]["n_table_cells"] == 2
