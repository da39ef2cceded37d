"""Handcrafted edge-case documents + the seeded corpus used for goldens.

Shapes mirror the reference fixture corpus (tests/resources/ndtv-world-news.xml:
CDATA content:encoded with <p>/<strong>/<i>/&nbsp; and inline <img>;
feed-level media:content entries) plus the tag-strip regex edge cases noted
in SURVEY.md §7 (unclosed tags, '>' inside quoted attributes, entities).
"""

import json

META = {
    "title": "Millions Of Cubans Still Without Power After 3rd Grid Failure",
    "link": "https://www.ndtv.com/world-news/millions-6833795",
    "description": "Millions of Cubans awoke on Sunday to find their homes still without power.",
    "pub_date_rfc822": "Sun, 20 Oct 2024 21:34:25 +0530",
    "source_domain": "www.ndtv.com",
}


def _doc(doc_id, spans):
    return {"doc_id": doc_id, "spans": spans}


def _meta(overrides=None, drop=()):
    m = dict(META)
    m.update(overrides or {})
    for k in drop:
        m.pop(k, None)
    return {"kind": "meta", "text": json.dumps(m, sort_keys=True), "media_ref": None, "offset": 0}


EDGE_DOCS = [
    # plain multi-paragraph content:encoded (NDTV shape)
    _doc("https://www.ndtv.com/world-news/a-1", [
        _meta(),
        {"kind": "html",
         "text": "<p>First paragraph of body text.</p>\n\n<p>Second paragraph with <strong>bold</strong> words.</p>",
         "media_ref": None, "offset": 1},
        {"kind": "img", "text": "caption here",
         "media_ref": "https://www.ndtv.com/media/1.jpg", "offset": 2},
    ]),
    # inline img between paragraphs + '>' inside quoted attribute (regex quirk)
    _doc("https://www.ndtv.com/world-news/a-2", [
        _meta(),
        {"kind": "html",
         "text": '<p>before image</p><img src="https://x.example/i.jpg" alt="a>b"><p>after image</p>',
         "media_ref": None, "offset": 1},
    ]),
    # unclosed tag at end (regex leaves it — no '>' so no match)
    _doc("https://www.ndtv.com/world-news/a-3", [
        _meta(),
        {"kind": "html", "text": "<p>text body</p><p>trailing unclosed <em",
         "media_ref": None, "offset": 1},
    ]),
    # entities are NOT decoded on the fast path (reference regex only strips tags)
    _doc("https://www.ndtv.com/world-news/a-4", [
        _meta(),
        {"kind": "html", "text": "<p>fish &amp; chips&nbsp;forever</p>",
         "media_ref": None, "offset": 1},
    ]),
    # desc-only (empty-content fallback path, mod.rs:173-174)
    _doc("https://www.ndtv.com/world-news/a-5", [
        _meta(),
        {"kind": "desc", "text": "A description-only article body.", "media_ref": None, "offset": 1},
    ]),
    # page-only (crawler scrape path) with boilerplate + inline media
    _doc("https://www.ndtv.com/world-news/a-6", [
        _meta(),
        {"kind": "page", "text": """<!DOCTYPE html><html><head><title>t</title></head><body>
<header><h1>Site Chrome Title</h1></header>
<nav><a href="/a">AAA</a> <a href="/b">BBB</a> <a href="/c">CCC</a></nav>
<article class="story">
<h1>The actual headline of this article</h1>
<p>Lead paragraph with enough characters to pass the block threshold easily.</p>
<figure><img src="https://cdn.example/lead.jpg"><figcaption>A caption for the lead image of this story.</figcaption></figure>
<p>Body paragraph two, also comfortably longer than the scorer's minimum length.</p>
<ul class="related-stories"><li><a href="/x">Related story one headline</a></li><li><a href="/y">Related story two headline</a></li></ul>
</article>
<div class="comments"><p>A very long comment that should be dropped because its container class is blacklisted.</p></div>
<footer><p>Copyright legal boilerplate text that is plenty long but must be pruned.</p></footer>
<video src="https://cdn.example/clip.mp4"></video>
</body></html>""", "media_ref": None, "offset": 1},
    ]),
    # missing title -> skip (P2)
    _doc("https://www.ndtv.com/world-news/a-7", [
        _meta(overrides={"title": None}),
        {"kind": "html", "text": "<p>body</p>", "media_ref": None, "offset": 1},
    ]),
    # missing description in meta but desc span present -> desc fills it
    _doc("https://www.ndtv.com/world-news/a-8", [
        _meta(drop=("description",)),
        {"kind": "desc", "text": "Fallback description body.", "media_ref": None, "offset": 1},
    ]),
    # no link -> guid coalesce (P3); relative-ish guid -> source fallback (P4)
    _doc("not-a-url-guid-9", [
        _meta(drop=("link",)),
        {"kind": "html", "text": "<p>content with guid link</p>", "media_ref": None, "offset": 1},
    ]),
    # malformed pub_date -> pinned-now fallback (P7)
    _doc("https://www.ndtv.com/world-news/a-10", [
        _meta(overrides={"pub_date_rfc822": "yesterday evening"}),
        {"kind": "html", "text": "<p>dated content</p>", "media_ref": None, "offset": 1},
    ]),
    # missing pub_date -> epoch default (P7)
    _doc("https://www.ndtv.com/world-news/a-11", [
        _meta(drop=("pub_date_rfc822",)),
        {"kind": "html", "text": "<p>undated content</p>", "media_ref": None, "offset": 1},
    ]),
    # video feed media + multiple feed media ordering
    _doc("https://www.ndtv.com/world-news/a-12", [
        _meta(),
        {"kind": "html", "text": "<p>media-rich article body text here</p>", "media_ref": None, "offset": 1},
        {"kind": "img", "text": None, "media_ref": "https://m.example/1.jpg", "offset": 2},
        {"kind": "video", "text": "clip", "media_ref": "https://m.example/2.mp4", "offset": 3},
        {"kind": "img", "text": None, "media_ref": "https://m.example/3.jpg", "offset": 4},
    ]),
    # html span empty, no desc -> meta description fallback
    _doc("https://www.ndtv.com/world-news/a-13", [
        _meta(),
    ]),
    # CDATA inside html content (tokenizer path exercises it via page; fast
    # path regex treats '<![CDATA[' as a tag start up to first '>')
    _doc("https://www.ndtv.com/world-news/a-14", [
        _meta(),
        {"kind": "html", "text": "<p>before</p><![CDATA[raw > data]]><p>after</p>",
         "media_ref": None, "offset": 1},
    ]),
]


def fixture_corpus():
    """Edge docs + a slice of the seeded generator corpus."""
    from news_rss_spark.sources.synth import generate_documents

    return EDGE_DOCS + generate_documents(40, seed=7)
