"""Unit tests for the HTML kernel — tag-strip parity and page extraction.

The tag-strip spec is the reference regex ``<[^>]*>`` -> ""
(src/feeds/rss_feeds/mod.rs:213-217); these cases pin its quirks.
"""

import re

from news_rss_spark.kernel.htmlx import (
    build_dom,
    decode_entities,
    extract_html_spans,
    extract_page_spans,
    strip_tags,
    tokenize,
)

REF_RE = re.compile(r"<[^>]*>")


class TestStripTagsParity:
    CASES = [
        "<p>a</p>",
        '<a href="x>y">link</a>',       # quote-blind regex
        "a < b > c",                     # bare angle brackets form a "tag"
        "<p>unclosed <em",               # no closing '>' -> kept
        "text &amp; entities &nbsp; stay",  # entities NOT decoded
        "<![CDATA[x > y]]>",
        "<<double>>",
        "",
        "<p>nested <i>tags</i> here</p>",
        "<img src='a.jpg'/><br/><hr>",
    ]

    def test_regex_parity(self):
        for case in self.CASES:
            assert strip_tags(case) == REF_RE.sub("", case), case

    def test_fast_path_text_matches_strip(self):
        """Concatenated text spans + dropped whitespace == strip_tags."""
        for case in self.CASES:
            spans = extract_html_spans(case)
            joined = "".join(t for k, t, _ in spans if k == "text")
            stripped = REF_RE.sub("", case)
            # whitespace-only segments are dropped from spans; compare modulo them
            assert joined.replace(" ", "").replace("\n", "") in stripped.replace(
                " ", ""
            ).replace("\n", "") or joined == stripped


class TestFastPathMedia:
    def test_img_interleave(self):
        spans = extract_html_spans('<p>A</p><img src="u.jpg"><p>B</p>')
        assert spans == [
            ("text", "A", None),
            ("img", None, "u.jpg"),
            ("text", "B", None),
        ]

    def test_video_and_quote_styles(self):
        spans = extract_html_spans(
            "<video src='v.mp4'></video><p>t</p><img src=bare.jpg>"
        )
        assert ("video", None, "v.mp4") in spans
        assert ("img", None, "bare.jpg") in spans

    def test_img_without_src_dropped(self):
        spans = extract_html_spans("<p>A</p><img alt='x'><p>B</p>")
        assert [k for k, _, _ in spans] == ["text"]


class TestTokenizer:
    def test_quoted_gt_in_attr(self):
        toks = list(tokenize('<a href="x>y">t</a>'))
        assert toks[0][0] == "start" and toks[0][2]["href"] == "x>y"
        assert toks[1] == ("text", "t")
        assert toks[2] == ("end", "a")

    def test_comment_and_doctype_dropped(self):
        toks = list(tokenize("<!DOCTYPE html><!-- c -->x"))
        assert toks == [("text", "x")]

    def test_script_rawtext_swallowed(self):
        toks = list(tokenize("<script>if (a<b) {}</script>after"))
        kinds = [t[0] for t in toks]
        assert ("text", "after") in toks and kinds.count("text") == 1

    def test_cdata_text(self):
        assert ("text", "x > y") in list(tokenize("<![CDATA[x > y]]>"))

    def test_void_and_self_closing(self):
        dom = build_dom("<p>a<br>b</p>")
        p = dom.children[0]
        assert p.tag == "p" and len(p.children) == 3

    def test_entities(self):
        assert decode_entities("a &amp; b &#65; &#x42;") == "a & b A B"
        assert decode_entities("x&nbsp;y") in ("x y", "x\xa0y")


class TestPagePath:
    PAGE = """<html><head><title>x</title></head><body>
    <nav><a href='/'>Home</a><a href='/w'>World</a><a href='/s'>Sport</a></nav>
    <header><div>Chrome</div></header>
    <article><p>A real paragraph of article text long enough to be kept by scoring.</p>
    <p><a href='/r'>tiny</a></p>
    </article>
    <footer><p>A long copyright footer that would pass length but must be pruned away.</p></footer>
    </body></html>"""

    def test_boilerplate_pruned(self):
        spans = extract_page_spans(self.PAGE)
        texts = [t for k, t, _ in spans if k == "text"]
        assert any("real paragraph" in t for t in texts)
        assert not any("Home" in t for t in texts)
        assert not any("Chrome" in t for t in texts)
        assert not any("copyright" in t for t in texts)

    def test_link_dense_block_dropped(self):
        spans = extract_page_spans(self.PAGE)
        assert not any(t == "tiny" for _, t, _ in spans if t)

    def test_media_in_kept_block(self):
        page = "<body><article><p>Long enough paragraph to be kept by the scorer here.</p><img src='m.jpg'></article></body>"
        spans = extract_page_spans(page)
        assert ("img", None, "m.jpg") in spans

    def test_media_in_dropped_block_dropped(self):
        page = "<body><div class='sidebar'><img src='ad.jpg'></div><article><p>Long enough paragraph to be kept by the scorer ok.</p></article></body>"
        spans = extract_page_spans(page)
        assert not any(r == "ad.jpg" for _, _, r in spans)

    def test_video_source_child(self):
        page = "<body><article><p>Long enough paragraph to be kept by scoring here.</p><video><source src='v.mp4'></video></article></body>"
        spans = extract_page_spans(page)
        assert ("video", None, "v.mp4") in spans


class TestNonAsciiTagGate:
    def test_non_ascii_after_lt_is_text(self):
        # '<é' must tokenize as text, not as an empty-named start tag: the
        # gate is ASCII-only, matching the tag-name regex and the HTML spec
        toks = list(tokenize("a <éx> b"))
        assert ("start", "", {}) not in [
            (t[0], t[1], t[2]) for t in toks if t[0] == "start"
        ]
        text = "".join(t[1] for t in toks if t[0] == "text")
        assert "éx" in text.replace("<", "").replace(">", "")

    def test_ascii_tag_still_parsed(self):
        toks = list(tokenize("a <b>x</b>"))
        assert any(t[0] == "start" and t[1] == "b" for t in toks)



class TestUppercaseAttrParity:
    def test_uppercase_class_id_match_dom_route(self):
        from news_rss_spark.kernel.htmlx import (
            extract_page_spans,
            extract_page_spans_dom,
        )
        cases = [
            '<div CLASS="navbar"><p>menu menu menu menu menu menu</p></div>',
            '<div ID="article"><p>Short positive para.</p></div>',
            '<div Class="sidebar widget"><p>some long enough sidebar text'
            ' that would otherwise pass</p></div>',
            '<p CLASS="story">body body body body body body body body</p>',
        ]
        for html in cases:
            assert extract_page_spans(html) == extract_page_spans_dom(html)
