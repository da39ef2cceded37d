"""Per-document extraction kernel (reference parity: ``extract_item``,
src/feeds/rss_feeds/mod.rs:157-211) — pure Python, batch-shaped.

Input document shape (BASELINE input_hint / FIXTURES.md §1)::

    doc_id : string            # article GUID (rss::Item.guid, mod.rs:158)
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Input span kinds:
    meta  — JSON {title, link, description, pub_date_rfc822, source_domain}
            (item header fields, mod.rs:157-197)
    html  — a content:encoded HTML fragment (inline-content path, mod.rs:170-171)
    desc  — plain-text description (empty-content fallback, mod.rs:173-174)
    page  — full article HTML incl. boilerplate (crawler-llm scrape path,
            src/crawler/llm/mod.rs:86-102)
    img / video — feed-level media refs (media:content / itunes image,
            mod.rs:194-197)

Output record per doc: the reference's ``RssResponse``/``PublishNews``
fields (models.rs:11-21, publish/models.rs:8-15) plus the ordered extracted
``spans`` sequence. Per-row invariant vs the reference: span-sequence
equality on (kind, text, media_ref, order); offsets are informative
(cumulative text offset at span start).

Content resolution order (mod.rs:170-181):
    1. any ``html`` spans present  -> fast-path tag-strip extraction of each,
       in order (content:encoded branch);
    2. else any ``page`` spans     -> full tokenizer/DOM/density extraction
       (crawler-llm scrape branch);
    3. else any ``desc`` span      -> its text verbatim;
    4. else                        -> the meta description (native fallback).
Feed-level media input spans are appended after the text spans in input
order (the NDTV fixture layout: media:content entries follow the item body).
"""

from __future__ import annotations

import json
from datetime import datetime

from news_rss_spark.kernel.dates import EPOCH, parse_pub_date
from news_rss_spark.kernel.htmlx import extract_html_spans, extract_page_spans
from news_rss_spark.kernel.urls import url_domain

# failure reasons (P2 required-field predicate, mod.rs:158-168: errors are
# logged and the item skipped — the pipeline never fails)
ERR_EMPTY_GUID = "empty guid"
ERR_EMPTY_TITLE = "empty title"
ERR_EMPTY_DESCRIPTION = "empty description"
ERR_BAD_META = "unparseable meta span"


def _finalize_spans(
    spans: list[tuple[str, str | None, str | None]],
) -> list[dict]:
    """Attach cumulative text offsets; returns list of span dicts."""
    out = []
    offset = 0
    for kind, text, ref in spans:
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": offset})
        if text is not None:
            offset += len(text)
    return out


def extract_document(
    doc_id: str | None,
    spans: list[dict] | None,
    now_utc: datetime = EPOCH,
) -> dict:
    """Extract one document. Never raises — failures return
    ``{"status": "skip", "error": reason}`` mirroring the reference's
    log-and-continue semantics (mod.rs:120-126).
    """
    if not doc_id:
        return {"status": "skip", "error": ERR_EMPTY_GUID, "id": doc_id}
    meta: dict = {}
    html_frags: list[str] = []
    desc_span: str | None = None
    page_frags: list[str] = []
    feed_media: list[tuple[str, str | None, str | None]] = []
    for s in spans or []:
        kind = s.get("kind")
        if kind == "meta":
            try:
                meta = json.loads(s.get("text") or "{}")
            except (ValueError, TypeError):
                return {"status": "skip", "error": ERR_BAD_META, "id": doc_id}
            if not isinstance(meta, dict):
                # valid JSON but not an object (e.g. "0", "[]") — same skip
                return {"status": "skip", "error": ERR_BAD_META, "id": doc_id}
        elif kind == "html":
            if s.get("text"):
                html_frags.append(s["text"])
        elif kind == "desc":
            if desc_span is None:
                desc_span = s.get("text")
        elif kind == "page":
            if s.get("text"):
                page_frags.append(s["text"])
        elif kind in ("img", "video"):
            if s.get("media_ref"):
                feed_media.append((kind, s.get("text"), s["media_ref"]))

    title = meta.get("title")
    if not title:
        return {"status": "skip", "error": ERR_EMPTY_TITLE, "id": doc_id}
    description = meta.get("description")
    if description is None and desc_span is not None:
        description = desc_span
    if not description:
        return {"status": "skip", "error": ERR_EMPTY_DESCRIPTION, "id": doc_id}

    link = meta.get("link") or doc_id  # P3 link coalesce (mod.rs:160)
    source = url_domain(link)  # P4 domain w/ fallback (mod.rs:162-164)

    out_spans: list[tuple[str, str | None, str | None]] = []
    if html_frags:
        for frag in html_frags:
            out_spans.extend(extract_html_spans(frag))
    elif page_frags:
        for frag in page_frags:
            out_spans.extend(extract_page_spans(frag))
    elif desc_span is not None:
        if desc_span.strip():
            out_spans.append(("text", desc_span, None))
    elif description.strip():
        out_spans.append(("text", description, None))

    # feed-level media trail the text (NDTV fixture layout)
    out_spans.extend((k, None, ref) for k, _txt, ref in feed_media)

    pub_date = parse_pub_date(meta.get("pub_date_rfc822"), now_utc)

    # photo_path: itunes image analog (mod.rs:194-197) — first img media ref
    photo_path = next((ref for k, _t, ref in out_spans if k == "img" and ref), None)

    text = "\n".join(t for k, t, _r in out_spans if k == "text" and t is not None)

    return {
        "status": "ok",
        "error": None,
        "id": doc_id,  # guid -> id (publish/models.rs:29-41)
        "title": title,
        "description": description,
        "link": link,  # -> message_url
        "source": source,
        "pub_date": pub_date,
        "photo_path": photo_path,
        "text": text,
        "spans": _finalize_spans(out_spans),
        "byte_count": sum(len(s.get("text") or "") + len(s.get("media_ref") or "")
                          for s in spans or []),
    }


def extract_batch(
    doc_ids: list[str | None],
    spans_col: list[list[dict] | None],
    now_utc: datetime = EPOCH,
) -> list[dict]:
    """Batch entry point for the Arrow adapter: one call per record batch."""
    return [extract_document(d, s, now_utc) for d, s in zip(doc_ids, spans_col)]
