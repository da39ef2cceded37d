"""OPML subscription-list parsing — the bulk-import path for the feed
registry.

News readers exchange feed subscriptions as OPML (an XML outline whose
``<outline xmlUrl=...>`` leaves are feeds, nested under category
outlines).  The reference seeds its source registry by hand
(``migrations/20241025113452_fill.up.sql``); a production deployment
imports a user's OPML instead — this kernel turns one document into
registry rows ``(feed_url, title, site_url, category_path)``.

Same stdlib-ET parsing approach as the feed kernel (``feedxml.py``);
category path = "/"-joined titles of ancestor outlines that are NOT
themselves feeds.  Attribute casing follows the spec (``xmlUrl``) but
the common lowercase/alternate casings seen in exports are accepted.
Never raises: malformed XML yields no rows.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["parse_opml"]


def _attr(el: ET.Element, *names: str) -> str | None:
    for n in names:
        for k, v in el.attrib.items():
            if k.lower() == n.lower() and v:
                return v
    return None


def parse_opml(xml: str | None) -> list[dict]:
    """``[{"feed_url", "title", "site_url", "category"}, ...]`` in
    document order; see module docstring."""
    if not xml:
        return []
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    body = root.find("body")
    if body is None:
        return []
    out: list[dict] = []

    def walk(el: ET.Element, path: list[str]) -> None:
        for child in el:
            if child.tag != "outline":
                continue
            feed_url = _attr(child, "xmlUrl")
            title = _attr(child, "title", "text")
            if feed_url:
                out.append({
                    "feed_url": feed_url.strip(),
                    "title": title,
                    "site_url": _attr(child, "htmlUrl"),
                    "category": "/".join(path) if path else None,
                })
                walk(child, path)  # feeds rarely nest, but tolerate it
            else:
                walk(child, path + ([title] if title else []))

    walk(body, [])
    return out
