"""Semantic-block retrieval (reference L4-L6: the crawler-llm response
post-processing, src/crawler/llm/retriever.rs) as pure JVM column
expressions — fully SQL-expressible, whole-stage-codegen'd, no Python.

- L4 ``<blocks>`` envelope extraction with full-content fallback
  (retriever.rs:28-41; fallback at src/crawler/llm/mod.rs:64-71)
- L5 broken-JSON repair chain + SemanticBlock parse + per-block
  content join (retriever.rs:44-90, extract_json_object :78-90)
- L6 case-insensitive tag-whitelist membership (retriever.rs:58-70,
  FILTER_BLOCKS_TAGS :5)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# retriever.rs:5
FILTER_BLOCKS_TAGS = ["article", "content", "text", "war", "world"]
# retriever.rs:7 — greedy: first <blocks> through the LAST </blocks>
BLOCKS_RE = r"<blocks>(?:[\W|\w])*</blocks>"
# retriever.rs:6 intent (the (?R) recursion is moot: SemanticBlock JSON has
# no nested objects — index:int, tags:[str], content:[str])
JSON_OBJECT_RE = r"\{[^{}]*\}"

SEMANTIC_BLOCK_SCHEMA = "index int, tags array<string>, content array<string>"


def extract_blocks_envelope(col: Column) -> Column:
    """L4: pull the ``<blocks>...</blocks>`` payload out of the (trimmed)
    LLM response, stripping the envelope tags; when no envelope is found
    return the full content unchanged (mod.rs:64-71 fallback)."""
    found = F.regexp_extract(F.trim(col), BLOCKS_RE, 0)
    stripped = F.replace(F.replace(found, F.lit("<blocks>"), F.lit("")),
                         F.lit("</blocks>"), F.lit(""))
    return F.when(found != "", stripped).otherwise(col)


def repair_json(col: Column) -> Column:
    """L5 repair chain — the six regex repairs of extract_json_object
    (retriever.rs:79-85), in order:

    1. strip newlines and 2+-space runs
    2. ``""``   -> ``","``
    3. ``}{``   -> ``","``
    4. quote bare keys (already-quoted keys are untouched: the char before
       ``:`` must be a word char)
    5. trailing-comma repair replaces the match WITH ITSELF in the
       reference (``$0``) — a faithful no-op, preserved as documentation
    6. drop a stray interior double-quote between word chars
    """
    r = F.regexp_replace(col, r"(\n|  +)", "")
    r = F.regexp_replace(r, r'""', '","')
    r = F.regexp_replace(r, r"\}\{", '","')
    r = F.regexp_replace(r, r"(\w+)\s*:", '"$1":')
    # step 5: regexp_replace(r, r",\s*[}\]]", "$0") — no-op by construction
    r = F.regexp_replace(r, r'((\w|\w ))"((\w| ))', "$1$3")
    return r


def tags_whitelisted(tags: Column) -> Column:
    """L6: any(lower(tag) in FILTER_BLOCKS_TAGS) (retriever.rs:58-70)."""
    return F.exists(
        tags, lambda t: F.lower(t).isin(*FILTER_BLOCKS_TAGS)
    )


def semantic_blocks_text(col: Column) -> Column:
    """L5+L6 end-to-end (extract_json_semantic_blocks, retriever.rs:44-76):
    find JSON-object spans, repair each, parse as SemanticBlock, drop
    unparseable blocks, keep whitelisted-tag blocks, join each block's
    content with a space and the blocks with newlines."""
    objs = F.regexp_extract_all(F.trim(col), F.lit(JSON_OBJECT_RE), 0)
    parsed = F.transform(
        objs, lambda o: F.from_json(repair_json(o), SEMANTIC_BLOCK_SCHEMA)
    )
    valid = F.filter(
        parsed,
        lambda b: b["index"].isNotNull()
        & b["tags"].isNotNull()
        & b["content"].isNotNull(),
    )
    kept = F.filter(valid, lambda b: tags_whitelisted(b["tags"]))
    texts = F.transform(kept, lambda b: F.array_join(b["content"], " "))
    return F.array_join(texts, "\n")
