"""Golden tests against the REFERENCE's own fixture files.

The reference's only hard behavioral assertions are byte-length goldens on
its real LLM-response captures (src/crawler/llm/retriever.rs:92-114):

    extract_json_semantic_blocks(cnn-json-llm-resp.txt).len()  == 1527
    extract_json_semantic_blocks(ndtv-news-llm-resp.txt).len() == 1275

Two subtleties locked here:

1. Rust ``String::len()`` is the UTF-8 BYTE length, not the char count —
   the CNN fixture is full of 3-byte curly quotes, so the golden is
   ``octet_length``, not ``length`` (1527 bytes == 1499 chars).
2. The reference's FIND_JSON_OBJECTS_REGEX uses ``(?R)`` recursion
   (retriever.rs:6), which the ``regex`` crate it depends on (Cargo.toml:27,
   regex 1.11) does not support — ``Regex::new`` errors at runtime, so the
   reference's own test cannot actually execute as written.  The goldens
   encode the INTENDED semantics (balanced-brace object spans).  For these
   fixtures' flat SemanticBlock objects, non-recursive ``\\{[^{}]*\\}``
   matching (our L5 implementation) selects the same spans; this test
   proves the end-to-end chain byte-matches the goldens on both fixtures.

The fixtures are read from the read-only reference checkout (never copied
into this repo); the test skips if the checkout is absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

RES = "/root/reference/tests/resources"

GOLDEN_BYTE_LENGTHS = {
    # retriever.rs:104 / :112
    "cnn-json-llm-resp.txt": 1527,
    "ndtv-news-llm-resp.txt": 1275,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference checkout not present"
)


def test_semantic_blocks_golden_byte_lengths(spark):
    from news_rss_spark.functions.semantic_blocks import semantic_blocks_text

    rows = [
        (name, open(os.path.join(RES, name), encoding="utf-8").read())
        for name in GOLDEN_BYTE_LENGTHS
    ]
    df = spark.createDataFrame(rows, "name string, resp string")
    out = {
        r["name"]: (r["nbytes"], r["nchars"])
        for r in df.select(
            "name",
            F.octet_length(semantic_blocks_text(F.col("resp"))).alias("nbytes"),
            F.length(semantic_blocks_text(F.col("resp"))).alias("nchars"),
        ).collect()
    }
    for name, want in GOLDEN_BYTE_LENGTHS.items():
        assert out[name][0] == want, f"{name}: {out[name][0]} != {want}"
    # the CNN fixture is the one that distinguishes bytes from chars
    assert out["cnn-json-llm-resp.txt"][1] == 1499


def test_semantic_blocks_golden_content_cnn(spark):
    """Beyond the length golden: the kept blocks are exactly the seven
    article/text-tagged blocks (indexes 10,12,13,14,15,17 survive; 11 is
    dropped because the repair chain's bare-key-quoting step corrupts its
    '4:16 AM' timestamp into invalid JSON — faithful to the reference's
    intended chain, which has the same behavior)."""
    from news_rss_spark.functions.semantic_blocks import semantic_blocks_text

    txt = open(os.path.join(RES, "cnn-json-llm-resp.txt"), encoding="utf-8").read()
    df = spark.createDataFrame([(txt,)], "resp string")
    result = df.select(semantic_blocks_text(F.col("resp")).alias("t")).first()["t"]
    lines = result.split("\n")
    assert len(lines) == 6
    assert lines[0].startswith("# This is the world")  # index 10 headline
    assert "MegaHouse has unveiled a miniature" in lines[1]  # index 12
    assert lines[-1].startswith("Related article How quickly")  # index 17
    # index 11's '4:16 AM' block is NOT present (repair-chain casualty)
    assert "2 minute read" not in result


def test_llm_crawler_scrape_golden_byte_equality(spark):
    """The reference's integration golden (tests/test_crawler_llm.rs:16-35):
    a canned /v1/chat/completions response (llm-chat-response.json) flows
    through scrape() = choices[0].message.content -> <blocks> envelope
    extraction, and the result must equal llm-chat-response-assert.txt
    byte-for-byte.  Mirrored fully JVM-side: get_json_object + the L4
    envelope column expression."""
    from news_rss_spark.functions.semantic_blocks import extract_blocks_envelope

    resp = open(os.path.join(RES, "llm-chat-response.json"), encoding="utf-8").read()
    want = open(os.path.join(RES, "llm-chat-response-assert.txt"),
                encoding="utf-8").read()
    df = spark.createDataFrame([(resp,)], "resp string")
    content = F.get_json_object(F.col("resp"), "$.choices[0].message.content")
    got = df.select(extract_blocks_envelope(content).alias("t")).first()["t"]
    assert got == want
