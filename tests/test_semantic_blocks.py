"""L4-L6 semantic-block retrieval tests (reference: retriever.rs:92-114
golden tests; fixtures here are our own, crafted to exercise each repair).
"""

import pyspark.sql.functions as F
import pytest

from news_rss_spark.functions.semantic_blocks import (
    extract_blocks_envelope,
    repair_json,
    semantic_blocks_text,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "v string").select(
        col(F.col("v")).alias("out")
    ).collect()[0]["out"]


class TestBlocksEnvelope:
    def test_extracts_and_strips(self, spark):
        resp = "noise <blocks>kept text</blocks> trailing"
        assert _one(spark, extract_blocks_envelope, resp) == "kept text"

    def test_greedy_to_last_close(self, spark):
        # the reference regex spans first <blocks> to the LAST </blocks>
        resp = "<blocks>a</blocks> mid <blocks>b</blocks>"
        assert _one(spark, extract_blocks_envelope, resp) == "a mid b"

    def test_fallback_returns_full_content(self, spark):
        # mod.rs:64-71: extraction failure -> original content unchanged
        resp = "  no envelope here  "
        assert _one(spark, extract_blocks_envelope, resp) == resp


class TestRepairJson:
    @pytest.mark.parametrize("broken,expect", [
        # 1: newlines + 2+-space runs stripped (single spaces survive)
        ('{\n  "index": 1,\n  "tags": ["a"]}', '{"index": 1,"tags": ["a"]}'),
        # 4: bare keys quoted, already-quoted keys untouched
        ('{index: 1, tags: ["a"], "content": ["x"]}',
         '{"index": 1, "tags": ["a"], "content": ["x"]}'),
        # 2: "" -> ","   (adjacent strings repaired into a list seam)
        ('["a""b"]', '["a","b"]'),
        # 3: }{ -> "," (verbatim reference behavior: the seam lands between
        # the existing quotes)
        ('["a"}{"b"]', '["a"",""b"]'),
        # 6: stray interior quote between word chars dropped
        ('["ab"cd"]', '["abcd"]'),
    ])
    def test_repairs(self, spark, broken, expect):
        assert _one(spark, repair_json, broken) == expect


class TestSemanticBlocksText:
    def test_whitelist_filter_and_joins(self, spark):
        resp = (
            '<blocks>'
            '{"index": 1, "tags": ["Article"], "content": ["first", "part"]}'
            '{"index": 2, "tags": ["menu"], "content": ["nav chrome"]}'
            '{"index": 3, "tags": ["options", "WORLD"], "content": ["second"]}'
            '</blocks>'
        )
        out = _one(spark, semantic_blocks_text, resp)
        # block 2 dropped (no whitelisted tag); content joined by " ",
        # blocks by "\n"; tag match is case-insensitive (L6)
        assert out == "first part\nsecond"

    def test_unparseable_block_dropped(self, spark):
        resp = ('{"index": 1, "tags": ["text"], "content": ["ok"]}'
                '{totally broken'
                '{"tags": ["text"], "content": ["missing index"]}')
        assert _one(spark, semantic_blocks_text, resp) == "ok"

    def test_repairs_applied_before_parse(self, spark):
        resp = '{index: 7,\n  tags: ["content"],\n  content: ["a""b"]}'
        assert _one(spark, semantic_blocks_text, resp) == "a b"
