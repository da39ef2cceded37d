"""Golden span-sequence tests: kernel output must equal the frozen goldens
on (kind, text, media_ref, order) — the per-row invariant from
BASELINE.json input_hint (FIXTURES.md §2)."""

import json
import os
from datetime import datetime

from news_rss_spark.kernel.extract import (
    ERR_EMPTY_DESCRIPTION,
    ERR_EMPTY_TITLE,
    extract_batch,
    extract_document,
)
from tests.fixture_docs import fixture_corpus

PINNED_NOW = datetime(2025, 1, 15, 12, 0, 0)
GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures", "golden_spans.json")


def _goldens():
    with open(GOLDEN_PATH) as f:
        return {g["doc_id"]: g for g in json.load(f)}


class TestGoldenSpans:
    def test_span_sequence_equality(self):
        goldens = _goldens()
        corpus = fixture_corpus()
        assert len(corpus) == len(goldens)
        mismatches = []
        for doc in corpus:
            g = goldens[doc["doc_id"]]
            res = extract_document(doc["doc_id"], doc["spans"], PINNED_NOW)
            if res["status"] != g["status"]:
                mismatches.append((doc["doc_id"], "status", g["status"], res["status"]))
                continue
            if res["status"] != "ok":
                assert res["error"] == g["error"]
                continue
            got = [(s["kind"], s["text"], s["media_ref"]) for s in res["spans"]]
            want = [(s["kind"], s["text"], s["media_ref"]) for s in g["spans"]]
            if got != want:
                mismatches.append((doc["doc_id"], "spans", want, got))
        assert not mismatches, mismatches[:3]

    def test_scalar_fields_match(self):
        goldens = _goldens()
        for doc in fixture_corpus():
            g = goldens[doc["doc_id"]]
            if g["status"] != "ok":
                continue
            res = extract_document(doc["doc_id"], doc["spans"], PINNED_NOW)
            assert res["id"] == g["id"]
            assert res["link"] == g["link"]
            assert res["source"] == g["source"]
            assert res["pub_date"].isoformat() == g["pub_date"]
            assert res["photo_path"] == g["photo_path"]
            assert res["text"] == g["text"]

    def test_match_rate_is_100_percent(self):
        """The headline correctness metric: span-sequence exact-match rate."""
        goldens = _goldens()
        corpus = fixture_corpus()
        ok = 0
        for doc in corpus:
            g = goldens[doc["doc_id"]]
            res = extract_document(doc["doc_id"], doc["spans"], PINNED_NOW)
            if res["status"] != g["status"]:
                continue
            if res["status"] != "ok":
                ok += 1
                continue
            got = [(s["kind"], s["text"], s["media_ref"]) for s in res["spans"]]
            want = [(s["kind"], s["text"], s["media_ref"]) for s in g["spans"]]
            ok += got == want
        assert ok == len(corpus)


class TestRequiredFieldPredicate:
    """P2 (mod.rs:158-168): errors are reported, never raised."""

    def test_missing_title(self):
        res = extract_document("g", [{"kind": "meta", "text": "{}", "media_ref": None, "offset": 0}])
        assert res == {"status": "skip", "error": ERR_EMPTY_TITLE, "id": "g"}

    def test_missing_description(self):
        res = extract_document("g", [
            {"kind": "meta", "text": '{"title": "t"}', "media_ref": None, "offset": 0}
        ])
        assert res["error"] == ERR_EMPTY_DESCRIPTION

    def test_missing_guid(self):
        assert extract_document(None, [])["status"] == "skip"
        assert extract_document("", [])["status"] == "skip"

    def test_batch_never_raises(self):
        docs = [None, "", "ok-id", "bad-meta"]
        spans = [
            None,
            [],
            [{"kind": "meta", "text": '{"title":"t","description":"d"}', "media_ref": None, "offset": 0}],
            [{"kind": "meta", "text": "{not json", "media_ref": None, "offset": 0}],
        ]
        results = extract_batch(docs, spans, PINNED_NOW)
        assert [r["status"] for r in results] == ["skip", "skip", "ok", "skip"]


class TestOffsets:
    def test_offsets_are_cumulative_text_lengths(self):
        doc = fixture_corpus()[0]
        res = extract_document(doc["doc_id"], doc["spans"], PINNED_NOW)
        offset = 0
        for s in res["spans"]:
            assert s["offset"] == offset
            if s["text"] is not None:
                offset += len(s["text"])
