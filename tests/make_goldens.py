"""Compute and freeze the golden span sequences for the fixture corpus.

Run once (``python tests/make_goldens.py``); the output JSON is committed
and ``test_kernel_extract.py`` asserts exact (kind, text, media_ref, order)
equality against it forever after (FIXTURES.md §2).  The pinned ``now``
stands in for the reference's ``Utc::now()`` date fallback (mod.rs:189).
"""

import json
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_rss_spark.kernel.extract import extract_document  # noqa: E402
from tests.fixture_docs import fixture_corpus  # noqa: E402

PINNED_NOW = datetime(2025, 1, 15, 12, 0, 0)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "golden_spans.json")


def main():
    goldens = []
    for doc in fixture_corpus():
        res = extract_document(doc["doc_id"], doc["spans"], PINNED_NOW)
        entry = {"doc_id": doc["doc_id"], "status": res["status"], "error": res.get("error")}
        if res["status"] == "ok":
            entry.update({
                "spans": [
                    {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"]}
                    for s in res["spans"]
                ],
                "id": res["id"],
                "title": res["title"],
                "link": res["link"],
                "source": res["source"],
                "pub_date": res["pub_date"].isoformat(),
                "photo_path": res["photo_path"],
                "text": res["text"],
            })
        goldens.append(entry)
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False)
    ok = sum(1 for g in goldens if g["status"] == "ok")
    print(f"wrote {len(goldens)} goldens ({ok} ok, {len(goldens) - ok} skip) -> {OUT}")


if __name__ == "__main__":
    main()
