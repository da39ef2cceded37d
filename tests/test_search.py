"""BM25 inverted-index search (operators/search.py)."""

import math

from pyspark.sql import functions as F

from news_rss_spark.operators.search import (
    bm25_search,
    build_inverted_index,
    doc_lengths,
)

CORPUS = [
    (1, "spark shuffle join spark spark"),
    (2, "window agg sort merge join"),
    (3, "spark window window"),
    (4, "the the the the the the the the"),
    (5, None),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _bm25_expected(query, k1=1.2, b=0.75):
    """Straight-line reference implementation over CORPUS."""
    docs = {i: t.lower().split() for i, t in CORPUS if t is not None}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {t: sum(1 for w in docs.values() if t in w) for t in query}
    scores = {}
    for i, w in docs.items():
        s, matched = 0.0, 0
        for t in sorted(set(query)):
            tf = w.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(w) / avgdl))
        if matched:
            scores[i] = (round(s, 6), matched)
    return scores


def test_doc_lengths_and_index(spark):
    dl = {r["doc_id"]: r["dl"] for r in
          doc_lengths(_df(spark).filter("text IS NOT NULL")).collect()}
    assert dl == {1: 5, 2: 5, 3: 3, 4: 8}
    idx = build_inverted_index(_df(spark)).collect()
    tf = {(r["term"], r["doc_id"]): r["tf"] for r in idx}
    assert tf[("spark", 1)] == 3
    assert tf[("window", 3)] == 2
    assert ("the", 4) in tf and tf[("the", 4)] == 8


def test_bm25_matches_reference_formula(spark):
    query = ["spark", "join"]
    out = bm25_search(_df(spark), query, top_n=10).collect()
    got = {r["doc_id"]: (r["score"], r["n_matched"]) for r in out}
    exp = _bm25_expected(query)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][1] == exp[i][1]
        assert abs(got[i][0] - exp[i][0]) < 1e-9, (i, got[i], exp[i])


def test_bm25_ranking_and_topn(spark):
    # doc 1 (3x spark + join) must outrank doc 3 (1x spark) for this query
    out = bm25_search(_df(spark), ["spark", "join"], top_n=2).collect()
    assert len(out) == 2
    assert out[0]["doc_id"] == 1
    assert out[0]["score"] > out[1]["score"]
    # unmatched-only docs never appear
    ids = {r["doc_id"] for r in bm25_search(_df(spark), ["spark"], 10).collect()}
    assert 4 not in ids and 2 not in ids


def test_bm25_plan_has_no_nested_loop_join(spark):
    df = bm25_search(_df(spark), ["spark", "join"], top_n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
