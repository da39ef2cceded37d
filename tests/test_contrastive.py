"""Deterministic negative sampling (operators/contrastive.py) vs a
sequential reference: draw arithmetic, anchor/positive/hole exclusion,
slot semantics, stability under repartitioning."""

import hashlib

import pytest
from pyspark.sql import functions as F

from news_rss_spark.operators.contrastive import negative_samples


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs or [(-1, -1)], "a bigint, b bigint") \
        .filter(F.col("a") >= 0)


def _draw_py(salt, a, j, n):
    h = hashlib.md5(f"{salt}:{a}:{j}".encode()).hexdigest()
    return int(h[:15], 16) % n


def _ref(ids, pairs, k, salt="neg-v1"):
    idset = set(ids)
    n = max(ids) + 1
    pos = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    out = []
    for a in ids:
        for j in range(k):
            neg = _draw_py(salt, a, j, n)
            if neg != a and neg in idset and (a, neg) not in pos:
                out.append((a, neg, j))
    return sorted(out)


def test_matches_reference_dense(spark):
    ids = list(range(40))
    pairs = [(0, 1), (2, 3), (10, 20)]
    got = sorted(tuple(r) for r in negative_samples(
        _ids(spark, ids), _pairs(spark, pairs), k=4).collect())
    assert got == _ref(ids, pairs, 4)
    assert got  # dense id space: plenty of survivors


def test_holes_are_excluded(spark):
    ids = [i for i in range(60) if i % 3 != 0]  # 1/3 of id space missing
    got = sorted(tuple(r) for r in negative_samples(
        _ids(spark, ids), _pairs(spark, []), k=5).collect())
    assert got == _ref(ids, [], 5)
    assert all(neg % 3 != 0 for _, neg, _ in got)


def test_positives_excluded_both_orientations(spark):
    ids = list(range(10))
    # every cross pair positive -> only self-collisions COULD survive,
    # and those are excluded too -> empty
    pairs = [(a, b) for a in ids for b in ids if a < b]
    got = negative_samples(_ids(spark, ids), _pairs(spark, pairs),
                           k=6).collect()
    assert got == []


def test_partitioning_invariance(spark):
    ids = list(range(100))
    pairs = [(5, 6)]
    base = sorted(tuple(r) for r in negative_samples(
        _ids(spark, ids), _pairs(spark, pairs), k=3).collect())
    shuffled = sorted(tuple(r) for r in negative_samples(
        _ids(spark, ids).repartition(13), _pairs(spark, pairs),
        k=3).collect())
    assert base == shuffled


def test_at_most_k_and_slot_semantics(spark):
    ids = list(range(50))
    rows = negative_samples(_ids(spark, ids), _pairs(spark, []),
                            k=3).collect()
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["doc_id"], []).append(r["j"])
    for a, slots in per_anchor.items():
        assert len(slots) == len(set(slots)) <= 3
        assert all(0 <= j < 3 for j in slots)


def test_validation(spark):
    with pytest.raises(ValueError):
        negative_samples(_ids(spark, [1]), _pairs(spark, []), k=0)
