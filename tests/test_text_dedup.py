"""Structural tests for the banded dedup operators (beyond oracle parity):
pigeonhole completeness for SimHash and the b x r S-curve for MinHash."""

import itertools

from pyspark.sql import functions as F

from news_rss_spark.operators.text_dedup import (
    minhash_candidate_pairs,
    simhash16,
    simhash_near_dup_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    rows = []
    for i in range(40):
        words = base.split()
        # progressive single-word edits create a near-dup gradient
        words[i % len(words)] = f"w{i}"
        rows.append((i, " ".join(words)))
    # exact near-dup cluster
    rows += [(100, base), (101, base), (102, base + " today")]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSimhashBanding:
    def test_pairs_exactly_match_brute_force(self, spark):
        """Pigeonhole banding must return EXACTLY all pairs with
        hamming <= max_hamming — including pairs whose differing bits are
        spread 2+1 or 1+1+1 across naive halves (the round-1 OR-of-halves
        blocking missed those)."""
        d = _docs(spark)
        for max_hamming in (1, 2, 3):
            got = {
                (r["a"], r["b"], r["hamming"])
                for r in simhash_near_dup_pairs(d, max_hamming=max_hamming).collect()
            }
            sims = {r["doc_id"]: r["simhash"]
                    for r in simhash16(d).collect()}
            want = set()
            for a, b in itertools.combinations(sorted(sims), 2):
                h = bin(sims[a] ^ sims[b]).count("1")
                if h <= max_hamming:
                    want.add((a, b, h))
            assert got == want

    def test_no_nested_loop_join(self, spark):
        plan = simhash_near_dup_pairs(_docs(spark), max_hamming=3) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestMinhashBanding:
    def test_r2_is_stricter_than_r1(self, spark):
        """r=2 banding requires a full band (2 hashes) to agree: candidate
        sets shrink monotonically vs r=1, and identical docs always remain
        candidates (every band agrees)."""
        d = _docs(spark)
        r1 = {(r["a"], r["b"]) for r in
              minhash_candidate_pairs(d, n_hashes=4, rows_per_band=1).collect()}
        r2 = {(r["a"], r["b"]) for r in
              minhash_candidate_pairs(d, n_hashes=4, rows_per_band=2).collect()}
        assert r2 <= r1
        assert (100, 101) in r2  # identical texts collide in every band

    def test_no_nested_loop_join(self, spark):
        plan = minhash_candidate_pairs(_docs(spark), n_hashes=4) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_simhash_banding_rejects_zero_width_bands(spark):
    import pytest
    with pytest.raises(ValueError, match="bands"):
        simhash_near_dup_pairs(_docs(spark), max_hamming=5, n_bits=4)


class TestDatasetSplit:
    def test_stable_under_repartition_and_growth(self, spark):
        """The property randomSplit cannot give: assignments depend only on
        (salt, id) — identical across partitionings, and adding documents
        never moves existing ones between splits."""
        from news_rss_spark.operators.text_analysis import assign_split
        d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"]
             for r in assign_split(d).collect()}
        b = {r["doc_id"]: r["split"]
             for r in assign_split(d.repartition(13)).collect()}
        assert a == b
        grown = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
        g = {r["doc_id"]: r["split"] for r in assign_split(grown).collect()}
        assert all(g[k] == v for k, v in a.items())
        # fractions roughly honored and salt re-rolls
        from collections import Counter
        c = Counter(a.values())
        assert 120 < c["test"] < 280 and 120 < c["val"] < 280
        s2 = {r["doc_id"]: r["split"]
              for r in assign_split(d, salt="split-v2").collect()}
        assert s2 != a
