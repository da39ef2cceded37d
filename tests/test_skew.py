"""Skew-salted join (operators/skew.py): equality with the plain join on
skewed data (inner + left, null keys, empty right), salt fan-out, and the
shuffled (not nested-loop) physical plan."""

import pytest
from pyspark.sql import functions as F

from news_rss_spark.operators.skew import salted_join


def _skewed(spark):
    # one hot key (90% of rows) + a tail + a null key
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(200)]
    rows.append((999, None, 0.0))
    left = spark.createDataFrame(rows, "id long, key string, v double")
    right = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("unmatched", 3)],
        "key string, dim long")
    return left, right


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        left, right = _skewed(spark)
        plain = sorted(tuple(r) for r in left.join(right, "key").collect())
        for n in (2, 8):
            got = sorted(tuple(r) for r in
                         salted_join(left, right, "key", n_salt=n).collect())
            assert got == plain

    def test_left_join_keeps_unmatched_and_null_keys(self, spark):
        left, right = _skewed(spark)
        plain = sorted(tuple(str(x) for x in r) for r in
                       left.join(right, "key", "left").collect())
        got = sorted(tuple(str(x) for x in r) for r in
                     salted_join(left, right, "key", how="left").collect())
        assert got == plain
        assert len(got) == 201  # every left row survives, incl. null key

    def test_hot_key_actually_fans_out(self, spark):
        left, _ = _skewed(spark)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
        n = (left.filter(F.col("key") == "hot")
             .select(salt.alias("s")).distinct().count())
        assert n >= 4  # the hot key spreads over most of the 8 sub-keys

    def test_plan_is_shuffled_equi_join(self, spark):
        left, right = _skewed(spark)
        out = salted_join(left, right, "key")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_unsupported_how_raises(self, spark):
        left, right = _skewed(spark)
        with pytest.raises(ValueError):
            salted_join(left, right, "key", how="full")
