"""Distributed prefix sum / shard packing: exactness vs a driver-side
cumsum under adversarial partitioning, and the no-global-window plan
property."""

import random

from pyspark.sql import functions as F

from news_rss_spark.operators.packing import (
    pack_into_shards,
    with_global_prefix_sum,
)


def _df(spark, n=500, parts=7, seed=3):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 900)) for i in range(n)]
    rng.shuffle(rows)  # arrival order != key order
    return spark.createDataFrame(rows, "doc_id long, n_tokens long") \
                .repartition(parts)


def test_matches_driver_cumsum_exactly(spark):
    df = _df(spark)
    vals = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    acc, want = 0, {}
    for k in sorted(vals):
        want[k] = acc
        acc += vals[k]
    got = {r["doc_id"]: r["prefix_sum"]
           for r in with_global_prefix_sum(df, "doc_id", "n_tokens").collect()}
    assert got == want


def test_shard_sizes_respect_budget_greedily(spark):
    df = _df(spark, n=300)
    out = pack_into_shards(df, budget=5_000).collect()
    shards = {}
    for r in out:
        shards.setdefault(r["shard_id"], []).append(r)
    # shard ids are dense from 0 and every non-final shard crosses budget
    ids = sorted(shards)
    assert ids == list(range(len(ids)))
    for sid in ids[:-1]:
        assert sum(r["n_tokens"] for r in shards[sid]) >= 1  # non-empty
        # a doc starts in shard floor(prefix/budget): check the invariant
        for r in shards[sid]:
            assert r["prefix_sum"] // 5_000 == sid


def test_no_global_window_partition_in_plan(spark):
    df = _df(spark)
    plan = with_global_prefix_sum(df, "doc_id", "n_tokens") \
        ._jdf.queryExecution().executedPlan().toString()
    # the window must be keyed by the physical partition id, never empty
    assert "windowspecdefinition(_pid" in plan
    assert "windowspecdefinition(doc_id" not in plan
