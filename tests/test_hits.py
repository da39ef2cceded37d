"""HITS hubs & authorities: hand-graph parity, invariants, plan shape."""

import pytest
from pyspark.sql import functions as F

from news_rss_spark.operators.hits import hits


def _ref_hits(edges, iters):
    """Sequential reference with the same L1 + 9-digit contract."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    es = sorted(set(edges))
    for _ in range(iters):
        raw_a = {}
        for u, v in es:
            raw_a[v] = raw_a.get(v, 0.0) + hub[u]
        t = sum(raw_a.values())
        auth = {n: round(raw_a.get(n, 0.0) / t, 9) for n in nodes}
        raw_h = {}
        for u, v in es:
            raw_h[u] = raw_h.get(u, 0.0) + auth[v]
        t = sum(raw_h.values())
        hub = {n: round(raw_h.get(n, 0.0) / t, 9) for n in nodes}
    return hub, auth


EDGES = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (1, 2)]  # dup counts once


def test_hand_graph_parity(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=3).collect()}
    hub, auth = _ref_hits(EDGES, 3)
    for n in hub:
        assert got[n] == (pytest.approx(hub[n], abs=2e-9),
                          pytest.approx(auth[n], abs=2e-9))


def test_l1_normalized_and_roles(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    rows = hits(df, iters=3).collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert sum(r.auth for r in rows) == pytest.approx(1.0, abs=1e-6)
    by = {r.node: r for r in rows}
    # node 3 is cited by 1,2,4 -> top authority; node 1 cites 2,3 -> top hub
    assert by[3].auth == max(r.auth for r in rows)
    assert by[1].hub == max(r.hub for r in rows)
    # no in-links -> zero authority; no out-links -> zero hub
    assert by[1].auth == 0.0 and by[5].hub == 0.0


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(map(tuple, hits(df.repartition(1), iters=2).collect()))
    b = sorted(map(tuple, hits(df.repartition(7), iters=2).collect()))
    assert a == b


def test_no_per_iteration_driver_collect(spark):
    # the normalizer must be an in-plan broadcast aggregate: the final
    # plan contains BroadcastNestedLoopJoin of 1-row totals but never a
    # CollectLimit/driver scalar; smoke it via the physical plan string.
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = hits(df, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" not in plan
