"""Per-round benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship extraction job (the
north-rule metric: docs/sec through the mapInArrow kernel) over a
deterministic synthesized interleaved corpus, and prints ONE JSON line:

    {"metric": ..., "value": <total suite sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "docs_per_sec": ..., "flagship_docs": ...}

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# >=200k docs so the timed region is kernel-dominated: at 40k the slice
# was fixed-overhead bound (VERDICT r2 — a 2x kernel speedup moved the
# headline docs/sec by 0.1%); at 200k the measured number tracks ms/page
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
PINNED_NOW = datetime(2025, 1, 15, 12, 0, 0)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from news_rss_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # -- flagship throughput: synthesize once (not timed), extract (timed) --
    from news_rss_spark.operators.dedup import dedup_within_run
    from news_rss_spark.operators.extraction import extract_articles, to_publish_news
    from news_rss_spark.sources.synth import documents_df

    docs = documents_df(spark, BENCH_DOCS, seed=7, num_partitions=CPUS * 4)
    docs.persist()
    docs.count()  # materialize input outside the timed region

    # warm the JVM + Python worker pool so the timed region measures
    # steady-state kernel throughput, not one-time process spin-up.
    # 20k docs (10% of the slice): a 256-doc warmup left C2 JIT of the
    # whole-stage-codegen + Arrow converter paths to trip DURING the
    # first timed run — measured 3.3-8.1 s for the identical job
    # depending on compile timing.
    warm = documents_df(spark, max(256, BENCH_DOCS // 10), seed=3,
                        num_partitions=CPUS)
    _force(dedup_within_run(
        to_publish_news(extract_articles(warm, now_utc=PINNED_NOW)), key="id"))

    # best-of-3: the flagship number tracks kernel ms/page, not residual
    # JIT/GC jitter (same interleaved best-of policy as the official
    # scaling runs in BENCH/BASELINE.md; 2 repeats still occasionally
    # caught a late-JIT first pass — measured 3.36/2.73/2.68 s for the
    # identical job, so the third repeat costs ~3 s and removes a ~20%
    # variance band on the headline number)
    flagship_sec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        extracted = extract_articles(docs, now_utc=PINNED_NOW)
        _force(dedup_within_run(to_publish_news(extracted), key="id"))
        flagship_sec = min(flagship_sec, time.perf_counter() - t0)
    docs.unpersist()
    timings["flagship_extract"] = round(flagship_sec, 3)

    # -- headline query suite over the driver sf tables --
    # FIXED alphabetical order, independent of the registry's rotating
    # correctness-window prefix (VERDICT r4 "what's wrong" #4): with the
    # suite order pinned, whichever queries run cold (pay substrate
    # build / first-touch page-cache cost) are the SAME every round, so
    # round-over-round per-query deltas measure code changes, not the
    # rotation's cache-state reshuffle.  r4's apparent regressions
    # (hyperball, pr_curve, interleaved_seq_stats) were exactly this
    # artifact.
    for name, fn in sorted(entry_mod.queries().items()):
        t0 = time.perf_counter()
        try:
            _force(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # never fail the whole bench on one query
            timings[name] = -1.0
            print(f"bench: query {name} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "extraction+query suite wall time (flagship docs/sec in docs_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(BENCH_DOCS / flagship_sec, 1),
        "flagship_docs": BENCH_DOCS,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
