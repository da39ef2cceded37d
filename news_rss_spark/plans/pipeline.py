"""The flagship batch job: the reference daemon's steady-state loop
(src/feeds/rss_feeds/mod.rs:71-155) as one declarative Spark plan.

    read documents (doc_id, spans)                 # S1: feed fetch -> pre-landed table scan
      -> with_bucket                               # stable logical partitioning
      -> skip_completed (resume anti-join)         # lineage checkpoint (engine-new)
      -> mapInArrow extract                        # P1-P9 + L1-L3: the kernel stage
      -> ok/skip split                             # P2 log-and-continue
      -> dropDuplicates(id)                        # D1 within-run
      -> left-anti join sink keys w/ TTL retention # D1 cross-run + D2 TTL
      -> write sink partitionBy(bucket), dynamic overwrite  # S4/S5 publish
      -> append lineage rows                       # D3 upgraded to exactly-once

All relational steps are stock Catalyst-optimized DataFrame ops; the only
Python is the Arrow-batched kernel. Sink format is parquet here; on a real
cluster the same plan targets an Iceberg table (``writeTo(...).append()``)
— parquet + dynamic partition overwrite gives the same idempotent-replace
semantics in the sandbox.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_rss_spark import EXTRACTOR_VERSION
from news_rss_spark.operators.dedup import (
    DEFAULT_TTL_SECS,
    anti_join_seen,
    dedup_within_run,
)
from news_rss_spark.operators.extraction import extract_articles, to_publish_news
from news_rss_spark.operators.lineage import (
    DEFAULT_N_BUCKETS,
    LINEAGE_DDL,
    completed_buckets,
    lineage_rows,
    skip_completed,
    with_bucket,
)


@dataclass
class JobResult:
    published_count: int
    skipped_buckets: int
    lineage_buckets: int


def _read_optional(spark: SparkSession, path: str, ddl: str | None = None) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        reader = spark.read
        if ddl:
            reader = reader.schema(ddl)
        df = reader.parquet(path)
        return df if df.columns else None
    except Exception:
        return None


def run_extraction_job(
    spark: SparkSession,
    docs: DataFrame,
    sink_path: str,
    lineage_path: str,
    now_utc: datetime,
    run_id: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    ttl_secs: int = DEFAULT_TTL_SECS,
    resume: bool = True,
    extractor_version: str = EXTRACTOR_VERSION,
) -> JobResult:
    """Run (or resume) the extraction pipeline over ``docs``.

    Idempotent: re-running with the same inputs produces a byte-identical
    sink; a partially-completed previous run is finished by processing only
    buckets absent from the lineage table.
    """
    # correctness-critical: bucket-wise idempotent replace requires DYNAMIC
    # partition overwrite — a static overwrite would truncate every completed
    # bucket out of the sink on resume.  Enforce it here instead of trusting
    # the caller's session config (it is a runtime conf, safe to set).
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    docs_b = with_bucket(docs, n_buckets=n_buckets)

    lineage_prev = _read_optional(spark, lineage_path, LINEAGE_DDL)
    completed = completed_buckets(lineage_prev, extractor_version) if resume else None
    n_completed = completed.count() if completed is not None else 0
    if n_completed:
        docs_b = skip_completed(docs_b, completed)

    extracted = extract_articles(docs_b.select("doc_id", "spans"),
                                 now_utc=now_utc)
    # mapInArrow replaces the schema, so re-derive the bucket from the
    # stable key (same hash expression — no join needed); skip rows carry
    # their doc_id as ``id`` so failures attribute to the right bucket.
    extracted = with_bucket(extracted, n_buckets=n_buckets, key="id")

    news = to_publish_news(extracted)
    news = dedup_within_run(news, key="id")

    # Cross-run dedup (D1/D2): suppress ids already published — but ONLY
    # those living in *completed* buckets.  Buckets this run processes get
    # overwritten wholesale (idempotent replace), so anti-joining against
    # their existing sink rows would drop rows from the rewritten bucket
    # (data-written-but-lineage-missing crash window).
    sink_prev = _read_optional(spark, sink_path)
    if (sink_prev is not None and "id" in (sink_prev.columns or [])
            and completed is not None and n_completed):
        seen_side = sink_prev.join(F.broadcast(completed), on="bucket", how="left_semi")
        news = anti_join_seen(news, seen_side, now_utc, ttl_secs)

    news_b = with_bucket(news, n_buckets=n_buckets, key="id")
    # cache the extraction output across the two writes (data + lineage) so
    # the kernel runs once; at cluster scale this is a persisted staging
    # table or DataFrame persist(DISK_ONLY)
    extracted.persist()
    try:
        # localCheckpoint severs the plan's dependence on the sink path we
        # are about to overwrite (with Iceberg this is a snapshot append
        # and the checkpoint is unnecessary)
        news_mat = news_b.localCheckpoint(eager=True)
        (news_mat.write.mode("overwrite")
                 .partitionBy("bucket")
                 .parquet(sink_path))
        # materialize lineage BEFORE appending: its plan transitively reads
        # the lineage path (resume filter), so a lazy count after the append
        # would see its own output
        lin = lineage_rows(extracted, extractor_version, run_id).localCheckpoint(eager=True)
        lineage_buckets = lin.count()
        lin.write.mode("append").parquet(lineage_path)
        published = spark.read.parquet(sink_path).count()
    finally:
        extracted.unpersist()

    return JobResult(
        published_count=published,
        skipped_buckets=n_completed,
        lineage_buckets=lineage_buckets,
    )
