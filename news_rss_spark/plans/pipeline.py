"""The flagship batch job: the reference daemon's steady-state loop
(src/feeds/rss_feeds/mod.rs:71-155) as one declarative Spark plan.

    read documents (doc_id, spans)                 # S1: feed fetch -> pre-landed table scan
      -> with_bucket                               # stable logical partitioning
      -> skip_completed (resume anti-join)         # lineage checkpoint (engine-new)
      -> [range-repartition by bucket]             # only if the scan under-splits
      -> mapInArrow extract + in-kernel dedup      # P1-P9 + L1-L3 + D1 within-run
      -> left-anti join sink keys w/ TTL retention # D1 cross-run + D2 TTL (resume only)
      -> write extracted spans partitionBy(bucket), dynamic overwrite  # S4/S5 publish
      -> lineage from column-pruned sink read-back # D3 upgraded to exactly-once

All relational steps are stock Catalyst-optimized DataFrame ops; the only
Python is the Arrow-batched kernel. Sink format is parquet here; on a real
cluster the same plan targets an Iceberg table (``writeTo(...).append()``)
— parquet + dynamic partition overwrite gives the same idempotent-replace
semantics in the sandbox.
"""

from __future__ import annotations

import os
import warnings
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
from news_rss_spark.operators.extraction import extract_articles
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
    gc_staging_dirs: int = 0


def _gc_orphan_staging(spark: SparkSession, sink_path: str) -> int:
    """Remove orphaned write-staging dirs a killed predecessor left under
    the sink (``.spark-staging-<uuid>`` from dynamic partition overwrite,
    ``_temporary`` from the classic FileOutputCommitter).

    A SIGKILL between staging and commit strands the full staged output —
    at 100 TB that is an entire extra copy of the sink per crash, and it
    sits INSIDE the sink path where nothing else ever reclaims it
    (measured: a killed 50M-doc run left 30 GB of staging that OOM'd the
    resume until cleared).  The lineage protocol is single-writer-per-sink
    (concurrent runs would race the ledger append), so any staging dir
    present at job START belongs to a dead run by definition.

    Scheme-agnostic via the Hadoop FileSystem API — works for file://,
    hdfs:// and s3a:// sinks alike; Spark's own scans never read dot/
    underscore-prefixed dirs, so this is purely a storage reclaim.
    """
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(sink_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return 0
        removed = 0
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith(".spark-staging-") or name == "_temporary":
                fs.delete(st.getPath(), True)
                removed += 1
        return removed
    except Exception:
        # best-effort reclaim: a listing/permission hiccup must never fail
        # the job itself
        return 0


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
    input_clustered_by_bucket: bool = False,
    only_buckets: list[int] | None = None,
    verify_clustered_layout: bool = True,
) -> JobResult:
    """Run (or resume) the extraction pipeline over ``docs``.

    Idempotent: re-running with the same inputs produces a byte-identical
    sink; a partially-completed previous run is finished by processing only
    buckets absent from the lineage table.

    The sink holds the FULL extracted rows — ordered spans, article fields,
    status, byte counts — partitioned by the resume bucket (north rule:
    "writes extracted spans plus per-partition lineage rows").  The
    reference's 6-column ``news`` table is the ``to_publish_news``
    projection over it, not a second copy.

    Single-pass plan (shuffle accounting at 100 TB):
    - when the input table is laid out clustered by ``bucket =
      pmod(xxhash64(doc_id), n_buckets)`` (Iceberg ``bucket(doc_id)``
      partition transform), the whole job is shuffle-free: narrow kernel
      map -> partitioned write, with dedup folded into the kernel pass
      (equal ids share a partition by layout);
    - otherwise ONE range-repartition on ``bucket`` both fixes kernel-stage
      parallelism (compressed text under-splits the scan) and clusters the
      write (1 file per bucket instead of tasks x buckets);
    - lineage derives from a column-pruned read-back of the written sink
      (bucket/status/byte_count only) — no persist of the heavy extraction
      output, the kernel runs exactly once.
    """
    # correctness-critical: bucket-wise idempotent replace requires DYNAMIC
    # partition overwrite — a static overwrite would truncate every completed
    # bucket out of the sink on resume.  Enforce it here instead of trusting
    # the caller's session config (it is a runtime conf, safe to set).
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # lz4 for the sink: snappy-java's JNI path collapses under many writer
    # threads (measured 3.6x slower at local[32]); lz4 keeps the write
    # CPU-light and scaling.  Storage-optimized tables can compact to zstd
    # out-of-band.
    spark.conf.set("spark.sql.parquet.compression.codec", "lz4")

    gc_staging = _gc_orphan_staging(spark, sink_path)

    docs_b = with_bucket(docs, n_buckets=n_buckets)
    if only_buckets is not None:
        # wave-scoped invocation: a driver loop that chunks the bucket space
        # across separate spark-submit runs bounds how much progress one
        # crash can lose to a single wave (the ledger lands per run)
        docs_b = docs_b.filter(F.col("bucket").isin([int(b) for b in only_buckets]))

    lineage_prev = _read_optional(spark, lineage_path, LINEAGE_DDL)
    completed = completed_buckets(lineage_prev, extractor_version) if resume else None
    n_completed = completed.count() if completed is not None else 0
    if n_completed:
        docs_b = skip_completed(docs_b, completed)

    # kernel-stage parallelism guard + write clustering in one exchange:
    # news text compresses ~10x, so a default 128 MB scan split holds >1 GB
    # of raw HTML and the planner may emit far fewer splits than the cluster
    # has cores — fine for a scan, fatal for a CPU-heavy Arrow kernel stage.
    # Hash-partitioning on bucket keeps equal buckets (hence equal doc_ids)
    # together, which makes the in-kernel dedup global and bounds the
    # partitioned write to ~1 file per bucket (a range partitioner would do
    # the same but costs an extra full sampling pass over the input).  At
    # 100 TB the scan yields ~800k splits and the table layout should
    # provide the clustering instead (pass input_clustered_by_bucket=True).
    clustered = input_clustered_by_bucket
    target_parallelism = spark.sparkContext.defaultParallelism * 2
    if not clustered and docs_b.rdd.getNumPartitions() < max(
            target_parallelism, n_buckets):
        docs_b = docs_b.repartition(max(target_parallelism, n_buckets), "bucket")
        clustered = True

    extracted = extract_articles(docs_b.select("doc_id", "spans"),
                                 now_utc=now_utc,
                                 dedup_within_partition=clustered)
    if not clustered:
        # equal ids may span partitions — fall back to a real exchange
        extracted = dedup_within_run(extracted, key="id")
    # mapInArrow replaces the schema, so re-derive the bucket from the
    # stable key (same hash expression — no join needed); skip rows carry
    # their doc_id as ``id`` so failures attribute to the right bucket.
    extracted = with_bucket(extracted, n_buckets=n_buckets, key="id")

    # Cross-run dedup (D1/D2): suppress ids already published — but ONLY
    # those living in *completed* buckets.  Buckets this run processes get
    # overwritten wholesale (idempotent replace), so anti-joining against
    # their existing sink rows would drop rows from the rewritten bucket
    # (data-written-but-lineage-missing crash window).
    sink_prev = _read_optional(spark, sink_path)
    if (sink_prev is not None and "id" in (sink_prev.columns or [])
            and completed is not None and n_completed):
        seen_side = sink_prev.join(F.broadcast(completed), on="bucket", how="left_semi")
        extracted = anti_join_seen(extracted, seen_side, now_utc, ttl_secs,
                                   key="id", ts_col="pub_date")
        # sever the plan's dependence on the sink path we are about to
        # overwrite (with Iceberg this is a snapshot append and the
        # checkpoint is unnecessary); only the incremental resume path pays
        extracted = extracted.localCheckpoint(eager=True)

    # the text column is byte-for-byte derivable from the text spans
    # (kernel joins them with "\n") — storing both would double the write
    # volume; readers re-attach it via extraction.with_text_from_spans
    (extracted.drop("text")
              .write.mode("overwrite")
              .partitionBy("bucket")
              .parquet(sink_path))

    # lineage from a column-pruned read-back of what actually landed —
    # cheap columnar scan, and the ledger can never claim more than the
    # sink holds (crash between write and append leaves an un-recorded
    # bucket that the next run idempotently rewrites)
    sink_now = spark.read.parquet(sink_path)
    if input_clustered_by_bucket and verify_clustered_layout:
        # the clustered-layout promise (equal doc_ids share one scan split,
        # so partition-local dedup is globally correct) is trusted, not
        # planned — guard it: one column-pruned scan of the id column of
        # what just landed.  A violated layout (appended multi-file buckets,
        # byte-range splits separating equal ids) shows up here as surviving
        # duplicates; warn rather than fail so a resume can still proceed.
        dups = (sink_now.filter(F.col("id").isNotNull()).groupBy("id")
                .count().filter(F.col("count") > 1).limit(1).count())
        if dups:
            warnings.warn(
                "input_clustered_by_bucket=True but duplicate ids landed in"
                " the sink — the input layout violated the clustering"
                " promise; rerun with input_clustered_by_bucket=False",
                RuntimeWarning, stacklevel=2)
    lin = lineage_rows(sink_now.select("bucket", "status", "byte_count"),
                       extractor_version, run_id)
    # one read-back serves everything: the collected ledger (<= n_buckets
    # rows) carries ok_count per bucket, so the published total needs no
    # second sink scan.  Only buckets NOT already recorded get appended —
    # the read-back sees the whole sink, including completed buckets.
    lin_rows = lin.collect()
    published = int(sum(r["ok_count"] for r in lin_rows))
    done = ({r["bucket"] for r in completed.collect()}
            if completed is not None and n_completed else set())
    new_rows = [r for r in lin_rows if r["bucket"] not in done]
    lineage_buckets = len(new_rows)
    if new_rows:
        spark.createDataFrame(new_rows, schema=lin.schema) \
             .coalesce(1).write.mode("append").parquet(lineage_path)

    return JobResult(
        published_count=published,
        skipped_buckets=n_completed,
        lineage_buckets=lineage_buckets,
        gc_staging_dirs=gc_staging,
    )


def run_feed_ingestion_job(
    spark: SparkSession,
    feeds: DataFrame,
    sink_path: str,
    lineage_path: str,
    now_utc: datetime,
    run_id: str,
    xml_col: str = "xml",
    feed_id_col: str = "feed_id",
    **job_kwargs,
) -> JobResult:
    """The complete reference user story in one batch call: raw feed XML
    snapshots (feed_id, xml) -> item rows -> kernel documents -> the full
    idempotent extraction pipeline (resume, dedup, bucketed sink, lineage).

    A news-rss user switches to this engine by landing their fetched feed
    bodies as a table and invoking this; everything downstream (S1-S7,
    P1-P10, D1-D3, L1-L6) is the same single-pass plan as
    ``run_extraction_job``.  The feed parse is one extra narrow mapInArrow
    stage fused ahead of the extraction kernel — no added shuffle.
    """
    from news_rss_spark.sources.rss_xml import documents_from_feeds

    docs = documents_from_feeds(feeds, xml_col=xml_col, id_col=feed_id_col)
    return run_extraction_job(spark, docs, sink_path, lineage_path,
                              now_utc, run_id, **job_kwargs)


def run_warc_extraction_job(
    spark: SparkSession,
    warc_files: DataFrame,
    sink_path: str,
    lineage_path: str,
    now_utc: datetime,
    run_id: str,
    content_col: str = "content",
    file_id_col: str = "file_id",
    **job_kwargs,
) -> JobResult:
    """The web-crawl user story in one batch call: WARC archives
    (file_id, content bytes) -> HTTP 200 HTML records -> kernel documents
    -> the full idempotent extraction pipeline (resume, dedup, bucketed
    sink, lineage).

    Same single-pass plan as ``run_extraction_job``; the WARC record
    parse (kernel/warcx.py — gzip members, Content-Length slicing) is one
    extra narrow mapInArrow stage fused ahead of the extraction kernel,
    no added shuffle.  Discovery and politeness live upstream:
    sources/sitemap.py::crawl_frontier -> operators/robots.py::
    filter_by_robots produce the fetch list whose responses land here.
    """
    from news_rss_spark.sources.warc import documents_from_warc

    docs = documents_from_warc(warc_files, content_col=content_col,
                               id_col=file_id_col)
    return run_extraction_job(spark, docs, sink_path, lineage_path,
                              now_utc, run_id, **job_kwargs)


def run_page_bundle_job(
    spark: SparkSession,
    pages: DataFrame,
    sink_path: str,
    lineage_path: str,
    run_id: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    resume: bool = True,
    extractor_version: str = EXTRACTOR_VERSION,
) -> JobResult:
    """The raw-page user story with the same idempotent checkpoint-resume
    protocol as the flagship job: pages ``(doc_id, html, base_url)`` ->
    ONE fused Arrow pass (body spans + head metadata + outlinks + table
    census — ``operators/full_page.py``) -> bucketed dynamic-overwrite
    sink + lineage ledger.

    Reuses the flagship machinery verbatim: bucket assignment and resume
    anti-filter (operators/lineage.py), orphan-staging GC, the
    parallelism/clustering exchange, the landed-sink read-back ledger.
    Differences, documented: the fused kernels never raise (empty
    products, not failures), so lineage ``status`` is constant ``'ok'``
    and ``byte_count`` records bytes EMITTED (span text) rather than the
    article path's extracted-byte accounting; duplicate doc_ids are the
    caller's contract (pre-deduped crawl tables), as re-running the pure
    kernel on repeats is wasteful but harmless.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.parquet.compression.codec", "lz4")
    from news_rss_spark.operators.full_page import extract_page_bundle_df

    gc_staging = _gc_orphan_staging(spark, sink_path)
    pages_b = with_bucket(pages, n_buckets=n_buckets)
    lineage_prev = _read_optional(spark, lineage_path, LINEAGE_DDL)
    completed = (completed_buckets(lineage_prev, extractor_version)
                 if resume else None)
    n_completed = completed.count() if completed is not None else 0
    if n_completed:
        pages_b = skip_completed(pages_b, completed)

    target_parallelism = spark.sparkContext.defaultParallelism * 2
    if pages_b.rdd.getNumPartitions() < max(target_parallelism, n_buckets):
        pages_b = pages_b.repartition(
            max(target_parallelism, n_buckets), "bucket")

    bundle = extract_page_bundle_df(
        pages_b.select("doc_id", "html", "base_url"))
    bundle = with_bucket(bundle, n_buckets=n_buckets, key="doc_id")
    (bundle.write.mode("overwrite")
           .partitionBy("bucket")
           .parquet(sink_path))

    sink_now = spark.read.parquet(sink_path)
    lin_src = sink_now.select(
        "bucket", F.lit("ok").alias("status"),
        F.octet_length(F.concat_ws(
            "\n", F.transform("spans", lambda s: s["text"])))
        .cast("bigint").alias("byte_count"))
    lin = lineage_rows(lin_src, extractor_version, run_id)
    lin_rows = lin.collect()
    published = int(sum(r["ok_count"] for r in lin_rows))
    done = ({r["bucket"] for r in completed.collect()}
            if completed is not None and n_completed else set())
    new_rows = [r for r in lin_rows if r["bucket"] not in done]
    if new_rows:
        spark.createDataFrame(new_rows, schema=lin.schema) \
             .coalesce(1).write.mode("append").parquet(lineage_path)
    return JobResult(
        published_count=published,
        skipped_buckets=n_completed,
        lineage_buckets=len(new_rows),
        gc_staging_dirs=gc_staging,
    )
