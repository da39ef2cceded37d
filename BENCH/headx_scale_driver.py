"""spark-submit probe: head-metadata, outlink, and table extraction at
corpus scale.

Usage:
    spark-submit --master local[32] --driver-memory 24g --py-files pkg.zip \
        BENCH/headx_scale_driver.py <n_docs>

Synthesizes full HTML pages distributed (no external data): a head with
og:title/og:description/canonical (+ JSON-LD on every second page, so the
script pre-scan pays its real mixed-page cost), a body of span-text
paragraphs, three anchors (absolute hub + relative + nofollow parent) and
a 2x3 table.  Then times the three Arrow stages independently over the
SAME landed corpus and cross-checks planted structure exactly:

- metadata: one row per page, every headline from og:title, JSON-LD
  authors on exactly the planted half;
- links: 3 resolved rows per page; anchor_text_index over the hub target
  space must reproduce the planted per-bucket cardinalities;
- tables: exactly 6 cells per page, header flags on row 0 only.

All three stages are scan-shaped (mapInPandas, no shuffle except the
anchor index's single hash agg), so docs/sec here is the 100 TB
per-executor number.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.links import anchor_text_index, extract_links_df
from news_rss_spark.operators.metadata import extract_metadata_df
from news_rss_spark.operators.tables import extract_tables_df
from news_rss_spark.sources.synth import documents_df_distributed


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.appName("headx-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/headx-corpus"
    # the synth span texts carry organic HTML-ish fragments (that's the
    # point of the extraction corpus); neutralize '<' here so the planted
    # link/table cardinalities below are exactly checkable
    body_text = F.regexp_replace(F.trim(F.concat_ws(
        " ", F.transform("spans", lambda s: s["text"]))), "<", " ")
    h = F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000_007))
    hs = h.cast("string")
    ld = F.when(
        h % 2 == 0,
        F.concat(F.lit('<script type="application/ld+json">'
                       '{"@type":"NewsArticle","author":{"name":"A '),
                 (h % 97).cast("string"), F.lit('"}}</script>')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="OG '), hs,
        F.lit('"><meta property="og:description" content="D '),
        (h % 13).cast("string"),
        F.lit('"><link rel="canonical" href="https://c.example/p/'), hs,
        F.lit('">'), ld,
        F.lit("<title>T</title></head><body><p>"), body_text,
        F.lit('</p><p><a href="https://hub.example/t/'),
        (h % 1000).cast("string"),
        F.lit('">hub</a> <a href="item'), (h % 10).cast("string"),
        F.lit('.html">rel</a> <a href="../top" rel="nofollow">up</a></p>'
              "<table><tr><th>K</th><th>V</th><th>N</th></tr><tr><td>k"),
        (h % 7).cast("string"), F.lit("</td><td>"), hs,
        F.lit("</td><td>x</td></tr></table></body></html>"))
    base = F.concat(F.lit("https://s"), (h % 20).cast("string"),
                    F.lit(".example.org/sec/"), (h % 7).cast("string"),
                    F.lit("/page.html"))
    (documents_df_distributed(spark, n_docs, seed=37, num_partitions=64)
     .select(F.col("doc_id"), (h % 2 == 0).alias("has_ld"),
             html.alias("html"), base.alias("base_url"))
     .write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus)
    n_landed = docs.count()  # warm page cache + JVM
    n_ld = docs.filter("has_ld").count()
    bytes_total = docs.select(
        F.sum(F.octet_length("html")).alias("b")).collect()[0]["b"]

    t0 = time.time()
    meta = extract_metadata_df(docs)
    got = meta.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("headline").startswith("OG "), 1)
               .otherwise(0)).alias("og"),
        F.sum(F.when(F.col("author").isNotNull(), 1).otherwise(0))
         .alias("authors")).collect()[0]
    t1 = time.time()
    print(json.dumps({
        "stage": "metadata", "docs": n_landed, "sec": round(t1 - t0, 1),
        "docs_per_sec": round(n_landed / (t1 - t0)),
        "mb_per_sec": round(bytes_total / (t1 - t0) / 1e6, 1),
        "rows": got["rows"], "og_headlines": got["og"],
        "jsonld_authors": got["authors"], "jsonld_planted": n_ld,
        "exact": got["rows"] == n_landed == got["og"]
                 and got["authors"] == n_ld}), flush=True)

    t2 = time.time()
    links = extract_links_df(docs)
    idx = anchor_text_index(links)
    stats = idx.agg(F.count(F.lit(1)).alias("targets"),
                    F.sum("n_links").alias("links"),
                    F.sum("n_nofollow").alias("nofollow")).collect()[0]
    t3 = time.time()
    print(json.dumps({
        "stage": "links+anchor_index", "docs": n_landed,
        "sec": round(t3 - t2, 1),
        "docs_per_sec": round(n_landed / (t3 - t2)),
        "targets": stats["targets"], "links": stats["links"],
        "nofollow": stats["nofollow"],
        "exact": stats["links"] == 3 * n_landed
                 and stats["nofollow"] == n_landed}), flush=True)

    t4 = time.time()
    cells = extract_tables_df(docs)
    c = cells.agg(F.count(F.lit(1)).alias("cells"),
                  F.sum(F.col("is_header").cast("long")).alias("headers"))\
             .collect()[0]
    t5 = time.time()
    print(json.dumps({
        "stage": "tables", "docs": n_landed, "sec": round(t5 - t4, 1),
        "docs_per_sec": round(n_landed / (t5 - t4)),
        "cells": c["cells"], "headers": c["headers"],
        "exact": c["cells"] == 6 * n_landed
                 and c["headers"] == 3 * n_landed}), flush=True)

    # separate body-span stage (the fourth product the fused bundle
    # carries): scan-shaped mapInPandas counting spans per page — a
    # LOWER bound on a real separate spans stage's cost (it ships no
    # nested span structs back through Arrow, only one int per page),
    # so the 4-stage fusion ratio below is conservative
    from news_rss_spark.kernel.htmlx import extract_page_spans

    def _span_counts(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "n": [len(extract_page_spans(h or ""))
                      for h in pdf["html"]]})

    t8 = time.time()
    n_spans_sep = (docs.select("html")
                   .mapInPandas(_span_counts, "n int")
                   .agg(F.sum("n").alias("s")).collect()[0]["s"])
    t9 = time.time()
    print(json.dumps({
        "stage": "spans_separate", "docs": n_landed,
        "sec": round(t9 - t8, 1),
        "docs_per_sec": round(n_landed / (t9 - t8)),
        "spans": n_spans_sep}), flush=True)

    # fused one-pass bundle (adds the body-span extractor on top of the
    # three products above) vs the separate stages measured separately
    from news_rss_spark.operators.full_page import extract_page_bundle_df
    t6 = time.time()
    bundle = extract_page_bundle_df(docs)
    b = bundle.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("headline").startswith("OG "), 1).otherwise(0))
         .alias("og"),
        F.sum(F.size("links")).alias("links"),
        F.sum("n_table_cells").alias("cells"),
        F.sum(F.size("spans")).alias("spans")).collect()[0]
    t7 = time.time()
    sep_total = round((t1 - t0) + (t3 - t2) + (t5 - t4), 1)
    sep4_total = round(sep_total + (t9 - t8), 1)
    print(json.dumps({
        "stage": "fused_bundle", "docs": n_landed,
        "sec": round(t7 - t6, 1),
        "docs_per_sec": round(n_landed / (t7 - t6)),
        "separate_stages_sec": sep_total,
        "separate_4stage_sec": sep4_total,
        "fusion_speedup": round(sep_total / (t7 - t6), 2),
        "fusion_speedup_vs_4stage": round(sep4_total / (t7 - t6), 2),
        "rows": b["rows"], "og_headlines": b["og"], "links": b["links"],
        "cells": b["cells"], "spans": b["spans"],
        "exact": b["rows"] == n_landed == b["og"]
                 and b["links"] == 3 * n_landed
                 and b["cells"] == 6 * n_landed}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
