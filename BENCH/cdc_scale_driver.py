"""spark-submit probe: content-defined chunking at corpus scale, with
planted edited-revision pairs.

Usage:
    spark-submit --master local[32] --driver-memory 48g --py-files pkg.zip \
        BENCH/cdc_scale_driver.py <n_docs>

(local-mode executors share the driver JVM: the default 1g heap OOMs
reading the corpus under 32 scan threads + the ~17x chunk explode.)

The property under test is the one fixed-size chunking cannot deliver:
an INSERTION in the middle of a re-crawled document must leave the
downstream chunk hashes shared, so the revision pair is discoverable by
a plain chunk-hash equi-join.

Corpus: each doc's text is 150 md5-derived 6-char pseudo-words (content id
expanded positionally — every base doc globally unique, no accidental
shared chunks).  Planted structure per 100-doc block: doc ``i`` with
``i % 100 == 1`` carries the text of doc ``i-1`` with three words
INSERTED at word 75 (the "same article, one added sentence" re-crawl
case).  A fixed-size chunker would share only the pre-edit prefix;
CDC re-synchronizes, so the pair shares most of its ~16 chunks.

Stages timed after the corpus is landed to parquet (synthesis excluded):
1. ``cdc_chunks`` (w=16, divisor=64) — anchor scan + chunk slicing;
2. revision-pair mining — inverted chunk index, df<=4 hot prune, pairs
   sharing >= 3 chunks of length >= 24.

Prints one JSON line per stage with docs/sec and planted-pair recall.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.cdc import cdc_chunks, cdc_chunks_gear


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.appName("cdc-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/cdc-corpus"
    # content id: the edited doc (r == 1) re-derives its neighbour's
    # words; everything is a JVM expression, no Python in the loop
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    cid = F.when(F.col("doc_id") % 100 == 1, F.col("doc_id") - 1) \
           .otherwise(F.col("doc_id"))
    words = F.expr(
        "transform(sequence(0, 149), j -> "
        "substring(md5(concat(cast(_cid as string), ':', "
        "cast(j as string))), 1, 6))")
    text = F.when(
        F.col("doc_id") % 100 == 1,
        F.array_join(F.expr(
            "concat(slice(_w, 1, 75), "
            "array('inserted', 'edit', 'marker'), "
            "slice(_w, 76, 75))"), " "),
    ).otherwise(F.array_join(F.col("_w"), " "))
    (ids.withColumn("_cid", cid).withColumn("_w", words)
        .select("doc_id", text.alias("text"))
        .repartition(64)
        .write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus)
    docs.count()

    t0 = time.time()
    chunks = cdc_chunks(docs, w=16, divisor=64)
    chunk_path = "/dev/shm/cdc-chunks"
    (chunks.select("doc_id", "chunk_len", "chunk_md5")
           .write.mode("overwrite").parquet(chunk_path))
    ch = spark.read.parquet(chunk_path)
    n_chunks = ch.count()
    t1 = time.time()
    print(json.dumps({
        "stage": "cdc_chunks", "docs": n_docs, "sec": round(t1 - t0, 1),
        "docs_per_sec": round(n_docs / (t1 - t0)),
        "n_chunks": n_chunks,
        "chunks_per_doc": round(n_chunks / n_docs, 2)}), flush=True)

    # gear variant over the same corpus: same contract, vectorized
    # anchor kernel — the md5-vs-gear throughput comparison
    tg0 = time.time()
    gear_path = "/dev/shm/cdc-chunks-gear"
    (cdc_chunks_gear(docs, divisor=64)
     .select("doc_id", "chunk_len", "chunk_md5")
     .write.mode("overwrite").parquet(gear_path))
    n_gear = spark.read.parquet(gear_path).count()
    tg1 = time.time()
    print(json.dumps({
        "stage": "cdc_chunks_gear", "docs": n_docs,
        "sec": round(tg1 - tg0, 1),
        "docs_per_sec": round(n_docs / (tg1 - tg0)),
        "n_chunks": n_gear,
        "chunks_per_doc": round(n_gear / n_docs, 2),
        "speedup_vs_md5": round((t1 - t0) / (tg1 - tg0), 2)}),
        flush=True)

    t2 = time.time()
    occ = ch.filter(F.col("chunk_len") >= 24)
    # df prune: a chunk in >4 docs is boilerplate, never revision signal
    hot = occ.groupBy("chunk_md5").count().filter(F.col("count") <= 4) \
             .select("chunk_md5")
    pruned = occ.join(hot, "chunk_md5")
    a = pruned.select(F.col("chunk_md5"), F.col("doc_id").alias("a"))
    b = pruned.select(F.col("chunk_md5"), F.col("doc_id").alias("b"))
    pairs = (a.join(b, "chunk_md5").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").count()
             .filter(F.col("count") >= 3)
             .collect())
    t3 = time.time()
    planted = {(i, i + 1) for i in range(0, n_docs - 1, 100)}
    got = {(r["a"], r["b"]) for r in pairs}
    recall = len(got & planted) / len(planted)
    print(json.dumps({
        "stage": "cdc_revision_pairs", "docs": n_docs,
        "sec": round(t3 - t2, 1),
        "docs_per_sec": round(n_docs / (t3 - t2)),
        "n_pairs": len(got), "planted": len(planted),
        "recall": round(recall, 4),
        "spurious": len(got - planted)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
