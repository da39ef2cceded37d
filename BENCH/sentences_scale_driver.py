"""spark-submit probe: O(n) sentence segmentation + frequency-threshold
boilerplate removal at corpus scale.

Usage:
    spark-submit --master local[32] --driver-memory 48g --py-files pkg.zip \
        BENCH/sentences_scale_driver.py <n_docs>

Synthesizes the standard-mix corpus distributed (no external data), lands
a text column with REAL '. '-style boundaries (capitalized 8-word
sentences stitched from the span texts) plus a PLANTED per-source banner
sentence in every doc_id%4==0 document, then times:

1. split_sentences over the full corpus — the chars-array scan
   (substring probes measured O(n^2) before the fix; this run is the
   at-scale evidence for the O(n) shape);
2. remove_frequent_sentences grouped by source (threshold 2) over the
   per-doc sentence arrays — the planted banner is over-threshold in
   every source, so every planted copy must vanish (checked: zero
   banner survivors in the rebuilt text).  The word-salad corpus also
   collides naturally at 8-word granularity (short sentences from a
   bounded vocabulary repeat across >2 docs of a source); those drops
   are correct over-threshold removals and are reported separately.

Prints one JSON line per stage with docs/sec and the recall check.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.sentences import split_sentences
from news_rss_spark.operators.text_dedup import remove_frequent_sentences
from news_rss_spark.sources.synth import documents_df_distributed

BANNER = "Subscribe to our newsletter for daily updates."


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    spark = (
        SparkSession.builder.appName("sentences-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/sentprobe-corpus"
    # sentence layout: 8-word runs of the span text, first letter
    # upper-cased, terminated '. ' — real boundary density (~1 boundary
    # per 50 chars) instead of the synth corpus's single trailing period
    words = F.split(F.trim(F.concat_ws(
        " ", F.transform("spans", lambda s: s["text"]))), r"\s+")
    sent_arr = F.expr(
        "transform(sequence(0, (size(w) - 1) div 8), i -> "
        "concat(ucase(substring(array_join(slice(w, i * 8 + 1, 8), ' '), 1, 1)), "
        "substring(array_join(slice(w, i * 8 + 1, 8), ' '), 2), '.'))")
    # synth doc_id is a URL string; derive deterministic buckets from
    # its hash for the source grouping and the banner plant
    (documents_df_distributed(spark, n_docs, seed=31, num_partitions=64)
     .select(F.col("doc_id"),
             F.pmod(F.xxhash64("doc_id"), F.lit(20)).cast("string")
              .alias("source"),
             F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(4)).alias("plant"),
             words.alias("w"))
     .filter(F.size("w") > 0)
     .select("doc_id", "source", "plant", sent_arr.alias("s0"))
     .select("doc_id", "source", "plant",
             F.when(F.col("plant") == 0,
                    F.concat(F.array(F.lit(BANNER)), F.col("s0")))
              .otherwise(F.col("s0")).alias("sentences"))
     .select("doc_id", "source", "plant", "sentences",
             F.array_join("sentences", " ").alias("text"))
     .write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus)
    n_landed = docs.count()  # warm page cache + JVM
    n_planted = docs.filter(F.col("plant") == 0).count()

    t0 = time.time()
    n_sents = split_sentences(docs, "text", "doc_id").count()
    t1 = time.time()
    print(json.dumps({"stage": "split_sentences", "docs": n_landed,
                      "sec": round(t1 - t0, 1),
                      "docs_per_sec": round(n_landed / (t1 - t0)),
                      "sentences": n_sents}), flush=True)

    t2 = time.time()
    clean = remove_frequent_sentences(
        docs.select("doc_id", "source", "sentences"),
        "sentences", "doc_id", group_col="source", max_doc_freq=2)
    stats = (clean.agg(F.count(F.lit(1)).alias("docs_out"),
                       F.sum("n_kept").alias("kept")).collect()[0])
    t3 = time.time()
    total_sents = docs.select(
        F.sum(F.size("sentences")).alias("n")).collect()[0]["n"]
    dropped = int(total_sents) - int(stats["kept"])
    banner_left = clean.filter(
        F.col("clean_text").contains(BANNER)).count()
    print(json.dumps({
        "stage": "boilerplate_filter", "docs": n_landed,
        "sec": round(t3 - t2, 1),
        "docs_per_sec": round(n_landed / (t3 - t2)),
        "docs_out": int(stats["docs_out"]),
        "sentences_dropped": dropped,
        "planted_banner_docs": n_planted,
        "banner_survivors": banner_left,
        "planted_recall_exact": banner_left == 0,
        "natural_hot_dropped": dropped - n_planted,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
