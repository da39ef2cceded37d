"""spark-submit probe: Misra-Gries heavy hitters + Aho-Corasick blocklist
scan at corpus scale.

Usage:
    spark-submit --master local[32] --py-files pkg.zip \
        BENCH/hh_blocklist_scale_driver.py <n_docs>

Synthesizes the standard-mix corpus distributed (no external data), lands
it to parquet (synthesis excluded from timing), then times:

1. heavy_hitters over the exploded token stream, k=100 — the MG mining
   pass (no shuffle) + candidates-only exact recount;
2. blocklist_hits with a 64-phrase list — one Aho-Corasick Arrow stage,
   no shuffle, hit-sized output.

Prints one JSON line per stage with docs/sec and result sizes.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.blocklist import blocklist_hits
from news_rss_spark.operators.heavy_hitters import heavy_hitters
from news_rss_spark.sources.synth import documents_df_distributed


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    spark = (
        SparkSession.builder.appName("hh-blocklist-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/hhprobe-corpus"
    # the synth corpus is the north-rule spans shape; stitch the span
    # texts into one text column (the same text-probe convention as the
    # paragraph-dedup 1.2M run) and land it so synthesis stays out of
    # the timing
    (documents_df_distributed(spark, n_docs, seed=23, num_partitions=64)
     .select(F.col("doc_id").cast("string").alias("doc_id"),
             F.concat_ws(" ", F.transform("spans", lambda s: s["text"]))
             .alias("text"))
     .write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus)
    docs.count()  # warm page cache + JVM

    t0 = time.time()
    toks = (docs.filter(F.length(F.trim("text")) > 0)
            .select(F.explode(F.split(F.trim("text"), r"\s+"))
                    .alias("token")))
    hh = heavy_hitters(toks, "token", k=100).collect()
    t1 = time.time()
    print(json.dumps({"stage": "heavy_hitters", "docs": n_docs,
                      "sec": round(t1 - t0, 1),
                      "docs_per_sec": round(n_docs / (t1 - t0)),
                      "n_heavy": len(hh)}), flush=True)

    # 64 phrases drawn from the news-mix synth vocabulary: 10 single
    # words (high volume) + 54 bigram combinations (realistic blocklist
    # shape — phrases, not tokens)
    vocab = ["power", "crisis", "growth", "rescue", "outbreak", "launch",
             "security", "minister", "election", "report"]
    phrases = (vocab
               + [f"{a} {b}" for a in vocab for b in vocab
                  if a != b][:54])
    t2 = time.time()
    n_hits = (blocklist_hits(docs, phrases)
              .agg(F.count(F.lit(1)), F.sum("n_hits")).collect()[0])
    t3 = time.time()
    print(json.dumps({"stage": "blocklist_scan", "docs": n_docs,
                      "n_phrases": len(phrases),
                      "sec": round(t3 - t2, 1),
                      "docs_per_sec": round(n_docs / (t3 - t2)),
                      "hit_rows": int(n_hits[0]),
                      "total_hits": int(n_hits[1])}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
