"""spark-submit probe: winnowing fingerprints + overlap mining at corpus
scale, with planted local overlaps.

Usage:
    spark-submit --master local[32] --py-files pkg.zip \
        BENCH/winnow_scale_driver.py <n_docs>

Synthesizes the standard-mix corpus distributed, stitches spans to text,
PLANTS a shared 12-token run into every (i, i+1) pair where i % 100 == 0
(verbatim quotation — the local-overlap shape whole-document sketches
miss), lands to parquet, then times:

1. fingerprint selection (k=5, w=8 — guarantee length 12);
2. overlap pair mining (min_shared=2, hot-hash prune).

Reports recall over the planted pairs plus docs/sec for both stages.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from news_rss_spark.sources.synth import documents_df_distributed


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    # optional df cap for the mining stage (default 20, the r3 setting).
    # The 10M run measured 423M background pairs at max_df=20 vs 100k
    # planted; pair-unique signal has df == 2, so a tight cap is the
    # production knob that prunes the templated background without
    # touching recall — pass e.g. 5 to measure that counterfactual.
    max_df = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = (
        SparkSession.builder.appName("winnow-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/winnow-corpus"
    # EVERY token of the quote must be PAIR-UNIQUE: a corpus-wide quote
    # gives its fingerprints document-frequency 2*n/100 and the hot-hash
    # prune (correctly) drops them as boilerplate — measured recall 0.0;
    # suffixing only ONE token leaves all but one gram hot and recall
    # drops to the chance that gram wins its window (~1/w, measured
    # 0.12).  Twelve group-suffixed tokens keep every gram at df == 2,
    # where the w+k-1 guarantee applies in full.
    # the synth doc_id URL embeds the global sequential index as its
    # trailing "-<n>" — extract it (zero shuffle) instead of a global
    # row_number window, which would funnel the corpus through one task
    base = (documents_df_distributed(spark, n_docs, seed=29,
                                     num_partitions=64)
            .select(F.regexp_extract("doc_id", r"-(\d+)$", 1)
                    .cast("long").alias("doc_id"),
                    F.concat_ws(" ", F.transform(
                        "spans", lambda s: s["text"])).alias("text")))
    quote = F.expr(
        "array_join(transform(sequence(0, 11), "
        "i -> concat('q', cast(i as string), 'x', "
        "cast(cast(doc_id / 100 as bigint) as string))), ' ')")
    planted = base.select(
        "doc_id",
        F.when((F.col("doc_id") % 100 == 0)
               | (F.col("doc_id") % 100 == 1),
               F.concat(F.col("text"), F.lit(" "), quote))
        .otherwise(F.col("text")).alias("text"))
    planted.write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)
    docs.count()

    t0 = time.time()
    fps = winnow_fingerprints(docs, k=5, w=8)
    n_fps = fps.count()
    t1 = time.time()
    print(json.dumps({"stage": "winnow_fingerprints", "docs": n_docs,
                      "sec": round(t1 - t0, 1),
                      "docs_per_sec": round(n_docs / (t1 - t0)),
                      "n_fingerprints": n_fps}), flush=True)

    t2 = time.time()
    # min_shared=1: a 12-token run == w+k-1 guarantees exactly >= 1
    # shared fingerprint (longer runs are needed to guarantee 2)
    pairs = winnow_overlap_pairs(fps, min_shared=1, max_df=max_df)
    # count + recall DISTRIBUTED: at 1.2M the background-pair set was
    # already 7.46M rows; collecting it to the driver stops scaling to
    # 10M (the same no-unbounded-collect rule the engine's operators
    # follow — the probe harness has to obey it too)
    n_pairs, matched = (
        pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(((F.col("a") % 100 == 0)
                   & (F.col("b") == F.col("a") + 1)).cast("long"))
            .alias("m")).collect()[0])
    t3 = time.time()
    n_planted = len(range(0, n_docs - 1, 100))
    recall = (matched or 0) / n_planted
    print(json.dumps({"stage": "winnow_overlap_pairs", "docs": n_docs,
                      "max_df": max_df,
                      "sec": round(t3 - t2, 1),
                      "docs_per_sec": round(n_docs / (t3 - t2)),
                      "n_pairs": n_pairs,
                      "planted": n_planted,
                      "recall": round(recall, 4)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
