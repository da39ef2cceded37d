"""spark-submit probe: sorted-neighborhood near-dup at corpus scale.

Usage:
    spark-submit --master local[32] --driver-memory 48g --py-files pkg.zip \
        BENCH/snm_scale_driver.py <n_docs>

What 100 TB stresses in SNM that sf0.1 cannot: the two-phase global
rank (quantile bounds + per-range row_number + broadcast offsets) over
many partitions, boundary-bucket pairs that CROSS range-partition
borders, and long runs of equal blocking keys (templated spam) that a
hash block would turn quadratic.

Corpus: md5-derived pseudo-text, globally unique per content id.  Per
100-doc block, doc i with i % 100 == 1 carries doc i-1's text with ONE
WORD substituted at word 40 (past the 10-char blocking prefix, so the
pair stays rank-adjacent and inside the Levenshtein radius).  10% of
docs additionally share one of 50 hot prefixes (first 3 words drawn
from a 50-value pool) — deliberate key skew to exercise the equal-key
runs.

Stages timed after the corpus lands in parquet:
1. snm_candidate_pairs (window=8) — rank + bucket join;
2. snm_near_dup (window=8, max_dist=24) — + thresholded Levenshtein;
   planted-pair recall reported (expected 1.0: one 6-char word swap =
   edit distance <= 13 <= 24).
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from news_rss_spark.operators.snm import snm_candidate_pairs, snm_near_dup


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = (
        SparkSession.builder.appName("snm-scale")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    corpus = "/dev/shm/snm-corpus"
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    cid = F.when(F.col("doc_id") % 100 == 1, F.col("doc_id") - 1) \
           .otherwise(F.col("doc_id"))
    # 10% of content ids start with one of 50 shared hot prefixes
    # (3 words), the rest with their own unique words — then 57 unique
    # tail words; the planted edit swaps word 40 (tail region)
    words = F.expr(
        "transform(sequence(0, 59), j -> CASE "
        "WHEN j < 3 AND _cid % 10 = 0 THEN "
        "  substring(md5(concat('hot:', cast(_cid % 50 as string), ':', "
        "  cast(j as string))), 1, 6) "
        "ELSE substring(md5(concat(cast(_cid as string), ':', "
        "  cast(j as string))), 1, 6) END)")
    text = F.when(
        F.col("doc_id") % 100 == 1,
        F.array_join(F.expr(
            "concat(slice(_w, 1, 39), array('edited'), "
            "slice(_w, 41, 20))"), " "),
    ).otherwise(F.array_join(F.col("_w"), " "))
    (ids.withColumn("_cid", cid).withColumn("_w", words)
        .select("doc_id", text.alias("text"))
        .repartition(64)
        .write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus)
    docs.count()

    t0 = time.time()
    n_cand = snm_candidate_pairs(docs, window=8).count()
    t1 = time.time()
    print(json.dumps({
        "stage": "snm_candidate_pairs", "docs": n_docs,
        "sec": round(t1 - t0, 1),
        "docs_per_sec": round(n_docs / (t1 - t0)),
        "n_candidates": n_cand,
        "cand_per_doc": round(n_cand / n_docs, 2)}), flush=True)

    t2 = time.time()
    pairs = snm_near_dup(docs, window=8, max_dist=24).collect()
    t3 = time.time()
    planted = {(i, i + 1) for i in range(0, n_docs - 1, 100)}
    got = {(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in pairs}
    hit = len(planted & got)
    print(json.dumps({
        "stage": "snm_near_dup", "docs": n_docs,
        "sec": round(t3 - t2, 1),
        "docs_per_sec": round(n_docs / (t3 - t2)),
        "n_pairs": len(pairs), "planted": len(planted),
        "recall": round(hit / len(planted), 4),
        "spurious": len(got - planted)}), flush=True)


if __name__ == "__main__":
    main()
