"""Hashed-n-gram linear text scorer — the fastText-architecture APPLY
path (score = mean of per-feature weights over hashed unigram+bigram
buckets) that production pipelines run as the model-based quality
filter (CCNet's wiki-vs-crawl scorer, FineWeb-Edu's classifier pass).

The deliberate split from :mod:`nb_classifier`: NB demonstrates
distributed TRAINING (the model is two count tables).  This module
demonstrates scan-speed INFERENCE for any linear bag-of-features model:
feature hashing bounds the vocabulary (unigrams + bigrams -> a fixed
bucket space, the fastText trick, so no vocab table ever shuffles), and
with the weight table folded into a closed form the whole score is ONE
per-row JVM expression — no join, no shuffle, no Python; the filter
runs at parquet-scan speed and composes into the quality_gate scan
projection.

Exactness contract (why this is hash-green oracle-able while real
logistic scores are not): per-bucket weights stay INTEGER until the
final division —

    bucket  = md5_63('ft:' gram) mod 1_000_003
    w_int   = (bucket * 2654435761) mod 2_000_003 - 1_000_001
    score   = round(sum(w_int) / (n_grams * 1_000_001.0), 9)

The sum is exact BIGINT arithmetic (order-independent — no float-fold
ordering contract needed, unlike lm_score/nb_classifier), so both
engines agree bit-for-bit after one division and one round.  The
Knuth multiplicative constant 2654435761 scrambles buckets into
pseudo-weights uniform on [-1, 1] — a deterministic stand-in with the
exact cost profile of trained weights.

Swapping in LEARNED weights: replace the closed form with a broadcast
join against a ``(bucket, weight)`` table (1M rows broadcasts
trivially); :func:`score_with_weights` provides that path.  The scan
stays shuffle-free — the weight table ships to executors once.

Self-citation for parity scope: the reference has no classifier stage;
this is an engine-new training-data operator (brief: quality scoring /
model-filter family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_ngram_score", "score_with_weights",
           "N_BUCKETS", "W_MOD", "W_SCALE"]

N_BUCKETS = 1_000_003     # prime: md5 mod N_BUCKETS stays uniform
W_MOD = 2_000_003         # prime: bucket*K mod W_MOD decorrelates from bucket
W_SCALE = (W_MOD - 1) // 2  # 1_000_001: centers w_int on 0, bounds |w| <= 1
_KNUTH = 2654435761


def _grams(text_col: str) -> Column:
    """Unigrams + space-joined bigrams over lowercase whitespace tokens
    (the zip_with slice idiom — no re-split per position)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+"),
        lambda t: t != "")
    n = F.size(toks)
    bis = F.zip_with(F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                     F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                     lambda a, b: F.concat_ws(" ", a, b))
    return F.concat(toks, bis)


def _bucket(gram: Column) -> Column:
    return F.pmod(F.conv(F.substring(
        F.md5(F.concat(F.lit("ft:"), gram)), 1, 15), 16, 10).cast("long"),
        F.lit(N_BUCKETS))


def hashed_ngram_score(df: DataFrame, text_col: str = "text",
                       threshold: float = 0.0,
                       out: str = "ft_score") -> DataFrame:
    """Adds ``n_grams``, ``out`` (the 9-digit-rounded mean pseudo-weight
    in [-1, 1]; 0.0 for gram-less docs) and ``keep`` (score >=
    ``threshold``).  Pure per-row expression — no shuffle, no UDF."""
    grams = _grams(text_col)
    w_int = F.transform(
        grams,
        lambda g: (_bucket(g) * _KNUTH) % W_MOD - W_SCALE)
    total = F.aggregate(w_int, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size(grams)
    score = F.when(n > 0,
                   F.round(total / (n * float(W_SCALE)), 9)) \
             .otherwise(F.lit(0.0))
    return (df.withColumn("n_grams", n.cast("int"))
            .withColumn(out, score)
            .withColumn("keep", F.col(out) >= threshold))


def score_with_weights(df: DataFrame, weights: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.0,
                       out: str = "ft_score") -> DataFrame:
    """The learned-weights path: ``weights`` = (bucket long, weight
    double).  Explode grams -> broadcast-join the weight table -> mean
    per doc (missing buckets contribute 0.0 via the left join; the mean
    divides by ALL grams, matching the closed-form path's semantics).
    One corpus-sized shuffle (the per-doc re-agg); the weight side never
    shuffles."""
    g = (df.select(id_col, F.explode(_grams(text_col)).alias("gram"))
         .withColumn("bucket", _bucket(F.col("gram"))))
    scored = (g.join(F.broadcast(weights), "bucket", "left")
              .groupBy(id_col)
              .agg(F.count("*").cast("int").alias("n_grams"),
                   F.round(F.coalesce(F.avg(F.coalesce("weight",
                                                       F.lit(0.0))),
                                      F.lit(0.0)), 9).alias(out)))
    return (df.join(scored, id_col, "left")
            .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
            .withColumn(out, F.coalesce(out, F.lit(0.0)))
            .withColumn("keep", F.col(out) >= threshold))
