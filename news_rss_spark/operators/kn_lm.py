"""Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
Chen & Goodman 1998 empirical study) — the KenLM-family estimator, as
pure DataFrame aggregations.

The existing ``lm_score`` quality filter uses Laplace smoothing, which is
known-bad for n-gram LMs (it bleeds far too much mass to unseen events).
Production perplexity filters (CCNet's KenLM models) use interpolated KN:

- absolute discounting: every observed bigram count is discounted by
  ``D = n1 / (n1 + 2*n2)`` (the Ney/Essen/Kneser leave-one-out estimate,
  with n1/n2 = number of bigram TYPES seen exactly once/twice);
- the freed mass ``D * N1+(v.) / c(v)`` backs off to the CONTINUATION
  probability ``Pcont(w) = N1+(.w) / N1+(..)`` — how many distinct
  contexts a word follows, not how often it occurs (the insight that
  downweights "Francisco": frequent but glued to one context).

    P(w|v) = (max(c(vw) - D, 0) + D * N1+(v.) * Pcont(w)) / c(v)

Everything here is decomposable hash aggregations over the bigram-count
relation — counts, distinct-continuation counts, and count-of-counts are
all one groupBy each — so the model trains in a constant number of
shuffles at any corpus size, and the model IS two vocab-sized tables
plus three scalars (the same "the model is a DataFrame" shape as the
Naive-Bayes classifier).  The scalars ride in-plan as a broadcast 1-row
aggregate (the documented broadcast-1-row crossJoin pattern), so nothing
is collected driver-side.

Float determinism (what makes the probabilities oracle-checkable): all
inputs to the probability are exact integers; D and each row's prob are
single per-row double expressions with a fixed operation tree —
``(greatest(c12 - D, 0) + (D * nfollow) * (nprec / nbig)) / c1`` — which
both engines evaluate identically (no cross-row float aggregation
anywhere), rounded to 9 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kn_bigram_probs"]


def _tokens(text_col: str):
    # the lm_score tokenization contract: lowercased whitespace words
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def kn_bigram_probs(docs: DataFrame, text_col: str = "text",
                    broadcast_dims: bool = True) -> DataFrame:
    """Interpolated-KN probability for every OBSERVED bigram:
    ``(w1, w2, c12, prob)``.  Unseen-bigram mass is implied by the model
    (``D * N1+(v.) * Pcont(w) / c(v)``) and needs no materialized rows.

    ``c(v)`` is the bigram-context total ``sum_w c(vw)`` (count of v as a
    non-final token), per the standard formulation — NOT the unigram
    token count, which differs at document edges.

    ``broadcast_dims``: the context/continuation tables are VOCAB-sized
    (word types, not tokens) — broadcastable for any single-language
    corpus (even web-scale English is ~10^7-10^8 types after the
    tokenizer, and Heaps' law keeps growth sublinear); flip to False at
    extreme vocab (all-language, no normalization) to take shuffled
    equi-joins on the word key instead, where AQE's skew handling
    absorbs the stopword heat."""
    w = _tokens(text_col)
    grams = F.expr("transform(sequence(0, size(w) - 2), "
                   "i -> struct(w[i] as w1, w[i+1] as w2))")
    bigrams = (docs.select(w.alias("w"))
               .filter(F.size("w") >= 2)
               .select(F.explode(grams).alias("g"))
               .select(F.col("g.w1"), F.col("g.w2"))
               .filter((F.col("w1") != "") & (F.col("w2") != ""))
               .groupBy("w1", "w2")
               .agg(F.count(F.lit(1)).cast("long").alias("c12")))
    # context table: total + distinct continuations per left word
    ctx = bigrams.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("nfollow"))
    # continuation table: distinct left contexts per right word
    prec = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("nprec"))
    # corpus scalars: distinct bigram types + count-of-counts for D
    consts = bigrams.agg(
        F.count(F.lit(1)).cast("long").alias("nbig"),
        F.sum(F.when(F.col("c12") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("c12") == 2, 1).otherwise(0))
        .cast("long").alias("n2"))
    # Ney discount, with the degenerate-corpus guard: on templated text
    # where NO bigram type occurs exactly once or twice (true of the
    # sf0.1 synth corpus — found as an ANSI DIVIDE_BY_ZERO in the bench,
    # which the small-SF oracle runs never hit), n1 + 2*n2 = 0 and the
    # leave-one-out estimate is undefined; KenLM aborts here ("could not
    # calculate Kneser-Ney discounts").  We pin D = 0.5 instead — any
    # constant in (0, 1) is a valid absolute discount, and the fallback
    # is replayed verbatim by the oracle.
    denom = (F.col("n1") + F.lit(2) * F.col("n2")).cast("double")
    d_disc = F.when(denom > 0,
                    F.col("n1").cast("double") / denom).otherwise(F.lit(0.5))
    prob = ((F.greatest(F.col("c12").cast("double") - F.col("D"), F.lit(0.0))
             + (F.col("D") * F.col("nfollow"))
             * (F.col("nprec").cast("double")
                / F.col("nbig").cast("double")))
            / F.col("c1").cast("double"))
    if broadcast_dims:
        ctx, prec = F.broadcast(ctx), F.broadcast(prec)
    return (bigrams
            .join(ctx, "w1")
            .join(prec, "w2")
            .crossJoin(F.broadcast(consts.select(d_disc.alias("D"),
                                                 "nbig")))
            .select("w1", "w2", "c12", F.round(prob, 9).alias("prob")))
