"""Corpus bigram language model + per-document log-probability scoring
(engine-new, training-data pipeline): the CCNet/Wikipedia-LM-style
perplexity quality filter — train token statistics ON the corpus, score
every document against them, drop the tails.

Determinism contract (what makes this oracle-checkable, which float
aggregation across rows normally is not):

- counts are exact integers (two hash aggregations with map-side combine);
- each bigram's log-probability is a pure per-row double expression
  (Laplace-smoothed ``ln((c12 + 1) / (c1 + V))``);
- the per-document sum folds the log-probs in POSITION ORDER via a
  ``sort_array`` + ``aggregate`` over the collected list, so both engines
  add the same doubles in the same sequence.

Plan at 100 TB: tokenize + bigram build are JVM ``transform(sequence)``
expressions (no Python); the model is two aggregated tables shuffled on
the gram key (skew = stopword bigrams — partial agg absorbs them); the
scoring join is bigram->model equi-join; the final per-doc fold is one
shuffle on doc_id.  The model tables are reusable artifacts — train once,
score every new shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def train_bigram_model(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> tuple[DataFrame, DataFrame, int]:
    """Corpus statistics for the bigram LM: returns
    ``(bigram_counts(w1, w2, c12), unigram_counts(w1, c1), vocab_size)``.

    Token = lowercased whitespace word; counts are corpus-wide.  The two
    tables are decomposable aggregations (map-side combine), safe for any
    skew; ``vocab_size`` is the Laplace denominator's V.
    """
    w = _tokens(text_col)
    toks = (docs.select(w.alias("w"))
            .filter(F.size("w") >= 1)
            .select(F.explode("w").alias("w1"))
            .filter(F.col("w1") != ""))
    unigrams = toks.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    grams = F.expr("transform(sequence(0, size(w) - 2), "
                   "i -> struct(w[i] as w1, w[i+1] as w2))")
    bigrams = (docs.select(w.alias("w"))
               .filter(F.size("w") >= 2)
               .select(F.explode(grams).alias("g"))
               .select(F.col("g.w1"), F.col("g.w2"))
               .groupBy("w1", "w2")
               .agg(F.count("*").cast("long").alias("c12")))
    vocab_size = unigrams.count()
    return bigrams, unigrams, vocab_size


def lm_doc_scores(docs: DataFrame, bigrams: DataFrame, unigrams: DataFrame,
                  vocab_size: int, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document mean bigram log-probability (higher = more like the
    corpus; the quality filter drops the low tail and, for dedup-ish
    boilerplate, sometimes the high tail).

    Output: (id_col, n_bigrams, avg_logp) for documents with >= 2 tokens.
    ``avg_logp`` is rounded to 6 digits after a position-ordered fold —
    bit-comparable across engines."""
    w = _tokens(text_col)
    grams = F.expr("transform(sequence(0, size(w) - 2), "
                   "i -> struct(i as pos, w[i] as w1, w[i+1] as w2))")
    g = (docs.select(F.col(id_col), w.alias("w"))
         .filter(F.size("w") >= 2)
         .select(id_col, F.explode(grams).alias("g"))
         .select(id_col, F.col("g.pos").alias("pos"),
                 F.col("g.w1"), F.col("g.w2")))
    scored = (g.join(bigrams, ["w1", "w2"], "left")
              .join(unigrams, ["w1"], "left")
              .select(
                  id_col, "pos",
                  F.log((F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                        / (F.coalesce(F.col("c1"), F.lit(0))
                           + F.lit(float(vocab_size)))).alias("logp")))
    folded = (scored.groupBy(id_col)
              .agg(F.sort_array(F.collect_list(F.struct("pos", "logp")))
                   .alias("seq")))
    total = F.aggregate(F.col("seq"), F.lit(0.0),
                        lambda acc, s: acc + s["logp"])
    return folded.select(
        F.col(id_col),
        F.size("seq").cast("long").alias("n_bigrams"),
        F.round(total / F.size("seq"), 6).alias("avg_logp"))
