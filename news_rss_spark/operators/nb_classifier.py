"""Trainable multinomial Naive Bayes text classifier (engine-new,
training-data pipeline): the counting-based baseline for the
fastText-style corpus quality / language filters production pipelines
train on their own data (CCNet trains a classifier to keep
Wikipedia-like text; here the same machinery trains on any boolean
label column and scores every document).

Naive Bayes is the one classical classifier whose TRAINING is exactly
expressible as DataFrame aggregations — the model IS two count tables —
so unlike gradient methods the whole train+score path is deterministic,
oracle-checkable, and embarrassingly distributable:

- token/class counts and class priors are decomposable hash
  aggregations (map-side combine absorbs stopword skew);
- each token's log-odds contribution is a pure per-row double
  expression (Laplace-smoothed);
- the per-document sum folds contributions in POSITION ORDER via
  ``sort_array`` + ``aggregate`` (the same cross-engine float-parity
  contract as :mod:`lm_score`).

Plan at 100 TB: tokenize is a JVM ``split``/``posexplode`` (no Python);
the model is ONE aggregated table shuffled on the token key plus an
O(1)-row scalar collect (class totals + vocab size — the same
legitimate driver-side scalar pattern as k-means' centroids and
PageRank's dangling mass); scoring is a token->model equi-join (the
model table broadcasts when it fits, as vocabularies do) and one
per-doc fold shuffle.  Train once, score every new shard.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


@dataclass(frozen=True)
class NBModel:
    """token_stats: (token, c_pos, c_neg) corpus-wide occurrence counts
    per class; the scalars are the Laplace denominators and the doc
    prior."""
    token_stats: DataFrame
    n_pos_tokens: int
    n_neg_tokens: int
    vocab_size: int
    n_pos_docs: int
    n_neg_docs: int


def nb_train(docs: DataFrame, label_col: str,
             text_col: str = "text") -> NBModel:
    """Fit multinomial NB from a boolean ``label_col``: one hash agg for
    the per-token class counts, one O(1)-row agg for the totals."""
    y = F.col(label_col).cast("boolean")
    toks = (docs.select(y.alias("y"), _tokens(text_col).alias("w"))
            .filter(F.size("w") >= 1)
            .select("y", F.explode("w").alias("token"))
            .filter(F.col("token") != ""))
    stats = (toks.groupBy("token")
             .agg(F.sum(F.when(F.col("y"), 1).otherwise(0))
                  .cast("long").alias("c_pos"),
                  F.sum(F.when(~F.col("y"), 1).otherwise(0))
                  .cast("long").alias("c_neg")))
    tot = stats.agg(F.sum("c_pos").alias("np"), F.sum("c_neg").alias("nn"),
                    F.count("*").alias("v")).collect()[0]
    pri = (docs.agg(F.sum(F.when(y, 1).otherwise(0)).alias("dp"),
                    F.sum(F.when(~y, 1).otherwise(0)).alias("dn"))
           .collect()[0])
    return NBModel(stats, int(tot["np"] or 0), int(tot["nn"] or 0),
                   int(tot["v"]), int(pri["dp"] or 0), int(pri["dn"] or 0))


def nb_score(docs: DataFrame, model: NBModel, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document NB log-odds (positive = the positive class is more
    likely): doc-prior log-odds + a position-ordered fold of per-token
    Laplace-smoothed log-odds.  Tokens unseen in training still
    contribute (the smoothed denominators differ per class).

    Output: (id_col, n_tokens, log_odds rounded to 6, predicted) for
    documents with >= 1 token."""
    dp = float(model.n_pos_tokens + model.vocab_size)
    dn = float(model.n_neg_tokens + model.vocab_size)
    prior = (F.log(F.lit(float(model.n_pos_docs + 1)))
             - F.log(F.lit(float(model.n_neg_docs + 1))))
    tok = (docs.select(F.col(id_col), _tokens(text_col).alias("w"))
           .filter(F.size("w") >= 1)
           .select(id_col, F.posexplode("w").alias("pos", "token"))
           .filter(F.col("token") != ""))
    contrib = (tok.join(model.token_stats, on="token", how="left")
               .select(
                   id_col, "pos",
                   (F.log((F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(1.0))
                          / F.lit(dp))
                    - F.log((F.coalesce(F.col("c_neg"), F.lit(0))
                             + F.lit(1.0)) / F.lit(dn))).alias("lo")))
    folded = (contrib.groupBy(id_col)
              .agg(F.sort_array(F.collect_list(F.struct("pos", "lo")))
                   .alias("seq")))
    total = F.aggregate(F.col("seq"), F.lit(0.0),
                        lambda acc, s: acc + s["lo"])
    log_odds = F.round(total + prior, 6)
    return folded.select(
        F.col(id_col),
        F.size("seq").cast("long").alias("n_tokens"),
        log_odds.alias("log_odds"),
        (log_odds > 0).alias("predicted"))
