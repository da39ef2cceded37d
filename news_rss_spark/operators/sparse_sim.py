"""Sparse TF-IDF all-pairs cosine similarity over an inverted index
(engine-new; the lexical counterpart of the dense-embedding near-dup
family in operators/similarity.py, scaling the reference's per-row
LIKE-substring comparisons, src/cache/local/mod.rs P10, to corpus-wide
pairwise similarity).

This is the Bayardo et al. (WWW'07) all-pairs shape: score documents by
joining their POSTINGS on term — only document pairs that share at least
one indexable term ever meet, so the n^2 pair space is never enumerated.

Plan shape, chosen for 100 TB:

- two hash aggregations build (doc, term, tf) and the term dictionary
  (term, df) — both map-side-combining;
- **df-pruning is the scale knob**: a term with document frequency df
  fans out df*(df-1)/2 partial products in the term self-join, so hot
  (stopword-like) terms are pruned with ``max_df`` and never reach the
  join; ``min_df=2`` drops the (typically dominant) mass of singleton
  terms that cannot pair at all.  The result is exact cosine over the
  PRUNED term space — the standard all-pairs contract (the oracle replays
  the identical pruning, so parity is exact, and the pytest asserts the
  pruned score's relation to the full score on a known corpus);
- the candidate volume is *measurable before the join*: the same census/
  budget guard as every other blocking route (text_dedup.band_census over
  term groups) — pass ``max_candidate_pairs`` to fail fast instead of
  detonating a shuffle at a new scale;
- corpus N rides in-plan as a broadcast one-row aggregate with a computed
  equi-join key (the _n_docs_agg / FoldablePropagation rule, see
  operators/search.py) — no driver collect at DataFrame-construction;
- determinism contract (same as search.py/lm_score.py): every float
  reduction folds in TERM ORDER via sort_array + aggregate, per-doc norms
  and normalized weights round to 9 digits, the final cosine to 6 — the
  doubles then hash-match DuckDB bit-for-bit.

At cluster scale the postings relation would be written bucketed by term
so repeated all-pairs runs (and ad-hoc term lookups) skip the build
shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_dedup import _enforce_candidate_budget


def _terms(text_col: str):
    return F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                    lambda t: t != "")


def term_counts(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """``(id, term, tf)`` — one explode + one map-side-combining agg."""
    docs = df.filter(F.col(text_col).isNotNull())
    return (docs.select(F.col(id_col), F.explode(_terms(text_col)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count("*").cast("long").alias("tf")))


def pruned_dictionary(tf: DataFrame, df_rel: DataFrame, min_df: int,
                      max_df: int, text_col: str, id_col: str) -> DataFrame:
    """``(term, df, n)`` for terms surviving df-pruning.  ``df < n`` also
    drops corpus-universal terms whose idf would be exactly 0 (they add
    nothing to any dot product but would still fan out the join — and a
    0-weight vector would make the norm division ill-defined)."""
    stats = (df_rel.filter(F.col(text_col).isNotNull())
             .agg(F.count("*").alias("n"))
             .select((F.col("n") >= 0).cast("int").alias("_k"), "n"))
    return (tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
            .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
            .withColumn("_k", (F.col("df") >= 0).cast("int"))
            .join(F.broadcast(stats), "_k")
            .filter(F.col("df") < F.col("n"))
            .select("term", "df", "n"))


def tfidf_postings(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   max_df: int = 1000) -> DataFrame:
    """L2-normalized TF-IDF postings ``(term, id, wn)``.

    w = tf * ln(N / df); norm folds w^2 in term order (9-digit round),
    wn = round(w / norm, 9).  The pruned dictionary is broadcast — after
    df-pruning it is vocabulary-sized (and at real scale the idf side
    would be a bucketed reusable artifact, not a per-query broadcast).
    """
    tf = term_counts(df, text_col, id_col)
    kept = pruned_dictionary(tf, df, min_df, max_df, text_col, id_col)
    w = (tf.join(F.broadcast(kept), "term")
         .select(F.col(id_col), "term",
                 (F.col("tf").cast("double")
                  * F.log(F.col("n").cast("double")
                          / F.col("df").cast("double"))).alias("w")))
    vec = (w.groupBy(id_col)
           .agg(F.sort_array(F.collect_list(F.struct("term", "w")))
                .alias("vec")))
    norm = F.round(
        F.sqrt(F.aggregate("vec", F.lit(0.0),
                           lambda acc, s: acc + s["w"] * s["w"])), 9)
    return (vec.select(F.col(id_col), "vec", norm.alias("norm"))
            .filter(F.col("norm") > 0)
            .select(F.col(id_col), F.explode("vec").alias("s"), "norm")
            .select(F.col(id_col), F.col("s").getField("term").alias("term"),
                    F.round(F.col("s").getField("w") / F.col("norm"), 9)
                    .alias("wn")))


def all_pairs_cosine(df: DataFrame, threshold: float = 0.5,
                     min_df: int = 2, max_df: int = 1000,
                     text_col: str = "text", id_col: str = "doc_id",
                     max_candidate_pairs: int | None = None) -> DataFrame:
    """All document pairs with TF-IDF cosine >= ``threshold`` over the
    df-pruned term space: ``(a, b, cosine, n_terms)``.

    One equi-join on term produces the partial products; the pair fold
    sums them in term order and rounds to 6 digits, and the threshold is
    applied to the ROUNDED value so the cut is boundary-stable across
    engines.  ``n_terms`` = number of shared surviving terms.
    """
    p = tfidf_postings(df, text_col, id_col, min_df, max_df)
    if max_candidate_pairs is not None:
        _enforce_candidate_budget(p.withColumn("band", F.lit(0)),
                                  max_candidate_pairs, "band", "term")
    a = p.select(F.col(id_col).alias("a"), "term", F.col("wn").alias("wa"))
    b = p.select(F.col(id_col).alias("b"), "term", F.col("wn").alias("wb"))
    prods = (a.join(b, "term")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", "term",
                     (F.col("wa") * F.col("wb")).alias("c")))
    folded = (prods.groupBy("a", "b")
              .agg(F.sort_array(F.collect_list(F.struct("term", "c")))
                   .alias("seq")))
    cosine = F.round(
        F.aggregate("seq", F.lit(0.0), lambda acc, s: acc + s["c"]), 6)
    return (folded.select("a", "b", cosine.alias("cosine"),
                          F.size("seq").cast("long").alias("n_terms"))
            .filter(F.col("cosine") >= F.lit(threshold)))
