"""Corpus drift detection: smoothed vocabulary KL / Jensen-Shannon
divergence between two corpus slices.

The monitoring primitive every continuously-ingested training corpus
needs: compare this crawl's token distribution against the last
epoch's (or one source against another, or pre- vs post-filter) and
alarm on distribution shift — JS divergence is the standard symmetric,
bounded ([0, ln 2]) drift score; the two KL directions localize WHICH
side carries the novel mass.  Laplace (add-one) smoothing over the
UNION vocabulary keeps every log finite: ``p(t) = (n_a(t) + 1) /
(N_a + V)`` — the textbook unseen-token treatment, and the same
add-one shape the engine's nb_classifier/lm_score already use.

Cross-engine float contract: a divergence is a SUM of float terms over
the vocabulary, and naive float summation is association-order-
dependent — the one thing a shuffled aggregation cannot pin.  So each
per-token term is rounded to 9 decimals and SCALED TO AN EXACT INT64
(``round(term * 1e9)``); the aggregation sums integers (order-free,
engine-free), and one final division restores the scale (the pagerank
9-digit-per-iteration philosophy applied to a single reduction).
``ln``/division parity on identical doubles is already load-bearing
for the driver-green bm25/lm_score/dsir oracles.

Scale shape (100 TB): two map-side-combined token aggregations, one
full-outer equi-join on token (the union vocab), three in-plan scalars
(N_a, N_b, V) via broadcast single-row cross joins (the bm25
corpus-scalar pattern), one integer sum.  Nothing quadratic; the per
-token relation is the only shuffle and it is vocabulary-sized.

Engine-new (the reference has no corpus-monitoring surface); grouped
with the metrology family (pr_curve/roc_auc, dedup_audit,
table_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["vocab_divergence", "zipf_fit"]


def _token_counts(df: DataFrame, text_col: str, out: str) -> DataFrame:
    toks = df.select(F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")) \
        .filter(F.col("token") != "")
    return toks.groupBy("token").agg(F.count("*").alias(out))


def vocab_divergence(df_a: DataFrame, df_b: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """One row: ``(n_vocab, tokens_a, tokens_b, kl_ab, kl_ba, js)``.

    ``kl_ab`` = KL(P_a || P_b) etc., ``js`` = Jensen-Shannon
    divergence, all over add-one-smoothed union-vocab distributions
    and all computed via the exact scaled-int64 sum contract (each
    term ``round(x * 1e9)``; totals are exact; final values rounded to
    6 decimals).
    """
    ca = _token_counts(df_a.filter(F.col(text_col).isNotNull()),
                       text_col, "na")
    cb = _token_counts(df_b.filter(F.col(text_col).isNotNull()),
                       text_col, "nb")
    joined = (ca.join(cb, "token", "full_outer")
              .select("token",
                      F.coalesce("na", F.lit(0)).alias("na"),
                      F.coalesce("nb", F.lit(0)).alias("nb")))
    scalars = joined.agg(
        F.count("*").alias("v"),
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"))
    terms = joined.crossJoin(F.broadcast(scalars))
    p = (F.col("na") + 1) / (F.col("ta") + F.col("v"))
    q = (F.col("nb") + 1) / (F.col("tb") + F.col("v"))
    m = (p + q) / 2
    s = lambda x: F.round(x * 1e9, 0).cast("long")  # noqa: E731
    agg = terms.agg(
        F.max("v").alias("n_vocab"),
        F.max("ta").alias("tokens_a"),
        F.max("tb").alias("tokens_b"),
        F.sum(s(p * F.log(p / q))).alias("_kl_ab"),
        F.sum(s(q * F.log(q / p))).alias("_kl_ba"),
        F.sum(s(p * F.log(p / m) / 2 + q * F.log(q / m) / 2))
        .alias("_js"))
    return agg.select(
        F.col("n_vocab").cast("long"),
        F.col("tokens_a").cast("long"),
        F.col("tokens_b").cast("long"),
        F.round(F.col("_kl_ab") / 1e9, 6).alias("kl_ab"),
        F.round(F.col("_kl_ba") / 1e9, 6).alias("kl_ba"),
        F.round(F.col("_js") / 1e9, 6).alias("js"))


def zipf_fit(df: DataFrame, text_col: str = "text",
             top_k: int = 1000) -> DataFrame:
    """Zipf rank-frequency fit over the vocabulary head: one row
    ``(n_terms, slope, intercept, r2)`` from an OLS fit of
    ``log10(freq) ~ log10(rank)`` on the ``top_k`` most frequent tokens.

    The Zipf slope (~-1 for natural language) is a cheap whole-corpus
    health signal: a flattened head means template/boilerplate flooding,
    a cliff means vocabulary collapse (e.g. one source swamping the
    crawl) — the metrology companion to :func:`vocab_divergence`, as a
    single trendable number per corpus slice.

    Scale shape: ONE map-side-combined token aggregation (the same
    vocabulary-sized shuffle as vocab_divergence), then
    ``TakeOrderedAndProject`` bounds the global order to ``top_k`` rows
    — the rank window runs on a relation that is O(top_k) BY
    CONSTRUCTION (the rrf_fusion argument), never corpus-sized.  Fitting
    the head is also statistically right: the Zipf tail is where the law
    breaks down and ranks churn with corpus noise.

    Determinism: total tie order (freq desc, token asc) pins both the
    top-k cut and every rank; the OLS sums are doubles over <= top_k
    head terms (magnitudes <= ~log10 corpus size), far inside the
    6-decimal compare tolerance; outputs rounded to 9.
    """
    freq = _token_counts(df, text_col, "cnt")
    head = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    from pyspark.sql.window import Window
    ranked = head.select(
        F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("token"))).alias("rank"),
        "cnt")
    xy = ranked.select(F.log10("rank").alias("x"), F.log10("cnt").alias("y"))
    s = xy.agg(F.count("*").alias("n"), F.sum("x").alias("sx"),
               F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("x"))
               .alias("sxx"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("y") * F.col("y")).alias("syy"))
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(cov / varx, 9).alias("slope"),
        F.round((F.col("sy") - (cov / varx) * F.col("sx")) / n, 9)
         .alias("intercept"),
        F.round((cov * cov) / (varx * vary), 9).alias("r2"))
