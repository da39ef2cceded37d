"""Filter-evaluation metrology: precision/recall curves and exact
ROC-AUC for corpus-scale quality classifiers.

Every gate in a training-data pipeline (quality score, LM perplexity,
blocklist verdict, classifier log-odds) needs a THRESHOLD, and choosing
one needs the precision/recall tradeoff measured over the corpus — at
100 TB that measurement is itself a big-data job.  These operators keep
the corpus-sized work to ONE map-side-combined hash aggregation
(groupBy the score quantized to ``decimals``), producing a bounded
"grid" relation (at most ``10^decimals * score_range`` rows — thousands,
independent of corpus size).  The curve assembly then runs global
windows over THAT grid: the ``Exchange SinglePartition`` in the plan is
over the grid, never the corpus, which is exactly the
shard-packing/percentile precedent in this engine — documented here so
the plan-audit greps don't misread it.

ROC-AUC avoids float accumulation entirely: AUC is the Mann-Whitney
U-statistic, ``U / (npos * nneg)``, and with ties handled by MIDRANKS
over the quantized grid every intermediate stays an exact int64 —
``2 * (sum of positive ranks)`` is ``sum over grid rows of
p * (2 * start + n + 1)`` where ``start`` is the exclusive cumulative
count in ascending score order.  One final double division, rounded to
6 decimals; bit-identical across engines by construction (integer sums
are order-independent, unlike a trapezoid sum of floats).

Engine-new (the reference has no evaluation surface); grouped with the
training-data operator family of SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["score_grid", "pr_curve", "roc_auc"]


def score_grid(df: DataFrame, score_col: str, label_col: str,
               decimals: int = 3) -> DataFrame:
    """``(threshold, n, p)`` — corpus rows bucketed by the score rounded
    to ``decimals``; ``n`` = rows at that score, ``p`` = positives.
    The ONLY corpus-sized stage of both metrics (one hash aggregation);
    everything downstream operates on this bounded grid."""
    return (df.groupBy(F.round(F.col(score_col), decimals)
                       .alias("threshold"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col(label_col).cast("long")).alias("p")))


def pr_curve(df: DataFrame, score_col: str, label_col: str,
             decimals: int = 3) -> DataFrame:
    """One row per distinct quantized score: the confusion counts and
    precision/recall/F1 of the filter "keep rows with score >=
    threshold".  Counts are exact int64; the three ratios are single
    divisions rounded to 6 decimals.
    """
    g = score_grid(df, score_col, label_col, decimals)
    # windows over the bounded grid (see module docstring)
    w_desc = (Window.orderBy(F.desc("threshold"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy()
    cum = (g.withColumn("tp", F.sum("p").over(w_desc))
           .withColumn("kept", F.sum("n").over(w_desc))
           .withColumn("npos", F.sum("p").over(w_all))
           .withColumn("nneg", (F.sum("n").over(w_all) -
                                F.col("npos"))))
    fp = F.col("kept") - F.col("tp")
    fn = F.col("npos") - F.col("tp")
    return cum.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(F.col("tp") / F.col("kept"), 6).alias("precision"),
        F.round(F.col("tp") / F.col("npos"), 6).alias("recall"),
        F.round(2.0 * F.col("tp") /
                (2 * F.col("tp") + fp + fn), 6).alias("f1"))


def roc_auc(df: DataFrame, score_col: str, label_col: str,
            decimals: int = 3) -> DataFrame:
    """One row ``(npos, nneg, auc)``: the exact tie-corrected ROC-AUC
    (midrank Mann-Whitney) of ``score_col`` as a ranker for
    ``label_col``.  ``auc`` is NULL when either class is empty.
    """
    g = score_grid(df, score_col, label_col, decimals)
    w_asc = (Window.orderBy(F.asc("threshold"))
             .rowsBetween(Window.unboundedPreceding, -1))
    started = g.withColumn(
        "start", F.coalesce(F.sum("n").over(w_asc), F.lit(0)))
    # 2 * sum of positive midranks, exact: each grid row's positives sit
    # at midrank start + (n + 1)/2, so 2 * p * midrank is integral
    tot = started.agg(
        F.sum(F.col("p") * (2 * F.col("start") + F.col("n") + 1))
        .alias("twice_rank_sum"),
        F.sum("p").alias("npos"),
        F.sum("n").alias("total"))
    npos, nneg = F.col("npos"), F.col("total") - F.col("npos")
    twice_u = F.col("twice_rank_sum") - npos * (npos + 1)
    return tot.select(
        npos.cast("long").alias("npos"),
        nneg.cast("long").alias("nneg"),
        F.when((npos > 0) & (nneg > 0),
               F.round(twice_u / (2.0 * npos * nneg), 6)).alias("auc"))
