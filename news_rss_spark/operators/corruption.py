"""Span-corruption mask construction (the T5/UL2 denoising objective,
Raffel et al. JMLR 2020 §3.1.4) as a corpus-scale, exactly-replayable
operator.

A span-corruption pretraining pipeline needs, for every document, the
set of token spans to mask — chosen "randomly" but REPRODUCIBLY, so a
re-run (or a resumed shard) regenerates byte-identical training
targets.  ``rand(seed)`` is partitioning-dependent in Spark; this
operator draws from the engine's content-stable md5 family instead:

- candidate starts: token positions ``p`` (1-based) whose 60-bit draw
  ``md5(salt:doc:p)`` is ``0 (mod den)`` — a ``1/den`` start rate;
- each candidate opens a ``span_len``-token mask, clipped at the
  document end;
- overlapping or ADJACENT spans merge into maximal islands (T5's
  "spans" are non-adjacent by construction; merging, rather than
  re-drawing, keeps the rule a pure per-position predicate — the same
  drop-don't-redraw reasoning as contrastive.negative_samples).

Expected corruption rate = ``span_len / den`` minus the merge overlap
(exactly measurable from the output; the defaults 3/20 target T5's
~15%).

Scale shape (100 TB): candidate starts are filtered INSIDE a
higher-order function over ``sequence(1, n)`` — the corpus explodes
only the ~1/den surviving positions, not every token.  Island merge is
one per-document window (running max of span ends in start order, a
gaps-and-islands cumsum) — partitioned by doc_id, no global state.
Everything downstream of md5 is integer arithmetic.

Engine-new (the reference has no pretraining-objective surface);
grouped with the packing/context-window family (concat_chunk,
interleaved, sliding_passages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["corruption_spans"]


def corruption_spans(df: DataFrame, span_len: int = 3, den: int = 20,
                     text_col: str = "text", id_col: str = "doc_id",
                     salt: str = "t5-v1") -> DataFrame:
    """``(doc_id, span_idx, span_start, span_end, n_masked)`` — one row
    per merged mask island, 1-based inclusive token offsets, islands
    numbered in document order.  Documents with no candidate draw emit
    nothing (they pass through uncorrupted)."""
    if span_len < 1 or den < 2:
        raise ValueError(f"span_len must be >= 1 and den >= 2, "
                         f"got {span_len}/{den}")
    t = F.col(text_col)
    n = F.size(F.split(F.trim(t), r"\s+"))
    draw = (f"cast(conv(substring(md5(concat('{salt}:', "
            f"cast({id_col} as string), ':', cast(p as string))), "
            f"1, 15), 16, 10) as bigint)")
    starts = F.expr(
        f"filter(sequence(1, _n_toks), p -> {draw} % {den} = 0)")
    cand = (df.filter(F.length(F.trim(t)) > 0)
            .withColumn("_n_toks", n)
            .select(F.col(id_col), F.col("_n_toks"),
                    F.explode(starts).alias("p"))
            .select(id_col,
                    F.col("p").alias("s"),
                    F.least(F.col("p") + span_len - 1,
                            F.col("_n_toks")).alias("e")))
    # gaps-and-islands: a candidate opens a NEW island iff it starts
    # past (running max of previous ends) + 1; cumsum of the flags
    # numbers the islands
    w_prev = (Window.partitionBy(id_col).orderBy("s")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(id_col).orderBy("s")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged = (cand
               .withColumn("_prev_end", F.max("e").over(w_prev))
               .withColumn("_new", F.when(
                   F.col("_prev_end").isNull() |
                   (F.col("s") > F.col("_prev_end") + 1), 1)
                   .otherwise(0))
               .withColumn("_island", F.sum("_new").over(w_run)))
    return (flagged.groupBy(id_col, "_island")
            .agg(F.min("s").alias("span_start"),
                 F.max("e").alias("span_end"))
            .select(id_col,
                    F.col("_island").cast("int").alias("span_idx"),
                    F.col("span_start").cast("int").alias("span_start"),
                    F.col("span_end").cast("int").alias("span_end"),
                    (F.col("span_end") - F.col("span_start") + 1)
                    .cast("int").alias("n_masked")))
