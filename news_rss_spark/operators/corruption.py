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

__all__ = ["corruption_spans", "fim_splits"]


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


def fim_splits(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", salt: str = "fim-v1") -> DataFrame:
    """Fill-in-the-middle split construction (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    ``(doc_id, n_tokens, cut1, cut2, mode, len_prefix, len_middle,
    len_suffix)`` — the two token cut points and PSM/SPM document
    order, drawn reproducibly per document.

    Cuts: two independent md5 draws modulo ``n + 1`` (each in [0, n]),
    sorted; prefix = tokens [1, cut1], middle = (cut1, cut2], suffix =
    (cut2, n] — any segment may be empty (the paper keeps empty
    segments rather than re-drawing; same drop-don't-redraw reasoning
    as the span masks above).  ``mode`` is 'psm' or 'spm' by a third
    draw's parity — the 50/50 order mix the paper trains with.

    ONE projection, zero shuffle, no explode: the whole construction is
    a fixed per-row expression tree over the token count.
    """
    t = F.col(text_col)
    n = F.size(F.split(F.trim(t), r"\s+"))

    def draw(tag: str):
        return F.expr(
            f"cast(conv(substring(md5(concat('{salt}:{tag}:', "
            f"cast({id_col} as string))), 1, 15), 16, 10) as bigint)")

    base = (df.filter(F.length(F.trim(t)) > 0)
            .withColumn("_n", n.cast("long"))
            .withColumn("_d1", draw("c1") % (F.col("_n") + 1))
            .withColumn("_d2", draw("c2") % (F.col("_n") + 1)))
    c1 = F.least("_d1", "_d2")
    c2 = F.greatest("_d1", "_d2")
    mode = F.when(draw("m") % 2 == 0, F.lit("psm")).otherwise(F.lit("spm"))
    return base.select(
        id_col, F.col("_n").alias("n_tokens"),
        c1.cast("int").alias("cut1"), c2.cast("int").alias("cut2"),
        mode.alias("mode"),
        c1.cast("int").alias("len_prefix"),
        (c2 - c1).cast("int").alias("len_middle"),
        (F.col("_n") - c2).cast("int").alias("len_suffix"))
