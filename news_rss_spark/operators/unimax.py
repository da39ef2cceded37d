"""UniMax language-budget allocation (Chung et al., ICLR 2023 "UniMax:
Fairer and More Effective Language Sampling for Large-Scale Multilingual
Pretraining").

Temperature sampling (this engine's ``temperature_sample``) picks a
language DISTRIBUTION and lets epoch counts fall where they may — head
languages stay underweighted or tail languages silently repeat dozens
of times.  UniMax instead allocates an explicit TOKEN BUDGET per
language: visit languages in ascending corpus size, give each the
uniform share of the remaining budget, capped at ``max_epochs`` passes
over its corpus; whatever a capped tail language cannot absorb rolls
forward into the uniform share of the larger languages after it.  The
result is as-uniform-as-possible sampling with a hard repetition bound.

Determinism contract: the allocator runs in EXACT integer arithmetic —
token counts are int64, the uniform share is floor division, the cap is
``max_epochs * corpus_tokens`` — so Spark (driver-side loop over the
per-language totals) and the DuckDB oracle (recursive CTE carrying the
remaining budget) replay it bit-identically.  Doc-level selection uses
the engine's content-stable md5 draw (the uniform_sample_k contract):
per language, keep the greedy prefix of draw-ordered docs whose
RUNNING token total stays within the allocation — never over budget,
same rows on every run, engine, and partitioning.

Scale shape (100 TB): per-language totals are ONE map-side-combined
hash aggregation; the allocator itself touches only that tiny relation
(#languages rows — collected driver-side like kmeans centroids, an
O(langs) collect, never corpus rows).  Allocations rejoin as a
broadcast dim; the greedy prefix is a per-language window (partitioned
by language — hot languages are single partitions, which is exactly the
skew the ascending-size cap already bounds: a language can contribute
at most ``budget // langs_remaining`` tokens ~ B/k).

Engine-new (the reference has no sampling surface); grouped with the
mixing/sampling family (epoch_mix, temperature_sample, dsir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["unimax_allocations", "unimax_select"]


def unimax_allocations(df: DataFrame, budget: int, max_epochs: int = 4,
                       lang_col: str = "lang",
                       tokens_col: str = "tok") -> DataFrame:
    """``(lang, corpus_tokens, cap, alloc)`` — one row per language.

    ``alloc = min(max_epochs * corpus_tokens, remaining // remaining_k)``
    visiting languages in ascending ``(corpus_tokens, lang)`` order;
    ``remaining`` starts at ``budget`` and shrinks by each allocation.
    Exact int64 end-to-end.
    """
    if budget < 0 or max_epochs < 1:
        raise ValueError(f"budget must be >= 0 and max_epochs >= 1, "
                         f"got {budget}/{max_epochs}")
    spark = df.sparkSession
    totals = sorted(
        ((r["c"], r[lang_col]) for r in
         df.groupBy(lang_col).agg(F.sum(tokens_col).alias("c")).collect()))
    rows, remaining = [], budget
    for i, (c, lang) in enumerate(totals):
        share = remaining // (len(totals) - i)
        alloc = min(max_epochs * c, share)
        rows.append((lang, c, max_epochs * c, alloc))
        remaining -= alloc
    schema = (f"{lang_col} string, corpus_tokens long, "
              f"cap long, alloc long")
    return spark.createDataFrame(rows or [], schema)


def unimax_select(df: DataFrame, budget: int, max_epochs: int = 4,
                  lang_col: str = "lang", tokens_col: str = "tok",
                  id_col: str = "doc_id",
                  salt: str = "unimax-v1") -> DataFrame:
    """``(lang, doc_id, tok, alloc)`` — the docs each language
    contributes to the budgeted mix: the greedy prefix of
    md5-draw-ordered docs whose running token sum stays <= the
    language's UniMax allocation.  (Epochs beyond the first are a
    repeat of the SAME selection — the repetition knob is ``alloc /
    corpus_tokens``, not a different subset per epoch.)
    """
    alloc = unimax_allocations(df, budget, max_epochs, lang_col,
                               tokens_col)
    draw = F.md5(F.concat(F.lit(salt + ":"),
                          F.col(id_col).cast("string")))
    w = (Window.partitionBy(lang_col)
         .orderBy(draw.asc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.join(F.broadcast(alloc.select(lang_col, "alloc")),
                    lang_col)
            .withColumn("_cum", F.sum(tokens_col).over(w))
            .filter(F.col("_cum") <= F.col("alloc"))
            .select(lang_col, id_col,
                    F.col(tokens_col).cast("long").alias("tok"),
                    "alloc"))
