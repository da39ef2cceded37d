"""Sliding passage windows: per-document overlapping token chunks.

The retrieval-corpus counterpart of ``concat_and_chunk``: LM pretraining
packs documents onto one global token axis (documents straddle windows),
but a RAG/embedding index wants PER-DOCUMENT passages of ``size`` tokens
advancing by ``stride`` < size, so every token appears in ~size/stride
passages and no passage crosses a document boundary.  The overlap is
what keeps answers that straddle a cut retrievable — the standard
chunking recipe of retrieval pipelines.

Pure JVM: one ``transform(sequence(...))`` generator projection +
explode — per-document, so NO global axis, NO prefix sum, NO shuffle at
all; linear in corpus tokens times the overlap factor.  The window rule
is the canonical tail-covering one: starts at 0, stride, 2*stride, ...
while start + size < n_tokens, plus the final tail window clamped to
``max(n - size, 0)`` — every token covered, no degenerate sub-stride
tail duplicates, short docs yield exactly one whole-doc passage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sliding_passages"]


def sliding_passages(df: DataFrame, size: int, stride: int,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, passage_idx, tok_start, n_toks, passage): overlapping
    whitespace-token windows per document.  ``tok_start`` is the 0-based
    token offset, ``passage`` the re-joined token slice.  Documents with
    no tokens emit nothing; documents with <= size tokens emit exactly
    one whole-document passage."""
    if size < 1 or stride < 1:
        raise ValueError(
            f"sliding_passages: size/stride must be >= 1, got "
            f"size={size} stride={stride}")
    if stride > size:
        raise ValueError(
            f"sliding_passages: stride {stride} > size {size} would "
            f"drop tokens between windows")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # number of full-stride starts strictly before the tail start, plus
    # the tail: n_wins = max(ceil((n - size) / stride), 0) + 1
    wins = F.expr(
        f"transform(sequence(0, greatest(cast(ceil((size(w) - {size}) "
        f"/ cast({stride} as double)) as int), 0)), "
        f"i -> least(i * {stride}, greatest(size(w) - {size}, 0)))")
    return (df.select(F.col(id_col), toks.alias("w"))
            .filter((F.size("w") >= 1) & (F.element_at("w", 1) != ""))
            .select(id_col, "w",
                    F.posexplode(F.array_distinct(wins))
                    .alias("passage_idx", "tok_start"))
            .select(id_col,
                    F.col("passage_idx").cast("long"),
                    F.col("tok_start").cast("long"),
                    F.least(F.lit(size),
                            F.size("w") - F.col("tok_start"))
                    .cast("long").alias("n_toks"),
                    F.array_join(
                        F.slice("w", F.col("tok_start") + 1, F.lit(size)),
                        " ").alias("passage")))
