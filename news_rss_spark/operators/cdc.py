"""Content-defined chunking (Manber anchors, USENIX 1994 — "Finding
Similar Files in a Large File System").

``chunk_dedup`` (fixed-size chunks) breaks under INSERTION: one added
byte shifts every downstream chunk boundary, so two near-identical
documents share no chunk hashes past the edit.  Content-defined
chunking fixes that by cutting wherever a fingerprint of the LOCAL
w-gram satisfies a divisor predicate — boundaries depend only on
nearby content, so an edit perturbs at most the chunks it touches and
everything after re-synchronizes.  This is the storage-dedup primitive
(LBFS/rsync/backup systems) applied to corpus text: shift-robust
shared-passage detection between document versions.

Anchor rule (the SQL-checkable spec): position ``p`` (1-based,
``p >= 2``) is a boundary iff the 60-bit md5 key of the w-character
gram starting at ``p`` is ``0 (mod divisor)`` — the engine's standard
cross-engine gram-key contract (contamination / span-dedup / winnow all
share it).  Expected chunk length ~= ``divisor`` characters (geometric)
plus the forced document-start chunk.  No minimum/maximum-size clamp:
the clamp would make boundaries a sequential scan state (unexpressible
as a per-position predicate) and it only matters for storage systems,
not passage mining.

Scale shape (100 TB): ONE codegen'd projection builds the anchor list
with higher-order functions (sequence -> filter on the md5 predicate),
a second derives ``(chunk_idx, start, len)`` structs, then explode —
embarrassingly parallel, zero shuffle, no Python.  Downstream dedup is
the standard ``chunk_md5`` hash aggregation.  The md5-per-position cost
is O(doc bytes) hashes of w-byte strings; for a throughput-critical
deployment swap the anchor predicate for a rolling gear hash inside the
extraction kernel — the relation contract (and this operator's tests)
stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks", "cdc_shared_chunks"]


def cdc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", w: int = 16,
               divisor: int = 64) -> DataFrame:
    """``(id, chunk_idx, chunk_start, chunk_len, chunk_md5)`` — one row
    per content-defined chunk, covering the document exactly (starts at
    1, contiguous, ends at ``length(text)``).  Empty documents emit
    nothing; documents shorter than ``w + 1`` are a single chunk.

    ``chunk_idx`` is 1-based document order; ``chunk_start`` is the
    1-based character offset; ``chunk_md5`` is the md5 of the chunk
    text (the dedup join key)."""
    if w < 1 or divisor < 1:
        raise ValueError(f"cdc_chunks: w/divisor must be >= 1, "
                         f"got w={w} divisor={divisor}")
    t, tc = F.col(text_col), text_col
    anchor_key = (f"cast(conv(substring(md5(substring({tc}, p, {w})), "
                  f"1, 15), 16, 10) as bigint)")
    # anchors exist only when len >= w + 1 (guard: sequence(2, 1) would
    # count DOWN); position 1 is always a start, so anchors begin at 2
    anchors = F.when(
        F.length(t) >= w + 1,
        F.expr(f"filter(sequence(2, length({tc}) - {w} + 1), "
               f"p -> {anchor_key} % {divisor} = 0)"),
    ).otherwise(F.expr("array()").cast("array<int>"))
    bounds = F.expr(
        "transform(sequence(1, size(_starts)), i -> struct("
        "  i as chunk_idx,"
        "  element_at(_starts, i) as chunk_start,"
        "  (if(i < size(_starts), element_at(_starts, i + 1),"
        "      length(_text) + 1)) - element_at(_starts, i) as chunk_len))"
    )
    return (
        df.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            t.alias("_text"),
            F.concat(F.array(F.lit(1)), anchors.cast("array<int>"))
             .alias("_starts"),
        )
        .select(F.col(id_col), F.col("_text"),
                F.explode(bounds).alias("b"))
        .select(
            F.col(id_col),
            F.col("b.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("b.chunk_start").cast("int").alias("chunk_start"),
            F.col("b.chunk_len").cast("int").alias("chunk_len"),
            F.md5(F.expr("substring(_text, b.chunk_start, b.chunk_len)"))
             .alias("chunk_md5"),
        )
    )


def cdc_shared_chunks(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", w: int = 16,
                      divisor: int = 64, min_len: int = 8) -> DataFrame:
    """``(chunk_md5, chunk_len, n_docs)`` — content-defined chunks
    (length >= ``min_len``, skipping the noise of tiny inter-anchor
    slivers) appearing in more than one document: the shift-robust
    shared-passage index.  One map-side-combined hash aggregation over
    :func:`cdc_chunks`."""
    ch = cdc_chunks(df, id_col=id_col, text_col=text_col, w=w,
                    divisor=divisor)
    return (
        ch.filter(F.col("chunk_len") >= min_len)
        .groupBy("chunk_md5", "chunk_len")
        .agg(F.countDistinct(id_col).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
