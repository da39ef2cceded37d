"""Rule-based sentence segmentation with EXACT character offsets — the
precursor every sentence-level pipeline stage needs (sentence dedup,
quote detection, citation alignment, sentence-boundary-respecting
chunking) and the piece the passage family lacked: sliding_passages
windows tokens, this recovers linguistically meaningful spans WITH
their byte positions so downstream stages can cut the original text,
not a re-join of tokens.

Boundary contract (deterministic, oracle-replayable — the fixed-rule
stand-in for a learned segmenter, Punkt-style guards included):
position i (1-based) ends a sentence iff

    char(i) in {. ! ?}
    AND char(i+1) == ' '                       (single ASCII space)
    AND char(i+2) in [A-Z0-9]                  (a new sentence opener)
    AND the <=10 chars before i do NOT end in a pinned abbreviation
        (mr mrs ms dr prof sr jr st vs etc fig no e.g i.e —
         matched case-insensitively with a non-letter or start guard)

Segments run [start, boundary] inclusive of the terminator; the next
segment starts at boundary+2 (after the space).  Whitespace-only
segments are dropped AFTER numbering, so ``sent_id`` is stable under
filtering and offsets always index the ORIGINAL string (0-based
``start_off``; ``substr(text, start_off+1, length(sent))`` round-trips
byte-for-byte — pytest-locked).

Scale shape: one projection, zero shuffle, zero Python.  The per-char
scan is a ``filter`` over ``sequence(1, n)`` of O(1) substring probes —
the same per-position expression pattern as the CDC anchor spec
(operators/cdc.py), but with cheap character tests instead of md5, so
it runs at full codegen speed.  The abbreviation guard inspects a
BOUNDED 10-char window (never the prefix), keeping the scan O(n).

Newlines are NOT boundaries (feed/article text is pre-flattened by the
extraction kernel; a hard-break segmenter would double-cut).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_sentences", "ABBREV_GUARD_RE"]

ABBREV_GUARD_RE = (
    r"(^|[^a-z])(mr|mrs|ms|dr|prof|sr|jr|st|vs|etc|fig|no|e\.g|i\.e)$")


def _boundaries(text: Column) -> Column:
    """1-based positions whose char ENDS a sentence (ascending)."""
    n = F.length(text)
    return F.filter(F.sequence(F.lit(1), n), lambda i: (
        F.substring(text, i, 1).isin(".", "!", "?")
        & (F.substring(text, i + 1, 1) == " ")
        & F.substring(text, i + 2, 1).rlike("^[A-Z0-9]$")
        & ~F.lower(F.substring(text, F.greatest(i - 10, F.lit(1)),
                               i - F.greatest(i - 10, F.lit(1))))
        .rlike(ABBREV_GUARD_RE)))


def split_sentences(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per non-blank sentence: ``(id_col, sent_id, start_off,
    sentence)`` with ``start_off`` the 0-based offset of the segment in
    the original string (leading spaces belong to the PREVIOUS cut and
    are skipped by construction: each segment starts right after the
    boundary's trailing space).  NULL text yields no rows."""
    text = F.col(text_col)
    n = F.length(text)
    bnd = _boundaries(text)
    starts = F.concat(F.array(F.lit(1)), F.transform(bnd, lambda i: i + 2))
    ends = F.concat(F.transform(bnd, lambda i: i + 1),
                    F.array(n + 1))  # exclusive
    segs = F.zip_with(starts, ends,
                      lambda a, b: F.struct(
                          a.alias("start"),
                          F.substring(text, a, b - a).alias("sent")))
    return (df.where(text.isNotNull())
            .select(id_col, F.posexplode(segs).alias("sent_id", "seg"))
            .where(F.trim(F.col("seg.sent")) != "")
            .select(id_col,
                    F.col("sent_id").cast("int"),
                    (F.col("seg.start") - 1).cast("int").alias("start_off"),
                    F.col("seg.sent").alias("sentence")))
