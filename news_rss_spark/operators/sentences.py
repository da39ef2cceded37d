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

Scale shape: one projection, zero shuffle, zero Python.  The text is
exploded ONCE into a chars array (a real projected column, so the HOF
lambda sees an attribute reference — CollapseProject will not inline a
multiply-referenced split() back into the per-element body), and the
per-char scan is a ``filter`` over ``sequence(1, n)`` of O(1)
``F.get`` array probes.  ``substring(text, i, 1)`` probes would each
re-walk the UTF8 bytes from the start to locate codepoint i — an
O(n**2) scan that measured ~10k docs/s on 2 KB articles; the array
form is O(n) (~8x faster there).  The abbreviation guard inspects a
BOUNDED 10-char ``slice`` (never the prefix), keeping the scan O(n).

Newlines are NOT boundaries (feed/article text is pre-flattened by the
extraction kernel; a hard-break segmenter would double-cut).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_sentences", "ABBREV_GUARD_RE"]

ABBREV_GUARD_RE = (
    r"(^|[^a-z])(mr|mrs|ms|dr|prof|sr|jr|st|vs|etc|fig|no|e\.g|i\.e)$")


def _boundaries(text: Column, chars: Column) -> Column:
    """1-based positions whose char ENDS a sentence (ascending).

    ``chars`` MUST be a projected column holding ``split(text, '')`` —
    passing the split expression inline would re-evaluate it per
    element inside the HOF lambda (HOF bodies are interpreted, not
    codegen'd, and see outer expressions as-is unless they are
    attribute references)."""
    n = F.length(text)

    def ch(i: Column) -> Column:  # 1-based probe; NULL out of range
        return F.get(chars, i - 1)

    return F.filter(F.sequence(F.lit(1), n), lambda i: (
        ch(i).isin(".", "!", "?")
        & (ch(i + 1) == " ")
        & ch(i + 2).rlike("^[A-Z0-9]$")
        # length clamped >= 0: empty text makes sequence(1,0) == [1,0]
        # and at i=0 the window length would be -1 (substring tolerated
        # that; slice raises).
        & ~F.lower(F.array_join(
            F.slice(chars, F.greatest(i - 10, F.lit(1)),
                    F.greatest(i - F.greatest(i - 10, F.lit(1)),
                               F.lit(0))), ""))
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
    chars = F.col("__sent_chars")
    # Boundaries are ALSO projected (not inlined): the starts and ends
    # arrays both consume them, and an inline expression would run the
    # whole O(n) scan twice per row (visible as two filter(sequence..)
    # copies in the optimized plan).
    bnd = F.col("__sent_bnd")
    starts = F.concat(F.array(F.lit(1)), F.transform(bnd, lambda i: i + 2))
    ends = F.concat(F.transform(bnd, lambda i: i + 1),
                    F.array(n + 1))  # exclusive
    # Segment extraction joins the chars array back — O(segment) per
    # segment instead of an O(start) substring seek per segment.
    segs = F.zip_with(starts, ends,
                      lambda a, b: F.struct(
                          a.alias("start"),
                          F.array_join(F.slice(chars, a, b - a), "")
                          .alias("sent")))
    return (df.where(text.isNotNull())
            .withColumn("__sent_chars", F.split(text, ""))
            .withColumn("__sent_bnd", _boundaries(text, chars))
            .select(id_col, F.posexplode(segs).alias("sent_id", "seg"))
            .where(F.trim(F.col("seg.sent")) != "")
            .select(id_col,
                    F.col("sent_id").cast("int"),
                    (F.col("seg.start") - 1).cast("int").alias("start_off"),
                    F.col("seg.sent").alias("sentence")))
