"""Corpus cleaning signals: character-entropy scoring and mojibake
(encoding-damage) detection + repair.

Two deterministic, shuffle-free per-document cleaners every web-scale
training-data pipeline runs before quality gating:

- **Order-0 character entropy** — Shannon entropy of the per-character
  distribution.  Machine-generated filler (keyboard mashing, repeated
  padding, base64 blobs, minified code) sits at the extreme ends of the
  entropy range while natural language clusters tightly (~3.5-4.5
  bits/char for English), so entropy is a standard cheap outlier signal
  next to ``quality_score``'s ratio features (it catches e.g.
  'aaaaaaaa…' padding that alpha-ratio scores as perfect text).
- **Mojibake repair** — UTF-8 text that was decoded as Latin-1/cp1252
  somewhere in a crawl pipeline leaves unmistakable artifacts
  ("Ã©" for "é", "â€™" for "'").  The repair here is the ftfy-style
  pinned-mapping subset: a fixed, ordered list of the most common
  double-encoding artifacts, applied as a literal replace chain — no
  charset transcoding at runtime, so both engines replay it exactly.

Scale notes (100 TB): both operators are ONE codegen'd projection —
no shuffle, no Python, no UDF.  The entropy fold runs over the
document's *distinct-character* list (bounded by the alphabet, ~10^2),
not the character stream, and the fold order is pinned (sorted
characters) so the float sum is bit-identical across engines and
partitionings.  Reference analog: the reference cleans item content
with a single regex pass (`src/feeds/rss_feeds/mod.rs:213-217`); these
operators are the engine-new generalization of that "repair the payload
before publishing" stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MOJIBAKE_MAP", "char_entropy", "mojibake_repair"]

# Pinned repair table (applied strictly in this order).  Every entry is
# the Latin-1/cp1252 rendering of a common UTF-8 sequence.  Keys start
# with distinct lead characters per length class ('â€x' = punctuation,
# 'Ãx' = accented letters, 'Âx' = symbol pass-throughs), so no key is a
# prefix of another and one left-to-right pass is unambiguous.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "'"),   # â€™  -> U+2019 right single quote
    ("â€œ", "“"),  # â€œ -> U+201C left double quote
    ("â€“", "–"),  # â€“ -> en dash
    ("â€”", "—"),  # â€” -> em dash
    ("â€¦", "…"),  # â€¦ -> ellipsis
    ("Ã©", "é"),    # Ã© -> é
    ("Ã¨", "è"),    # Ã¨ -> è
    ("Ã¡", "á"),    # Ã¡ -> á
    ("Ã³", "ó"),    # Ã³ -> ó
    ("Ã±", "ñ"),    # Ã± -> ñ
    ("Ã¼", "ü"),    # Ã¼ -> ü
    ("Ã¶", "ö"),    # Ã¶ -> ö
    ("Ã¤", "ä"),    # Ã¤ -> ä
    ("Ã§", "ç"),    # Ã§ -> ç
    ("Ã¯", "ï"),    # Ã¯ -> ï
    ("Â©", "©"),    # Â© -> ©
    ("Â«", "«"),    # Â« -> «
    ("Â»", "»"),    # Â» -> »
]


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """``(id, n_chars, n_distinct, char_entropy)`` — order-0 Shannon
    entropy in bits per character, rounded to 6 dp.

    Determinism contract: the p·log2(p) terms are accumulated with a
    left fold over the SORTED distinct-character list, so the floating
    sum has one fixed evaluation order regardless of partitioning — the
    same pinned-fold convention as ``ewma``/``lm_score``.  Empty
    documents are dropped (entropy of nothing is undefined)."""
    t = F.col(text_col)
    # split('') yields one element per character; array_remove drops the
    # empty-string artifacts some engines append at the boundaries
    expr = (
        f"array_remove(split({text_col}, ''), '')"
    )
    out = (
        df.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            F.expr(expr).alias("_ch"),
        )
        .select(
            F.col(id_col),
            F.size("_ch").cast("long").alias("n_chars"),
            F.expr("array_sort(array_distinct(_ch))").alias("_dc"),
            F.col("_ch"),
        )
        .select(
            F.col(id_col),
            F.col("n_chars"),
            F.size("_dc").cast("long").alias("n_distinct"),
            # terms in sorted-char order, then a left fold; 0.0 - sum
            # normalizes the single-char case to +0.0 (not -0.0)
            F.round(
                F.expr(
                    "0.0D - aggregate(transform(_dc, c -> "
                    "  (cast(size(filter(_ch, x -> x = c)) as double)"
                    "   / cast(n_chars as double))"
                    "  * log2(cast(size(filter(_ch, x -> x = c)) as double)"
                    "          / cast(n_chars as double))"
                    "), 0.0D, (a, x) -> a + x)"
                ),
                6,
            ).alias("char_entropy"),
        )
    )
    return out


def _mojibake_regex() -> str:
    # alternation of the literal keys; none are regex metacharacters
    return "|".join(k for k, _ in MOJIBAKE_MAP)


def mojibake_repair(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """``(id, n_mojibake, is_damaged, clean_text)`` — count of encoding
    artifacts (non-overlapping, left-to-right) and the repaired text
    after applying :data:`MOJIBAKE_MAP` as an ordered replace chain.

    One projection, zero shuffle, no Python: the count is a single
    ``regexp_count`` over the key alternation and the repair is nested
    ``replace`` calls — both replayable verbatim in ANSI SQL."""
    t = F.col(text_col)
    n_hits = F.regexp_count(t, F.lit(_mojibake_regex())).cast("long")
    repaired = t
    for bad, good in MOJIBAKE_MAP:
        repaired = F.replace(repaired, F.lit(bad), F.lit(good))
    return df.select(
        F.col(id_col),
        n_hits.alias("n_mojibake"),
        (n_hits > 0).alias("is_damaged"),
        repaired.alias("clean_text"),
    )
