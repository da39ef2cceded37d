"""Unicode script profiling: per-script character counts + dominant
script per document.

Multilingual crawl pipelines (CommonCrawl/CCNet-style) segment by SCRIPT
before language-ID — script is decidable per character from Unicode
block ranges (no model), it routes documents to per-script tokenizers,
and it catches mixed-script spam that word-marker language-ID
(``lang_id``) cannot see.  This is the deterministic pre-segmentation
step, not a replacement for language-ID.

All counting is JVM ``regexp_count`` over fixed character-class ranges —
RE2-safe (plain character classes, no lookaround/backrefs), one scan
projection, shuffle-free.  The dominant-script argmax reuses the
``lang_id`` single-evaluation array-argmax shape (each regex evaluated
exactly once per row; first-wins ties in the fixed SCRIPTS order), with
'none' when no listed script matches (digits/punctuation-only docs).

Block choices are the primary BMP letter blocks per script — enough to
route real text; extend SCRIPTS for full coverage (supplementary blocks
compose with ``|``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCRIPTS", "script_profile"]

# fixed iteration order = deterministic ties (dict order is the contract)
SCRIPTS: dict = {
    "latin": r"[A-Za-zÀ-ɏ]",
    "cyrillic": r"[Ѐ-ӿ]",
    "greek": r"[Ͱ-Ͽ]",
    "arabic": r"[؀-ۿ]",
    "hebrew": r"[֐-׿]",
    "devanagari": r"[ऀ-ॿ]",
    "cjk": r"[一-鿿぀-ヿ]",  # Han + kana
    "hangul": r"[가-힯]",
}


def script_profile(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, n_<script>... per SCRIPTS, dominant_script): per-script
    character counts and the argmax script ('none' if no script letter
    occurs).  One codegen'd projection, no shuffle."""
    text = F.col(text_col)
    names = list(SCRIPTS)
    counts = [F.regexp_count(text, F.lit(SCRIPTS[s])).cast("long")
              for s in names]
    arr = F.array(*counts)
    mx = F.array_max(arr)
    pick = F.element_at(F.array(*[F.lit(s) for s in names]),
                        F.array_position(arr, mx).cast("int"))
    cols = [F.col(id_col)]
    cols += [c.alias(f"n_{s}") for s, c in zip(names, counts)]
    cols.append(F.when(mx > 0, pick).otherwise(F.lit("none"))
                .alias("dominant_script"))
    return df.select(*cols)
