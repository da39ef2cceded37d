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

Scale shape (100 TB): ONE projection builds the anchor list with
higher-order functions over a projected chars array (sequence ->
filter on the md5 predicate; O(1) slices, never an O(p) substring
seek), a second derives ``(chunk_idx, start, len, md5)`` structs —
hashing BEFORE the explode so exploded rows carry four scalars, not
the document — then explode.  Embarrassingly parallel, zero shuffle,
no Python on the md5 path.  Downstream dedup is the standard
``chunk_md5`` hash aggregation.  The md5-per-position cost is O(doc
chars) hashes of w-char grams (measured end-to-end: 212 docs/s at
20 KB docs vs 35 before the chars-array rewrite, linear in doc length
now; short docs keep the substring probe via the
``_CDC_SEEK_SWITCH`` length switch so 1-2 KB corpora pay no
allocation penalty); the throughput path is
:func:`cdc_chunks_gear` (same contract, vectorized rolling hash,
47.8k docs/s at 2 KB / 5.2k at 20 KB on local[32]).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GEAR", "cdc_chunks", "cdc_chunks_gear", "cdc_revision_pairs",
           "cdc_shared_chunks", "gear_anchors_py"]

# Anchor-scan break-even (chars): substring's O(p) UTF8 seek still beats
# the chars-array slice's per-position allocation below ~2 KB (measured
# 2x at 1 KB, ~1.4x at 2 KB, loses 5.8x by 20 KB).  Docs at or under
# this length probe with substring; longer docs slice the array.
_CDC_SEEK_SWITCH = 2048


def _explode_chunks(prepared: DataFrame, id_col: str) -> DataFrame:
    """Shared back half of both CDC variants: ``prepared`` carries
    ``(id, _cdc_chars, _starts)`` with ``_cdc_chars`` the projected
    ``split(text, '')`` array and ``_starts`` a strictly increasing int
    array beginning at 1; emits the exact-coverage chunk relation.

    ``chunk_md5`` is hashed INSIDE the per-document transform, BEFORE
    the explode: the earlier shape carried ``_text`` onto every
    exploded row (an O(doc) copy per chunk, O(doc^2/divisor) per doc)
    and seeked it with ``substring(_text, start, len)`` (another
    O(start) UTF8 walk per chunk).  Slicing the chars array per chunk
    is O(chunk) and the chunks tile the document exactly once, so the
    whole back half is O(doc) and the exploded rows carry only four
    scalars.  ``size(_cdc_chars)`` (not ``length(_text)``) supplies the
    final chunk's end so the array has two references and
    CollapseProject cannot inline the split into the lambda."""
    bounds = F.expr(
        "transform(sequence(1, size(_starts)), i -> struct("
        "  i as chunk_idx,"
        "  element_at(_starts, i) as chunk_start,"
        "  (if(i < size(_starts), element_at(_starts, i + 1),"
        "      size(_cdc_chars) + 1)) - element_at(_starts, i)"
        "    as chunk_len,"
        "  md5(array_join(slice(_cdc_chars, element_at(_starts, i),"
        "      (if(i < size(_starts), element_at(_starts, i + 1),"
        "          size(_cdc_chars) + 1)) - element_at(_starts, i)), ''))"
        "    as chunk_md5))"
    )
    return (
        prepared
        .select(F.col(id_col), F.explode(bounds).alias("b"))
        .select(
            F.col(id_col),
            F.col("b.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("b.chunk_start").cast("int").alias("chunk_start"),
            F.col("b.chunk_len").cast("int").alias("chunk_len"),
            F.col("b.chunk_md5").alias("chunk_md5"),
        )
    )


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
    t = F.col(text_col)
    # Length-switched anchor scan, identical output on both branches.
    # substring(text, p, w) re-walks the UTF8 bytes to codepoint p on
    # every probe — an O(n^2) scan that loses quadratically on long
    # docs (35 -> 212 docs/s at 20 KB when switched to array slices,
    # and it only gets worse).  But slicing a projected chars array
    # pays a fixed per-position allocation (slice + array_join) that
    # the short-seek substring beats on small docs (measured 2x at the
    # 1 KB probe corpus, ~1.4x at 2 KB).  So: substring probes up to
    # _CDC_SEEK_SWITCH chars, chars-array slices beyond — CaseWhen
    # evaluates exactly one branch per row.  The chars array is
    # projected either way (the exploding back half needs it) and is
    # referenced >= twice so CollapseProject cannot inline the
    # single-use split() into a per-element HOF body.
    sub_key = (f"cast(conv(substring(md5(substring({text_col}, p, {w})), "
               f"1, 15), 16, 10) as bigint)")
    arr_key = (f"cast(conv(substring(md5(array_join("
               f"slice(_cdc_chars, p, {w}), '')), "
               f"1, 15), 16, 10) as bigint)")
    # anchors exist only when len >= w + 1 (guard: sequence(2, 1) would
    # count DOWN); position 1 is always a start, so anchors begin at 2
    anchors = F.when(
        F.size(F.col("_cdc_chars")) >= w + 1,
        F.when(
            F.length(t) <= _CDC_SEEK_SWITCH,
            F.expr(f"filter(sequence(2, size(_cdc_chars) - {w} + 1), "
                   f"p -> {sub_key} % {divisor} = 0)"),
        ).otherwise(
            F.expr(f"filter(sequence(2, size(_cdc_chars) - {w} + 1), "
                   f"p -> {arr_key} % {divisor} = 0)")),
    ).otherwise(F.expr("array()").cast("array<int>"))
    prepared = (
        df.filter(F.length(t) > 0)
        .withColumn("_cdc_chars", F.split(t, ""))
        .select(
            F.col(id_col),
            F.col("_cdc_chars"),
            F.concat(F.array(F.lit(1)), anchors.cast("array<int>"))
             .alias("_starts"),
        )
    )
    return _explode_chunks(prepared, id_col)


# Pinned gear table: G[v] = low byte of md5("gear:<v>") — derived, not
# copied, so the oracle generator and the Python reference single-source
# it by the same formula.
def _gear_table() -> list[int]:
    import hashlib
    return [int(hashlib.md5(f"gear:{v}".encode()).hexdigest()[:2], 16)
            for v in range(256)]


GEAR: list[int] = _gear_table()
_GEAR_WINDOW = 6  # boundary looks at the 6 chars ending at p-1


def gear_anchors_py(text: str, divisor: int = 64) -> list[int]:
    """Pure-Python reference of the gear anchor rule (also the pytest
    lock): position ``p`` (1-based, ``p >= _GEAR_WINDOW + 1``) starts a
    new chunk iff ``sum_j GEAR[cp(text[p-2-j]) % 256] << j`` for
    ``j = 0.._GEAR_WINDOW-1`` is ``0 (mod divisor)`` — the low-bits view
    of the classic gear rolling hash ``h = (h << 1) + G[b]``, whose
    ``log2(divisor)``-bit residue only ever depends on the last
    ``_GEAR_WINDOW`` characters (64 > 2^5 decay)."""
    out = []
    n = len(text)
    for p in range(_GEAR_WINDOW + 1, n + 1):
        s = 0
        for j in range(_GEAR_WINDOW):
            s += GEAR[ord(text[p - 2 - j]) % 256] << j
        if s % divisor == 0:
            out.append(p)
    return out


def cdc_chunks_gear(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    divisor: int = 64) -> DataFrame:
    """The throughput path of :func:`cdc_chunks`: same output contract
    (exact-coverage ``(id, chunk_idx, chunk_start, chunk_len,
    chunk_md5)``), but the anchor predicate is the gear rolling hash
    instead of an md5 per position — the boundary's ``divisor``-residue
    depends only on the trailing 6-character window, so the whole
    anchor scan vectorizes to a handful of numpy shift-adds per
    document (no per-position hashing).  The kernel computes ONLY the
    anchor positions (Arrow-batched, one ``array<int>`` per doc);
    slicing and chunk hashing stay in the shared JVM back half, so both
    variants produce structurally identical plans past the anchor
    stage.  Boundaries remain content-defined (insertion-resync holds —
    same pytest property as the md5 variant)."""
    if divisor < 1:
        raise ValueError(f"cdc_chunks_gear: divisor must be >= 1, "
                         f"got {divisor}")
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    gear = np.array(GEAR, dtype=np.int64)
    win = _GEAR_WINDOW

    @pandas_udf("array<int>")
    def _anchors(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            n = len(t)
            if n < win + 1:
                out.append([])
                continue
            # one int64 per CHARACTER (utf-32 codepoints, so positions
            # match the JVM's character-based substring)
            cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            g = gear[cps & 0xFF]
            # window sum ending at char index i (0-based), i >= win-1:
            # s[i] = sum_j g[i-j] << j
            s = np.zeros(n - win + 1, dtype=np.int64)
            for j in range(win):
                s += g[win - 1 - j: n - j] << j
            # window end i = win-1 .. n-1 -> start position p = i + 2,
            # valid while p <= n (the last window can't start a chunk)
            idx = np.nonzero(s[: n - win] % divisor == 0)[0]
            out.append((idx + win + 1).astype("int32").tolist())
        return pd.Series(out)

    t = F.col(text_col)
    prepared = (
        df.filter(F.length(t) > 0)
        .select(
            F.col(id_col),
            F.split(t, "").alias("_cdc_chars"),
            F.concat(F.array(F.lit(1)),
                     _anchors(t).cast("array<int>")).alias("_starts"),
        )
    )
    return _explode_chunks(prepared, id_col)


def cdc_revision_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", w: int = 16,
                       divisor: int = 64, min_len: int = 24,
                       min_shared: int = 3, max_df: int = 4,
                       variant: str = "md5") -> DataFrame:
    """``(a, b, n_shared)`` — document pairs sharing ``min_shared`` or
    more content-defined chunks of length >= ``min_len``: the
    revision/re-crawl detector (same article with insertions), robust
    where fixed-size chunking loses everything after the first edit.

    Scale shape: an inverted chunk index with a document-frequency
    prune (``max_df``) — a chunk present in many documents is
    boilerplate, not revision signal, and pruning it keeps the
    self-join off hot keys (the containment_pairs blocking contract).
    The join ships only (chunk_md5, id) rows.  Demonstrated at 1M docs:
    recall 9,999/10,000 planted revisions, zero spurious
    (`BENCH/cdc_scale_driver.py`).

    ``variant='gear'`` uses the vectorized gear-anchor kernel (5.7×
    faster chunking, same contract); ``'md5'`` is the SQL-checkable
    Manber-anchor spec path."""
    if variant == "md5":
        ch = cdc_chunks(df, id_col=id_col, text_col=text_col, w=w,
                        divisor=divisor)
    elif variant == "gear":
        ch = cdc_chunks_gear(df, id_col=id_col, text_col=text_col,
                             divisor=divisor)
    else:
        raise ValueError(f"cdc_revision_pairs: unknown variant "
                         f"{variant!r} (md5|gear)")
    occ = (ch.filter(F.col("chunk_len") >= min_len)
             .select("chunk_md5", F.col(id_col)))
    keep = (occ.groupBy("chunk_md5").count()
               .filter(F.col("count") <= max_df).select("chunk_md5"))
    pruned = occ.join(keep, "chunk_md5")
    a = pruned.select("chunk_md5", F.col(id_col).alias("a"))
    b = pruned.select("chunk_md5", F.col(id_col).alias("b"))
    return (
        a.join(b, "chunk_md5")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
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
