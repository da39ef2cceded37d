"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm).

Shingle-set methods (MinHash/Jaccard) answer "how similar are these two
documents overall"; winnowing answers a different question the dedup
family needs too: "do these documents share ANY contiguous run of at
least t tokens" — local plagiarism/quotation/boilerplate overlap — with
a POSITIONAL guarantee: from every window of ``w`` consecutive k-gram
hashes, keep the minimum (rightmost on ties), and any substring match of
length >= w + k - 1 tokens is guaranteed to share at least one selected
fingerprint.  Density is bounded too (~2/(w+1) of all grams are kept),
so the fingerprint index is a fixed fraction of corpus size — tunable
storage, unlike "every gram" (ExactSubstr) or "one sketch per doc"
(MinHash).

Spark shape: the whole selection is ONE codegen'd projection — token
array, 60-bit md5 gram keys (the engine's cross-engine hash contract,
same as contamination/span dedup), per-window ``array_min`` over
``struct(hash, -pos)`` slices (lexicographic struct order = min hash,
rightmost position), ``array_distinct``, explode.  No shuffle at all
until a downstream consumer aggregates; pair mining is the standard
inverted-index equi-join with a document-frequency prune (the
containment_pairs blocking contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_overlap_pairs"]


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        k: int = 5, w: int = 4) -> DataFrame:
    """Selected fingerprints per document: ``(id, fp_hash, pos)`` where
    ``pos`` is the 0-based token index of the selected k-gram.  Documents
    with fewer than k tokens emit nothing; documents with fewer than w
    grams emit the minimum over all their grams (one window).

    Guarantee: two documents sharing a verbatim token run of
    ``w + k - 1`` or more share at least one (fp_hash, within-run
    offset) fingerprint."""
    if k < 1 or w < 1:
        raise ValueError(f"winnow_fingerprints: k/w must be >= 1, "
                         f"got k={k} w={w}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # gram hash stream as (h, -pos) structs: 60-bit md5 slices (15 hex
    # chars — the contamination/span-dedup key contract)
    hs = F.expr(
        f"transform(sequence(0, size(w) - {k}), i -> struct("
        f"cast(conv(substring(md5(array_join(slice(w, i + 1, {k}), ' ')), "
        f"1, 15), 16, 10) as bigint) as h, -i as nj))")
    # one array_min per window start; slice truncates at the end, so the
    # n_grams < w case collapses to a single whole-stream window
    wins = F.expr(
        f"transform(sequence(0, greatest(size(hs) - {w}, 0)), "
        f"i -> array_min(slice(hs, i + 1, {w})))")
    return (df.select(F.col(id_col), toks.alias("w"))
            .filter(F.size("w") >= k)
            .select(id_col, hs.alias("hs"))
            .select(id_col, F.explode(F.array_distinct(wins)).alias("fp"))
            .select(id_col, F.col("fp.h").alias("fp_hash"),
                    (-F.col("fp.nj")).cast("long").alias("pos")))


def winnow_overlap_pairs(fps: DataFrame, id_col: str = "doc_id",
                         min_shared: int = 2,
                         max_df: int = 50) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct fingerprint
    hashes: ``(a, b, n_shared)``, a < b — the local-overlap candidate
    report over a :func:`winnow_fingerprints` relation.

    Blocking contract (same as containment_pairs): fingerprints held by
    more than ``max_df`` documents are boilerplate and pruned BEFORE the
    self-join, so the join fan-out per hash is bounded by C(max_df, 2);
    run the generic band census on ``fp_hash`` first at a new scale."""
    d = fps.select(id_col, "fp_hash").distinct()
    df_counts = d.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("ndocs"))
    # the HOT set is the small side by definition (few boilerplate
    # hashes) — broadcast it as an anti-join; broadcasting the keep set
    # would ship the whole fingerprint space
    hot = df_counts.filter(F.col("ndocs") > max_df).select("fp_hash")
    pruned = d.join(F.broadcast(hot), "fp_hash", "left_anti")
    a = pruned.select(F.col("fp_hash"), F.col(id_col).alias("a"))
    b = pruned.select(F.col("fp_hash"), F.col(id_col).alias("b"))
    return (a.join(b, "fp_hash")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
