"""Bloom-filter-pruned anti-join (engine-new, scale path for D1/D2 dedup):
exact "drop already-seen keys" when the seen-set is too large to broadcast
as keys but its Bloom bitmap is not.

At 100 TB the seen-article set (reference D1,
src/feeds/rss_feeds/mod.rs:128-136) holds billions of keys — a broadcast
anti-join (operators/dedup.py) stops fitting, and a plain shuffle
anti-join reships the entire new batch.  The Bloom plan:

1. ``bloom_words(seen)``: k hash positions per seen key, OR-ed into
   64-bit words — ``(word_idx, word)`` rows, a hash aggregation with
   map-side combine.  m/64 rows total: 64x smaller than the key set at
   10 bits/key (1e9 keys -> ~150 MB of words — broadcastable).
2. ``bloom_prune(new)``: k broadcast hash joins (one per hash function)
   against the words table; a row is ``maybe_seen`` iff all k bits are
   set.  Map-side only — the big side never shuffles here.
3. exact anti-join ONLY for the maybe rows (true dups + the ~1% false
   positives); definite-new rows bypass it entirely.

The union of (2-negatives, 3-survivors) EQUALS the plain anti-join — the
Bloom layer is a lossless pruning, so the DuckDB oracle is the plain
``NOT IN``.  Spark's own runtime bloom join injection
(spark.sql.optimizer.runtime.bloomFilter.*) covers equi-joins it can see
through; this operator makes the filter a persistable artifact (write the
words table once per ledger epoch, reuse for every batch).

Hashing is xxhash64 (JVM, seed-varied via a prepended literal) — the
bitmap never needs cross-engine reproducibility because the final result
is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k Bloom bit positions in [0, m_bits) for a key (seed-varied xxhash)."""
    return [F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)]


def bloom_words(seen: DataFrame, key_col: str, m_bits: int = 1 << 20,
                k: int = 3) -> DataFrame:
    """Aggregate the seen keys' Bloom bitmap as ``(word_idx, word)`` rows
    (64 bits per row).  Decomposable bit_or aggregation — safe under any
    key skew; at most m_bits/64 rows regardless of |seen|."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (seen.select(pos)
            .select((F.col("pos") / 64).cast("long").alias("word_idx"),
                    F.expr("shiftleft(1L, cast(pmod(pos, 64) AS int))")
                    .alias("bit"))
            .groupBy("word_idx")
            .agg(F.bit_or("bit").alias("word")))


def bloom_prune(df: DataFrame, words: DataFrame, key_col: str,
                m_bits: int = 1 << 20, k: int = 3,
                flag_col: str = "maybe_seen") -> DataFrame:
    """Tag each row ``maybe_seen`` via k broadcast joins against the words
    table — no shuffle of ``df``.  False positives possible (rate ~
    (1 - e^(-k*n/m))^k), false negatives impossible."""
    out = df
    hits = []
    for i, pos in enumerate(_positions(F.col(key_col), m_bits, k)):
        w = F.broadcast(words.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")))
        out = (out.withColumn(f"_p{i}", pos)
               .join(w, (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_wi{i}"),
                     "left"))
        bit = F.expr(f"shiftleft(1L, cast(pmod(_p{i}, 64) AS int))")
        hits.append(F.coalesce(F.col(f"_w{i}").bitwiseAND(bit) == bit,
                               F.lit(False)))
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    drop = [c for i in range(k) for c in (f"_p{i}", f"_wi{i}", f"_w{i}")]
    return out.withColumn(flag_col, cond).drop(*drop)


def bloom_anti_join(new: DataFrame, seen: DataFrame, key_col: str,
                    m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """EXACT ``new`` minus rows whose key appears in ``seen`` — the Bloom
    layer only decides which rows must pay the exact anti-join shuffle."""
    words = bloom_words(seen.select(key_col), key_col, m_bits, k)
    tagged = bloom_prune(new, words, key_col, m_bits, k)
    definite_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified = maybe.join(seen.select(key_col).distinct(), key_col, "left_anti")
    return definite_new.unionByName(verified)
