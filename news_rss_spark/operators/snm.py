"""Sorted-neighborhood near-duplicate detection (Hernandez & Stolfo,
SIGMOD 1995 — the merge/purge problem).

Every other pair-mining route in this engine blocks by HASH (MinHash
b x r bands, SimHash pigeonhole bands, embedding LSH buckets).  The
sorted-neighborhood method (SNM) is the classic SORT-based alternative:
order the corpus by a blocking key, then compare each record only to
its ``w`` successors in that order.  Candidates are O(n * w) by
construction — no band-collision census needed, no hot-bucket quadratic
blowup when a band value is popular (the skew instead concentrates as a
LONG RUN of equal keys, which stays linear: a run of length m emits
m * w pairs, not m^2).  Its blind spot is the dual of hashing's: a
difference inside the key prefix separates two true duplicates by rank
(the ER literature's fix is multi-pass SNM with rotated keys, which is
just a union of this operator over different ``key_len`` prefixes or
key expressions).

Blocking key: the first ``key_len`` characters of
``regexp_replace(lower(text), '[^a-z0-9]', '')`` — with the regex
scanning only the first ``_KEY_SCAN_CHARS`` document characters (the
key needs ``key_len`` alnum chars, not the whole text) — packed
order-preservingly into one int64 (base 37: '0'-'9' -> 1..10, 'a'-'z'
-> 11..36, right-padded with '0'); 37^10 < 2^63 so ``key_len <= 12``
keeps the key exact in both engines.  The numeric packing exists so the
global rank can be computed WITHOUT a global sort shuffle of strings
and so the DuckDB oracle can replay the identical key arithmetic
(:func:`snm_numkey_sql` is the single source for both engines).

Scale shape (100 TB): the global rank is the packing module's two-phase
recipe — ONE column-pruned approxQuantile pass freezes range bounds
driver-side, a per-partition ``row_number`` window runs inside each
range (never ``Exchange SinglePartition``), and per-partition counts
(one tiny row each) prefix-sum on the driver into broadcast offsets.
Neighbor pairs then come from ONE equi-join: each row lands in rank
bucket ``(rn-1) div w``; the probe side is duplicated into its own and
the previous bucket, so every pair with rank distance in [1, w] meets
in exactly one bucket (the two copies are disjoint cases) and the join
output is <= n * w rows.  Verification reuses the exact-edit-distance
contract of ``text_dedup.edit_distance_near_dup_pairs``: a free length
prefilter, a lazy ``text == text`` short-circuit for exact copies, then
Spark's THRESHOLDED banded Levenshtein.

Reference anchor: the reference dedups by exact GUID/title equality
(src/cache/mod.rs:34-57 seen-set contains); SNM is the engine-new
sequence-level near-dup escalation of that contract, alongside the
MinHash/SimHash set-level routes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snm_numkey_sql", "snm_global_rank", "snm_candidate_pairs",
           "snm_near_dup"]

# int64 safety: 37^12 = 6.58e18 < 2^63 = 9.22e18; 13 chars would overflow.
_MAX_KEY_LEN = 12

# The blocking key only needs key_len alnum chars, so the normalizer
# scans a bounded document prefix, NOT the whole text: the numkey
# expression references the normalized column once per base-37 term and
# the rank recipe executes the plan three times — an unbounded
# regexp_replace would re-scan the full corpus text ~30x (measured 27.8 s
# -> 0.3 s at sf0.1 for the eager rank passes when bounded).  Documents
# whose first 256 chars hold fewer than key_len alnum chars simply get a
# padded (shorter) key — a blocking-quality tradeoff, not a correctness
# one, and the oracle replays the same bound.
_KEY_SCAN_CHARS = 256


def snm_numkey_sql(norm_col: str, key_len: int = 10) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB) packing the
    first ``key_len`` chars of an already-normalized ``[a-z0-9]*``
    string column into an order-preserving int64.

    Char values: '0'-'9' -> 1..10, 'a'-'z' -> 11..36, pad '0' (value 1)
    — the pad only has to be IDENTICAL across engines, not a true zero,
    because both sides of the oracle comparison sort by the same packed
    key.  Emitted as an explicit ``key_len``-term sum because DuckDB has
    no higher-order fold and the oracle must replay the key bit-exactly.
    """
    if not 1 <= key_len <= _MAX_KEY_LEN:
        raise ValueError(f"key_len must be in [1, {_MAX_KEY_LEN}] "
                         f"(int64 overflow beyond), got {key_len}")
    # explicit truncate-then-pad: both engines' rpad happens to truncate
    # overlong input, but the substring makes the contract engine-proof
    padded = (f"rpad(substring({norm_col}, 1, {key_len}), "
              f"{key_len}, '0')")
    terms = []
    for i in range(1, key_len + 1):
        c = f"ascii(substring({padded}, {i}, 1))"
        v = (f"(CASE WHEN {c} BETWEEN 48 AND 57 THEN {c} - 47 "
             f"ELSE {c} - 86 END)")
        terms.append(f"CAST({v} AS BIGINT) * {37 ** (key_len - i)}")
    return "(" + " + ".join(terms) + ")"


# Rank-partition skew pre-flight (the SNM analog of text_dedup's
# _enforce_candidate_budget): a degenerate numkey distribution — e.g.
# every document opening with the same boilerplate prefix — collapses
# the quantile bounds so one range partition holds most of the corpus,
# and the per-partition row_number window becomes a single-task
# straggler.  The per-partition counts are ALREADY collected for the
# prefix-sum, so the check is free: abort with a diagnosis BEFORE the
# straggler stage when the largest partition exceeds
# max(_SKEW_FLOOR_ROWS, _SKEW_FACTOR x the mean partition size).  The
# floor keeps every small-corpus run (tests, sf benches) unaffected;
# the factor is what trips at 100 TB.
_SKEW_FLOOR_ROWS = 2_000_000
_SKEW_FACTOR = 8


def _enforce_rank_partition_budget(counts: list[tuple[int, int]],
                                   max_partition_rows: int | None) -> None:
    if not counts:
        return
    total = sum(n for _, n in counts)
    mean = total / len(counts)
    limit = (max_partition_rows if max_partition_rows is not None
             else max(_SKEW_FLOOR_ROWS, int(_SKEW_FACTOR * mean)))
    worst_pid, worst = max(counts, key=lambda c: c[1])
    if worst > limit:
        raise ValueError(
            f"SNM rank partition {worst_pid} holds {worst:,} rows "
            f"(> budget {limit:,}; corpus {total:,} over {len(counts)} "
            f"range partitions) — the blocking-key distribution is "
            f"degenerate (a shared prefix?). Lengthen key_len, use a "
            f"different key expression (multi-pass SNM), or raise "
            f"max_partition_rows if the straggler window is acceptable.")


def snm_global_rank(df: DataFrame, numkey_col: str, id_col: str,
                    num_partitions: int | None = None,
                    max_partition_rows: int | None = None) -> DataFrame:
    """Adds ``_snm_rn``: the global 1-based ``row_number`` in
    ``(numkey_col, id_col)`` order, computed without a global window.

    Same three-execution determinism contract as
    ``packing.with_global_prefix_sum`` (quantile pass, counts pass,
    final pass — input lineage must be deterministic), but the order
    key here need NOT be unique: ``id_col`` breaks ties, and the range
    partition id is a function of ``numkey_col`` alone so every tie
    group lands in one partition and the composite order is total.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(
        df.approxQuantile(numkey_col, probs, 1.0 / (4 * n_parts))))
    if bounds:
        b_arr = F.array(*[F.lit(float(b)) for b in bounds])
        pid = F.size(F.filter(
            b_arr, lambda b: b < F.col(numkey_col).cast("double")))
    else:
        pid = F.lit(0)
    keyed = df.withColumn("_snm_pid", pid)
    w = Window.partitionBy("_snm_pid").orderBy(numkey_col, id_col)
    local = keyed.withColumn("_snm_local_rn", F.row_number().over(w))
    counts = sorted(
        (r["_snm_pid"], r["n"])
        for r in keyed.groupBy("_snm_pid").agg(
            F.count("*").alias("n")).collect())
    _enforce_rank_partition_budget(counts, max_partition_rows)
    offsets, acc = [], 0
    for pid_val, n in counts:
        offsets.append((pid_val, acc))
        acc += n
    off_df = spark.createDataFrame(offsets or [(0, 0)],
                                   "_snm_pid int, _snm_offset long")
    return (local.join(F.broadcast(off_df), on="_snm_pid")
            .withColumn("_snm_rn",
                        (F.col("_snm_local_rn") + F.col("_snm_offset"))
                        .cast("long"))
            .drop("_snm_pid", "_snm_local_rn", "_snm_offset"))


def snm_candidate_pairs(df: DataFrame, window: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        key_len: int = 10) -> DataFrame:
    """``(a, b, rank_gap)`` — every pair whose global sorted-key ranks
    differ by 1..``window``; ``a`` is the lower-ranked id.

    The bucket trick makes this ONE equi-join: build side carries its
    bucket ``(rn-1) div window``; probe side is exploded into its own
    and the previous bucket.  A qualifying pair has bucket difference 0
    or 1, so it meets exactly once (the two probe copies are disjoint
    join cases) and nothing meets twice.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    # normalized prefix projected ONCE as its own column (referenced by
    # every base-37 term, so CollapseProject cannot inline the regex
    # back into each term); the regex scans only _KEY_SCAN_CHARS chars
    norm = (f"substring(regexp_replace(lower(substring({text_col}, 1, "
            f"{_KEY_SCAN_CHARS})), '[^a-z0-9]', ''), 1, {key_len})")
    base = (df.filter(F.col(text_col).isNotNull())
            .withColumn("_snm_norm", F.expr(norm))
            .withColumn("_snm_key", F.expr(
                snm_numkey_sql("_snm_norm", key_len))))
    ranked = snm_global_rank(base, "_snm_key", id_col)
    bkt = F.expr(f"CAST((_snm_rn - 1) DIV {window} AS BIGINT)")
    left = ranked.select(
        F.col(id_col).alias("a"), F.col("_snm_rn").alias("_rn_a"),
        bkt.alias("_bkt"))
    right = ranked.select(
        F.col(id_col).alias("b"), F.col("_snm_rn").alias("_rn_b"),
        F.explode(F.array(bkt, bkt - 1)).alias("_bkt"))
    return (left.join(right, on="_bkt")
            .filter((F.col("_rn_b") > F.col("_rn_a")) &
                    (F.col("_rn_b") <= F.col("_rn_a") + window))
            .select("a", "b",
                    (F.col("_rn_b") - F.col("_rn_a"))
                    .cast("int").alias("rank_gap")))


def snm_near_dup(df: DataFrame, window: int = 8, max_dist: int = 12,
                 text_col: str = "text", id_col: str = "doc_id",
                 key_len: int = 10) -> DataFrame:
    """``(a, b, dist)`` — sorted-neighborhood candidates verified by
    exact edit distance <= ``max_dist`` (``a`` = lower-ranked id).

    Text joins back AFTER blocking (only candidate rows ship text), the
    length-difference prefilter is free (|len a - len b| lower-bounds
    edit distance), exact copies short-circuit to 0 without running the
    DP, and the survivors run Spark's thresholded banded Levenshtein —
    O(max_dist * L) per pair, result-identical to the oracle's full DP
    + threshold cut.
    """
    cand = snm_candidate_pairs(df, window, text_col, id_col, key_len)
    t = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col))
    withtext = (
        cand.join(t.select(F.col(id_col).alias("a"),
                           F.col(text_col).alias("_ta")), "a")
        .join(t.select(F.col(id_col).alias("b"),
                       F.col(text_col).alias("_tb")), "b")
        .filter(F.abs(F.length("_ta") - F.length("_tb")) <= max_dist))
    dist = (F.when(F.col("_ta") == F.col("_tb"), F.lit(0))
            .otherwise(F.levenshtein("_ta", "_tb", max_dist)))
    return (withtext.select("a", "b", dist.cast("int").alias("dist"))
            .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist)))
