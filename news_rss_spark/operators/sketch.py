"""Deterministic HyperLogLog distinct-count sketch, from scratch.

At 100 TB, ``count(DISTINCT x)`` per group is a full shuffle of every
distinct value; the standard engine answer is an HLL sketch (Flajolet et
al. 2007 — the same algorithm behind Spark's ``approx_count_distinct``
and DuckDB's ``approx_count_distinct``).  This one is built from plain
DataFrame ops instead of the built-in so that

1. the hash is the engine's content-stable md5 contract — the estimate
   is REPRODUCIBLE across engines, runs, and partitionings (the built-in
   sketches of Spark and DuckDB hash differently and cannot be compared
   in the correctness gate), and
2. registers are an open, mergeable relation ``(group, bucket, register)``
   — sketches of two corpus snapshots union + ``max`` into the sketch of
   their union (the streaming/incremental story), which an opaque binary
   sketch column only gives you through engine-specific UDAFs.

Layout (p register-index bits, m = 2**p registers):

- 60-bit hash = first 15 md5 hex chars (int64-safe in Spark AND DuckDB —
  the simhash trick, text_dedup.py);
- bucket = low p bits; w = high (60-p) bits;
- register = max over values of rho(w) = leading zeros of w + 1
  (computed EXACTLY as (60-p) - length(bin(w)) + 1 — both engines have
  ``bin``; no float log2 near power-of-two boundaries);
- harmonic sum kept in INTEGER arithmetic: sum(2^(Kmax - rho)) with
  Kmax = 60 - p + 1, so the cross-engine float contract is a single
  literal-by-integer division;
- empty registers enter as 2^Kmax each (V = m - registers present);
- linear-counting correction for raw <= 2.5 m with V > 0 (small range);
  the 2^60 large-range correction is out of test reach and omitted.

Plan: one codegen'd projection -> ONE hash aggregation on
(group, bucket) with map-side partial ``max`` (the whole corpus combines
locally to <= |groups| * m rows before the shuffle) -> a |groups|-sized
aggregation.  Nothing but the m-row-per-group register frame ever moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, group_col: str, value_col: str,
                  p: int = 8) -> DataFrame:
    """Per-(group, bucket) max-rho register relation — the mergeable
    sketch state.  Null values are ignored (SQL COUNT DISTINCT parity)."""
    m = 1 << p
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
               16, 10).cast("long")
    # integer shift, NOT a float division: h has 60 bits, a double
    # mantissa 53 — h/m through double would corrupt low bits
    w = F.shiftright(h, p)                   # high 60-p bits
    kmax = _HASH_BITS - p + 1
    rho = F.when(w == 0, F.lit(kmax)).otherwise(
        F.lit(_HASH_BITS - p + 1) - F.length(F.bin(w)))
    return (df.filter(F.col(value_col).isNotNull())
            .select(F.col(group_col),
                    F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
                    rho.cast("int").alias("rho"))
            .groupBy(group_col, "bucket")
            .agg(F.max("rho").alias("register")))


def hll_estimate(registers: DataFrame, group_col: str,
                 p: int = 8) -> DataFrame:
    """Cardinality estimate from the register relation:
    ``(group, n_est)`` with n_est rounded to 6 digits.

    The harmonic mean is accumulated in exact BIGINT (sum of
    2^(Kmax - register), plus 2^Kmax per empty register), so the only
    float steps are one literal/integer division and the optional
    linear-counting ``ln`` — both rounded, both bit-stable."""
    m = 1 << p
    kmax = _HASH_BITS - p + 1
    # alpha * m^2 * 2^Kmax precomputed as ONE Python double literal: the
    # raw estimate is literal / S, a single cross-engine-exact division
    num = hll_alpha(m) * m * m * float(1 << kmax)
    agg = registers.groupBy(group_col).agg(
        F.sum(F.expr(f"shiftleft(1L, {kmax} - register)")).alias("s_present"),
        F.count("*").alias("n_present"))
    v = F.lit(m) - F.col("n_present")                  # empty registers
    s = F.col("s_present") + v * F.lit(1 << kmax)
    raw = F.lit(num) / s.cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
                 ).otherwise(raw)
    return agg.select(F.col(group_col), F.round(est, 6).alias("n_est"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 8) -> DataFrame:
    """Sketch + estimate in one call: ``(group, n_est)``."""
    return hll_estimate(hll_registers(df, group_col, value_col, p),
                        group_col, p)


# ------------------------------------------------- Count-Min sketch (CMS)

def cms_counters(items: DataFrame, value_col: str,
                 d: int = 4, w: int = 256) -> DataFrame:
    """Deterministic Count-Min sketch (Cormode & Muthukrishnan 2005 — the
    frequency-estimation counterpart of the HLL above) from plain
    DataFrame ops: ``(depth, pos, cnt)`` counters, d rows x w columns.

    Like the HLL, the hash is the engine's content-stable md5 contract
    (row j hashes ``'cms-<j>:' || value``, first 8 hex chars -> pos =
    h % w), so the sketch is REPRODUCIBLE across engines/partitionings
    and a DuckDB oracle can replay estimates bit-exactly; and the state
    is an open, MERGEABLE relation — counter tables of two corpus
    snapshots union + ``sum`` into the sketch of their union, the same
    streaming/incremental story as the HLL register table.

    Plan: one generator projection (d rows per item via a JVM
    ``explode(sequence)``) -> ONE hash aggregation with map-side partial
    sums; only the d*w counter relation ever shuffles.  Null values are
    ignored (COUNT semantics)."""
    if d < 1 or w < 2:
        raise ValueError("cms_counters: need d >= 1 rows and w >= 2 columns")
    vals = items.filter(F.col(value_col).isNotNull())
    depth = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth")
    rows = vals.select(F.col(value_col).alias("v"), depth)
    pos = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("cms-"),
                                          F.col("depth").cast("string"),
                                          F.lit(":"),
                                          F.col("v").cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(w)).cast("int")
    return (rows.select("depth", pos.alias("pos"))
            .groupBy("depth", "pos")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(counters: DataFrame, candidates: DataFrame,
                 value_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Point estimates for a candidate relation: ``(value, est)`` with
    est = min over the d rows of the counter each candidate hashes to —
    an upper bound on the true count (never under-counts; over-counts by
    collision mass, bounded by ||f||/w per row w.h.p.).

    The counter relation is d*w rows — broadcast — so the estimate is a
    broadcast join + one small groupBy, no shuffle of the candidates."""
    cand = (candidates.filter(F.col(value_col).isNotNull())
            .select(F.col(value_col).alias("value")).distinct())
    expanded = cand.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth"))
    pos = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("cms-"),
                                          F.col("depth").cast("string"),
                                          F.lit(":"),
                                          F.col("value").cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(w)).cast("int")
    joined = (expanded.withColumn("pos", pos)
              .join(F.broadcast(counters), on=["depth", "pos"], how="left")
              .select("value", F.coalesce("cnt", F.lit(0)).alias("cnt")))
    return joined.groupBy("value").agg(F.min("cnt").alias("est"))


# ------------------------------------------------------- bottom-k (KMV)

def bottomk_sketch(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Bottom-k (k-minimum-values) sketch of a value set: the k smallest
    60-bit md5 hashes of the DISTINCT values — the mergeable set-sketch
    that answers RELATIONSHIP questions (Jaccard, overlap, union size)
    HLL's scalar cardinality cannot.

    Plan: one map-side-combining distinct-hash agg, then ``orderBy.
    limit(k)`` — Spark plans that as TakeOrderedAndProject (per-partition
    top-k, k-row merge), so only k rows per partition ever move.  The
    sketch is a plain relation: union two sketches + re-limit = the
    sketch of the set union (same open-state property as hll_registers).
    """
    h = (df.filter(F.col(value_col).isNotNull())
         .select(F.conv(F.substring(F.md5(F.col(value_col).cast("string")),
                                    1, 15), 16, 10).cast("long").alias("h"))
         .distinct())
    return h.orderBy("h").limit(k)


def corpus_overlap_estimate(df_a: DataFrame, df_b: DataFrame,
                            value_col: str, k: int = 256) -> DataFrame:
    """One-row Jaccard estimate between two value sets from their
    bottom-k sketches: ``(k_used, n_both, est_jaccard)``.

    The standard KMV estimator (Beyer et al., SIGMOD'07): take S = the k
    smallest hashes of sketch(A) UNION sketch(B) — a uniform sample of
    A u B — and count how many of S are in BOTH sketches;
    est_jaccard = n_both / |S|.  Deterministic given the md5 contract,
    so the DuckDB oracle replays it EXACTLY (no tolerance band), and two
    100 TB crawl snapshots compare by shipping 2k longs, not by a
    corpus-wide join — the dedup-planning primitive that decides whether
    a cross-snapshot MinHash pass is worth scheduling at all.

    ``k_used = |S|`` (< k when the union itself has fewer distinct
    values); the estimate is exact in that regime.  Contract for the
    degenerate case: two empty/all-NULL value sets give ``k_used = 0``
    and a PINNED ``est_jaccard = 0.0`` (never NULL or a division error),
    so downstream gates comparing the estimate always see a number.
    """
    sa = bottomk_sketch(df_a, value_col, k)
    sb = bottomk_sketch(df_b, value_col, k)
    s = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    both = sa.join(sb, "h")  # k-row join of two k-row relations
    hits = s.join(both, "h")
    return (s.agg(F.count("*").cast("long").alias("k_used"))
            .crossJoin(F.broadcast(
                hits.agg(F.count("*").cast("long").alias("n_both"))))
            .select("k_used", "n_both",
                    F.when(F.col("k_used") > 0,
                           F.round(F.col("n_both").cast("double")
                                   / F.col("k_used"), 6))
                    .otherwise(F.lit(0.0)).alias("est_jaccard")))


def quantile_sample_sketch(df: DataFrame, value_col: str,
                           id_col: str = "doc_id",
                           k: int = 1024) -> DataFrame:
    """Deterministic mergeable quantile sketch: the ``(h, v)`` pairs with
    the k smallest ``md5(id)`` draws — a uniform k-sample of ROWS (ids
    are unique, so the hash order is a deterministic random permutation
    of the corpus; the same md5_draw32 replayability contract as
    uniform_sample/corpus_shuffle, reused here for a SKETCH).

    Why this shape instead of GK/KLL/t-digest: those compactors are
    merge-ORDER-sensitive, which breaks the engine's bit-determinism
    contract under Spark's nondeterministic partition merge tree.  A
    bottom-k row sample is order-free (min-k of a set), mergeable
    (union + re-limit = the sketch of the union, exactly like
    bottomk_sketch/hll_registers), deterministic, and its estimator is
    SQL-replayable EXACTLY — the oracle reproduces every sampled row and
    every estimate, no tolerance band.  Rank error is O(sqrt(q(1-q)/k))
    (Dvoretzky-Kiefer-Wolfowitz), vs KLL's O(1/k): for corpus metrology
    (length/score/quality percentiles) k=4096 gives ~1% rank error for
    64 KB shipped — the right trade for an exactly-verifiable engine.

    Plan: one TakeOrderedAndProject (per-partition bottom-k, k-row
    merge) — only k rows per partition ever move, no corpus sort.
    """
    return (df.filter(F.col(value_col).isNotNull())
            .select(F.md5(F.col(id_col).cast("string")).alias("h"),
                    F.col(value_col).cast("double").alias("v"))
            .orderBy("h", "v").limit(k))


def merge_quantile_sketches(*sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Union + distinct + re-limit = the sketch of the combined corpus
    (ids globally unique across inputs, same contract as every md5-draw
    op; the distinct makes the merge idempotent for OVERLAPPING sketches
    — e.g. a replayed stream batch — where duplicate (h, v) rows would
    otherwise crowd real rows out of the bottom-k)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h", "v").limit(k)


def sketch_quantile_estimates(sketch: DataFrame,
                              qs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
                              ) -> DataFrame:
    """``(q, est)`` per requested quantile from the sample: nearest-rank
    rule ``r = floor(q * (n - 1)) + 1`` over the value-ordered sample
    (0-indexed floor interpolation — pinned so both engines pick the
    identical sample row).  The window runs on the k-row sketch — O(k)
    by construction."""
    from pyspark.sql.window import Window
    ranked = sketch.select(
        F.col("v"),
        (F.row_number().over(Window.orderBy("v", "h")) - 1).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double")
    pick = F.floor(F.col("q") * (F.col("n") - 1))
    return (ranked.crossJoin(F.broadcast(qdf))
            .filter(F.col("r") == pick)
            .select("q", F.col("v").alias("est")))
