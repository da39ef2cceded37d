"""Document-level deduplication for training-data pipelines (engine-new;
generalizes the reference's GUID dedup D1, src/feeds/rss_feeds/mod.rs:128-136,
from identity to content similarity).

All hot paths are JVM-side column expressions (md5 / array_min / transform /
explode) — no Python UDFs — so every operator whole-stage-codegens and
shuffles only on compact keys:

- exact:    one groupBy on a 128-bit content hash (map-side partial agg);
- MinHash:  shingle -> k independent min-hashes -> band join; the candidate
  join shuffles (seed, minhash) pairs (16 bytes/doc/seed), never documents;
- SimHash:  near-dup bit signature via explode + bit-bucket aggregation;
- n-gram Jaccard: exact verify step on candidate pairs only (never all
  pairs) — at 100 TB the candidate set after LSH is linear-ish, the n²
  verify is confined to tiny buckets;
- embedding cosine near-dup: see similarity.py.

Hashing uses md5 (not xxhash64) so every step has a bit-exact DuckDB oracle.
At cluster scale swap HASH = xxhash64 for speed; semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact

def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    smallest id as keeper and the duplicate count."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct content value."""
    w = exact_dedup_groups(df.select(id_col, text_col), text_col, id_col)
    return df.join(
        w.select(F.col("keeper_id").alias(id_col)), on=id_col, how="left_semi"
    )


# ---------------------------------------------------------------- shingles

def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 2,
                  out: str = "shingles") -> DataFrame:
    """Distinct word n-grams as an array column (JVM-side zip_with fold).

    Built as n-1 ``zip_with``s of the token array against its shifted
    self, NOT as ``transform(sequence, i -> slice(toks, i+1, n))``: a
    lambda that captures the token expression makes Catalyst re-inline
    (and re-evaluate) the whole regex split once PER POSITION — O(len)
    splits per row instead of O(n) — measured 5x slower on the sf0.1
    corpus across every shingle-based operator.  ``zip_with`` evaluates
    both array children exactly once per row; output strings, order, and
    the <n-token whole-text fallback are byte-identical to the old
    construction (locked by the oracle suite)."""
    toks = _tokens(text_col)
    win = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    parts = F.slice(toks, 1, win)
    for k in range(2, n + 1):
        parts = F.zip_with(parts, F.slice(toks, k, win),
                           lambda a, b: F.concat_ws(" ", a, b))
    shingles = F.array_distinct(parts)
    return df.withColumn(out, F.when(F.size(toks) >= n, shingles)
                         .otherwise(F.array(F.array_join(toks, " "))))


# ---------------------------------------------------------------- minhash

def minhash_signature(df: DataFrame, n_hashes: int = 8,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingle_n: int = 2) -> DataFrame:
    """Long format (id, seed, minhash): minhash_s = min over shingles of
    md5(seed || ':' || shingle).  Long format keeps the band join a plain
    equi-join on (seed, minhash)."""
    sh = with_shingles(df.select(id_col, text_col), text_col, n=shingle_n)
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    sig = sh.select(
        F.col(id_col),
        F.explode(seeds).alias("seed"),
        F.col("shingles"),
    ).select(
        id_col,
        "seed",
        F.array_min(
            F.transform(
                "shingles",
                lambda s: F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), s)),
            )
        ).alias("minhash"),
    )
    return sig


def minhash_band_keys(df: DataFrame, n_hashes: int = 8,
                      rows_per_band: int = 2,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingle_n: int = 2) -> DataFrame:
    """b x r LSH banding: ``n_hashes`` minhashes grouped into bands of
    ``rows_per_band`` hashes; the band key is the seed-ordered concat of the
    band's minhashes.  One row per (doc, band): (id, band, band_key)."""
    r = rows_per_band
    sig = minhash_signature(df, n_hashes, text_col, id_col, shingle_n)
    # seed-ordered concat: array_sort on struct(seed, minhash) sorts by seed
    return (
        sig.withColumn("band", F.floor(F.col("seed") / r).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"],
                ),
                "|",
            ).alias("band_key")
        )
    )


def band_census(banded: DataFrame, band_col: str = "band",
                key_col: str = "band_key") -> DataFrame:
    """Per-band candidate census for ANY (id, band, key) blocking relation
    — MinHash bands, simhash bands, embedding LSH buckets alike.  One row
    per band: ``(band, n_groups, max_group, candidate_pairs)`` with
    ``candidate_pairs`` the exact number of rows the banded self-join
    would emit for that band.  Two linear hash aggregations; run it (or
    pass ``max_candidate_pairs`` to the pair miners) before any banded
    join at a new scale — measured on a 50M-doc corpus, real text beat
    the uniform-hash collision estimate by ~4 orders of magnitude."""
    groups = banded.groupBy(band_col, key_col).count()
    return (groups.groupBy(band_col).agg(
        F.count("*").alias("n_groups"),
        F.max("count").alias("max_group"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2)
        .cast("long").alias("candidate_pairs"),
    ).orderBy(band_col))


def _enforce_candidate_budget(banded: DataFrame, budget: int,
                              band_col: str = "band",
                              key_col: str = "band_key") -> None:
    census = band_census(banded, band_col, key_col).collect()
    total = sum(r["candidate_pairs"] for r in census)
    if total > budget:
        detail = "; ".join(
            f"band {r[band_col]}: {r['candidate_pairs']:,} pairs "
            f"(max group {r['max_group']:,})" for r in census)
        raise ValueError(
            f"banded join would produce {total:,} candidate pairs "
            f"(> budget {budget:,}) — widen the band key (band_bits / "
            f"rows_per_band) or lower the radius. Census: {detail}")


def minhash_candidate_pairs(df: DataFrame, n_hashes: int = 8,
                            text_col: str = "text", id_col: str = "doc_id",
                            shingle_n: int = 2,
                            rows_per_band: int = 2,
                            max_candidate_pairs: int | None = None,
                            ) -> DataFrame:
    """LSH banding with b bands x r = ``rows_per_band`` hashes per band:
    docs are candidates iff they agree on ALL r minhashes of some band.

    r >= 2 is the scale knob (the S-curve): with r = 1 any single shared
    min-shingle (hot boilerplate) puts huge doc sets into one candidate
    clique — near-quadratic blowup at 100 TB.  Requiring a full band of r
    hashes to collide drops the per-pair candidate probability from s to
    s^r (s = true Jaccard), so hot-key cliques shrink exponentially while
    genuine near-dups (s -> 1) still collide in some band w.h.p.  The join
    stays a plain equi-join on the compact (band, band_key)."""
    banded = minhash_band_keys(df, n_hashes, rows_per_band,
                               text_col, id_col, shingle_n)
    if max_candidate_pairs is not None:
        _enforce_candidate_budget(banded, max_candidate_pairs)
    a = banded.select(F.col(id_col).alias("a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------- jaccard

def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.3,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 2,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    With ``candidates`` (e.g. from MinHash LSH) — the scale path — the
    verify NEVER touches a shingle-level join: each candidate pair joins
    the two docs' distinct-shingle arrays by id and intersects them
    JVM-side (``array_intersect``), so the cost is |candidates| x O(shingle
    set), linear-ish after LSH.  Without candidates, an inverted-index
    self-join generates all co-shingled pairs exactly — quadratic in hot
    shingles, intended for small-scale oracle verification only.
    """
    sh = with_shingles(df.select(id_col, text_col), text_col, n=shingle_n)
    if candidates is not None:
        sa = sh.select(F.col(id_col).alias("a"), F.col("shingles").alias("sa"))
        sb = sh.select(F.col(id_col).alias("b"), F.col("shingles").alias("sb"))
        pairs = candidates.join(sa, "a").join(sb, "b")
        n_inter = F.size(F.array_intersect("sa", "sb"))
        jac = n_inter / (F.size("sa") + F.size("sb") - n_inter)
        return (
            pairs.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        )
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("sh"))
    a = inv.select(F.col(id_col).alias("a"), "sh")
    b = inv.select(F.col(id_col).alias("b"), "sh")
    inter = (
        a.join(b, on="sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def edit_distance_near_dup_pairs(df: DataFrame, max_dist: int = 8,
                                 n_hashes: int = 4, rows_per_band: int = 2,
                                 shingle_n: int = 2,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 max_candidate_pairs: int | None = None,
                                 ) -> DataFrame:
    """Near-duplicate pairs verified by EXACT edit distance:
    ``(a, b, dist)`` with Levenshtein(a, b) <= ``max_dist`` among MinHash
    band candidates.

    Jaccard/SimHash treat documents as token SETS; edit distance is the
    sequence-level contract (the dedup criterion for templated spam and
    mirror pages that differ by a date stamp or a counter).  A corpus-wide
    Levenshtein join is O(n^2 * L^2) — never viable — so this composes the
    existing blocking route with a cheap exact verify:

    - candidates come from :func:`minhash_candidate_pairs` (b x r banding,
      census/budget-guarded like every other blocking route);
    - a FREE exact prefilter ``abs(len(a) - len(b)) <= max_dist`` (length
      difference lower-bounds edit distance) drops candidates before any
      DP runs;
    - ``text == text`` short-circuits exact copies to dist 0 (CASE is
      lazily evaluated per row — the dominant duplicate class never pays
      the DP);
    - the remaining pairs run Spark's THRESHOLDED Levenshtein (banded DP,
      O(max_dist * L) per pair instead of O(L^2); returns -1 above the
      threshold, which the final filter removes — result-identical to the
      full DP + ``<= max_dist`` cut an oracle replays).

    Candidate ids join back to text AFTER blocking, so full text is only
    shipped for candidate rows (the incremental_dedup survivor-join rule).
    """
    cand = minhash_candidate_pairs(df, n_hashes, text_col, id_col,
                                   shingle_n, rows_per_band,
                                   max_candidate_pairs)
    t = df.filter(F.col(text_col).isNotNull()).select(F.col(id_col),
                                                      F.col(text_col))
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


# ---------------------------------------------------------------- simhash

def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", n_bits: int = 16) -> DataFrame:
    """``n_bits``-wide SimHash from token hashes (md5 -> leading hex).

    bit_j(doc) = 1 iff sum over tokens of (+1 if bit_j(h(token)) else -1) > 0.
    Computed via explode + ONE groupBy per doc (map-side combined, n_bits
    decomposable sums — linear codegen).  ``n_bits`` is capped at 60 (15
    md5 hex chars) so the signature stays a positive int64 in BOTH engines
    and every width keeps a bit-exact DuckDB oracle; production width is
    60, 16 keeps small demos readable.  At true 64-bit width swap the token
    hash for xxhash64 — the banding/verify structure is unchanged.
    """
    if not 1 <= n_bits <= 60:
        raise ValueError("n_bits must be in [1, 60] (int64-safe, hex-aligned)")
    n_hex = (n_bits + 3) // 4
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    h = toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, n_hex), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{j}")
        for j in range(n_bits)
    ]
    agg = h.groupBy(id_col).agg(*bit_sums)
    sim = None
    for j in range(n_bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash16(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash (readable demo width; see ``simhash``)."""
    return simhash(df, text_col, id_col, n_bits=16)


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           n_bits: int = 16,
                           sig: DataFrame | None = None) -> DataFrame:
    """ALL pairs with SimHash Hamming distance <= ``max_hamming``, exactly.

    Pigeonhole banding (the standard SimHash blocking): split the signature
    into k = max_hamming + 1 disjoint bit bands; any pair within Hamming
    distance max_hamming has < k differing bits, so it agrees EXACTLY on at
    least one band.  Candidates therefore come from ONE equi-join on the
    compact (band, band_val) key — a shuffle-hash/sort-merge plan, never a
    BroadcastNestedLoopJoin — and the exact bit_count(XOR) filter keeps the
    true pairs.  Complete (no missed pairs, unlike OR-of-halves blocking,
    where max_hamming = 2 errors can split 1+1 across the halves) and
    scale-safe: each doc shuffles k rows of (band:int, band_val:long, sim).

    At 64-bit scale the structure is unchanged (k bands of 64/k bits).

    ``sig`` optionally supplies a precomputed ``(id_col, simhash)``
    relation of the SAME width — the signature aggregation is the
    expensive half, and a pipeline that mines pairs at several radii
    (e.g. near-dup report + cluster resolution) should compute and
    materialize it once rather than re-tokenizing the corpus per radius.
    """
    sim = simhash(df, text_col, id_col, n_bits=n_bits) if sig is None else sig
    k = max_hamming + 1
    if k > n_bits:
        # k bands over n_bits < k bits would include zero-width bands whose
        # band_val is 0 for EVERY doc — the equi-join degenerates into one
        # all-pairs key group (exactly the quadratic blowup this operator
        # exists to avoid)
        raise ValueError(
            f"max_hamming+1 = {k} bands need at least that many bits; "
            f"got n_bits={n_bits} — widen the signature or lower the radius")
    base, rem = divmod(n_bits, k)
    bands, start = [], 0
    for j in range(k):
        width = base + (1 if j < rem else 0)
        bands.append(
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright("simhash", start)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_val"),
            )
        )
        start += width
    exploded = sim.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*bands)).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.band_val")
    a = exploded.select(F.col(id_col).alias("a"),
                        F.col("simhash").alias("sim_a"), "band", "band_val")
    b = exploded.select(F.col(id_col).alias("b"),
                        F.col("simhash").alias("sim_b"), "band", "band_val")
    cand = (
        a.join(b, on=["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sim_a", "sim_b")
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        # a pair may collide in several bands: dedup AFTER the verify, so
        # the distinct's shuffle carries only true pairs (3 small cols),
        # not every banded candidate with its signatures — re-verifying a
        # multi-band pair costs one streamed bit_count per extra band,
        # orders cheaper than shuffling the candidate set (measured at
        # 50M: candidates outnumber true pairs ~10^4:1)
        .distinct()
    )


def simhash_bands(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", band_bits: int = 32,
                  n_bands: int = 4) -> DataFrame:
    """Wide SimHash as an ARRAY of ``n_bands`` independent ``band_bits``-
    wide band signatures — the web-scale variant of :func:`simhash`.

    WHY: banded blocking yields ~k * C(n,2) / 2^band_width random
    candidate collisions.  The int64-capped :func:`simhash` gives
    15-bit bands at radius 3 — fine at 10^5 docs, but at 50M docs that
    is ~10^11 birthday-collision pairs (measured: the probe filled a
    252 GB disk with shuffle spill before dying).  Pair mining needs
    band_width ~ log2(n) + slack; 32-bit bands keep the same corpus at
    ~10^6 random collisions — IF band values were uniform, which real
    text's boilerplate breaks by orders of magnitude: census first with
    :func:`simhash_band_stats` and size to measured entropy.

    Band j hashes tokens with its OWN disjoint hex slice of the token
    hash, so bands are independent and each stays a positive int64 — the
    bit-exact DuckDB oracle contract of :func:`simhash` survives per band,
    and hamming over the full concatenated signature is simply the SUM of
    per-band hammings.  The token hash is md5 while the bands fit its 32
    hex chars (128 bits = exactly 4 x 32 at the defaults; band 0 of the
    defaults == ``simhash(n_bits=32)`` exactly — locked by test) and
    switches to sha2-256 (64 hex chars) beyond that, which is what lets
    radius-3 mining use 60-bit bands (4 x 15 hex = 60 chars): see the
    measured entropy-collapse note on
    :func:`simhash_bands_near_dup_pairs`.

    Plan: one explode + ONE groupBy(id) carrying n_bands*band_bits
    decomposable +/-1 sums (map-side combined, skew-safe); the shuffle
    rows are final-sized partials (id + sums), never token rows.
    """
    if not 1 <= band_bits <= 60:
        raise ValueError("band_bits must be in [1, 60] (int64-safe)")
    hex_per_band = (band_bits + 3) // 4
    if n_bands * hex_per_band > 64:
        raise ValueError(
            f"{n_bands} bands x {hex_per_band} hex chars exceed sha2-256's "
            f"64 hex chars — lower band_bits or n_bands")
    toks = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    if n_bands * hex_per_band <= 32:
        toks = toks.withColumn("hx", F.md5("tok"))
    else:
        toks = toks.withColumn("hx", F.sha2("tok", 256))
    band_hash = [
        F.conv(F.substring("hx", 1 + j * hex_per_band, hex_per_band), 16, 10)
        .cast("long").alias(f"h{j}")
        for j in range(n_bands)
    ]
    h = toks.select(id_col, *band_hash)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col(f"h{j}"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{j}_{i}")
        for j in range(n_bands) for i in range(band_bits)
    ]
    agg = h.groupBy(id_col).agg(*bit_sums)
    sigs = []
    for j in range(n_bands):
        band = None
        for i in range(band_bits):
            term = F.when(F.col(f"s{j}_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            band = term if band is None else band + term
        sigs.append(band.cast("long"))
    return agg.select(F.col(id_col), F.array(*sigs).alias("sig"))


def simhash_band_stats(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-band candidate-pair census for a :func:`simhash_bands` relation
    — the linear-cost pre-flight that sizes the banded join BEFORE running
    it.

    Returns one row per band: ``(band, n_groups, max_group,
    candidate_pairs)`` where ``candidate_pairs = sum over band values of
    C(group_size, 2)`` — exactly the number of join-output rows that band
    will contribute (before the cross-band distinct).

    WHY THIS EXISTS (measured, 2026-08-18): birthday math says 32-bit
    bands at 50M docs yield ~10^6 random collisions per band.  On the
    templated heavy-mix corpus the MEASURED census was ~1.7e10 pairs per
    hot band at a 10% sample (max group 77k docs sharing one band value,
    with 49,998,259 of 50M FULL signatures distinct) — uniform-hash math
    underestimates real text by ~4 orders of magnitude, because
    boilerplate collapses the entropy of a simhash band far below its
    width.  The census is two hash aggregations over the signature
    relation (linear, map-side combined); the join it sizes is
    potentially quadratic.  Always run it at a new scale or on a new
    corpus before :func:`simhash_bands_near_dup_pairs`, or pass
    ``max_candidate_pairs`` there to have it enforced.
    """
    return band_census(
        sig.select(F.posexplode("sig").alias("band", "band_val")),
        band_col="band", key_col="band_val")


def simhash_bands_near_dup_pairs(df: DataFrame, max_hamming: int = 3,
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 band_bits: int = 32, n_bands: int = 4,
                                 sig: DataFrame | None = None,
                                 max_candidate_pairs: int | None = None,
                                 ) -> DataFrame:
    """ALL pairs within Hamming distance ``max_hamming`` over the
    ``n_bands * band_bits``-bit wide signature, exactly — the structure of
    :func:`simhash_near_dup_pairs` with the band boundaries already
    materialized as array elements (no shifting), so band width no longer
    fights the int64 signature cap: radius 3 gets 32-bit bands instead of
    15-bit ones, which is the difference between ~10^6 and ~10^11
    birthday-collision candidates at 50M docs.

    Pigeonhole over array positions: <= max_hamming differing bits touch
    <= max_hamming bands, so with n_bands >= max_hamming + 1 every true
    pair agrees exactly on some band.  Candidates come from ONE equi-join
    on (band_idx, band_val); the exact verify sums bit_count(xor) across
    the zipped arrays.

    SIZE THE BANDS TO MEASURED ENTROPY, NOT log2(n): on low-entropy
    (templated/boilerplate-heavy) text, band values cluster far more than
    the uniform-hash birthday estimate — a measured 50M-doc census found
    ~10^12 candidates at 32-bit bands where the math predicted ~10^6
    (see :func:`simhash_band_stats`).  Pass ``max_candidate_pairs`` to
    run that census first (one extra linear pass over the signatures;
    the signature relation should be persisted/stored when you do) and
    fail fast with the per-band numbers instead of launching a join that
    can shuffle for days; widen ``band_bits`` (sha2-256 slicing allows
    4 x 60 bits) or lower ``max_hamming`` until the census fits.
    """
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"completeness needs n_bands >= max_hamming+1; "
            f"got n_bands={n_bands}, max_hamming={max_hamming}")
    s = (simhash_bands(df, text_col, id_col, band_bits, n_bands)
         if sig is None else sig)
    if max_candidate_pairs is not None:
        _enforce_candidate_budget(
            s.select(F.posexplode("sig").alias("band", "band_val")),
            max_candidate_pairs, band_col="band", key_col="band_val")
    exploded = s.select(
        F.col(id_col), F.col("sig"),
        F.posexplode("sig").alias("band", "band_val"),
    )
    a = exploded.select(F.col(id_col).alias("a"),
                        F.col("sig").alias("sig_a"), "band", "band_val")
    b = exploded.select(F.col(id_col).alias("b"),
                        F.col("sig").alias("sig_b"), "band", "band_val")
    cand = (
        a.join(b, on=["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
    )
    per_band = F.zip_with(
        "sig_a", "sig_b",
        lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"))
    hamming = F.aggregate(per_band, F.lit(0).cast("long"),
                          lambda acc, x: acc + x)
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        # dedup multi-band collisions AFTER the verify: the distinct then
        # shuffles only true pairs (3 small cols) instead of every banded
        # candidate with both signature arrays — see the int64 variant
        .distinct()
    )


# ------------------------------------------- corpus-level chunk dedup

def dedup_chunks(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", chunk_words: int = 20) -> DataFrame:
    """Corpus-level exact duplicate-chunk removal (ExactSubstr-lite,
    after Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better", which removes repeated 50-token substrings; here the
    unit is a fixed non-overlapping window of ``chunk_words`` words, the
    distributed-friendly approximation that needs no suffix array).

    Every document is cut into word chunks; for each distinct chunk the
    single first occurrence corpus-wide (ordered by ``(doc_id, pos)``)
    survives, every later occurrence — within the same doc or another —
    is dropped; surviving chunks are stitched back per document.

    Plan shape, chosen for 100 TB: the first-occurrence-per-chunk step is
    ``groupBy(chunk).agg(min(struct(id, pos)))`` — a hash aggregation
    with map-side partial combine, so a boilerplate chunk repeated 10^6
    times collapses to one row per map task before the shuffle (a
    window ``row_number() over (partition by chunk)`` would instead sort
    and ship every occurrence of the hot chunk to one reducer).  The
    rebuild is a second hash agg on the id.  Two shuffles total, both on
    compact keys.  Docs whose every chunk is a later duplicate vanish
    (their text would be empty), matching the oracle.
    """
    k = int(chunk_words)
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = F.expr(
        f"transform(sequence(0, (size(w) - 1) div {k}), "
        f"i -> array_join(slice(w, i * {k} + 1, {k}), ' '))")
    occ = (df.select(F.col(id_col), w.alias("w"))
             .filter(F.size("w") > 0)
             .select(id_col, F.posexplode(chunks).alias("pos", "chunk")))
    firsts = (occ.groupBy("chunk")
                 .agg(F.min(F.struct(id_col, "pos")).alias("first_occ"))
                 .select(F.col(f"first_occ.{id_col}").alias(id_col),
                         F.col("first_occ.pos").alias("pos"),
                         "chunk"))
    return (firsts.groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s["chunk"]),
                " ").alias("clean_text")))


def dedup_spans(df: DataFrame, sents_col: str = "sentences",
                id_col: str = "doc_id", span: int = 3,
                out_delim: str = "\n") -> DataFrame:
    """C4-style cross-document span dedup (Raffel et al. 2020 §2.2:
    "we discard all but one of any three-sentence span occurring more
    than once in the data set").  Input is a document with a
    ``sents_col`` array<string> column — the sentence-splitting policy
    stays with the caller — and the unit of removal is the SENTENCE:
    every overlapping ``span``-sentence window is keyed, the single
    first occurrence corpus-wide (ordered by ``(doc_id, pos)``) keeps
    its sentences, and every sentence covered by a LATER occurrence of
    a repeated span is dropped from its document.  Documents whose
    every sentence is covered vanish (same contract as
    :func:`dedup_chunks`); documents with fewer than ``span`` sentences
    emit no windows and survive whole.

    Span keys are 63-bit integers (first 15 md5 hex chars of the
    chr(31)-joined window) so the shuffle ships 8-byte keys — never the
    sentence text — and DuckDB can reproduce the exact hash; at cluster
    scale swap in xxhash64 unchanged.

    Plan shape, chosen for 100 TB: first-occurrence is
    ``groupBy(span_h).agg(min(struct), count)`` — hash agg with
    map-side combine, so a boilerplate span repeated 10^8 times
    collapses to one row per map task (never a window sort over the hot
    key).  Only spans with ``count > 1`` re-join the occurrence
    relation (an equi-join on the 8-byte key; in a mostly-unique corpus
    the duplicated-span side is small enough for AQE to broadcast).
    The covered-sentence explode is ≤ ``span`` rows per duplicate
    occurrence, distinct on compact ``(id, pos)`` pairs, then a
    left-anti join and one hash agg rebuilds each doc.  No step ships
    sentence text except the final rebuild of surviving rows.
    """
    k = int(span)
    s = F.col(sents_col)
    span_h = F.when(
        F.size(s) >= k,
        F.expr(
            f"transform(sequence(0, size({sents_col}) - {k}), "
            f"i -> cast(conv(substring(md5(array_join("
            f"slice({sents_col}, i + 1, {k}), char(31))), 1, 15), 16, 10) "
            f"as long))"),
    ).otherwise(F.expr("array()").cast("array<long>"))
    occ = df.select(F.col(id_col), F.posexplode(span_h).alias("pos", "span_h"))
    firsts = (occ.groupBy("span_h")
                 .agg(F.min(F.struct(id_col, "pos")).alias("first_occ"),
                      F.count("*").alias("cnt")))
    dup_occ = (occ.join(firsts.filter(F.col("cnt") > 1)
                        .select("span_h", "first_occ"), "span_h")
                  .filter(~((F.col(id_col) == F.col(f"first_occ.{id_col}"))
                            & (F.col("pos") == F.col("first_occ.pos")))))
    covered = (dup_occ
               .select(F.col(id_col),
                       F.explode(F.sequence(F.col("pos"),
                                            F.col("pos") + (k - 1)))
                        .alias("sent_pos"))
               .distinct())
    sents = df.select(F.col(id_col),
                      F.posexplode(s).alias("sent_pos", "sentence"))
    kept = sents.join(covered, [id_col, "sent_pos"], "left_anti")
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_pos",
                                                         "sentence"))),
                    lambda x: x["sentence"]),
                out_delim).alias("clean_text")))


def dedup_paragraphs(df: DataFrame, paras_col: str = "paragraphs",
                     id_col: str = "doc_id",
                     out_delim: str = "\n") -> DataFrame:
    """Corpus-level exact paragraph dedup (the Dolma / RedPajama-v2
    recipe: drop every later occurrence of any paragraph seen anywhere
    in the corpus, keeping the single first occurrence ordered by
    ``(doc_id, pos)`` — boilerplate like subscription footers vanishes
    from all but one document, and within-document repeats collapse
    too).  Input is a ``paras_col`` array<string> column — the
    paragraph-splitting policy stays with the caller, same contract as
    :func:`dedup_spans`.  Documents whose every paragraph is a later
    duplicate vanish from the output.

    Differs from :func:`dedup_chunks` (fixed word windows — catches
    near-boundary-shifted repeats) and :func:`dedup_spans` (overlapping
    sentence windows, C4): the unit here is the NATURAL paragraph, so
    surviving documents keep their original paragraph boundaries intact.

    Plan shape, chosen for 100 TB: occurrences are keyed by a 63-bit
    md5 slice so the first-occurrence step —
    ``groupBy(para_h).agg(min(struct(id, pos)))``, a hash agg with
    map-side partial combine — shuffles 8-byte keys, never paragraph
    text; a footer repeated 10^8 times collapses to one row per map
    task.  Paragraph text is shipped exactly once, in the left-semi
    join that selects surviving ``(id, pos)`` rows for the final
    per-document rebuild.  Two shuffles + one equi-join, all on compact
    keys.
    """
    p = F.col(paras_col)
    occ = df.select(F.col(id_col), F.posexplode(p).alias("pos", "para")) \
            .withColumn("para_h",
                        F.conv(F.substring(F.md5("para"), 1, 15), 16, 10)
                         .cast("long"))
    firsts = (occ.groupBy("para_h")
                 .agg(F.min(F.struct(id_col, "pos")).alias("first_occ"))
                 .select(F.col(f"first_occ.{id_col}").alias(id_col),
                         F.col("first_occ.pos").alias("pos")))
    kept = occ.join(firsts, [id_col, "pos"], "left_semi")
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda x: x["para"]),
                out_delim).alias("clean_text")))


# ------------------------------------------------- benchmark decontamination

def duplicated_gram_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 8,
                          keep_first: bool = True) -> DataFrame:
    """Maximal duplicated-substring spans — full ExactSubstr semantics
    (Lee et al. 2022 §4: remove every substring of ≥50 tokens that
    occurs more than once in the corpus), WITHOUT the suffix array.

    The suffix-array-free identity this rests on: a token run of length
    L ≥ k is duplicated iff all of its L−k+1 overlapping k-grams are
    duplicated at consecutive positions, and conversely every position
    covered by a duplicated k-gram lies inside a duplicated run of
    ≥ k tokens.  So mining duplicated k-gram START positions and merging
    runs whose gram-start gap ≤ k (intervals ``[pos, pos+k)`` overlap or
    touch) reconstructs EXACTLY the maximal duplicated spans at
    threshold k — no approximation, unlike :func:`dedup_chunks`' fixed
    non-overlapping windows which miss duplicates that straddle a chunk
    boundary or start mid-chunk.

    With ``keep_first`` the corpus-wide first occurrence of each gram
    (min ``struct(id, pos)``, the convention shared with
    :func:`dedup_chunks` / :func:`dedup_spans`) is exempt, so one copy
    of every duplicated passage survives; the emitted spans are the
    REMOVABLE ones.  Returns one row per maximal span:
    ``(id, span_start, span_end, span_len, n_grams)`` — token offsets,
    inclusive; callers slice or mask their token arrays with them.

    Plan shape, chosen for 100 TB: grams are 63-bit ints (first 15 md5
    hex chars — DuckDB-reproducible; swap xxhash64 at cluster scale)
    built JVM-side by ``transform``/``slice`` inside the scan's codegen
    stage.  Duplicate detection is ``groupBy(gram).agg(min(struct),
    count)`` — hash agg, map-side combined, so a boilerplate gram
    repeated 10^8 times collapses per map task (never a window over the
    hot gram).  Only grams with ``count ≥ 2`` re-join the occurrences
    (equi-join on the 8-byte key; the duplicated side of a mostly-unique
    corpus is small enough for AQE to broadcast).  The interval merge IS
    a window, but partitioned by ``id`` and ordered by ``pos`` — per-doc
    state bounded by doc length, the one axis that does not grow with
    corpus size.
    """
    kk = int(k)
    if kk < 2:
        raise ValueError("k must be >= 2 (a 1-gram span is just a token)")
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    gram_h = F.expr(
        f"transform(sequence(0, size(w) - {kk}), "
        f"i -> cast(conv(substring(md5(array_join(slice(w, i + 1, {kk}), "
        f"' ')), 1, 15), 16, 10) as long))")
    occ = (df.select(F.col(id_col), w.alias("w"))
             .filter(F.size("w") >= kk)
             .select(id_col, F.posexplode(gram_h).alias("pos", "g")))
    dup = (occ.groupBy("g")
              .agg(F.min(F.struct(id_col, "pos")).alias("first_occ"),
                   F.count("*").alias("cnt"))
              .filter(F.col("cnt") >= 2)
              .select("g", "first_occ"))
    covered = occ.join(dup, "g")
    if keep_first:
        covered = covered.filter(
            ~((F.col(id_col) == F.col(f"first_occ.{id_col}"))
              & (F.col("pos") == F.col("first_occ.pos"))))
    win = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(win)
    islands = (covered.select(id_col, "pos")
               .withColumn("brk", F.when(prev.isNull()
                                         | (F.col("pos") > prev + kk),
                                         1).otherwise(0))
               .withColumn("island", F.sum("brk").over(win)))
    return (islands.groupBy(id_col, "island")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + (kk - 1)).cast("long").alias("span_end"),
                 F.count("*").alias("n_grams"))
            .withColumn("span_len",
                        F.col("span_end") - F.col("span_start") + 1)
            .select(id_col, "span_start", "span_end", "span_len", "n_grams"))


def remove_spans(df: DataFrame, spans: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 out_col: str = "clean_text") -> DataFrame:
    """Apply :func:`duplicated_gram_spans` output back onto the corpus —
    the cut stage of the ExactSubstr pipeline (Lee et al. 2022 §4 drop
    the duplicated bytes; here the unit is the token).  Tokens whose
    position falls inside any of the doc's ``[span_start, span_end]``
    intervals are dropped; the rest re-join in order.  Docs with no
    spans pass through unchanged; docs fully covered emit an empty
    string (callers typically filter those).

    Plan shape, chosen for 100 TB: spans collapse to ONE array per doc
    (``groupBy(id).collect_list`` — bounded by doc length / k, tiny),
    LEFT-join onto the corpus by id, and the cut itself is a JVM
    ``filter(transform(tokens, (t,i) -> ...), NOT exists(cuts, ...))``
    inside codegen — token text never shuffles, only the compact span
    intervals do.  The spans side of the join is ≤ one row per doc and
    in a mostly-clean corpus far fewer, so AQE broadcasts it.
    """
    cuts = (spans.groupBy(id_col)
            .agg(F.collect_list(
                F.struct(F.col("span_start").alias("s"),
                         F.col("span_end").alias("e"))).alias("cuts")))
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        F.transform(w, lambda t, i: F.struct(t.alias("t"),
                                             i.cast("long").alias("i"))),
        lambda x: ~F.exists(
            "cuts", lambda c: (x["i"] >= c["s"]) & (x["i"] <= c["e"])),
    )
    return (df.join(cuts, id_col, "left")
            .withColumn(
                out_col,
                F.when(F.col("cuts").isNull(), F.trim(F.col(text_col)))
                 .otherwise(F.array_join(
                     F.transform(kept, lambda x: x["t"]), " ")))
            .drop("cuts"))


def contamination_check(train_df: DataFrame, bench_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with a held-out benchmark set (the PaLM / GPT-3
    recipe — Chowdhery et al. 2022 §App. C uses 8-gram overlap).

    Returns ``(id, n_shared)`` for contaminated training docs, where
    ``n_shared`` counts DISTINCT shared n-grams.  N-grams are joined as
    63-bit integers (first 15 md5 hex chars) so the shuffle ships 8-byte
    keys, never 8-word strings, and the oracle can reproduce the exact
    hash in DuckDB; at cluster scale swap in xxhash64 unchanged.

    Plan: both sides explode to (id, gram_h), dedup per side (map-side
    partial agg), equi-join on gram_h, count per train doc.  The
    benchmark side is typically ~1e4 docs; at that size Spark/AQE will
    broadcast it after the distinct — no sort-merge on the big side.
    """
    def grams(d: DataFrame) -> DataFrame:
        w = F.split(F.trim(F.col(text_col)), r"\s+")
        g = F.expr(
            f"transform(sequence(0, size(w) - {n}), "
            f"i -> conv(substring(md5(array_join(slice(w, i + 1, {n}), ' ')), "
            f"1, 15), 16, 10))")
        return (d.select(F.col(id_col), w.alias("w"))
                  .filter(F.size("w") >= n)
                  .select(id_col, F.explode(g).alias("gram_s"))
                  .select(id_col, F.col("gram_s").cast("long").alias("gram_h")))

    train_g = grams(train_df).distinct()
    bench_g = grams(bench_df).select("gram_h").distinct()
    return (train_g.join(bench_g, "gram_h", "inner")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_shared")))


def containment_pairs(df: DataFrame, threshold: float = 0.7,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingle_n: int = 2, min_df: int = 2,
                      max_df: int = 50,
                      max_candidate_pairs: int | None = None) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: ``(a, b, c_ab, c_ba,
    n_inter)`` where ``c_ab = |sh(a) & sh(b)| / |sh(a)|`` and the pair
    survives if EITHER direction reaches ``threshold``.

    Jaccard misses subset relations by construction: a short doc fully
    quoted inside a long one has ``|A&B|/|A|B|| ~ |A|/|B| -> 0`` while
    its containment is 1.0 — exactly the partial-mirror / quote-farm /
    excerpt class a dedup pipeline wants to catch.  MinHash banding
    inherits Jaccard's blindness (band collision probability ~ s^r), so
    the blocking route here is different: a RARE-SHINGLE inverted index.
    Two docs become candidates iff they share at least one shingle with
    document frequency in ``[min_df, max_df]`` — a contained doc shares
    ALL its shingles with its container, so any of its non-hot shingles
    blocks the pair (misses only docs composed ENTIRELY of
    boilerplate-frequency shingles, the documented recall edge).  df
    capping bounds the self-join exactly as in sparse_sim: a shingle
    with frequency f fans out f*(f-1)/2 candidates, so hot shingles are
    pruned before the join and the volume is census-measurable
    (``max_candidate_pairs`` fail-fast, same guard as every blocking
    route).  The verify is exact set arithmetic (``array_intersect``)
    on candidate rows only; both directions come from the one
    intersection.
    """
    sh = with_shingles(df.filter(F.col(text_col).isNotNull())
                       .select(id_col, text_col), text_col, n=shingle_n)
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("s"))
    rare = (inv.groupBy("s").agg(F.count("*").cast("long").alias("df"))
            .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
            .select("s"))
    blocked = inv.join(F.broadcast(rare), "s")
    if max_candidate_pairs is not None:
        _enforce_candidate_budget(blocked.withColumn("band", F.lit(0)),
                                  max_candidate_pairs, "band", "s")
    cand = (blocked.select(F.col(id_col).alias("a"), "s")
            .join(blocked.select(F.col(id_col).alias("b"), "s"), "s")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    sa = sh.select(F.col(id_col).alias("a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col(id_col).alias("b"), F.col("shingles").alias("sb"))
    pairs = cand.join(sa, "a").join(sb, "b")
    n_inter = F.size(F.array_intersect("sa", "sb"))
    c_ab = F.round(n_inter / F.size("sa"), 6)
    c_ba = F.round(n_inter / F.size("sb"), 6)
    return (pairs.select("a", "b", c_ab.alias("c_ab"), c_ba.alias("c_ba"),
                         n_inter.cast("long").alias("n_inter"))
            .filter((F.col("c_ab") >= threshold)
                    | (F.col("c_ba") >= threshold)))


def fuzzy_contamination(train: DataFrame, bench: DataFrame,
                        threshold: float = 0.2, n_hashes: int = 4,
                        rows_per_band: int = 2, shingle_n: int = 2,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_candidate_pairs: int | None = None) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: ``(train_id, bench_id,
    jaccard)`` for every training doc whose shingle-Jaccard with some
    benchmark doc reaches ``threshold`` — the auditable leak report.

    :func:`contamination_check` catches EXACT n-gram overlap (the PaLM
    recipe); a paraphrased or lightly-edited benchmark item slips it.
    This is the fuzzy tier (the Dolma/llm-foundry recipe): MinHash band
    keys on BOTH relations, candidates = one equi-join on
    ``(band, band_key)`` across them (never within — train-train dups
    are dedup's job, not decontamination's), exact Jaccard verify on
    candidates only.  The benchmark side is tiny by definition, so its
    banded relation broadcasts and the training corpus never shuffles
    on text; with a persisted corpus index (operators/incremental.py)
    the train side's signatures are already on disk.

    ``max_candidate_pairs`` fail-fast guards the CROSS-relation census:
    per (band, band_key) the join emits n_train * n_bench rows, measured
    before the join (same contract as every blocking route).
    """
    tb = minhash_band_keys(train.select(id_col, text_col), n_hashes,
                           rows_per_band, text_col, id_col, shingle_n)
    bb = minhash_band_keys(bench.select(id_col, text_col), n_hashes,
                           rows_per_band, text_col, id_col, shingle_n)
    if max_candidate_pairs is not None:
        gt = tb.groupBy("band", "band_key").agg(F.count("*").alias("ct"))
        gb = bb.groupBy("band", "band_key").agg(F.count("*").alias("cb"))
        total = (gt.join(gb, ["band", "band_key"])
                 .agg(F.sum(F.col("ct") * F.col("cb"))).collect()[0][0]) or 0
        if total > max_candidate_pairs:
            raise ValueError(
                f"cross-relation banded join would produce {total:,} "
                f"candidate pairs (> budget {max_candidate_pairs:,}) — "
                "widen the band key or shrink the benchmark slice")
    cand = (tb.select(F.col(id_col).alias("train_id"), "band", "band_key")
            .join(F.broadcast(
                bb.select(F.col(id_col).alias("bench_id"), "band",
                          "band_key")),
                on=["band", "band_key"])
            .select("train_id", "bench_id").distinct())
    st = (with_shingles(train.select(id_col, text_col), text_col,
                        n=shingle_n)
          .select(F.col(id_col).alias("train_id"),
                  F.col("shingles").alias("st")))
    sb = (with_shingles(bench.select(id_col, text_col), text_col,
                        n=shingle_n)
          .select(F.col(id_col).alias("bench_id"),
                  F.col("shingles").alias("sb")))
    pairs = cand.join(st, "train_id").join(F.broadcast(sb), "bench_id")
    n_inter = F.size(F.array_intersect("st", "sb"))
    jac = n_inter / (F.size("st") + F.size("sb") - n_inter)
    return (pairs.select("train_id", "bench_id",
                         F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def remove_frequent_sentences(df: DataFrame, sents_col: str = "sentences",
                              id_col: str = "doc_id",
                              group_col: str | None = None,
                              max_doc_freq: int = 2,
                              out_delim: str = " ") -> DataFrame:
    """Frequency-threshold boilerplate removal (the CCNet / RefinedWeb
    line-dedup recipe): a sentence appearing in MORE THAN
    ``max_doc_freq`` DISTINCT documents — within its ``group_col``
    slice (publisher / domain) when given, else corpus-wide — is
    boilerplate and is removed from EVERY document, including the
    first.  Complements the first-occurrence keepers
    (:func:`dedup_paragraphs` keeps exactly one copy of a footer; this
    keeps zero): navigation chrome, cookie banners and subscription
    prompts carry no training signal in ANY document, and keeping "the
    first" of them is an artifact of the keeper convention, not a
    curation decision.

    Input contract matches :func:`dedup_paragraphs`: ``sents_col`` is
    an array<string> (the segmentation policy stays with the caller —
    compose with ``operators/sentences.py::split_sentences`` or a line
    split).  Returns ``(id_col, clean_text, n_kept)``; documents whose
    every sentence is boilerplate vanish.

    Sentences are compared normalized (``lower(trim(s))``) and keyed by
    a 63-bit md5 slice, so the doc-frequency agg —
    ``groupBy(key).agg(countDistinct(id))``, a hash agg with map-side
    partial distinct — ships 8-byte keys, never text (a banner repeated
    10^8 times collapses per map task).  By Zipf the over-threshold key
    set is tiny (hard bound: total_sentences / max_doc_freq keys, in
    practice orders less), so AQE broadcasts it into the left-anti join
    and the corpus rides through unshuffled; sentence text moves only
    in the final per-doc rebuild agg.  Same two-shuffle shape as
    dedup_paragraphs.

    Reference analog: none — the reference dedups whole articles via
    the seen-URL cache only (src/cache/mod.rs); sentence-frequency
    cleanup is engine-new (training-data scope).
    """
    keys = [group_col] if group_col else []
    occ = (df.select(F.col(id_col), *[F.col(k) for k in keys],
                     F.posexplode(F.col(sents_col)).alias("pos", "sent"))
             .withColumn(
                 "sent_h",
                 F.conv(F.substring(F.md5(F.lower(F.trim("sent"))), 1, 15),
                        16, 10).cast("long")))
    hot = (occ.groupBy(*keys, "sent_h")
              .agg(F.countDistinct(id_col).alias("doc_freq"))
              .filter(F.col("doc_freq") > int(max_doc_freq))
              .select(*keys, "sent_h"))
    kept = occ.join(hot, [*keys, "sent_h"], "left_anti")
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("pos",
                                                              "sent"))),
                         lambda x: x["sent"]),
                     out_delim).alias("clean_text"),
                 F.count(F.lit(1)).alias("n_kept")))
