"""Full-text ranked search: inverted index + BM25 scoring (engine-new;
scales the reference's LIKE-substring search, src/cache/local/mod.rs P10,
from a per-row scan to an index-backed ranked query).

Plan shape, chosen for 100 TB:

- the inverted index is two hash aggregations with map-side combine —
  postings ``(term, doc_id, tf)`` and the dictionary ``(term, df)``;
  hot stopword terms collapse per map task before the shuffle;
- ad-hoc search never builds the full index: the term filter sits
  directly under the explode, so only the query's terms survive into the
  aggregation (predicate on the generator output — Catalyst keeps it in
  the same stage, nothing else is shuffled);
- corpus scalars (N, avgdl) ride as a broadcast ONE-ROW aggregate inside
  the plan — no eager driver collect at DataFrame-construction time;
- the per-document score folds term contributions in TERM ORDER via
  ``sort_array`` + ``aggregate`` so the doubles add in the same sequence
  on every engine — the same determinism contract as lm_score.py;
- top-k is ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrderedAndProject — per-partition heaps, no global sort.

A persistent search service would materialize ``build_inverted_index``
once (partitioned by term) and score many queries against it; BM25
constants follow Robertson/Sparck-Jones with the Lucene +1 idf floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def build_inverted_index(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Postings table ``(term, doc_id, tf)`` — the reusable index artifact.

    One explode + one hash aggregation on the compact (term, id) key;
    write it partitioned/bucketed by term so a query's lookup is a
    partition-pruned scan."""
    return (df.select(F.col(id_col), F.explode(_terms(text_col)).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term", id_col)
            .agg(F.count("*").cast("long").alias("tf")))


def doc_lengths(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, dl)`` — token count per document (JVM size/filter)."""
    toks = _terms(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda t: t != "")).cast("long").alias("dl"))


def bm25_search(df: DataFrame, query_terms: list[str], top_n: int = 10,
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``top_n`` documents by BM25 for a bag-of-words query.

    score(d) = sum over matched query terms t of
        idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene floor).

    Deterministic across engines: contributions fold in term order, the
    score is rounded to 6 digits, ties break on ``id_col``.  Returns
    ``(id_col, n_matched, score)``.
    """
    docs = df.filter(F.col(text_col).isNotNull())
    # corpus scalars (N, avgdl) stay IN the plan as a broadcast one-row
    # aggregate — an eager collect here would scan the whole corpus at
    # DataFrame-construction time (the _n_docs_agg rule, text_analysis.py).
    # A lit-key equi-join (not crossJoin) keeps it a BroadcastHashJoin.
    # the key must be COMPUTED from data ((cnt>=0) is always 1) — a lit(1)
    # key gets folded by FoldablePropagation into `1=1`, degrading the
    # equi-join back into a BroadcastNestedLoopJoin
    stats = (doc_lengths(docs, text_col, id_col)
             .agg(F.count("*").alias("cnt"), F.sum("dl").alias("s"))
             .select((F.col("cnt") >= 0).cast("int").alias("_k"), "cnt", "s"))

    terms = sorted({t.lower() for t in query_terms if t})
    # dl rides along through the explode (max-agg) — a big-big join of
    # postings against doc_lengths would shuffle the whole corpus twice
    toks = F.filter(_terms(text_col), lambda t: t != "")
    postings = (docs.select(F.col(id_col), F.size(toks).cast("long").alias("dl"),
                            F.explode(toks).alias("term"))
                .filter(F.col("term").isin(terms))
                .groupBy("term", id_col)
                .agg(F.count("*").cast("long").alias("tf"),
                     F.max("dl").alias("dl")))
    dictionary = (postings.groupBy("term")
                  .agg(F.count("*").cast("long").alias("df")))

    n_d = F.col("cnt").cast("double")
    avgdl = F.col("s").cast("double") / F.col("cnt")
    idf = F.log(F.lit(1.0) + (n_d - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    contrib = (idf * (tf * F.lit(k1 + 1.0))
               / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                    + F.lit(b) * dl_d / avgdl)))
    # the one-row stats attach to the tiny dictionary first, so the big
    # postings path sees exactly ONE broadcast hash join (on term)
    dict_stats = (dictionary
                  .withColumn("_k", (F.col("df") >= 0).cast("int"))
                  .join(F.broadcast(stats), "_k").drop("_k"))
    scored = (postings
              .join(F.broadcast(dict_stats), "term")
              .select(F.col(id_col), F.col("term"), contrib.alias("c")))
    folded = (scored.groupBy(id_col)
              .agg(F.sort_array(F.collect_list(F.struct("term", "c")))
                   .alias("seq")))
    total = F.aggregate(F.col("seq"), F.lit(0.0), lambda acc, s: acc + s["c"])
    out = folded.select(
        F.col(id_col),
        F.size("seq").cast("long").alias("n_matched"),
        F.round(total, 6).alias("score"))
    return out.orderBy(F.desc("score"), F.col(id_col)).limit(top_n)


def rrf_fusion(rankings: list[DataFrame], k: int = 60,
               id_col: str = "id", score_col: str = "score",
               top_n: int = 20) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists: ``(id, rrf_score, n_lists)`` with
    ``rrf_score = sum over lists of 1 / (k + rank)``.

    The hybrid-retrieval primitive: a lexical ranking (BM25) and a dense
    ranking (embedding cosine) disagree on scale and calibration, so
    fusing SCORES is meaningless — RRF fuses RANKS, which are
    scale-free.  ``k`` damps the head (k=60 is the paper's constant).

    Scale contract: each input must already be a TOP-N-BOUNDED list
    (the output of bm25_search / cosine_topk — both end in a global
    top-n).  Ranks are then assigned with a single-partition window,
    which is O(top_n) rows by construction — constant at any corpus
    scale, NOT a corpus-sized sort.  Ties rank by (score desc, id asc),
    the same determinism rule every top-k in this repo uses.  The fused
    sum has <= N addends per id (N = number of lists, 2-5 in practice),
    so double addition is order-safe for N=2 and rounded to 9 digits
    regardless.
    """
    from pyspark.sql.window import Window

    contribs = []
    for r in rankings:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        contribs.append(
            r.select(id_col, score_col)
            .withColumn("rnk", F.row_number().over(w))
            .select(F.col(id_col),
                    (F.lit(1.0) / (F.lit(float(k)) + F.col("rnk")))
                    .alias("c")))
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return (u.groupBy(id_col)
            .agg(F.round(F.sum("c"), 9).alias("rrf_score"),
                 F.count("*").cast("long").alias("n_lists"))
            .orderBy(F.desc("rrf_score"), F.col(id_col))
            .limit(top_n))
