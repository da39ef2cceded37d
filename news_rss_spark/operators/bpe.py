"""Byte-pair-encoding tokenizer training + application (engine-new,
training-data pipeline; Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units").

The Spark-first decomposition — what makes BPE tractable at 100 TB:

- **Corpus-sized work happens ONCE**: a single whitespace word-count
  aggregation (map-side combined).  Everything iterative runs on the
  DISTINCT-WORD relation — vocabulary-sized (say 10^6-10^7 rows),
  orders of magnitude below the corpus, exactly the classic BPE trainer
  trick of operating on word frequencies.
- **Each merge iteration is one hash aggregation** over the exploded
  adjacent-symbol pairs of the vocab relation (weighted by word count),
  plus a 1-row driver argmax — the same driver-scalar-per-iteration
  shape as PageRank's dangling mass and k-means' centroid update.
- **The merge pass is a JVM expression**: ``aggregate()`` with an
  array accumulator folds a symbol array left-to-right, joining the
  chosen pair — no Python in the loop.  The vocab relation is
  ``localCheckpoint``-ed per iteration (like the CC fixpoint) so Spark
  replays k small plans, not one k-deep lazy tower.
- **Application re-uses word de-duplication**: encode each DISTINCT
  word once (Arrow-batched pandas UDF replaying the merge ranks — the
  standard greedy lowest-rank-first encoder), then a broadcast join
  maps corpus tokens to their encodings.  A 100 TB corpus repeats its
  words endlessly; the encode cost is vocabulary-sized.

Determinism contract: merge choice ties break on (count DESC, left ASC,
right ASC) — fully ordered, so the merge table is a pure function of the
corpus.  The trainer is pytest-locked against a from-scratch pure-Python
reference implementation; the first-iteration pair-count relation is
SQL-expressible and driver-oracled (`bpe_pair_counts`).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"  # end-of-word marker, per the original recipe


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The ONE corpus-sized pass: lowercased whitespace word counts.
    Output: ``(word, n)`` — the vocabulary relation every training
    iteration runs on."""
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (docs.filter(F.col(text_col).isNotNull())
            .select(F.explode(w).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("n")))


def with_symbols(words: DataFrame) -> DataFrame:
    """Initial symbol decomposition: one array element per character plus
    the ``</w>`` end marker (pure JVM split)."""
    syms = F.concat(
        # split on every inter-char position; the zero-width match at the
        # END also fires and Spark's default limit=-1 KEEPS the resulting
        # trailing "" — filter it (an empty symbol would otherwise pair
        # with </w> and win merge #1)
        F.filter(F.split(F.col("word"), "(?!^)"),
                 lambda t: t != ""),
        F.array(F.lit(END)))
    return words.withColumn("syms", syms)


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocab relation, weighted by
    word frequency: the per-iteration aggregation.  Output:
    ``(left, right, cnt)``."""
    pairs = F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] as left, syms[i+1] as right))")
    return (vocab.filter(F.size("syms") >= 2)
            .select(F.col("n"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("n").cast("long").alias("cnt")))


def apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """One merge pass over the vocab symbols: a left-to-right JVM
    ``aggregate`` fold joining (left, right) occurrences.

    Greedy-scan note: the reference scan never treats a JUST-MERGED
    token as the left side of the same merge in the same pass ("a a a a"
    must yield [aa, aa], never chain into [aaa, ...]).  The plain
    tail-equality test already guarantees this: a freshly merged tail
    equals ``left+right``, and ``left+right == left`` would require an
    empty right symbol — impossible — so the fresh tail can never match
    as a new ``left``.  No extra state needed."""
    merged = left + right
    fold = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.withColumn("syms", fold)


def _checkpoint_replacing(df: DataFrame, prev_ids: list[int]
                          ) -> tuple[DataFrame, list[int]]:
    """Eagerly localCheckpoint ``df`` and EXPLICITLY unpersist the
    previous iteration's checkpoint blocks.

    The repo's other iterative operators (components, pagerank) run
    O(log n) / ~10 bounded rounds, so leaking one checkpoint per round
    until the ContextCleaner's periodic GC is harmless; BPE runs
    thousands of merges over a vocabulary that can be GBs — without an
    explicit release the superseded copies pin executor storage
    linearly in n_merges.  getPersistentRDDs is how we find the block
    owner: localCheckpoint registers its RDD as persisted, so the id
    delta across the call IS the new checkpoint."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs()
    new_ids = [i for i in after.keySet().toArray() if i not in before]
    for rid in prev_ids:
        j = after.get(rid)
        if j is not None:
            j.unpersist()
    return out, new_ids


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text",
              words: DataFrame | None = None) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges.  Driver-side state is the merge
    list only (k 2-string rows — the PageRank/k-means scalar-collect
    pattern); per iteration: one vocab-sized hash agg + one 1-row
    collect + one checkpointed merge pass.

    ``words`` (optional): a precomputed :func:`word_counts` relation —
    pass it when the caller already paid the corpus-sized pass (the
    word-count table is a reusable artifact, like the LM model tables)."""
    vocab, ids = _checkpoint_replacing(
        with_symbols(words if words is not None
                     else word_counts(docs, text_col)), [])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (pair_counts(vocab)
               .orderBy(F.col("cnt").desc(), F.col("left").asc(),
                        F.col("right").asc())
               .limit(1).collect())
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        # checkpoint per round (k small plans, not a k-deep lazy tower —
        # the CC-fixpoint lesson) and RELEASE the superseded copy: at
        # most 2 vocab copies alive regardless of n_merges
        vocab, ids = _checkpoint_replacing(
            apply_merge(vocab, left, right), ids)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy encoder: repeatedly merge the LOWEST-RANK adjacent
    pair (the standard BPE inference rule — equivalent to replaying the
    merges in training order)."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best:best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Tokenize a corpus with a trained merge table.  Output:
    ``(id_col, n_words, n_tokens, tokens)`` where tokens is the
    concatenated subword sequence.

    Scale shape: DISTINCT words are encoded once by an Arrow-batched
    pandas UDF (vocabulary-sized work), then a broadcast join maps every
    corpus occurrence to its encoding — the corpus-sized stages are one
    explode and one join against a dictionary-sized build side."""
    ranks = {m: i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _encode_word(w, ranks))

    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = (docs.filter(F.col(text_col).isNotNull())
           .select(F.col(id_col), F.posexplode(w).alias("pos", "word"))
           .filter(F.col("word") != ""))
    dictionary = tok.select("word").distinct() \
        .withColumn("pieces", enc(F.col("word")))
    joined = tok.join(F.broadcast(dictionary), "word")
    return (joined.groupBy(id_col)
            .agg(F.sort_array(F.collect_list(F.struct("pos", "pieces")))
                 .alias("seq"))
            .select(
                F.col(id_col),
                F.size("seq").cast("long").alias("n_words"),
                F.aggregate(
                    F.col("seq"), F.lit(0).cast("long"),
                    lambda acc, s: acc + F.size(s["pieces"]),
                ).alias("n_tokens"),
                F.flatten(F.expr("transform(seq, s -> s.pieces)"))
                .alias("tokens")))
