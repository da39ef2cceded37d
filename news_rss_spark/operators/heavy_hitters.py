"""Guaranteed heavy hitters: Misra-Gries candidate mining + exact recount.

At 100 TB, "which tokens exceed 1/(k+1) of the corpus?" cannot be a full
``groupBy(token)`` — that shuffles every distinct token (billions of rows
for web text) to answer a question whose output is at most k rows.  The
classical engine answer is the Misra-Gries summary (Misra & Gries 1982;
the "mergeable summaries" form of Agarwal et al. PODS'12): k counters per
partition, decrement-all on overflow, which retains EVERY value whose
local frequency exceeds n_p/(k+1).

The averaging argument makes the union of per-partition survivor sets a
guaranteed superset of the global heavy hitters: if c_p <= n_p/(k+1) in
every partition p, then sum(c_p) <= n/(k+1) — so any value with global
count > n/(k+1) beats the local threshold somewhere.  A second pass
recounts ONLY the candidates exactly (broadcast semi-join — the corpus
never shuffles; at most k rows per input partition are mined), and the
exact integer threshold ``cnt * (k+1) > n`` decides membership.

This two-phase shape makes the OUTPUT deterministic and exact — identical
for every partitioning, although the intermediate candidate sets differ —
which is what lets a DuckDB oracle replay it as a plain
``GROUP BY ... HAVING`` (the oracle never needs to model the sketch).
Misra-Gries is pure pruning here, never approximation.

Plan: one Arrow-batched ``mapInPandas`` mining pass (per-partition state,
vectorized per-batch merge via pandas ``value_counts``), one broadcast
semi-join + token-count hash agg confined to candidate rows, and the
corpus total rides in-plan as a broadcast 1-row aggregate (the bm25
computed-key pattern) — no driver-side collect anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_candidates", "heavy_hitters"]

# reference parity note: the news-rss reference has no frequency mining;
# this is an engine-new training-data operator (round brief: text
# analysis / boilerplate heavy-hitter discovery at corpus scale).


def _merge_mg(counters: "pd.Series", batch_counts: "pd.Series",
              k: int) -> "pd.Series":
    """Mergeable-summaries merge: add the batch's exact counts, then if
    more than k counters remain subtract the (k+1)-th largest count from
    all and drop the non-positive — one decrement step covering the whole
    batch (same guarantee as item-at-a-time MG: the subtracted total is
    what bounds undercount by n_p/(k+1)).

    Fully vectorized (Series.add / nlargest / boolean mask) — the
    per-item dict loop measured as the 1.2M-probe bottleneck."""
    merged = counters.add(batch_counts, fill_value=0)
    if len(merged) > k:
        # (k+1)-th largest count = amount every counter can shed while
        # provably keeping all locally-heavy values alive
        m = merged.nlargest(k + 1).iloc[k]
        merged = merged - m
        merged = merged[merged > 0]
    return merged


def mg_candidates(df: DataFrame, token_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivor values over ``token_col`` (one
    already-exploded token per row) — at most k rows per input partition,
    each a candidate heavy hitter with its (lower-bound) residual weight.

    The candidate SET depends on partitioning; downstream exact recount
    makes the final answer partition-invariant.  Weights are exposed for
    diagnostics only (they undercount by up to n_p/(k+1))."""
    if k < 1:
        raise ValueError(f"mg_candidates: k must be >= 1, got {k}")
    schema = f"{token_col} string, mg_weight bigint"

    def mine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            col = pdf[token_col].dropna()
            if len(col):
                counters = _merge_mg(counters, col.value_counts(), k)
        yield pd.DataFrame({
            token_col: counters.index.astype(str),
            "mg_weight": counters.to_numpy(dtype="int64"),
        })

    return df.select(token_col).mapInPandas(mine, schema=schema)


def heavy_hitters(df: DataFrame, token_col: str, k: int) -> DataFrame:
    """All values of ``token_col`` whose exact corpus count strictly
    exceeds n/(k+1), with the exact count — (token, cnt), deterministic
    under any partitioning.  Nulls are ignored (COUNT semantics).

    Two passes over the token relation: the MG mining pass (narrow, no
    shuffle) and the recount pass (filtered to candidates BEFORE the
    hash agg, so the shuffle carries candidate tokens only).  The
    integer membership test ``cnt * (k+1) > n`` avoids any float
    threshold disagreement across engines."""
    toks = df.select(token_col).filter(F.col(token_col).isNotNull())
    cands = (mg_candidates(toks, token_col, k)
             .select(token_col).distinct())
    # corpus token total as an in-plan 1-row broadcast (computed join key
    # = literal 1 on both sides; see bm25_search for the pitfall notes)
    total = toks.agg(F.count(token_col).alias("n_total")) \
                .withColumn("_one", F.lit(1))
    counted = (toks
               .join(F.broadcast(cands), on=token_col, how="left_semi")
               .groupBy(token_col)
               .agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("_one", F.lit(1)))
    return (counted
            .join(F.broadcast(total), on="_one")
            .filter(F.col("cnt") * F.lit(k + 1) > F.col("n_total"))
            .select(token_col, "cnt"))
