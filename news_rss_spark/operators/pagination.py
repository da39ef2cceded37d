"""Multi-page article reassembly from ``rel=next`` pagination chains.

Publishers split long articles across pages and declare the order with
``<link rel="next">``; a training corpus wants ONE document per article,
not N fragments that the near-dup miners then half-merge.  Given the
per-page next-pointer relation this operator labels every page with its
chain and position:

    (url, next_url) -> (chain_id, url, pos)

- chain heads are pages nobody points TO (no inbound next); chain_id is
  the head's url;
- positions assign by BOUNDED-ROUND frontier expansion from the heads
  (``max_len`` rounds): each round joins the current frontier against
  the edge relation — frontier-sized shuffles, never corpus-sized, and
  article chains are short by construction (``max_len`` defaults to 32;
  pages deeper than that are left unlabeled, as are pointer CYCLES —
  both surface in the ``n_unassigned`` companion count, the crawl-trap
  signal);
- deterministic: pure joins, no ordering dependence (a page has at most
  one next pointer; two heads pointing at the SAME page would duplicate
  it — resolved min-chain_id-wins so the output is a function).

``assemble_chain_texts`` concatenates per-chain page texts in position
order (array_sort on (pos, text) structs — bounded per chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chain_positions", "assemble_chain_texts"]


def chain_positions(pages: DataFrame, url_col: str = "url",
                    next_col: str = "next_url",
                    max_len: int = 32) -> DataFrame:
    """``(chain_id, url, pos)`` per reachable page; see module
    docstring."""
    edges = (pages.select(F.col(url_col).alias("url"),
                          F.col(next_col).alias("nxt"))
             .localCheckpoint(eager=True))
    targets = edges.filter(F.col("nxt").isNotNull()) \
        .select(F.col("nxt").alias("url")).distinct()
    heads = (edges.select("url").distinct()
             .join(targets, "url", "left_anti"))
    frontier = heads.select(F.col("url").alias("chain_id"),
                            F.col("url"), F.lit(0).alias("pos"))
    out = [frontier]
    for pos in range(1, max_len):
        nxt = (frontier.join(edges, "url")
               .filter(F.col("nxt").isNotNull())
               .select("chain_id", F.col("nxt").alias("url"),
                       F.lit(pos).alias("pos")))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        out.append(nxt)
        frontier = nxt
    all_pos = out[0]
    for df in out[1:]:
        all_pos = all_pos.unionByName(df)
    # two heads converging on one page: min chain_id wins (then min pos);
    # a DANGLING next pointer (target never crawled) must not mint a
    # phantom page — positions are for pages only
    return (all_pos.groupBy("url")
            .agg(F.min(F.struct("chain_id", "pos")).alias("m"))
            .select(F.col("m.chain_id").alias("chain_id"), "url",
                    F.col("m.pos").alias("pos"))
            .join(edges.select("url").distinct(), "url", "left_semi")
            .select("chain_id", "url", "pos"))


def assemble_chain_texts(positions: DataFrame, pages: DataFrame,
                         url_col: str = "url",
                         text_col: str = "text") -> DataFrame:
    """``(chain_id, n_pages, full_text)`` — page texts joined in
    position order with a single newline; the per-chain sort happens on
    a collected (pos, text) array bounded by max_len."""
    joined = positions.join(
        pages.select(F.col(url_col).alias("url"), F.col(text_col)),
        "url")
    return (joined.groupBy("chain_id")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", F.col(text_col)))),
                         lambda s: s[text_col]),
                     "\n").alias("full_text")))
