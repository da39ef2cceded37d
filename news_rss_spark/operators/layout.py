"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Why this is an operator and not a nicety: at 100 TB the scan is the
query.  Parquet/Iceberg prune row groups and files by per-column
min/max stats, but stats only prune along the SORT order — a corpus
sorted by ``fetch_date`` answers date filters cheaply and domain
filters with a full scan.  Interleaving the bits of k columns into one
Morton key and range-partitioning + sorting by it keeps EVERY
interleaved dimension locally narrow in every file, so min/max pruning
works for filters on any of them (Delta/Iceberg ``OPTIMIZE ZORDER BY``
semantics, built from plain column expressions).

Everything here is JVM-side integer bit arithmetic (shift/and/or) —
whole-stage-codegen friendly, no UDFs — with a bit-exact DuckDB oracle
(same shifts reproduce in ANSI SQL).

Reference analog: news-rss orders its ``news`` table by publish date
alone (migrations/20241025113450_init.up.sql); this generalizes the
layout to multi-predicate pruning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "cluster_by_zorder", "zorder_sql_expr"]


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton key: bit i of column j lands at position ``i*k + j``.

    Columns must already be non-negative integers narrower than ``bits``
    bits (bucketize/rank wider domains first — interleaving raw 64-bit
    values would overflow; ``k*bits`` must stay < 63).  The expression
    tree is k*bits OR terms, all codegen'd into one projection.
    """
    k = len(cols)
    if k * bits >= 63:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits >= 63 "
                         "— bucketize dimensions first")
    terms = []
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql_expr(cols: list[str], bits: int = 16) -> str:
    """The identical key as ANSI SQL (DuckDB oracle / documentation)."""
    k = len(cols)
    terms = [f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * k + j})"
             for j, c in enumerate(cols) for i in range(bits)]
    return " | ".join(terms)


def cluster_by_zorder(df: DataFrame, cols: list[str], bits: int = 16,
                      n_partitions: int | None = None,
                      out: str = "zkey") -> DataFrame:
    """Range-partition + sort by the Morton key: the write-side layout.

    ``repartitionByRange`` samples key quantiles so output files carry
    contiguous, disjoint zkey ranges — which is exactly what makes the
    min/max stats selective on every interleaved dimension.  One shuffle
    (the layout IS the shuffle) + per-partition sort; at 100 TB this is
    the compaction job's plan, run once per partition of the table, not
    per query.
    """
    keyed = df.withColumn(out, zorder_key(cols, bits))
    n = n_partitions or keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (keyed.repartitionByRange(int(n), F.col(out))
            .sortWithinPartitions(out))
