"""Temporal joins Spark lacks as built-ins (engine-new; the classic
time-series operators a training-data/event pipeline needs next to
sessionization, cf. operators/events.py).

- :func:`asof_join` — for each left row, the most recent right row at or
  before (backward) / the earliest at or after (forward) its timestamp,
  per key, with optional tolerance.  Implemented as ONE shuffle: union the
  two sides, one window pass per key carrying the last-seen right payload
  (``last(..., ignorenulls=True)`` over an unbounded-preceding row frame).
  No join node at all — at 100 TB this is a single repartition+sort per
  key, the same cost as any per-key window, and strictly cheaper than the
  naive "join then argmax per left row" (which shuffles the full pair
  blowup).  Hot keys behave like any skewed window (AQE cannot split a
  window partition; pre-filter or bucket hot keys upstream).

- :func:`interval_join` — all (interval, point) pairs with
  ``start <= ts <= end`` per key.  Implemented as a bucketized equi-join:
  intervals explode onto the fixed-width time buckets they cover, points
  map to their single bucket, the join key is (key, bucket) and the exact
  containment predicate runs post-join.  Each point lands in exactly one
  bucket and an interval covers each of its buckets once, so pairs are
  emitted exactly once — no distinct needed.  This turns the classic
  O(n^2) non-equi range join (BroadcastNestedLoopJoin in Spark) into a
  pure shuffle-hash/sort-merge plan whose cost scales with
  interval_length / bucket_width; pick ``bucket_secs`` near the typical
  interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", direction: str = "backward",
              tolerance_secs: int | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """Per-key as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics, both inclusive at equal timestamps).

    Returns every left row plus ``<right_prefix><col>`` columns from the
    matched right row (NULL when no match / outside tolerance).  Matches
    among right rows with identical (key, ts) are broken deterministically
    by the right row's remaining columns (struct max for backward, min for
    forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    rcols = [c for c in right.columns if c != by]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("_rp")
    r = right.select(F.col(by), F.col(on).alias("_ts"), F.lit(0).alias("_side"),
                     payload)
    l = left.select(F.col(by), F.col(on).alias("_ts"), F.lit(1).alias("_side"),
                    F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
                    F.struct(*[F.col(c) for c in left.columns]).alias("_lp"))
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))

    u = l.unionByName(r.select(*l.columns))
    if direction == "backward":
        # right rows sort before left rows at equal ts (inclusive match);
        # ties among right rows resolve to the struct-max payload
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_rp").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_rp").desc()]
    w = (Window.partitionBy(by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))

    if tolerance_secs is not None:
        # cast("double") keeps sub-second precision; unix_timestamp would
        # truncate to whole seconds and mis-gate borderline matches
        mts = F.col("_m")[on]
        delta = (F.col("_ts").cast("double") - mts.cast("double")
                 if direction == "backward"
                 else mts.cast("double") - F.col("_ts").cast("double"))
        matched = matched.withColumn(
            "_m", F.when(delta <= F.lit(tolerance_secs), F.col("_m")))

    out_cols = [F.col("_lp")[c].alias(c) for c in left.columns]
    out_cols += [F.col("_m")[c].alias(f"{right_prefix}{c}") for c in rcols]
    return matched.select(*out_cols)


def interval_join(intervals: DataFrame, points: DataFrame,
                  by: str = "user_id", start: str = "start",
                  end: str = "end", on: str = "ts",
                  bucket_secs: int = 3600) -> DataFrame:
    """All (interval, point) pairs with ``start <= ts <= end`` per key,
    via a (key, time-bucket) equi-join — never a nested-loop join.

    Output: every intervals column, then every points column (clashing
    names get a ``p_`` prefix)."""
    ib = intervals.withColumn(
        "_b",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start)) / bucket_secs),
            F.floor(F.unix_timestamp(F.col(end)) / bucket_secs))))
    taken = set(intervals.columns)
    renames = {c: (f"p_{c}" if c in taken else c)
               for c in points.columns if c != by}
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(on)) / bucket_secs))
    pb = pb.select(F.col(by).alias("_pby"), "_b",
                   *[F.col(c).alias(renames[c]) for c in renames])
    joined = ib.join(pb, (ib[by] == pb["_pby"]) & (ib["_b"] == pb["_b"]))
    ts_out = renames.get(on, on)
    return (joined
            .filter((F.col(ts_out) >= F.col(start))
                    & (F.col(ts_out) <= F.col(end)))
            .drop("_b", "_pby"))
