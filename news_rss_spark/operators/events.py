"""Event-stream analytics operators (engine-new, training-data pipeline):
sessionization and latest-per-key dedup — the window-function surface a
large-scale ingestion pipeline needs besides the extraction core.

Scale notes:
- both operators shuffle ONCE on the partition key (user_id); the window
  sort is per-partition (no global sort);
- sessionization is the lag/cumsum formulation — one window pass, no
  self-join;
- latest-per-key is row_number()=1, which Catalyst rewrites into a
  TopK-per-partition (WindowGroupLimit) — no full materialization of
  per-key history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SESSION_GAP_SECS = 1800


def sessionize(events: DataFrame, gap_secs: int = DEFAULT_SESSION_GAP_SECS,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Assign session ids: a new session starts when the gap to the user's
    previous event exceeds ``gap_secs``.  ``session_seq`` is the per-user
    session ordinal (1-based); deterministic via the (ts, event_id) order.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    # NTZ has no direct long cast; route via timestamp (callers pin the
    # session to UTC so the epoch matches a timezone-naive oracle)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev_epoch = prev_ts.cast("timestamp").cast("long")
    new_session = F.when(
        prev_ts.isNull() | (epoch - prev_epoch > gap_secs), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def latest_event_per_user(events: DataFrame, user_col: str = "user_id",
                          ts_col: str = "ts",
                          id_col: str = "event_id") -> DataFrame:
    """Keep each user's most recent event (ties broken by highest id) —
    the standard changelog-compaction / latest-state dedup."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).desc(),
                                             F.col(id_col).desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def session_stats(events: DataFrame, gap_secs: int = DEFAULT_SESSION_GAP_SECS,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Per-session aggregates (event count, span seconds, total value)."""
    s = sessionize(events, gap_secs, user_col, ts_col, id_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max(F.col(ts_col).cast("timestamp")).cast("long")
             - F.min(F.col(ts_col).cast("timestamp")).cast("long")
             ).alias("span_secs"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Tumbling-window aggregation: events per (window, key) with count and
    value sum — the brief's "windowed aggs" surface, shared by the batch
    query and the watermarked streaming variant
    (streaming/stream.py::streaming_windowed_counts), which applies
    ``withWatermark`` upstream and reuses this exact groupBy.

    One shuffle on (window, key); partial aggregation is map-side.  The
    window struct is projected to its start timestamp so batch output is
    directly oracle-comparable (DuckDB ``time_bucket``).  Rows with a NULL
    ``ts_col`` are dropped — Spark's ``F.window`` adds an IsNotNull filter
    — and the oracle states the same predicate explicitly."""
    return (events
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(key_col))
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("total_value"))
            .select(F.col("w")["start"].alias("window_start"),
                    key_col, "n_events", "total_value"))
