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


def trending_counts(events: DataFrame, window: str = "1 hour",
                    ts_col: str = "ts", key_col: str = "event_type",
                    smoothing: int = 1) -> DataFrame:
    """Window-over-window trend detection: for every (window, key) with a
    preceding window, the smoothed count ratio

        trend = (n_events + s) / (prev_events + s)

    — the burst/drift signal a crawl monitor alarms on (a feed going
    quiet, a spam source flaring up).  ``prev_events`` is the count of
    the window exactly one interval earlier; an OBSERVED gap counts as
    zero (a key silent for a window and returning trends against 0, not
    against its last active window — lag over observed rows alone would
    silently skip gaps).  The first observed window per key has no
    predecessor and is dropped.  Additive smoothing ``s`` keeps the
    ratio finite and damps 1-vs-0 noise.

    Plan: the tumbling count is the windowed_counts aggregation (one
    shuffle, map-side partial); the lag runs on the AGGREGATED relation
    — |keys| x |windows| rows, never events — so the per-key window sort
    is sketch-sized at any corpus scale.  All ratio inputs are integers
    through one fixed expression tree (cross-engine float contract)."""
    counts = (events
              .groupBy(F.window(F.col(ts_col), window).alias("w"),
                       F.col(key_col))
              .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
              .select(F.col("w")["start"].alias("window_start"),
                      key_col, "n_events"))
    per_key = Window.partitionBy(key_col).orderBy("window_start")
    # materialize BOTH lag columns before any filter: a window expression
    # referenced after the first-row filter would re-evaluate on the
    # filtered relation and see each key's second window as a first
    lagged = counts.select(
        "window_start", key_col, "n_events",
        F.lag("window_start").over(per_key).alias("_prev_ts"),
        F.lag("n_events").over(per_key).alias("_prev_n"))
    adjacent = (F.col("_prev_ts") + F.expr(f"INTERVAL {window}")
                == F.col("window_start"))
    prev_events = F.when(adjacent, F.col("_prev_n")).otherwise(F.lit(0))
    return (lagged
            .filter(F.col("_prev_ts").isNotNull())
            .withColumn("prev_events", prev_events.cast("long"))
            .select("window_start", key_col, "n_events", "prev_events",
                    F.round((F.col("n_events") + F.lit(smoothing))
                            .cast("double")
                            / (F.col("prev_events") + F.lit(smoothing))
                            .cast("double"), 6).alias("trend")))


def ewma_latest(events: DataFrame, alpha: float = 0.3,
                key_col: str = "user_id", ts_col: str = "ts",
                value_col: str = "value",
                id_col: str = "event_id") -> DataFrame:
    """Per-key exponentially-weighted moving average of a metric series —
    the time-decayed "current level" a monitoring/quality dashboard
    tracks per user/domain/source:

        y_0 = x_0;   y_i = alpha * x_i + (1 - alpha) * y_{i-1}

    folded in EVENT-TIME ORDER (ties break on ``id_col``), returning one
    row per key: ``(key, n_events, ewma)``.

    Determinism contract: the fold is the recursive definition itself —
    pure multiply/add in a fixed order — so the oracle replays it
    verbatim with DuckDB's ``list_reduce``; no closed-form
    power-weighted sum (whose pow() calls would reorder float error).
    Plan: ONE shuffle (groupBy key) + sort_array + aggregate, all JVM.
    Per-key state is the collected series — right for bounded telemetry
    series; an unbounded stream should fold incrementally through the
    streaming path instead (y carries all history in one double).
    """
    seq = F.sort_array(F.collect_list(F.struct(
        F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
        F.col(value_col).cast("double").alias("x"))))
    folded = (events.filter(F.col(value_col).isNotNull()
                            & F.col(ts_col).isNotNull())
              .groupBy(key_col).agg(seq.alias("seq")))
    y = F.aggregate(
        F.expr("slice(seq, 2, size(seq) - 1)"),
        F.element_at("seq", 1)["x"],
        lambda acc, s: F.lit(alpha) * s["x"] + F.lit(1.0 - alpha) * acc)
    return folded.select(
        F.col(key_col),
        F.size("seq").cast("long").alias("n_events"),
        F.round(y, 6).alias("ewma"))
