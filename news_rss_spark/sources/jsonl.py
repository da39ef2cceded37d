"""JSONL document ingest with error quarantine.

Crawl deliveries and vendor dumps arrive as JSON-lines; at 100 TB a
single malformed line must become a quarantined row, never a dead
executor (the same log-and-continue contract as the HTML/PDF kernels:
reference analog ``src/feeds/rss_feeds/mod.rs`` retry/skip loop).

Spark-first: ``from_json`` (JVM, whole-stage codegen — no Python in the
parse path) with an explicit schema; NULL struct out of a non-null line
== parse failure.  We deliberately do NOT use PERMISSIVE
``columnNameOfCorruptRecord`` infrastructure — that is reader-level and
swallows the raw line in some modes; keeping the raw line beside the
parse makes the quarantine row self-describing and re-parseable after a
schema fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_JSON_SCHEMA = ("doc_id string, text string, lang string, "
                   "source string, ts string")


def parse_jsonl_documents(df: DataFrame, json_col: str = "line",
                          schema: str = DOC_JSON_SCHEMA) -> DataFrame:
    """(line) -> (status, error, doc_id, text, lang, source, ts, raw).

    ``status='ok'`` rows carry the parsed fields; ``status='skip'`` rows
    (unparseable JSON, or JSON missing the required doc_id) carry the
    raw line for quarantine.  One JVM projection, no shuffle.

    PERMISSIVE ``from_json`` yields an all-null STRUCT (not a null) for
    malformed input, so validity is classified with Spark 4's
    ``try_parse_json`` (variant parse -> null on bad JSON) rather than a
    null-struct check."""
    parsed = F.from_json(F.col(json_col), schema)
    valid = F.try_parse_json(F.col(json_col)).isNotNull()
    ok = valid & parsed.isNotNull() & parsed["doc_id"].isNotNull()
    return df.select(
        F.when(ok, F.lit("ok")).otherwise(F.lit("skip")).alias("status"),
        F.when(ok, F.lit(None).cast("string"))
         .when(~valid, F.lit("malformed_json"))
         .otherwise(F.lit("missing_doc_id")).alias("error"),
        *[F.when(ok, parsed[f]).alias(f)
          for f in ("doc_id", "text", "lang", "source", "ts")],
        F.col(json_col).alias("raw"))


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok_rows_without_raw, quarantine_rows) — the two sink branches."""
    ok = parsed.filter(F.col("status") == "ok").drop("raw", "status",
                                                     "error")
    bad = parsed.filter(F.col("status") == "skip") \
                .select("error", "raw")
    return ok, bad
