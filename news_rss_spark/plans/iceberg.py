"""Iceberg table adapter (SURVEY §7 M3 / §2.5 C4 "Iceberg MERGE").

The north rule targets an Iceberg table of 10^12 documents with a
``bucket(doc_id)`` partition transform.  This sandbox ships no Iceberg
runtime jars (verified: none under pyspark/jars, no network), so the
pipeline uses the parquet + dynamic-partition-overwrite analog — the SAME
layout and idempotency semantics (bucket-wise replace == partition-level
snapshot replace).  This module carries the real Iceberg API shape so a
catalog-equipped cluster switches by configuration, not code:

- ``iceberg_available``  — detects a configured Iceberg catalog
- ``create_documents_table`` / ``append_documents`` — DataFrameWriterV2
  ``writeTo(...).partitionedBy(bucket(n, doc_id))`` DDL + append
- ``overwrite_buckets`` — ``overwritePartitions()`` (the dynamic-overwrite
  equivalent used for idempotent resume)
- ``merge_registry_sql`` — the C4 sources-registry MERGE statement; with
  no catalog, ``merge_registry`` falls back to an equivalent DataFrame
  merge (same row-level semantics, tested)

Everything degrades explicitly: callers get the fallback behavior plus a
returned marker of which path ran, never a silent no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True iff an Iceberg catalog implementation is configured AND its
    classes are on the JVM classpath."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


def create_documents_table(spark: SparkSession, table: str, df: DataFrame,
                           n_buckets: int = 64,
                           key: str = "doc_id") -> str:
    """Create-or-replace the documents table with the bucket transform.

    Returns "iceberg" when the real ``writeTo`` DDL ran, "parquet" when the
    path-based analog (partitioned parquet, same bucket clustering) did.
    """
    if iceberg_available(spark):
        (df.writeTo(table)
           .partitionedBy(F.bucket(n_buckets, F.col(key)))
           .using("iceberg")
           .createOrReplace())
        return "iceberg"
    from news_rss_spark.operators.lineage import with_bucket
    (with_bucket(df, n_buckets=n_buckets, key=key)
        .write.mode("overwrite").partitionBy("bucket").parquet(table))
    return "parquet"


def append_documents(spark: SparkSession, table: str, df: DataFrame,
                     n_buckets: int = 64, key: str = "doc_id") -> str:
    if iceberg_available(spark):
        df.writeTo(table).append()
        return "iceberg"
    from news_rss_spark.operators.lineage import with_bucket
    (with_bucket(df, n_buckets=n_buckets, key=key)
        .write.mode("append").partitionBy("bucket").parquet(table))
    return "parquet"


def overwrite_buckets(spark: SparkSession, table: str, df: DataFrame) -> str:
    """Idempotent bucket-wise replace (the resume primitive): Iceberg's
    ``overwritePartitions()`` snapshot replace, or parquet dynamic
    partition overwrite — identical observable semantics."""
    if iceberg_available(spark):
        df.writeTo(table).overwritePartitions()
        return "iceberg"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy("bucket").parquet(table)
    return "parquet"


def merge_registry_sql(target: str, source: str) -> str:
    """C4 sources-registry maintenance as one Iceberg MERGE (upsert by id;
    deletes expressed by an ``_op = 'delete'`` marker column)."""
    return f"""
MERGE INTO {target} t
USING {source} s
ON t.id = s.id
WHEN MATCHED AND s._op = 'delete' THEN DELETE
WHEN MATCHED THEN UPDATE SET
  t.name = s.name, t.link = s.link, t.run_at_launch = s.run_at_launch,
  t.max_retries = s.max_retries, t.timeout = s.timeout,
  t.interval_secs = s.interval_secs
WHEN NOT MATCHED AND s._op != 'delete' THEN INSERT
  (id, name, link, run_at_launch, max_retries, timeout, interval_secs)
  VALUES (s.id, s.name, s.link, s.run_at_launch, s.max_retries, s.timeout,
          s.interval_secs)
""".strip()


def merge_registry(spark: SparkSession, registry: DataFrame,
                   changes: DataFrame,
                   table: str | None = None) -> tuple[DataFrame, str]:
    """Apply upsert/delete changes to the registry.

    When ``table`` names an Iceberg registry table AND an Iceberg catalog
    is actually configured (:func:`iceberg_available`), the MERGE SQL from
    :func:`merge_registry_sql` executes against it and the merged table is
    returned with marker ``'iceberg'``.  Otherwise — including every call
    that passes only DataFrames — the identical row semantics are computed
    relationally (deletes drop matching ids, updates replace matching
    rows, inserts append the rest) and the marker is ``'dataframe'``.
    """
    if table is not None and iceberg_available(spark):
        changes.createOrReplaceTempView("_registry_changes")
        try:
            spark.sql(merge_registry_sql(table, "_registry_changes"))
        finally:
            spark.catalog.dropTempView("_registry_changes")
        return spark.table(table), "iceberg"
    cols = registry.columns
    deletes = changes.filter(F.col("_op") == "delete").select("id")
    upserts = changes.filter(F.col("_op") != "delete").select(*cols)
    kept = registry.join(deletes, on="id", how="left_anti") \
                   .join(upserts.select("id"), on="id", how="left_anti")
    return kept.unionByName(upserts), "dataframe"
