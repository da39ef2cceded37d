"""Out-of-band sink compaction (operational companion to the pipeline's
write path: sinks land as lz4 for write throughput; storage-optimized
tables compact to zstd with bounded file counts afterwards).

Incremental runs append files to each resume bucket (one per run that
touched it); compaction rewrites every bucket into ``files_per_bucket``
zstd files without changing a byte of content.  Bucket-wise dynamic
overwrite keeps the operation idempotent and resumable like the pipeline
itself — a crash mid-compaction leaves untouched buckets readable and
rewritten buckets complete.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_sink(spark: SparkSession, sink_path: str,
                 codec: str = "zstd", files_per_bucket: int = 1) -> int:
    """Rewrite the bucketed sink with consolidated files; returns the
    number of buckets rewritten."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.parquet.compression.codec", codec)

    sink = spark.read.parquet(sink_path)
    n_buckets = sink.select("bucket").distinct().count()
    # sever the plan from the path being overwritten (read-then-overwrite
    # on the same location is otherwise rejected / unsafe)
    mat = sink.localCheckpoint(eager=True)
    # hash-partitioning on bucket alone would land each bucket in ONE task
    # regardless of the requested file count; a stable id-derived salt
    # splits every bucket across files_per_bucket writers/files
    parts = [F.col("bucket")]
    if files_per_bucket > 1:
        parts.append(F.pmod(F.xxhash64("id"), F.lit(files_per_bucket)))
    (mat.repartition(max(n_buckets * files_per_bucket, 1), *parts)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(sink_path))
    return n_buckets
