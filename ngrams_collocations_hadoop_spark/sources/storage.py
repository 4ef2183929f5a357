"""Storage layout operators: partitioned parquet sinks (partition
pruning) and bucketed tables (shuffle-free co-located joins).

At 100 TB these are the difference between scanning everything and
scanning one partition, and between re-shuffling two fact tables per
join and joining pre-bucketed data with zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet: directory per partition value;
    reads with a partition predicate prune at the file-listing level
    (PartitionFilters, no data I/O for pruned partitions)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int) -> None:
    """Bucketed + sorted catalog table: rows hash-distributed into
    ``n_buckets`` files by ``bucket_cols``. Two tables bucketed the same
    way join with NO exchange on either side — the co-partitioning the
    reference hand-built with its custom partitioners (Job1.java:85-94),
    persisted into the storage layout."""
    spark = df.sparkSession
    # Idempotence across sessions: the in-memory catalog forgets managed
    # tables on restart but their warehouse directory persists, and
    # saveAsTable refuses to reuse the location. Drop both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith(("file:", "/")):
        import shutil
        local = warehouse.removeprefix("file:")
        shutil.rmtree(f"{local}/{table.lower()}", ignore_errors=True)
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*bucket_cols)
     .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact_files(spark: SparkSession, in_path: str, out_path: str,
                  target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Streaming sinks and fine-grained
    partitioned writes accumulate thousands of tiny files; at 100 TB
    the resulting task-per-file scheduling and footer-read overhead
    dominate scan time. Sizing from actual on-disk bytes (via the
    Hadoop FileSystem API, so it works on any supported scheme, not
    just file:) keeps output files near the row-group sweet spot.
    Returns the number of output files written."""
    df = spark.read.parquet(in_path)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, -(-int(total) // target_file_bytes))
    # coalesce, not repartition: pure file-merge needs no shuffle (and
    # must not destroy any existing clustering within the data).
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
