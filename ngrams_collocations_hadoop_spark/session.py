"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); the config below still encodes
the cluster-relevant choices (AQE, adaptive skew join, Arrow for the
Pandas-UDF path, UTC session timezone for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "ngrams_collocations_hadoop_spark",
              cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - ``spark.sql.shuffle.partitions`` ≈ cores locally; on a real cluster
      this would be sized to ~2-3× total executor cores (or left to AQE
      coalescing, which is enabled).
    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic join-strategy switching — the knobs that matter at 100 TB.
    - Arrow on: the Pandas-UDF operators (similarity, multimodal) move
      data JVM<->Python in columnar batches, not row-at-a-time pickle.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Some fixture generations store TIMESTAMP(NANOS), which the
        # Spark reader rejects; read as int64 nanos and convert in the
        # loader (no-op for micros-encoded fixtures).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Propagate the sortBy order of bucketed tables into planning
        # (off by default since SPARK-28595). Spark only claims the
        # ordering when every bucket is a SINGLE file — which
        # storage.write_bucketed guarantees via its pre-write
        # repartition — so merge joins against bucketed+sorted tables
        # (rel_bucketed_join, dedup_persisted_lsh's band index) skip
        # the per-partition re-sort entirely; on a multi-file bucket
        # Spark falls back to sorting, never to wrong results.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering",
                "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/ncs_warehouse"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
