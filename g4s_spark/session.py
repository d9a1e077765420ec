"""SparkSession construction tuned for the test/bench environment.

Local mode is one JVM; on a real cluster the same knobs apply per-executor.
AQE is on so runtime stats re-plan joins (skew, broadcast thresholds) — the
dynamic upgrade of the reference's static cost model (SURVEY §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "g4s_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # hub vertices skew the expand join's shuffle keys (power-law
        # degree); AQE splits oversized partitions at runtime instead of
        # one straggler task owning the hub (SCALE.md skew strategy)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            os.environ.get("G4S_SKEW_THRESHOLD_BYTES", "16m"),
        )
        # 64MB advisory partitions over-coalesce the small-but-CPU-heavy
        # shuffles of a 32-thread local node (mxm join stages ran 3-wide);
        # 8m keeps them parallel. Cluster deployments should raise this.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("G4S_ADVISORY_PARTITION_BYTES", "8m"),
        )
        # with coalescePartitions.parallelismFirst the coalesce target is
        # max(totalSize/parallelism, minPartitionSize) — the 1m default
        # floor collapsed CPU-heavy small-COMPRESSED-byte shuffles (the
        # per-iteration PageRank aggregations, cypher expand joins) to
        # 3-4 tasks with one straggler. 64k keeps them ~parallelism-wide:
        # pagerank 4.8->3.2 s warm at sf0.1. Same compressed-size pitfall
        # as SCALE.md's skew note; cluster deployments with genuinely
        # large shuffles can raise this back.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("G4S_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("G4S_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # driver testdata parquet carries TIMESTAMP(NANOS); read as long,
        # sources.tables converts to TimestampType (micros)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
