"""SparkSession factory.

Defaults are tuned for the local[N] test/bench environment but every knob is
chosen to also be the right default on a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong for some stage; AQE fixes it.
- shuffle partitions sized to core count locally; on a real cluster AQE's
  coalescing makes the initial number far less sensitive.
- UTC session timezone so timestamp semantics are deployment-independent.
- Arrow enabled for any pandas interchange (vectorized, not per-row pickling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_connect_minio_pipeline_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage busy
        # without tiny-task overhead. On a cluster this would be
        # 2-3x total cores; AQE coalesces the excess either way.
        shuffle_partitions = max(cores, 4)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # the driver-generated events table stores TIMESTAMP(NANOS); Spark
        # reads it as long nanos which tables.load() converts explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if driver_memory:
        builder = builder.config("spark.driver.memory", driver_memory)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
