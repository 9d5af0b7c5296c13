"""Canonical loaders for the driver's test star schema.

All engine queries go through :func:`load` so that quirks of the generated
parquet (notably ``events.ts`` stored as TIMESTAMP(NANOS), which Spark only
reads via ``spark.sql.legacy.parquet.nanosAsLong``) are handled in exactly
one place and every downstream operator sees clean, documented types.

Scale note: these are single-file tables locally; on a real deployment each
would be a partitioned directory (or a Delta/Iceberg table). Nothing below
assumes single-file layout — paths are passed straight to the parquet scan
and Catalyst handles split planning, predicate pushdown and column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine relies on, applied idempotently.

    The driver may hand us an arbitrary session; all confs below are safe
    to set at runtime:
    - UTC session tz → timestamp display/NTZ-strip is machine-independent
      (determinism);
    - nanosAsLong → events.parquet (TIMESTAMP_NANOS) is readable at all
      (correctness);
    - AQE + partition coalescing → a bare session defaults to 200 shuffle
      partitions regardless of data size; AQE right-sizes every exchange at
      runtime, which is also exactly the knob that keeps these plans sane
      from sf0.01 up to 100 TB (skew-join splitting comes free with it);
    - shuffle.partitions → AQE ignores it for batch, but Structured
      Streaming disables AQE for stateful plans and allocates one state
      store per shuffle partition, so the 200 default means 200 tiny
      RocksDB/HDFS state handles per stateful op locally. Sized to the
      executor thread count; a real cluster deployment sets it to the
      cluster's core count before the first checkpoint pins it.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Fan a compressed-small, compute-heavy relation across the cluster
    before a narrow CPU-bound stage (tokenize / shingle / regex / hash /
    vector math).

    Compressed text and embeddings pack ~100-1000x smaller than the CPU
    they cost: a 0.6 MB single-row-group parquet is ONE scan partition,
    so without this the whole stage runs on one core. The hash
    repartition moves the raw bytes once (trivial next to the compute it
    unlocks) and pins partition count against AQE's compressed-bytes
    coalescing. The same call is what you want at 100 TB too — it bounds
    the skew of oversized files and decouples compute parallelism from
    file layout; for scan->shuffle-agg plans with light per-row work,
    do NOT spread (the extra exchange outweighs it).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])


def _normalize_ts(dtype: T.DataType) -> F.Column:
    """events.ts → TIMESTAMP_NTZ(micros), whatever the file stored.

    Generated data has shipped both TIMESTAMP(NANOS) (read as long nanos
    under the legacy conf; integer ``div`` is mandatory — 2024 epoch-nanos
    ≈ 1.7e18 > 2^53, a double round trip would corrupt the value; DuckDB
    truncates nanos→micros the same way, keeping the oracle bit-identical)
    and plain TIMESTAMP(MICROS). Dispatch on the actual read type so the
    engine accepts either layout."""
    if isinstance(dtype, T.LongType):
        return F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
    return F.col("ts").cast("timestamp_ntz")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with normalized types."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", _normalize_ts(df.schema["ts"].dataType))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for the SQL-expressed operators:
    grouping sets, asof emulation, ... Catalyst plans SQL and DataFrame code
    identically, so this is a syntax choice, not an engine fork)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(f"{prefix}{name}")


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    """The engine's ad-hoc SQL surface: every test table as a view, then
    spark.sql — users of the reference's verifier queries run them here
    verbatim. Same Catalyst planning as the DataFrame operators."""
    register_views(spark, sf_dir)
    return spark.sql(query)
