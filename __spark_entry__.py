"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``kafka_connect_minio_pipeline_spark`` package;
this module is glue over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_minio_pipeline_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference pipeline's full dataflow (SURVEY §2.2 A8-A16):
    filter on blank/null names, drop sensitive columns, mask email,
    derive full_name / is_adult.
    """
    from kafka_connect_minio_pipeline_spark.pipeline.queries import (
        q_profile_transform,
    )

    return q_profile_transform(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; rows-only
    operators (stateful streaming, LSH/approx ops) are omitted on purpose."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
