"""Differential oracle parity for every registered query.

Auto-discovers the registry, so each new operator gets a driver-equivalent
hash check at sf0.001 (fast) without touching this file. This is the same
comparison the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

from kafka_connect_minio_pipeline_spark.registry import all_queries
from oracle_utils import assert_matches_oracle

_QUERIES = all_queries(strict=False)
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    q = _QUERIES[name]
    assert_matches_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_documents_are_ascii(spark, sf_dir):
    """The multimodal oracles slice characters (DuckDB) vs UTF-8 bytes
    (Spark) and agree only on pure-ASCII text (see operators/multimodal.py
    module docstring). Fail loudly if the corpus ever stops being ASCII."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_ascii = docs.filter(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    ).count()
    assert non_ascii == 0
