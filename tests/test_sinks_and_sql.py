"""Compacted writer + ad-hoc SQL surface."""

from __future__ import annotations

import glob
import os
import tempfile

from kafka_connect_minio_pipeline_spark.sinks import write_compacted
from kafka_connect_minio_pipeline_spark.tables import load, sql


def _parts(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "part-*"))


def test_write_compacted_targets_file_size(spark, sf_dir):
    """Smaller target ⇒ more (smaller) files; row count survives the
    round trip bit-exactly. Uses a synthetic ~20 MB table: the sf0.001
    fixtures are smaller than any sane file target."""
    from pyspark.sql import functions as F

    # incompressible padding — AQE sizes partitions on COMPRESSED shuffle
    # bytes, so constant strings would collapse to one partition
    df = spark.range(50_000).withColumn(
        "pad",
        F.concat(
            *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(i)), 256) for i in range(4)]
        ),
    )

    small_dir = tempfile.mkdtemp(prefix="kcm_sink_small_")
    big_dir = tempfile.mkdtemp(prefix="kcm_sink_big_")
    write_compacted(df, small_dir, target_file_mb=2)
    write_compacted(df, big_dir, target_file_mb=1024)

    n_small, n_big = len(_parts(small_dir)), len(_parts(big_dir))
    assert n_small > n_big, (n_small, n_big)
    assert spark.read.parquet(small_dir).count() == 50_000
    assert spark.read.parquet(big_dir).count() == 50_000


def test_write_compacted_restores_advisory_conf(spark, sf_dir):
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before = spark.conf.get(key, None)
    out = tempfile.mkdtemp(prefix="kcm_sink_conf_")
    write_compacted(load(spark, sf_dir, "nation"), out, target_file_mb=7)
    assert spark.conf.get(key, None) == before


def test_sql_surface_matches_dataframe(spark, sf_dir):
    got = sql(
        spark,
        "SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_ok FROM lineitem",
        sf_dir,
    ).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    assert got["n"] == li.count()
    assert got["n_ok"] == li.select("l_orderkey").distinct().count()
