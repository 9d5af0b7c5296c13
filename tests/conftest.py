from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kafka_connect_minio_pipeline_spark.session import get_spark

    # small core count for unit tests: tiny data, startup dominates
    spark = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
