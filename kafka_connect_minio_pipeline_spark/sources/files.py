"""File-based sources, batch and streaming.

The streaming readers mirror the reference's source side (a Kafka topic,
SURVEY.md A1-A2) using the file-stream source: identical downstream plan,
no broker dependency — the documented CI fallback (SURVEY.md §7 step 4).
On a real deployment the same transformations attach to
``spark.readStream.format("kafka")`` (see sources/registry_avro.py).

The file source needs an explicit schema (no inference mid-stream) and a
directory ``basePath`` when pointed at a bare file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..scratch import scratch_dir
from ..tables import TABLE_NAMES, _ensure_session_confs, _normalize_ts


def _stream_dir(sf_dir: str, name: str) -> str:
    """The file-stream source wants a directory, and its per-batch reads
    reject a bare-file basePath — so stage a symlink to the (read-only)
    parquet file inside a throwaway directory and stream that. When the
    table is itself a DIRECTORY of part files (any Spark-written table —
    the fuzz fixtures, and every production table), symlink the data
    files individually: the source does not recurse into a linked
    subdirectory, so a single directory symlink would list ZERO files
    and the stream would silently converge empty (caught by the r10
    docs-fuzz closure on stream_quality/stream_multimodal)."""
    d = scratch_dir(f"kcm_src_{name}_")
    target = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(target):
        n = 0
        for f in sorted(os.listdir(target)):
            if f.endswith(".parquet"):
                os.symlink(f"{target}/{f}", f"{d}/{name}_{n}.parquet")
                n += 1
        if n == 0:
            raise FileNotFoundError(f"no part files under {target}")
    else:
        os.symlink(target, f"{d}/{name}.parquet")
    return d


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming scan of one test table (file-stream source)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    _ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    sdf = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir, name))
    if name == "events":
        # same nanos-or-micros→NTZ normalization as tables.load
        sdf = sdf.withColumn("ts", _normalize_ts(schema["ts"].dataType))
    # same NOT NULL required-field contract as tables.load — a NULL
    # event-time would otherwise corrupt watermarks/windows mid-stream
    from ..tables import _contract

    return _contract(sdf, name)
