"""The reference pipeline end-to-end as Structured Streaming
(SURVEY.md §3.2: Kafka → SMT → JSON S3 sink, rebuilt as
file-stream → profile transform → checkpointed JSON file sink).

The sink stage maps the reference's operational knobs (SURVEY.md A5-A7):
``flush.size=3`` → micro-batch trigger granularity, Connect offset topics
→ the streaming checkpoint, at-least-once → exactly-once (file-sink commit
log). The written files are read back with a pinned schema (never inferred
— SURVEY.md §1.1 regime 3 is a reader hazard, not a feature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..pipeline.profile import profile_transform, users_from_customer
from ..sources.files import stream_table
from .runner import run_to_files
from ..scratch import scratch_dir

SINK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("is_adult", T.BooleanType()),
    ]
)


def read_json_sink(spark: SparkSession, path: str) -> DataFrame:
    """Sink read-back with malformed-line tolerance (A6): the reference
    verifier silently skips unparseable sink lines
    (``producer/verifier_ui.py:94-96``); ``mode=DROPMALFORMED`` under the
    pinned schema is the same contract — a corrupt object never poisons
    the audit."""
    return (
        spark.read.schema(SINK_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def sink_corruption_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(clean_rows, corrupt_rows) for a JSON sink directory — the
    observability counterpart of :func:`read_json_sink`: PERMISSIVE mode
    with ``columnNameOfCorruptRecord`` keeps the bad line text so it can
    be counted (and at scale, quarantined) instead of vanishing."""
    schema = T.StructType(list(SINK_SCHEMA.fields) + [
        T.StructField("_corrupt_record", T.StringType())
    ])
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # caching before splitting on the corrupt column is the documented
        # Spark requirement for referencing _corrupt_record
        .cache()
    )
    corrupt = df.filter(df["_corrupt_record"].isNotNull()).count()
    clean = df.filter(df["_corrupt_record"].isNull()).count()
    df.unpersist()
    return clean, corrupt


def streaming_profile_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer-stream → users projection → SMT transform → JSON file sink
    → read-back. Returns the sink contents (what the reference's verifier
    audits, SURVEY.md §3.3)."""
    src = stream_table(spark, sf_dir, "customer")
    users = users_from_customer(src)
    transformed = profile_transform(users)
    out_dir = scratch_dir("kcm_sink_")
    run_to_files(transformed, out_dir, fmt="json")
    return read_json_sink(spark, out_dir)
