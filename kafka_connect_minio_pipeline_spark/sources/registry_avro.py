"""Confluent-registry Avro source glue (SURVEY.md §3.1 — the one custom
piece the reference surface needs).

Registry wire format (public Confluent spec): 1 magic byte (0x0), 4-byte
big-endian schema id, then the Avro binary payload. OSS Spark has no
registry-aware deserializer, so:

- :func:`split_confluent_frame` peels magic byte + schema id JVM-side
  (pure byte slicing, stays in codegen);
- :func:`decode_avro` turns payload bytes into typed columns. With the
  spark-avro datasource jar present it uses the built-in ``from_avro``
  (JVM, zero Python cost); in this environment (no spark-avro, no Python
  avro libs) it falls back to an Arrow-batched ``mapInPandas`` decoder
  over the pure-spec codec in avro_codec.py — same logical plan shape,
  swap-in upgrade when the jar exists.
- :func:`kafka_avro_stream` is the deployment entry: Kafka source →
  frame split → decode → the profile pipeline attaches downstream
  (requires the spark-sql-kafka jar + a broker; construction is covered
  by tests, execution is exercised via the file-based fixture path in
  tests/test_sources.py).

The schema is fetched once at plan time (the reference does the same via
its registry client, verifier_ui.py:22-29) — never per record.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .avro_codec import decode as avro_decode
from .avro_codec import encode as avro_encode

MAGIC_BYTE = 0

# the reference producer's schema (producer/producer.py:11-38)
USERS_AVRO_SCHEMA: dict[str, Any] = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "user_id", "type": "string"},
        {"name": "first_name", "type": ["null", "string"], "default": None},
        {"name": "last_name", "type": ["null", "string"], "default": None},
        {"name": "email", "type": "string"},
        {"name": "age", "type": ["null", "int"], "default": None},
        {"name": "raw_password_hash", "type": "string"},
        {"name": "internal_tracking_code", "type": "string"},
        {
            "name": "address",
            "type": {
                "type": "record",
                "name": "Address",
                "fields": [
                    {"name": "street", "type": "string"},
                    {"name": "city", "type": "string"},
                    {"name": "zip_code", "type": "string"},
                ],
            },
        },
    ],
}

USERS_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("raw_password_hash", T.StringType()),
        T.StructField("internal_tracking_code", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("zip_code", T.StringType()),
                ]
            ),
        ),
    ]
)


def fetch_schema(
    topic: str,
    registry_url: str,
    timeout_s: float = 5.0,
    fallback: dict[str, Any] | None = USERS_AVRO_SCHEMA,
) -> dict[str, Any]:
    """Plan-time Schema Registry lookup (A3): GET
    ``{registry_url}/subjects/{topic}-value/versions/latest`` (the
    public Confluent REST path the reference verifier hits,
    ``producer/verifier_ui.py:22-29``; the registry "subject" for a
    topic's value schema is ``{topic}-value`` by the default
    TopicNameStrategy) and parse the ``schema`` field — a
    JSON-stringified Avro schema — into a dict.

    Called ONCE when the plan is built, never per record. On any network/
    parse failure the pinned ``fallback`` schema keeps offline runs (CI,
    this container) working; pass ``fallback=None`` to make failures loud
    in deployments where schema evolution must not be papered over.
    """
    import urllib.request

    url = f"{registry_url.rstrip('/')}/subjects/{topic}-value/versions/latest"
    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        return json.loads(body["schema"])
    except Exception:
        if fallback is None:
            raise
        return fallback


def frame(payload: bytes, schema_id: int) -> bytes:
    """Wrap an Avro payload in the Confluent wire format (test fixtures +
    produce-side symmetry)."""
    return bytes([MAGIC_BYTE]) + schema_id.to_bytes(4, "big") + payload


def encode_user(user: dict, schema_id: int = 1) -> bytes:
    return frame(avro_encode(USERS_AVRO_SCHEMA, user), schema_id)


def split_confluent_frame(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JVM-side frame split: adds ``schema_id`` (int) and ``payload``
    (binary), dropping records whose magic byte is wrong (corrupt frames
    must not poison the decoder)."""
    v = F.col(value_col)
    return (
        df.filter(F.expr(f"substring({value_col}, 1, 1)") == bytes([MAGIC_BYTE]))
        .withColumn(
            # Confluent schema ids are UNSIGNED 32-bit; conv() returns the
            # unsigned value, so cast to long (an int cast would wrap ids
            # >= 2^31 negative).
            "schema_id",
            F.conv(F.hex(F.expr(f"substring({value_col}, 2, 4)")), 16, 10).cast("long"),
        )
        .withColumn("payload", F.expr(f"substring({value_col}, 6, length({value_col}) - 5)"))
    )


def _spark_avro_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def decode_avro(
    df: DataFrame,
    avro_schema: dict[str, Any] = USERS_AVRO_SCHEMA,
    spark_schema: T.StructType = USERS_SPARK_SCHEMA,
    payload_col: str = "payload",
    on_error: str = "fail",
) -> DataFrame:
    """payload binary → typed user columns.

    Prefers JVM ``from_avro`` when the spark-avro jar is on the classpath;
    otherwise Arrow-batched Python decode (one UDF call per batch). Either
    way the output schema is identical, so downstream plans don't care.

    ``on_error``: ``"fail"`` (default) poisons the task on an undecodable
    payload — right for pipelines where a bad frame means a broken
    producer; ``"skip"`` drops undecodable records (the A6 sink-side
    skip semantics applied to the source side — one corrupt message on a
    100 TB topic must not kill the job). With the jar, ``from_avro``'s
    PERMISSIVE mode nulls bad records instead; the explicit filter keeps
    the two paths row-equivalent.
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    spark = df.sparkSession
    if _spark_avro_available(spark):
        from pyspark.sql.avro.functions import from_avro

        options = {"mode": "PERMISSIVE"} if on_error == "skip" else {}
        out = df.select(
            from_avro(F.col(payload_col), json.dumps(avro_schema), options).alias("r")
        )
        if on_error == "skip":
            out = out.filter(F.col("r").isNotNull())
        return out.select("r.*")

    passthrough = [f for f in df.schema.fieldNames() if f != payload_col]
    out_schema = T.StructType(
        [df.schema[f] for f in passthrough] + list(spark_schema.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f["name"] for f in avro_schema["fields"]]
        for pdf in batches:
            recs = []
            keep_idx = []
            for i, b in enumerate(pdf[payload_col]):
                try:
                    recs.append(avro_decode(avro_schema, b)[0])
                    keep_idx.append(i)
                except Exception:
                    if on_error == "fail":
                        raise
            if not recs:
                # yielding a 0-row object-dtype frame breaks Arrow's
                # struct-column inference; yield nothing instead
                continue
            cols = {n: [r[n] for r in recs] for n in names}
            out = pd.DataFrame(cols)
            for f in reversed(passthrough):
                out.insert(0, f, pdf[f].values[keep_idx])
            yield out

    return df.mapInPandas(run, schema=out_schema)


def decode_kafka_frames(
    raw: DataFrame,
    avro_schema: dict[str, Any] = USERS_AVRO_SCHEMA,
    spark_schema: T.StructType = USERS_SPARK_SCHEMA,
) -> DataFrame:
    """Everything downstream of the Kafka socket (A2 post-source path +
    A16 meta passthrough): Confluent frame split → registry-id/payload
    extraction → Avro decode, with the Kafka metadata columns (key /
    partition / timestamp) carried beside the decoded fields.

    Factored out of :func:`kafka_avro_stream` so the bytes-exact
    integration fixture (tests/test_sources.py) can drive the IDENTICAL
    plan from a recorded-bytes file stream shaped like the Kafka source
    relation — leaving only the socket itself environment-gated. ``raw``
    must carry the Kafka source's columns (key binary, value binary,
    partition int, timestamp timestamp); batch or streaming both work
    (the transformation is stateless)."""
    framed = split_confluent_frame(raw, "value")
    meta = framed.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("partition").alias("kafka_partition"),
        F.col("timestamp").alias("kafka_timestamp"),
        "schema_id",
        "payload",
    )
    return decode_avro(meta, avro_schema, spark_schema)


def kafka_avro_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    avro_schema: dict[str, Any] = USERS_AVRO_SCHEMA,
    spark_schema: T.StructType = USERS_SPARK_SCHEMA,
    starting_offsets: str = "earliest",
    registry_url: str | None = None,
) -> DataFrame:
    """The deployment source (SURVEY.md A1-A2): Kafka topic → frame split
    → Avro decode, keeping Kafka metadata columns (A16) alongside the
    payload. Needs the spark-sql-kafka package on the classpath.

    With ``registry_url`` set, the latest schema for ``{topic}-value`` is
    fetched at plan time (A3, :func:`fetch_schema`) instead of using the
    pinned constant — schema evolution then reaches the decoder without a
    code change."""
    if registry_url is not None:
        avro_schema = fetch_schema(topic, registry_url)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_frames(raw, avro_schema, spark_schema)
