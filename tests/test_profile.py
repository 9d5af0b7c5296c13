"""Golden-fixture tests for the reference pipeline semantics.

Mirrors the reference's own verification methodology (SURVEY.md §5): a
deterministic synthetic input with seeded bad rows, checked against the
four golden rules from the reference README (completeness, intentional
filtering, sensitive-column absence, email redaction), extended with the
edge rows from FIXTURES.md §1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from kafka_connect_minio_pipeline_spark.pipeline.profile import (
    DROPPED_COLUMNS,
    REDACTED_EMAIL,
    profile_transform,
    reconcile,
    users_from_customer,
)

USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("email", T.StringType(), False),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("raw_password_hash", T.StringType(), False),
        T.StructField("internal_tracking_code", T.StringType(), False),
    ]
)

# FIXTURES.md §1 golden rows
GOLDEN = [
    ("id_0", "User0", "Doe0", 20, True),     # kept, adult
    ("id_1", "User1", "Doe1", 21, True),     # kept
    ("id_2", "", "Doe2", 22, None),          # filtered: empty first
    ("id_3", "User3", "Doe3", 23, True),     # kept
    ("id_4", None, "Doe4", 30, None),        # filtered: null first
    ("id_5", "User5", "   ", 17, None),      # filtered: blank last
    ("id_6", "User6", "Doe6", 17, False),    # kept, minor (boundary 17<18)
    ("id_7", "User7", "Doe7", 18, True),     # kept, boundary 18>=18
    ("id_8", "User8", "Doe8", None, False),  # kept, null age -> false
]


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        Row(
            user_id=uid,
            first_name=fn,
            last_name=ln,
            email=f"{uid}@real.com",
            age=age,
            raw_password_hash="secret123",
            internal_tracking_code="TRACK_XYZ",
        )
        for uid, fn, ln, age, _ in GOLDEN
    ]
    return spark.createDataFrame(rows, USERS_SCHEMA)


def test_filter_and_survivors(spark, users):
    out = profile_transform(users)
    kept = {r["user_id"] for r in out.select("user_id").collect()}
    assert kept == {"id_0", "id_1", "id_3", "id_6", "id_7", "id_8"}


def test_sensitive_columns_dropped(spark, users):
    out = profile_transform(users)
    for c in DROPPED_COLUMNS:
        assert c not in out.columns


def test_email_always_redacted(spark, users):
    out = profile_transform(users)
    assert out.filter(F.col("email") != REDACTED_EMAIL).count() == 0


def test_is_adult_truth_table(spark, users):
    out = {r["user_id"]: r["is_adult"] for r in profile_transform(users).collect()}
    expected = {uid: adult for uid, _, _, _, adult in GOLDEN if adult is not None}
    assert out == expected
    # null age must be False, never null (UserProfileTransform.java:70-71)
    assert out["id_8"] is False


def test_full_name_concat(spark, users):
    out = {r["user_id"]: r["full_name"] for r in profile_transform(users).collect()}
    assert out["id_0"] == "User0 Doe0"


def test_output_schema_synthesis(spark, users):
    """A15: input schema minus dropped plus derived, in order."""
    out = profile_transform(users, include_processed_ts=True)
    assert out.columns == [
        "user_id", "first_name", "last_name", "email", "age",
        "full_name", "is_adult", "processed_ts",
    ]
    fields = dict(zip(out.schema.names, [f.dataType for f in out.schema.fields]))
    assert fields["is_adult"] == T.BooleanType()
    assert fields["processed_ts"] == T.StringType()


def test_reconcile_classification(spark, users):
    out = reconcile(users, profile_transform(users))
    by_status = {r["user_id"]: r["status"] for r in out.collect()}
    assert by_status["id_2"] == "FILTERED_AS_EXPECTED"
    assert by_status["id_4"] == "FILTERED_AS_EXPECTED"
    assert by_status["id_5"] == "FILTERED_AS_EXPECTED"
    for uid in ("id_0", "id_1", "id_3", "id_6", "id_7", "id_8"):
        assert by_status[uid] == "OK"
    assert out.count() == 9


def test_java_trim_blank_fidelity(spark):
    """The reference's blank test is Java String.trim(), which strips every
    char <= U+0020 — a "\\t" or "\\n" name must be dropped exactly like
    "   " (ADVICE r1). DuckDB's regexp_matches mirror must agree."""
    rows = [
        Row(user_id="tab", first_name="\t", last_name="Doe"),
        Row(user_id="newline", first_name="\n \t", last_name="Doe"),
        Row(user_id="kept", first_name="a", last_name="Doe"),
        Row(user_id="inner", first_name=" a ", last_name="Doe"),
    ]
    df = spark.createDataFrame(rows).select(
        "user_id", "first_name", "last_name",
        F.lit("e@x.com").alias("email"), F.lit(20).alias("age"),
        F.lit("h").alias("raw_password_hash"),
        F.lit("t").alias("internal_tracking_code"),
    )
    kept = {r["user_id"] for r in profile_transform(df).collect()}
    assert kept == {"kept", "inner"}

    import duckdb

    # the oracle-side pattern must classify identically
    dres = duckdb.sql(
        r"""SELECT s, regexp_matches(s, '[^\x00-\x20]') FROM
            (VALUES (chr(9)), (chr(10) || ' '), ('a'), (' a ')) t(s)"""
    ).fetchall()
    assert {s: m for s, m in dres} == {"\t": False, "\n ": False, "a": True, " a ": True}


def test_reconcile_hash_survival_arm(spark, users):
    """A22: a sink record that still carries raw_password_hash must be
    flagged FAILED_HASH_SURVIVED (reference verifier_ui.py:126). Seed the
    violation by re-attaching the column for one key."""
    good = profile_transform(users)
    corrupted = good.withColumn(
        "raw_password_hash",
        F.when(F.col("user_id") == "id_1", F.lit("secret123")),
    )
    out = {r["user_id"]: r["status"] for r in reconcile(users, corrupted).collect()}
    assert out["id_1"] == "FAILED_HASH_SURVIVED"
    assert out["id_0"] == "OK"
    # severity order: hash survival outranks a bad email mask
    both = good.withColumn("raw_password_hash", F.lit("secret123")).withColumn(
        "email", F.lit("leak@real.com")
    )
    out2 = {r["user_id"]: r["status"] for r in reconcile(users, both).collect()}
    assert set(out2[u] for u in ("id_0", "id_1")) == {"FAILED_HASH_SURVIVED"}


def test_tombstone_passthrough(spark):
    """A8: a record with a null value (Kafka tombstone) must be forwarded
    as a key-only row, not dropped (UserProfileTransform.java:25)."""
    from kafka_connect_minio_pipeline_spark.pipeline.profile import (
        profile_transform_records,
    )

    value_t = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("first_name", T.StringType()),
            T.StructField("last_name", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("age", T.IntegerType()),
        ]
    )
    schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", value_t, True)]
    )
    rows = [
        ("k_live", ("u1", "Ann", "Lee", "a@x.com", 30)),
        ("k_tomb", None),                                  # tombstone
        ("k_blank", ("u2", "  ", "Lee", "b@x.com", 40)),   # filtered
    ]
    out = profile_transform_records(spark.createDataFrame(rows, schema))
    got = {r["key"]: r.asDict() for r in out.collect()}
    assert set(got) == {"k_live", "k_tomb"}  # blank filtered, tombstone kept
    tomb = got["k_tomb"]
    assert tomb["is_tombstone"] is True
    assert all(
        tomb[c] is None
        for c in ("user_id", "first_name", "email", "age", "full_name", "is_adult")
    )
    live = got["k_live"]
    assert live["is_tombstone"] is False
    assert live["email"] == REDACTED_EMAIL
    assert live["full_name"] == "Ann Lee"
    assert live["is_adult"] is True


def test_users_projection_covers_all_branches(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.tables import load

    u = users_from_customer(load(spark, sf_dir, "customer"))
    mods = u.withColumn("m", F.col("user_id").cast("long") % 20)
    assert mods.filter(F.col("first_name") == "").count() > 0
    assert mods.filter(F.col("first_name").isNull()).count() > 0
    assert mods.filter(F.col("last_name") == "   ").count() > 0
    assert mods.filter(F.col("age").isNull()).count() > 0
