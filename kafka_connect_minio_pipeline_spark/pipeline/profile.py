"""The reference pipeline's per-record dataflow, Spark-first.

Reference semantics (SURVEY.md §2.2, operators A8-A16), from
``/root/reference/smt/src/main/java/org/dorjee/smt/UserProfileTransform.java``:

- filter: DROP a record iff ``first_name`` or ``last_name`` is null or
  whitespace-blank (UserProfileTransform.java:30-37);
- projection: drop ``raw_password_hash`` and ``internal_tracking_code``
  (UserProfileTransform.java:40,44-48);
- mask: replace every ``email`` with the literal ``redacted@email.com``
  (UserProfileTransform.java:61-62);
- derive: ``full_name = first_name + " " + last_name`` (line 50,69),
  ``is_adult = age != null && age >= 18`` — null age → **false**, not null
  (lines 51,70-71), ``processed_ts = now()`` ISO string (lines 52,72).

The reference applies these one ConnectRecord at a time in a Java SMT; here
the whole dataflow is a single narrow (shuffle-free) Catalyst projection +
filter, which whole-stage-codegens into one fused loop — the idiomatic Spark
translation of a per-record transform chain. At 100 TB this stays embarrassingly
parallel: no shuffle, filter and column pruning push into the scan.

The ``users`` table itself does not exist in the driver's test data, so
:func:`users_from_customer` derives a deterministic users-shaped projection
from ``customer`` (same trick as the reference's synthetic producer,
``producer/producer.py:49-61``, which seeds known-bad rows — we seed
null/blank/boundary cases from ``c_custkey`` so every SMT code path is
exercised). The matching DuckDB SQL lives in USERS_SQL / TRANSFORM_SQL /
RECONCILE_SQL and mirrors the logic 1:1 for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# users projection (test-data adapter, deterministic from c_custkey)
# ---------------------------------------------------------------------------

REDACTED_EMAIL = "redacted@email.com"
DROPPED_COLUMNS = ("raw_password_hash", "internal_tracking_code")


def users_from_customer(customer: DataFrame) -> DataFrame:
    """Deterministic users-shaped projection of ``customer``.

    Seeds the edge cases from FIXTURES.md §1 by ``c_custkey % 20``:
    mod 2 → empty first_name (reference's "bad" producer row),
    mod 4 → null first_name, mod 6 → whitespace-blank last_name,
    mod 14 → null last_name, mod 8 → null age (is_adult=false path).
    """
    mod = F.col("c_custkey") % 20
    key_str = F.col("c_custkey").cast("string")
    return customer.select(
        key_str.alias("user_id"),
        F.when(mod == 2, F.lit(""))
        .when(mod == 4, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("First"), key_str))
        .alias("first_name"),
        F.when(mod == 6, F.lit("   "))
        .when(mod == 14, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Last"), key_str))
        .alias("last_name"),
        F.concat(F.lit("user"), key_str, F.lit("@example.com")).alias("email"),
        F.when(mod == 8, F.lit(None).cast("int"))
        .otherwise((F.col("c_custkey") % 90).cast("int"))
        .alias("age"),
        F.lit("secret123").alias("raw_password_hash"),
        F.lit("TRACK_XYZ").alias("internal_tracking_code"),
    )


# Shared CTE text for the DuckDB oracle — must stay semantically identical
# to users_from_customer above.
USERS_SQL = """
    SELECT
        CAST(c_custkey AS VARCHAR) AS user_id,
        CASE WHEN c_custkey % 20 = 2 THEN ''
             WHEN c_custkey % 20 = 4 THEN NULL
             ELSE 'First' || CAST(c_custkey AS VARCHAR) END AS first_name,
        CASE WHEN c_custkey % 20 = 6 THEN '   '
             WHEN c_custkey % 20 = 14 THEN NULL
             ELSE 'Last' || CAST(c_custkey AS VARCHAR) END AS last_name,
        'user' || CAST(c_custkey AS VARCHAR) || '@example.com' AS email,
        CASE WHEN c_custkey % 20 = 8 THEN NULL
             ELSE CAST(c_custkey % 90 AS INTEGER) END AS age,
        'secret123' AS raw_password_hash,
        'TRACK_XYZ' AS internal_tracking_code
    FROM customer
"""


# ---------------------------------------------------------------------------
# the transform itself (A8-A16)
# ---------------------------------------------------------------------------

# Java String.trim() (the reference SMT's blank test,
# UserProfileTransform.java:30-34) strips every char <= U+0020 — not just
# ASCII space. "non-blank after trim" is therefore "contains any char
# > U+0020", which both Java regex and DuckDB's RE2 express identically
# (F.trim / DuckDB TRIM would strip only ' ' and keep a "\t" name the
# reference drops).
_NONBLANK_RE = "[^\\x00-\\x20]"


def _name_present(c: Column) -> Column:
    """Reference null/blank test: non-null AND non-empty after Java trim
    (UserProfileTransform.java:30-34)."""
    return c.isNotNull() & c.rlike(_NONBLANK_RE)


def profile_transform(users: DataFrame, include_processed_ts: bool = False) -> DataFrame:
    """A8-A16 as one narrow Catalyst pipeline.

    ``include_processed_ts`` is off by default because the reference's
    ``processed_ts = Instant.now()`` (UserProfileTransform.java:52) is
    nondeterministic and therefore excluded from value-hash oracles
    (SURVEY.md A14).
    """
    out = (
        users
        # A9 — filter on blank/null names (drop ≙ SMT returning null)
        .filter(_name_present(F.col("first_name")) & _name_present(F.col("last_name")))
        # A10 — projection: sensitive columns never reach the sink
        .drop(*DROPPED_COLUMNS)
        # A11 — constant mask
        .withColumn("email", F.lit(REDACTED_EMAIL))
        # A12 — derived concat
        .withColumn(
            "full_name",
            F.concat(F.col("first_name"), F.lit(" "), F.col("last_name")),
        )
        # A13 — null age → false (NOT null): coalesce matches the Java
        # `age != null && age >= 18` exactly
        .withColumn("is_adult", F.coalesce(F.col("age") >= 18, F.lit(False)))
    )
    if include_processed_ts:
        # A14 — ISO-8601 wall-clock string, matching Instant.toString() shape
        out = out.withColumn(
            "processed_ts",
            F.date_format(
                F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            ),
        )
    return out


def profile_transform_records(records: DataFrame) -> DataFrame:
    """Record-level transform with tombstone passthrough (A8).

    Input mirrors a decoded Kafka topic: ``key`` plus a NULLABLE ``value``
    struct of user fields. The reference SMT forwards a record whose value
    is null unchanged (``UserProfileTransform.java:25`` — Kafka tombstones
    must reach the sink so downstream compaction deletes the key); here a
    tombstone survives as a key-only row (all value fields null, flagged
    ``is_tombstone``) while live records get the A9-A13 dataflow. One
    narrow single-scan projection — the conditional transform stays in
    whole-stage codegen, no union of two scans.
    """
    v = F.col("value")
    is_tomb = v.isNull()
    live = ~is_tomb
    keep = is_tomb | (_name_present(v["first_name"]) & _name_present(v["last_name"]))
    return records.filter(keep).select(
        F.col("key"),
        is_tomb.alias("is_tombstone"),
        v["user_id"].alias("user_id"),
        v["first_name"].alias("first_name"),
        v["last_name"].alias("last_name"),
        F.when(live, F.lit(REDACTED_EMAIL)).alias("email"),
        v["age"].alias("age"),
        F.when(live, F.concat(v["first_name"], F.lit(" "), v["last_name"])).alias(
            "full_name"
        ),
        F.when(live, F.coalesce(v["age"] >= 18, F.lit(False))).alias("is_adult"),
    )


TRANSFORM_SQL_BODY = """
    SELECT
        user_id,
        first_name,
        last_name,
        'redacted@email.com' AS email,
        age,
        first_name || ' ' || last_name AS full_name,
        COALESCE(age >= 18, FALSE) AS is_adult
    FROM users
    WHERE first_name IS NOT NULL AND regexp_matches(first_name, '[^\\x00-\\x20]')
      AND last_name  IS NOT NULL AND regexp_matches(last_name,  '[^\\x00-\\x20]')
"""

TRANSFORM_SQL = f"WITH users AS ({USERS_SQL}) {TRANSFORM_SQL_BODY}"


# ---------------------------------------------------------------------------
# reconciliation (verifier analytics, A17-A23)
# ---------------------------------------------------------------------------

def reconcile(source: DataFrame, sink: DataFrame) -> DataFrame:
    """Source-vs-sink audit: the reference verifier's per-key classification
    (``producer/verifier_ui.py:101-138``) as one full-outer join + CASE.

    The verifier builds two dicts and walks the union of key sets in Python;
    here the same key-space union IS the full-outer join, and the 6-way
    classification is a ``when`` chain — including the reference's
    sensitive-field arm (``verifier_ui.py:126``: a sink record that still
    carries ``raw_password_hash`` is ``FAILED_HASH_SURVIVED``). A correct
    sink never has that column (A10 drops it), so the arm is tested by
    seeding a corrupted sink. Scale: both sides hash-partition on
    user_id; at 100 TB this is one co-partitioned shuffle, no driver state.
    """
    src = source.select(
        F.col("user_id"),
        F.col("first_name").alias("src_first_name"),
        F.col("last_name").alias("src_last_name"),
    )
    # verifier_ui.py:126 tests dict-key presence; the columnar equivalent is
    # "column exists AND value non-null". A sink written by the correct
    # pipeline lacks the column entirely → constant-folds to false.
    sink_raw_hash = (
        F.col("raw_password_hash")
        if "raw_password_hash" in sink.columns
        else F.lit(None).cast("string")
    )
    snk = sink.select(
        F.col("user_id"),
        F.col("email").alias("sink_email"),
        sink_raw_hash.alias("sink_raw_hash"),
        F.lit(True).alias("sink_present"),
    )
    name_blank = (
        F.col("src_first_name").isNull()
        | ~F.col("src_first_name").rlike(_NONBLANK_RE)
        | F.col("src_last_name").isNull()
        | ~F.col("src_last_name").rlike(_NONBLANK_RE)
    )
    src = src.withColumn("_src_present", F.lit(True))
    joined = src.join(snk, "user_id", "full_outer")
    status = (
        F.when(F.col("_src_present").isNull(), F.lit("ORPHAN_IN_SINK"))
        .when(F.col("sink_present").isNull() & name_blank, F.lit("FILTERED_AS_EXPECTED"))
        .when(F.col("sink_present").isNull(), F.lit("MISSING_IN_SINK"))
        .when(F.col("sink_raw_hash").isNotNull(), F.lit("FAILED_HASH_SURVIVED"))
        .when(F.col("sink_email") != REDACTED_EMAIL, F.lit("FAILED_EMAIL_NOT_MASKED"))
        .otherwise(F.lit("OK"))
    )
    return joined.select("user_id", status.alias("status"))


RECONCILE_SQL = f"""
    WITH users AS ({USERS_SQL}),
    sink AS ({TRANSFORM_SQL_BODY}),
    src AS (
        SELECT user_id, first_name AS src_first_name,
               last_name AS src_last_name, TRUE AS _src_present
        FROM users
    ),
    snk AS (
        SELECT user_id, email AS sink_email,
               CAST(NULL AS VARCHAR) AS sink_raw_hash,  -- A10 dropped it
               TRUE AS sink_present
        FROM sink
    )
    SELECT
        COALESCE(src.user_id, snk.user_id) AS user_id,
        CASE
            WHEN src._src_present IS NULL THEN 'ORPHAN_IN_SINK'
            WHEN snk.sink_present IS NULL AND (
                 src.src_first_name IS NULL
                 OR NOT regexp_matches(src.src_first_name, '[^\\x00-\\x20]')
                 OR src.src_last_name IS NULL
                 OR NOT regexp_matches(src.src_last_name, '[^\\x00-\\x20]'))
                THEN 'FILTERED_AS_EXPECTED'
            WHEN snk.sink_present IS NULL THEN 'MISSING_IN_SINK'
            WHEN snk.sink_raw_hash IS NOT NULL THEN 'FAILED_HASH_SURVIVED'
            WHEN snk.sink_email <> 'redacted@email.com'
                THEN 'FAILED_EMAIL_NOT_MASKED'
            ELSE 'OK'
        END AS status
    FROM src FULL OUTER JOIN snk USING (user_id)
"""
