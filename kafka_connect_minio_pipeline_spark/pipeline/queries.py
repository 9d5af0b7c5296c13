"""Registered queries for the reference pipeline surface (SURVEY §2.2-2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import WS_CLASS
from ..registry import Query
from ..tables import EVENT_TIME_BOUNDS, load, spread
from .profile import (
    RECONCILE_SQL,
    TRANSFORM_SQL,
    USERS_SQL,
    profile_transform,
    reconcile,
    users_from_customer,
)


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return users_from_customer(load(spark, sf_dir, "customer"))


def q_profile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full SMT dataflow A8-A16 (minus nondeterministic
    processed_ts, excluded from hashing per SURVEY A14)."""
    return profile_transform(_users(spark, sf_dir))


def q_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verifier analytics A17-A23: source-vs-sink classification."""
    users = _users(spark, sf_dir)
    return reconcile(users, profile_transform(users))


def q_profile_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 as a driver-graded query: the record stream with seeded Kafka
    tombstones (every 10th key carries a null value) pushed through
    :func:`profile_transform_records` — tombstones pass through as
    key-only rows (reference ``UserProfileTransform.java:25``), live
    records get the SMT dataflow."""
    from pyspark.sql import functions as F

    from .profile import profile_transform_records

    users = _users(spark, sf_dir)
    is_tomb = (F.col("user_id").cast("long") % 10) == 0
    records = users.select(
        F.col("user_id").alias("key"),
        F.when(
            ~is_tomb,
            F.struct(
                F.col("user_id"),
                F.col("first_name"),
                F.col("last_name"),
                F.col("email"),
                F.col("age"),
            ),
        ).alias("value"),
    )
    return profile_transform_records(records)


TOMBSTONES_SQL = f"""
    WITH users AS ({USERS_SQL}),
    recs AS (
        SELECT user_id AS key,
               CAST(user_id AS BIGINT) % 10 = 0 AS is_tombstone,
               user_id, first_name, last_name, email, age
        FROM users)
    SELECT key, is_tombstone,
        CASE WHEN is_tombstone THEN NULL ELSE user_id END AS user_id,
        CASE WHEN is_tombstone THEN NULL ELSE first_name END AS first_name,
        CASE WHEN is_tombstone THEN NULL ELSE last_name END AS last_name,
        CASE WHEN is_tombstone THEN NULL
             ELSE 'redacted@email.com' END AS email,
        CASE WHEN is_tombstone THEN NULL ELSE age END AS age,
        CASE WHEN is_tombstone THEN NULL
             ELSE first_name || ' ' || last_name END AS full_name,
        CASE WHEN is_tombstone THEN NULL
             ELSE COALESCE(age >= 18, FALSE) END AS is_adult
    FROM recs
    WHERE is_tombstone OR (
        first_name IS NOT NULL AND regexp_matches(first_name, '[^\\x00-\\x20]')
        AND last_name IS NOT NULL AND regexp_matches(last_name, '[^\\x00-\\x20]'))
"""


_CITIES = ("Springfield", "Riverton", "Lakeside", "Hillview", "Brookfield")


def q_profile_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-record passthrough (SURVEY §1.1: the Avro ``Address``
    sub-record, reference ``producer/producer.py:24-35``): a StructType
    ``address`` column is attached to the users projection, rides through
    the whole SMT dataflow untouched (the reference copies non-dropped
    fields as-is, ``UserProfileTransform.java:59-65``), and is read back
    by field access. Flattened in the final select only because the
    cross-engine hash compares scalars; the plan carries the struct."""
    from pyspark.sql import functions as F

    from .profile import profile_transform, users_from_customer

    users = users_from_customer(load(spark, sf_dir, "customer"))
    key = F.col("user_id").cast("long")
    city = F.element_at(
        F.array(*[F.lit(c) for c in _CITIES]), (key % 5 + 1).cast("int")
    )
    users = users.withColumn(
        "address",
        F.struct(
            F.concat(F.col("user_id"), F.lit(" Main St")).alias("street"),
            city.alias("city"),
            F.lpad((key % 100000).cast("string"), 5, "0").alias("zip_code"),
        ),
    )
    out = profile_transform(users)
    return out.select(
        "user_id",
        "full_name",
        "is_adult",
        F.col("address.street").alias("street"),
        F.col("address.city").alias("city"),
        F.col("address.zip_code").alias("zip_code"),
    )


NESTED_SQL = f"""
    WITH t AS ({TRANSFORM_SQL})
    SELECT user_id, full_name, is_adult,
           user_id || ' Main St' AS street,
           CASE CAST(user_id AS BIGINT) % 5
                WHEN 0 THEN 'Springfield' WHEN 1 THEN 'Riverton'
                WHEN 2 THEN 'Lakeside' WHEN 3 THEN 'Hillview'
                ELSE 'Brookfield' END AS city,
           LPAD(CAST(CAST(user_id AS BIGINT) % 100000 AS VARCHAR), 5, '0')
               AS zip_code
    FROM t
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data cleaning pipeline over ``documents``:
    quality gate → exact dedup (keep canonical) → per-language funnel.

    One declarative plan, entirely narrow until the final fingerprint
    window + tiny groupBy — the shape a 100 TB corpus-cleaning job takes
    (the operators compose; nothing materializes between stages):
    - quality pass: composite score ≥ 0.5 and ≥ 5 tokens (same features
      as text_quality);
    - dedup among survivors only: canonical = min doc_id per normalized
      token-set fingerprint, computed as a conditional window min so the
      filter and dedup fuse into one pass;
    - funnel counts per language: raw → quality-passing → kept.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.dedup import WS_CLASS, WS_EXPR, tokens

    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    from ..operators.text import STOPWORDS

    stop_in = ",".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(
        F.expr(
            f"filter(filter(split(lower(text), '{WS_EXPR}+'), x -> x != ''), t -> t IN ({stop_in}))"
        )
    )
    # r5 ANSI guard: one empty/whitespace-only doc must not kill the
    # whole corpus job with DIVIDE_BY_ZERO; the score is undefined there
    # (NULL), and q_pass's `AND n_tokens >= 5` collapses NULL to FALSE.
    score = F.when(
        (n_tokens > 0) & (n_chars > 0),
        F.round(
            (alpha_chars / n_chars) * 0.5
            + (n_stop / n_tokens) * 0.3
            + F.least(n_tokens / F.lit(32.0), F.lit(1.0)) * 0.2,
            6,
        ),
    )
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    staged = docs.select(
        "doc_id",
        "lang",
        ((score >= 0.5) & (n_tokens >= 5)).alias("q_pass"),
        fp.alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint")
    flagged = staged.select(
        "lang",
        "q_pass",
        (
            F.col("q_pass")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("q_pass"), F.col("doc_id"))).over(w)
            )
        ).alias("kept"),
    )
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("q_pass").cast("long")).alias("n_quality"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    )


CORPUS_CLEAN_SQL = f"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '{WS_CLASS}+'),
                           x -> x <> '') AS toks,
               LENGTH(text) AS n_chars,
               LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
        FROM documents),
    staged AS (
        SELECT doc_id, lang,
               (CASE WHEN LEN(toks) > 0 AND n_chars > 0 THEN
                    ROUND((alpha_chars * 1.0 / n_chars) * 0.5
                          + (LEN(LIST_FILTER(toks, s -> s IN
                                ('the','a','of','to','and','in','is','it'))) * 1.0
                             / LEN(toks)) * 0.3
                          + LEAST(LEN(toks) / 32.0, 1.0) * 0.2, 6) END >= 0.5
                AND LEN(toks) >= 5) AS q_pass,
               md5(array_to_string(list_sort(list_distinct(toks)), ' '))
                   AS fingerprint
        FROM t),
    flagged AS (
        SELECT lang, q_pass,
               (q_pass AND doc_id = MIN(CASE WHEN q_pass THEN doc_id END)
                    OVER (PARTITION BY fingerprint)) AS kept
        FROM staged)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flagged GROUP BY lang
"""


def q_pipeline_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report across the star schema: referential-integrity
    orphans, domain violations, and null/blank rates — one row per check
    (check_name, n_total, n_violations, violation_rate). The audit every
    warehouse runs after each load; generalizes the reference verifier's
    single equality metric (SURVEY A21-A22) into a check battery.

    Each FK check is a LEFT ANTI join counted (broadcast when the parent
    side is dimension-sized; sort-merge + AQE for fact⨝fact); domain and
    null checks are conditional aggregates fused into one pass per table
    scanned. Output cardinality = number of checks, each check one scan
    of its subject table — at 100 TB run the battery per partition-day
    and union, same plan per slice.
    """
    from pyspark.sql import functions as F

    from ..tables import EVENT_TIME_BOUNDS, _has_nonfinite, _has_out_of_range, load_raw

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    # the audit reads the PRE-contract view: load() enforces the NOT
    # NULL required-field contract, so it could never see the very
    # violations these checks exist to count
    events = load_raw(spark, sf_dir, "events")
    documents = load_raw(spark, sf_dir, "documents")
    embeddings = load_raw(spark, sf_dir, "embeddings")

    def key_unique(name: str, df: DataFrame, key: str) -> DataFrame:
        agg = df.agg(
            F.count("*").alias("n_total"),
            (F.count("*") - F.countDistinct(key)).alias("n_violations"),
        )
        return agg.select(
            F.lit(name).alias("check_name"),
            "n_total",
            "n_violations",
            F.when(
                F.col("n_total") > 0,
                F.round(F.col("n_violations") / F.col("n_total"), 6),
            ).alias("violation_rate"),
        )

    def check(name: str, total_df: DataFrame, viol_df: DataFrame) -> DataFrame:
        t = total_df.agg(F.count("*").alias("n_total"))
        v = viol_df.agg(F.count("*").alias("n_violations"))
        return t.crossJoin(F.broadcast(v)).select(
            F.lit(name).alias("check_name"),
            "n_total",
            "n_violations",
            # CASE-guard: an empty table under check must read as a NULL
            # rate, not an ANSI divide-by-zero crash of the whole report
            F.when(
                F.col("n_total") > 0,
                F.round(F.col("n_violations") / F.col("n_total"), 6),
            ).alias("violation_rate"),
        )

    orders_orphans = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    )
    li_orphans = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    )
    checks = [
        check("orders_orphan_custkey", orders, orders_orphans),
        check("lineitem_orphan_orderkey", lineitem, li_orphans),
        check(
            "lineitem_nonpositive_qty",
            lineitem,
            lineitem.filter(F.col("l_quantity") <= 0),
        ),
        check(
            "lineitem_discount_range",
            lineitem,
            lineitem.filter(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
            ),
        ),
        check(
            "customer_blank_name",
            customer,
            customer.filter(
                F.col("c_name").isNull() | (F.trim(F.col("c_name")) == "")
            ),
        ),
        check("events_null_user", events, events.filter(F.col("user_id").isNull())),
        check(
            "documents_empty_text",
            documents,
            documents.filter(F.length(F.col("text")) == 0),
        ),
        # the ingestion contract's own accounting (tables.REQUIRED_FIELDS):
        # rates the loader silently enforces must be visible HERE
        check(
            "documents_null_text",
            documents,
            documents.filter(F.col("text").isNull()),
        ),
        check("events_null_ts", events, events.filter(F.col("ts").isNull())),
        check(
            "events_ts_out_of_range",
            events,
            events.filter(
                F.col("ts").isNotNull()
                & ((F.col("ts") < EVENT_TIME_BOUNDS[0])
                   | (F.col("ts") >= EVENT_TIME_BOUNDS[1]))
            ),
        ),
        check(
            "embeddings_null_vector",
            embeddings,
            embeddings.filter(F.col("embedding").isNull()),
        ),
        check(
            "events_nonfinite_value",
            events,
            events.filter(
                F.col("value").isNotNull()
                & (F.isnan(F.col("value"))
                   | (F.abs(F.col("value")) == F.lit(float("inf"))))
            ),
        ),
        check(
            "embeddings_nonfinite_vector",
            embeddings,
            embeddings.filter(
                F.col("embedding").isNotNull()
                & _has_nonfinite(F.col("embedding"))
            ),
        ),
        check(
            "embeddings_component_out_of_range",
            embeddings,
            embeddings.filter(
                F.col("embedding").isNotNull()
                & _has_out_of_range(F.col("embedding"))
            ),
        ),
        # primary-key uniqueness: a duplicated key silently FANS OUT
        # every downstream join — the corruption mode no per-row guard
        # can catch; violations = surplus rows beyond one per key
        key_unique("documents_dup_doc_id", documents, "doc_id"),
        key_unique("events_dup_event_id", events, "event_id"),
        key_unique("embeddings_dup_vec_id", embeddings, "vec_id"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


DQ_CHECKS_SQL = f"""
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_total,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_violations,
           ROUND((SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey)) * 1.0
                 / (SELECT COUNT(*) FROM orders), 6) AS violation_rate
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           ROUND((SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) * 1.0
                 / (SELECT COUNT(*) FROM lineitem), 6)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_quantity <= 0),
           ROUND((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) * 1.0
                 / (SELECT COUNT(*) FROM lineitem), 6)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.5),
           ROUND((SELECT COUNT(*) FROM lineitem
                  WHERE l_discount < 0 OR l_discount > 0.5) * 1.0
                 / (SELECT COUNT(*) FROM lineitem), 6)
    UNION ALL
    SELECT 'customer_blank_name',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
            WHERE c_name IS NULL OR TRIM(c_name) = ''),
           ROUND((SELECT COUNT(*) FROM customer
                  WHERE c_name IS NULL OR TRIM(c_name) = '') * 1.0
                 / (SELECT COUNT(*) FROM customer), 6)
    UNION ALL
    SELECT 'events_null_user',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE user_id IS NULL),
           ROUND((SELECT COUNT(*) FROM events WHERE user_id IS NULL) * 1.0
                 / (SELECT COUNT(*) FROM events), 6)
    UNION ALL
    SELECT 'documents_empty_text',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
            WHERE LENGTH(text) = 0),
           ROUND((SELECT COUNT(*) FROM documents WHERE LENGTH(text) = 0) * 1.0
                 / (SELECT COUNT(*) FROM documents), 6)
    UNION ALL
    SELECT 'documents_null_text',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE text IS NULL),
           ROUND((SELECT COUNT(*) FROM documents WHERE text IS NULL) * 1.0
                 / (SELECT COUNT(*) FROM documents), 6)
    UNION ALL
    SELECT 'events_null_ts',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE ts IS NULL),
           ROUND((SELECT COUNT(*) FROM events WHERE ts IS NULL) * 1.0
                 / (SELECT COUNT(*) FROM events), 6)
    UNION ALL
    SELECT 'events_ts_out_of_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE ts IS NOT NULL AND (ts < TIMESTAMP '{EVENT_TIME_BOUNDS[0]}'
                                      OR ts >= TIMESTAMP '{EVENT_TIME_BOUNDS[1]}')),
           ROUND((SELECT COUNT(*) FROM events
                  WHERE ts IS NOT NULL AND (ts < TIMESTAMP '{EVENT_TIME_BOUNDS[0]}'
                                            OR ts >= TIMESTAMP '{EVENT_TIME_BOUNDS[1]}'))
                 * 1.0 / (SELECT COUNT(*) FROM events), 6)
    UNION ALL
    SELECT 'embeddings_null_vector',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
            WHERE embedding IS NULL),
           ROUND((SELECT COUNT(*) FROM embeddings WHERE embedding IS NULL) * 1.0
                 / (SELECT COUNT(*) FROM embeddings), 6)
    UNION ALL
    SELECT 'events_nonfinite_value',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
            WHERE value IS NOT NULL AND NOT isfinite(value)),
           ROUND((SELECT COUNT(*) FROM events
                  WHERE value IS NOT NULL AND NOT isfinite(value)) * 1.0
                 / (SELECT COUNT(*) FROM events), 6)
    UNION ALL
    SELECT 'embeddings_nonfinite_vector',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding,
                      x -> x IS NULL OR isnan(x) OR isinf(x))) > 0),
           ROUND((SELECT COUNT(*) FROM embeddings
                  WHERE embedding IS NOT NULL
                    AND len(list_filter(embedding,
                            x -> x IS NULL OR isnan(x) OR isinf(x))) > 0)
                 * 1.0 / (SELECT COUNT(*) FROM embeddings), 6)
    UNION ALL
    SELECT 'embeddings_component_out_of_range',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding,
                      x -> abs(x) >= 1000000000.0)) > 0),
           ROUND((SELECT COUNT(*) FROM embeddings
                  WHERE embedding IS NOT NULL
                    AND len(list_filter(embedding,
                            x -> abs(x) >= 1000000000.0)) > 0)
                 * 1.0 / (SELECT COUNT(*) FROM embeddings), 6)
    UNION ALL
    SELECT 'documents_dup_doc_id',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
            FROM documents),
           ROUND((SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
                 * 1.0 / (SELECT COUNT(*) FROM documents), 6)
    UNION ALL
    SELECT 'events_dup_event_id',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
           (SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
            FROM events),
           ROUND((SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events)
                 * 1.0 / (SELECT COUNT(*) FROM events), 6)
    UNION ALL
    SELECT 'embeddings_dup_vec_id',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
           (SELECT CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT)
            FROM embeddings),
           ROUND((SELECT COUNT(*) - COUNT(DISTINCT vec_id) FROM embeddings)
                 * 1.0 / (SELECT COUNT(*) FROM embeddings), 6)
"""


QUERIES = {
    "profile_transform": Query(q_profile_transform, TRANSFORM_SQL, headline=True),
    "profile_reconciliation": Query(q_reconciliation, RECONCILE_SQL),
    "profile_nested": Query(q_profile_nested, NESTED_SQL),
    "profile_tombstones": Query(q_profile_tombstones, TOMBSTONES_SQL),
    "pipeline_corpus_clean": Query(q_corpus_clean, CORPUS_CLEAN_SQL, headline=True),
    "pipeline_dq_checks": Query(q_pipeline_dq_checks, DQ_CHECKS_SQL),
}
