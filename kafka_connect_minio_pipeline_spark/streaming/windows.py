"""Streaming window / stateful operators over the events stream
(SURVEY.md §2.4 streaming row).

Each builder returns a *streaming* DataFrame; queries.py runs them with
availableNow and compares against batch SQL oracles where the semantics
are batch-equivalent (window aggregations, dedup, stream-static join).
Watermark-driven late-data drop is inherently about multi-batch arrival
order, so it is exercised in tests/test_streaming.py with a controlled
two-file source instead of a driver oracle.

Scale notes: windowed aggregation state is (group × open windows) — with
watermarks the state is bounded and evicted; session windows merge in the
state store; the stream-static join broadcasts the dimension per
micro-batch (no stream-side shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec2
from ..sources.files import stream_table
from ..tables import load


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact value sum."""
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec2(F.col("value"))).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SQL_TUMBLING = """
    SELECT DATE_TRUNC('hour', ts) AS w_start,
           DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS w_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
"""


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )


SQL_SLIDING = """
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - k * INTERVAL '30 minutes' AS w_start
        FROM events, UNNEST([0, 1]) t(k))
    SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM assigned GROUP BY 1, 2
"""


def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap.

    session_window merges events whose gaps stay under 5 minutes; the
    window end is last_event + gap. The oracle reproduces the same islands
    with lag + cumulative sum (gaps-and-islands).
    """
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SQL_SESSION = """
    WITH marked AS (
        SELECT user_id, ts,
               -- STRICT > mirrors Spark's session_window boundary: an
               -- event at exactly last_event + gap still lands inside
               -- the open window [last, last+gap) extension — touching
               -- windows coalesce. '>=' here silently split sessions at
               -- exact-gap spacing (found by the events fuzz net).
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '5 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, sid
"""


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over an intentionally duplicated
    stream (every event arrives twice) — state is evicted 10 minutes of
    event-time after each key, which is what makes dedup viable on an
    unbounded stream. Result must equal the distinct original events."""
    ev = stream_table(spark, sf_dir, "events")
    # watermarks require an instant TIMESTAMP column (not NTZ); session tz
    # is pinned to UTC by the loader, so the cast is value-preserving
    doubled = ev.union(ev).withColumn("ts_evt", F.col("ts").cast("timestamp"))
    return (
        doubled.withWatermark("ts_evt", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


SQL_DEDUP_STREAM = """
    SELECT event_id, user_id, ts, event_type, value FROM events
"""


STATEFUL_OUTPUT = "user_id bigint, n_events bigint, max_value double, last_us bigint"
STATEFUL_STATE = "n bigint, mx double, last_us bigint"


def stateful_user_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    lifetime tracker (event count, max value, last event time) maintained
    in the state store across micro-batches — the escape hatch for
    semantics the built-in windows can't express.

    Every emitted statistic is monotone in processing order, so the final
    state per key is the max over all update-mode emissions regardless of
    how the source was split into batches; queries.py collapses on that,
    which is what makes this stateful op *oracle-checkable* (batch GROUP BY
    gives the same final state). State is O(keys) and bounded; a production
    stream would add a state TTL via GroupStateTimeout."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_table(spark, sf_dir, "events").select("user_id", "value", "ts")

    def track(key, pdfs, state):
        import pandas as pd  # noqa: F811 — worker-side import

        n, mx, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            batch_mx = float(pdf["value"].max())
            mx = batch_mx if mx is None else max(mx, batch_mx)
            batch_last = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
            last_us = batch_last if last_us is None else max(last_us, batch_last)
        state.update((n, mx, last_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "max_value": mx,
                    "last_us": last_us,
                }
            ]
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=STATEFUL_OUTPUT,
        stateStructType=STATEFUL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SQL_STREAM_STATEFUL = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
"""


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⨝stream interval join: each purchase matched to the same
    user's clicks in the preceding hour.

    Both sides carry watermarks and the join condition bounds event time
    on both ends — exactly what lets Structured Streaming evict join
    state (a click older than max(purchase watermark) + 1h can never
    match again). State is O(events within the interval), not O(stream).
    The batch oracle is the same interval join; with availableNow over a
    static file the streaming answer must converge to it exactly.

    Watermark sizing: the click side's delay must be >= the 1 h join
    interval PLUS the purchase side's lateness allowance, else a click
    could be evicted before a late purchase it still matches arrives —
    batch-equality would then only hold for single-batch/ordered sources.
    90 min = 60 min interval + the 30 min purchase watermark.
    """
    ev = stream_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", "90 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        # exact integer micros (unix_timestamp truncates sub-second parts
        # per-operand, which disagrees with the oracle's difference by ±1s)
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 1000000"
        ).alias("gap_seconds"),
    )


SQL_STREAM_STREAM_JOIN = """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
"""


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⨝ static dimension: events enriched with the customer
    segment, aggregated per segment/event_type. The static side is
    broadcast per micro-batch — the stream is never shuffled for the join."""
    ev = stream_table(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    return (
        ev.join(F.broadcast(customer), ev.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec2(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


SQL_STREAM_STATIC_JOIN = """
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
"""
