"""Semantic property tests for the time-series operators (beyond the
auto-discovered oracle parity): session gap invariants, grid density and
forward-fill correctness, and funnel stage monotonicity."""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators import timeseries as T
from kafka_connect_minio_pipeline_spark.operators import (
    timeseries_analytics as TA,
)
from kafka_connect_minio_pipeline_spark.tables import load


def test_sessionize_invariants(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    sess = T.q_ts_sessionize(spark, sf_dir).collect()
    # total events conserved
    assert sum(r["n_events"] for r in sess) == ev.count()
    # per user: session_seq contiguous from 1, sessions ordered and
    # separated by more than the gap
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    gap = timedelta(minutes=T.SESSION_GAP_MIN)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["session_seq"])
        assert [r["session_seq"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert b["session_start"] - a["session_end"] > gap, (user, a, b)
        for r in rs:
            assert r["session_end"] >= r["session_start"]
            assert r["duration_s"] == int(
                (r["session_end"] - r["session_start"]).total_seconds()
            )


def test_sessionize_groups_within_gap(spark, sf_dir):
    """A hand-built frame: 3 events 10 min apart = one session; an event
    40 min later starts session 2."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1),
        (1, datetime(2024, 1, 1, 0, 10), 2),
        (1, datetime(2024, 1, 1, 0, 20), 3),
        (1, datetime(2024, 1, 1, 1, 0), 4),
        (2, datetime(2024, 1, 1, 0, 5), 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in T.sessionize(df).collect()
    }
    assert got == {(1, 1): (3, 1200), (1, 2): (1, 0), (2, 1): (1, 0)}


def test_gapfill_grid_and_ffill(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = T.q_ts_gapfill(spark, sf_dir).collect()
    # dense hourly grid per user, first bucket always observed
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user) == ev.select("user_id").distinct().count()
    hour = timedelta(hours=1)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["bucket"])
        assert rs[0]["observed"], user
        for a, b in zip(rs, rs[1:]):
            assert b["bucket"] - a["bucket"] == hour, (user, a, b)
        # forward fill: value never null, and constant across unobserved runs
        last = None
        for r in rs:
            assert r["value_ffill"] is not None
            if not r["observed"]:
                assert r["value_ffill"] == last, (user, r)
            last = r["value_ffill"]


def test_gapfill_observed_matches_last_event_in_hour(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["bucket"]): r["value"]
        for r in ev.withColumn("bucket", F.date_trunc("hour", "ts"))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id", "bucket")
                .orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    got = {
        (r["user_id"], r["bucket"]): r["value_ffill"]
        for r in T.q_ts_gapfill(spark, sf_dir).filter("observed").collect()
    }
    assert got == want


def test_funnel_stage_monotone(spark, sf_dir):
    out = T.q_ts_funnel(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    assert len(out) == ev.select("user_id").distinct().count()
    stage_counts = [0, 0, 0, 0]
    for r in out:
        ts = [r["ts_signup"], r["ts_click"], r["ts_purchase"]]
        # stage = deepest non-null prefix; steps strictly ordered in time
        depth = 0
        for t in ts:
            if t is None:
                break
            depth += 1
        assert r["stage"] == depth, r
        assert all(t is None for t in ts[depth:]), r
        for a, b in zip(ts, ts[1:]):
            if b is not None:
                assert b >= a, r
        stage_counts[depth] += 1
    # funnel narrows (weakly) at each stage
    reached = [sum(stage_counts[k:]) for k in range(4)]
    assert reached[0] >= reached[1] >= reached[2] >= reached[3]


def test_zscore_outliers_match_numpy(spark, sf_dir):
    """Distributed z-scores equal the numpy per-user z-scores (to the
    decimal(…,6) quantization of the moments), and the flagged set is
    exactly the |z| >= threshold set."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    vals: dict[int, list] = {}
    for r in ev.select("user_id", "event_id", "value").collect():
        vals.setdefault(r["user_id"], []).append((r["event_id"], r["value"]))
    want = {}
    for user, evs in vals.items():
        if len(evs) < 2:
            continue
        arr = np.array([v for _, v in evs])
        m, sd = arr.mean(), arr.std(ddof=1)
        for eid, v in evs:
            z = (v - m) / sd
            if abs(z) >= T.Z_THRESHOLD - 1e-4:
                want[eid] = z
    got = {r["event_id"]: r["zscore"] for r in T.q_ts_zscore(spark, sf_dir).collect()}
    # boundary rows within quantization noise of the threshold may differ;
    # everything else must agree
    for eid, z in got.items():
        assert abs(z) >= T.Z_THRESHOLD
        assert eid in want and abs(want[eid] - z) < 1e-4, (eid, z, want.get(eid))
    missing = {e: z for e, z in want.items() if abs(z) >= T.Z_THRESHOLD + 1e-4 and e not in got}
    assert not missing
    assert len(got) > 0


def test_scd2_invariants(spark, sf_dir):
    """Per user: versions contiguous from 1, intervals chain exactly
    (valid_to == next valid_from), no consecutive equal attribute values,
    exactly one open current row, and history starts at the user's first
    event."""
    ev = load(spark, sf_dir, "events")
    first_ts = {
        r["user_id"]: r["lo"]
        for r in ev.groupBy("user_id").agg(F.min("ts").alias("lo")).collect()
    }
    rows = T.q_ts_scd2(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(first_ts)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert rs[0]["valid_from"] == first_ts[user]
        assert sum(r["is_current"] for r in rs) == 1 and rs[-1]["is_current"]
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a, b)
            assert a["event_type"] != b["event_type"], (user, a, b)
        assert rs[-1]["valid_to"] is None


def test_scd2_single_exchange(spark, sf_dir):
    """The lag filter preserves partitioning+ordering, so all three
    window passes ride ONE exchange."""
    plan = T.q_ts_scd2(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_ohlc_bar_invariants(spark, sf_dir):
    """low ≤ open/close ≤ high on every bar; bar totals cover all events."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_ohlc
    from kafka_connect_minio_pipeline_spark.tables import load

    bars = q_ts_ohlc(spark, sf_dir)
    bad = bars.filter(
        (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open")) | (F.col("high") < F.col("close"))
    )
    assert bad.count() == 0
    n_total = bars.agg(F.sum("n_events")).collect()[0][0]
    assert n_total == load(spark, sf_dir, "events").count()


def test_ohlc_plan_is_partial_agg_no_window(spark, sf_dir):
    """The scale property: struct extrema aggregate map-side — the plan
    must be a two-phase HashAggregate/ObjectHashAggregate with NO Window
    and NO Sort (the row_number formulation the oracle uses would show
    both)."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_ohlc
    from kafka_connect_minio_pipeline_spark.plans.explain import formatted_plan

    plan = formatted_plan(q_ts_ohlc(spark, sf_dir))
    assert "Window" not in plan
    assert "Aggregate" in plan
    assert plan.count("hashpartitioning") == 1, plan


def test_mad_outliers_hand_computed(spark):
    """Known series: median 5, MAD 1, the lone extreme point (100) is the
    only value beyond 3*MAD — and it does NOT drag the stats the way a
    mean/stddev would."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import mad_outliers

    vals = [3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    [r] = mad_outliers(df).collect()
    # sorted: 3 4 5 6 7 100 -> median (5+6)/2 = 5.5
    # |x-5.5|: 2.5 1.5 .5 .5 1.5 94.5 -> sorted .5 .5 1.5 1.5 2.5 94.5 -> MAD 1.5
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (6, 5.5, 1.5, 1)


def test_cross_correlation_detects_known_lag(spark):
    """Synthetic streams where purchases exactly mirror clicks 2 hours
    later must peak at lag 2 with xcorr = 1.0 — the semantic contract of
    the operator, independent of the oracle."""
    import datetime as dt

    from kafka_connect_minio_pipeline_spark.operators.timeseries import cross_correlation

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=5), 1, "click"))
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h + 2, minutes=7), 1, "purchase")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["lag_hours"]: r["xcorr"] for r in cross_correlation(ev).collect()}
    assert out[2] == 1.0, out
    assert all(v is None or v < 1.0 for k, v in out.items() if k != 2), out


def test_kmeans_separates_blobs(spark):
    """Two well-separated blobs with one seed in each (vec_id 0 and 1)
    must come out as two pure clusters."""
    from kafka_connect_minio_pipeline_spark.operators.similarity import kmeans_assign

    blob_a = [[10.0, 10.0, 10.0, 10.0]]
    blob_b = [[-10.0, -10.0, -10.0, -10.0]]
    rows = []
    for i in range(20):
        v = (blob_a if i % 2 == 0 else blob_b)[0]
        rows.append((i, [x + (i % 5) * 0.01 for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=2).collect()}
    evens = {out[i] for i in range(0, 20, 2)}
    odds = {out[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds, out


def test_markov_rows_are_distributions(spark, sf_dir):
    """Transition counts conserve consecutive pairs (Σn = N_events −
    N_users with ≥1 event) and each from-state's probs sum to 1 within
    rounding slack."""
    ev = load(spark, sf_dir, "events")
    rows = T.q_ts_markov(spark, sf_dir).collect()
    n_pairs = sum(r["n"] for r in rows)
    assert n_pairs == ev.count() - ev.select("user_id").distinct().count()
    by_from: dict[str, float] = {}
    fanout: dict[str, int] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
        fanout[r["from_type"]] = fanout.get(r["from_type"], 0) + 1
    for ft, s in by_from.items():
        assert abs(s - 1.0) <= 5e-7 * fanout[ft] + 1e-9, (ft, s)


def test_markov_hand_computed(spark):
    """A→B→A→B timeline: P(B|A)=1 on two observations, P(A|B)=1 on one."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), "A", 1),
        (1, datetime(2024, 1, 1, 0, 1), "B", 2),
        (1, datetime(2024, 1, 1, 0, 2), "A", 3),
        (1, datetime(2024, 1, 1, 0, 3), "B", 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in T.markov_transitions(df).collect()
    }
    assert got == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_changepoint_finds_step(spark):
    """24 h at 1 event/h then 24 h at 5/h: the CUSUM trough sits on the
    last low hour, magnitude = 24·(5−3)·… → cusum = −48/48·… = −48/48."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1, 0, 30)
    rows = []
    eid = 0
    for h in range(48):
        per_hour = 1 if h < 24 else 5
        for k in range(per_hour):
            eid += 1
            rows.append(
                (eid, t0 + timedelta(hours=h, minutes=k), 7, "step", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    [r] = T.cusum_changepoint(df).collect()
    assert r["n_hours"] == 48
    # scaled = N·prefix − i·S; at i=24: 48·24 − 24·144 = −2304 → /48 = −48
    assert r["cusum"] == -48.0
    assert r["cp_hour"] == datetime(2024, 3, 1, 23, 0)


def test_interpolate_straight_line(spark):
    """Observations 10@h0 and 20@h4 fill hours 1-3 with 12.5/15/17.5;
    observed hours echo their own (last-in-hour) value."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 1, 10.0),
        (2, datetime(2024, 1, 1, 4, 50), 1, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    got = {
        r["bucket"].hour: (r["observed"], r["value_interp"])
        for r in T.interpolate_hourly(df).collect()
    }
    assert got == {
        0: (True, 10.0),
        1: (False, 12.5),
        2: (False, 15.0),
        3: (False, 17.5),
        4: (True, 20.0),
    }


def test_interpolate_bounds_on_real_data(spark, sf_dir):
    """Every interpolated (non-observed, interior) value lies within
    [min(pv,nv), max(pv,nv)] — linearity implies boundedness; and the
    grid is identical to gapfill's (same lo/hi per user, gapless)."""
    interp = T.q_ts_interpolate(spark, sf_dir)
    gap = T.q_ts_gapfill(spark, sf_dir)
    assert interp.count() == gap.count()
    # observed rows agree with gapfill's forward-fill value exactly
    j = (
        interp.filter("observed")
        .join(gap.filter("observed"), ["user_id", "bucket"])
        .select(
            (
                F.col("value_interp")
                == F.col("value_ffill").cast("decimal(18,6)").cast("double")
            ).alias("ok")
        )
    )
    assert j.filter("NOT ok").count() == 0
    # the bounds invariant the docstring promises: every non-observed
    # value lies within [min(prev, next), max(prev, next)] of the
    # nearest observed neighbors (linearity implies boundedness) —
    # recomputed here independently via windowed neighbor lookups
    from pyspark.sql import Window

    wprev = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_val = F.when(F.col("observed"), F.col("value_interp"))
    checked = interp.select(
        "user_id",
        "bucket",
        "observed",
        "value_interp",
        F.last(obs_val, ignorenulls=True).over(wprev).alias("pv"),
        F.first(obs_val, ignorenulls=True).over(wnext).alias("nv"),
    ).filter(
        (~F.col("observed"))
        & F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
    )
    out_of_bounds = checked.filter(
        (F.col("value_interp") < F.least("pv", "nv") - F.lit(1e-9))
        | (F.col("value_interp") > F.greatest("pv", "nv") + F.lit(1e-9))
    ).count()
    assert out_of_bounds == 0


def test_entropy_closed_forms(spark):
    """Uniform distribution → normalized entropy exactly 1; degenerate
    single-category → entropy 0 (and no -0.0 artifacts)."""
    import math

    rows = [(1, c) for c in "ABCD" for _ in range(25)] + [(2, "A")] * 10
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    from kafka_connect_minio_pipeline_spark.operators.aggregates import entropy_per_group

    got = {r["user_id"]: r for r in entropy_per_group(df, "user_id", "event_type").collect()}
    assert got[1]["entropy_norm"] == 1.0
    assert abs(got[1]["entropy"] - round(math.log(4), 6)) <= 1e-9
    assert got[2]["entropy"] == 0.0 and str(got[2]["entropy"]) == "0.0"
    assert got[2]["entropy_norm"] == 0.0


def test_zipf_recovers_power_law(spark):
    """A synthetic corpus with freq(rank r) = 1000//r must fit slope≈−1
    with high R²."""
    words = []
    for r in range(1, 21):
        words += [f"t{r:02d}"] * (1000 // r)
    df = spark.createDataFrame(
        [(1, " ".join(words), "en", "synthetic", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from kafka_connect_minio_pipeline_spark.operators.text import zipf_fit

    [row] = zipf_fit(df).collect()
    assert row["n_terms"] == 20
    assert -1.1 < row["zipf_slope"] < -0.9, row
    assert row["r2"] > 0.99, row


def test_rolling_median_hand_computed(spark):
    """Values 1..5 plus an outlier: lower medians of the growing frame."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 1000.0]
    rows = [
        (7, t0 + timedelta(minutes=i), i + 1, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    from kafka_connect_minio_pipeline_spark.operators.windows import (
        rolling_median,
    )

    got = {r["event_id"]: (r["n_in_frame"], r["rolling_median"])
           for r in rolling_median(df).collect()}
    # lower median of [1], [1,2], [1,2,3], ..., [1..5,1000]
    assert got == {1: (1, 1.0), 2: (2, 1.0), 3: (3, 2.0),
                   4: (4, 2.0), 5: (5, 3.0), 6: (6, 3.0)}


def test_concurrency_hand_computed(spark):
    """Sessions A[0,10], B[5,15], C[40,50] (minutes): peak is 2, first
    reached when B opens at minute 5."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    mk = lambda uid, minutes, eid: (uid, t0 + timedelta(minutes=minutes), eid)
    rows = [mk(1, 0, 1), mk(1, 10, 2),
            mk(2, 5, 3), mk(2, 15, 4),
            mk(3, 40, 5), mk(3, 50, 6)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    [r] = T.peak_concurrency(df).collect()
    assert r["max_concurrent"] == 2
    assert r["at_ts"] == t0 + timedelta(minutes=5)
    assert r["n_sessions"] == 3


def test_concurrency_touching_sessions_count(spark):
    """A session ending exactly when another starts counts as concurrent
    at that instant (+1 sorts before -1 at equal t)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # user 1: [0, 10]; user 2: [10, 20] — touch at minute 10
    rows = [(1, t0, 1), (1, t0 + timedelta(minutes=10), 2),
            (2, t0 + timedelta(minutes=10), 3), (2, t0 + timedelta(minutes=20), 4)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    [r] = T.peak_concurrency(df).collect()
    assert r["max_concurrent"] == 2
    assert r["at_ts"] == t0 + timedelta(minutes=10)


def test_skewkurt_closed_forms(spark):
    """A symmetric two-point distribution has skewness 0 and excess
    kurtosis exactly −2 (the minimum possible); adding a far outlier
    makes skewness strictly positive."""
    rows = [(1, "sym", 10.0, 1, "{}")] * 50 + [(2, "sym", 20.0, 1, "{}")] * 50
    rows += [(3, "skew", 1.0, 1, "{}")] * 99 + [(4, "skew", 101.0, 1, "{}")]
    df = spark.createDataFrame(
        [(i, __import__("datetime").datetime(2024, 1, 1), uid, t, v, p)
         for i, (uid, t, v, _, p) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_skewkurt
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["event_type"]: r for r in q_agg_skewkurt(spark, d).collect()}
    assert got["sym"]["skewness"] == 0.0
    assert got["sym"]["excess_kurtosis"] == -2.0
    assert got["skew"]["skewness"] > 5.0


def test_cdc_merge_hand_computed(spark):
    """Base {1:10, 2:20, 3:30}; changelog: upsert 2→99 then delete 2 is
    wrong order — ord decides: final ops are (2: delete), (3: upsert 77
    after an earlier delete), (4: insert 55). Result: 1 kept, 3 updated
    to 77, 4 inserted."""
    from kafka_connect_minio_pipeline_spark.operators.joins import cdc_merge

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "key long, val double"
    )
    chg = spark.createDataFrame(
        [(2, "U", 99.0, 1), (2, "D", None, 2),
         (3, "D", None, 1), (3, "U", 77.0, 2),
         (4, "U", 55.0, 1)],
        "key long, op string, val double, ord long",
    )
    got = {r["key"]: (r["action"], r["final_val"])
           for r in cdc_merge(base, chg).collect()}
    assert got == {1: ("kept", 10.0), 3: ("updated", 77.0),
                   4: ("inserted", 55.0)}


def test_cdc_merge_null_base_value_is_update_not_insert(spark):
    """A base row whose value is NULL is still a base ROW: an upsert to
    it must classify as 'updated' (presence is detected by row
    existence, never by value nullness), and a delete of an absent key
    stays a silent no-op."""
    from kafka_connect_minio_pipeline_spark.operators.joins import cdc_merge

    base = spark.createDataFrame([(1, None), (2, 20.0)], "key long, val double")
    chg = spark.createDataFrame(
        [(1, "U", 5.0, 1), (9, "D", None, 1)],
        "key long, op string, val double, ord long",
    )
    got = {r["key"]: (r["action"], r["final_val"])
           for r in cdc_merge(base, chg).collect()}
    assert got == {1: ("updated", 5.0), 2: ("kept", 20.0)}


def test_gini_closed_forms(spark):
    """Equal values → Gini 0; a single owner of all mass among n=10
    → Gini (n−1)/n = 0.9."""
    import datetime as dt
    import os
    import tempfile

    rows = [(i, dt.datetime(2024, 1, 1), 1, "equal", 7.0, "{}") for i in range(10)]
    rows += [(100 + i, dt.datetime(2024, 1, 1), 1, "onehot", 0.0, "{}") for i in range(9)]
    rows += [(200, dt.datetime(2024, 1, 1), 1, "onehot", 50.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_gini

    got = {r["event_type"]: r["gini"] for r in q_agg_gini(spark, d).collect()}
    assert got["equal"] == 0.0
    assert got["onehot"] == 0.9


def test_seasonal_adjusted_flags_offpattern_only(spark):
    """A series with a strong hour-of-day pattern (9am≈100, 3am≈10 with
    small jitter): an injected 3am value of 100 is the ONLY flagged
    event — the hourly rush itself is normal once the seasonal mean is
    removed."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 5, 1)
    rows = []
    eid = 0
    for d in range(20):
        for hour, base in ((9, 100.0), (3, 10.0)):
            eid += 1
            rows.append(
                (eid, t0 + timedelta(days=d, hours=hour), 1, "rush",
                 base + (d % 2), "{}")
            )
    eid += 1
    incident = (eid, t0 + timedelta(days=20, hours=3), 1, "rush", 100.0, "{}")
    rows.append(incident)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    flagged = T.seasonal_adjusted_outliers(df).collect()
    assert [r["event_id"] for r in flagged] == [incident[0]]
    assert flagged[0]["hod"] == 3


def test_snaive_perfect_on_periodic_series(spark):
    """A series that repeats exactly week over week backtests to MAE=0,
    sMAPE=0; breaking one hour in the second week makes both positive."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 6, 3)  # a Monday, hour 0
    rows = []
    eid = 0
    for week in range(2):
        for h in range(168):
            n = 2 if (h % 24) == 9 else 1  # daily bump at 9am, weekly-exact
            for k in range(n):
                eid += 1
                rows.append(
                    (eid, t0 + timedelta(weeks=week, hours=h, minutes=k),
                     1, "periodic", 1.0, "{}")
                )
    # a broken twin: same shape but one extra burst in week 2 only
    for week in range(2):
        for h in range(168):
            base = 1 + (3 if (week == 1 and h == 40) else 0)
            for k in range(base):
                eid += 1
                rows.append(
                    (eid, t0 + timedelta(weeks=week, hours=h, minutes=k),
                     2, "broken", 1.0, "{}")
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["event_type"]: r for r in T.snaive_backtest(df).collect()}
    assert got["periodic"]["mae"] == 0.0 and got["periodic"]["smape"] == 0.0
    assert got["broken"]["mae"] > 0.0 and got["broken"]["smape"] > 0.0


def test_survival_curve_invariants(spark, sf_dir):
    """S is non-increasing in minute, S at the smallest minute is 1.0,
    and survivor counts telescope with the per-minute counts."""
    rows = sorted(T.q_ts_survival(spark, sf_dir).collect(),
                  key=lambda r: r["minute"])
    assert rows[0]["survival"] == 1.0
    surv = [r["survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    for a, b in zip(rows, rows[1:]):
        assert a["n_surviving"] - a["n_sessions"] == b["n_surviving"]


def test_topk_share_bounds(spark, sf_dir):
    """Share lies in (0, 1]; segments with <= K customers share exactly 1."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import (
        TOPK_SHARE_K,
        q_agg_topk_share,
    )

    for r in q_agg_topk_share(spark, sf_dir).collect():
        assert 0.0 < r["topk_share"] <= 1.0
        if r["n_customers"] <= TOPK_SHARE_K:
            assert r["topk_share"] == 1.0


def test_znorm_kernel_matches_builtin_on_large_low_variance_group(spark):
    """The review-found divergence shape: a group whose cent sum squared
    exceeds 2^53 with tiny variance — an exact-integer s1*s1 in the
    pandas kernel would diverge from the oracle's double tree after
    cancellation amplification. Kernel and builtin twin must agree
    bit-for-bit."""
    from datetime import datetime

    from kafka_connect_minio_pipeline_spark.functions.udafs import (
        q_udf_grouped_znorm,
        q_udf_grouped_znorm_builtin,
    )
    import os
    import tempfile

    rows = [
        (i, datetime(2024, 1, 1), 1, "t", 9500.00 + (i % 2) / 100.0, "{}")
        for i in range(10_000)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    a = sorted(map(str, q_udf_grouped_znorm(spark, d).collect()))
    b = sorted(map(str, q_udf_grouped_znorm_builtin(spark, d).collect()))
    assert a == b


def test_runs_test_detects_momentum_and_oscillation(spark):
    """A ramp-up-then-down series has 2 runs (strong momentum, z << 0);
    a strictly alternating series has the maximum run count (z >> 0);
    a one-signed series yields NULL under the degeneracy guard."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 4, 1)
    rows = []
    eid = 0

    def emit(series, h, count):
        nonlocal eid
        for k in range(count):
            eid += 1
            rows.append((eid, t0 + timedelta(hours=h, minutes=k), 1,
                         series, 1.0, "{}"))

    for h in range(48):  # momentum: counts ramp 1..24 then 23..0 (+23/-24 runs=2)
        emit("momentum", h, (h + 1) if h < 24 else (47 - h))
    for h in range(48):  # oscillation: 1,2,1,2,... every delta flips sign
        emit("oscillate", h, 1 + (h % 2))
    for h in range(48):  # monotone: one-signed deltas -> guard yields NULL
        emit("monotone", h, h + 1)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["event_type"]: r for r in T.q_ts_runs_test(spark, d).collect()}
    assert got["momentum"]["n_runs"] == 2 and got["momentum"]["z_runs"] < -3
    assert got["oscillate"]["z_runs"] > 3
    assert got["monotone"]["z_runs"] is None


def _py_lttb_mean_anchor(points, t):
    """Independent pure-Python reference of the parallel (mean-anchor)
    LTTB variant: points = [(x, y, id)] sorted by (x, id); returns the
    selected [(bucket, id)]. Mirrors the operator's SPEC (equal-count
    buckets by integer division, neighbor-bucket mean anchors, first /
    last always kept), not its dataflow."""
    n = len(points)
    if n <= t:
        return [(i, p[2]) for i, p in enumerate(points)]
    interior = points[1:-1]
    buckets = {}
    for j, p in enumerate(interior):  # j = rn - 2
        k = 1 + (j * (t - 2)) // (n - 2)
        buckets.setdefault(k, []).append(p)
    means = {
        k: (sum(p[0] for p in v) / len(v), sum(p[1] for p in v) / len(v))
        for k, v in buckets.items()
    }
    first, last = points[0], points[-1]
    out = [(0, first[2]), (t - 1, last[2])]
    for k in sorted(buckets):
        xl, yl = means.get(k - 1, (first[0], first[1]))
        xr, yr = means.get(k + 1, (last[0], last[1]))
        best = max(
            buckets[k],
            key=lambda p: (
                abs((xl - xr) * (p[1] - yl) - (xl - p[0]) * (yr - yl)),
                -p[2],
            ),
        )
        out.append((k, best[2]))
    return sorted(out)


def test_lttb_matches_pure_python_reference(spark, sf_dir):
    """ts_downsample_lttb vs an independent in-memory implementation of
    the same spec, for every user series — pins the algorithm itself
    (the DuckDB oracle only pins cross-engine agreement). Decimal-mean
    vs float-mean anchor differences are far below the area argmax
    margins on this data, so the selected sets must be identical."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import _micros
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import (
        LTTB_BUCKETS,
        q_ts_downsample_lttb,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _micros(F.col("ts")).alias("x")
    ).collect()
    series = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (float(r["x"]), r["value"], r["event_id"])
        )
    expect = set()
    for uid, pts in series.items():
        pts.sort(key=lambda p: (p[0], p[2]))
        for bucket, eid in _py_lttb_mean_anchor(pts, LTTB_BUCKETS):
            expect.add((uid, bucket, eid))
    got = {
        (r["user_id"], r["bucket"], r["event_id"])
        for r in q_ts_downsample_lttb(spark, sf_dir).collect()
    }
    assert got == expect
    # downsampling contract: at most LTTB_BUCKETS points per series
    per_user = {}
    for uid, _, _ in got:
        per_user[uid] = per_user.get(uid, 0) + 1
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import (
        LTTB_BUCKETS as T,
    )
    assert all(c <= T for c in per_user.values())


def test_m4_selects_true_extrema_per_bucket(spark, sf_dir):
    """M4's losslessness contract: per (user, time-bucket), the flagged
    rows are exactly the bucket's value-min, value-max, time-first and
    time-last (event_id tiebreaks), recomputed independently in Python."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import _micros
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import (
        M4_BUCKETS,
        q_ts_downsample_m4,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _micros(F.col("ts")).alias("x")
    ).collect()
    series = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["x"], r["value"], r["event_id"])
        )
    expect = {}
    for uid, pts in series.items():
        mn = min(p[0] for p in pts)
        mx = max(p[0] for p in pts)
        buckets = {}
        for x, v, eid in pts:
            buckets.setdefault(((x - mn) * M4_BUCKETS) // (mx - mn + 1), []).append(
                (x, v, eid)
            )
        for b, ps in buckets.items():
            expect[(uid, b)] = {
                "is_min": min(ps, key=lambda p: (p[1], p[2]))[2],
                "is_max": min(ps, key=lambda p: (-p[1], p[2]))[2],
                "is_first": min(ps, key=lambda p: (p[0], p[2]))[2],
                "is_last": max(ps, key=lambda p: (p[0], p[2]))[2],
            }
    got = q_ts_downsample_m4(spark, sf_dir).collect()
    seen = set()
    for r in got:
        key = (r["user_id"], r["bucket"])
        for role in ("is_min", "is_max", "is_first", "is_last"):
            if r[role]:
                assert expect[key][role] == r["event_id"], (key, role)
                seen.add((key, role))
    assert len(seen) == 4 * len(expect), "a bucket role is missing"


def test_bollinger_invariants_and_breakout(spark, sf_dir):
    """Bands exist iff the frame has n>1 and positive variance; breakout
    is true iff value is strictly outside the bands; sma lies within the
    frame's [min, max]."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_bollinger

    rows = q_ts_bollinger(spark, sf_dir).collect()
    assert rows
    n_bands = 0
    for r in rows:
        if r["upper_band"] is not None:
            n_bands += 1
            assert r["lower_band"] is not None
            assert r["lower_band"] <= r["sma"] <= r["upper_band"]
            assert r["breakout"] == (
                r["value"] > r["upper_band"] or r["value"] < r["lower_band"]
            ) or abs(r["value"] - r["upper_band"]) < 1e-6 or abs(
                r["value"] - r["lower_band"]
            ) < 1e-6  # rounding at the boundary
        else:
            assert r["breakout"] is False
    assert n_bands > 0


def test_rsi_matches_pure_python_reference(spark, sf_dir):
    """Cutler's RSI against an independent per-user Python rebuild:
    same deltas, same 14-row SMA frames, same 100-pin convention."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import (
        RSI_PERIOD,
        q_ts_rsi,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    ev = sorted(
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    expect = {}
    by_user: dict = {}
    for r in ev:
        hist = by_user.setdefault(r["user_id"], [])
        hist.append(r["value"])
        if len(hist) >= RSI_PERIOD + 1:
            deltas = [
                hist[i] - hist[i - 1]
                for i in range(len(hist) - RSI_PERIOD, len(hist))
            ]
            g = sum(round(max(d, 0.0), 9) for d in deltas)
            l = sum(round(max(-d, 0.0), 9) for d in deltas)
            expect[r["event_id"]] = (
                round(100 - 100 / (1 + g / l), 6) if l > 0 else 100.0
            )
    got = {r["event_id"]: r["rsi"] for r in q_ts_rsi(spark, sf_dir).collect()}
    assert len(got) == len(ev)
    n_checked = 0
    for eid, rsi in got.items():
        if eid in expect:
            assert rsi is not None and abs(rsi - expect[eid]) < 1e-5, eid
            assert 0.0 <= rsi <= 100.0
            n_checked += 1
        else:
            assert rsi is None, eid
    assert n_checked > 0


def test_theil_sen_matches_pure_python(spark, sf_dir):
    """Independent rebuild of the Theil–Sen spec: daily mean series per
    type, all pairwise slopes, LOWER median (rank ceil(n/2))."""
    import datetime
    from decimal import Decimal

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    epoch = datetime.date.fromisoformat(TA.TS_EPOCH)
    daily: dict[tuple, list] = {}
    for r in ev:
        day = (r["ts"].date() - epoch).days
        daily.setdefault((r["event_type"], day), []).append(r["value"])
    series: dict[str, list] = {}
    for (etype, day), vals in daily.items():
        # mirror the exact-decimal mean: quantized sum / count
        s = sum(Decimal(f"{v:.6f}") for v in vals)
        series.setdefault(etype, []).append((day, float(s) / len(vals)))
    expect = {}
    for etype, pts in series.items():
        pts.sort()
        slopes = sorted(
            (yb - ya) / float(db - da)
            for i, (da, ya) in enumerate(pts)
            for db, yb in pts[i + 1 :]
        )
        n = len(slopes)
        expect[etype] = (n, round(slopes[(n + 1) // 2 - 1], 6))
    got = {
        r["event_type"]: (r["n_pairs"], r["sen_slope"])
        for r in TA.q_ts_theil_sen(spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and got
    for etype in expect:
        assert got[etype][0] == expect[etype][0], etype
        assert abs(got[etype][1] - expect[etype][1]) < 1e-9, etype


def test_attribution_matches_pure_python(spark, sf_dir):
    """Independent rebuild of first/last-touch credit within the
    lookback, tie-broken on event_id."""
    from datetime import timedelta as _td

    ev = load(spark, sf_dir, "events").collect()
    look = _td(days=TA.ATTRIB_LOOKBACK_DAYS)
    touches = [r for r in ev if r["event_type"] in TA.ATTRIB_TOUCH_TYPES]
    expect: dict[tuple, int] = {}
    for p in ev:
        if p["event_type"] != "purchase":
            continue
        cand = [
            t
            for t in touches
            if t["user_id"] == p["user_id"]
            and t["ts"] < p["ts"]
            and t["ts"] >= p["ts"] - look
        ]
        if not cand:
            continue
        first = min(cand, key=lambda t: (t["ts"], t["event_id"]))
        last = max(cand, key=lambda t: (t["ts"], t["event_id"]))
        for model, r in (("first_touch", first), ("last_touch", last)):
            k = (model, r["event_type"])
            expect[k] = expect.get(k, 0) + 1
    got = {
        (r["model"], r["touch_type"]): r["conversions"]
        for r in TA.q_ts_attribution(spark, sf_dir).collect()
    }
    assert got == expect and got


def test_attribution_window_edges(spark, tmp_path):
    """Hand-built fixture pinning the band edges and the tie-break: a
    touch exactly lookback days before counts (>= lower edge), a touch
    at the purchase instant does NOT (strict <), a later touch never
    does, and equal-timestamp touches resolve by event_id."""
    import datetime

    def ts(s):
        return datetime.datetime.fromisoformat(s)

    look_edge = ts("2024-01-08T00:00:00")  # purchase ts
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, ts("2024-01-01T00:00:00"), 1, "click", 1.0, "{}"),  # exactly -7d: in
        (2, ts("2023-12-31T23:59:59"), 1, "view", 1.0, "{}"),   # 1s too old: out
        (3, ts("2024-01-08T00:00:00"), 1, "view", 1.0, "{}"),   # at purchase: out
        (4, ts("2024-01-09T00:00:00"), 1, "click", 1.0, "{}"),  # after: out
        (5, look_edge, 1, "purchase", 9.0, "{}"),
        # user 2: two touches at the SAME instant -> event_id breaks the tie
        (6, ts("2024-01-05T00:00:00"), 2, "view", 1.0, "{}"),
        (7, ts("2024-01-05T00:00:00"), 2, "click", 1.0, "{}"),
        (8, ts("2024-01-06T00:00:00"), 2, "purchase", 9.0, "{}"),
    ]
    schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["model"], r["touch_type"]): r["conversions"]
        for r in TA.q_ts_attribution(spark, str(tmp_path)).collect()
    }
    # user 1: only touch 1 in-window -> first=last=click
    # user 2: first = id 6 (view, lower event_id), last = id 7 (click)
    assert got == {
        ("first_touch", "click"): 1,
        ("first_touch", "view"): 1,
        ("last_touch", "click"): 2,
    }
