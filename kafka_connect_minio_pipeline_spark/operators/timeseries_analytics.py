"""Chart-density downsampling, technical indicators, and trend /
attribution analytics over ``events`` — split out of
``operators.timeseries`` for navigability (VERDICT r12 item 7 hygiene
bar: no source file over 2,500 lines; pure move, no semantic change,
registry names unchanged): LTTB and M4 downsampling, Bollinger bands,
RSI, the Theil-Sen robust trend, and first/last-touch attribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec9
from ..registry import Query
from ..tables import load
from .timeseries import _micros

# ---------------------------------------------------------------------------
# LTTB downsampling (Steinarsson 2013 — largest-triangle-three-buckets)
# ---------------------------------------------------------------------------

LTTB_BUCKETS = 12


def q_ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user LTTB downsampling of the (ts, value) series to
    LTTB_BUCKETS points (Steinarsson 2013, "Downsampling Time Series for
    Visual Representation") — the standard shape-preserving decimation a
    dashboard runs before plotting millions of points: endpoints always
    kept, interior points split into equal-count buckets, each bucket
    contributing the point that maximizes the triangle area against its
    neighbor buckets.

    This is the thesis's PARALLEL variant: both anchors are the
    neighboring buckets' mean points (the sequential original chains on
    the previously SELECTED point — an inherently serial scan; the
    mean-anchor form is the documented MapReduce adaptation and is what
    makes per-bucket argmax embarrassingly parallel). Series with
    n ≤ LTTB_BUCKETS pass through unchanged (LTTB degenerates to
    identity).

    Exactness: x is integer epoch-micros; bucket ids are pure integer
    arithmetic (floor division on non-negatives); bucket means are
    order-free decimal sums; the triangle area is ONE shared double
    expression (mirrored term-for-term in the oracle, never
    algebraically rearranged) with ties broken by event_id, so the
    selected set is hash-exact cross-engine. Plan: one row_number window
    per user, one groupBy for bucket means (T−2 rows per user), a tiny
    per-user window for anchors, one co-keyed join back, per-bucket
    argmax — two shuffles on the series key, no quadratic stage, skew
    bounded by the busiest series."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _micros(F.col("ts")).alias("xus")
    )
    w = Window.partitionBy("user_id").orderBy("xus", "event_id")
    pts = ev.select(
        "user_id",
        "event_id",
        "value",
        "xus",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    t = LTTB_BUCKETS
    small = pts.filter(F.col("n") <= t).select(
        "user_id",
        (F.col("rn") - 1).cast("int").alias("bucket"),
        "event_id",
        "value",
    )
    big = pts.filter(F.col("n") > t)
    firstp = big.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("xus").cast("double").alias("fx"),
        F.col("value").alias("fy"),
        "event_id",
    )
    lastp = big.filter(F.col("rn") == F.col("n")).select(
        "user_id",
        F.col("xus").cast("double").alias("lx"),
        F.col("value").alias("ly"),
        "event_id",
    )
    interior = big.filter(
        (F.col("rn") >= 2) & (F.col("rn") <= F.col("n") - 1)
    ).select(
        "user_id",
        "event_id",
        "value",
        "xus",
        F.expr(f"cast(1 + ((rn - 2) * {t - 2}) div (n - 2) as int)").alias(
            "bucket"
        ),
    )
    means = interior.groupBy("user_id", "bucket").agg(
        (
            F.sum(F.col("xus").cast("decimal(28,0)")).cast("double")
            / F.count("*")
        ).alias("mx"),
        (
            F.sum(F.col("value").cast("decimal(16,6)")).cast("double")
            / F.count("*")
        ).alias("my"),
    )
    wb = Window.partitionBy("user_id").orderBy("bucket")
    anchors = (
        means.withColumn("lmx", F.lag("mx").over(wb))
        .withColumn("lmy", F.lag("my").over(wb))
        .withColumn("rmx", F.lead("mx").over(wb))
        .withColumn("rmy", F.lead("my").over(wb))
        .join(firstp.select("user_id", "fx", "fy"), "user_id")
        .join(lastp.select("user_id", "lx", "ly"), "user_id")
        .select(
            "user_id",
            "bucket",
            F.coalesce("lmx", "fx").alias("xl"),
            F.coalesce("lmy", "fy").alias("yl"),
            F.coalesce("rmx", "lx").alias("xr"),
            F.coalesce("rmy", "ly").alias("yr"),
        )
    )
    scored = interior.join(anchors, ["user_id", "bucket"]).withColumn(
        "area",
        F.abs(
            (F.col("xl") - F.col("xr")) * (F.col("value") - F.col("yl"))
            - (F.col("xl") - F.col("xus").cast("double"))
            * (F.col("yr") - F.col("yl"))
        ),
    )
    ww = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("area").desc(), F.col("event_id")
    )
    winners = (
        scored.withColumn("rr", F.row_number().over(ww))
        .filter(F.col("rr") == 1)
        .select("user_id", "bucket", "event_id", "value")
    )
    return (
        small.unionByName(
            firstp.select(
                "user_id",
                F.lit(0).cast("int").alias("bucket"),
                "event_id",
                F.col("fy").alias("value"),
            )
        )
        .unionByName(
            lastp.select(
                "user_id",
                F.lit(t - 1).cast("int").alias("bucket"),
                "event_id",
                F.col("ly").alias("value"),
            )
        )
        .unionByName(winners)
    )


SQL_TS_LTTB = f"""
    WITH pts AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS xus,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events),
    small AS (
        SELECT user_id, CAST(rn - 1 AS INTEGER) AS bucket, event_id, value
        FROM pts WHERE n <= {LTTB_BUCKETS}),
    big AS (SELECT * FROM pts WHERE n > {LTTB_BUCKETS}),
    firstp AS (
        SELECT user_id, CAST(xus AS DOUBLE) AS fx, value AS fy, event_id
        FROM big WHERE rn = 1),
    lastp AS (
        SELECT user_id, CAST(xus AS DOUBLE) AS lx, value AS ly, event_id
        FROM big WHERE rn = n),
    interior AS (
        SELECT user_id, event_id, value, xus,
               CAST(1 + ((rn - 2) * {LTTB_BUCKETS - 2}) // (n - 2)
                    AS INTEGER) AS bucket
        FROM big WHERE rn >= 2 AND rn <= n - 1),
    means AS (
        SELECT user_id, bucket,
               CAST(SUM(CAST(xus AS DECIMAL(28,0))) AS DOUBLE)
                   / COUNT(*) AS mx,
               CAST(SUM(CAST(value AS DECIMAL(16,6))) AS DOUBLE)
                   / COUNT(*) AS my
        FROM interior GROUP BY 1, 2),
    anchors AS (
        SELECT m.user_id, m.bucket,
               COALESCE(LAG(mx) OVER w, f.fx) AS xl,
               COALESCE(LAG(my) OVER w, f.fy) AS yl,
               COALESCE(LEAD(mx) OVER w, l.lx) AS xr,
               COALESCE(LEAD(my) OVER w, l.ly) AS yr
        FROM means m
        JOIN firstp f USING (user_id)
        JOIN lastp l USING (user_id)
        WINDOW w AS (PARTITION BY m.user_id ORDER BY m.bucket)),
    scored AS (
        SELECT i.user_id, i.bucket, i.event_id, i.value,
               ABS((a.xl - a.xr) * (i.value - a.yl)
                   - (a.xl - CAST(i.xus AS DOUBLE)) * (a.yr - a.yl)) AS area
        FROM interior i
        JOIN anchors a ON i.user_id = a.user_id AND i.bucket = a.bucket),
    winners AS (
        SELECT user_id, bucket, event_id, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                ORDER BY area DESC, event_id) AS rr
            FROM scored) WHERE rr = 1)
    SELECT user_id, bucket, event_id, value FROM small
    UNION ALL
    SELECT user_id, 0 AS bucket, event_id, fy AS value FROM firstp
    UNION ALL
    SELECT user_id, {LTTB_BUCKETS - 1} AS bucket, event_id, ly AS value
    FROM lastp
    UNION ALL
    SELECT user_id, bucket, event_id, value FROM winners
"""


# ---------------------------------------------------------------------------
# M4 downsampling (Jugel et al., VLDB 2014 — min/max/first/last per bucket)
# ---------------------------------------------------------------------------

M4_BUCKETS = 12


def q_ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al. 2014, "M4: A Visualization-Oriented
    Time Series Data Aggregation"): per user series, split the TIME
    range into M4_BUCKETS equal-width buckets and keep, per bucket, the
    rows carrying min(value), max(value), first(ts), last(ts) — the
    four points that make a line chart pixel-exact. The error-free
    companion to `ts_downsample_lttb` (LTTB is shape-preserving
    heuristic selection over equal-COUNT buckets; M4 is lossless for
    rendering over equal-TIME buckets) — together the two canonical
    downsamplers.

    One row per selected event with four role flags (a row can hold
    several roles — e.g. a bucket's only event is all four). Bucket ids
    are pure integer arithmetic on epoch-micros (floor division of
    non-negatives — exact cross-engine); role selection is four
    row_number ranks over ONE (user, bucket) partition — a single
    shuffle, four sorts, ties broken by event_id. Skew bounded by the
    busiest series, no quadratic stage anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _micros(F.col("ts")).alias("xus")
    )
    wu = Window.partitionBy("user_id")
    pts = ev.select(
        "user_id",
        "event_id",
        "value",
        "xus",
        F.min("xus").over(wu).alias("mn"),
        F.max("xus").over(wu).alias("mx"),
    ).withColumn(
        "bucket",
        F.expr(
            f"cast(((xus - mn) * {M4_BUCKETS}) div (mx - mn + 1) as int)"
        ),
    )
    wb = Window.partitionBy("user_id", "bucket")
    flags = pts.select(
        "user_id",
        "bucket",
        "event_id",
        "value",
        (
            F.row_number().over(wb.orderBy("value", "event_id")) == 1
        ).alias("is_min"),
        (
            F.row_number().over(wb.orderBy(F.col("value").desc(), "event_id"))
            == 1
        ).alias("is_max"),
        (
            F.row_number().over(wb.orderBy("xus", "event_id")) == 1
        ).alias("is_first"),
        (
            F.row_number().over(
                wb.orderBy(F.col("xus").desc(), F.col("event_id").desc())
            )
            == 1
        ).alias("is_last"),
    )
    return flags.filter(
        F.col("is_min") | F.col("is_max") | F.col("is_first") | F.col("is_last")
    )


SQL_TS_M4 = f"""
    WITH pts AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS xus,
               MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS mn,
               MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS mx
        FROM events),
    b AS (
        SELECT user_id, event_id, value, xus,
               CAST(((xus - mn) * {M4_BUCKETS}) // (mx - mn + 1) AS INTEGER)
                   AS bucket
        FROM pts),
    flags AS (
        SELECT user_id, bucket, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY value, event_id) = 1 AS is_min,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY value DESC, event_id) = 1 AS is_max,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY xus, event_id) = 1 AS is_first,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                   ORDER BY xus DESC, event_id DESC) = 1 AS is_last
        FROM b)
    SELECT user_id, bucket, event_id, value,
           is_min, is_max, is_first, is_last
    FROM flags
    WHERE is_min OR is_max OR is_first OR is_last
"""


BOLL_WINDOW = 20  # classic Bollinger period
BOLL_K = 2  # band half-width in standard deviations

_DEC6 = "CAST(CAST(value AS DOUBLE) AS DECIMAL(18,6))"


def q_ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per user series: {BOLL_WINDOW}-row rolling mean ±
    {BOLL_K}σ over ``value`` ordered by (ts, event_id), with an
    outside-band breakout flag — the standard rolling-volatility
    envelope (Bollinger 1983, public formulation).

    ONE shuffle: the rolling decimal sum, square-sum, and count are
    three frame aggregates over the SAME (user_id | ts, event_id)
    window spec, so Catalyst plans a single exchange + sort feeding one
    Window operator; everything after is a narrow projection. Per-key
    state is one frame of {BOLL_WINDOW} rows — at 100 TB the shuffle is
    events-sized once and never joins. Exactness: value is
    micro-quantized to DECIMAL(18,6) per row (cent-exact fixture data),
    frame sums are exact decimal, and mean/variance/bands are ONE shared
    IEEE expression from those exact sums, rounded once — the
    ts_zscore recipe applied to a moving frame. Bands need n ≥ 2
    (sample variance) and a positive variance; flat frames emit NULL
    bands and a false flag on both engines (3-valued logic resolved by
    coalesce)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(BOLL_WINDOW - 1), 0)
    )
    d = F.col("value").cast("double").cast("decimal(18,6)")
    # all three frame aggregates in ONE select → one Window operator
    # (withColumn chains would compile to a Window pass per column)
    framed = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.count("*").over(w).alias("n_window"),
        F.sum(d).over(w).cast("double").alias("s"),
        F.sum(d * d).over(w).cast("double").alias("sq"),
    )
    n = F.col("n_window")
    mean = F.col("s") / n
    # greatest(n-1, 1): subexpression elimination hoists the shared var
    # term OUT of the n>1 when-guards, so the divisor must be total
    # under ANSI; identical value wherever the guards let it matter
    var = (F.col("sq") - F.col("s") * F.col("s") / n) / F.greatest(
        n - 1, F.lit(1).cast("bigint")
    )
    sd = F.sqrt(var)
    upper = mean + BOLL_K * sd
    lower = mean - BOLL_K * sd
    ok = (n > 1) & (var > 0)
    return framed.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "n_window",
        F.round(mean, 6).alias("sma"),
        F.when(ok, F.round(upper, 6)).alias("upper_band"),
        F.when(ok, F.round(lower, 6)).alias("lower_band"),
        F.coalesce(
            ok & ((F.col("value") > upper) | (F.col("value") < lower)),
            F.lit(False),
        ).alias("breakout"),
    )


SQL_TS_BOLLINGER = f"""
    WITH framed AS (
        SELECT event_id, user_id, ts, value,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               CAST(SUM({_DEC6}) OVER w AS DOUBLE) AS s,
               CAST(SUM({_DEC6} * {_DEC6}) OVER w AS DOUBLE) AS sq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING
                              AND CURRENT ROW))
    SELECT event_id, user_id, ts, value, n_window,
           ROUND(s / n_window, 6) AS sma,
           CASE WHEN n_window > 1
                 AND (sq - s * s / n_window) / (n_window - 1) > 0
                THEN ROUND(s / n_window + {BOLL_K} *
                           SQRT((sq - s * s / n_window) / (n_window - 1)), 6)
           END AS upper_band,
           CASE WHEN n_window > 1
                 AND (sq - s * s / n_window) / (n_window - 1) > 0
                THEN ROUND(s / n_window - {BOLL_K} *
                           SQRT((sq - s * s / n_window) / (n_window - 1)), 6)
           END AS lower_band,
           COALESCE(n_window > 1
                    AND (sq - s * s / n_window) / (n_window - 1) > 0
                    AND (value > s / n_window + {BOLL_K} *
                         SQRT((sq - s * s / n_window) / (n_window - 1))
                         OR value < s / n_window - {BOLL_K} *
                         SQRT((sq - s * s / n_window) / (n_window - 1))),
                    FALSE) AS breakout
    FROM framed
"""


RSI_PERIOD = 14  # classic RSI period (Cutler's SMA variant)


def q_ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI per user series: {RSI_PERIOD}-delta simple-moving-
    average relative-strength index over ``value`` — the SMA variant of
    Wilder's RSI (Cutler's RSI is the standard order-free reformulation;
    Wilder's own smoothing is an infinite recursive EWMA whose float
    recursion is not cross-engine exact, so the SMA variant is the
    oracle-checkable twin and is documented as such).

    ONE shuffle: the delta lag and the two rolling frame sums share the
    same (user_id | ts, event_id) window spec — one exchange + sort,
    two Window operators over the same partitioning (no second
    exchange), then narrow math. Exactness: deltas are IEEE double
    subtractions identical on both engines, quantized dec9 before the
    frame sums (order-free decimals), and the RSI expression is shared
    verbatim. Rows before a full {RSI_PERIOD}-delta frame emit NULL;
    an all-gain frame (zero loss sum) pins RSI to 100 by convention on
    both engines."""
    ev = load(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wl.rowsBetween(-(RSI_PERIOD - 1), 0)
    delta = F.col("value") - F.lag("value").over(wl)
    # greatest() IGNORES nulls on both engines (greatest(NULL, 0) = 0),
    # which would count each series' first row as a phantom zero delta —
    # gate on the lag explicitly so warm-up needs RSI_PERIOD REAL deltas
    gain = F.when(delta.isNotNull(), dec9(F.greatest(delta, F.lit(0.0)), 18))
    loss = F.when(delta.isNotNull(), dec9(F.greatest(-delta, F.lit(0.0)), 18))
    deltas = (
        ev.select("event_id", "user_id", "ts", "value")
        .withColumn("gain", gain)
        .withColumn("loss", loss)
    )
    n_deltas = F.count("gain").over(wf)
    g = F.sum("gain").over(wf).cast("double")
    l = F.sum("loss").over(wf).cast("double")
    rsi = F.when(
        n_deltas == RSI_PERIOD,
        F.when(l > 0, F.round(100 - 100 / (1 + g / l), 6)).otherwise(100.0),
    )
    return deltas.withColumn("rsi", rsi).select(
        "event_id", "user_id", "ts", "value", "rsi"
    )


SQL_TS_RSI = f"""
    WITH deltas AS (
        SELECT event_id, user_id, ts, value,
               CASE WHEN LAG(value) OVER wl IS NOT NULL THEN
                   CAST(ROUND(GREATEST(value - LAG(value) OVER wl, 0), 9)
                        AS DECIMAL(18,9)) END AS gain,
               CASE WHEN LAG(value) OVER wl IS NOT NULL THEN
                   CAST(ROUND(GREATEST(LAG(value) OVER wl - value, 0), 9)
                        AS DECIMAL(18,9)) END AS loss
        FROM events
        WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id)),
    framed AS (
        SELECT event_id, user_id, ts, value,
               COUNT(gain) OVER wf AS n_deltas,
               CAST(SUM(gain) OVER wf AS DOUBLE) AS g,
               CAST(SUM(loss) OVER wf AS DOUBLE) AS l
        FROM deltas
        WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING
                               AND CURRENT ROW))
    SELECT event_id, user_id, ts, value,
           CASE WHEN n_deltas = {RSI_PERIOD} THEN
               CASE WHEN l > 0 THEN ROUND(100 - 100 / (1 + g / l), 6)
                    ELSE 100.0 END
           END AS rsi
    FROM framed
"""


TS_EPOCH = "2024-01-01"  # day-index origin for the daily rollup


def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event-type series: the median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i) over the DAILY mean-value
    series (Theil 1950 / Sen 1968) — the 29.3 %-breakdown alternative to
    least squares, immune to the outliers that wreck agg_linreg's fit.
    Median = LOWER median (rank ⌈n/2⌉), the repo's order-statistic
    convention — picks an actual computed slope, no cross-engine
    interpolation arithmetic.

    Scale shape: events collapse FIRST to one (type, day, mean) row per
    series-day — the only full-data pass — and the rollup is
    ``localCheckpoint``-ed (days·types rows) because BOTH self-join
    sides consume it: without the cut the lazy plan derives each side
    independently and the corpus is scanned twice. Daily means come
    from exact decimal(18,6) sums divided as doubles (one IEEE tree
    both engines; the oracle's daily CTE is AS MATERIALIZED for the
    same two-consumer reason). The O(d²) pair lattice is generated from
    that day-level rollup by a self-join on event_type, so the
    quadratic term is bounded by days-per-series, never by raw events —
    at 100 TB with decade-long second-resolution series, cap d by
    widening the rollup bucket or sample pairs (Matoušek's randomized
    Theil–Sen), both order-preserving. Rank selection is one window
    over the pair-sized relation, partitioned by type.
    """
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit(TS_EPOCH).cast("date"))
    v6 = F.col("value").cast("double").cast("decimal(18,6)")
    daily = (
        ev.groupBy(F.col("event_type"), day.alias("day"))
        .agg((F.sum(v6).cast("double") / F.count("*")).alias("y"))
        .localCheckpoint()  # bounded: |types|·|days| rows, 2 consumers
    )
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (
                (F.col("yb") - F.col("ya"))
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == ((F.col("n_pairs") + 1) / 2).cast("long")
    ).select(
        "event_type",
        "n_pairs",
        F.round(F.col("slope"), 6).alias("sen_slope"),
    )


SQL_TS_THEIL_SEN = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type,
               DATEDIFF('day', DATE '{TS_EPOCH}', CAST(ts AS DATE)) AS day,
               CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(18,6)))
                    AS DOUBLE) / COUNT(*) AS y
        FROM events GROUP BY 1, 2),
    slopes AS (
        SELECT a.event_type,
               (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day),
    ranked AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes)
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(slope, 6) AS sen_slope
    FROM ranked WHERE rn = CAST((n_pairs + 1) // 2 AS BIGINT)
"""


ATTRIB_TOUCH_TYPES = ("click", "view")
ATTRIB_LOOKBACK_DAYS = 7


def q_ts_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution report: every purchase is credited to the
    FIRST and to the LAST touch event (click/view by the same user)
    inside a {ATTRIB_LOOKBACK_DAYS}-day lookback window, then credited
    conversions are counted per (model, touch_type) — the two
    single-touch models of the standard attribution family.

    Scale shape: both sides prune to their type slices at the scan
    (purchases and touches are each one pushed filter over events), the
    candidate join is an EQUI-join on user_id with the lookback band as
    a residual range filter — per-user fanout is purchases × touches
    within 7 days, bounded by per-user activity density, the same
    banding argument as join_range_band (bucket the band by day and
    AQE-salt hot users at extreme skew). Both rank directions ride ONE
    pid exchange (two Window sorts, same partitioning), and the two
    models come out of that single pass by exploding the per-row
    applicable-model set — NOT a union of per-model branches, which
    would re-derive the whole join per model (4 event scans instead of
    2, seen in this plan before the fix). Tie-break on the touch
    event_id makes the pick total; outputs are pure integer counts —
    hash-exact by construction. The oracle keeps the two-branch UNION
    ALL form over an AS MATERIALIZED ranked CTE, so the hash proves the
    explode rewrite.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)).select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
    )
    cand = purchases.join(touches, "u").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_LOOKBACK_DAYS} DAYS")
        )
    )
    wf = Window.partitionBy("pid").orderBy("t_ts", "tid")
    wl = Window.partitionBy("pid").orderBy(
        F.col("t_ts").desc(), F.col("tid").desc()
    )
    ranked = cand.select(
        "touch_type",
        F.row_number().over(wf).alias("rn_f"),
        F.row_number().over(wl).alias("rn_l"),
    )
    models = F.array_compact(
        F.array(
            F.when(F.col("rn_f") == 1, F.lit("first_touch")),
            F.when(F.col("rn_l") == 1, F.lit("last_touch")),
        )
    )
    return (
        ranked.filter((F.col("rn_f") == 1) | (F.col("rn_l") == 1))
        .select(F.explode(models).alias("model"), "touch_type")
        .groupBy("model", "touch_type")
        .agg(F.count("*").alias("conversions"))
    )


SQL_TS_ATTRIBUTION = f"""
    WITH cand AS (
        SELECT p.event_id AS pid, t.event_type AS touch_type,
               t.ts AS t_ts, t.event_id AS tid
        FROM events p JOIN events t ON p.user_id = t.user_id
        WHERE p.event_type = 'purchase'
          AND t.event_type IN ('{ATTRIB_TOUCH_TYPES[0]}',
                               '{ATTRIB_TOUCH_TYPES[1]}')
          AND t.ts < p.ts
          AND t.ts >= p.ts - INTERVAL {ATTRIB_LOOKBACK_DAYS} DAY),
    ranked AS MATERIALIZED (
        SELECT pid, touch_type,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY t_ts, tid)
                   AS rn_f,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY t_ts DESC, tid DESC) AS rn_l
        FROM cand)
    SELECT 'first_touch' AS model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS conversions
    FROM ranked WHERE rn_f = 1 GROUP BY 2
    UNION ALL
    SELECT 'last_touch' AS model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS conversions
    FROM ranked WHERE rn_l = 1 GROUP BY 2
"""



QUERIES = {
    "ts_theil_sen": Query(q_ts_theil_sen, SQL_TS_THEIL_SEN),
    "ts_attribution": Query(q_ts_attribution, SQL_TS_ATTRIBUTION),
    "ts_bollinger": Query(q_ts_bollinger, SQL_TS_BOLLINGER),
    "ts_rsi": Query(q_ts_rsi, SQL_TS_RSI),
    "ts_downsample_lttb": Query(q_ts_downsample_lttb, SQL_TS_LTTB),
    "ts_downsample_m4": Query(q_ts_downsample_m4, SQL_TS_M4),
}
