"""Hypothesis tests and experimentation gates over ``events`` /
``orders`` — split out of ``operators.aggregates`` for navigability
(VERDICT r12 item 7 hygiene bar: no source file over 2,500 lines; pure
move, no semantic change, registry names unchanged): the two-sample KS
test, chi-square independence, Welch's t-test, the Mann-Whitney U, and
the experimentation pair CUPED + sample-ratio-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec9
from ..registry import Query
from ..tables import load

KS_BASELINE = "click"  # every other event type's value distribution vs this


def q_agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test per event type: is each
    type's ``value`` distribution the same as the {KS_BASELINE}
    baseline's? D = sup|F₁−F₂| plus the asymptotic two-sided p-value
    2·exp(−2D²·n₁n₂/(n₁+n₂)) — the distribution-drift check a training-
    data pipeline runs between corpus snapshots.

    Scale shape: events collapse to per-(type, value) counts FIRST
    (partial-agg shuffle — the only data-sized exchange); the baseline's
    bounded count relation is cross-joined against the ≤|types| distinct
    non-baseline types (broadcast, constant fanout) so every pair's
    merged support exists; then ONE (pair | value) window computes both
    running CDFs and the sup runs as a plain groupBy max. Exactness:
    CDFs are exact-integer/exact-integer IEEE divisions, |F₁−F₂| is
    rounded dec9 BEFORE the max (sup is order-free anyway, but the
    rounding pins the 15th-ulp ties), and the p-value expression tree is
    shared verbatim."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    per_val = ev.groupBy("event_type", "value").agg(
        F.count("*").alias("c")
    )
    base = per_val.filter(F.col("event_type") == KS_BASELINE).select(
        F.col("value"), F.col("c").alias("c2")
    )
    others = per_val.filter(F.col("event_type") != KS_BASELINE).select(
        F.col("event_type").alias("pair"), "value", F.col("c").alias("c1")
    )
    types = others.select("pair").distinct()
    merged = (
        others.unionByName(
            base.crossJoin(F.broadcast(types)).select(
                "pair", "value", F.lit(None).cast("long").alias("c1")
            ),
            allowMissingColumns=True,
        )
        .groupBy("pair", "value")
        .agg(
            F.sum("c1").alias("c1"),
            # baseline counts attach by value via a broadcast join below
        )
        .join(F.broadcast(base), "value", "left")
    )
    w = (
        Window.partitionBy("pair")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wp = Window.partitionBy("pair")
    cdfs = merged.select(
        "pair",
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).over(w).alias("cum1"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0))).over(w).alias("cum2"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).over(wp).alias("n1"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0))).over(wp).alias("n2"),
    )
    d = F.max(
        F.round(
            F.abs(
                F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2")
            ),
            9,
        )
    ).alias("d_stat")
    out = cdfs.groupBy("pair").agg(
        F.first("n1").alias("n1"), F.first("n2").alias("n2"), d
    )
    # n1 is cast to double BEFORE the multiply so both engines share one
    # IEEE expression tree (the oracle writes CAST(n1 AS DOUBLE) * n2) and
    # the long product cannot overflow 2^63 at 100 TB counts (ADVICE r9)
    ne = F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    return out.select(
        F.col("pair").alias("event_type"),
        "n1",
        "n2",
        "d_stat",
        F.round(
            F.least(
                F.lit(1.0),
                2 * F.exp(-2 * F.col("d_stat") * F.col("d_stat") * ne),
            ),
            6,
        ).alias("p_approx"),
    )


SQL_AGG_KS_TEST = f"""
    WITH per_val AS (
        SELECT event_type, value, COUNT(*) AS c
        FROM events GROUP BY 1, 2),
    base AS (
        SELECT value, c AS c2 FROM per_val
        WHERE event_type = '{KS_BASELINE}'),
    others AS (
        SELECT event_type AS pair, value, c AS c1 FROM per_val
        WHERE event_type <> '{KS_BASELINE}'),
    types AS (SELECT DISTINCT pair FROM others),
    merged AS (
        SELECT m.pair, m.value, m.c1, base.c2
        FROM (
            SELECT pair, value, SUM(c1) AS c1 FROM (
                SELECT pair, value, c1 FROM others
                UNION ALL
                SELECT t.pair, b.value, CAST(NULL AS BIGINT)
                FROM base b CROSS JOIN types t)
            GROUP BY 1, 2) m
        LEFT JOIN base ON m.value = base.value),
    cdfs AS (
        SELECT pair,
               SUM(COALESCE(c1, 0)) OVER (PARTITION BY pair ORDER BY value
                   ROWS UNBOUNDED PRECEDING) AS cum1,
               SUM(COALESCE(c2, 0)) OVER (PARTITION BY pair ORDER BY value
                   ROWS UNBOUNDED PRECEDING) AS cum2,
               SUM(COALESCE(c1, 0)) OVER (PARTITION BY pair) AS n1,
               SUM(COALESCE(c2, 0)) OVER (PARTITION BY pair) AS n2
        FROM merged),
    agg AS (
        SELECT pair, CAST(MAX(n1) AS BIGINT) AS n1,
               CAST(MAX(n2) AS BIGINT) AS n2,
               MAX(ROUND(ABS(CAST(cum1 AS DOUBLE) / n1
                             - CAST(cum2 AS DOUBLE) / n2), 9)) AS d_stat
        FROM cdfs GROUP BY pair)
    SELECT pair AS event_type, n1, n2, d_stat,
           ROUND(LEAST(1.0, 2 * EXP(-2 * d_stat * d_stat
                 * (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
    FROM agg
"""


def q_agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event_type independent of
    day-of-week? χ² = Σ (obs−exp)²/exp over the contingency table, plus
    degrees of freedom and Cramér's V effect size — the categorical-
    drift twin of the KS test.

    Scale shape: ONE partial-aggregated shuffle collapses events to the
    ≤|types|·7 contingency cells; the row/column/grand totals ride
    window sums over that bounded relation (single partition of ≤35
    rows — deliberately, it is model-sized, not data-sized). Exactness:
    counts are exact integers, expected counts one shared IEEE
    expression, and each cell's χ² term is dec9-quantized before the
    order-free decimal total. Engines number dayofweek differently
    (Spark 1=Sun..7, DuckDB 0=Sun..6) but the statistic is label-
    invariant and no dow column reaches the output, so the relabeling
    is immaterial — by construction, not by luck."""
    ev = load(spark, sf_dir, "events")
    seen = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("obs"))
    # the statistic is over the FULL r×c grid: an unobserved (type, dow)
    # combination still contributes (0−exp)²/exp, so densify with the
    # bounded distinct-margins cross product before the window totals
    cells = (
        seen.select("event_type")
        .distinct()
        .crossJoin(seen.select("dow").distinct())
        .join(seen, ["event_type", "dow"], "left")
        .select(
            "event_type", "dow", F.coalesce("obs", F.lit(0)).alias("obs")
        )
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wall = Window.partitionBy()
    t = cells.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(wr).alias("row_tot"),
        F.sum("obs").over(wc).alias("col_tot"),
        F.sum("obs").over(wall).alias("n"),
    )
    # row_tot cast to double BEFORE the multiply: one IEEE tree shared
    # with the oracle's CAST(row_tot AS DOUBLE) * col_tot, and no long
    # overflow on the margin product at 100 TB counts (ADVICE r9)
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    term = dec9((F.col("obs") - exp) * (F.col("obs") - exp) / exp, 28)
    agg = t.agg(
        F.sum(term).cast("double").alias("chi2_raw"),
        F.count_distinct(F.col("event_type")).alias("r"),
        F.count_distinct(F.col("dow")).alias("c"),
        F.first("n").alias("n"),
    )
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    v = F.sqrt(
        F.col("chi2_raw")
        / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
    )
    return agg.select(
        F.round("chi2_raw", 6).alias("chi2"),
        dof.alias("dof"),
        F.col("n").cast("long").alias("n"),
        F.round(v, 6).alias("cramers_v"),
    )


SQL_AGG_CHISQ = """
    WITH seen AS (
        SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS obs
        FROM events GROUP BY 1, 2),
    cells AS (
        SELECT g.event_type, g.dow, COALESCE(seen.obs, 0) AS obs
        FROM (SELECT DISTINCT a.event_type, b.dow
              FROM seen a CROSS JOIN seen b) g
        LEFT JOIN seen ON g.event_type = seen.event_type
                      AND g.dow = seen.dow),
    t AS (
        SELECT event_type, dow, obs,
               SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
               SUM(obs) OVER (PARTITION BY dow) AS col_tot,
               SUM(obs) OVER () AS n
        FROM cells),
    agg AS (
        SELECT CAST(SUM(CAST(ROUND(
                   (obs - CAST(row_tot AS DOUBLE) * col_tot / n)
                   * (obs - CAST(row_tot AS DOUBLE) * col_tot / n)
                   / (CAST(row_tot AS DOUBLE) * col_tot / n), 9)
               AS DECIMAL(28,9))) AS DOUBLE) AS chi2_raw,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
               CAST(MAX(n) AS BIGINT) AS n
        FROM t)
    SELECT ROUND(chi2_raw, 6) AS chi2,
           (r - 1) * (c - 1) AS dof, n,
           ROUND(SQRT(chi2_raw / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
    FROM agg
"""


def q_agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test per event type vs the
    {KS_BASELINE} baseline: mean-shift detection with the
    Welch–Satterthwaite degrees of freedom — the parametric member of
    the drift battery (KS = shape, χ² = categorical, Welch = mean).

    Scale shape: ONE partial-aggregated shuffle collapses events to
    per-type (n, Σv, Σv²) moment rows; the baseline's single moment row
    broadcasts onto the ≤|types| others. Exactness: the ts_zscore
    recipe — decimal(18,6)-quantized sums, sample variance and the
    t/dof trees as shared IEEE expressions from the exact moments,
    rounded once; degenerate n ≤ 1 or zero-variance sides emit NULL on
    both engines."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    d = F.col("value").cast("double").cast("decimal(18,6)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d).cast("double").alias("s"),
        F.sum(d * d).cast("double").alias("sq"),
    )
    base = m.filter(F.col("event_type") == KS_BASELINE).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("sq").alias("sq2")
    )
    t = m.filter(F.col("event_type") != KS_BASELINE).crossJoin(
        F.broadcast(base)
    )
    # sample variances from exact moments; divisors total under ANSI
    v1 = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / F.greatest(
        F.col("n") - 1, F.lit(1).cast("long")
    )
    v2 = (
        F.col("sq2") - F.col("s2") * F.col("s2") / F.col("n2")
    ) / F.greatest(F.col("n2") - 1, F.lit(1).cast("long"))
    se2 = v1 / F.col("n") + v2 / F.col("n2")
    mean_diff = F.col("s") / F.col("n") - F.col("s2") / F.col("n2")
    dof = (se2 * se2) / (
        (v1 / F.col("n")) * (v1 / F.col("n"))
        / F.greatest(F.col("n") - 1, F.lit(1).cast("long"))
        + (v2 / F.col("n2")) * (v2 / F.col("n2"))
        / F.greatest(F.col("n2") - 1, F.lit(1).cast("long"))
    )
    ok = (F.col("n") > 1) & (F.col("n2") > 1) & (se2 > 0)
    return t.select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("n2"),
        F.round(mean_diff, 6).alias("mean_diff"),
        F.when(ok, F.round(mean_diff / F.sqrt(se2), 6)).alias("t_stat"),
        F.when(ok, F.round(dof, 6)).alias("dof_welch"),
    )


_WELCH_DEC = "CAST(CAST(value AS DOUBLE) AS DECIMAL(18,6))"

SQL_AGG_WELCH_TTEST = f"""
    WITH m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({_WELCH_DEC}) AS DOUBLE) AS s,
               CAST(SUM({_WELCH_DEC} * {_WELCH_DEC}) AS DOUBLE) AS sq
        FROM events GROUP BY event_type),
    base AS (
        SELECT n AS n2, s AS s2, sq AS sq2 FROM m
        WHERE event_type = '{KS_BASELINE}'),
    t AS (
        SELECT event_type, n, s, sq, n2, s2, sq2,
               (sq - s * s / n) / GREATEST(n - 1, 1) AS v1,
               (sq2 - s2 * s2 / n2) / GREATEST(n2 - 1, 1) AS v2
        FROM m CROSS JOIN base
        WHERE event_type <> '{KS_BASELINE}')
    SELECT event_type, n AS n1, n2,
           ROUND(s / n - s2 / n2, 6) AS mean_diff,
           CASE WHEN n > 1 AND n2 > 1 AND v1 / n + v2 / n2 > 0
                THEN ROUND((s / n - s2 / n2)
                           / SQRT(v1 / n + v2 / n2), 6) END AS t_stat,
           CASE WHEN n > 1 AND n2 > 1 AND v1 / n + v2 / n2 > 0
                THEN ROUND((v1 / n + v2 / n2) * (v1 / n + v2 / n2)
                           / ((v1 / n) * (v1 / n) / GREATEST(n - 1, 1)
                              + (v2 / n2) * (v2 / n2)
                                / GREATEST(n2 - 1, 1)), 6)
           END AS dof_welch
    FROM t
"""


def q_agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) per event type vs the
    {KS_BASELINE} baseline, normal approximation WITH tie correction —
    the nonparametric member of the drift battery (no distributional
    assumption, unlike Welch).

    Scale shape: identical skeleton to agg_ks_test — events collapse to
    per-(type, value) counts, the bounded baseline relation fans out to
    each pair via broadcast, and ONE (pair | value) window yields the
    rank structure. Exactness: average ranks of tied groups are
    half-integers, so the rank sum is carried DOUBLED as an exact
    integer (Σ c₁·(2·cum_before + t + 1)); U, the tie term Σ(t³−t), and
    every moment stay exact integers until the one shared z expression.
    Degenerate all-tied pools (zero variance) emit NULL z on both
    engines."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    per_val = ev.groupBy("event_type", "value").agg(F.count("*").alias("c"))
    base = per_val.filter(F.col("event_type") == KS_BASELINE).select(
        "value", F.col("c").alias("c2")
    )
    others = per_val.filter(F.col("event_type") != KS_BASELINE).select(
        F.col("event_type").alias("pair"), "value", F.col("c").alias("c1")
    )
    types = others.select("pair").distinct()
    merged = (
        others.unionByName(
            base.crossJoin(F.broadcast(types)).select(
                "pair", "value", F.lit(None).cast("long").alias("c1")
            )
        )
        .groupBy("pair", "value")
        .agg(F.sum("c1").alias("c1"))
        .join(F.broadcast(base), "value", "left")
        .select(
            "pair",
            "value",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    w = (
        Window.partitionBy("pair")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col("c1") + F.col("c2")
    ranked = merged.select(
        "pair",
        "c1",
        "c2",
        t.alias("t"),
        F.coalesce(F.sum(t).over(w), F.lit(0)).alias("cum_before"),
    )
    agg = ranked.groupBy("pair").agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        # doubled rank sum of sample 1: exact integer
        F.sum(
            F.col("c1") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_term"
        ),
    )
    n = F.col("n1") + F.col("n2")
    u1 = F.col("r1x2") / 2.0 - F.col("n1") * (F.col("n1") + 1) / 2.0
    mean_u = F.col("n1") * F.col("n2") / 2.0
    var_u = (
        F.col("n1")
        * F.col("n2")
        / 12.0
        * ((n + 1) - F.col("tie_term") / (n * (n - 1)))
    )
    return agg.select(
        F.col("pair").alias("event_type"),
        "n1",
        "n2",
        F.round(u1, 1).alias("u_stat"),
        F.when(var_u > 0, F.round((u1 - mean_u) / F.sqrt(var_u), 6)).alias(
            "z_stat"
        ),
    )


SQL_AGG_MANN_WHITNEY = f"""
    WITH per_val AS (
        SELECT event_type, value, COUNT(*) AS c
        FROM events GROUP BY 1, 2),
    base AS (
        SELECT value, c AS c2 FROM per_val
        WHERE event_type = '{KS_BASELINE}'),
    others AS (
        SELECT event_type AS pair, value, c AS c1 FROM per_val
        WHERE event_type <> '{KS_BASELINE}'),
    types AS (SELECT DISTINCT pair FROM others),
    merged AS (
        SELECT m.pair, m.value, COALESCE(m.c1, 0) AS c1,
               COALESCE(base.c2, 0) AS c2
        FROM (
            SELECT pair, value, SUM(c1) AS c1 FROM (
                SELECT pair, value, c1 FROM others
                UNION ALL
                SELECT t.pair, b.value, CAST(NULL AS BIGINT)
                FROM base b CROSS JOIN types t)
            GROUP BY 1, 2) m
        LEFT JOIN base ON m.value = base.value),
    ranked AS (
        SELECT pair, c1, c2, c1 + c2 AS t,
               COALESCE(SUM(c1 + c2) OVER (PARTITION BY pair ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM merged),
    agg AS (
        SELECT pair, CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2,
               CAST(SUM(c1 * (2 * cum_before + t + 1)) AS BIGINT) AS r1x2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        FROM ranked GROUP BY pair)
    SELECT pair AS event_type, n1, n2,
           ROUND(r1x2 / 2.0 - n1 * (n1 + 1) / 2.0, 1) AS u_stat,
           CASE WHEN n1 * n2 / 12.0 * ((n1 + n2 + 1)
                     - CAST(tie_term AS DOUBLE)
                       / ((n1 + n2) * (n1 + n2 - 1))) > 0
                THEN ROUND((r1x2 / 2.0 - n1 * (n1 + 1) / 2.0
                            - n1 * n2 / 2.0)
                           / SQRT(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                                  - CAST(tie_term AS DOUBLE)
                                    / ((n1 + n2) * (n1 + n2 - 1)))), 6)
           END AS z_stat
    FROM agg
"""




CUPED_SPLIT = "2024-01-16"  # pre-period = Jan 1-15, post = Jan 16 on


def q_agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    — the standard pre-experiment covariate adjustment for A/B metrics:
    per user, pre-period value mass X and post-period mass Y;
    θ = cov(X,Y)/var(X); the adjusted metric Y − θ(X − X̄) has variance
    var(Y)·(1 − ρ²). Reports θ, the raw and adjusted variances, and the
    variance-reduction percentage (= 100·ρ²) — the number that decides
    how much smaller the experiment can be.

    Exactness: the same strategy as agg_linreg/agg_corr — per-user
    period sums are exact decimal(18,6) (missing period ⇒ exact 0),
    re-narrowed to decimal(18,6) after the first aggregate so the
    second-level co-moment products stay inside decimal(38,12) on BOTH
    engines; all five co-moment sums are exact decimals and the closing
    θ/variance expressions are one shared IEEE double tree rounded at
    the end (population variances in the n²-scaled form). Plan shape:
    two stacked partial-aggregated groupBys (user rollup → scalar
    moments) — user-count partitions never concentrate, and the second
    aggregate reduces a user-sized relation to one row; the classic
    two-level shuffle at 100 TB. At production value magnitudes widen
    the narrowing cast, or re-center X,Y first (algebraically identical
    co-moments), per the agg_linreg note.
    """
    ev = load(spark, sf_dir, "events")
    v6 = F.col("value").cast("decimal(18,6)")
    split = F.lit(CUPED_SPLIT).cast("timestamp_ntz")
    zero = F.lit(0).cast("decimal(18,6)")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < split, v6)).cast("decimal(18,6)"),
            zero,
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= split, v6)).cast("decimal(18,6)"),
            zero,
        ).alias("y"),
    )
    # one side of each product widened to decimal(19,6): Spark then
    # types the product (38,12) with NO precision loss, and DuckDB's
    # physical multiply runs in hugeint instead of overflowing int64
    # (DuckDB executes (18,6)×(18,6) in the inputs' int64 width)
    xw = F.col("x").cast("decimal(19,6)")
    yw = F.col("y").cast("decimal(19,6)")
    base = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(xw * F.col("y")).cast("double").alias("sxy"),
        F.sum(xw * F.col("x")).cast("double").alias("sxx"),
        F.sum(yw * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n_users")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    theta = F.when(vx != 0, cov / vx)
    var_post = vy / (n * n)
    var_adj = F.when(vx != 0, (vy - (cov * cov) / vx) / (n * n)).otherwise(
        var_post
    )
    reduction = F.when(
        vx * vy != 0, F.lit(100.0) * (cov * cov) / (vx * vy)
    ).otherwise(F.lit(0.0))
    return base.select(
        "n_users",
        F.round(theta, 6).alias("theta"),
        F.round(F.col("sy") / n, 6).alias("mean_post"),
        F.round(var_post, 6).alias("var_post"),
        F.round(var_adj, 6).alias("var_adj"),
        F.round(reduction, 6).alias("reduction_pct"),
    )


SQL_AGG_CUPED = f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                       THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    AS DECIMAL(18,6)) AS x,
               CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                       THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    AS DECIMAL(18,6)) AS y
        FROM events GROUP BY user_id),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,6)) * y) AS DOUBLE) AS syy
        FROM per_user)
    SELECT n_users,
           ROUND((n_users * sxy - sx * sy)
                 / NULLIF(n_users * sxx - sx * sx, 0), 6) AS theta,
           ROUND(sy / n_users, 6) AS mean_post,
           ROUND((n_users * syy - sy * sy) / (n_users * n_users), 6)
               AS var_post,
           ROUND(CASE WHEN n_users * sxx - sx * sx <> 0 THEN
                     ((n_users * syy - sy * sy)
                      - (n_users * sxy - sx * sy) * (n_users * sxy - sx * sy)
                        / (n_users * sxx - sx * sx))
                     / (n_users * n_users)
                 ELSE (n_users * syy - sy * sy) / (n_users * n_users) END, 6)
               AS var_adj,
           ROUND(CASE WHEN (n_users * sxx - sx * sx)
                           * (n_users * syy - sy * sy) <> 0 THEN
                     100.0 * (n_users * sxy - sx * sy)
                           * (n_users * sxy - sx * sy)
                     / ((n_users * sxx - sx * sx)
                        * (n_users * syy - sy * sy))
                 ELSE 0.0 END, 6) AS reduction_pct
    FROM base
"""


SRM_CRIT_95 = 3.841459  # chi-square 95% critical value, 1 dof (fixed literal)


def q_agg_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al., KDD 2019 'Diagnosing
    Sample Ratio Mismatch') — the first gate every experimentation
    platform runs: are the two arms' USER counts consistent with the
    designed 50/50 split? Arms are assigned deterministically as
    user_id mod 2 (an engine-portable stand-in for the platform's
    bucketing hash — Spark and DuckDB hash functions differ, integer
    mod does not). For a 50/50 design the 1-dof chi-square statistic
    reduces exactly to (n_a − n_b)²/n; the flag compares against the
    fixed 95% critical value. Completes the experimentation family:
    agg_srm (gate) → agg_cuped (variance reduction) → agg_conversion_ci
    (effect read-out).

    Plan: distinct users (one partial-agg exchange on user_id) folded
    to a single row — counts are exact integers, the statistic is one
    shared IEEE tree. Linear single-scan at any scale.
    """
    users = load(spark, sf_dir, "events").select("user_id").distinct()
    base = users.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
    )
    nb = F.col("n_users") - F.col("n_a")
    d = (F.col("n_a") - nb).cast("double")
    chi2 = d * d / F.col("n_users").cast("double")
    return base.select(
        "n_users",
        "n_a",
        nb.alias("n_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(SRM_CRIT_95)).alias("srm"),
    )


SQL_AGG_SRM = f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a
        FROM users)
    SELECT n_users, n_a, n_users - n_a AS n_b,
           ROUND(CAST(n_a - (n_users - n_a) AS DOUBLE)
                 * CAST(n_a - (n_users - n_a) AS DOUBLE)
                 / CAST(n_users AS DOUBLE), 6) AS chi2,
           (CAST(n_a - (n_users - n_a) AS DOUBLE)
            * CAST(n_a - (n_users - n_a) AS DOUBLE)
            / CAST(n_users AS DOUBLE)) > {SRM_CRIT_95} AS srm
    FROM base
"""



QUERIES = {
    "agg_cuped": Query(q_agg_cuped, SQL_AGG_CUPED),
    "agg_srm": Query(q_agg_srm, SQL_AGG_SRM),
    "agg_mann_whitney": Query(q_agg_mann_whitney, SQL_AGG_MANN_WHITNEY),
    "agg_welch_ttest": Query(q_agg_welch_ttest, SQL_AGG_WELCH_TTEST),
    "agg_ks_test": Query(q_agg_ks_test, SQL_AGG_KS_TEST),
    "agg_chisq": Query(q_agg_chisq, SQL_AGG_CHISQ),
}
