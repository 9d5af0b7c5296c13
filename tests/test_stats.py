"""Independent pure-Python references for the r9 statistical tests.

The DuckDB oracle proves cross-engine agreement, but both engines can
agree on wrong semantics (the ts_rsi greatest(NULL,0) lesson) — these
rebuild KS and chi-square from first principles on collected rows.
"""

from __future__ import annotations

import math

from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import (
        KS_BASELINE,
        q_agg_chisq,
        q_agg_ks_test,
    )
from kafka_connect_minio_pipeline_spark.tables import load


def test_ks_matches_pure_python_reference(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    base = sorted(r["value"] for r in ev if r["event_type"] == KS_BASELINE)
    got = {r["event_type"]: r for r in q_agg_ks_test(spark, sf_dir).collect()}
    assert KS_BASELINE not in got and got
    for etype, row in got.items():
        samp = sorted(r["value"] for r in ev if r["event_type"] == etype)
        support = sorted(set(samp) | set(base))
        d = 0.0
        i = j = 0
        for x in support:
            while i < len(samp) and samp[i] <= x:
                i += 1
            while j < len(base) and base[j] <= x:
                j += 1
            d = max(d, abs(i / len(samp) - j / len(base)))
        assert row["n1"] == len(samp) and row["n2"] == len(base)
        assert abs(row["d_stat"] - d) < 1e-8, (etype, row["d_stat"], d)
        ne = len(samp) * len(base) / (len(samp) + len(base))
        p = min(1.0, 2 * math.exp(-2 * d * d * ne))
        assert abs(row["p_approx"] - p) < 1e-5, etype


def test_chisq_matches_pure_python_reference(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    cells: dict = {}
    for r in ev:
        # any consistent dow labeling gives the same statistic
        key = (r["event_type"], r["ts"].weekday())
        cells[key] = cells.get(key, 0) + 1
    n = sum(cells.values())
    rows = {k[0] for k in cells}
    cols = {k[1] for k in cells}
    row_tot = {t: sum(v for k, v in cells.items() if k[0] == t) for t in rows}
    col_tot = {d: sum(v for k, v in cells.items() if k[1] == d) for d in cols}
    chi2 = sum(
        (cells.get((t, d), 0) - row_tot[t] * col_tot[d] / n) ** 2
        / (row_tot[t] * col_tot[d] / n)
        for t in rows
        for d in cols  # full grid: zero cells contribute (0-exp)^2/exp
    )
    got = q_agg_chisq(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert abs(got["chi2"] - chi2) < 1e-4, (got["chi2"], chi2)
    v = math.sqrt(chi2 / (n * min(len(rows) - 1, len(cols) - 1)))
    assert abs(got["cramers_v"] - v) < 1e-5


def test_welch_matches_pure_python_reference(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import q_agg_welch_ttest

    ev = (
        load(spark, sf_dir, "events").select("event_type", "value").collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])

    def moments(vals):
        n = len(vals)
        m = sum(vals) / n
        v = sum((x - m) ** 2 for x in vals) / (n - 1)
        return n, m, v

    n2, m2, v2 = moments(by_type[KS_BASELINE])
    got = {r["event_type"]: r for r in q_agg_welch_ttest(spark, sf_dir).collect()}
    assert KS_BASELINE not in got and got
    for etype, row in got.items():
        n1, m1, v1 = moments(by_type[etype])
        se2 = v1 / n1 + v2 / n2
        t = (m1 - m2) / math.sqrt(se2)
        dof = se2 * se2 / (
            (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
        )
        assert row["n1"] == n1 and row["n2"] == n2
        assert abs(row["mean_diff"] - (m1 - m2)) < 1e-4, etype
        assert abs(row["t_stat"] - t) < 1e-4, etype
        assert abs(row["dof_welch"] - dof) < 1e-2, etype


def test_mann_whitney_matches_pure_python_reference(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import q_agg_mann_whitney

    ev = (
        load(spark, sf_dir, "events").select("event_type", "value").collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    got = {
        r["event_type"]: r for r in q_agg_mann_whitney(spark, sf_dir).collect()
    }
    assert KS_BASELINE not in got and got
    base = by_type[KS_BASELINE]
    for etype, row in got.items():
        samp = by_type[etype]
        pooled = sorted(
            [(v, 1) for v in samp] + [(v, 2) for v in base]
        )
        # average ranks with ties
        r1 = 0.0
        tie = 0
        i = 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j][0] == pooled[i][0]:
                j += 1
            t = j - i
            avg_rank = (i + 1 + j) / 2  # ranks i+1..j
            r1 += avg_rank * sum(1 for k in range(i, j) if pooled[k][1] == 1)
            tie += t**3 - t
            i = j
        n1, n2 = len(samp), len(base)
        u1 = r1 - n1 * (n1 + 1) / 2
        mean_u = n1 * n2 / 2
        var_u = n1 * n2 / 12 * ((n1 + n2 + 1) - tie / ((n1 + n2) * (n1 + n2 - 1)))
        z = (u1 - mean_u) / math.sqrt(var_u)
        assert row["n1"] == n1 and row["n2"] == n2
        assert abs(row["u_stat"] - u1) < 0.51, (etype, row["u_stat"], u1)
        assert abs(row["z_stat"] - z) < 1e-4, (etype, row["z_stat"], z)


def test_cuped_matches_pure_python_reference(spark, sf_dir):
    """Independent CUPED rebuild: per-user pre/post sums, population
    co-moments, theta = cov/var, var_adj = var_post*(1-rho^2)."""
    import datetime

    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import (
        CUPED_SPLIT,
        q_agg_cuped,
    )

    split = datetime.datetime.fromisoformat(CUPED_SPLIT)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    users: dict[int, list] = {}
    for r in ev:
        x, y = users.setdefault(r["user_id"], [0.0, 0.0])
        # mirror the 6dp quantization (values are 2dp, so exact anyway)
        if r["ts"] < split:
            users[r["user_id"]][0] = round(x + round(r["value"], 6), 6)
        else:
            users[r["user_id"]][1] = round(y + round(r["value"], 6), 6)
    xs = [v[0] for v in users.values()]
    ys = [v[1] for v in users.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum((x - mx) ** 2 for x in xs) / n
    vy = sum((y - my) ** 2 for y in ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    theta = cov / vx
    row = q_agg_cuped(spark, sf_dir).collect()[0]
    assert row["n_users"] == n
    assert abs(row["theta"] - theta) < 1e-5
    assert abs(row["mean_post"] - my) < 1e-5
    assert abs(row["var_post"] - vy) < max(1e-5 * vy, 1e-5)
    assert abs(row["var_adj"] - (vy - theta * theta * vx)) < max(1e-5 * vy, 1e-5)
    assert abs(row["reduction_pct"] - 100.0 * cov * cov / (vx * vy)) < 1e-3
    assert 0.0 <= row["reduction_pct"] <= 100.0


def test_srm_matches_pure_python_reference(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import (
        SRM_CRIT_95,
        q_agg_srm,
    )

    users = {
        r["user_id"]
        for r in load(spark, sf_dir, "events").select("user_id").collect()
    }
    na = sum(1 for u in users if u % 2 == 0)
    nb = len(users) - na
    chi2 = (na - nb) ** 2 / len(users)
    row = q_agg_srm(spark, sf_dir).collect()[0]
    assert (row["n_users"], row["n_a"], row["n_b"]) == (len(users), na, nb)
    assert abs(row["chi2"] - chi2) < 1e-6  # operator reports 6 dp
    assert row["srm"] == (chi2 > SRM_CRIT_95)
