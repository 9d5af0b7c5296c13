"""Sketch-operator guarantees, asserted against exact ground truth.

The DuckDB parity net already proves the sketches are cross-engine
bit-exact; the tests here prove they are CORRECT SKETCHES — the
one-sided error contracts that make them usable at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators import sketches
from kafka_connect_minio_pipeline_spark.tables import load


def test_bloom_has_no_false_negatives(spark, sf_dir):
    rows = sketches.q_sketch_bloom_join(spark, sf_dir).collect()
    by = {(r.bloom_pass, r.is_member): r.n_rows for r in rows}
    # every true member must pass the filter: (False, True) cell is empty
    assert (False, True) not in by
    # sanity: some members exist and something was filtered out
    assert by.get((True, True), 0) > 0
    assert by.get((False, False), 0) > 0


def test_bloom_false_positive_rate_is_small(spark, sf_dir):
    rows = sketches.q_sketch_bloom_join(spark, sf_dir).collect()
    by = {(r.bloom_pass, r.is_member): r.n_rows for r in rows}
    fp = by.get((True, False), 0)
    non_members = fp + by.get((False, False), 0)
    # m=8192, k=4 over a few hundred members → fp-rate well under 5%
    assert non_members == 0 or fp / non_members < 0.05


def test_countmin_never_underestimates(spark, sf_dir):
    rows = sketches.q_sketch_countmin(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_cms >= r.n_true, (r.user_id, r.n_true, r.n_cms)


def test_countmin_matches_exact_counts(spark, sf_dir):
    """At test scale the sketch should also be tight for heavy hitters."""
    truth = {
        r.user_id: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in sketches.q_sketch_countmin(spark, sf_dir).collect():
        assert r.n_true == truth[r.user_id]
        assert r.n_cms <= r.n_true * 2  # collisions stay bounded at this scale


def test_hll_relative_error_within_bound(spark, sf_dir):
    rows = sketches.q_sketch_hll(spark, sf_dir).collect()
    assert {r.col_label for r in rows} == {"events.user_id", "orders.o_custkey"}
    for r in rows:
        # standard error for m=512 is ~1.04/sqrt(512) ≈ 4.6%; allow 4σ
        rel = abs(r.n_hll - r.n_exact) / r.n_exact
        assert rel < 0.2, (r.col_label, r.n_exact, r.n_hll)


def test_stream_hll_equals_batch_sketch(spark, sf_dir):
    """The streaming register state must converge to the batch sketch's
    registers exactly — same estimate to the last rounded digit."""
    from kafka_connect_minio_pipeline_spark.registry import all_queries

    qs = all_queries()
    stream_row = qs["stream_hll"].fn(spark, sf_dir).collect()
    batch = {
        r.col_label: r.n_hll for r in qs["sketch_hll"].fn(spark, sf_dir).collect()
    }
    assert len(stream_row) == 1
    assert stream_row[0].n_hll == batch["events.user_id"]


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """The estimate can never be further than one bin width from the
    exact (interpolated) quantile — the sketch's accuracy contract."""
    li = load(spark, sf_dir, "lineitem")
    est = {
        (r.l_returnflag, r.q): r.est
        for r in sketches.q_sketch_quantile(spark, sf_dir).collect()
    }
    exact = {
        (r.l_returnflag, q): r[f"p{int(q * 100)}"]
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(q)).alias(f"p{int(q * 100)}")
                for q in sketches.QSK_QUANTILES
            ]
        )
        .collect()
        for q in sketches.QSK_QUANTILES
    }
    assert set(est) == set(exact)
    for k in est:
        assert abs(est[k] - exact[k]) <= sketches.QSK_BIN_W, (k, est[k], exact[k])


def test_histogram_quantile_sketch_is_mergeable(spark, sf_dir):
    """finish(merge(sketch(A), sketch(B))) == finish(sketch(A ∪ B)) where
    merge is elementwise count addition — the property that lets per-day
    (or per-partition) sketches combine without revisiting rows."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged_bins = (
        sketches.histogram_bins(a, "l_returnflag", "l_extendedprice")
        .union(sketches.histogram_bins(b, "l_returnflag", "l_extendedprice"))
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = sorted(
        map(
            tuple,
            sketches.histogram_quantile_finish(merged_bins, "l_returnflag").collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            sketches.histogram_quantiles(
                li, "l_returnflag", "l_extendedprice"
            ).collect(),
        )
    )
    assert got == want


def test_hll_setops_intersection_within_error(spark, sf_dir):
    """Inclusion–exclusion compounds the per-sketch error; at p=9
    (512 registers, ~4.6% standard error) the overlap estimate must land
    within 15% of the exact intersection, and the union estimate can
    never fall below either side's estimate (register-max dominance)."""
    row = sketches.q_sketch_hll_setops(spark, sf_dir).collect()[0]
    assert row.n_exact_inter > 0
    rel = abs(row.hll_inter - row.n_exact_inter) / row.n_exact_inter
    assert rel < 0.15, (row.hll_inter, row.n_exact_inter)
    assert row.hll_union >= max(row.hll_a, row.hll_b) - 1e-9


def test_kmv_bottomk_union_merge_reaches_global_sketch(spark, sf_dir):
    """Mergeability: per-stratum bottom-k sets, unioned and re-cut to
    bottom-k, must reproduce the GLOBAL kth-min exactly — every global
    bottom-k element is in its own stratum's bottom-k, so the min-merge
    loses nothing. This is what lets each partition/file ship k values
    and the coordinator close the estimate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        _portable_hash,
    )
    from kafka_connect_minio_pipeline_spark.operators.sketches import KMV_K
    from kafka_connect_minio_pipeline_spark.tables import load

    ev = load(spark, sf_dir, "events")
    h = _portable_hash(
        F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
    ).alias("h")
    global_kth = (
        ev.select(h).distinct().orderBy("h").limit(KMV_K)
        .agg(F.max("h")).collect()[0][0]
    )
    per_stratum = (
        ev.select(F.col("event_type"), h)
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= KMV_K)
        .select("h")
        .distinct()
    )
    merged_kth = (
        per_stratum.orderBy("h").limit(KMV_K).agg(F.max("h")).collect()[0][0]
    )
    assert merged_kth == global_kth


def test_kmv_error_within_4_sigma(spark, sf_dir):
    """KMV relative error has std ≈ 1/sqrt(k-1); the observed error must
    sit within 4σ (same contract style as the HLL net)."""
    from kafka_connect_minio_pipeline_spark.operators.sketches import (
        KMV_K,
        q_sketch_kmv,
    )

    [r] = q_sketch_kmv(spark, sf_dir).collect()
    if r["k_used"] < KMV_K:
        assert r["rel_error"] == 0.0  # exact arm
    else:
        assert abs(r["rel_error"]) <= 4.0 / (KMV_K - 1) ** 0.5


def test_poisson_bootstrap_ci_brackets_point(spark, sf_dir):
    """Bootstrap contract on the real fixture: bounds ordered, the CI
    brackets the point estimate (a 95% interval from 100 replicates of
    a well-behaved mean), and exactly B replicates materialize."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import (
        BOOT_B,
        q_agg_poisson_bootstrap,
    )

    row = q_agg_poisson_bootstrap(spark, sf_dir).collect()[0]
    assert row.n_replicates == BOOT_B
    assert row.ci_lo < row.ci_hi
    assert row.ci_lo < row.point_mean < row.ci_hi


def test_poisson_weights_mean_near_one(spark):
    """The hash-drawn Poisson(1) weights must average ~1 with variance
    ~1 over a large deterministic sample (the inverse-CDF thresholds
    are right) — the property that makes each replicate an unbiased
    resample."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.aggregates import _poisson_weight

    h = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    stats = (
        spark.range(200_000)
        .select(_poisson_weight(h).cast("double").alias("w"))
        .agg(
            F.avg("w").alias("mu"),
            F.var_pop("w").alias("v"),
            F.max("w").alias("mx"),
        )
        .collect()[0]
    )
    assert abs(stats.mu - 1.0) < 0.01, stats
    assert abs(stats.v - 1.0) < 0.02, stats
    assert stats.mx <= 8


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    """agg_approx_distinct is the registry's single remaining rows-only
    query (Spark HLL++ register internals are engine-specific by
    nature) — so pin its MEANING here instead: the estimate it returns
    beside the exact count must sit within a generous multiple of the
    requested 2% rsd for every group."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_approx_distinct

    rows = q_agg_approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        bound = max(0.1 * r["exact_parts"], 5)  # 5x the 2% rsd, floor 5
        assert abs(r["approx_parts"] - r["exact_parts"]) <= bound, dict(
            flag=r["l_returnflag"],
            approx=r["approx_parts"],
            exact=r["exact_parts"],
        )
