"""Metamorphic / invariant properties for the r10 late batch — spec
checks that hold regardless of the data, beyond both-engines-agree
(the oracle) and matches-a-rebuild (the pure-Python references).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_skyline
from kafka_connect_minio_pipeline_spark.operators.graph import (
    connected_components,
)
from kafka_connect_minio_pipeline_spark.operators.joins import (
    q_join_copurchase_lift,
)
from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import (
    q_ts_attribution,
    q_ts_theil_sen,
)
from kafka_connect_minio_pipeline_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_skyline_is_a_minimal_dominating_frontier(spark, sf_dir):
    """(a) Every non-skyline point is dominated by SOME skyline point
    (the frontier is complete); (b) no skyline point dominates another
    (the frontier is minimal). Together these characterize the skyline
    exactly, independent of how it was computed."""
    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load(spark, sf_dir, "part").collect()
    ]
    sky = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q_agg_skyline(spark, sf_dir).collect()
    }

    def dominates(x, y):
        return (
            x[1] <= y[1]
            and x[2] >= y[2]
            and (x[1] < y[1] or x[2] > y[2])
        )

    for p in pts:
        if p not in sky:
            assert any(dominates(s, p) for s in sky), p
    for s in sky:
        assert not any(dominates(t, s) for t in sky if t != s), s


def test_copurchase_internal_consistency(spark, sf_dir):
    """The reported columns must satisfy the defining algebra:
    0 < support <= conf <= 1 for both directions, and
    lift * support == conf_a_to_b * conf_b_to_a (since
    lift = pair*n/(ca*cb) and support = pair/n)."""
    rows = q_join_copurchase_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["support"] <= r["conf_a_to_b"] <= 1.0, r
        assert 0 < r["support"] <= r["conf_b_to_a"] <= 1.0, r
        assert r["brand_a"] < r["brand_b"], r
        assert (
            abs(
                r["lift"] * r["support"]
                - r["conf_a_to_b"] * r["conf_b_to_a"]
            )
            < 1e-4
        ), r


def test_attribution_models_conserve_conversions(spark, sf_dir):
    """Each model credits every attributable purchase exactly once, so
    the two models' totals must be equal."""
    rows = q_ts_attribution(spark, sf_dir).collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["model"]] = totals.get(r["model"], 0) + r["conversions"]
    assert set(totals) == {"first_touch", "last_touch"}
    assert totals["first_touch"] == totals["last_touch"] > 0


def test_theil_sen_invariant_to_level_shift(spark, tmp_path):
    """Adding a constant to every value must leave every slope — and
    therefore the Sen estimate — unchanged (slopes are differences)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    base = {
        r["event_type"]: (r["n_pairs"], r["sen_slope"])
        for r in q_ts_theil_sen(spark, SF).collect()
    }
    ev.withColumn("value", F.col("value") + F.lit(100.0)).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    shifted = {
        r["event_type"]: (r["n_pairs"], r["sen_slope"])
        for r in q_ts_theil_sen(spark, str(tmp_path)).collect()
    }
    assert set(shifted) == set(base)
    for k in base:
        assert shifted[k][0] == base[k][0], k
        assert abs(shifted[k][1] - base[k][1]) < 1e-6, (
            k, base[k], shifted[k],
        )


def test_wcc_invariant_to_edge_duplication_and_orientation(spark):
    """Components are a property of the underlying undirected simple
    graph: duplicating every edge and flipping orientations must not
    change the labeling."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "a long, b long",
    )
    messy = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).unionAll(edges)
    want = {
        (r["node"], r["component"], r["component_size"])
        for r in connected_components(edges).collect()
    }
    got = {
        (r["node"], r["component"], r["component_size"])
        for r in connected_components(messy).collect()
    }
    assert got == want and got
