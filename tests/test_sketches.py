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
