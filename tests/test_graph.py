"""Semantic properties of the PageRank operator beyond oracle parity:
probability-mass conservation, positivity, degree sensitivity, and
hand-computed correctness on a tiny known graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators.graph import pagerank, q_graph_pagerank


def test_pagerank_mass_and_degree(spark, sf_dir):
    rows = q_graph_pagerank(spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6, total
    assert all(r["rank"] > 0 for r in rows)
    # suppliers are ~15x fewer than customers on the same edge set, so a
    # random surfer lands on an average supplier far more often
    supp = [r["rank"] for r in rows if r["node"].startswith("s")]
    cust = [r["rank"] for r in rows if r["node"].startswith("c")]
    assert sum(supp) / len(supp) > 5 * sum(cust) / len(cust)


def test_pagerank_known_graph(spark):
    """Star graph a<->b, a<->c, a<->d: the hub must beat the leaves, the
    leaves tie exactly, and one damped iteration is hand-checkable."""
    pairs = [("a", x) for x in ("b", "c", "d")]
    edges = spark.createDataFrame(
        pairs + [(d, s) for s, d in pairs], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=5).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    assert got["b"] == got["c"] == got["d"]
    assert got["a"] > got["b"]
    # closed form: leaves' rank converges around .15/4 + .85*(hub/3)
    # each emitted rank is round(…, 9), so the identity holds to ~4 half-ulps
    assert abs(got["a"] + 3 * got["b"] - 1.0) < 5e-9
