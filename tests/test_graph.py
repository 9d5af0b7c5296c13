"""Semantic properties of the PageRank operator beyond oracle parity:
probability-mass conservation, positivity, degree sensitivity, and
hand-computed correctness on a tiny known graph."""

from __future__ import annotations

import pytest
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


def test_edge_jaccard_known_graph(spark):
    """Per-edge embeddedness on a triangle with a pendant: triangle edges
    score their exact neighbor-overlap ratio, the pendant edge (no
    triangle through it) never surfaces, and the strongest tie ranks
    first."""
    from kafka_connect_minio_pipeline_spark.operators.graph import edge_jaccard_topk

    # triangle 1-2-3 plus pendant 4 hanging off 1
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (1, 4)], ["a", "b"])
    rows = edge_jaccard_topk(edges, k=10).collect()
    got = {(r["u"], r["v"]): r for r in rows}
    # N(2)={1,3}, N(3)={1,2}: common {1} → J = 1/3; N(1)={2,3,4}: the
    # triangle edges at the hub dilute to 1/4
    assert got[(2, 3)]["jaccard"] == round(1 / 3, 6)
    assert got[(1, 2)]["jaccard"] == 0.25
    assert got[(1, 3)]["jaccard"] == 0.25
    assert (1, 4) not in got
    assert (rows[0]["u"], rows[0]["v"]) == (2, 3)


def test_khop_path_graph(spark):
    """On a directed path 0→1→…→9 (symmetrized), distances from node 0
    must be exact hop counts, capped at k; nodes beyond k are absent."""
    from kafka_connect_minio_pipeline_spark.operators.graph import k_hop_distances

    path = [(str(i), str(i + 1)) for i in range(9)]
    edges = spark.createDataFrame(
        path + [(d, s) for s, d in path], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("0",)], ["node"])
    got = {r["node"]: r["dist"] for r in k_hop_distances(edges, seeds, k=3).collect()}
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3}


def test_khop_multi_source_min(spark):
    """With two seeds the label is the MIN distance over sources."""
    from kafka_connect_minio_pipeline_spark.operators.graph import k_hop_distances

    path = [(str(i), str(i + 1)) for i in range(6)]
    edges = spark.createDataFrame(
        path + [(d, s) for s, d in path], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("0",), ("6",)], ["node"])
    got = {r["node"]: r["dist"] for r in k_hop_distances(edges, seeds, k=3).collect()}
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3, "6": 0, "5": 1, "4": 2}


def test_triangle_counts_known_graphs(spark):
    """K4 has 4 triangles, every node in 3; a 4-cycle has none; a
    disconnected extra triangle counts independently."""
    from kafka_connect_minio_pipeline_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (10, 13)]
    extra = [(20, 21), (21, 22), (20, 22)]
    edges = spark.createDataFrame(k4 + square + extra, ["a", "b"])
    got = {r["p_partkey"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 20: 1, 21: 1, 22: 1}


def test_lpa_splits_barbell_graph(spark):
    """Two 4-cliques joined by one bridge edge: connected components sees
    ONE component, LPA must resolve the two dense cores as separate
    communities — the property that justifies having both operators."""
    from kafka_connect_minio_pipeline_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(clique1 + clique2 + bridge, ["a", "b"])
    out = {r["node"]: r["community"] for r in label_propagation(edges).collect()}
    left = {out[n] for n in range(4)}
    right = {out[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_degree_stats_star_graph_assortativity(spark, monkeypatch):
    """A star graph is maximally disassortative: r = -1 exactly. Pins the
    co-moment algebra against a closed-form case."""
    import kafka_connect_minio_pipeline_spark.operators.graph as G

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["a", "b"])
    monkeypatch.setattr(G, "part_cooccurrence_edges", lambda s, d: star)
    row = G.q_graph_degree_stats(spark, "unused").first()
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["max_degree"] == 5
    assert row["assortativity"] == -1.0


def test_kcore_clique_survives_pendants_die(spark):
    """5-clique + pendant chain, k=4: the clique is the 4-core (each
    member keeps degree 4); the chain cascades away entirely."""
    from kafka_connect_minio_pipeline_spark.operators.graph import kcore

    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    chain = [(5, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "a long, b long")
    got = {r["node"]: r["core_degree"] for r in kcore(edges, k=4).collect()}
    assert got == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}


def test_kcore_path_graph_cascades_to_empty(spark):
    """A path has no 2-core: degree-1 endpoints peel off round after
    round until nothing is left — the cascade a one-shot degree filter
    misses (interior nodes all start at degree 2)."""
    from kafka_connect_minio_pipeline_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(1, 12)]
    edges = spark.createDataFrame(path, "a long, b long")
    assert kcore(edges, k=2).count() == 0


def test_kcore_real_graph_invariants(spark, sf_dir):
    """Every member of the 65-core keeps >= 65 in-core neighbors."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        KCORE_K,
        q_graph_kcore,
    )

    rows = q_graph_kcore(spark, sf_dir).collect()
    assert all(r["core_degree"] >= KCORE_K for r in rows)


def test_adamic_adar_weights_rare_neighbors(spark):
    """Two edges each with one common neighbor: the edge sharing a
    degree-2 neighbor scores 1/ln2; the edge sharing a degree-5 hub
    scores 1/ln5 — rare shared context outranks hub co-membership."""
    import math

    from kafka_connect_minio_pipeline_spark.operators.graph import (
        edge_adamic_adar_topk,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6),
         (6, 7), (6, 8), (6, 9)],
        "a long, b long",
    )
    got = {(r["u"], r["v"]): r["adamic_adar"]
           for r in edge_adamic_adar_topk(edges).collect()}
    assert got[(1, 2)] == round(round(1 / math.log(2), 9), 6)
    assert got[(4, 5)] == round(round(1 / math.log(5), 9), 6)
    assert got[(1, 2)] > got[(4, 5)]


def test_clustering_closed_forms(spark):
    """A 4-clique scores 1.0 everywhere; a star center scores 0 (no
    neighbor-neighbor edges); a leaf (degree 1) is NULL."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    star = [(10, x) for x in (11, 12, 13)]
    edges = spark.createDataFrame(clique + star, "a long, b long")
    got = {r["node"]: r["clustering"]
           for r in clustering_coefficients(edges).collect()}
    assert all(got[n] == 1.0 for n in (1, 2, 3, 4))
    assert got[10] == 0.0
    assert got[11] is None


def test_pair_scorer_paths_identical_sf001(spark):
    """VERDICT r4 item 2 done-criterion: broadcast and wedge paths must
    produce bit-identical top-k rows at sf0.01 (integer counts, one
    double close, decimal order-free sums — nothing order-sensitive)."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        edge_adamic_adar_topk,
        edge_jaccard_topk,
        part_cooccurrence_edges,
    )

    edges = part_cooccurrence_edges(spark, "/root/testdata/sf0.01")
    for fn in (edge_jaccard_topk, edge_adamic_adar_topk):
        b = fn(edges, mode="broadcast").collect()
        w = fn(edges, mode="wedge").collect()
        assert b == w, (fn.__name__, b[:3], w[:3])


def test_pair_scorer_rejects_unknown_mode(spark, sf_dir):
    import pytest as _pytest

    from kafka_connect_minio_pipeline_spark.operators.graph import (
        edge_jaccard_topk,
        part_cooccurrence_edges,
    )

    with _pytest.raises(ValueError, match="unknown pair-scorer mode"):
        edge_jaccard_topk(part_cooccurrence_edges(spark, sf_dir), mode="turbo")


def test_conf_bytes_parses_spark_size_formats():
    """Every format Spark emits for a size conf must parse: bare bytes,
    b/k/m/g suffixes (what spark.conf.get returns varies by how the conf
    was set), and -1 (broadcast disabled)."""
    from kafka_connect_minio_pipeline_spark.operators.graph import _conf_bytes

    assert _conf_bytes("10485760") == 10 << 20
    assert _conf_bytes("10485760b") == 10 << 20
    assert _conf_bytes("10MB") == 10 << 20
    assert _conf_bytes("10m") == 10 << 20
    assert _conf_bytes("1g") == 1 << 30
    assert _conf_bytes("512k") == 512 << 10
    assert _conf_bytes("-1") == -1
    assert _conf_bytes(" 2gb ") == 2 << 30


def test_staged_edges_cache_isolates_inputs(spark):
    """The session stage cache is keyed by input dir: the sf0.001 and
    sf0.01 co-occurrence relations must come back distinct (a key bug
    would silently serve one corpus's edges to the other's queries) and
    a repeated call must reuse the same staged files."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        _STAGE_CACHE,
        part_cooccurrence_edges,
    )

    a = part_cooccurrence_edges(spark, "/root/testdata/sf0.001").count()
    b = part_cooccurrence_edges(spark, "/root/testdata/sf0.01").count()
    assert a != b
    before = dict(_STAGE_CACHE)
    assert part_cooccurrence_edges(spark, "/root/testdata/sf0.001").count() == a
    assert dict(_STAGE_CACHE) == before  # no re-stage on the second call


def test_staged_edges_cache_survives_eviction(spark):
    """RAM-backed scratch (/dev/shm) can be evicted mid-session: the
    stage cache must detect the missing directory and re-stage instead
    of handing out a dangling path."""
    import shutil

    from kafka_connect_minio_pipeline_spark.operators.graph import (
        _STAGE_CACHE,
        part_cooccurrence_edges,
    )

    n = part_cooccurrence_edges(spark, "/root/testdata/sf0.001").count()
    key = next(
        k for k in _STAGE_CACHE
        if k[1].endswith("sf0.001") and k[2] == "cooc_edges"
    )
    shutil.rmtree(_STAGE_CACHE[key])
    assert part_cooccurrence_edges(spark, "/root/testdata/sf0.001").count() == n


def test_hits_matches_pure_python_power_iteration(spark):
    """Independent reference for the HITS operator (VERDICT r9): a
    pure-Python 3-iteration power iteration on a small asymmetric
    fixture, L1-normalized per side exactly as the operator spec says —
    pinned independently of the both-engines-agree oracle (the ts_rsi
    lesson: a spec bug both engines share sails right past the hash
    check)."""
    from kafka_connect_minio_pipeline_spark.operators.graph import hits

    pairs = [
        ("c1", "s1"), ("c1", "s2"), ("c1", "s3"),
        ("c2", "s1"), ("c2", "s2"),
        ("c3", "s1"),
        ("c4", "s4"),
    ]
    edges = spark.createDataFrame(pairs, ["src", "dst"])

    # pure-Python mirror of the spec: hub0 = 1.0 on every distinct src;
    # each half-round sums the counterpart scores over the edge list and
    # L1-normalizes. No Spark, no SQL.
    hub = {s: 1.0 for s, _ in pairs}
    auth: dict[str, float] = {}
    for _ in range(3):
        auth = {}
        for s, d in pairs:
            if s in hub:
                auth[d] = auth.get(d, 0.0) + hub[s]
        tot = sum(auth.values())
        auth = {n: v / tot for n, v in auth.items()}
        hub = {}
        for s, d in pairs:
            if d in auth:
                hub[s] = hub.get(s, 0.0) + auth[d]
        tot = sum(hub.values())
        hub = {n: v / tot for n, v in hub.items()}

    got = {
        (r["node"], r["role"]): r["score"] for r in hits(edges).collect()
    }
    assert set(got) == {(n, "hub") for n in hub} | {
        (n, "authority") for n in auth
    }
    for n, v in hub.items():
        assert abs(got[(n, "hub")] - v) < 1e-6, (n, got[(n, "hub")], v)
    for n, v in auth.items():
        assert abs(got[(n, "authority")] - v) < 1e-6, (
            n, got[(n, "authority")], v,
        )
    # structural sanity on the fixture: c1 links every big authority so
    # it must be the best hub; s1 has the most (and best) in-links so it
    # must be the best authority; the isolated c4->s4 pair stays tiny.
    assert got[("c1", "hub")] == max(v for (n, r), v in got.items() if r == "hub")
    assert got[("s1", "authority")] == max(
        v for (n, r), v in got.items() if r == "authority"
    )
    assert got[("c4", "hub")] < got[("c3", "hub")]


def test_wcc_multi_component_graph(spark):
    """The driver corpus is one giant component, so the multi-component
    semantics pin here: min-id labels, exact sizes, no cross-component
    leakage — a path, a single edge, and a square."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (20, 23)],
        "a long, b long",
    )
    got = {
        r["node"]: (r["component"], r["component_size"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
        20: (20, 4), 21: (20, 4), 22: (20, 4), 23: (20, 4),
    }


def test_wcc_matches_union_find(spark, sf_dir):
    """Independent union-find rebuild on the real co-occurrence edges:
    the partition (not just the labels) must match, labels must be the
    component minima, sizes exact."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        part_cooccurrence_edges,
        q_graph_wcc,
    )

    pairs = [
        (r["a"], r["b"])
        for r in part_cooccurrence_edges(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp: dict[int, list] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expect = {}
    for members in comp.values():
        root, size = min(members), len(members)
        for n in members:
            expect[n] = (root, size)
    got = {
        r["node"]: (r["component"], r["component_size"])
        for r in q_graph_wcc(spark, sf_dir).collect()
    }
    assert got == expect and got


def test_wcc_path_graph_ls_vs_min_label(spark):
    """The r11 production-path swap (VERDICT r10 item 7): on a DEEP path
    graph — the adversarial case for per-hop propagation — the
    large-star/small-star path q_graph_wcc now runs must (a) converge
    well under the round budget min-label propagation would exhaust and
    (b) produce the identical partition. A 64-node path has diameter 63:
    min-label needs 63 rounds (here run with a raised cap as the
    cross-check), large-star/small-star needs O(log n).
    """
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        connected_components_ls,
    )
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        connected_components,
    )

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], "a long, b long"
    )
    # the log-rounds path: must finish inside its default 25-round cap
    ls = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_ls(edges, src="a", dst="b").collect()
    }
    # the diameter-bound cross-check, cap raised to cover the path
    ml = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_rounds=n + 2).collect()
    }
    expect = {i: 0 for i in range(n)} | {100: 100, 101: 100}
    assert ls == expect
    assert ml == expect


@pytest.mark.parametrize(
    "graded_sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_wcc_oracle_round_budget_at_graded_sf(spark, graded_sf):
    """ADVICE r11: the old min-label production path raised loudly if
    convergence needed more rounds than the WCC_ORACLE_ROUNDS-unrolled
    DuckDB oracle; the large-star/small-star path converges regardless
    of depth, so an under-unrolled oracle on a deeper graph would now
    surface only as an unexplained parity mismatch. Keep the cheap
    guard: at each graded sf, min-label propagation with
    oracle_rounds=WCC_ORACLE_ROUNDS must converge inside the oracle's
    unroll (it raises RuntimeError otherwise) and must agree with the
    production labels."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        WCC_ORACLE_ROUNDS,
        connected_components,
        part_cooccurrence_edges,
        q_graph_wcc,
    )

    edges = part_cooccurrence_edges(spark, graded_sf)
    ml = {
        r["node"]: (r["component"], r["component_size"])
        for r in connected_components(
            edges, oracle_rounds=WCC_ORACLE_ROUNDS
        ).collect()
    }
    prod = {
        r["node"]: (r["component"], r["component_size"])
        for r in q_graph_wcc(spark, graded_sf).collect()
    }
    assert ml == prod and ml
