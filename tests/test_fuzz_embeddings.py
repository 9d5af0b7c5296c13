"""Randomized cross-engine parity for the embedding/ANN family.

The text fuzz net (test_fuzz_parity.py) stresses the token/grammar
paths; this is its embedding counterpart: seeded random corpora with
the failure modes a real embedding service produces — zero vectors,
exact duplicates, near-duplicates (one-ulp-ish perturbations),
clustered structure, and anisotropic magnitudes — hash-compared
against the DuckDB oracles for every similarity / embedding / semantic
query. Deterministic (fixed seeds); catches tie-handling and
float-edge divergences the curated fixture cannot reach.
"""

from __future__ import annotations

import os
import random
import shutil

import duckdb
import pytest

from kafka_connect_minio_pipeline_spark.registry import all_queries
from kafka_connect_minio_pipeline_spark.tables import (
    CONTRACT_SQL_WHERE,
    TABLE_NAMES,
)
from oracle_utils import _canon

pytestmark = pytest.mark.slow  # heavy sweep net: opt-in tier (pytest.ini)

SF_SRC = "/root/testdata/sf0.001"

_QUERIES = all_queries()

# every oracle-checked query whose input is the embeddings table
TARGETS = sorted(
    n
    for n, q in _QUERIES.items()
    if q.oracle is not None
    and n.startswith(
        (
            "similarity",
            "embedding",
            "dedup_embedding",
            "dedup_semantic",
            # r11: embedding-space decontamination shares every
            # pathology this net generates (zero vectors, exact/near
            # duplicates, anisotropic norms); r12: its τ sweep rides
            # the same scored relation
            "llm_decontaminate_semantic",
            "llm_decon_semantic_sweep",
        )
    )
) + [
    # non-prefix embeddings consumers (closure contract below):
    # the DQ battery reads every table; scalar_array demos the array
    # functions over the embedding column
    "pipeline_dq_checks",
    "scalar_array",
]


def test_emb_net_is_closed():
    """Every embeddings-consuming oracle query must be enrolled here —
    the twin of test_doc_net_is_closed / test_ev_net_is_closed (r11:
    the prefix-derived list silently missed llm_decontaminate_semantic
    until this contract was added)."""
    import inspect

    embq = set()
    for name, q in _QUERIES.items():
        if q.oracle is None:
            continue
        try:
            fsrc = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        if '"embeddings"' in fsrc:
            embq.add(name)
    missing = embq - set(TARGETS)
    assert not missing, f"embeddings queries outside the fuzz net: {sorted(missing)}"
    unknown = set(TARGETS) - set(_QUERIES)
    assert not unknown, f"fuzz net names not in the registry: {sorted(unknown)}"

N_VECS = 60
DIMS = 64  # PQ subspace layout (PQ_M × PQ_SUBDIM) is a schema constant


def _rand_corpus(rng: random.Random) -> list[tuple[int, list[float], int]]:
    centers = [
        [rng.uniform(-1, 1) for _ in range(DIMS)] for _ in range(4)
    ]
    rows: list[tuple[int, list[float], int]] = []
    for i in range(N_VECS):
        mode = rng.randrange(10)
        label = rng.randrange(4)
        if mode == 0:  # zero vector (embedding-service failure artifact)
            v = [0.0] * DIMS
        elif mode == 1 and rows:  # exact duplicate of an earlier vector
            v = list(rng.choice(rows)[1])
        elif mode == 2 and rows:  # near-duplicate (tiny perturbation)
            v = [x + rng.uniform(-1e-6, 1e-6) for x in rng.choice(rows)[1]]
        elif mode == 3:  # anisotropic magnitude (huge/tiny norms)
            s = rng.choice([1e-5, 1e3])
            v = [rng.uniform(-1, 1) * s for x in range(DIMS)]
        else:  # clustered gaussian-ish around a center
            c = centers[label]
            v = [x + rng.uniform(-0.3, 0.3) for x in c]
        rows.append((i, v, label))
    return rows


@pytest.fixture(scope="session")
def fuzz_emb_dirs(spark, tmp_path_factory) -> list[str]:
    dirs = []
    for seed in (404, 505):
        rng = random.Random(seed)
        d = str(tmp_path_factory.mktemp(f"fuzzemb{seed}"))
        for f in os.listdir(SF_SRC):
            if f != "embeddings.parquet":
                shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
        spark.createDataFrame(
            _rand_corpus(rng),
            "vec_id long, embedding array<float>, label int",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/embeddings.parquet"
        )
        dirs.append(d)
    return dirs


@pytest.mark.parametrize("name", TARGETS)
def test_fuzz_embedding_parity(spark, fuzz_emb_dirs, name):
    q = _QUERIES[name]
    for d in fuzz_emb_dirs:
        got = q.fn(spark, d).toPandas()
        con = duckdb.connect()
        try:
            for t in TABLE_NAMES:
                pth = f"{d}/{t}.parquet"
                if os.path.isdir(pth):
                    pth += "/*.parquet"
                w = CONTRACT_SQL_WHERE.get(t, "")
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{pth}'"
                    + (f" WHERE {w}" if w else "")
                )
            want = con.execute(q.oracle).fetchdf()
        finally:
            con.close()
        assert sorted(got.columns) == sorted(want.columns), (name, d)
        assert _canon(got) == _canon(want), (name, d)
