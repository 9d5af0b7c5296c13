"""Degenerate-document net: every registered query on a corpus with
pathological rows — empty text, whitespace-only, punctuation-only,
single-character — beside normal documents.

The empty-INPUT net (tests/test_empty_inputs.py) proves totality on empty
tables; this net proves totality and cross-engine exactness on degenerate
ROWS, a different failure class: under Spark's default ANSI mode an
unguarded per-row ratio is a runtime DIVIDE_BY_ZERO (one bad document
kills a corpus-wide job), and DuckDB's NULL-on-empty list/string
functions (array_to_string([]), ORD('')) silently diverge from Spark's
''-semantics. First run of this sweep found five real issues: a
text_quality crash, the corpus-clean q_pass crash in two pipelines, and
NULL-vs-'' divergences in multimodal features and RAG chunking.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from kafka_connect_minio_pipeline_spark.registry import all_queries
from oracle_utils import assert_matches_oracle

SF_SRC = "/root/testdata/sf0.001"

DEGEN_DOCS = (
    (900001, "", "en", "degen", 0),
    (900002, "   ", "en", "degen", 3),
    (900003, "...", "en", "degen", 3),
    (900004, "x", "en", "degen", 1),
)

_QUERIES = all_queries(strict=False)
# Only queries that read documents can be affected; the rest run on
# identical inputs and are covered by the sf0.001 parity net every run.
_DOC_NAMES = sorted(
    n
    for n, q in _QUERIES.items()
    if q.oracle is None or "documents" in q.oracle.lower()
)


@pytest.fixture(scope="session")
def degen_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("degen"))
    for f in os.listdir(SF_SRC):
        shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
    con = duckdb.connect()
    try:
        values = ", ".join(
            f"({i}, '{t}', '{lang}', '{srcname}', {n})"
            for i, t, lang, srcname, n in DEGEN_DOCS
        )
        con.execute(
            f"""
            COPY (
                SELECT * FROM '{d}/documents.parquet'
                UNION ALL
                SELECT * FROM (VALUES {values})
                    v(doc_id, text, lang, source, n_chars)
            ) TO '{d}/documents_new.parquet' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    os.replace(f"{d}/documents_new.parquet", f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", _DOC_NAMES)
def test_query_survives_degenerate_docs(spark, degen_dir, name):
    q = _QUERIES[name]
    if q.oracle is not None:
        assert_matches_oracle(q.fn(spark, degen_dir), q.oracle, degen_dir)
    else:
        assert q.fn(spark, degen_dir).count() >= 0


# --- degenerate embeddings: zero vector, constant vector, exact duplicate ---

_EMB_NAMES = sorted(
    n
    for n, q in _QUERIES.items()
    if (q.oracle is not None and "embedding" in q.oracle.lower())
    or n.startswith(("similarity", "dedup_embedding", "embedding"))
)


@pytest.fixture(scope="session")
def degen_emb_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("degen_emb"))
    for f in os.listdir(SF_SRC):
        shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
    con = duckdb.connect()
    try:
        con.execute(
            f"""
            COPY (
                SELECT * FROM '{d}/embeddings.parquet'
                UNION ALL
                SELECT * FROM (
                    SELECT 900001 AS vec_id,
                           list_transform(range(64),
                                          x -> CAST(0.0 AS FLOAT)) AS embedding,
                           0 AS label
                    UNION ALL
                    SELECT 900002,
                           list_transform(range(64), x -> CAST(0.5 AS FLOAT)), 1
                    UNION ALL
                    SELECT 900003,
                           (SELECT embedding FROM '{d}/embeddings.parquet'
                            WHERE vec_id = 0), 2
                )
            ) TO '{d}/embeddings_new.parquet' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    os.replace(f"{d}/embeddings_new.parquet", f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("name", _EMB_NAMES)
def test_query_survives_degenerate_embeddings(spark, degen_emb_dir, name):
    """A ZERO VECTOR (embedding-service failure artifact) must not kill
    or diverge any similarity operator: cosine is undefined there, the
    vector is excluded on both engines, everything else scores
    normally. First run found 10 ANSI DIVIDE_BY_ZERO crashes."""
    q = _QUERIES[name]
    if q.oracle is not None:
        assert_matches_oracle(q.fn(spark, degen_emb_dir), q.oracle, degen_emb_dir)
    else:
        assert q.fn(spark, degen_emb_dir).count() >= 0


# --- degenerate events: malformed props JSON, empty event_type, ---------
# --- duplicate (user, ts) triple, zero value, single-event user ---------

_EV_NAMES = sorted(
    n
    for n, q in _QUERIES.items()
    if (q.oracle is not None and "events" in q.oracle.lower())
    or n.startswith(("ts_", "stream_", "udaf"))
)


@pytest.fixture(scope="session")
def degen_ev_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("degen_ev"))
    for f in os.listdir(SF_SRC):
        shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
    con = duckdb.connect()
    try:
        con.execute(
            f"""
            COPY (
                SELECT * FROM '{d}/events.parquet'
                UNION ALL
                SELECT * FROM (VALUES
                    (900001, TIMESTAMP '2024-01-05 00:00:00', 900001,
                     'click', 0.00, '{{not json'),
                    (900002, TIMESTAMP '2024-01-05 12:00:00', 900002,
                     '', 1.00, '{{"k": 1}}'),
                    (900003, TIMESTAMP '2024-01-05 12:00:00', 900002,
                     'click', 2.00, '{{"k": 2}}'),
                    (900004, TIMESTAMP '2024-01-05 12:00:00', 900002,
                     'click', 2.00, '{{"k": 3}}'),
                    (900005, TIMESTAMP '2024-01-05 13:00:00', 900005,
                     'click', 1.00, '{{"k": "abc"}}'),
                    (900006, TIMESTAMP '2024-01-05 14:00:00', 900006,
                     'click', 1.00, '{{"k": 12.7}}'),
                    (900007, TIMESTAMP '2024-01-05 15:00:00', 900007,
                     'click', 1.00, '{{"v": 9}}')
                ) v(event_id, ts, user_id, event_type, value, props)
            ) TO '{d}/events_new.parquet' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    os.replace(f"{d}/events_new.parquet", f"{d}/events.parquet")
    return d


@pytest.mark.parametrize("name", _EV_NAMES)
def test_query_survives_degenerate_events(spark, degen_ev_dir, name):
    """Malformed props JSON must extract as NULL in BOTH engines (DuckDB
    json functions crash unguarded; Spark yields NULL), the grouped-agg
    pandas kernel must not astype-throw on the resulting NaN weights,
    and duplicate-timestamp / zero-value / single-event-user rows must
    flow through every time-series operator. First run found 3 crashes."""
    q = _QUERIES[name]
    if q.oracle is not None:
        assert_matches_oracle(q.fn(spark, degen_ev_dir), q.oracle, degen_ev_dir)
    else:
        assert q.fn(spark, degen_ev_dir).count() >= 0
