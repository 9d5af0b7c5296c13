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
                     'click', 1.00, '{{"v": 9}}'),
                    (900008, TIMESTAMP '2024-01-05 16:00:00', 900008,
                     'click', 1.00, '{{"k": 4}}'),
                    (900009, TIMESTAMP '2024-01-05 16:05:00', 900008,
                     'click', 1.00, '{{"k": 5}}'),
                    (900010, TIMESTAMP '2024-01-05 17:00:00', 900010,
                     'click', 1.00, '{{"k": " 12 "}}'),
                    (900011, TIMESTAMP '2024-01-05 17:05:00', 900011,
                     'click', 1.00, '{{"k": "12"}}'),
                    (900012, TIMESTAMP '2024-01-05 17:10:00', 900012,
                     'click', 1.00, '{{"k": 12345678901234}}'),
                    (900013, TIMESTAMP '2024-01-05 17:15:00', 900013,
                     'click', 1.00, '{{"k": "12\n"}}')
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
    flow through every time-series operator, and an EXACT-gap event pair
    (16:00, 16:05 at a 5-min gap) pins the session boundary: Spark merges
    touching windows, so the oracle must split on strict >, not >=.
    Padded (' 12 '), string-wrapped ('"12"'), trailing-newline
    ('"12\\n"' — json-decodes to a real newline; java regex '$' would
    accept it, so the Spark guard anchors \\z, ADVICE r6), and
    int32-overflow k values pin the shared integer-acceptance grammar
    across both engines (ADVICE r5: try_cast trims where the oracle
    regex rejects).
    First run found 3 crashes; the fuzz net later caught the boundary."""
    q = _QUERIES[name]
    if q.oracle is not None:
        assert_matches_oracle(q.fn(spark, degen_ev_dir), q.oracle, degen_ev_dir)
    else:
        assert q.fn(spark, degen_ev_dir).count() >= 0


# --- NULL required fields: the ingestion contract leg ---------------------
#
# Rows with NULL required fields (tables.REQUIRED_FIELDS) are enforced
# away by the loader — the warehouse NOT NULL constraint — so every
# analytic query must behave exactly as if those rows never arrived
# (compared against CONTRACT-FILTERED oracle views), while the
# pre-contract audit (pipeline_dq_checks) must SEE and count them
# (compared against raw views). First probe without the contract: 24
# crashes + 10 silent divergences from five NULL rows.

from oracle_utils import assert_matches_contract_oracle

pytestmark = pytest.mark.slow  # heavy sweep net: opt-in tier (pytest.ini)

_NULL_NAMES = sorted(set(_DOC_NAMES) | set(_EMB_NAMES) | set(_EV_NAMES))


@pytest.fixture(scope="session")
def degen_null_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("degen_null"))
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
                    (900020, TIMESTAMP '2024-01-06 00:00:00', NULL,
                     'click', 1.00, '{{"k": 1}}'),
                    (900021, TIMESTAMP '2024-01-06 01:00:00', 900021,
                     NULL, 1.00, '{{"k": 1}}'),
                    (900022, TIMESTAMP '2024-01-06 02:00:00', 900022,
                     'click', NULL, '{{"k": 1}}'),
                    (900023, TIMESTAMP '2024-01-06 03:00:00', 900023,
                     'click', 1.00, NULL),
                    (900024, NULL, 900024, 'click', 1.00, '{{"k": 1}}'),
                    (900025, TIMESTAMP '2300-01-01 00:00:00', 900025,
                     'click', 1.00, '{{"k": 1}}'),
                    (900026, TIMESTAMP '1900-01-01 00:00:00', 900026,
                     'click', 1.00, '{{"k": 1}}'),
                    (900027, TIMESTAMP '2024-01-07 00:00:00', 900027,
                     'click', CAST('nan' AS DOUBLE), '{{"k": 1}}'),
                    (900028, TIMESTAMP '2024-01-07 01:00:00', 900028,
                     'click', CAST('inf' AS DOUBLE), '{{"k": 1}}')
                ) v(event_id, ts, user_id, event_type, value, props)
            ) TO '{d}/ev2.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
                SELECT * FROM '{d}/documents.parquet'
                UNION ALL
                SELECT * FROM (VALUES
                    (900030, NULL, 'en', 'degen', 0),
                    (900031, 'some text here', NULL, NULL, 14)
                ) v(doc_id, text, lang, source, n_chars)
            ) TO '{d}/doc2.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
                SELECT * FROM '{d}/embeddings.parquet'
                UNION ALL
                SELECT 900040 AS vec_id, NULL AS embedding, NULL AS label
                UNION ALL
                SELECT 900041,
                       list_transform(range(64),
                                      x -> CAST('nan' AS FLOAT)), 0
                UNION ALL
                SELECT 900042,
                       list_transform(range(64),
                                      x -> CAST('inf' AS FLOAT)), 1
                UNION ALL
                SELECT 900043,
                       list_concat([CAST('nan' AS FLOAT)],
                                   list_transform(range(63),
                                                  x -> CAST(0.5 AS FLOAT))), 2
            ) TO '{d}/emb2.parquet' (FORMAT PARQUET)
            """
        )
    finally:
        con.close()
    os.replace(f"{d}/ev2.parquet", f"{d}/events.parquet")
    os.replace(f"{d}/doc2.parquet", f"{d}/documents.parquet")
    os.replace(f"{d}/emb2.parquet", f"{d}/embeddings.parquet")
    return d


# Catalog-style queries read via load_meta (key-contract only, to keep
# the scan pruned of the wide text column) — they legitimately still see
# a NULL-text doc's metadata, so their comparison basis filters only the
# key field.
_CATALOG_QUERIES = {
    "llm_sample_stratified", "llm_sample_hash", "corpus_shuffle_split",
    "corpus_interleave", "corpus_weighted_sample", "llm_target_mix",
    "llm_mix_temperature",
    # r12: domain/URL curation runs over the catalog (load_meta — the
    # text column is deliberately never read, so the content contract
    # does not apply; a null-text doc still has a domain verdict)
    "corpus_url_filter", "corpus_domain_mix", "corpus_url_canonical",
    # cluster-safe split: the catalog side keeps null-text docs (they
    # still get a split); the cluster side is contract-identical under
    # both views because a null-text doc contributes zero shingles
    "corpus_split_cluster_safe",
}


def _run_duckdb_key_only(sql: str, sf_dir: str):
    from kafka_connect_minio_pipeline_spark.tables import KEY_FIELD, TABLE_NAMES

    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            w = f" WHERE {KEY_FIELD[t]} IS NOT NULL" if t in KEY_FIELD else ""
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'{w}"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


@pytest.mark.parametrize("name", _NULL_NAMES)
def test_query_survives_null_required_fields(spark, degen_null_dir, name):
    q = _QUERIES[name]
    if q.oracle is None:
        assert q.fn(spark, degen_null_dir).count() >= 0
    elif name == "pipeline_dq_checks":
        # the audit reads PRE-contract data: compare against raw views
        # and require it to actually count the planted violations
        assert_matches_oracle(q.fn(spark, degen_null_dir), q.oracle, degen_null_dir)
        rows = {r.check_name: r.n_violations
                for r in q.fn(spark, degen_null_dir).collect()}
        assert rows["events_null_user"] == 1
        assert rows["events_null_ts"] == 1
        assert rows["documents_null_text"] == 1
        assert rows["embeddings_null_vector"] == 1
        # year-2300 (Arrow ns overflow; grid explosion) and year-1900
        # events: enforced away by EVENT_TIME_BOUNDS, counted here
        assert rows["events_ts_out_of_range"] == 2
        # all-NaN, all-Inf, and one-NaN-component vectors: enforced
        # away by the finite-components contract, counted here
        assert rows["embeddings_nonfinite_vector"] == 3
        # NaN and Inf metric values: 18 exact-decimal queries crashed
        # on these in the probe; enforced away, counted here
        assert rows["events_nonfinite_value"] == 2
    elif name in _CATALOG_QUERIES:
        from oracle_utils import _canon

        got = q.fn(spark, degen_null_dir).toPandas()
        want = _run_duckdb_key_only(q.oracle, degen_null_dir)
        assert sorted(got.columns) == sorted(want.columns)
        assert _canon(got) == _canon(want)
    else:
        assert_matches_contract_oracle(
            q.fn(spark, degen_null_dir), q.oracle, degen_null_dir
        )
