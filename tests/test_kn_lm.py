"""Kneser–Ney bigram LM properties: an independent pure-Python rebuild
of the model from the raw tokens, plus the defining normalization
property Σ_w₂ P(w₂|w₁) = 1 over the FULL vocabulary (seen pairs via the
discounted term, unseen via λ(w₁)·P_cont(w₂))."""

from __future__ import annotations

import math

from kafka_connect_minio_pipeline_spark.operators.dedup import tokens
from kafka_connect_minio_pipeline_spark.operators.text import (
    KN_DISCOUNT,
    q_text_kn_perplexity,
)
from kafka_connect_minio_pipeline_spark.tables import load

from pyspark.sql import functions as F


def _model(docs):
    c12: dict = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict = {}
    n_fwd: dict = {}
    n_bwd: dict = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n_fwd[a] = n_fwd.get(a, 0) + 1
        n_bwd[b] = n_bwd.get(b, 0) + 1
    n_types = len(c12)
    return c12, c1, n_fwd, n_bwd, n_types


def _p(w1, w2, m):
    c12, c1, n_fwd, n_bwd, n_types = m
    cont = n_bwd.get(w2, 0) / n_types
    lam = KN_DISCOUNT * n_fwd[w1] / c1[w1]
    return max(c12.get((w1, w2), 0) - KN_DISCOUNT, 0) / c1[w1] + lam * cont


def test_kn_matches_pure_python_and_normalizes(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .collect()
    )
    docs = {r["doc_id"]: r["toks"] for r in rows}
    m = _model(docs)
    got = {
        r["doc_id"]: r for r in q_text_kn_perplexity(spark, sf_dir).collect()
    }
    # per-doc scores match the independent rebuild
    n_checked = 0
    for doc_id, toks in docs.items():
        bigrams = list(zip(toks, toks[1:]))
        if not bigrams:
            assert doc_id not in got
            continue
        nll = -sum(round(math.log(_p(a, b, m)), 9) for a, b in bigrams) / len(
            bigrams
        )
        r = got[doc_id]
        assert r["n_bigrams"] == len(bigrams)
        assert abs(r["nll_per_bigram"] - nll) < 1e-5, doc_id
        assert abs(r["ppl"] - math.exp(nll)) < 1e-2, doc_id
        n_checked += 1
    assert n_checked > 0
    # the defining property: P(·|w1) is a proper distribution over the
    # FULL vocabulary (unseen continuations covered by λ·P_cont)
    vocab = sorted({w for toks in docs.values() for w in toks})
    c1 = m[1]
    for w1 in sorted(c1)[:5]:
        total = sum(_p(w1, w2, m) for w2 in vocab)
        # Σ_all P_cont = 1 only over continuations that ever occur;
        # vocab words that never appear as a second word contribute 0
        assert abs(total - 1.0) < 1e-9, (w1, total)
