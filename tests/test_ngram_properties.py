"""Property tests for the vectorized n-gram kernel and the PPJoin prefix
theorem — the two pieces of hand-derived math the near-dup family rests on.
"""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    tokens,
    word_ngrams,
)


def _py_ngrams(toks: list[str], n: int) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_word_ngrams_matches_python_reference(spark):
    """zip_with-over-slices must equal the obvious Python sliding window for
    every token count 0..9 (seeded random corpus, single Spark job per n)."""
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    for n in (2, 3, 4):
        got = {
            r["id"]: r["g"]
            for r in df.select(
                "id", word_ngrams(tokens(F.col("text")), n).alias("g")
            ).collect()
        }
        for i, text in docs:
            assert got[i] == _py_ngrams(text.split(), n), (n, text, got[i])


def _prefix(s: frozenset[int], t: float) -> list[int]:
    """First |s| - ceil(t*|s|) + 1 elements under the global order."""
    k = len(s) - math.ceil(t * len(s)) + 1
    return sorted(s)[:k]


@settings(max_examples=500, deadline=None)
@given(
    a=st.frozensets(st.integers(0, 30), max_size=20),
    b=st.frozensets(st.integers(0, 30), max_size=20),
)
def test_ppjoin_prefix_theorem(a, b):
    """For ANY fixed global element order: J(a,b) ≥ t ⇒ the t-prefixes of a
    and b intersect. This is the exactness claim that lets the inverted
    index hold only prefixes (a false theorem would silently lose pairs)."""
    if not a or not b:
        return
    t = JACCARD_THRESHOLD
    j = len(a & b) / len(a | b)
    if j >= t:
        assert set(_prefix(a, t)) & set(_prefix(b, t)), (sorted(a), sorted(b), j)


def test_tfidf_against_python_reference(spark, sf_dir):
    """Recompute TF-IDF in plain Python over the whole corpus and check
    the engine's per-doc top-3 (scores and rank order) match."""
    import math

    from kafka_connect_minio_pipeline_spark.operators.text import (
        TFIDF_TOP_K,
        q_text_tfidf,
    )
    from kafka_connect_minio_pipeline_spark.tables import load as _load

    docs = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for r in _load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    n = len(docs)
    df_counts: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
    expected = {}
    for doc_id, toks in docs.items():
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            (
                (round(c * (math.log((n + 1) / (df_counts[t] + 1)) + 1), 6), t, c)
                for t, c in tf.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:TFIDF_TOP_K]
        expected[doc_id] = [(t, c, s) for s, t, c in scored]
    got: dict[int, list] = {}
    for r in sorted(
        q_text_tfidf(spark, sf_dir).collect(), key=lambda r: (r["doc_id"], r["rank"])
    ):
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["tfidf"]))
        assert r["df"] == df_counts[r["term"]]
    assert got == expected
