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


# ---------------------------------------------------------------------------
# hypothesis nets for the r4-final order/selection kernels
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rolling_median_matches_python_reference(spark, vals):
    """Exact rolling lower median vs a brute-force Python reference on
    arbitrary cent-quantized series."""
    from datetime import datetime, timedelta

    from kafka_connect_minio_pipeline_spark.operators.windows import (
        ROLL_MED_PRECEDING,
        rolling_median,
    )

    t0 = datetime(2024, 1, 1)
    rows = [(9, t0 + timedelta(minutes=i), i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = {r["event_id"]: r["rolling_median"]
           for r in rolling_median(df).collect()}
    for i in range(len(vals)):
        frame = sorted(vals[max(0, i - ROLL_MED_PRECEDING): i + 1])
        want = frame[(len(frame) + 1) // 2 - 1]
        assert got[i + 1] == want, (i, frame, got[i + 1], want)


@settings(max_examples=15, deadline=None)
@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # key
            st.booleans(),                                # is delete
            st.floats(min_value=0, max_value=99, allow_nan=False),
        ),
        min_size=0,
        max_size=12,
    ),
    cut=st.integers(min_value=0, max_value=12),
)
def test_versioned_merge_split_equivalence(spark, changes, cut):
    """ANY two-way split of ANY changelog, applied sequentially in
    EITHER order, reaches the same surviving-snapshot fixpoint as the
    one-shot merge — the associativity/order-freeness contract of the
    streaming MERGE sink, fuzzed."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.streaming.queries import (
        versioned_merge,
    )

    schema = (
        "key bigint, val decimal(18,2), ord_us bigint, ord_id bigint,"
        " tomb boolean"
    )
    base = spark.createDataFrame(
        [(k, Decimal(f"{10 * k}.00"), None, None, False) for k in (1, 2, 3)],
        schema,
    )
    rows = [
        (k, None if d else Decimal(f"{round(v, 2):.2f}"), i, 1000 + i, d)
        for i, (k, d, v) in enumerate(changes)
    ]
    all_chg = spark.createDataFrame(rows, schema)
    lo = spark.createDataFrame(rows[:cut], schema)
    hi = spark.createDataFrame(rows[cut:], schema)

    def final(df):
        return sorted(
            (r["key"], str(r["val"])) for r in df.filter(~F.col("tomb")).collect()
        )

    oneshot = final(versioned_merge(base, all_chg))
    assert final(versioned_merge(versioned_merge(base, lo), hi)) == oneshot
    assert final(versioned_merge(versioned_merge(base, hi), lo)) == oneshot


def _uni_viterbi(word: str, probs: dict[str, float]) -> list[str] | None:
    """Reference Viterbi segmentation over the emitted vocabulary: best
    (max product) split of `word` into pieces from `probs`, or None if
    no full cover exists."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import UNI_PIECE_MAX

    n = len(word)
    best: list[tuple[float, list[str]] | None] = [None] * (n + 1)
    best[0] = (1.0, [])
    for i in range(1, n + 1):
        for piece_len in range(1, min(UNI_PIECE_MAX, i) + 1):
            piece = word[i - piece_len : i]
            prev = best[i - piece_len]
            if prev is not None and piece in probs:
                cand = (prev[0] * probs[piece], prev[1] + [piece])
                if best[i] is None or cand[0] > best[i][0]:
                    best[i] = cand
    return best[n][1] if best[n] is not None else None


def test_unigram_tokenizer_hand_pinned_em(spark, tmp_path):
    """Hand-computed EM on the smallest non-trivial corpus (one word
    'ab' × 3 docs): seeds a/b/ab = 3 each (p₀ = 1/3); round 1 posteriors
    0.75 / 0.25 give p₁ ≈ (0.6, 0.2, 0.2); round 2 sharpens to the
    whole-word piece — E(ab) = 3·0.6/0.64 = 2.8125, p(ab) = 2.8125 /
    3.1875 ≈ 0.882352941. Pins the rich-get-richer EM dynamics and the
    exact arithmetic, not just parity."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import _unigram_tokenizer_build

    docs = spark.createDataFrame(
        [(i, "ab") for i in range(3)], "doc_id long, text string"
    )
    rows = {
        r["piece"]: r
        for r in _unigram_tokenizer_build(spark, docs, prune=False).collect()
    }
    assert set(rows) == {"a", "b", "ab"}
    assert all(r["seed_cnt"] == 3 for r in rows.values())
    assert rows["ab"]["rank"] == 1
    assert abs(rows["ab"]["expected_cnt"] - 2.8125) < 1e-6
    assert abs(rows["ab"]["prob"] - 0.882352941) < 1e-6
    # symmetric singles tie on expected count; piece ASC breaks the tie
    assert rows["a"]["rank"] == 2 and rows["b"]["rank"] == 3
    assert rows["a"]["expected_cnt"] == rows["b"]["expected_cnt"]
    assert abs(rows["a"]["prob"] - 0.058823529) < 1e-6


def test_unigram_tokenizer_segmentation_round_trip(spark, tmp_path):
    """Segmentation consistency: on a corpus whose whole candidate-piece
    set fits inside the emitted top-K, every corpus word must be fully
    coverable by the emitted vocabulary, its Viterbi pieces must
    concatenate back to the word (round-trip), and repeated words must
    segment as their whole-word piece (the EM compression payoff)."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        UNI_WORD_MAX,
        _unigram_tokenizer_build,
    )

    words = ["spark", "scan", "join", "agg", "row"]
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(4)], "doc_id long, text string"
    )
    out = _unigram_tokenizer_build(spark, docs).collect()
    probs = {r["piece"]: r["prob"] for r in out}
    for w in words:
        seg = _uni_viterbi(w[:UNI_WORD_MAX], probs)
        assert seg is not None, f"{w} not coverable by emitted vocab"
        assert "".join(seg) == w[:UNI_WORD_MAX]
        if len(w) <= 4:
            assert seg == [w], (w, seg)  # whole-word piece wins
        # the winning path is live: every piece on it kept positive
        # probability through the prune/re-EM schedule
        assert all(probs[piece] > 0 for piece in seg), (w, seg)
    # probabilities are a (partial) distribution over the emitted top-K;
    # EM-dominated residue pieces may round to exactly 0.0 at the
    # 9-decimal exposure after the prune schedule's extra re-EM rounds
    assert all(0 <= p <= 1 for p in probs.values())
    # each piece's prob is ROUND(·, 9), so the sum can sit above 1 by
    # up to half an ulp-of-rounding per piece
    assert sum(probs.values()) <= 1.0 + 5e-10 * len(probs)


def test_unigram_segment_matches_python_viterbi(spark, tmp_path):
    """Cross-implementation check of the APPLY side: the engine's
    relational Viterbi (pivot product + row_number argmax) must agree
    with the plain-Python DP reference on per-word piece counts and on
    per-doc rollups, using the FULL trained model."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        UNI_WORD_MAX,
        _unigram_model_build,
        q_text_unigram_segment,
    )

    texts = {
        1: "spark scan join agg row spark scan",
        2: "customer ordering spark",
        3: "agg agg agg",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    p, *_ = _unigram_model_build(spark, docs)
    probs = {r["piece"]: r["p"] for r in p.collect()}

    def doc_stats(text):
        words = [w[:UNI_WORD_MAX] for w in text.split()]
        n_pieces = 0
        for w in words:
            seg = _uni_viterbi(w, probs)
            assert seg is not None and "".join(seg) == w
            n_pieces += len(seg)
        return len(words), n_pieces

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in q_text_unigram_segment(spark, str(tmp_path)).collect()
    }
    want = {d: doc_stats(t) for d, t in texts.items()}
    assert got == want


def test_unigram_prune_loss_rank_drops_redundant_high_count_piece(
    spark, monkeypatch
):
    """Kudo §3.2 LIKELIHOOD-LOSS pruning end-to-end on a tight budget
    (the r14 criterion upgrade — VERDICT r13 item 3): with the
    multi-char keep schedule squeezed to (2, 1) on a corpus dominated
    by the repeated word ``abab``, the whole-word piece ``abab`` is the
    HIGHEST-expected-count multi-char candidate, yet it prunes in
    round 1 — its best alternative encoding (ab)(ab) is nearly free,
    so removing it costs almost no corpus likelihood. The reusable
    sub-piece ``ab`` (whose own alternative (a)(b) is terrible) is the
    final survivor. Under the r13 expected-count ranking this same
    fixture kept ``abab`` (the git-history pin of the predecessor
    test) — this IS the criterion flip, demonstrated on one corpus.
    Single-char pieces are never pruned, pruning stays absorbing
    (p = 0 in place), and the trajectory diagnostics stay coherent."""
    from kafka_connect_minio_pipeline_spark.operators import (
        text_tokenizers as T,
    )

    monkeypatch.setattr(T, "UNI_PRUNE_TARGETS", (2, 1))
    docs = spark.createDataFrame(
        [(i, "abab abab abab cd") for i in range(3)],
        "doc_id long, text string",
    )
    # premise: under the PRE-prune model (seed EM only), abab is the
    # top multi-char piece by expected count — so count-ranking with
    # any budget >= 1 would have kept it
    _, e0, *_ = T._unigram_model_build(spark, docs, prune=False)
    ed = {r["piece"]: float(r["ed"]) for r in e0.collect()}
    multis0 = sorted(
        (pc for pc in ed if len(pc) > 1), key=lambda pc: -ed[pc]
    )
    assert multis0[0] == "abab"
    assert ed["abab"] > ed["ab"]

    p, e, seeds, keep, stats = T._unigram_model_build(spark, docs)
    probs = {r["piece"]: r["p"] for r in p.collect()}
    kept = {r["piece"] for r in keep.collect()}
    singles = {pc for pc in probs if len(pc) == 1}
    multis = {pc for pc in probs if len(pc) > 1}
    # singles always survive; exactly one multi-char piece survives —
    # and it is the reusable sub-piece, NOT the high-count whole word
    assert singles <= kept
    assert kept & multis == {"ab"}
    assert "abab" not in kept
    for piece in multis - kept:
        assert probs[piece] == 0.0, piece
    # the dominant word stays coverable by a positive-prob path
    # through the survivor ((ab)(ab))
    seg = _uni_viterbi("abab", {k: v for k, v in probs.items() if v > 0})
    assert seg == ["ab", "ab"]
    # documented dec12-grid death, not drift: word ``cd`` lost its
    # multi piece in round 2, and its singles' path probability
    # (~1e-17) sits below the DECIMAL(28,12) quantization grid, so the
    # word drops out of the E-step domain identically on both engines
    # (the "sub-grid segmentations contribute exactly zero" clause of
    # the trainer spec)
    assert "c" not in probs and "d" not in probs
    # trajectory diagnostics: budgets enforced, kept mass is a ratio
    rows = {r["prune_round"]: r for r in stats.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["keep_budget"] == 2 and rows[2]["keep_budget"] == 1
    assert rows[1]["n_kept_multi"] == 2 and rows[2]["n_kept_multi"] == 1
    assert all(0 < r["mass_kept"] <= 1.0 for r in rows.values())
    # round 1 prunes the heavy-but-redundant abab, so the KEPT mass is
    # well under the ~0.97 a count-ranked keep of {abab, ab} would
    # retain — the mass number shows the criterion trading raw count
    # away for likelihood
    assert rows[1]["mass_kept"] < 0.6
    # round 2: mass re-concentrates on the survivor after re-EM
    assert rows[2]["mass_kept"] >= 0.5
    # corpus log-likelihood under each pruned model is finite and
    # negative; the round-2 model encodes the dominant word almost
    # freely ((ab)(ab) with p(ab) ~ 1), so ll_kept recovers toward 0
    assert all(r["ll_kept"] < 0 for r in rows.values())
    assert rows[2]["ll_kept"] > rows[1]["ll_kept"]


def test_tokenizer_ab_card_consistent_with_family_queries(spark, sf_dir):
    """The A/B card's corpus-level numbers must reconcile exactly with
    the per-doc / per-lang rollups the two family queries publish:
    unigram row = sum over text_unigram_segment docs, BPE row = sum
    over text_bpe_fertility langs — same joins, different grain."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        q_text_bpe_fertility,
        q_text_tokenizer_ab,
        q_text_unigram_segment,
    )

    card = {r["tokenizer"]: r for r in q_text_tokenizer_ab(spark, sf_dir).collect()}
    assert set(card) == {"bpe", "unigram", "bpe_shared", "unigram_shared"}
    seg = q_text_unigram_segment(spark, sf_dir).collect()
    assert card["unigram"]["n_words"] == sum(r["n_words"] for r in seg)
    assert card["unigram"]["n_pieces"] == sum(r["n_pieces"] for r in seg)
    bpe = q_text_bpe_fertility(spark, sf_dir).collect()
    assert card["bpe"]["n_words"] == sum(r["total_words"] for r in bpe)
    assert card["bpe"]["n_pieces"] == sum(r["total_bpe"] for r in bpe)
    for fam in ("bpe", "unigram", "bpe_shared", "unigram_shared"):
        r = card[fam]
        assert r["fertility"] == round(r["n_pieces"] / r["n_words"], 6)
        assert 0 < r["coverage"] <= 1.0
    # fair-domain arms (r14): both shared rows score the IDENTICAL
    # word multiset — alnum tokens truncated to UNI_WORD_MAX — so
    # their occurrence/char/coverage columns agree exactly and only
    # the piece economics differ; the shared domain is the alnum
    # token set (truncation preserves count), so its size equals the
    # full BPE domain and nests inside the full unigram domain
    b_sh, u_sh = card["bpe_shared"], card["unigram_shared"]
    assert b_sh["n_words"] == u_sh["n_words"] == card["bpe"]["n_words"]
    assert b_sh["coverage"] == u_sh["coverage"] == card["bpe"]["coverage"]
    assert u_sh["n_words"] <= card["unigram"]["n_words"]
    # identical char mass (reconstructed: chars_per_piece is
    # round(n_chars / n_pieces, 6), so cpp·n_pieces recovers the
    # integer n_chars exactly at test scale), and truncation can only
    # shrink it vs the full-word BPE row
    def chars(r):
        return round(r["chars_per_piece"] * r["n_pieces"])

    assert chars(b_sh) == chars(u_sh)
    assert chars(b_sh) <= chars(card["bpe"])
