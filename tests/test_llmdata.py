"""Semantic property tests for the LLM-curation operators (beyond the
auto-discovered oracle parity): exact stratum sizes, packing invariants,
seeded-PII accounting, and decontamination ground truth."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators import llmdata as L
from kafka_connect_minio_pipeline_spark.tables import load


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    want = {
        r["lang"]: math.ceil(L.SAMPLE_FRAC * r["n"])
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["lang"]: r["n"]
        for r in L.q_llm_sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # deterministic across runs (hash order, not RNG)
    a = {r["doc_id"] for r in L.q_llm_sample_stratified(spark, sf_dir).collect()}
    b = {r["doc_id"] for r in L.q_llm_sample_stratified(spark, sf_dir).collect()}
    assert a == b


def test_pack_sequences_invariants(spark, sf_dir):
    out = L.q_llm_pack_sequences(spark, sf_dir)
    rows = out.collect()
    # every doc clipped to the budget; offsets always inside a window
    assert all(0 < r["n_tok"] <= L.CTX_BUDGET for r in rows)
    assert all(0 <= r["offset_in_bin"] < L.CTX_BUDGET for r in rows)
    # per language: bins are contiguous from 0 and derived from the prefix
    # sum — recompute independently in Python and compare exactly
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        prefix = 0
        for r in rs:
            assert r["bin_id"] == prefix // L.CTX_BUDGET, (lang, r)
            assert r["offset_in_bin"] == prefix % L.CTX_BUDGET, (lang, r)
            prefix += r["n_tok"]


def test_pack_sequences_sharded_variant(spark, sf_dir):
    """shard_mod=N packs each (lang, doc_id % N) stream independently:
    same invariants per shard, and shard token totals partition the
    unsharded totals."""
    from kafka_connect_minio_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    out = L.pack_sequences(docs, shard_mod=4)
    rows = out.collect()
    assert all(0 <= r["shard"] < 4 for r in rows)
    by_key: dict[tuple, list] = {}
    for r in rows:
        by_key.setdefault((r["lang"], r["shard"]), []).append(r)
    for (lang, shard), rs in by_key.items():
        rs.sort(key=lambda r: r["doc_id"])
        prefix = 0
        for r in rs:
            assert r["bin_id"] == prefix // L.CTX_BUDGET, (lang, shard, r)
            assert r["offset_in_bin"] == prefix % L.CTX_BUDGET, (lang, shard, r)
            prefix += r["n_tok"]
    # token accounting matches the unsharded packer
    unsharded = L.pack_sequences(docs).collect()
    assert sum(r["n_tok"] for r in rows) == sum(r["n_tok"] for r in unsharded)


def test_pii_scrub_seeded_counts(spark, sf_dir):
    out = L.q_llm_pii_scrub(spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    for doc_id, r in rows.items():
        assert r["n_emails"] == (1 if doc_id % 3 == 0 else 0), r
        assert r["n_phones"] == (1 if doc_id % 5 == 0 else 0), r
    # scrubbing changed the text wherever something was found
    docs = {r["doc_id"]: r["md5"] for r in
            load(spark, sf_dir, "documents")
            .select("doc_id", F.md5("text").alias("md5")).collect()}
    for doc_id, r in rows.items():
        if doc_id % 3 == 0 or doc_id % 5 == 0:
            assert r["clean_md5"] != docs[doc_id]
        else:
            assert r["clean_md5"] == docs[doc_id]


def test_pack_and_sample_match_python_reference_on_random_frame(spark):
    """Seeded random corpus with edge cases the real corpus lacks (empty
    docs, one-doc strata, over-budget docs): pack_sequences and
    sample_stratified must equal the obvious Python reference."""
    import math
    import random

    rng = random.Random(13)
    rows = [
        (
            i,
            rng.choice(["xx", "yy"]),
            " ".join("w%d" % rng.randint(0, 5) for _ in range(rng.choice([0, 1, 3, 300]))),
        )
        for i in range(200)
    ] + [(1000, "solo", "one doc stratum")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    got_pack = {
        r["doc_id"]: (r["n_tok"], r["bin_id"], r["offset_in_bin"])
        for r in L.pack_sequences(df).collect()
    }
    by_lang: dict[str, list] = {}
    for i, lang, text in rows:
        by_lang.setdefault(lang, []).append((i, min(len(text.split()), L.CTX_BUDGET)))
    for lang, docs in by_lang.items():
        prefix = 0
        for i, n_tok in sorted(docs):
            assert got_pack[i] == (n_tok, prefix // L.CTX_BUDGET, prefix % L.CTX_BUDGET)
            prefix += n_tok

    got_sample = {
        r["doc_id"]: r["sample_rank"]
        for r in L.sample_stratified(df).collect()
    }
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    for lang, docs in by_lang.items():
        ids = [i for i, _ in docs]
        want_n = math.ceil(L.SAMPLE_FRAC * len(ids))
        want = sorted(ids, key=lambda i: (h(i), i))[:want_n]
        got = sorted(
            (i for i in ids if i in got_sample), key=lambda i: got_sample[i]
        )
        assert got == want, (lang, got, want)


def test_decontaminate_ground_truth(spark, sf_dir):
    """Benchmark docs never appear in the output, and a doc that IS an
    exact duplicate of a benchmark doc must be flagged."""
    docs = load(spark, sf_dir, "documents")
    out = L.q_llm_decontaminate(spark, sf_dir)
    bench_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % L.BENCH_MOD == 0).collect()
    }
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert out_ids.isdisjoint(bench_ids)
    assert out_ids | bench_ids == {r["doc_id"] for r in docs.collect()}

    # exact text duplicates of benchmark docs (if the corpus seeds any with
    # >= 8 tokens) are necessarily contaminated
    bench_texts = docs.filter(F.col("doc_id") % L.BENCH_MOD == 0).select(
        F.col("text").alias("bt")
    )
    dups = (
        docs.filter(F.col("doc_id") % L.BENCH_MOD != 0)
        .filter(F.size(F.split(F.col("text"), r"\s+")) >= 8)
        .join(bench_texts, F.col("text") == F.col("bt"), "left_semi")
    )
    dup_ids = {r["doc_id"] for r in dups.select("doc_id").collect()}
    flagged = {
        r["doc_id"] for r in out.filter(F.col("contaminated")).collect()
    }
    assert dup_ids <= flagged


def test_target_mix_rates_and_application(spark, sf_dir):
    """The binding stratum keeps rate 1.0, every rate is in (0, 1], and
    the hash-sampled output hits the target mix to within binomial noise
    (3·sqrt(n) per stratum)."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        TARGET_MIX,
        apply_mix,
        target_mix_rates,
    )

    docs = load(spark, sf_dir, "documents")
    rates = {r["lang"]: r for r in target_mix_rates(docs).collect()}
    assert set(rates) == set(TARGET_MIX)
    assert all(0 < r["keep_rate"] <= 1.0 for r in rates.values())
    binding = max(
        rates.values(),
        key=lambda r: TARGET_MIX[r["lang"]] / r["n_docs"],
    )
    assert binding["keep_rate"] == 1.0
    kept = apply_mix(docs, target_mix_rates(docs)).groupBy("lang").count().collect()
    kept = {r["lang"]: r["count"] for r in kept}
    n_kept = sum(kept.values())
    for lang, share in TARGET_MIX.items():
        want = share * n_kept
        assert abs(kept[lang] - want) <= 3 * (want**0.5) + 1, (lang, kept, want)
    # deterministic: same hash threshold, same sample
    again = apply_mix(docs, target_mix_rates(docs)).groupBy("lang").count().collect()
    assert kept == {r["lang"]: r["count"] for r in again}


def test_corpus_shuffle_split_properties(spark, sf_dir):
    """Every doc appears once with a contiguous per-shard position;
    shards are balanced to binomial noise; split fractions near
    90/5/5; and the train order is decorrelated from doc_id order."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        N_SHARDS,
        q_corpus_shuffle_split,
    )

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    rows = q_corpus_shuffle_split(spark, sf_dir).collect()
    assert len(rows) == n
    assert len({r["doc_id"] for r in rows}) == n
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(N_SHARDS))
    for shard, rs in by_shard.items():
        assert sorted(r["position"] for r in rs) == list(range(1, len(rs) + 1))
        assert abs(len(rs) - n / N_SHARDS) <= 4 * (n / N_SHARDS) ** 0.5, shard
    splits = {s: sum(1 for r in rows if r["split"] == s) for s in ("train", "val", "test")}
    assert sum(splits.values()) == n
    assert abs(splits["train"] - 0.90 * n) <= 4 * (0.90 * n) ** 0.5
    # shuffle actually shuffles: shard-0 read order is not doc_id order
    order0 = [r["doc_id"] for r in sorted(by_shard[0], key=lambda r: r["position"])]
    assert order0 != sorted(order0)
    # deterministic across runs
    again = {(r["doc_id"], r["split"], r["shard"], r["position"])
             for r in q_corpus_shuffle_split(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["split"], r["shard"], r["position"]) for r in rows}


def test_shuffle_split_matches_python_md5_reference(spark):
    """The portable-hash contract, end to end: split, shard, and in-shard
    position recomputed in pure Python from md5 prefixes must equal the
    engine's output exactly — on adversarial ids (0, huge, dense runs)."""
    import hashlib

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        N_SHARDS,
        SPLIT_BOUNDS,
        shuffle_split,
    )

    def h(salt, i):
        return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)

    ids = sorted({0, 1, 2, 3, 2**40, 2**40 + 1, 999_999_999_999} | set(range(100, 180)))
    space = 1 << 60
    lo, hi = (int(b * space) for b in SPLIT_BOUNDS)
    expected = {}
    by_shard: dict[int, list] = {}
    for i in ids:
        hs, ho = h("split:", i), h("order:", i)
        split = "train" if hs < lo else ("val" if hs < hi else "test")
        by_shard.setdefault(ho % N_SHARDS, []).append((ho, i, split))
    for shard, rows in by_shard.items():
        for pos, (_, i, split) in enumerate(sorted(rows), start=1):
            expected[i] = (split, shard, pos)

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: (r["split"], r["shard"], r["position"])
        for r in shuffle_split(df).collect()
    }
    assert got == expected


def test_repetition_stats_edge_and_known_values(spark):
    """Hand-checkable docs: empty-ish, single-token, all-repeated, and a
    half-duplicated text — including the longest-run fold's correctness."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "one"),
            (2, "a a a a"),          # 4 tokens, 1 unique; bigrams all "a a"
            (3, "x y x y z"),        # top bigram "x y" twice of 4
            (4, "all distinct words here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_token_frac"] == 0.0 and got[1]["top_bigram_frac"] == 0.0
    assert got[2]["dup_token_frac"] == 0.75 and got[2]["top_bigram_frac"] == 1.0
    assert got[3]["dup_token_frac"] == round(2 / 5, 6)
    assert got[3]["top_bigram_frac"] == 0.5
    # 4 distinct tokens -> 3 distinct bigrams, longest run 1 of 3
    assert got[4]["dup_token_frac"] == 0.0 and got[4]["top_bigram_frac"] == round(1 / 3, 6)


def test_interleave_is_weighted_permutation(spark, sf_dir):
    """corpus_interleave: (shard_id, shard_pos) reconstructs one total
    order; shards tile the order_key range; within-stratum order is
    preserved; weight-2 strata appear ~2x as densely as their
    within-timeline share in the shared prefix."""
    from collections import Counter

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        INTERLEAVE_WEIGHTS,
        q_corpus_interleave,
    )

    rows = q_corpus_interleave(spark, sf_dir).collect()
    # shard_pos is a 1..n permutation within every shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    for sid, rs in by_shard.items():
        assert sorted(r.shard_pos for r in rs) == list(range(1, len(rs) + 1)), sid
    # concatenating shards in id order yields a globally sorted timeline:
    # order_key never decreases across the reconstructed order
    seq = sorted(rows, key=lambda r: (r.shard_id, r.shard_pos))
    keys = [r.order_key for r in seq]
    assert keys == sorted(keys)
    # within each stratum the reconstructed order preserves order_key order
    by_lang = {}
    for r in seq:
        by_lang.setdefault(r.lang, []).append(r.order_key)
    for lang, ks in by_lang.items():
        assert ks == sorted(ks), lang
    # density: on the shared prefix of the virtual timeline every stratum
    # has emitted ≈ weight × timeline-length docs
    t_end = min(max(ks) for ks in by_lang.values())
    emitted = Counter(r.lang for r in rows if r.order_key <= t_end)
    for lang, n in emitted.items():
        expect = INTERLEAVE_WEIGHTS[lang] * t_end
        assert abs(n - expect) <= 2, (lang, n, expect)


def test_token_budget_bucketed_equals_global_form(spark, sf_dir):
    """The bucketed prefix-sum decomposition must reproduce the global
    window EXACTLY, including the degenerate all-equal-quality corpus
    (max_q == min_q branch: everything lands in bucket 0)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        token_budget_select,
    )
    from kafka_connect_minio_pipeline_spark.operators.text import quality_features
    from kafka_connect_minio_pipeline_spark.tables import load

    def global_form(docs, budget):
        scored = quality_features(docs).select(
            "doc_id", "n_tokens", "quality_score"
        )
        w = Window.orderBy(F.desc("quality_score"), "doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return (
            scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget)
            .select("doc_id", "n_tokens", "quality_score", "cum_tokens")
        )

    docs = load(spark, sf_dir, "documents")
    for budget in (5_000, 20_000):
        got = {r.doc_id: r.cum_tokens for r in token_budget_select(docs, budget).collect()}
        want = {r.doc_id: r.cum_tokens for r in global_form(docs, budget).collect()}
        assert got == want, budget

    flat = spark.createDataFrame(
        [(i, "en", "same words every time") for i in range(1, 21)],
        "doc_id long, lang string, text string",
    )
    got = sorted(
        (r.doc_id, r.cum_tokens) for r in token_budget_select(flat, 50).collect()
    )
    want = sorted(
        (r.doc_id, r.cum_tokens) for r in global_form(flat, 50).collect()
    )
    assert got == want and got, got


def test_rag_chunks_cover_and_overlap(spark):
    """Every chunk is the exact token slice at its stride offset, chunks
    cover all tokens, consecutive chunks share size-stride tokens, and
    the short-doc / empty-doc edges produce exactly one chunk."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        rag_chunks,
    )

    texts = {
        1: " ".join(f"t{i}" for i in range(100)),
        2: " ".join(f"t{i}" for i in range(CHUNK_TOKENS)),  # exactly one chunk
        3: "short doc",
        4: "",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = rag_chunks(df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        toks = texts[doc_id].split()
        rs.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        covered = set()
        for r in rs:
            start = r["chunk_id"] * CHUNK_STRIDE
            want = toks[start : start + CHUNK_TOKENS]
            assert r["chunk_text"].split() == want, (doc_id, r["chunk_id"])
            assert r["chunk_len"] == len(want)
            assert r["chunk_start"] == start + 1
            covered.update(range(start, start + len(want)))
        assert covered == set(range(len(toks))), doc_id
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1 and len(by_doc[4]) == 1


def test_mix_epochs_schedule_properties(spark, sf_dir):
    """Every doc appears exactly n_epochs times with epochs 1..n, the
    fanout stays within the 3x bound, and order keys are unique."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import q_corpus_mix_epochs
    from kafka_connect_minio_pipeline_spark.tables import load

    rows = q_corpus_mix_epochs(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == n_docs
    assert len(rows) <= 3 * n_docs
    for doc_id, visits in by_doc.items():
        n = visits[0].n_epochs
        assert sorted(v.epoch for v in visits) == list(range(1, n + 1)), doc_id
    keys = [r.order_key for r in rows]
    assert len(set(keys)) == len(keys)


def test_span_corruption_roundtrip_reconstructs_original(spark, sf_dir):
    """(input, target) must losslessly reconstruct the original token
    stream: replacing each <extra_id_k> in the input with target span k
    gives back the tokenized document — the denoising objective's
    invariant, checked for every document at test scale."""
    import re

    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_span_corruption,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    out = {r["doc_id"]: r for r in q_llm_span_corruption(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sentinel = re.compile(r"<extra_id_(\d+)>")
    for d in docs:
        row = out[d["doc_id"]]
        # parse target into span_k -> tokens
        spans, cur = {}, None
        for tok in row["target_text"].split():
            m = sentinel.fullmatch(tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in row["input_text"].split():
            m = sentinel.fullmatch(tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        original = [t for t in d["text"].lower().split() if t]
        assert rebuilt == original, d["doc_id"]
        assert row["n_spans"] == len(spans)


def test_fim_transform_roundtrip(spark, sf_dir):
    """prefix + middle + suffix must reassemble the original token
    stream, and the sentinel order must be PSM (prefix, suffix, middle)."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_fim_transform,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    out = {r["doc_id"]: r for r in q_llm_fim_transform(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for d in docs:
        r = out[d["doc_id"]]
        toks = r["psm_text"].split()
        ip, isf, im = (
            toks.index("<fim_prefix>"),
            toks.index("<fim_suffix>"),
            toks.index("<fim_middle>"),
        )
        assert (ip, isf < im) == (0, True)
        prefix, suffix, middle = toks[1:isf], toks[isf + 1 : im], toks[im + 1 :]
        original = [t for t in d["text"].lower().split() if t]
        assert prefix + middle + suffix == original, d["doc_id"]
        assert (len(prefix), len(middle), len(suffix)) == (
            r["n_prefix"], r["n_middle"], r["n_suffix"],
        )


def test_pack_eval_fragmentation_monotone_in_budget(spark, sf_dir):
    """Larger contexts can only reduce fragmentation: per stratum,
    frac_straddling is non-increasing as the budget grows, and bins
    follow ceil(total/budget)."""
    import math

    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_pack_eval,
    )

    rows = q_llm_pack_eval(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        assert r["bins_used"] == math.ceil(r["total_tokens"] / r["budget"])
        assert 0.0 <= r["frac_straddling"] <= 1.0
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["budget"])
        fr = [r["frac_straddling"] for r in rs]
        assert fr == sorted(fr, reverse=True), (lang, fr)


def test_shard_skew_shares_sum_to_one(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_shard_skew,
    )

    rows = q_corpus_shard_skew(spark, sf_dir).collect()
    by_split: dict[str, float] = {}
    n_shards: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0.0) + r["share_in_split"]
        n_shards[r["split"]] = n_shards.get(r["split"], 0) + 1
    for split, s in by_split.items():
        assert abs(s - 1.0) <= 5e-7 * n_shards[split] + 1e-9, (split, s)


def test_weighted_sample_favors_heavy_docs(spark, tmp_path):
    """A-ES contract: with one overwhelming weight the heavy doc must be
    sampled (rank 1 — its key ln(u)/w is ~0, beating any unit-weight
    key), and with k >= n the sample is everything, rank-ordered."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        weighted_sample_per_group,
    )

    rows = [(i, "s", 1 if i else 10**9) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = weighted_sample_per_group(df, k=5).collect()
    assert len(got) == 5
    assert got[0].doc_id == 0 or any(r.doc_id == 0 and r.sample_rank == 1 for r in got)
    full = weighted_sample_per_group(df, k=100).collect()
    assert len(full) == 40
    assert sorted(r.sample_rank for r in full) == list(range(1, 41))


def test_weighted_sample_equal_weights_is_hash_uniform(spark):
    """With all weights equal, ln(u)/w ordering reduces to ordering by u
    alone — the sample must equal the top-k of the salted portable hash
    (the same uniform order llm_sample_* uses), independently derived."""
    from pyspark.sql import functions as F

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        weighted_sample_per_group,
    )
    from kafka_connect_minio_pipeline_spark.operators.llmdata import _portable_hash

    df = spark.createDataFrame(
        [(i, "s", 7) for i in range(200)], "doc_id long, source string, n_chars long"
    )
    got = {r.doc_id for r in weighted_sample_per_group(df, k=10).collect()}
    want = {
        r.doc_id
        for r in df.select(
            "doc_id",
            _portable_hash(
                F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
        .orderBy(F.col("h").desc())
        .limit(10)
        .collect()
    }
    assert got == want


def test_drift_psi_terms_nonnegative_and_null_distribution(spark, sf_dir):
    """PSI contract: every per-token term is >= 0 ((p-q) and ln(p/q)
    always share sign), and on the null distribution (two iid hash
    halves of the same corpus) the TOTAL drift must be small — far
    below the conventional 0.1 'moderate shift' alarm threshold."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_drift_psi,
    )

    rows = q_corpus_drift_psi(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.psi_term >= 0 for r in rows)
    assert all(r.n_base + r.n_new > 0 for r in rows)
    total = sum(r.psi_term for r in rows)
    assert total < 0.1, total


def test_substring_clean_removes_duplicated_spans(spark, sf_dir):
    """ExactSubstr transform invariants (Lee et al. 2022): (a) exact
    length accounting — len(text) - len(cleaned_text) == chars_removed
    for every doc, with untouched docs byte-identical; (b) effectiveness
    — re-scoring the CLEANED corpus with the same gram logic leaves at
    most a sliver of duplicated gram positions (seam-adjacent new grams
    may survive one pass; the paper iterates to fixpoint)."""
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        substring_gram_rows,
    )
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_substring_clean,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    cleaned = q_llm_substring_clean(spark, sf_dir)
    orig = load(spark, sf_dir, "documents").select("doc_id", "text")
    joined = cleaned.join(orig, "doc_id").select(
        "doc_id", "n_spans", "chars_removed", "cleaned_text", "text"
    )
    bad_len = joined.filter(
        F.length("text") - F.length("cleaned_text") != F.col("chars_removed")
    ).count()
    assert bad_len == 0, "length accounting broken"
    bad_noop = joined.filter(
        (F.col("n_spans") == 0) & (F.col("cleaned_text") != F.col("text"))
    ).count()
    assert bad_noop == 0, "untouched doc was edited"
    assert joined.filter(F.col("n_spans") > 0).count() > 0, "fixture vacuous"

    def dup_gram_positions(docs):
        g = substring_gram_rows(docs)
        gd = (
            g.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("g")
        )
        return g.join(gd, "g").count()

    before = dup_gram_positions(orig)
    after = dup_gram_positions(
        cleaned.select("doc_id", F.col("cleaned_text").alias("text"))
    )
    assert before > 0, "fixture has no cross-doc duplicated grams"
    assert after <= 0.05 * before, f"clean left {after}/{before} dup positions"


def test_semantic_decontamination_catches_paraphrase_ngram_misses(spark, tmp_path):
    """The VERDICT r10 item-3 acceptance test: a PARAPHRASED copy of an
    eval item — same meaning (near-identical embedding, cosine ~1) but
    zero shared 8-grams — must slip through n-gram decontamination and
    be flagged by the semantic operator; an unrelated doc is flagged by
    neither. doc_id/vec_id 0 plays the benchmark row (0 % 97 == 0)."""
    import math

    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_decontaminate,
        q_llm_decontaminate_semantic,
    )

    dim = 8
    texts = {
        0: "the quick brown fox jumps over the lazy dog near the river bank",
        7: "a fast tan animal leaps across one sleepy canine beside that water edge",
    }
    vecs = {
        i: [math.sin(0.7 * (i + 1) * (j + 1)) for j in range(dim)]
        for i in range(14)
    }
    # vec 7 = near-copy of the eval vector 0 (paraphrase in embedding space)
    vecs[7] = [x + 0.001 * (j + 1) for j, x in enumerate(vecs[0])]
    doc_rows = [
        (i, "en", texts.get(i, f"filler words alpha{i} beta{i} gamma{i} delta{i}"))
        for i in range(14)
    ]
    spark.createDataFrame(
        doc_rows, "doc_id long, lang string, text string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    ngram = {
        r.doc_id: r.contaminated
        for r in q_llm_decontaminate(spark, str(tmp_path)).collect()
    }
    sem = {
        r.vec_id: r for r in q_llm_decontaminate_semantic(spark, str(tmp_path)).collect()
    }
    assert ngram[7] is False  # the paraphrase provably evades n-grams
    assert sem[7].semantic_contaminated is True
    assert sem[7].max_eval_cos > 0.99
    assert all(not sem[i].semantic_contaminated for i in sem if i != 7)
    assert 0 not in sem  # eval rows are never scored against themselves

    # τ sweep over the same planted fixture (VERDICT r11 item 6): the
    # planted paraphrase sits at cosine ~1, so EVERY τ in the grid must
    # recall it — n_flagged ≥ 1 at each τ, monotone non-increasing in τ,
    # and the spine constant (n_corpus = the 13 non-eval vectors).
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        DECON_SWEEP_TAUS,
        q_llm_decon_semantic_sweep,
    )

    sweep = {
        r.tau: r for r in q_llm_decon_semantic_sweep(spark, str(tmp_path)).collect()
    }
    assert set(sweep) == {float(t) for t in DECON_SWEEP_TAUS}
    flagged = [sweep[float(t)].n_flagged for t in DECON_SWEEP_TAUS]
    assert all(f >= 1 for f in flagged)  # planted recall across the grid
    assert flagged == sorted(flagged, reverse=True)
    assert all(sweep[t].n_corpus == 13 for t in sweep)


def test_url_filter_planted_blocklist_and_cap(spark, tmp_path):
    """Planted-blocklist acceptance (VERDICT r11 item 5): a fixture with
    one blocked domain, one mega-domain far over the cap, and one small
    domain under it. The blocked domain must keep ZERO docs regardless
    of the hash draw; the under-cap domain keeps everything (rate 1.0);
    the mega-domain keeps roughly cap docs via the hash rate (strictly
    fewer than it has, more than zero); and the registered-domain
    extraction must strip the synthesized subdomain."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        DOMAIN_CAP,
        q_corpus_domain_mix,
        q_corpus_url_filter,
    )

    # URL_BLOCKLIST contains src3.example.com; plant 30 docs on src3,
    # 200 on src5 (≫ DOMAIN_CAP=18), 10 on src6 (< cap).
    rows = (
        [(i, "en", "src3") for i in range(30)]
        + [(100 + i, "en", "src5") for i in range(200)]
        + [(1000 + i, "en", "src6") for i in range(10)]
    )
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    v = q_corpus_url_filter(spark, str(tmp_path)).collect()
    by_dom: dict[str, list] = {}
    for r in v:
        by_dom.setdefault(r["domain"], []).append(r)
        # subdomain stripped: domain is exactly source.example.com
        assert r["domain"].count(".") == 2
        assert r["url"].startswith("https://www.") or r["url"].startswith(
            ("https://cdn.", "https://api.")
        )
    assert set(by_dom) == {
        "src3.example.com", "src5.example.com", "src6.example.com"
    }
    assert all(not r["kept"] and r["blocked"] for r in by_dom["src3.example.com"])
    kept5 = sum(r["kept"] for r in by_dom["src5.example.com"])
    assert 0 < kept5 < 200  # hash-rate cap: expected ≈ DOMAIN_CAP
    assert kept5 <= 3 * DOMAIN_CAP  # loose concentration bound
    assert all(r["kept"] for r in by_dom["src6.example.com"])

    mix = {r["domain"]: r for r in q_corpus_domain_mix(spark, str(tmp_path)).collect()}
    assert mix["src3.example.com"]["n_kept"] == 0
    assert mix["src3.example.com"]["blocked"]
    assert mix["src5.example.com"]["n_kept"] == kept5
    assert mix["src6.example.com"]["keep_rate"] == 1.0
    assert abs(sum(m["share"] for m in mix.values()) - 1.0) < 1e-5


def test_url_canonical_planted_mirrors(spark, tmp_path):
    """Planted mirror-crawl fixture: doc_ids congruent mod 13 with the
    same source+lang must collapse onto ONE canonical URL across scheme
    case/slash/param-order variants; a lone page stays a singleton. The
    canonical form itself is pinned exactly."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_url_canonical,
    )

    rows = [
        (0, "en", "srcA"),    # page 0: https, www,  slash,  lang-first
        (130, "en", "srcA"),  # page 0: https, WWW,  slash,  lang-first
        (13, "en", "srcA"),   # page 0: http,  WWW,  plain,  v-first
        (5, "de", "srcB"),    # page 5: singleton
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in q_corpus_url_canonical(spark, str(tmp_path)).collect()}
    want_canon = "https://www.srca.example.com/docs/0?lang=en&v=1"
    for d in (0, 13, 130):
        assert got[d]["canonical_url"] == want_canon, got[d]
        assert got[d]["group_size"] == 3
        assert got[d]["canonical_id"] == 0
        assert got[d]["n_variants"] == 3  # three distinct messy forms
    assert not got[0]["is_dup"] and got[13]["is_dup"] and got[130]["is_dup"]
    assert got[5]["group_size"] == 1 and not got[5]["is_dup"]
    assert got[5]["canonical_url"].startswith("https://www.srcb.example.com/docs/5?")


def test_cluster_safe_split_has_zero_leakage(spark, sf_dir):
    """The zero-straddling property, asserted on the REAL corpus: after
    cluster-safe assignment, NO verified near-dup pair crosses a split
    boundary (whereas the plain doc-hash split measurably leaks — that
    contrast is what corpus_split_leakage exists to show). Cluster
    members must all share their cluster's split, and the split rule
    must agree with shuffle_split for singletons (same salt, same key)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_split_cluster_safe,
        shuffle_split,
    )
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )
    from kafka_connect_minio_pipeline_spark.tables import load

    assign = {
        r["doc_id"]: r
        for r in q_corpus_split_cluster_safe(spark, sf_dir).collect()
    }
    pairs = [
        (r["d1"], r["d2"])
        for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()
    ]
    assert pairs, "fixture has no near-dup pairs — the property is vacuous"
    for d1, d2 in pairs:
        assert assign[d1]["split"] == assign[d2]["split"], (d1, d2)
        assert assign[d1]["clustered"] and assign[d2]["clustered"]
    # singletons: identical verdict to the plain doc-hash split
    plain = {
        r["doc_id"]: r["split"]
        for r in shuffle_split(load(spark, sf_dir, "documents")).collect()
    }
    for d, r in assign.items():
        if not r["clustered"]:
            assert r["split"] == plain[d], d


def test_corpus_snapshot_diff_planted_churn(spark, tmp_path):
    """Churn report vs an independent Python recomputation of the
    synthesized-snapshot rules on a planted fixture: per-doc status
    (added / removed / changed / unchanged) re-derived with hashlib
    md5 draws, rolled up per source, must equal the engine's report —
    and the doc-level identities must reconcile (n_old + added = n_new
    + removed; churn is the invalidated fraction of the old crawl)."""
    import hashlib

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        SNAP_ADD_FRAC,
        SNAP_CHG_FRAC,
        SNAP_RM_FRAC,
        q_corpus_snapshot_diff,
    )

    rows = [
        (i, f"document body {i} alpha beta", "en", f"src{i % 3}", 20)
        for i in range(120)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    def draw(salt, doc_id, frac):
        h = int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:15], 16)
        return h < int(frac * (1 << 60))

    want: dict[str, dict[str, int]] = {}
    for doc_id, _, _, source, _ in rows:
        rm = draw("snaprm|", doc_id, SNAP_RM_FRAC)
        add = draw("snapadd|", doc_id, SNAP_ADD_FRAC) and not rm
        chg = draw("snapchg|", doc_id, SNAP_CHG_FRAC)
        status = (
            "added" if add else "removed" if rm
            else "changed" if chg else "unchanged"
        )
        want.setdefault(source, {}).setdefault(status, 0)
        want[source][status] += 1
    got = {r["source"]: r for r in q_corpus_snapshot_diff(
        spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for src, r in got.items():
        w = want[src]
        assert r["n_added"] == w.get("added", 0), src
        assert r["n_removed"] == w.get("removed", 0), src
        assert r["n_changed"] == w.get("changed", 0), src
        assert r["n_unchanged"] == w.get("unchanged", 0), src
        # snapshot-size identities
        assert r["n_old"] == r["n_removed"] + r["n_changed"] + r["n_unchanged"]
        assert r["n_new"] == r["n_added"] + r["n_changed"] + r["n_unchanged"]
        assert r["churn_rate"] == round(
            (r["n_added"] + r["n_removed"] + r["n_changed"]) / r["n_old"], 6
        )


def test_corpus_refresh_pipeline_planted_gates(spark, tmp_path):
    """Composed crawl-refresh pipeline on a planted fixture: statuses
    re-derived with independent hashlib draws pick real added/unchanged
    docs, and the texts are then planted so each gate fires exactly
    once — one short added doc (quality_fail), one added doc copying an
    unchanged doc's text verbatim (duplicate_exact via the canonical
    shingle fingerprint), one added doc one word away from an unchanged
    doc (duplicate_near via the banded-MinHash layer at J~0.93), one
    added doc carrying a benchmark 8-gram (contaminated) — every other delta doc is kept. The engine's
    per-source accounting must equal the Python rollup, and the
    keep-list / reprocessed-fraction identities must hold row by row
    (unchanged docs enter the keep-list WITHOUT being scored)."""
    import hashlib

    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        SNAP_ADD_FRAC,
        SNAP_CHG_FRAC,
        SNAP_RM_FRAC,
        q_corpus_refresh_pipeline,
    )
    from kafka_connect_minio_pipeline_spark.operators.llmdata import BENCH_MOD

    def draw(salt, doc_id, frac):
        h = int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:15], 16)
        return h < int(frac * (1 << 60))

    n_docs = 120
    status = {}
    for i in range(n_docs):
        if i % BENCH_MOD == 0:
            continue  # benchmark universe, excluded from the crawl
        rm = draw("snaprm|", i, SNAP_RM_FRAC)
        add = draw("snapadd|", i, SNAP_ADD_FRAC) and not rm
        chg = draw("snapchg|", i, SNAP_CHG_FRAC)
        status[i] = (
            "added" if add else "removed" if rm
            else "changed" if chg else "unchanged"
        )
    added = sorted(i for i, s in status.items() if s == "added")
    unchanged = sorted(i for i, s in status.items() if s == "unchanged")
    assert len(added) >= 4 and len(unchanged) >= 2, "draw starved a state"
    d_dup, d_contam, d_qfail, d_near = added[:4]
    u_src, u_near = unchanged[:2]

    base = "the quick brown fox jumps over a lazy dog again " * 4
    leak = "benchmark leak phrase one two three four five"

    def text_of(i):
        if i % BENCH_MOD == 0:
            return leak
        if i == d_dup:
            return f"entry {u_src} token{u_src} " + base.strip()
        if i == d_near:
            # one word changed vs u_near's text: shingle-set Jaccard
            # ~0.93 (verified offline) — near-dup, not exact
            return f"entry {u_near} token{u_near} " + base.strip()[:-5] + "altered"
        if i == d_contam:
            return f"entry {i} token{i} " + base + leak
        if i == d_qfail:
            return f"short document body {i}"
        return f"entry {i} token{i} " + base.strip()

    rows = [
        (i, text_of(i), "en", f"src{i % 3}", len(text_of(i)))
        for i in range(n_docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    want: dict[str, dict[str, int]] = {}
    for i, s in status.items():
        src = f"src{i % 3}"
        w = want.setdefault(
            src,
            {"n_new": 0, "n_delta": 0, "n_quality_fail": 0,
             "n_dup_exact": 0, "n_dup_near": 0, "n_contaminated": 0,
             "n_kept": 0},
        )
        if s == "removed":
            continue
        w["n_new"] += 1
        if s in ("added", "changed"):
            w["n_delta"] += 1
            if i == d_qfail:
                w["n_quality_fail"] += 1
            elif i == d_dup:
                w["n_dup_exact"] += 1
            elif i == d_near:
                w["n_dup_near"] += 1
            elif i == d_contam:
                w["n_contaminated"] += 1
            else:
                w["n_kept"] += 1

    got = {
        r["source"]: r
        for r in q_corpus_refresh_pipeline(spark, str(tmp_path)).collect()
    }
    assert set(got) == {s for s, w in want.items() if w["n_new"] > 0}
    for src, r in got.items():
        w = want[src]
        for k in ("n_new", "n_delta", "n_quality_fail", "n_dup_exact",
                  "n_dup_near", "n_contaminated", "n_kept"):
            assert r[k] == w[k], (src, k, r[k], w[k])
        # identities: the gates partition the delta; unchanged docs
        # flow into the keep-list unscored
        assert r["n_delta"] == (
            r["n_quality_fail"] + r["n_dup_exact"] + r["n_dup_near"]
            + r["n_contaminated"] + r["n_kept"]
        )
        assert r["n_keeplist"] == r["n_new"] - r["n_delta"] + r["n_kept"]
        assert r["reprocessed_frac"] == round(r["n_delta"] / r["n_new"], 6)


def test_corpus_refresh_pipeline_accounting_on_fixture(spark, sf_dir):
    """Row identities on the real fixture corpus: verdicts partition
    the delta, keep-list algebra holds, and the refresh re-processes a
    strict minority of the new snapshot (the incrementality win the
    operator exists to measure)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_refresh_pipeline,
    )

    rows = q_corpus_refresh_pipeline(spark, sf_dir).collect()
    assert rows
    tot_new = sum(r["n_new"] for r in rows)
    tot_delta = sum(r["n_delta"] for r in rows)
    for r in rows:
        assert r["n_delta"] == (
            r["n_quality_fail"] + r["n_dup_exact"] + r["n_dup_near"]
            + r["n_contaminated"] + r["n_kept"]
        )
        assert r["n_keeplist"] == r["n_new"] - r["n_delta"] + r["n_kept"]
        assert r["reprocessed_frac"] == round(r["n_delta"] / r["n_new"], 6)
    # synthesis fractions put the delta well under half the snapshot
    assert 0 < tot_delta < 0.5 * tot_new
