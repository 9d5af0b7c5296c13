"""Randomized cross-engine parity: seeded adversarial corpora.

The degenerate nets (test_degenerate_docs.py) pin HAND-PICKED
pathologies; this net generates seeded random corpora — punctuation
runs, whitespace soup, repeated tokens, long single words, empty docs,
regex metacharacters — and hash-compares a battery of text/corpus
queries against their DuckDB oracles on each. ASCII-only by the
documented corpus invariant. Deterministic (fixed seed), so a failure
reproduces; a 12-trial exploratory run of this generator came back
clean after the round-5 hardening wave.
"""

from __future__ import annotations

import os
import random
import shutil
import string

import duckdb
import pytest

from kafka_connect_minio_pipeline_spark.registry import all_queries
from kafka_connect_minio_pipeline_spark.tables import CONTRACT_SQL_WHERE, TABLE_NAMES
from oracle_utils import _canon

pytestmark = pytest.mark.slow  # heavy sweep net: opt-in tier (pytest.ini)

SF_SRC = "/root/testdata/sf0.001"

TARGETS = (
    "dedup_exact", "text_quality", "text_boilerplate_edges",
    "text_unigram_logprob", "text_bpe_pairs", "text_fingerprint",
    "llm_rag_chunk", "text_zipf", "corpus_weighted_sample",
    "corpus_drift_psi", "dedup_ngram_jaccard", "text_pretokenize",
    "corpus_repetition", "text_token_stats",
    # r7: the tokenizer triple (the fuzz alphabet includes the '<'/'>'
    # wrapper chars — exactly what the alnum word filter must keep out
    # of the merge loop) and the newly oracle-checked language-ID
    "text_bpe_apply", "text_bpe_vocab", "text_bpe_fertility",
    "text_langid",
    # r8: C4 line rules (the driver fixture is punctuation-free word
    # soup, so the rules only fire on THESE corpora — terminal punct,
    # braces, newlines, "..." runs all come from the fuzz alphabet) and
    # the ExactSubstr transform
    "text_c4_rules", "llm_substring_clean",
    # r8: cross-doc line dedup (driver fixture has no byte-equal lines;
    # the fuzz repeated-token corpora do) and the CCNet partition
    "text_line_dedup", "text_ccnet_buckets",
    # r10: both KN LMs — the fuzz corpora's random langs produce tiny /
    # empty en target slices and heavy OOV, exactly the backoff arms the
    # driver fixture exercises only lightly
    "text_kn_perplexity", "text_kn_quality",
    # r10 net closure: EVERY remaining documents-consuming oracle query —
    # tokenizer/sampling/packing/mixing transforms over empty docs and
    # whitespace soup, the multimodal decoders over garbage payloads,
    # and the two streaming document queries (whose converged result
    # must equal the batch oracle on ANY corpus; enrolling them exposed
    # the _stream_dir directory-shaped-table bug). 43/45 passed on first
    # trial; test_doc_net_is_closed below keeps the enrollment total.
    "corpus_bigram_novelty", "corpus_dsir", "corpus_interleave",
    "corpus_mix_epochs", "corpus_shard_skew", "corpus_shuffle_split",
    "corpus_split_leakage", "corpus_token_budget", "corpus_vocab_top",
    "corpus_weighted_median", "dedup_simhash", "dedup_source_overlap",
    "dedup_substring", "llm_corpus_pipeline", "llm_dataset_card",
    "llm_decontaminate", "llm_dedup_keep_best", "llm_fim_transform",
    "llm_mix_temperature", "llm_pack_eval", "llm_pack_sequences",
    "llm_pii_scrub", "llm_sample_hash", "llm_sample_stratified",
    "llm_span_corruption", "llm_target_mix", "multimodal_decode_errors",
    "multimodal_ppm_decode", "multimodal_wav_decode",
    "pipeline_corpus_clean", "pipeline_dq_checks", "scalar_url",
    "stream_multimodal", "stream_quality", "text_bm25",
    "text_collocations", "text_feature_hashing", "text_gopher_rules",
    "text_ngram_top", "text_normalize", "text_rake_keywords",
    "text_readability", "text_tfidf", "udtf_sentences",
    "udtf_sentences_builtin",
    # r11: the trained-classifier family (tiny/empty train splits, all-
    # identical feature rows → sd=0 arms, degenerate teacher labels) and
    # the streaming near-dup gate (whose converged bucket minima must
    # equal the batch oracle on ANY corpus)
    "text_quality_classifier", "text_classifier_eval",
    "text_classifier_weights", "stream_dedup_minhash",
    "stream_quality_classifier", "text_classifier_calibration",
    "corpus_quality_report",
    # r12: domain/URL curation (null langs → NULL urls, fuzz sources
    # never hit the blocklist — both arms the driver fixture misses)
    "corpus_url_filter", "corpus_domain_mix",
    # r12: unigram-LM tokenizer trainer (80-char fuzz words exercise the
    # UNI_WORD_MAX truncation; whitespace soup → empty word relations)
    "text_unigram_tokenizer",
    # r12: the bigram-feature A/B card (sub-2-token docs → empty bigram
    # families, the n2=0 arm the driver fixture never hits) and the
    # unigram APPLY side (Viterbi ties + truncation on fuzz words)
    "text_classifier_bigram_eval", "text_unigram_segment",
    # r12: URL canonicalization (null langs → NULL canonical groups —
    # both engines window NULL partitions together) and the cluster-safe
    # split (fuzz corpora produce different pair graphs every seed)
    "corpus_url_canonical", "corpus_split_cluster_safe",
    # r13: the prune trajectory (fuzz corpora with < budget multi-char
    # candidates exercise the keep-everything arm; whitespace soup →
    # empty candidate domains → NULL mass/ll rows on both engines), the
    # streaming decon gate (converged count state must equal the batch
    # oracle on ANY corpus), the snapshot churn report (fuzz null langs
    # / sources group as their own bucket through the full-outer join),
    # and the tokenizer A/B card (fuzz punctuation words live in the
    # unigram domain but not BPE's — the coverage split the card is
    # FOR)
    "text_unigram_prune", "stream_decontaminate", "corpus_snapshot_diff",
    "text_tokenizer_ab",
    # r14: the composed crawl-refresh pipeline (fuzz corpora rarely pass
    # the Gopher gate, so the empty-qpass arm — empty fingerprint/band/
    # gram relations through both dedup layers — runs on most seeds;
    # doc 0 is always benchmark-resident) and the audio fingerprint
    # (tiny id sets → usually an empty pair relation on both engines;
    # close ids exercise small-phase-shift hamming arms)
    "corpus_refresh_pipeline", "multimodal_audio_fingerprint",
)


def test_doc_net_is_closed():
    """Every documents-consuming oracle query must be enrolled in the
    corpus fuzz net (the twin of test_ev_net_is_closed)."""
    import inspect

    docq = set()
    for name, q in all_queries(strict=False).items():
        if q.oracle is None:
            continue
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        if '"documents"' in src:
            docq.add(name)
    missing = docq - set(TARGETS)
    assert not missing, f"documents queries outside the fuzz net: {sorted(missing)}"
    unknown = set(TARGETS) - set(all_queries(strict=False))
    assert not unknown, f"fuzz net names not in the registry: {sorted(unknown)}"

_CHARS = (
    string.ascii_lowercase + string.digits
    # \x0B and \f: Java \s includes them, RE2 \s omits \x0B — the r8
    # explicit-whitespace-class fix (WS_CLASS) is what keeps these from
    # diverging; the alphabet carries them so the whole net checks it
    + " .,;:!?-_'\"()[]{}@#$%&*+=/\\|<>~`^\t\n\x0b\f"
)


def _rand_text(rng: random.Random) -> str:
    mode = rng.randrange(6)
    if mode == 0:
        return ""
    if mode == 1:  # repeated token (repetition/boilerplate paths)
        return " ".join([rng.choice(["the", "aa", "zz9", "..."])]
                        * rng.randrange(1, 30))
    if mode == 2:  # one long word (BPE / readability syllable paths)
        return "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randrange(1, 80))
        )
    if mode == 3:  # whitespace soup (tokenizer zero-token paths)
        return "".join(rng.choice(" \t\n\x0b\f") for _ in range(rng.randrange(1, 10)))
    return "".join(rng.choice(_CHARS) for _ in range(rng.randrange(1, 120)))


@pytest.fixture(scope="session")
def fuzz_dirs(spark, tmp_path_factory) -> list[str]:
    dirs = []
    for seed in (101, 202, 303):
        rng = random.Random(seed)
        d = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
        for f in os.listdir(SF_SRC):
            if f != "documents.parquet":
                shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
        rows = [
            (i, t, rng.choice(["en", "de", "zh"]), rng.choice(["web", "book"]),
             len(t))
            for i, t in (
                (i, _rand_text(rng)) for i in range(rng.randrange(3, 40))
            )
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
                  " n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        dirs.append(d)
    return dirs


@pytest.mark.parametrize("name", sorted(TARGETS))
def test_fuzz_corpus_parity(spark, fuzz_dirs, name):
    q = all_queries(strict=False)[name]
    for d in fuzz_dirs:
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


# --- events fuzz: heavy timestamp collisions ------------------------------
#
# Few users, a handful of MINUTE-granularity timestamps with many exact
# duplicates, empty event types, negative/zero cent-exact values, and
# malformed/NULL props. This generator (different seed) caught the
# session-window boundary bug: Spark coalesces touching windows, the
# oracle split on >= at exact-gap spacing.

_EV_TARGETS = (
    "stream_session", "stream_tumbling", "stream_sliding", "ts_sessionize",
    "ts_zscore", "ts_gapfill", "ts_islands", "ts_scd2", "ts_funnel",
    "agg_time_rollup", "scalar_json", "udaf_weighted_value",
    "window_running_distinct", "ts_dow_hour_heatmap",
    # r8: the downsampling duo — heavy duplicate timestamps stress the
    # (ts, event_id) tie-breaks in bucket assignment and role selection
    "ts_downsample_lttb", "ts_downsample_m4",
    # r9: rolling indicators (duplicate-ts frame tie-breaks, negative
    # values through the gain/loss split), the drift-stats battery
    # (empty-string event type as a category, collision-heavy value
    # supports through the merged-CDF window), and streaming top-k
    # (count ties broken by type name)
    "ts_bollinger", "ts_rsi",
    "agg_ks_test", "agg_chisq", "agg_welch_ttest", "agg_mann_whitney",
    "stream_topk",
    # r10 late batch: attribution (exact-duplicate touch timestamps force
    # the event_id tie-break; purchases with empty/error-only history
    # exercise the no-candidate arm) and Theil-Sen (collision-heavy days
    # collapse to few rollup rows — single-day series must vanish from
    # BOTH engines, negative values through the exact-decimal means)
    "ts_attribution", "ts_theil_sen",
    # agg_cuped: the fuzz window sits entirely in the pre-period, so the
    # all-mass-on-one-side degenerate arms (vy=0 -> reduction 0) fire
    "agg_cuped",
    # agg_srm: 1-5 user ids -> tiny odd populations, mod-2 split maximally
    # unbalanced — the flag arm fires both ways across seeds
    "agg_srm",
    # temporal-join pair: exact-duplicate change timestamps hit the PIT
    # join's zero-length-interval edge (two changes at one instant — the
    # higher version must win in BOTH formulations) and the CDC merge's
    # (ts, event_id) last-write tie-break
    "join_pit_scd2", "join_cdc_merge",
    # r10 net closure: EVERY remaining events-consuming oracle query —
    # as-of ties at equal timestamps, OHLC open/close tie-breaks,
    # interval edges at duplicate instants, negative-value histogram
    # bins, degenerate per-type distributions through the moment/rank
    # batteries, sketches over empty-string types, and both Pandas-UDF
    # paths. All 47 passed both seeds on first trial (the r5-r9
    # hardening waves hold); test_ev_net_is_closed below keeps the
    # enrollment total for every FUTURE events operator.
    "agg_conversion_ci", "agg_entropy", "agg_gini", "agg_histogram",
    "agg_linreg", "agg_mode", "agg_pivot", "agg_skewkurt",
    "join_asof", "join_asof_nearest", "join_skew_salted",
    "pipeline_dq_checks", "scalar_bitwise", "scalar_json_typed",
    "scalar_map", "sketch_countmin", "sketch_hll", "sketch_hll_setops",
    "sketch_kmv", "stream_cdc_merge", "stream_countmin",
    "stream_entropy", "stream_hll", "stream_ohlc",
    "ts_acf", "ts_anomaly_seasonal", "ts_changepoint", "ts_concurrency",
    "ts_cross_corr", "ts_ewma", "ts_forecast_snaive", "ts_interpolate",
    "ts_mad", "ts_markov", "ts_ohlc", "ts_overlap_join", "ts_retention",
    "ts_runs_test", "ts_seasonal", "ts_silence_windows", "ts_survival",
    "ts_uptime_report", "ts_week_over_week",
    "udf_grouped_znorm", "udf_grouped_znorm_builtin",
    "window_rolling_median", "window_rolling_slope",
)


def test_ev_net_is_closed():
    """Every events-consuming oracle query must be enrolled in the
    collision fuzz net — a new events operator that skips it fails here
    loudly instead of silently missing the duplicate-timestamp /
    empty-type / negative-value corpus."""
    import inspect

    evq = set()
    for name, q in all_queries(strict=False).items():
        if q.oracle is None:
            continue
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        if '"events"' in src:
            evq.add(name)
    missing = evq - set(_EV_TARGETS)
    assert not missing, f"events queries outside the fuzz net: {sorted(missing)}"
    unknown = set(_EV_TARGETS) - set(all_queries(strict=False))
    assert not unknown, f"fuzz net names not in the registry: {sorted(unknown)}"


def _rand_events(rng: random.Random):
    n = rng.randrange(150, 500)
    base_ts = [
        "2024-01-0%d %02d:%02d:00"
        % (rng.randrange(1, 8), rng.randrange(24), rng.randrange(60))
        for _ in range(rng.randrange(3, 12))
    ]
    return [
        (i, rng.choice(base_ts), rng.randrange(1, 6),
         rng.choice(["click", "view", "purchase", "error", ""]),
         round(rng.choice([-1, 1]) * rng.randrange(0, 10000) / 100.0, 2),
         rng.choice(['{"k": %d}' % rng.randrange(100), "{bad", None]))
        for i in range(n)
    ]


@pytest.fixture(scope="session")
def fuzz_ev_dirs(tmp_path_factory) -> list[str]:
    import pandas as pd

    dirs = []
    for seed in (901, 902):
        rng = random.Random(seed)
        d = str(tmp_path_factory.mktemp(f"fuzzev{seed}"))
        for f in os.listdir(SF_SRC):
            if f != "events.parquet":
                shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
        con = duckdb.connect()
        try:
            con.register(
                "t",
                pd.DataFrame(
                    _rand_events(rng),
                    columns=["event_id", "ts", "user_id", "event_type",
                             "value", "props"],
                ),
            )
            con.execute(
                f"""COPY (SELECT event_id::BIGINT AS event_id,
                          ts::TIMESTAMP AS ts, user_id::BIGINT AS user_id,
                          event_type, "value"::DOUBLE AS "value", props
                          FROM t)
                    TO '{d}/events.parquet' (FORMAT PARQUET)"""
            )
        finally:
            con.close()
        dirs.append(d)
    return dirs


@pytest.mark.parametrize("name", sorted(_EV_TARGETS))
def test_fuzz_events_parity(spark, fuzz_ev_dirs, name):
    q = all_queries(strict=False)[name]
    for d in fuzz_ev_dirs:
        got = q.fn(spark, d).toPandas()
        con = duckdb.connect()
        try:
            for t in TABLE_NAMES:
                w = CONTRACT_SQL_WHERE.get(t, "")
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'"
                    + (f" WHERE {w}" if w else "")
                )
            want = con.execute(q.oracle).fetchdf()
        finally:
            con.close()
        assert sorted(got.columns) == sorted(want.columns), (name, d)
        assert _canon(got) == _canon(want), (name, d)


# --- relational fuzz: adversarial lineitem/orders ---------------------------
#
# The TPC-H-family operators (the driver's most-graded surface) under
# data the synthetic generator never produces: dangling foreign keys on
# every edge (orders without customers, lineitems without orders/parts/
# suppliers), duplicate (order, part) lines, zero and negative
# quantities/amounts, empty-string flags/statuses/priorities, and
# filter-boundary values (the Q1 shipdate cutoff, discount band edges,
# quantity 50). No NULLs: the corpus generator contract is non-null
# columns, and NULL *ordering* legitimately differs across engines.
# First trial (two seeds) caught a real totality bug:
# join_min_price_supplier's unit-price division hit ANSI DIVIDE_BY_ZERO
# on a zero-quantity line.

_REL_TARGETS = (
    "agg_benford", "agg_column_profile", "agg_corr", "agg_count_distinct",
    "agg_cube", "agg_large_orders", "agg_median_twopass", "agg_percentile",
    "agg_poisson_bootstrap", "agg_pricing_summary", "agg_promo_share",
    "agg_rollup", "agg_small_qty_revenue", "agg_unpivot",
    "join_anti", "join_bucketed", "join_copurchase_lift",
    "join_disjunctive_revenue", "join_inner_revenue",
    "join_left_order_counts", "join_market_share",
    "join_min_price_supplier", "join_nation_trade",
    "join_order_count_dist", "join_range_band", "join_returned_items",
    "join_role_dims", "join_semi", "join_shipping_priority",
    "join_top_supplier", "join_untapped_customers", "join_waiting_supplier",
    "pipeline_dq_checks", "scalar_date", "sketch_bloom_join", "sketch_hll",
    "sketch_hll_setops", "sketch_quantile", "topk_global",
    "window_distribution", "window_lag_lead", "window_range_frame",
    "window_rank", "window_running", "window_topn_per_group",
)


def test_rel_net_is_closed():
    """Every lineitem/orders-consuming oracle query (direct reference in
    its builder source, same convention as the other closures) must be
    enrolled in the relational fuzz net."""
    import inspect

    relq = set()
    for name, q in all_queries(strict=False).items():
        if q.oracle is None:
            continue
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        if '"lineitem"' in src or '"orders"' in src:
            relq.add(name)
    missing = relq - set(_REL_TARGETS) - set(_EV_TARGETS)
    assert not missing, f"relational queries outside the fuzz net: {sorted(missing)}"
    unknown = set(_REL_TARGETS) - set(all_queries(strict=False))
    assert not unknown, f"fuzz net names not in the registry: {sorted(unknown)}"


def _rand_rel(rng: random.Random):
    import datetime

    n_ord = rng.randrange(40, 120)
    okeys = rng.sample(range(1, 10000), n_ord)
    orders = []
    for ok in okeys:
        d = datetime.datetime(
            1995 + rng.randrange(4), rng.randrange(1, 13), rng.randrange(1, 29)
        )
        if rng.random() < 0.1:
            d = datetime.datetime(1998, 9, 2)  # the Q1 cutoff, exactly
        orders.append(
            (ok, rng.randrange(1, 60), rng.choice(["O", "F", "P", ""]),
             round(rng.choice([-1, 1]) * rng.randrange(0, 500000) / 100.0, 2),
             d, rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW", ""]))
        )
    lines = []
    for _ in range(rng.randrange(200, 600)):
        ok = (rng.choice(okeys) if rng.random() < 0.9
              else rng.randrange(10000, 10100))
        pk = (rng.randrange(1, 201) if rng.random() < 0.9
              else rng.randrange(5000, 5100))
        sk = (rng.randrange(1, 11) if rng.random() < 0.9
              else rng.randrange(900, 910))
        lines.append(
            (ok, pk, sk, rng.randrange(1, 8),
             float(rng.choice([0, 1, 24, 25, 49, 50, 51, rng.randrange(0, 60)])),
             round(rng.randrange(100, 10000000) / 100.0, 2),
             rng.choice([0.0, 0.05, 0.06, 0.07, 0.1,
                         round(rng.randrange(0, 11) / 100.0, 2)]),
             round(rng.randrange(0, 9) / 100.0, 2),
             rng.choice(["R", "A", "N", ""]), rng.choice(["O", "F", ""]),
             datetime.datetime(1995 + rng.randrange(4), rng.randrange(1, 13),
                               rng.randrange(1, 29)))
        )
    return orders, lines


@pytest.fixture(scope="session")
def fuzz_rel_dirs(tmp_path_factory) -> list[str]:
    import pandas as pd

    dirs = []
    for seed in (701, 702):
        rng = random.Random(seed)
        d = str(tmp_path_factory.mktemp(f"fuzzrel{seed}"))
        for f in os.listdir(SF_SRC):
            if f not in ("lineitem.parquet", "orders.parquet"):
                shutil.copy(f"{SF_SRC}/{f}", f"{d}/{f}")
        orders, lines = _rand_rel(rng)
        con = duckdb.connect()
        try:
            con.register("o", pd.DataFrame(orders, columns=[
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]))
            con.execute(
                f"""COPY (SELECT o_orderkey::BIGINT AS o_orderkey,
                    o_custkey::BIGINT AS o_custkey, o_orderstatus,
                    o_totalprice::DOUBLE AS o_totalprice,
                    o_orderdate::TIMESTAMP AS o_orderdate, o_orderpriority
                    FROM o) TO '{d}/orders.parquet' (FORMAT PARQUET)"""
            )
            con.register("l", pd.DataFrame(lines, columns=[
                "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"]))
            con.execute(
                f"""COPY (SELECT l_orderkey::BIGINT AS l_orderkey,
                    l_partkey::BIGINT AS l_partkey,
                    l_suppkey::BIGINT AS l_suppkey,
                    l_linenumber::INTEGER AS l_linenumber,
                    l_quantity::DOUBLE AS l_quantity,
                    l_extendedprice::DOUBLE AS l_extendedprice,
                    l_discount::DOUBLE AS l_discount,
                    l_tax::DOUBLE AS l_tax, l_returnflag, l_linestatus,
                    l_shipdate::TIMESTAMP AS l_shipdate
                    FROM l) TO '{d}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        finally:
            con.close()
        dirs.append(d)
    return dirs


@pytest.mark.parametrize("name", sorted(_REL_TARGETS))
def test_fuzz_relational_parity(spark, fuzz_rel_dirs, name):
    q = all_queries(strict=False)[name]
    for d in fuzz_rel_dirs:
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
