"""Plan-shape assertions: the efficiency half of the correctness contract.

A query that returns the right rows through the wrong plan (no pushdown,
shuffled dimension join, global sort for a top-k) would fall over at
100 TB — these tests pin the plan properties the operators were designed
around.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_minio_pipeline_spark.operators import joins, windows as w_ops
from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_pricing_summary
from kafka_connect_minio_pipeline_spark.pipeline.profile import (
    profile_transform,
    users_from_customer,
)
from kafka_connect_minio_pipeline_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    formatted_plan,
    pushed_filters,
)
from kafka_connect_minio_pipeline_spark.tables import load


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    """The Q1 shipdate predicate must appear in PushedFilters, and the scan
    must prune to only referenced columns."""
    df = q_agg_pricing_summary(spark, sf_dir)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf, pf
    plan = formatted_plan(df)
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_projection_pruning(spark, sf_dir):
    """A 2-column projection must not read the other columns."""
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    read_schema = formatted_plan(df).split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_dimension_join_broadcasts(spark, sf_dir):
    df = joins.q_join_inner_revenue(spark, sf_dir)
    assert_in_plan(df, "BroadcastHashJoin")


def test_band_join_is_broadcast_nested_loop(spark, sf_dir):
    df = joins.q_join_range_band(spark, sf_dir)
    assert_in_plan(df, "BroadcastNestedLoopJoin")


def test_semi_anti_compile_to_semi_anti_joins(spark, sf_dir):
    assert "LeftSemi" in formatted_plan(joins.q_join_semi(spark, sf_dir))
    assert "LeftAnti" in formatted_plan(joins.q_join_anti(spark, sf_dir))


def test_aggregation_has_partial_phase(spark, sf_dir):
    """Map-side combine: two HashAggregate phases (partial + final) —
    the property that bounds shuffle volume by groups, not rows."""
    df = q_agg_pricing_summary(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_global_topk_avoids_global_sort(spark, sf_dir):
    df = w_ops.q_topk_global(spark, sf_dir)
    assert_in_plan(df, "TakeOrderedAndProject")
    assert_not_in_plan(df, "Exchange rangepartitioning")


def test_profile_pipeline_is_shuffle_free(spark, sf_dir):
    """The flagship per-record dataflow must stay narrow: zero exchanges
    (SURVEY.md §3.2 — 'fully pipelined map/filter')."""
    df = profile_transform(users_from_customer(load(spark, sf_dir, "customer")))
    assert_not_in_plan(df, "Exchange")
    assert_in_plan(df, "codegen id")  # fused into whole-stage codegen


def test_asof_join_is_single_shuffle_window(spark, sf_dir):
    """The as-of join must be the union+window formulation: exactly one
    hash exchange (on user_id) and one Window, no join node at all."""
    df = joins.q_join_asof(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan
    assert "Join" not in plan, plan
    # one exchange node → exactly one hashpartitioning argument line
    assert plan.count("hashpartitioning") == 1, plan


def test_revenue_join_aggregates_below_join(spark, sf_dir):
    """The per-orderkey rollup must happen BEFORE the orders join: the
    first exchange out of lineitem is keyed on l_orderkey for an
    aggregate, so the join moves |orders| rows, not |lineitem|."""
    df = joins.q_join_inner_revenue(spark, sf_dir)
    plan = formatted_plan(df)
    assert "hashpartitioning(l_orderkey" in plan, plan
    # countDistinct would show a second distinct-aggregate expansion on
    # (n_name, o_orderkey); the rewrite removes it
    assert "hashpartitioning(n_name" in plan and "o_orderkey" not in plan.split(
        "hashpartitioning(n_name"
    )[1].split(")")[0], plan


def test_market_share_join_shape(spark, sf_dir):
    """The Q8-style 7-table join: part/supplier-nation/nation/region
    sides broadcast onto the fact, lineitem collapses to per-order
    volumes BEFORE the orders join (first lineitem exchange keyed on
    l_orderkey for an aggregate), and nothing degenerates to a
    cartesian."""
    df = joins.q_join_market_share(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "hashpartitioning(l_orderkey" in plan, plan
    assert "CartesianProduct" not in plan
    # the part filter must be pushed into the part scan, not evaluated
    # post-join
    assert "PushedFilters: [IsNotNull(p_type), EqualTo(p_type,STANDARD)" in plan, plan


def test_minhash_signatures_are_narrow(spark, sf_dir):
    """Signature computation must be shuffle-free (array_min over the
    per-doc array, no explode+groupBy)."""
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        _doc_shingle_sets,
        minhash_signatures,
    )

    df = minhash_signatures(_doc_shingle_sets(spark, sf_dir))
    # the only allowed exchange is the deliberate compute-spread
    # repartition (tables.spread) — never an explode+groupBy shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "REPARTITION_BY_NUM" in ex[0], plan


def test_ngram_jaccard_reuses_prefix_exchange(spark, sf_dir):
    """The inverted-index self-join must build its shuffle once: after
    execution the adaptive plan contains ReusedExchange (both sides are
    the same prefix subtree under a shuffle-hash join)."""
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )

    df = q_dedup_ngram_jaccard(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_salted_join_spreads_keys(spark, sf_dir):
    """Salted join: the join condition carries the salt equality, and the
    result is identical to the plain join (oracle asserts values; here we
    assert the salt actually reaches the join keys)."""
    df = joins.q_join_skew_salted(spark, sf_dir)
    plan = formatted_plan(df)
    assert "fact_salt" in plan and "dim_salt" in plan, plan


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Bucketing co-locates the join: both sides pre-hashed into the same
    bucket layout at write time → sort-merge join with ZERO exchanges.
    This is the 100 TB answer for a fact⨝fact join that recurs on the
    same key — pay the shuffle once at ingest, never again per query."""
    from kafka_connect_minio_pipeline_spark.tables import load

    spark.sql("DROP TABLE IF EXISTS kcm_orders_b")
    spark.sql("DROP TABLE IF EXISTS kcm_lineitem_b")
    load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").write.mode(
        "overwrite"
    ).bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("kcm_orders_b")
    load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").write.mode(
        "overwrite"
    ).bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("kcm_lineitem_b")
    try:
        j = (
            spark.table("kcm_orders_b")
            .hint("merge")
            .join(
                spark.table("kcm_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # sanity: result matches the plain (shuffled) join
        n_plain = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert j.count() == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS kcm_orders_b")
        spark.sql("DROP TABLE IF EXISTS kcm_lineitem_b")


def test_corpus_clean_stays_narrow_until_dedup_window(spark, sf_dir):
    """The composed cleaning pipeline must shuffle exactly twice: once
    for the fingerprint dedup window, once for the tiny per-language
    aggregate — quality features and fingerprints are all narrow."""
    from kafka_connect_minio_pipeline_spark.pipeline.queries import q_corpus_clean

    df = q_corpus_clean(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan
    organic = [
        ln for ln in plan.splitlines()
        if "hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(organic) <= 2, plan


def test_stream_static_join_broadcasts_static_side(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.streaming.windows import (
        stream_static_join,
    )

    sdf = stream_static_join(spark, sf_dir)
    # streaming plans can't be formatted pre-execution the same way; check
    # the analyzed plan mentions the broadcast hint survived
    assert "ResolvedHint" in sdf._jdf.queryExecution().analyzed().toString() or \
        "broadcast" in sdf._jdf.queryExecution().analyzed().toString().lower()


def test_llm_sample_prunes_text_column(spark, sf_dir):
    """Stratified sampling touches only doc_id/lang — the (large) text
    column must never be read from parquet, and the single shuffle is the
    per-language window partition."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_sample_stratified,
    )

    df = q_llm_sample_stratified(spark, sf_dir)
    plan = formatted_plan(df)
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" not in read_schema, read_schema
    assert plan.count("hashpartitioning") == 1, plan


def test_llm_pii_scrub_is_narrow(spark, sf_dir):
    """PII scrubbing is a pure projection: zero exchanges of any kind."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import q_llm_pii_scrub

    df = q_llm_pii_scrub(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pure projection aside from the deliberate compute-spread repartition
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "REPARTITION_BY_NUM" in ex[0], plan


def test_llm_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram set (tiny vs the corpus) must broadcast; the
    corpus side must stay shuffle-free up to the per-doc count."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_decontaminate,
    )

    df = q_llm_decontaminate(spark, sf_dir)
    assert_in_plan(df, "BroadcastHashJoin")


def test_llm_pack_sequences_single_shuffle(spark, sf_dir):
    """Packing is one running-sum window per language: exactly one hash
    exchange, no global sort."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_pack_sequences,
    )

    plan = formatted_plan(q_llm_pack_sequences(spark, sf_dir))
    organic = [
        ln for ln in plan.splitlines()
        if "hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(organic) == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_pivot_has_partial_aggregation(spark, sf_dir):
    """Pivot with explicit values compiles to Spark's two-phase pivot
    plan: partial count by (user_id, event_type), then partial_pivotfirst
    by user_id — two exchanges, but BOTH carry map-side-combined
    accumulators (≤ 5 rows per user after phase 1), never raw rows, and
    there is no distinct-values discovery job."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_pivot

    plan = formatted_plan(q_agg_pivot(spark, sf_dir))
    assert "partial_pivotfirst" in plan, plan
    assert plan.count("hashpartitioning") == 2, plan


def test_join_bucketed_query_plan_and_parity(spark, sf_dir):
    """The registered bucketed-join query: sort-merge join with NO
    exchange below the final rollup, and the same result as the plain
    shuffled join."""
    df = joins.q_join_bucketed(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    want = {
        (r["o_orderpriority"], r["revenue"], r["n_items"])
        for r in joins.QUERIES["join_bucketed"]
        .fn(spark, sf_dir)
        .collect()
    }
    from kafka_connect_minio_pipeline_spark.functions.exact import revenue

    plain = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(revenue(F.col("l_extendedprice"), F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    got = {(r["o_orderpriority"], r["revenue"], r["n_items"]) for r in plain.collect()}
    assert want == got


def test_partitioned_layout_gets_dynamic_partition_pruning(spark, sf_dir):
    """A fact table written with sinks.write_partitioned and joined to a
    selectively-filtered dim table prunes fact partitions at RUNTIME
    (dynamicpruning subquery in the scan's PartitionFilters) — a
    date-partitioned 100 TB fact scan touches only the dim-selected
    dates. The dim must be a materialized table with a real predicate:
    a filter on a literal column constant-folds away and DPP sees no
    selective predicate to reuse."""
    import os
    import tempfile

    from kafka_connect_minio_pipeline_spark.sinks import write_partitioned

    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    base = tempfile.mkdtemp()
    write_partitioned(ev, os.path.join(base, "fact"), ["event_date"])
    ev.select("event_date").distinct().write.parquet(os.path.join(base, "dim"))
    fact = spark.read.parquet(os.path.join(base, "fact"))
    dim = spark.read.parquet(os.path.join(base, "dim")).withColumn(
        "event_date", F.col("event_date").cast("date")
    )
    cutoff = F.lit("2024-01-03").cast("date")
    joined = fact.join(dim.filter(F.col("event_date") <= cutoff), "event_date")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == ev.filter(F.col("event_date") <= "2024-01-03").count()


def test_selective_shuffle_join_gets_runtime_bloom_filter(spark, sf_dir):
    """When a shuffle join's build side carries a selective predicate,
    Spark injects a runtime bloom filter (might_contain) on the probe
    side — at 100 TB the fact scan drops non-matching rows before the
    exchange instead of shuffling them. Local data is below the
    application-side threshold, so the test lowers it (creation side
    must stay under ITS threshold — that one is a maximum)."""
    import os
    import tempfile

    base = tempfile.mkdtemp()
    load(spark, sf_dir, "lineitem").write.parquet(os.path.join(base, "li"))
    load(spark, sf_dir, "orders").write.parquet(os.path.join(base, "od"))
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(os.path.join(base, "li"))
        od = spark.read.parquet(os.path.join(base, "od"))
        j = li.join(
            od.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == od.o_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bloom_join_never_shuffles_probe_side(spark, sf_dir):
    """The Bloom pre-join: bits relation is a 1-row broadcast, the member
    set a broadcast hash join — the probe (big) side must see no
    SortMergeJoin and no exchange besides the final tiny groupBy."""
    from kafka_connect_minio_pipeline_spark.operators.sketches import (
        q_sketch_bloom_join,
    )

    df = q_sketch_bloom_join(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_countmin_sketch_joins_broadcast(spark, sf_dir):
    """The d sketch-row lookups must broadcast the (≤ d·w row) sketch —
    a shuffled join on the key side would defeat the sketch's purpose."""
    from kafka_connect_minio_pipeline_spark.operators.sketches import (
        q_sketch_countmin,
    )

    plan = formatted_plan(q_sketch_countmin(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phash_band_join_is_equi_not_cartesian(spark, sf_dir):
    """Candidate generation must be an equi-join on (band, value) — a
    BroadcastNestedLoopJoin here would mean the all-pairs scan the
    banding exists to avoid."""
    from kafka_connect_minio_pipeline_spark.operators.multimodal import (
        q_multimodal_phash_pairs,
    )

    plan = formatted_plan(q_multimodal_phash_pairs(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_quantize_is_narrow(spark, sf_dir):
    """Quantization is per-row array algebra: nothing but the
    compute-spread repartition may exchange."""
    from kafka_connect_minio_pipeline_spark.operators.similarity import q_embedding_quantize

    plan = formatted_plan(q_embedding_quantize(spark, sf_dir))
    # formatted output lists each node twice (tree + details); count the
    # per-exchange Arguments line instead — only the spread repartition
    assert plan.count("hashpartitioning") <= 1, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_ewma_is_single_shuffle_window(spark, sf_dir):
    """The truncated-EWMA frame costs exactly one exchange (user_id
    window partitioning); the fold itself is a projection."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_ewma

    plan = formatted_plan(q_ts_ewma(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert "Window" in plan


def test_overlap_join_is_bucketized_equi_join(spark, sf_dir):
    """The interval-overlap join must go through the hour-bucket
    equi-join — a BroadcastNestedLoopJoin would be the quadratic naive
    plan the bucketization exists to avoid."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_overlap_join

    plan = formatted_plan(q_ts_overlap_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interleave_has_no_global_window(spark, sf_dir):
    """corpus_interleave must produce its order via (shard_id, shard_pos)
    — per-shard windows only. A Window with an empty partition spec would
    funnel the whole corpus through one task (the round-3 weak-at-scale
    flag this sharded formulation fixes)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_interleave,
    )
    from kafka_connect_minio_pipeline_spark.plans.explain import global_window_lines

    df = q_corpus_interleave(spark, sf_dir)
    assert global_window_lines(df) == []
    plan = formatted_plan(df)
    assert "hashpartitioning(shard_id" in plan, plan


def test_token_budget_has_no_unbounded_global_window(spark, sf_dir):
    """corpus_token_budget's prefix sum must run partitioned by quality
    bucket; the only permitted empty-partition Window is the cumulative
    offset over the n_buckets-row bucket-totals relation (bounded
    cardinality)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_token_budget,
    )
    from kafka_connect_minio_pipeline_spark.plans.explain import global_window_lines

    df = q_corpus_token_budget(spark, sf_dir)
    globals_ = global_window_lines(df)
    assert all("bucket_tokens" in line for line in globals_), globals_
    plan = formatted_plan(df)
    assert "hashpartitioning(q_bucket" in plan, plan


def test_new_topk_queries_avoid_global_sort(spark, sf_dir):
    """graph_jaccard / text_bpe_pairs return top-k via TakeOrdered
    (per-partition heaps), never a range-partitioned global sort."""
    from kafka_connect_minio_pipeline_spark.operators.graph import q_graph_jaccard
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import q_text_bpe_pairs

    for q in (q_graph_jaccard, q_text_bpe_pairs):
        df = q(spark, sf_dir)
        assert_in_plan(df, "TakeOrderedAndProject")
        assert_not_in_plan(df, "Exchange rangepartitioning")


def test_graph_wedge_joins_have_no_cartesian(spark, sf_dir):
    """Triangle/embeddedness enumeration must stay pure equi-joins —
    a cartesian or nested-loop anywhere means the canonical-orientation
    trick broke."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        q_graph_jaccard,
        q_graph_triangles,
    )

    for q in (q_graph_triangles, q_graph_jaccard):
        plan = formatted_plan(q(spark, sf_dir))
        assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_sketch_quantile_aggregates_before_window(spark, sf_dir):
    """The row-count-heavy phase must be a partial-aggregated groupBy;
    the quantile window runs over bin counts only (no window operator
    upstream of the first aggregation)."""
    from kafka_connect_minio_pipeline_spark.operators.sketches import q_sketch_quantile

    plan = formatted_plan(q_sketch_quantile(spark, sf_dir))
    tree = plan.split("\n\n")[0]  # tree section; nodes print top-down
    assert tree.count("HashAggregate") >= 2, tree
    # below the last (= earliest) aggregate there is only the scan side:
    # no Window touches pre-aggregation rows
    below_first_agg = tree.rsplit("HashAggregate", 1)[1]
    assert "Window" not in below_first_agg, tree


def test_mix_epochs_has_no_agg_or_join_shuffle(spark, sf_dir):
    """The epoch schedule is a map-only plan past the spread fan-out:
    exactly one exchange (the repartition), no aggregation, no join."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import q_corpus_mix_epochs

    tree = formatted_plan(q_corpus_mix_epochs(spark, sf_dir)).split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree and "HashAggregate" not in tree, tree


def test_pit_scd2_has_no_join_operator(spark, sf_dir):
    """The point-in-time SCD2 join must compile to union + windows — no
    physical join node anywhere (the naive interval join lives only in
    the DuckDB oracle)."""
    from kafka_connect_minio_pipeline_spark.operators.joins import q_join_pit_scd2

    plan = formatted_plan(q_join_pit_scd2(spark, sf_dir))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "NestedLoopJoin",
                 "ShuffledHashJoin"):
        assert node not in plan, plan
    assert "Window" in plan, plan


def test_median_twopass_pushes_bucket_range_to_scan(spark, sf_dir):
    """Pass 2 of the exact-median selection re-reads ONLY the target
    bucket: its min/max bounds must reach the parquet scan as pushed
    range filters, and the plan must contain no global Sort (the in-
    bucket selection is TakeOrdered)."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_median_twopass

    df = q_agg_median_twopass(spark, sf_dir)
    pf = pushed_filters(df)
    assert "GreaterThanOrEqual(l_extendedprice" in pf, pf
    assert "LessThan(l_extendedprice" in pf, pf
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_cross_corr_lags_are_broadcast(spark, sf_dir):
    """The lag fanout must be a broadcast over the bounded hour grid,
    never a shuffle of the grid, and the only hash exchanges are the
    hourly pre-aggregation + grid/bounds plumbing — nothing data-sized
    after the first collapse."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_cross_corr

    plan = formatted_plan(q_ts_cross_corr(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the raw events parquet is scanned ONCE (the hourly collapse);
    # bounds/grid/self-join all read the checkpointed hour series.
    # formatted plans list each node twice (tree + detail section).
    assert plan.count("Scan parquet") <= 2, plan
    assert plan.count("ExistingRDD") >= 1, plan


def test_ppm_decode_is_two_arrow_stages_one_exchange(spark, sf_dir):
    """Generate and decode are both Arrow-batched mapInPandas stages over
    the single compute-spread exchange — no extra shuffles, no
    row-at-a-time Python."""
    from kafka_connect_minio_pipeline_spark.operators.multimodal import (
        q_multimodal_ppm_decode,
    )

    plan = formatted_plan(q_multimodal_ppm_decode(spark, sf_dir))
    # formatted plans list each node twice (tree + detail section)
    assert plan.count("MapInPandas") == 4, plan
    assert plan.count("Exchange") == 2, plan
    assert "BatchEvalPython" not in plan, plan


def test_kmeans_centroids_broadcast_no_cartesian(spark, sf_dir):
    """The K-row centroid relation must reach the corpus as a broadcast
    (BroadcastNestedLoopJoin cross), never a CartesianProduct shuffle;
    no global sort anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.similarity import q_similarity_kmeans

    plan = formatted_plan(q_similarity_kmeans(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_collocations_topk_is_take_ordered(spark, sf_dir):
    """Top-k collocations must be TakeOrderedAndProject (per-partition
    heaps + driver merge), never a global sort."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_collocations

    plan = formatted_plan(q_text_collocations(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_dq_checks_fk_checks_are_anti_joins(spark, sf_dir):
    """Referential-integrity checks must compile to anti-joins (the
    dimension-parent one broadcast), not join+filter."""
    from kafka_connect_minio_pipeline_spark.pipeline.queries import (
        q_pipeline_dq_checks,
    )

    plan = formatted_plan(q_pipeline_dq_checks(spark, sf_dir))
    assert plan.count("LeftAnti") >= 2, plan
    assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_wav_decode_is_two_arrow_stages_one_exchange(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.multimodal import (
        q_multimodal_wav_decode,
    )

    plan = formatted_plan(q_multimodal_wav_decode(spark, sf_dir))
    # formatted plans list each node twice (tree + detail section)
    assert plan.count("MapInPandas") == 4, plan
    assert plan.count("Exchange") == 2, plan
    assert "BatchEvalPython" not in plan, plan


def test_rolling_slope_single_window_pass(spark, sf_dir):
    """All five co-moment frame sums share one window spec → Catalyst
    plans ONE Window node behind ONE exchange + ONE sort."""
    from kafka_connect_minio_pipeline_spark.operators.windows import (
        q_window_rolling_slope,
    )

    plan = formatted_plan(q_window_rolling_slope(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    # exactly one Window operator in the tree section
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Window") == 1, plan


def test_span_corruption_single_exchange_spine(spark, sf_dir):
    """The spread, both window passes, and the reassembly groupBy all
    hash on doc_id — one exchange for the whole construction."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_span_corruption,
    )

    plan = formatted_plan(q_llm_span_corruption(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan


def test_markov_single_userkey_window_then_bounded_aggs(spark, sf_dir):
    """The only data-sized ops are the user-keyed lead() window and the
    pair groupBy; the probability-normalizing window runs on the |types|²
    relation. No cartesian, no range partitioning anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_markov

    plan = formatted_plan(q_ts_markov(spark, sf_dir))
    assert plan.count("hashpartitioning") == 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 2, plan


def test_changepoint_scans_events_once(spark, sf_dir):
    """Everything after the hourly collapse runs on the checkpointed
    bounded hour grid: the raw events parquet never appears in the final
    plan (both join branches read the ExistingRDD checkpoint)."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_changepoint

    plan = formatted_plan(q_ts_changepoint(spark, sf_dir))
    assert plan.count("Scan parquet") == 0, plan
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interpolate_one_fill_window_two_exchanges(spark, sf_dir):
    """Both frame-opposed IGNORE NULLS fills share one partition+order →
    a single Window node; the whole plan carries two hash exchanges (grid
    groupBy + per-bucket last-observation window) with the obs side
    broadcast back onto the user-partitioned grid."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_interpolate

    plan = formatted_plan(q_ts_interpolate(spark, sf_dir))
    assert plan.count("hashpartitioning") == 2, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_entropy_is_two_hash_aggs_no_window(spark, sf_dir):
    """Entropy closes as two partial-aggregated hash aggregations (cat
    counts, per-key close) — no window, no sort aggregate, two exchanges."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_entropy

    plan = formatted_plan(q_agg_entropy(spark, sf_dir))
    assert plan.count("hashpartitioning") == 2, plan
    assert "SortAggregate" not in plan, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 0, plan


def test_zipf_rank_window_is_per_source_with_group_limit(spark, sf_dir):
    """The rank window partitions by source (never global) and the
    rank<=N filter is pushed as WindowGroupLimit — per-partition top-N
    before the shuffle; the fit groupBy reuses the window partitioning."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_zipf

    plan = formatted_plan(q_text_zipf(spark, sf_dir))
    assert "rangepartitioning" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 1, plan
    assert plan.count("hashpartitioning") <= 3, plan


def test_rolling_median_single_window_single_exchange(spark, sf_dir):
    """Frame materialization + sort + index all live inside one Window
    node behind one exchange — the same envelope as any per-user window."""
    from kafka_connect_minio_pipeline_spark.operators.windows import (
        q_window_rolling_median,
    )

    plan = formatted_plan(q_window_rolling_median(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 1, plan


def test_concurrency_running_sum_is_bucket_partitioned(spark, sf_dir):
    """The data-sized sweep-line prefix sum must run inside hour-bucket
    partitions (the token_budget decomposition); only the BOUNDED
    bucket-offsets relation may use an unpartitioned window, and offsets
    reach the deltas by broadcast."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_concurrency

    plan = formatted_plan(q_ts_concurrency(spark, sf_dir))
    assert "hashpartitioning(bucket" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_kcore_final_plan_reads_checkpoints_only(spark, sf_dir):
    """After the peel loop, the closing degree count joins checkpointed
    relations — the staged-edges parquet write plus per-round
    localCheckpoints mean no raw-table rescan in the final plan."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        q_graph_kcore,
    )

    plan = formatted_plan(q_graph_kcore(spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "Scan parquet lineitem" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_skewkurt_single_partial_agg_shuffle(spark, sf_dir):
    """All four power sums ride one partial-aggregated groupBy — a single
    exchange, no window, no sort aggregate."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_skewkurt

    plan = formatted_plan(q_agg_skewkurt(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert "SortAggregate" not in plan, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 0, plan


def test_cdc_merge_is_agg_plus_one_join(spark, sf_dir):
    """Last-change-per-key must be a hash aggregation (max_by struct,
    skew-immune), not a row_number window; then exactly one full-outer
    join against the snapshot."""
    from kafka_connect_minio_pipeline_spark.operators.joins import (
        q_join_cdc_merge,
    )

    plan = formatted_plan(q_join_cdc_merge(spark, sf_dir))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 0, plan
    assert plan.count("FullOuter") >= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_gini_window_and_agg_share_one_exchange(spark, sf_dir):
    """The per-series rank window and the co-moment groupBy hash on the
    same key — one exchange, no global sort."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_gini

    plan = formatted_plan(q_agg_gini(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_adamic_adar_topk_is_take_ordered_no_cartesian(spark, sf_dir):
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        q_graph_adamic_adar,
    )

    plan = formatted_plan(q_graph_adamic_adar(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pack_eval_budget_sweep_is_broadcast(spark, sf_dir):
    """The budget fanout must reach the corpus as a broadcast of the
    3-row literal relation — never a shuffle — and the per-(stratum,
    budget) prefix windows hash-partition (no global sort)."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_pack_eval,
    )

    plan = formatted_plan(q_llm_pack_eval(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_nearest_single_window_pass(spark, sf_dir):
    """Both as-of directions (backward last + forward first) share one
    (user, ts) exchange+sort — a single Window node, like join_asof."""
    from kafka_connect_minio_pipeline_spark.operators.joins import (
        q_join_asof_nearest,
    )

    plan = formatted_plan(q_join_asof_nearest(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 1, plan


def test_anomaly_seasonal_no_window_broadcast_dims(spark, sf_dir):
    """Cells and sigmas must reach the events as broadcasts; the whole
    plan carries no Window operator at all."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_anomaly_seasonal

    plan = formatted_plan(q_ts_anomaly_seasonal(spark, sf_dir))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("+- Window (") == 0, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_snaive_scans_events_once(spark, sf_dir):
    """Everything after the hourly collapse runs on the checkpointed
    bounded grid — the raw events parquet never appears in the plan."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_forecast_snaive

    plan = formatted_plan(q_ts_forecast_snaive(spark, sf_dir))
    assert plan.count("Scan parquet") == 0, plan
    assert "ExistingRDD" in plan, plan


def test_topk_share_single_exchange(spark, sf_dir):
    """Rank window and closing rollup hash on the segment key — one
    exchange, no join-back, no global sort."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_topk_share

    plan = formatted_plan(q_agg_topk_share(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_survival_curve_windows_are_bounded_only(spark, sf_dir):
    """The only unpartitioned window runs on the minute-bounded
    relation; the session totals reach it by broadcast."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries import q_ts_survival

    plan = formatted_plan(q_ts_survival(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_pair_scorer_broadcast_gated_by_session_budget(spark, sf_dir):
    """The adjacency broadcast is no longer an unconditional hint: auto
    mode broadcasts only when the O(|E|) payload fits the
    autoBroadcastJoinThreshold-scaled budget, and a session that
    DISABLES broadcast joins (threshold -1) must get a plan with no
    broadcast exchange anywhere — the wedge formulation."""
    from kafka_connect_minio_pipeline_spark.operators.graph import (
        _adjacency_fits_broadcast,
        edge_jaccard_topk,
        part_cooccurrence_edges,
    )

    edges = part_cooccurrence_edges(spark, sf_dir)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        assert _adjacency_fits_broadcast(edges)
        assert_in_plan(edge_jaccard_topk(edges), "BroadcastHashJoin")
        spark.conf.set(key, "-1")
        assert not _adjacency_fits_broadcast(edges)
        plan = formatted_plan(edge_jaccard_topk(edges))
        assert "Broadcast" not in plan, plan
    finally:
        spark.conf.set(key, old)


def test_weighted_sample_uses_window_group_limit(spark, sf_dir):
    """corpus_weighted_sample's rank-k filter must compile to Spark's
    WindowGroupLimit rewrite — per-partition partial top-k BEFORE the
    group exchange — so the shuffle carries k·partitions rows per
    source, never the corpus."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_weighted_sample,
    )

    plan = formatted_plan(q_corpus_weighted_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_poisson_bootstrap_partial_aggregates_replicates(spark, sf_dir):
    """The replicate groupBy must partial-aggregate (map-side combine
    over the ×B explode) and the shipdate filter must reach the scan."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_poisson_bootstrap

    df = q_agg_poisson_bootstrap(spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial" in plan.lower(), plan
    assert "l_shipdate" in pushed_filters(df)


def test_unigram_logprob_prunes_scan(spark, sf_dir):
    """The LM score reads only (doc_id, text) from documents — lang,
    source, n_chars must be pruned from the scan."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_unigram_logprob

    plan = formatted_plan(q_text_unigram_logprob(spark, sf_dir))
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" in read and "n_chars" not in read and "source" not in read, read


def test_bpe_apply_prunes_scan_and_broadcasts_vocab(spark, sf_dir):
    """The BPE encode pass must read only (doc_id, text) — never the
    lang/source/n_chars metadata — and join the vocabulary-sized
    segmentation table by broadcast, not sort-merge."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import q_text_bpe_apply

    df = q_text_bpe_apply(spark, sf_dir)
    plan = formatted_plan(df)
    schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert schemas and all(
        "lang" not in s and "source" not in s for s in schemas
    ), schemas
    assert_in_plan(df, "BroadcastHashJoin")
    assert_not_in_plan(df, "SortMergeJoin")


def test_bpe_fertility_lang_scan_is_metadata_only(spark, sf_dir):
    """The fertility report's lang lookup must come from a
    (doc_id, lang)-only scan — re-reading the wide text column for a
    metadata join is the classic pruning failure."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import q_text_bpe_fertility

    plan = formatted_plan(q_text_bpe_fertility(spark, sf_dir))
    schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    lang_scans = [s for s in schemas if "lang" in s]
    assert lang_scans and all("text" not in s for s in lang_scans), schemas


def test_ivf_assignment_is_broadcast_no_corpus_self_join(spark, sf_dir):
    """IVF cell assignment must broadcast the centroid relation (the
    corpus side never shuffles wider than its pre-combined rows) and the
    whole query must contain no sort-merge self-join of the corpus."""
    from kafka_connect_minio_pipeline_spark.operators.similarity import q_similarity_ann_ivf

    df = q_similarity_ann_ivf(spark, sf_dir)
    assert_in_plan(df, "BroadcastNestedLoopJoin")  # centroid crossJoin
    assert_not_in_plan(df, "SortMergeJoin")
    assert_not_in_plan(df, "CartesianProduct")


def test_pq_encode_is_broadcast_no_corpus_shuffle_join(spark, sf_dir):
    """PQ encode must broadcast the ≤ M·K-row codebook onto the exploded
    corpus sub-vectors (BroadcastHashJoin on sub) — never a sort-merge or
    cartesian corpus join — and the ADC search must additionally
    broadcast the per-query lookup table onto the code table."""
    from kafka_connect_minio_pipeline_spark.operators.similarity_pq import (
        q_embedding_pq,
        q_similarity_ann_adc,
    )

    for df in (q_embedding_pq(spark, sf_dir), q_similarity_ann_adc(spark, sf_dir)):
        assert_in_plan(df, "BroadcastHashJoin")
        assert_not_in_plan(df, "SortMergeJoin")
        assert_not_in_plan(df, "CartesianProduct")


def test_ivfpq_search_is_all_broadcast(spark, sf_dir):
    """The composed IVF-PQ search: the only corpus-sized relation is the
    index build (centroid crossJoin = BroadcastNestedLoopJoin, codebook
    join = BroadcastHashJoin); probes and the ADC lookup table broadcast
    onto it — never a sort-merge or unbounded cartesian join anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.similarity_pq import q_similarity_ann_ivfpq

    from kafka_connect_minio_pipeline_spark.operators.similarity_pq import q_similarity_ann_ivfpq_residual

    for df in (
        q_similarity_ann_ivfpq(spark, sf_dir),
        q_similarity_ann_ivfpq_residual(spark, sf_dir),
    ):
        assert_in_plan(df, "BroadcastNestedLoopJoin")  # ≤16-row centroid crossJoin
        assert_in_plan(df, "BroadcastHashJoin")
        assert_not_in_plan(df, "SortMergeJoin")
        assert_not_in_plan(df, "CartesianProduct")


def test_gopher_rules_is_pure_narrow_map(spark, sf_dir):
    """The Gopher gate is a per-row projection: its plan must contain NO
    exchange of any kind (the 100 TB cost is exactly one pruned scan of
    (doc_id, text)) — except the engine's compute-spread repartition of
    the compressed text, which is round-robin, not a hash shuffle of
    derived keys; and no join at all."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_gopher_rules

    df = q_text_gopher_rules(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "text" in read and "n_chars" not in read and "source" not in read, read


def test_substring_dedup_shuffles_hashes_not_grams(spark, sf_dir):
    """The ExactSubstr pass must collapse each k-gram to its 60-bit hash
    BEFORE the aggregation shuffle — the Exchange input must carry the
    long hash column, never the gram string — and contain no cartesian
    or sort-merge self-join of the exploded corpus."""
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        q_dedup_substring,
    )

    df = q_dedup_substring(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the gram substring expression must be consumed by the hash (conv/md5)
    # inside the same projection — i.e. appear before any Exchange consumes
    # it; the grouping key is the derived long, so no Exchange row carries
    # a 24-char string key
    assert "substring" in plan and "md5" in plan, plan


def test_semantic_dedup_broadcasts_centroids_bounded_pairs(spark, sf_dir):
    """SemDeDup must broadcast the K-row centroid relation for the
    assignment pass (BroadcastNestedLoopJoin from the crossJoin), and the
    within-cluster pair stage must be an equi-join on cluster — never a
    cartesian product of the corpus."""
    from kafka_connect_minio_pipeline_spark.operators.dedup import (
        q_dedup_semantic,
    )

    df = q_dedup_semantic(spark, sf_dir)
    assert_in_plan(df, "BroadcastNestedLoopJoin")  # centroid crossJoin
    assert_not_in_plan(df, "CartesianProduct")


def test_dsir_joins_are_broadcast_sized(spark, sf_dir):
    """DSIR's feature tables are <= 64 rows: every join back onto the
    corpus-sized relation must be a broadcast, never sort-merge; and the
    scan must prune to (doc_id, text, lang)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_dsir,
    )

    df = q_corpus_dsir(spark, sf_dir)
    assert_in_plan(df, "BroadcastHashJoin")
    assert_not_in_plan(df, "SortMergeJoin")
    plan = formatted_plan(df)
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "n_chars" not in read and "source" not in read, read


def test_c4_rules_has_no_join(spark, sf_dir):
    """C4's doc-level flags ride the exploded lines via first() — the
    plan must contain NO join of any kind (one pruned scan, one
    explode, one groupBy; the 100 TB cost is a single text read)."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_c4_rules

    plan = formatted_plan(q_text_c4_rules(spark, sf_dir))
    assert "Join" not in plan, plan


def test_m4_single_series_shuffle_no_join(spark, sf_dir):
    """M4 is windows-only: no join anywhere, and every exchange hashes
    on the series key (user_id) — the four role ranks share the
    (user, bucket) partitioning."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_downsample_m4

    plan = formatted_plan(q_ts_downsample_m4(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "hashpartitioning(user_id" in plan, plan


def test_min_price_supplier_single_fact_pass(spark, sf_dir):
    """The Q2-style decorrelated MIN must be the window formulation:
    the part prune broadcasts onto ONE lineitem scan, the per-part MIN
    and the achieving-row filter share a single l_partkey exchange
    (never a groupBy + join-back that scans the fact twice), the size
    predicate reaches the part scan, and supplier attributes broadcast."""
    df = joins.q_join_min_price_supplier(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("hashpartitioning(l_partkey") == 1, plan
    assert "Window" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "LessThanOrEqual(p_size,5)" in plan, plan
    # exactly one lineitem scan
    assert plan.count("lineitem.parquet") == 1, plan


def test_untapped_customers_anti_join_shape(spark, sf_dir):
    """Q22 analog: the scalar average arrives as a broadcast one-row
    relation (BroadcastNestedLoopJoin is the 1-row cross, not a data
    cartesian), the NOT EXISTS compiles to a LeftAnti join, and the
    priority filter is pushed into the orders scan."""
    df = joins.q_join_untapped_customers(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan, plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_small_qty_revenue_single_fact_pass(spark, sf_dir):
    """Q17 analog: the per-part average threshold rides ONE l_partkey
    window exchange (sum+count as unordered window aggregates) — the
    fact is scanned once, never the classic aggregate-then-rejoin
    double scan; the brand dimension broadcasts."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_small_qty_revenue

    plan = formatted_plan(q_agg_small_qty_revenue(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("hashpartitioning(l_partkey") == 1, plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan


def test_large_orders_aggregates_below_joins(spark, sf_dir):
    """Q18 analog: lineitem must collapse to per-order quantity sums
    (partial agg below the exchange) and the HAVING filter must apply
    to the rollup BEFORE any join touches orders/customer."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_large_orders

    plan = formatted_plan(q_agg_large_orders(spark, sf_dir))
    assert "partial_sum(cast(l_quantity" in plan, plan
    assert "hashpartitioning(l_orderkey" in plan, plan
    # the heavy-order filter sits on the aggregate output, pre-join
    assert "(total_qty" in plan and "> 250.0" in plan, plan


def test_bollinger_single_window_pass(spark, sf_dir):
    """Bollinger bands: count/sum/sum-of-squares frame aggregates must
    share ONE Window operator over one user_id exchange (a withColumn
    chain would compile to five Window passes), with no join."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_bollinger

    plan = formatted_plan(q_ts_bollinger(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert plan.count("+- Window") == 1, plan
    assert "Join" not in plan, plan


def test_rsi_shares_one_exchange(spark, sf_dir):
    """RSI: the delta lag and the two frame sums use the same
    (user_id | ts, event_id) spec — two Window operators over ONE
    exchange, no join."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_rsi

    plan = formatted_plan(q_ts_rsi(spark, sf_dir))
    assert plan.count("hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_kn_perplexity_single_scan_after_model_cut(spark, sf_dir):
    """KN bigram LM: the final plan must read documents ONCE (the
    scoring pass) — the model side reads the checkpointed
    vocabulary-bounded type relation, never re-tokenizing the corpus
    (uncut, the tokenization re-evaluated five times)."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_kn_perplexity

    plan = formatted_plan(q_text_kn_perplexity(spark, sf_dir))
    assert plan.count("documents.parquet") <= 1, plan


def test_order_count_dist_aggregates_below_join(spark, sf_dir):
    """Q13 analog: orders must collapse to per-custkey counts BELOW the
    left join (partial_count under the join, priority filter pushed to
    the orders scan), the customer scan prunes to the key column alone,
    and the zero-order customers survive via LeftOuter."""
    plan = formatted_plan(joins.q_join_order_count_dist(spark, sf_dir))
    assert "LeftOuter" in plan, plan
    assert "partial_count" in plan, plan
    assert "NOT (o_orderpriority" in plan, plan
    assert plan.count("orders.parquet") == 1, plan
    assert plan.count("customer.parquet") == 1, plan


def test_waiting_supplier_single_orderkey_exchange(spark, sf_dir):
    """Q21 analog: lineitem collapses to the (order, supplier,
    max_shipdate) profile below every join (partial_max), the per-order
    EXISTS/NOT-EXISTS counts share ONE Window over ONE hash(l_orderkey)
    exchange, the status filter reaches the orders scan, and the
    top-100 is TakeOrdered, never a global Sort."""
    import re

    plan = formatted_plan(joins.q_join_waiting_supplier(spark, sf_dir))
    assert "partial_max(l_shipdate" in plan, plan
    assert len(re.findall(r"hashpartitioning\(l_orderkey#\d+L, \d+\)", plan)) == 1, plan
    assert plan.count("+- Window") == 1, plan
    assert "EqualTo(o_orderstatus,F)" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_kn_quality_single_scan_after_model_cut(spark, sf_dir):
    """Target-trained KN: same cost contract as the self-trained
    operator — the final plan reads documents ONCE (the scoring pass);
    the target model side reads the checkpointed vocabulary-bounded
    type relation, never re-tokenizing the corpus."""
    from kafka_connect_minio_pipeline_spark.operators.text import q_text_kn_quality

    plan = formatted_plan(q_text_kn_quality(spark, sf_dir))
    assert plan.count("documents.parquet") <= 1, plan


def test_disjunctive_revenue_pushes_implied_hulls(spark, sf_dir):
    """Q19 analog: Catalyst cannot derive per-side filters from the
    cross-side OR, so the operator pushes the implied hulls explicitly —
    the quantity hull must reach the lineitem scan and the brand IN-set
    + size hull the part scan (PushedFilters), with part broadcast."""
    plan = formatted_plan(joins.q_join_disjunctive_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    li = next(ln for ln in pushed if "quantity" in ln)
    assert "GreaterThanOrEqual(l_quantity,1.0)" in li, li
    assert "LessThanOrEqual(l_quantity,35.0)" in li, li
    pt = next(ln for ln in pushed if "p_brand" in ln)
    assert "In(p_brand, [Brand#1,Brand#2,Brand#3])" in pt, pt
    assert "LessThanOrEqual(p_size,40)" in pt, pt


def test_shipping_priority_shape(spark, sf_dir):
    """Q3 analog: both date filters reach their scans, the post-date
    lineitem slice partial-aggregates per orderkey BELOW the join, the
    segment prune is a semi join, top-10 is TakeOrdered."""
    plan = formatted_plan(joins.q_join_shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_sum" in plan, plan
    assert "LeftSemi" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThan(l_shipdate" in ln for ln in pushed), pushed
    assert any("LessThan(o_orderdate" in ln for ln in pushed), pushed
    assert plan.count("lineitem.parquet") == 1, plan


def test_returned_items_shape(spark, sf_dir):
    """Q10 analog: the returnflag filter reaches the lineitem scan, the
    'R' slice partial-aggregates per orderkey below the orders join,
    the per-customer rollup happens before customer attributes join,
    nation broadcasts, top-20 is TakeOrdered."""
    plan = formatted_plan(joins.q_join_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(l_returnflag,R)" in ln for ln in pushed), pushed
    assert "partial_sum" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_promo_share_single_fold(spark, sf_dir):
    """Q14 analog: month filter pushed to the lineitem scan, part
    broadcast, ONE partial-aggregated fold to a single row — no
    hash-partitioned exchange anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_promo_share

    plan = formatted_plan(q_agg_promo_share(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(l_shipdate" in ln for ln in pushed), pushed


def test_skyline_is_windowed_linear_with_broadcast_back(spark, sf_dir):
    """Skyline must be the windowed-linear rewrite, never the quadratic
    self-join: one groupBy exchange on price, the prefix-max window over
    the domain-sized rollup, and the tiny frontier BROADCAST back onto
    the base scan. No SortMergeJoin, no cartesian anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_skyline

    plan = formatted_plan(q_agg_skyline(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan
    # base relation scanned exactly twice: rollup side + probe side
    assert plan.count("part.parquet") == 2, plan


def test_column_profile_is_one_pass(spark, sf_dir):
    """The profile must compute every per-column metric from ONE scan
    (the Deequ analyzer fusion): exactly one parquet scan, the
    multi-count-distinct Expand above it, partial aggregation below the
    exchange, and the per-column rows generated driver-side from the
    single aggregate row (Generate/stack), never a per-column union of
    scans."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates import q_agg_column_profile

    plan = formatted_plan(q_agg_column_profile(spark, sf_dir))
    assert plan.count("orders.parquet") == 1, plan
    assert "Expand" in plan, plan
    assert "partial_count" in plan, plan
    assert "Union" not in plan, plan


def test_copurchase_pairs_from_checkpointed_baskets(spark, sf_dir):
    """The basket rollup has four consumers — it must be checkpointed
    (ExistingRDD in all four places) so lineitem is scanned ZERO times
    in the final plan (once, at checkpoint time); marginals and the
    basket total broadcast back onto the pair-sized result."""
    plan = formatted_plan(joins.q_join_copurchase_lift(spark, sf_dir))
    assert "lineitem.parquet" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert plan.count("BroadcastExchange") >= 3, plan


def test_theil_sen_single_corpus_pass(spark, sf_dir):
    """The daily rollup must be checkpointed (both self-join sides read
    the ExistingRDD — events never scanned twice), the pair join
    broadcasts the day-level relation, and rank selection rides one
    type-keyed exchange."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_theil_sen

    plan = formatted_plan(q_ts_theil_sen(spark, sf_dir))
    assert "events.parquet" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_attribution_single_pass_two_scans(spark, sf_dir):
    """Both attribution models must come out of ONE candidate pass:
    exactly two type-pruned event scans (purchases + touches, each with
    the type predicate in PushedFilters), both rank directions on one
    pid exchange, and the model fan-out as Generate (explode) — never a
    Union re-deriving the join per model."""
    from kafka_connect_minio_pipeline_spark.operators.timeseries_analytics import q_ts_attribution

    plan = formatted_plan(q_ts_attribution(spark, sf_dir))
    assert plan.count("events.parquet") == 2, plan
    assert "Union" not in plan, plan
    assert "Generate" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(event_type,purchase)" in ln for ln in pushed), pushed
    assert any("In(event_type, [click,view])" in ln for ln in pushed), pushed
    assert plan.count("hashpartitioning(pid") == 1, plan


def test_cuped_two_level_single_scan(spark, sf_dir):
    """CUPED must be two stacked partial-aggregated groupBys over ONE
    events scan (user rollup -> scalar co-moments) — no self-join, no
    second scan, no window."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import q_agg_cuped

    plan = formatted_plan(q_agg_cuped(spark, sf_dir))
    assert plan.count("events.parquet") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_srm_single_scan_single_exchange(spark, sf_dir):
    """SRM is a distinct-users rollup folded to one row: one events
    scan, one user_id exchange, no join/window."""
    from kafka_connect_minio_pipeline_spark.operators.aggregates_stats import q_agg_srm

    plan = formatted_plan(q_agg_srm(spark, sf_dir))
    assert plan.count("events.parquet") == 1, plan
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_classifier_serving_is_broadcast_join_no_python(spark, sf_dir):
    """The trained gate's serving plan: z-scored feature grid (staged
    checkpoint) broadcast-joined against the (CLF_DIM+2)-row weight
    relation, two-level hash aggregate, zero Python boundary — the
    whole classifier is JVM-side dataflow."""
    from kafka_connect_minio_pipeline_spark.operators.text_classifier import q_text_quality_classifier

    plan = formatted_plan(q_text_quality_classifier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


def test_decon_semantic_reads_staged_assignment_once(spark, sf_dir):
    """Semantic decontamination stages the k-means assignment once
    (localCheckpoint — the written IVF assignment table at index scale):
    the final plan must read ONLY the staged relation (no re-derivation
    of the k-means subtree, which un-staged measured ~15 redundant
    embedding scans), broadcast the benchmark-sized eval side, and
    contain no cartesian product."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_decontaminate_semantic,
    )

    plan = formatted_plan(q_llm_decontaminate_semantic(spark, sf_dir))
    assert plan.count("Scan parquet") == 0, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stream_dedup_minhash_finisher_shape(spark, sf_dir):
    """The stream gate's finisher: batch band claims joined against the
    memory-sink bucket minima, one per-doc aggregate, no Python
    boundary anywhere (the signatures are array_min over integer
    transforms)."""
    from kafka_connect_minio_pipeline_spark.streaming.queries import (
        q_stream_dedup_minhash,
    )

    plan = formatted_plan(q_stream_dedup_minhash(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "documents.parquet" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_url_filter_is_metadata_only_scan(spark, sf_dir):
    """Domain curation must never read the wide text column (the whole
    point of a pre-text gate): the parquet ReadSchema carries only
    doc_id/lang/source, the vocabulary-sized rates relation broadcasts
    back, and there is no Python boundary, window, or sort-merge join
    anywhere (the per-domain cap is a hash threshold, not a
    row_number)."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_url_filter,
    )

    plan = formatted_plan(q_corpus_url_filter(spark, sf_dir))
    for rs in plan.split("ReadSchema: ")[1:]:
        head = rs.split("\n")[0]
        assert "text" not in head, head
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_decon_sweep_is_single_aggregate_over_scored(spark, sf_dir):
    """The τ sweep must cost ONE pass over the scored relation: a single
    aggregate (nine conditional sums) unpivoted by generate — never a
    per-τ re-score (9 exchanges) or a τ×corpus explode before the
    aggregate."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_decon_semantic_sweep,
    )

    plan = formatted_plan(q_llm_decon_semantic_sweep(spark, sf_dir))
    # the stack() unpivot runs AFTER the single-row aggregate (tree form
    # "+- Generate (n)" — formatted plans also repeat each node in the
    # details section, so count the tree occurrence only)
    assert plan.count(" Generate (") == 1, plan
    assert "CartesianProduct" not in plan, plan
    # the sweep adds ONE aggregation pair (partial+final) on top of the
    # scoring subtree's own max-cos pair — never nine per-τ aggregates
    # (tree-form count; details repeat each node)
    assert plan.count(" HashAggregate (") <= 4, plan


def test_unigram_family_plans_are_jvm_side(spark, sf_dir):
    """Both unigram queries serve from the session-cached model (staged
    LogicalRDD scans — no parquet re-read of the corpus inside the
    vocabulary-sized EM relations) with zero Python boundary; segment's
    Viterbi argmax is the one window, partitioned by word (never a
    global sort over the corpus)."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        q_text_unigram_segment,
        q_text_unigram_tokenizer,
    )

    rep = formatted_plan(q_text_unigram_tokenizer(spark, sf_dir))
    assert "BatchEvalPython" not in rep and "ArrowEvalPython" not in rep, rep
    assert "Scan parquet" not in rep, rep  # model relations are staged
    seg = formatted_plan(q_text_unigram_segment(spark, sf_dir))
    assert "BatchEvalPython" not in seg and "ArrowEvalPython" not in seg, seg
    assert "CartesianProduct" not in seg, seg


def test_stream_decontaminate_gate_shapes(spark, sf_dir):
    """The decon gate's two halves (VERDICT r13 item 5): the batch twin
    (identical expressions — the stream shares SQL_DECONTAMINATE
    verbatim) probes the corpus against a BROADCAST benchmark-gram
    relation with no Python boundary and no cartesian anywhere; the
    stream finisher joins the memory-sink counts back onto the corpus
    spine, same constraints."""
    from kafka_connect_minio_pipeline_spark.operators.llmdata import (
        q_llm_decontaminate,
    )
    from kafka_connect_minio_pipeline_spark.streaming.queries import (
        q_stream_decontaminate,
    )

    batch = formatted_plan(q_llm_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in batch, batch
    assert "BatchEvalPython" not in batch and "ArrowEvalPython" not in batch
    assert "CartesianProduct" not in batch, batch
    fin = formatted_plan(q_stream_decontaminate(spark, sf_dir))
    assert "documents.parquet" in fin, fin
    assert "BatchEvalPython" not in fin and "ArrowEvalPython" not in fin
    assert "CartesianProduct" not in fin, fin


def test_snapshot_diff_single_fullouter_join(spark, sf_dir):
    """The churn report classifies every doc with ONE full-outer join on
    doc_id (VERDICT r13 item 5): exactly one FullOuter node, one
    partial+final aggregate pair for the per-source rollup, two scans
    of the corpus (one per snapshot side), nothing Python-side."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_snapshot_diff,
    )

    plan = formatted_plan(q_corpus_snapshot_diff(spark, sf_dir))
    # formatted plans repeat each node in the details section — tree +
    # details = 2 occurrences per physical node
    assert plan.count("FullOuter") == 2, plan
    assert plan.count(" HashAggregate (") == 2, plan
    assert plan.count("Scan parquet") == 4, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan


def test_refresh_pipeline_gates_are_delta_sized(spark, sf_dir):
    """The crawl-refresh composition re-scores ONLY the delta: every
    gate subtree (quality, both dedup layers, decon grams) reads a
    staged relation (Scan ExistingRDD — the checkpointed delta and the
    two shingle-set stagings, of which the BASE one is the maintained
    ingest-time fingerprint/signature index at scale), and the corpus
    parquet appears exactly TWICE in the final plan — the new-snapshot
    per-source counts and the benchmark gram build. An unchanged doc's
    text is never re-tokenized inside the serving plan, and the banded
    MinHash candidate join is an equi join, never a pair scan."""
    from kafka_connect_minio_pipeline_spark.operators.corpus import (
        q_corpus_refresh_pipeline,
    )

    plan = formatted_plan(q_corpus_refresh_pipeline(spark, sf_dir))
    assert plan.count("Scan parquet") == 4, plan  # 2 nodes x (tree+details)
    assert "Scan ExistingRDD" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_audio_fingerprint_band_join_is_equi(spark, sf_dir):
    """Audio near-dup pairs ride the banded-LSH equi join — never a
    nested-loop/cartesian pair scan — with the codec+fingerprint fused
    into Arrow-batched MapInPandas stages (the only Python boundary)."""
    from kafka_connect_minio_pipeline_spark.operators.multimodal import (
        q_multimodal_audio_fingerprint,
    )

    plan = formatted_plan(q_multimodal_audio_fingerprint(spark, sf_dir))
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan  # Arrow-batched only


def test_unigram_prune_trajectory_is_staged_vocab_bounded(spark, sf_dir):
    """The prune trajectory serves from the session-cached model tuple:
    zero parquet scans (the corpus was touched once at train time,
    never per read), zero Python, no window over corpus-sized input."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        q_text_unigram_prune,
    )

    plan = formatted_plan(q_text_unigram_prune(spark, sf_dir))
    assert "Scan parquet" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan


def test_tokenizer_ab_scan_budget(spark, sf_dir):
    """The four-arm A/B card pays a FIXED corpus-scan budget — five
    parquet scans total (n_corpus_tokens, the BPE train word-collapse,
    the BPE encode spine, the shared-domain word collapse, the unigram
    doc-word rollup; the unigram model itself is staged, Scan
    ExistingRDD) — and never a per-merge or per-round corpus re-read;
    no Python boundary anywhere."""
    from kafka_connect_minio_pipeline_spark.operators.text_tokenizers import (
        q_text_tokenizer_ab,
    )

    plan = formatted_plan(q_text_tokenizer_ab(spark, sf_dir))
    assert plan.count("Scan parquet") == 10, plan  # 5 nodes x (tree+details)
    assert "Scan ExistingRDD" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan


def test_filter_above_barrier_blocks_pushdown(spark):
    """The optimizer barrier (functions/barrier.py) must keep a
    threshold filter ABOVE the projection that computes its input: the
    optimized plan contains exactly ONE array_intersect (a plain filter
    gets pushed into the join condition and evaluates it 3x). Pins the
    undocumented Catalyst behavior the barrier relies on so a Spark
    upgrade that re-enables the pushdown fails loudly (ADVICE r14)."""
    import pytest

    from kafka_connect_minio_pipeline_spark.functions.barrier import filter_above

    docs = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["b", "c", "d"]), (3, ["x", "y"])],
        "doc_id long, toks array<string>",
    )
    pairs = docs.alias("l").join(
        docs.alias("r"), F.col("l.doc_id") < F.col("r.doc_id")
    )
    scored = pairs.select(
        F.col("l.doc_id").alias("d1"),
        F.col("r.doc_id").alias("d2"),
        (
            F.size(F.array_intersect("l.toks", "r.toks"))
            / F.size(F.array_union("l.toks", "r.toks"))
        ).alias("jac"),
    )
    plain = scored.filter(F.col("jac") >= 0.5)
    barred = filter_above(scored, F.col("jac") >= 0.5)

    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    barred_plan = barred._jdf.queryExecution().optimizedPlan().toString()
    assert plain_plan.count("array_intersect") > 1, plain_plan  # the disease
    assert barred_plan.count("array_intersect") == 1, barred_plan  # the cure

    # identical rows either way — the barrier is semantics-free
    assert sorted(map(tuple, barred.collect())) == sorted(map(tuple, plain.collect()))

    # a pre-existing barrier column must be rejected, not silently clobbered
    with pytest.raises(ValueError, match="_plan_barrier"):
        filter_above(scored.withColumn("_plan_barrier", F.lit(1)), F.col("jac") >= 0.5)
