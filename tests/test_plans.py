"""Physical-plan quality gates — the 100 TB discipline, asserted.

A query that is correct but plans a cartesian product, skips predicate
pushdown, or drags Python into the row path will pass the oracle check and
then fall over at scale; these tests pin the plan shape instead.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.plans import (
    executed_plan,
    has_broadcast_join,
    has_cartesian_product,
    has_python_eval,
    pushed_filters,
    read_schema,
    unpartitioned_windows,
)

QUERIES = entrymod.queries()

# queries that deliberately cross into Python (Arrow-batched mapInPandas
# / grouped applyInPandas)
PYTHON_PATH_OK = {"multimodal_meta", "frame_sample", "user_value_mad",
                  "media_features", "payload_thumbnail",
                  "image_decode_stats", "audio_decode_stats",
                  "gif_decode_stats", "video_frame_stats",
                  "embedding_topk_pandas", "media_decode_stats",
                  "image_phash", "image_phash_neardup",  # decoded-pixel
                                       # sketch: real codec in the batch
                  "hnsw_search",       # per-shard graph build/search is
                                       # numpy inside one applyInPandas
                  "hnsw_search_persisted",   # cogroup search over the
                                             # persisted adjacency
                  "doc_chunks_udtf",   # UDTF API demo; JVM doc_chunks
                                       # is the scale path
                  "skyline_pareto"}    # partition-local skyline is
                                       # vectorized numpy per Arrow batch
# tiny-side cross joins (broadcast) are fine; a plain cartesian is not.
# lsh_recall_eval embeds the exact anchor as its TRUTH side (audit-only
# query, same quarantine).
CARTESIAN_OK = {"embedding_neardup_exact", "embedding_neardup",
                "lsh_recall_eval"}
# unpartitioned (global-sort) Window nodes allowed ONLY where the frame
# is calendar-bounded (one row per day/hour/month — grows with the
# calendar, not the data). Mirrored in tools/explain_all.py
# (GLOBAL_WINDOW_OK); VERDICT r5 what's-wrong #4.
GLOBAL_WINDOW_OK = {"user_growth_accounting", "orders_monthly_growth",
                    "daily_revenue_trailing", "hourly_burst_detection"}


def q(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def test_q6_pushes_filters_to_scan(spark, sf_dir):
    filters = pushed_filters(q(spark, sf_dir, "q6_forecast_revenue"))
    assert any("l_shipdate" in f for f in filters)
    assert any("l_quantity" in f for f in filters)


def test_q6_prunes_columns(spark, sf_dir):
    schemas = read_schema(q(spark, sf_dir, "q6_forecast_revenue"))
    assert schemas, "no scan found"
    joined = " ".join(schemas)
    # only the 4 referenced columns are read, not all 11
    assert "l_orderkey" not in joined
    assert "l_returnflag" not in joined
    assert "l_extendedprice" in joined


def test_q5_broadcasts_dimension_tables(spark, sf_dir):
    assert has_broadcast_join(q(spark, sf_dir, "q5_local_supplier_volume"))


def test_no_cartesian_products_anywhere(spark, sf_dir):
    for name in QUERIES:
        df = q(spark, sf_dir, name)
        if has_cartesian_product(df):
            assert name in CARTESIAN_OK, f"{name} plans a CartesianProduct"


def test_no_unpartitioned_data_windows(spark, sf_dir):
    """No query may plan a Window with an empty partition spec over
    data-cardinality rows — that is a single-task global sort at 100x
    (the round-5 customer_value_quartiles class). Calendar-bounded
    spines are the only whitelisted frames, and the whitelist must be
    EXACT: an entry whose query no longer plans a global window is
    stale cover a future regression could hide under."""
    flagged = set()
    for name in QUERIES:
        gw = unpartitioned_windows(q(spark, sf_dir, name))
        if gw:
            flagged.add(name)
            assert name in GLOBAL_WINDOW_OK, \
                f"{name} plans an unpartitioned data window: {gw[0]}"
    assert flagged == GLOBAL_WINDOW_OK, (
        f"stale whitelist entries: {GLOBAL_WINDOW_OK - flagged}")


def test_mr_wc_stays_jvm_side(spark, sf_dir):
    plan = executed_plan(q(spark, sf_dir, "mr_wc"))
    assert "BatchEvalPython" not in plan
    # AQE shows the pre-execution plan; JVM hash aggregation is the marker
    assert "HashAggregate" in plan


def test_queries_avoid_python_row_path(spark, sf_dir):
    for name in QUERIES:
        if name in PYTHON_PATH_OK:
            continue
        assert not has_python_eval(q(spark, sf_dir, name)), \
            f"{name} has a Python row path"


def test_asof_join_is_union_merge_not_join(spark, sf_dir):
    """The as-of join must be the union-merge plan: no join operator at
    all, just exchanges + window sort."""
    plan = executed_plan(q(spark, sf_dir, "asof_join_orders"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_embedding_topk_broadcasts_queries(spark, sf_dir):
    assert has_broadcast_join(q(spark, sf_dir, "embedding_topk"))


def test_doc_chunks_is_shuffle_free(spark, sf_dir):
    assert "Exchange" not in executed_plan(q(spark, sf_dir, "doc_chunks"))


def test_scans_read_only_needed_document_columns(spark, sf_dir):
    """mr_wc projects documents down to the text column at the scan."""
    schemas = read_schema(q(spark, sf_dir, "mr_wc"))
    joined = " ".join(schemas)
    assert "text" in joined and "lang" not in joined


def test_q7_broadcasts_both_nation_lookups(spark, sf_dir):
    plan = executed_plan(q(spark, sf_dir, "q7_nation_volume"))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q15_threshold_is_broadcast_not_shuffled(spark, sf_dir):
    assert has_broadcast_join(q(spark, sf_dir, "q15_top_supplier"))


def test_q2_min_decorrelates_into_one_partitioned_window(spark, sf_dir):
    """Q2's correlated MIN must be ONE p_partkey-partitioned window
    over the regional candidates — not a second aggregate-and-join
    pass, and never an unpartitioned (single-task) sort."""
    df = q(spark, sf_dir, "q2_min_cost_supplier")
    plan = executed_plan(df)
    assert plan.count("Window") == 1, plan
    assert not unpartitioned_windows(df)
    assert not has_cartesian_product(df)


def test_q20_semi_joins_the_supplier_dim(spark, sf_dir):
    """Q20's dominant-supplier set must reach the supplier dim as a
    SEMI join (probe side |suppliers|, never a fan-out), with the
    per-part total as a partitioned window over aggregated pairs."""
    df = q(spark, sf_dir, "q20_dominant_suppliers")
    plan = executed_plan(df)
    assert "LeftSemi" in plan, plan
    assert plan.count("Window") == 1, plan
    assert not unpartitioned_windows(df)


def test_stratified_sample_is_broadcast_no_shuffle(spark, sf_dir):
    """Rates ride a broadcast dim: scan -> broadcast join -> filter,
    zero data shuffles."""
    df = q(spark, sf_dir, "stratified_sample")
    assert has_broadcast_join(df)
    plan = executed_plan(df)
    assert plan.count("Exchange") == plan.count("BroadcastExchange"), plan


def test_source_quota_cap_is_two_phase_topk(spark, sf_dir):
    """Salted phase-1 + re-rank phase-2: exactly two data shuffles
    ((source, salt) then (source)) and no global sort."""
    plan = executed_plan(q(spark, sf_dir, "source_quota_cap"))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 2, plan


def test_latest_event_per_user_is_single_shuffle(spark, sf_dir):
    """Latest-per-key must be one shuffle by user + window, nothing
    more (the fan_out repartition of heavy text ops doesn't apply to
    events)."""
    plan = executed_plan(q(spark, sf_dir, "latest_event_per_user"))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan




def test_q16_broadcasts_part_and_supplier_sides(spark, sf_dir):
    """The filtered part dim and the excluded-supplier anti join must
    both be broadcast — only the distinct (partkey, suppkey) pairs may
    shuffle."""
    plan = executed_plan(q(spark, sf_dir, "q16_parts_supplier_relationship"))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_pack_sequences_is_single_shuffle(spark, sf_dir):
    """The packing prefix sum is exactly one shuffle (window by
    source); the assignment arithmetic adds nothing."""
    plan = executed_plan(q(spark, sf_dir, "pack_sequences"))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan


def test_training_shuffle_is_single_shuffle_no_global_sort(spark, sf_dir):
    """Sharded shuffle: one exchange by shard, per-shard window sort —
    never a global range sort."""
    plan = executed_plan(q(spark, sf_dir, "training_shuffle"))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_bigram_pmi_tokenizes_corpus_once(spark, sf_dir, monkeypatch):
    """Both n-gram orders must derive from ONE staged (persisted)
    tokenize projection — the unigram pass previously re-ran the full
    scan + tokenize. tokenize() is a plan-build-time Column constructor,
    so counting its invocations pins the number of tokenize subtrees."""
    from mit_6_5840_mapreduce_spark.operators import corpus

    calls = {"n": 0}
    real = corpus.tokenize

    def counting(col):
        calls["n"] += 1
        return real(col)

    monkeypatch.setattr(corpus, "tokenize", counting)
    corpus.bigram_pmi(spark, sf_dir)
    assert calls["n"] == 1, f"tokenize built {calls['n']} subtrees"


def test_bloom_bits_ride_broadcast(spark, sf_dir):
    """The Bloom bit set must reach the probe side as a broadcast —
    the whole point of the runtime-filter pattern is that the probe
    never shuffles."""
    assert has_broadcast_join(q(spark, sf_dir, "bloom_prune_join"))


def test_q9_pushes_part_filter_and_broadcasts_nation(spark, sf_dir):
    """The p_name predicate must prune the part scan, and the
    constant-size nation dim must be broadcast."""
    df = q(spark, sf_dir, "q9_product_type_profit")
    assert any("p_name" in f for f in pushed_filters(df))
    assert has_broadcast_join(df)


def test_mix_rates_ride_broadcast(spark, sf_dir):
    """temperature_resample's per-source rate table joins the corpus as
    a broadcast dim — the corpus itself never shuffles for the join."""
    assert has_broadcast_join(q(spark, sf_dir, "temperature_resample"))
