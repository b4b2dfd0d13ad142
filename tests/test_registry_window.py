"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round. Round 5 clears the certification backlog (VERDICT
r4 item 1): the sentinel set stays in-window every round, ALL 41
queries that had never had a driver CORRECTNESS row rotate in
(tools/window_plan.py's must-pull list), and the remaining 5 slots go
to the three round-5-changed/new queries (hnsw_search after
shard-count scaling, media_features after the real-featurizer
upgrade, the new heavy_hitters_cms_direct) plus the two
stalest-certified headline queries (mr_indexer and sessionize,
newest cert round 2). This test fails loudly if a
future registration reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# the 41 queries with no driver CORRECTNESS row before round 5
# (everything registered after the round-4 window froze)
NEVER_CERTIFIED = {
    "duplicate_spans", "dedup_index_build", "dedup_incremental",
    "dedup_eval", "hnsw_search_persisted", "pq_encode", "pq_search",
    "ivfpq_search", "ann_recall_eval", "similarity_triangles",
    "token_rarity", "doc_bfs", "xml_roundtrip_stats",
    "pyds_roundtrip_stats", "stream_topk_stateful", "user_scd2",
    "cdc_apply", "table_diff", "funnel_windowed",
    "user_growth_accounting", "doc_lm_score", "heavy_hitters_cms",
    "stream_cdc_upsert", "image_phash", "image_phash_neardup",
    "customer_rfm", "bucketed_join_stats", "user_event_unpivot",
    "bloom_prune_join", "q9_product_type_profit", "q11_important_stock",
    "data_quality_audit", "mv_incremental_refresh", "skyline_pareto",
    "zorder_layout_stats", "source_mix_weights", "temperature_resample",
    "quality_ensemble", "bpe_train", "bpe_encode", "embedding_neardup",
}

# implementation changed in round 5 (re-certify) or first registered
CHANGED_OR_NEW_THIS_ROUND = {"hnsw_search", "heavy_hitters_cms_direct",
                             "media_features"}

# headline-bench queries whose newest driver cert is round 2
STALEST_HEADLINE = {"mr_indexer", "sessionize"}

MUST_BE_IN_WINDOW = (SENTINELS | NEVER_CERTIFIED
                     | CHANGED_OR_NEW_THIS_ROUND | STALEST_HEADLINE)


def test_first_window_contains_round5_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 41 + 3 + 2 = 50: the round-5 window has no free slots
    assert len(MUST_BE_IN_WINDOW) == WINDOW_SIZE


def test_window_list_matches_registry_order():
    queries, _ = registry()
    assert list(queries)[:WINDOW_SIZE] == list(WINDOW_FIRST)


def test_registry_queries_pin_utc_timezone(spark, sf_dir):
    """A caller with a non-UTC session must get identical results: the
    registry wrapper pins the session TZ before running (the events
    nanos->NTZ conversion renders instants through the session TZ)."""
    import __spark_entry__ as entrymod
    q = entrymod.queries()["latest_event_per_user"]
    baseline = {(r.user_id, r.ts) for r in q(spark, sf_dir).collect()}
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = {(r.user_id, r.ts) for r in q(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == baseline


def test_alias_resolves_to_target():
    """`embedding_neardup` rotates INTO the round-5 window (its one
    driver certification — it never had a row under the alias name);
    it must still resolve to the same callable and oracle as its
    target."""
    queries, oracles = registry()
    assert queries["embedding_neardup"] is queries["embedding_neardup_exact"]
    assert oracles["embedding_neardup"] == oracles["embedding_neardup_exact"]
