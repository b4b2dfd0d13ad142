"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report (ceiling 4 rounds), oldest
cert round first with name tiebreak. Round 9: mr_wc_assoc leads (the
only query never driver-certified — registered at position 51 in r8,
one past the window cutoff), semantic_dedup and user_value_outliers
are round-changed (per-row decimal sums moved to the
BIGINT-product -> DECIMAL(18,0) row shape), and the remaining slots
take the entire 38-cert r5 stale cohort plus the first 5 of r6. This
test fails loudly if a future registration reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# round-9 lead: the declared-associative combine path's first driver
# cert (VERDICT r8 item 1)
NEVER_CERTIFIED = {"mr_wc_assoc"}

# changed in round 9: medoid/variance aggregation moved to the
# (18,0)-row fast-path shape (values identical, plan changed)
CHANGED_THIS_ROUND = {"semantic_dedup", "user_value_outliers"}

# staleness rotation (window_plan.py, ceiling 4 rounds): the full r5
# cohort (38) + the 5-name head of the r6 cohort
STALE_ROTATION = {
    "ann_recall_eval", "bloom_prune_join", "bucketed_join_stats",
    "cdc_apply", "customer_rfm", "data_quality_audit", "dedup_eval",
    "dedup_incremental", "dedup_index_build", "doc_bfs", "doc_lm_score",
    "duplicate_spans", "embedding_neardup", "funnel_windowed",
    "heavy_hitters_cms", "heavy_hitters_cms_direct", "image_phash",
    "image_phash_neardup", "ivfpq_search", "media_features",
    "mr_indexer", "mv_incremental_refresh", "pq_encode", "pq_search",
    "q11_important_stock", "q9_product_type_profit", "quality_ensemble",
    "similarity_triangles", "skyline_pareto", "source_mix_weights",
    "stream_cdc_upsert", "stream_topk_stateful", "table_diff",
    "temperature_resample", "user_event_unpivot",
    "user_growth_accounting", "user_scd2", "zorder_layout_stats",
    "asof_join_orders", "audio_decode_stats", "curation_summary",
    "customer_value_quartiles", "dedup_minhash_lsh",
}

MUST_BE_IN_WINDOW = (SENTINELS | NEVER_CERTIFIED | CHANGED_THIS_ROUND
                     | STALE_ROTATION)


def test_first_window_contains_round9_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 1 + 2 + 43 = 50: the round-9 window has no free slots
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


def test_registry_queries_pin_ansi_mode(spark, sf_dir):
    """ADVICE r8: row_units' loud-overflow contract requires ANSI. The
    registry wrapper must re-enable it even when the caller's session
    (the driver builds its own) has it off."""
    import __spark_entry__ as entrymod
    q = entrymod.queries()["mr_wc"]
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        q(spark, sf_dir).collect()
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_alias_resolves_to_target():
    """`embedding_neardup` (driver-certified under the alias name in
    round 5) must still resolve to the same callable and oracle as its
    target."""
    queries, oracles = registry()
    assert queries["embedding_neardup"] is queries["embedding_neardup_exact"]
    assert oracles["embedding_neardup"] == oracles["embedding_neardup_exact"]
