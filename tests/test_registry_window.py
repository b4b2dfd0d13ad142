"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report (ceiling 4 rounds), oldest
cert round first with name tiebreak. Round 7 executes the first full
staleness rotation: the entire 34-cert r3 cohort plus the 4 oldest r4
certs (the 5th, customers_no_orders, was displaced by the late
token_rarity schema change and rotates in round 8). This test fails
loudly if a future registration reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# implementation changed in round 7 (schema/plan differ -> re-certify):
# the five roundtrip stats moved text_hash_sum to exact-decimal-
# accumulated DOUBLE; dedup_groups is the pointer-jumping CC rewrite;
# token_rarity moved rarity_sum to the same exact-decimal DOUBLE rule
# (BIGINT sum overflows on unique-token spam docs at 100 TB corpus N)
CHANGED_THIS_ROUND = {"jsonl_roundtrip_stats", "csv_roundtrip_stats",
                      "orc_roundtrip_stats", "xml_roundtrip_stats",
                      "pyds_roundtrip_stats", "dedup_groups",
                      "token_rarity"}

# first registered in round 7
NEW_THIS_ROUND = {"lsh_recall_eval"}

# staleness rotation (window_plan.py, ceiling 4 rounds): the full r3
# cohort (34) plus the 4 oldest r4 certs by name order
STALE_ROTATION = {
    "contamination_check", "curation_funnel", "doc_chunks_udtf",
    "doc_pagerank", "doc_repetition", "frame_sample", "gif_decode_stats",
    "lang_confusion", "multimodal_meta", "pii_scrub",
    "q10_returned_items", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q1_pricing_summary",
    "q21_suppliers_kept_waiting", "q22_idle_customers",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "sql_priority_status_sets", "sql_revenue_by_segment",
    "stream_attribution", "stream_enriched_events", "stream_sessionize",
    "token_length_histogram", "top3_orders_per_customer",
    "url_domain_stats", "user_gap_stats", "video_frame_stats",
    "bigram_pmi", "brand_price_stats", "cohort_retention",
    "column_histogram",
}

MUST_BE_IN_WINDOW = (SENTINELS | CHANGED_THIS_ROUND | NEW_THIS_ROUND
                     | STALE_ROTATION)


def test_first_window_contains_round7_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 7 + 1 + 38 = 50: the round-7 window has no free slots
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
    """`embedding_neardup` (driver-certified under the alias name in
    round 5) must still resolve to the same callable and oracle as its
    target."""
    queries, oracles = registry()
    assert queries["embedding_neardup"] is queries["embedding_neardup_exact"]
    assert oracles["embedding_neardup"] == oracles["embedding_neardup_exact"]
