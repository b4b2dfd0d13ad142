"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report (ceiling 4 rounds), oldest
cert round first with name tiebreak. Round 8: the 8 formerly
rows-only queries that gained oracles + the sessionize fast-path
conversion (round-changed), the capped-sequences twin (new), and the
entire 36-cert r4 stale cohort led by the repredicated
customers_no_orders. This test fails loudly if a future registration
reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# changed in round 8: the 8 queries whose oracles are NEW (VERDICT r7
# item 1 — every one needs its first hash-certified row) plus
# sessionize (aggregate moved to the DECIMAL(18,0)-units fast path)
CHANGED_THIS_ROUND = {"bpe_train", "bpe_encode", "ivf_train",
                      "hnsw_search", "hnsw_search_persisted",
                      "events_user_sketch",
                      "order_value_percentiles_approx",
                      "embedding_topk_pandas", "sessionize"}

# first registered in round 8
NEW_THIS_ROUND = {"user_event_sequences_capped"}

# staleness rotation (window_plan.py, ceiling 4 rounds): the full r4
# cohort (36); customers_no_orders doubles as round-changed (anti-join
# repredicated to certify non-empty — VERDICT r7 item 2)
STALE_ROTATION = {
    "customers_no_orders", "daily_revenue_trailing", "decontaminate_split",
    "dedup_keep_best", "embedding_quantize", "events_hourly_gapfilled",
    "events_value_bands", "funnel_view_click_purchase",
    "hourly_burst_detection", "latest_event_per_user",
    "media_decode_stats", "nation_customer_supplier_balance",
    "order_value_percentiles", "orders_dow_stats", "orders_monthly_growth",
    "pack_sequences", "part_name_analysis", "priority_status_cube",
    "q16_parts_supplier_relationship", "q4_order_priority",
    "repeat_customers", "sales_rollup", "semantic_dedup",
    "shingle_containment", "shingle_containment_capped",
    "skewsafe_type_user_counts", "stream_foreachbatch_roundtrip",
    "stream_topk_event_types", "table_profile", "training_shuffle",
    "user_event_pivot", "user_event_sequences", "user_type_count_map",
    "user_value_mad", "user_value_outliers", "user_value_trend",
}

MUST_BE_IN_WINDOW = (SENTINELS | CHANGED_THIS_ROUND | NEW_THIS_ROUND
                     | STALE_ROTATION)


def test_first_window_contains_round8_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 9 + 1 + 36 = 50: the round-8 window has no free slots
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
