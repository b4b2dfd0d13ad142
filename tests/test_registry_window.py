"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report, oldest cert round first with
name tiebreak. Round 12: quality_eval_holdout and epoch_assembly are
new (VERDICT r11 items 2-3); the five span-family queries rotate as
round-changed (the shared _span_windows memo is now lock-guarded
against concurrent-miss frame orphaning — ADVICE r11 — and its
storage level is explicit with the accept-recompute knob — VERDICT
r11 item 4); the 17-name r7 tail lands on schedule — the 5-round
staleness ceiling's first real test: those certs are exactly 5 rounds
old at this gate, and after this round no query's latest cert is
<= r7 — and the first 22 of the 43-name r8 cohort fill the rest, with
the 21-name tail scheduled for r13. Docstring/comment-only edits do
NOT re-certify: no plan or value surface moves. This test fails
loudly if a future registration reorders the window.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# new in round 12: the held-out evaluation of the trained quality
# classifier (train on doc_split's train bucket, judge every round on
# the 20% the model never sees) and the epoch-assembly capstone
# (resample -> decontaminate -> pack -> shuffle as one plan)
NEW_THIS_ROUND = {
    "quality_eval_holdout", "epoch_assembly",
}

# changed in round 12: every consumer of the shared _span_windows
# frame (memo lookup/evict/insert now serialized by a lock — ADVICE
# r11 — and the persist level explicit, with the accept-recompute
# degradation knob; values unchanged by design, which is exactly what
# the re-certification shows)
CHANGED_THIS_ROUND = {
    "dedup_span_pairs", "dedup_span_scrub", "duplicate_spans",
    "contamination_spans", "decontaminate_span_scrub",
}

# staleness rotation part 1 (window_plan.py, ceiling 5 rounds): the
# ENTIRE 17-name r7 tail — exactly 5 rounds old at this gate, the
# ceiling's first real test (VERDICT r11 item 1)
STALE_R7_TAIL = {
    "q22_idle_customers", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "sql_priority_status_sets", "sql_revenue_by_segment",
    "stream_attribution", "stream_enriched_events", "stream_sessionize",
    "token_length_histogram", "token_rarity", "top3_orders_per_customer",
    "url_domain_stats", "user_gap_stats", "video_frame_stats",
    "xml_roundtrip_stats",
}

# staleness rotation part 2: the r8 cohort's first 22 names in name
# order; the 21-name tail is the planner-scheduled spill to r13
STALE_R8_HEAD = {
    "bpe_encode", "bpe_train", "customers_no_orders",
    "daily_revenue_trailing", "decontaminate_split",
    "embedding_quantize", "embedding_topk_pandas",
    "events_hourly_gapfilled", "events_user_sketch",
    "events_value_bands", "funnel_view_click_purchase", "hnsw_search",
    "hnsw_search_persisted", "hourly_burst_detection", "ivf_train",
    "latest_event_per_user", "media_decode_stats",
    "nation_customer_supplier_balance", "order_value_percentiles",
    "order_value_percentiles_approx", "orders_dow_stats",
    "orders_monthly_growth",
}

MUST_BE_IN_WINDOW = (SENTINELS | NEW_THIS_ROUND | CHANGED_THIS_ROUND
                     | STALE_R7_TAIL | STALE_R8_HEAD)


def test_first_window_contains_round12_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 2 + 5 + 17 + 22 = 50: the round-12 window has no free slots
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
