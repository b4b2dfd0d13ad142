"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report, oldest cert round first with
name tiebreak. Round 13 (NO new registrations): epoch_assembly and
the five span-family queries rotate as round-changed (the epoch
capstone composes the single-sourced pack_assignment /
shuffle_assignment rules — VERDICT r12 item 3; the span memo's
eviction is now LRU and the corpus stamp is re-read under the insert
lock — ADVICE r12; values unchanged by design); the 21-name r8 tail
lands on schedule (VERDICT r12 item 1 — pack_sequences and
training_shuffle in it are also round-changed by the single-sourcing
refactor), and the first 19 of the 42-name r9 cohort fill the rest,
with the 23-name r9 tail scheduled for r14 inside the 5-round
ceiling. Docstring/comment-only edits do NOT re-certify: no plan or
value surface moves. This test fails loudly if a future registration
reorders the window.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# changed in round 13: the epoch capstone's pack/shuffle stages now
# render through the shared single-sourced rules (engine AND oracle),
# and every span-family query consumes the ADVICE-r12-hardened memo
# (LRU eviction; inserts keyed by the PRE-build corpus stamp, so a
# frame built over a mid-rewrite corpus is unreachable by fresh-stamp
# callers and evicted by the next insert sweep)
CHANGED_THIS_ROUND = {
    "epoch_assembly",
    "dedup_span_pairs", "dedup_span_scrub", "duplicate_spans",
    "contamination_spans", "decontaminate_span_scrub",
}

# staleness rotation part 1 (window_plan.py, ceiling 5 rounds): the
# ENTIRE 21-name r8 tail — on schedule per the r12 window-plan draft
# (VERDICT r12 item 1); pack_sequences/training_shuffle double as
# round-changed (the single-sourcing refactor)
STALE_R8_TAIL = {
    "pack_sequences", "part_name_analysis", "priority_status_cube",
    "q16_parts_supplier_relationship", "q4_order_priority",
    "repeat_customers", "sales_rollup", "sessionize",
    "shingle_containment", "shingle_containment_capped",
    "skewsafe_type_user_counts", "stream_foreachbatch_roundtrip",
    "stream_topk_event_types", "table_profile", "training_shuffle",
    "user_event_pivot", "user_event_sequences",
    "user_event_sequences_capped", "user_type_count_map",
    "user_value_mad", "user_value_trend",
}

# staleness rotation part 2: the r9 cohort's first 19 names in name
# order; the 23-name tail is the planner-scheduled spill to r14
STALE_R9_HEAD = {
    "ann_recall_eval", "asof_join_orders", "audio_decode_stats",
    "bloom_prune_join", "bucketed_join_stats", "cdc_apply",
    "curation_summary", "customer_rfm", "customer_value_quartiles",
    "data_quality_audit", "dedup_eval", "dedup_incremental",
    "dedup_index_build", "doc_bfs", "doc_lm_score",
    "embedding_neardup", "funnel_windowed", "heavy_hitters_cms",
    "heavy_hitters_cms_direct",
}

MUST_BE_IN_WINDOW = (SENTINELS | CHANGED_THIS_ROUND
                     | STALE_R8_TAIL | STALE_R9_HEAD)


def test_first_window_contains_round13_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 6 + 21 + 19 = 50: the round-13 window has no free slots
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
