"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round, rotated under the steady-state policy (VERDICT r5
item 4): sentinels every round, every round-changed and newly
registered query, and all remaining slots filled from
tools/window_plan.py's staleness report (ceiling 4 rounds), oldest
cert round first with name tiebreak. Round 10: the six capped
composed-pipeline gate entries are new (VERDICT r9 item 1); the four
queries whose code/oracle the cap plumbing touched rotate as
round-changed; the three suite-completing TPC-H queries (q2/q12/q20)
and the span-family operators (dedup_span_pairs, dedup_span_scrub,
contamination_spans, decontaminate_span_scrub) are new, with
duplicate_spans rotating as round-changed (shared _span_windows
factoring); the remaining 26 slots take the r6 stale cohort minus its
name-order tail that is not round-changed (q3_shipping_priority,
simhash_docs, source_quota_cap, stratified_sample,
stream_dedup_events, stream_sliding_counts, tfidf_cosine_pairs,
tfidf_top_terms — these join the r9 tail token_stats, user_stats,
user_value_mad_sql as the planner-scheduled eleven-name spill to r11,
which clears immediately: r11 has ~40 free slots). This test fails
loudly if a future registration reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# new in round 10: the capped composed dedup pipelines — max_df-capped
# candidate generation under the CC/survivorship compositions, and
# band-bucket population caps under the three band joins
NEW_THIS_ROUND = {
    "dedup_groups_capped", "dedup_keep_best_capped",
    "dedup_minhash_lsh_capped", "dedup_simhash_capped",
    "embedding_neardup_lsh_capped", "semantic_dedup_capped",
    # edit-distance verification over the capped banded candidates
    "dedup_fuzzy_verify",
    # the TPC-H suite completers (every classic TPC-H number the
    # corpus can express is now registered)
    "q2_min_cost_supplier", "q12_shipping_speed_priority",
    "q20_dominant_suppliers",
    # cross-document exact-span alignment (ExactSubstr pair view), the
    # cut-one-side action stage consuming it, and the split-aware
    # decontamination pair (positional evidence + cut-from-train)
    "dedup_span_pairs", "dedup_span_scrub", "contamination_spans",
    "decontaminate_span_scrub",
}

# changed in round 10 (cap plumbing threaded through; default path
# value-identical) and not already in the stale cohort
CHANGED_THIS_ROUND = {
    "dedup_groups", "dedup_keep_best", "dedup_minhash_lsh",
    "semantic_dedup",
    # window generation factored into the shared _span_windows helper
    # that dedup_span_pairs also consumes
    "duplicate_spans",
    # streaming-review fix: cross-batch latest-wins over the full
    # four-column sequence (stream_user_totals, the other streaming
    # fix, rotates via the stale cohort below)
    "stream_cdc_upsert",
}

# staleness rotation (window_plan.py, ceiling 4 rounds): the r6 cohort
# minus the ELEVEN-name spill to r11 (ADVICE r10 — this comment
# previously undercounted it as six): the eight r6 names
# q3_shipping_priority, simhash_docs, source_quota_cap,
# stratified_sample, stream_dedup_events, stream_sliding_counts,
# tfidf_cosine_pairs, tfidf_top_terms plus the r9-tail trio
# token_stats, user_stats, user_value_mad_sql — matching the
# eleven-name list in operators/__init__.py
# (stream_user_totals stays: it is round-changed)
STALE_ROTATION = {
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped", "dedup_simhash",
    "doc_chunks", "doc_fingerprint", "doc_quality", "doc_split",
    "embedding_lsh_signatures", "embedding_neardup_exact",
    "embedding_neardup_lsh", "embedding_topk", "event_transitions",
    "events_hourly", "events_props_stats", "graph_recall_eval",
    "image_decode_stats", "ivf_assign", "ivf_search", "lang_id",
    "minhash_signatures", "mr_doccount", "mr_docmeta", "mr_indexer_rdd",
    "payload_thumbnail", "pq_recall_eval", "stream_user_totals",
}

MUST_BE_IN_WINDOW = (SENTINELS | NEW_THIS_ROUND | CHANGED_THIS_ROUND
                     | STALE_ROTATION)


def test_first_window_contains_round10_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


def test_window_is_exactly_the_must_list():
    # 4 + 14 + 6 + 26 = 50: the round-10 window has no free slots
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
