"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round. Round 3 rotates in the 12 queries that never had a
driver row (TPC-H Q8/Q17/Q21, the corpus-analysis trio, the three
late multimodal decode gates, the two late stream gates, and
user_gap_stats), keeps a sentinel set in-window every round, and
re-certifies every query whose implementation changed this round.
This test fails loudly if a future registration reorders them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import (
    WINDOW_FIRST, WINDOW_SIZE, registry,
)

# regression sentinels: in-window EVERY round
SENTINELS = {"mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts"}

# the 12 queries with no driver CORRECTNESS row in rounds 1-2
NEVER_CERTIFIED = {
    "q8_market_share", "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    "contamination_check", "doc_repetition", "bigram_pmi",
    "audio_decode_stats", "gif_decode_stats", "video_frame_stats",
    "stream_sessionize", "stream_attribution",
    "user_gap_stats",
}

# implementation changed in round 3 -> must be re-certified
CHANGED_THIS_ROUND = {
    "doc_pagerank", "multimodal_meta", "frame_sample", "dedup_groups",
}

MUST_BE_IN_WINDOW = SENTINELS | NEVER_CERTIFIED | CHANGED_THIS_ROUND


def test_first_window_contains_round3_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW_SIZE]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


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


def test_aliases_register_after_window():
    queries, oracles = registry()
    names = list(queries)
    assert names.index("embedding_neardup") >= WINDOW_SIZE
    # alias resolves to the same callable and oracle as its target
    assert queries["embedding_neardup"] is queries["embedding_neardup_exact"]
    assert oracles["embedding_neardup"] == oracles["embedding_neardup_exact"]
