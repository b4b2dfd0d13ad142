"""Pin the registry's first-50 window composition.

The driver's CORRECTNESS gate verifies only the FIRST 50 registry
entries per round. Round 1 certified the relational suite; this round
the LLM-pipeline surface (dedup / similarity / textstats / multimodal /
streaming) plus the previously-unwindowed events queries must occupy
the window. This test fails loudly if a future registration reorders
them out.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators import registry

WINDOW = 50

# every query that must land a driver CORRECTNESS row this round
MUST_BE_IN_WINDOW = {
    # MR apps incl. both RDD compat-layer entries
    "mr_wc", "mr_wc_rdd", "mr_indexer", "mr_indexer_rdd",
    "mr_docmeta", "mr_doccount",
    # dedup family
    "dedup_exact", "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
    "dedup_groups", "minhash_signatures", "dedup_minhash_lsh",
    "simhash_docs", "dedup_simhash",
    # similarity / ANN
    "embedding_topk", "embedding_topk_pandas", "ivf_assign", "ivf_search",
    "ivf_train", "embedding_neardup_exact", "embedding_lsh_signatures",
    "embedding_neardup_lsh",
    # text analysis / curation
    "tfidf_top_terms", "tfidf_cosine_pairs", "curation_summary",
    "doc_pagerank", "doc_split", "stratified_sample", "source_quota_cap",
    "doc_chunks", "lang_id", "doc_quality", "token_stats",
    "doc_fingerprint",
    # multimodal
    "multimodal_meta", "image_decode_stats", "frame_sample",
    "media_features", "payload_thumbnail",
    # streaming
    "stream_hourly_counts", "stream_sliding_counts",
    "stream_dedup_events", "stream_user_totals",
    # events queries with no round-1 driver row + the new MAD twin
    "sessionize", "events_hourly", "asof_join_orders", "user_stats",
    "event_transitions", "events_props_stats", "user_value_mad_sql",
}


def test_first_window_contains_north_star_surface():
    queries, _ = registry()
    window = list(queries)[:WINDOW]
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"outside driver window: {sorted(missing)}"


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
    assert names.index("embedding_neardup") >= WINDOW
    # alias resolves to the same callable and oracle as its target
    assert queries["embedding_neardup"] is queries["embedding_neardup_exact"]
    assert oracles["embedding_neardup"] == oracles["embedding_neardup_exact"]
