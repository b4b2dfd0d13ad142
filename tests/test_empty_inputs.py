"""Empty-input robustness: representative operators from each family
must return empty results (not crash) when the source tables have zero
rows — the situation every partition-pruned scan produces at scale.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.sources.tables import TABLES, load_table

# one per family: MR surface, relational agg/join/window, events,
# dedup (shingle + banding), similarity, text, multimodal, funnel
REPRESENTATIVE = [
    "mr_wc",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "top3_orders_per_customer",
    "sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embedding_topk",
    "tfidf_cosine_pairs",
    "lang_id",
    "multimodal_meta",
    "image_decode_stats",
    "audio_decode_stats",
    "gif_decode_stats",
    "video_frame_stats",
    "events_value_bands",
    "stratified_sample",
    "source_quota_cap",
    "contamination_check",
    "bigram_pmi",
    "pii_scrub",
    "url_domain_stats",
    "token_length_histogram",
    "dedup_keep_best",
    "embedding_quantize",
    "doc_pagerank",
    "media_decode_stats",
    "shingle_containment",
    "doc_chunks_udtf",
    "lang_confusion",
    "stream_enriched_events",
    "stream_foreachbatch_roundtrip",
    # round-4 surface
    "q16_parts_supplier_relationship",
    # r10 TPC-H completers: window-decorrelated min, conditional split
    # counts, dominance semi-join
    "q2_min_cost_supplier",
    "q12_shipping_speed_priority",
    "q20_dominant_suppliers",
    "pack_sequences",
    "training_shuffle",
    "decontaminate_split",
    "stream_topk_event_types",
    "stream_topk_stateful",
    "shingle_containment_capped",
    "hnsw_search",
    "hnsw_search_persisted",
    "semantic_dedup",
    # round-7 second session: rarity_sum moved to decimal-accumulated
    # DOUBLE — keep the empty-corpus contract pinned on the new path
    "token_rarity",
    "dedup_index_build",
    "dedup_incremental",
    "xml_roundtrip_stats",
    "bucketed_join_stats",
    "user_event_unpivot",
    # round-4 extension surface (mixture / span dedup / adapted Q9)
    "duplicate_spans",
    "dedup_span_pairs",
    "dedup_span_scrub",
    "contamination_spans",
    "decontaminate_span_scrub",
    "q9_product_type_profit",
    "source_mix_weights",
    "temperature_resample",
    "quality_ensemble",
    "pq_encode",
    "pq_search",
    "image_phash",
    "image_phash_neardup",
    "doc_lm_score",
    "q11_important_stock",
    "ivfpq_search",
    "pyds_roundtrip_stats",
    "user_scd2",
    "similarity_triangles",
    "bpe_train",
    "bpe_encode",
    # session-3 surface
    "cdc_apply",
    "stream_cdc_upsert",
    "heavy_hitters_cms",
    "heavy_hitters_cms_direct",
    "media_features",
    "skyline_pareto",
    "doc_bfs",
    "ann_recall_eval",
    "table_diff",
    "funnel_windowed",
    "user_growth_accounting",
    "zorder_layout_stats",
    # round-6 surface (distributed exact rank + the two recall audits)
    "customer_value_quartiles",
    "pq_recall_eval",
    "graph_recall_eval",
    # round 8: the hot-key-bounded sequences twin
    "user_event_sequences_capped",
    # round 10: the capped composed pipelines (gate entries)
    "dedup_groups_capped",
    "dedup_keep_best_capped",
    "dedup_minhash_lsh_capped",
    "dedup_simhash_capped",
    "embedding_neardup_lsh_capped",
    "semantic_dedup_capped",
    "dedup_fuzzy_verify",
]

# un-grouped audit/summary queries keep their fixed rows on empty input


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """An sf dir with every table present but zero rows (schemas
    preserved from the real testdata)."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        if t == "events":
            # write the RAW schema (nanos stored as long) so load_table's
            # normalization applies unchanged
            import pyarrow.parquet as pq
            import pyarrow as pa
            src = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
            pq.write_table(pa.table({f.name: pa.array([], f.type)
                                     for f in src}),
                           os.path.join(str(out), "events.parquet"))
            continue
        df = load_table(spark, sf_dir, t)
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(out), f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_on_empty_tables_returns_empty(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    assert df.count() == 0


def test_global_aggregate_on_empty_tables_returns_zeros(spark,
                                                        empty_sf_dir):
    """Un-grouped aggregates legitimately return ONE summary row on
    empty input — with zero counts."""
    row = entrymod.queries()["funnel_view_click_purchase"](
        spark, empty_sf_dir).collect()[0]
    assert (row.n_view, row.n_click, row.n_purchase) == (0, 0, 0)


def test_bloom_prune_on_empty_tables_reports_zeros(spark, empty_sf_dir):
    """The Bloom accounting keeps its single summary row on empty
    input — every count zero (an empty filter passes nothing)."""
    row = entrymod.queries()["bloom_prune_join"](
        spark, empty_sf_dir).collect()[0]
    assert (row.n_build_keys, row.n_bits_set, row.n_probe, row.n_pass,
            row.n_true, row.n_false_pos) == (0, 0, 0, 0, 0, 0)


def test_curation_funnel_on_empty_tables_reports_zero_stages(spark,
                                                             empty_sf_dir):
    """The funnel audit keeps its 4 stage rows on an empty corpus, each
    reporting zero survivors."""
    rows = entrymod.queries()["curation_funnel"](
        spark, empty_sf_dir).collect()
    assert len(rows) == 4
    assert all(r.n_docs == 0 for r in rows)


def test_quality_audit_on_empty_tables_all_pass(spark, empty_sf_dir):
    """Five check rows survive an empty corpus, each with zero checked
    rows, zero violations, and passed=1."""
    rows = entrymod.queries()["data_quality_audit"](
        spark, empty_sf_dir).collect()
    assert len(rows) == 5
    assert all((r.n_checked, r.n_violations, r.passed) == (0, 0, 1)
               for r in rows)


def test_mv_refresh_on_empty_tables_is_empty(spark, empty_sf_dir):
    assert entrymod.queries()["mv_incremental_refresh"](
        spark, empty_sf_dir).count() == 0


def test_dedup_eval_on_empty_tables_reports_zeros(spark, empty_sf_dir):
    """The precision/recall audit keeps its single summary row on an
    empty corpus — zero pairs on every side, ratios pinned to 0."""
    row = entrymod.queries()["dedup_eval"](spark, empty_sf_dir).collect()[0]
    assert (row.n_true, row.n_pred, row.n_hit,
            row.precision, row.recall) == (0, 0, 0, 0.0, 0.0)


def test_lsh_recall_eval_on_empty_tables_reports_zeros(spark,
                                                       empty_sf_dir):
    """Same fixed-row contract for the embedding-LSH audit (r7)."""
    row = entrymod.queries()["lsh_recall_eval"](
        spark, empty_sf_dir).collect()[0]
    assert (row.n_true, row.n_pred, row.n_hit,
            row.precision, row.recall) == (0, 0, 0, 0.0, 0.0)
