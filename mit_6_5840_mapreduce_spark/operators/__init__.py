"""Query library. Each module exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-ANSI SQL computing the same result
  on the same parquet tables (omitted for non-SQL-expressible ops).

``registry()`` merges all modules for ``__spark_entry__``.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _with_package(fn: Callable[[SparkSession, str], DataFrame]
                  ) -> Callable[[SparkSession, str], DataFrame]:
    """Harden registered queries against the CALLER's session config:
    ensure executors can import this package (the driver builds its own
    SparkSession from an arbitrary cwd) and pin the session timezone to
    UTC — the events nanos->NTZ conversion renders instants through the
    session TZ, so a non-UTC caller would silently shift every event
    timestamp relative to the DuckDB oracle."""
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mit_6_5840_mapreduce_spark.session import attach_package
        attach_package(spark)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # row_units' loud-overflow contract needs ANSI even under the
        # caller's session (the driver builds its own); runtime-mutable,
        # default-on in Spark 4.x, so this is a no-op locally and the
        # guard rail on deployments where ANSI defaults off (ADVICE r8)
        spark.conf.set("spark.sql.ansi.enabled", "true")
        return fn(spark, sf_dir)
    return wrapped


# The driver's CORRECTNESS gate verifies the FIRST 50 registry entries
# each round, so window composition is an explicit, reviewed list rather
# than an accident of module ordering. Round-10 window, composed under
# the steady-state policy (sentinels + round-changed + new + stalest
# certs, tools/window_plan.py's draft): the sentinel set kept in-window
# EVERY round; the SIX new capped-composition gate entries (VERDICT r9
# item 1 — dedup_groups/keep_best over max_df-capped candidate
# generation; band-bucket population caps for the minhash / simhash /
# embedding-LSH band joins; semantic_dedup over the capped pairs) plus
# dedup_fuzzy_verify (edit-distance verification over the capped
# banded candidates); the round-10 CHANGED queries whose code or
# oracle was touched by the cap plumbing and are NOT in the stale
# cohort (dedup_groups, dedup_keep_best — oracles recomposed from the
# pair-list oracles; dedup_minhash_lsh, semantic_dedup — optional
# bucket_cap threaded through, default path identical; stream_user_totals
# — last_ts carried in state + max_by final-state selection;
# stream_cdc_upsert — cross-batch latest-wins extended to the FULL
# four-column sequence, r10 review); the THREE suite-completing TPC-H
# queries added late in the round (q2/q12/q20 — every classic TPC-H
# number the corpus can express is now registered); the cross-document
# span ALIGNMENT + CUT operators (dedup_span_pairs, dedup_span_scrub)
# and the split-aware decontamination pair — positional evidence
# (contamination_spans) and its cut-from-train action
# (decontaminate_span_scrub) — all new — plus duplicate_spans
# (round-changed: its window generation factored into the shared
# _span_windows helper the family consumes); then 26 of the 37-cert
# r6 stale cohort (ceiling 4 rounds, oldest first, name tiebreak —
# the planner-scheduled spill to r11 grows to eleven names:
# q3_shipping_priority, simhash_docs, source_quota_cap,
# stratified_sample, stream_dedup_events, stream_sliding_counts,
# tfidf_cosine_pairs, tfidf_top_terms — the name-order tail of the
# cohort that is NOT round-changed (stream_user_totals IS, so it
# stays) — plus the r9 spill token_stats, user_stats,
# user_value_mad_sql; r11 will have ~40 free slots, so the spill
# clears immediately).
# 4 + 7 + 5 + 3 + 5 + 26 = 50, no free slots.
# tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # round-10 new: the capped composed dedup pipelines (VERDICT r9 #1)
    # + the edit-distance verify stage over the capped candidates
    "dedup_groups_capped", "dedup_keep_best_capped",
    "dedup_minhash_lsh_capped", "dedup_simhash_capped",
    "embedding_neardup_lsh_capped", "semantic_dedup_capped",
    "dedup_fuzzy_verify",
    # round-10 changed (cap plumbing + the streaming-review fixes; not
    # already in the stale cohort — stream_user_totals is)
    "dedup_groups", "dedup_keep_best", "dedup_minhash_lsh",
    "semantic_dedup", "stream_cdc_upsert",
    # round-10 new (late): the TPC-H suite completers + the span
    # alignment/cut operators (and duplicate_spans, changed by the
    # _span_windows factoring)
    "q2_min_cost_supplier", "q12_shipping_speed_priority",
    "q20_dominant_suppliers", "dedup_span_pairs", "dedup_span_scrub",
    "contamination_spans", "decontaminate_span_scrub",
    "duplicate_spans",
    # staleness rotation: the r6 cohort (26 of 37;
    # q3_shipping_priority, simhash_docs, source_quota_cap,
    # stratified_sample, stream_dedup_events, stream_sliding_counts,
    # tfidf_cosine_pairs, tfidf_top_terms join token_stats,
    # user_stats, user_value_mad_sql in the r11 spill)
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped", "dedup_simhash",
    "doc_chunks", "doc_fingerprint", "doc_quality", "doc_split",
    "embedding_lsh_signatures", "embedding_neardup_exact",
    "embedding_neardup_lsh", "embedding_topk", "event_transitions",
    "events_hourly", "events_props_stats", "graph_recall_eval",
    "image_decode_stats", "ivf_assign", "ivf_search", "lang_id",
    "minhash_signatures", "mr_doccount", "mr_docmeta", "mr_indexer_rdd",
    "payload_thumbnail", "pq_recall_eval", "stream_user_totals",
)


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]],
                        dict[str, str]]:
    from mit_6_5840_mapreduce_spark.operators import (
        bpe,
        corpus,
        dedup,
        events,
        formats,
        mixture,
        mrqueries,
        multimodal,
        quality,
        relational,
        scrub,
        similarity,
        textstats,
    )
    from mit_6_5840_mapreduce_spark.streaming import jobs as streaming_jobs
    from types import SimpleNamespace
    streaming_late = SimpleNamespace(QUERIES=streaming_jobs.LATE_QUERIES,
                                     ORACLES=streaming_jobs.LATE_ORACLES)
    multimodal_late = SimpleNamespace(QUERIES=multimodal.LATE_QUERIES,
                                      ORACLES=multimodal.LATE_ORACLES)
    modules = (mrqueries, dedup, similarity, textstats, scrub, formats,
               multimodal, streaming_jobs, events, corpus, streaming_late,
               multimodal_late, relational, mixture, bpe, quality)
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        overlap = set(m.QUERIES) & set(queries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update({name: _with_package(fn)
                        for name, fn in m.QUERIES.items()})
        oracles.update(m.ORACLES)
    # legacy aliases (post-rename names kept for gate continuity). Round
    # 5 rotates "embedding_neardup" INTO the window once so the alias
    # name itself carries a driver row (it shares the callable and
    # oracle of the already-certified embedding_neardup_exact).
    for alias, target in (("embedding_neardup", "embedding_neardup_exact"),):
        queries[alias] = queries[target]
        if target in oracles:
            oracles[alias] = oracles[target]
    # reorder so WINDOW_FIRST occupies the driver's certification window,
    # everything else follows in module order
    missing = [n for n in WINDOW_FIRST if n not in queries]
    if missing:
        raise ValueError(f"WINDOW_FIRST names not registered: {missing}")
    if len(set(WINDOW_FIRST)) != WINDOW_SIZE:
        raise ValueError(
            f"WINDOW_FIRST must hold exactly {WINDOW_SIZE} distinct names, "
            f"got {len(set(WINDOW_FIRST))}")
    ordered = {n: queries[n] for n in WINDOW_FIRST}
    ordered.update((n, fn) for n, fn in queries.items() if n not in ordered)
    queries = ordered
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
