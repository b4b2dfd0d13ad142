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
        return fn(spark, sf_dir)
    return wrapped


# The driver's CORRECTNESS gate verifies the FIRST 50 registry entries
# each round, so window composition is an explicit, reviewed list rather
# than an accident of module ordering. Round-3 window: the 12 queries
# that had never had a driver row (TPC-H Q8/Q17/Q21, the corpus trio,
# audio/gif/video decode stats, the late stream gates, user_gap_stats),
# a sentinel set kept in-window EVERY round to catch regressions
# (mr_wc, mr_wc_rdd, dedup_exact, stream_hourly_counts), every query
# whose implementation changed this round (multimodal_meta,
# frame_sample, dedup_groups, doc_pagerank), and relational re-certs
# filling the remainder. tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # the 12 never-driver-certified queries (round-2 VERDICT item 1)
    "user_gap_stats", "contamination_check", "doc_repetition",
    "bigram_pmi", "stream_sessionize", "stream_attribution",
    "audio_decode_stats", "gif_decode_stats", "video_frame_stats",
    "q8_market_share", "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    # changed this round -> need re-certification
    "doc_pagerank", "multimodal_meta", "frame_sample", "dedup_groups",
    # new round-3 operators (first driver certification)
    "pii_scrub", "url_domain_stats", "curation_funnel",
    "token_length_histogram", "dedup_keep_best", "embedding_quantize",
    "shingle_containment", "jsonl_roundtrip_stats", "csv_roundtrip_stats",
    "orc_roundtrip_stats", "doc_chunks_udtf", "media_decode_stats",
    "lang_confusion", "stream_enriched_events",
    "stream_foreachbatch_roundtrip",
    # relational / events re-certs (round-1 rows, re-verified here)
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q7_nation_volume",
    "q10_returned_items", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q18_large_orders", "q19_discounted_revenue",
    "q22_idle_customers", "sql_revenue_by_segment",
    "sql_priority_status_sets",
    "top3_orders_per_customer",
)


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]],
                        dict[str, str]]:
    from mit_6_5840_mapreduce_spark.operators import (
        corpus,
        dedup,
        events,
        formats,
        mrqueries,
        multimodal,
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
               multimodal_late, relational)
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        overlap = set(m.QUERIES) & set(queries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update({name: _with_package(fn)
                        for name, fn in m.QUERIES.items()})
        oracles.update(m.ORACLES)
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
    # legacy aliases (post-rename names kept for gate continuity),
    # appended LAST so they never consume a driver-window slot
    for alias, target in (("embedding_neardup", "embedding_neardup_exact"),):
        queries[alias] = queries[target]
        if target in oracles:
            oracles[alias] = oracles[target]
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
