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
# than an accident of module ordering. Round-7 window, composed under
# the steady-state policy (sentinels + round-changed + new + stalest
# certs, tools/window_plan.py's draft): the sentinel set kept in-window
# EVERY round; the round-7 NEW registration (lsh_recall_eval — the
# embedding-LSH quality audit); the round-7 CHANGED queries that need a
# fresh driver row (the five *_roundtrip_stats: text_hash_sum schema
# moved to exact-decimal-accumulated DOUBLE; dedup_groups: pointer-
# jumping CC rewrite — values identical but VERDICT r6 item 4 demands
# the re-cert); then ALL 34 r3-stale certs from the staleness report
# (ceiling 4 rounds, oldest first, name tiebreak), and the remaining
# slots filled with the oldest r4 certs. The round-7 exact-cents
# conversions (q1/q5/q6/q17/q19, sql_*, brand_price_stats, events/
# stream sum_values, skyline demand, doc_lm_score) were verified
# VALUE-IDENTICAL at sf0.01 against the pre-conversion oracles — most
# sit in this window anyway via the stale cohort.
# tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # round-7 new registration
    "lsh_recall_eval",
    # round-7 changed (schema change / rewritten plan). token_rarity:
    # rarity_sum moved to exact-decimal-accumulated DOUBLE (a unique-
    # token spam doc at 100 TB corpus N overflows the BIGINT sum) —
    # spliced in per the round-changed rule, displacing the newest
    # stale filler (customers_no_orders, r4 — rotates in round 8).
    "jsonl_roundtrip_stats", "csv_roundtrip_stats", "orc_roundtrip_stats",
    "xml_roundtrip_stats", "pyds_roundtrip_stats", "dedup_groups",
    "token_rarity",
    # staleness rotation: the full r3 cohort (34)
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
    # ... remaining slots: oldest r4 certs by name order
    "bigram_pmi", "brand_price_stats", "cohort_retention",
    "column_histogram",
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
               multimodal_late, relational, mixture, bpe)
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
