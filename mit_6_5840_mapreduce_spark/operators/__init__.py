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
# than an accident of module ordering. Round-4 window (VERDICT r3 item
# 1: no registered query's newest cert older than 2 rounds): the
# sentinel set kept in-window EVERY round, all 28 rows whose newest
# driver cert is round 1 (two rounds and one Spark-runtime upgrade
# ago — the 4.1.2 nanos-ts break proved stale certs rot), the round-4
# operators (first certification), and every query whose implementation
# or oracle changed since its round-3 row (the capped-containment /
# CC-fusion / codec-hardening / CSV-sentinel commits).
# tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # the 28 rows last driver-certified in round 1
    "brand_price_stats", "cohort_retention", "column_histogram",
    "customer_value_quartiles", "customers_no_orders",
    "daily_revenue_trailing", "events_hourly_gapfilled",
    "events_value_bands", "funnel_view_click_purchase",
    "hourly_burst_detection", "latest_event_per_user",
    "nation_customer_supplier_balance", "order_value_percentiles",
    "orders_dow_stats", "orders_monthly_growth", "part_name_analysis",
    "priority_status_cube", "q4_order_priority", "repeat_customers",
    "sales_rollup", "skewsafe_type_user_counts", "table_profile",
    "user_event_pivot", "user_event_sequences", "user_type_count_map",
    "user_value_mad", "user_value_outliers", "user_value_trend",
    # new round-4 operators (first driver certification)
    "shingle_containment_capped", "q16_parts_supplier_relationship",
    "pack_sequences", "training_shuffle", "decontaminate_split",
    "stream_topk_event_types", "hnsw_search", "semantic_dedup",
    # implementation/oracle changed since the round-3 row -> re-certify
    # (image_decode_stats also saw the codec error-normalization change,
    # but its exercised paths are covered by in-window media_decode_stats
    # + local sf0.01 parity, and its r2 cert stays within the two-round
    # freshness bound — semantic_dedup takes the slot)
    "csv_roundtrip_stats", "jsonl_roundtrip_stats", "orc_roundtrip_stats",
    "media_decode_stats", "embedding_quantize", "bigram_pmi",
    "dedup_groups", "dedup_keep_best", "shingle_containment",
    "stream_foreachbatch_roundtrip",
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
