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
# than an accident of module ordering. Round-9 window, composed under
# the steady-state policy (sentinels + round-changed + new + stalest
# certs, tools/window_plan.py's draft): the sentinel set kept in-window
# EVERY round; mr_wc_assoc LEADS — registered one past the r8 cutoff,
# it is the ONLY query with no driver cert yet (VERDICT r8 item 1, the
# declared-associative combine path's end-to-end cert); the round-9
# CHANGED queries — semantic_dedup and user_value_outliers (per-row
# decimal sums moved to the BIGINT-product -> DECIMAL(18,0) row shape,
# the r8 sessionize fast-path lesson; value-identical, wider loud-
# overflow envelope); then the ENTIRE 38-cert r5 stale cohort (ceiling
# 4 rounds, oldest first, name tiebreak) and the first 5 of the r6
# cohort. 4 + 1 + 2 + 38 + 5 = 50, no free slots.
# tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # round-9 lead: the one query never driver-certified (r8 position 51)
    "mr_wc_assoc",
    # round-9 changed: medoid/variance sums on the (18,0)-row fast path
    "semantic_dedup", "user_value_outliers",
    # staleness rotation: the full r5 cohort (38)
    "ann_recall_eval", "bloom_prune_join", "bucketed_join_stats",
    "cdc_apply", "customer_rfm", "data_quality_audit", "dedup_eval",
    "dedup_incremental", "dedup_index_build", "doc_bfs", "doc_lm_score",
    "duplicate_spans", "embedding_neardup", "funnel_windowed",
    "heavy_hitters_cms", "heavy_hitters_cms_direct", "image_phash",
    "image_phash_neardup", "ivfpq_search", "media_features",
    "mr_indexer", "mv_incremental_refresh", "pq_encode", "pq_search",
    "q11_important_stock", "q9_product_type_profit", "quality_ensemble",
    "similarity_triangles", "skyline_pareto", "source_mix_weights",
    "stream_cdc_upsert", "stream_topk_stateful", "table_diff",
    "temperature_resample", "user_event_unpivot",
    "user_growth_accounting", "user_scd2", "zorder_layout_stats",
    # r6-cohort head (next-stalest, name order)
    "asof_join_orders", "audio_decode_stats", "curation_summary",
    "customer_value_quartiles", "dedup_minhash_lsh",
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
