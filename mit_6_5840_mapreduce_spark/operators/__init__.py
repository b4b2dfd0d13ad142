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
# than an accident of module ordering. Round-6 window — first round of
# the STEADY-STATE policy (VERDICT r5 item 4; the never-certified
# backlog cleared in round 5): the sentinel set kept in-window EVERY
# round, every round-changed query (q3_shipping_priority: exact
# floor-cents conversion; customer_value_quartiles: distributed exact
# rank replacing the global ntile window), every newly registered query
# (pq_recall_eval, graph_recall_eval), and ALL remaining slots filled
# with the stalest certs from tools/window_plan.py's staleness report
# (ceiling 4 rounds), oldest round first, name tiebreak — the 41 certs
# at/over the ceiling (r1-r2) plus the first r3 cert
# (audio_decode_stats). tests/test_registry_window.py pins this.
WINDOW_SIZE = 50

WINDOW_FIRST: tuple[str, ...] = (
    # sentinels (every round)
    "mr_wc", "mr_wc_rdd", "dedup_exact", "stream_hourly_counts",
    # round-6 changed (re-certify with changed values/plans)
    "q3_shipping_priority", "customer_value_quartiles",
    # round-6 new registrations
    "pq_recall_eval", "graph_recall_eval",
    # staleness rotation: the 2 r1 rows-only + 39 r2 certs ...
    "events_user_sketch", "order_value_percentiles_approx",
    "asof_join_orders", "curation_summary", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped", "dedup_simhash",
    "doc_chunks", "doc_fingerprint", "doc_quality", "doc_split",
    "embedding_lsh_signatures", "embedding_neardup_exact",
    "embedding_neardup_lsh", "embedding_topk", "embedding_topk_pandas",
    "event_transitions", "events_hourly", "events_props_stats",
    "image_decode_stats", "ivf_assign", "ivf_search", "ivf_train",
    "lang_id", "minhash_signatures", "mr_doccount", "mr_docmeta",
    "mr_indexer_rdd", "payload_thumbnail", "simhash_docs",
    "source_quota_cap", "stratified_sample", "stream_dedup_events",
    "stream_sliding_counts", "stream_user_totals", "tfidf_cosine_pairs",
    "tfidf_top_terms", "token_stats", "user_stats", "user_value_mad_sql",
    # ... plus the first r3 cert by name order
    "audio_decode_stats",
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
