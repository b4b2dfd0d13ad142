"""Artifact-writing queries must be idempotent within one session.

Queries that materialize side artifacts — catalog databases and bucketed
tables (dedup_incremental, bucketed_join_stats), scratch parquet indexes
(hnsw_search_persisted), versioned streaming snapshots
(stream_cdc_upsert), incremental MV state (mv_incremental_refresh),
format round-trip files — are exercised exactly ONCE by the parity gate
and the driver. A long-lived session (notebook, scheduler, repeated
gate) calls them repeatedly: the second call must return the identical
result, not trip over the first call's catalog entries, wiped scratch
locations, or leftover checkpoints.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

ARTIFACT_QUERIES = (
    "dedup_incremental",        # CREATE DATABASE + bucketed saveAsTable
    "bucketed_join_stats",      # second catalog DB + two bucketed tables
    "hnsw_search_persisted",    # scratch parquet edge index
    "mv_incremental_refresh",   # incremental MV base + delta state
    "stream_cdc_upsert",        # versioned foreachBatch snapshots
    "csv_roundtrip_stats",      # scratch-file format round trip
    "xml_roundtrip_stats",      # scratch-file XML round trip
    "pyds_roundtrip_stats",     # Python DataSource write+read
    "dedup_index_build",        # index artifact (value-checked rows)
    "stream_foreachbatch_roundtrip",  # foreachBatch parquet sink
    "stream_topk_event_types",  # append-sink ranking over scratch files
    "graph_recall_eval",        # scratch parquet candidate artifact
)


@pytest.mark.parametrize("name", ARTIFACT_QUERIES)
def test_second_run_matches_first(spark, sf_dir, name):
    q = entrymod.queries()[name]
    first = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert first, name
    second = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert second == first, f"{name}: second in-session run diverged"
