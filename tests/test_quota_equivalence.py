"""Differential pin for source_quota_cap's salted two-phase top-K.

The scale formulation (phase 1 per (source, salt), phase 2 re-rank)
must be row-identical to the straightforward single-window form on a
corpus with a deliberately skewed hot source — the exact shape the
salting exists for.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mit_6_5840_mapreduce_spark.operators.textstats import (
    SOURCE_QUOTA,
    source_quota_cap,
)


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    """One hot source with 200 docs; five cold sources with 3 each
    (below the quota, so they pass through untouched)."""
    rows = [(i, "hot") for i in range(200)]
    rows += [(200 + s * 3 + j, f"cold{s}") for s in range(5)
             for j in range(3)]
    d = tmp_path_factory.mktemp("skewed_sf")
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["word " * 5] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([25] * len(rows), pa.int64()),
    })
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_two_phase_equals_single_window(spark, skewed_dir):
    got = {(r.doc_id, r.source, r.rk)
           for r in source_quota_cap(spark, skewed_dir).collect()}
    # the reference formulation: one window over the whole source
    docs = spark.read.parquet(os.path.join(skewed_dir,
                                           "documents.parquet"))
    pri = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(pri, F.col("doc_id"))
    want = {(r.doc_id, r.source, r.rk)
            for r in docs.select("doc_id", "source")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= SOURCE_QUOTA).collect()}
    assert got == want
    # hot source capped at the quota, cold sources untouched
    assert sum(1 for _, s, _ in got if s == "hot") == SOURCE_QUOTA
    assert sum(1 for _, s, _ in got if s != "hot") == 15
