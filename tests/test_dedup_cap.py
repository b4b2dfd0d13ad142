"""The hot-shingle doc-frequency cap (dedup.py max_df).

A single corpus-wide stop-shingle makes the inverted-index join emit
O(n_docs^2) candidate pairs — the one quadratic failure mode of exact
n-gram Jaccard at 100 TB. Plant exactly that corpus and assert the cap
removes the blowup while the uncapped form exhibits it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mit_6_5840_mapreduce_spark.operators.dedup import dedup_ngram_jaccard

N_DOCS = 60


@pytest.fixture(scope="module")
def stop_shingle_dir(tmp_path_factory):
    """Every document: 3x 'stop' then two unique tokens — so all docs
    share exactly the one shingle 'stop stop stop' (df = N_DOCS) and
    nothing else. 3 shingles/doc => pairwise jaccard 1/5 = 0.2, above
    the 0.1 output threshold."""
    texts = [f"stop stop stop unique{i}a unique{i}b" for i in range(N_DOCS)]
    d = tmp_path_factory.mktemp("stop_shingle_sf")
    table = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * N_DOCS, pa.string()),
        "source": pa.array(["synthetic"] * N_DOCS, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_uncapped_hot_shingle_is_quadratic(spark, stop_shingle_dir):
    n = dedup_ngram_jaccard(spark, stop_shingle_dir).count()
    assert n == N_DOCS * (N_DOCS - 1) // 2      # every pair survives


def test_cap_removes_hot_shingle_blowup(spark, stop_shingle_dir):
    n = dedup_ngram_jaccard(spark, stop_shingle_dir,
                            max_df=N_DOCS - 1).count()
    assert n == 0                               # only the stop shingle joined

def test_cap_keeps_legit_pairs(spark, stop_shingle_dir, tmp_path_factory):
    """A pair sharing a RARE shingle survives the cap."""
    texts = [f"stop stop stop unique{i}a unique{i}b" for i in range(20)]
    # docs 20/21 share a rare 5-token run => 3 shared rare shingles
    texts += ["stop stop stop rare one two three four",
              "stop stop stop rare one two three five"]
    d = tmp_path_factory.mktemp("rare_pair_sf")
    table = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["synthetic"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    rows = (dedup_ngram_jaccard(spark, str(d), max_df=10)
            .select("doc_a", "doc_b").collect())
    assert {(r.doc_a, r.doc_b) for r in rows} == {(20, 21)}
