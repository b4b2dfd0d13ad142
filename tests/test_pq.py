"""Product-quantization invariants + a bit-exact reference check.

The PQ pair (pq_encode / pq_search) is oracle-certified by the driver
gate; these tests pin the quantizer's own contract — code ranges, the
anchor property (codebook vectors quantize to themselves with zero
error), and bit-exact agreement of the encode with an independent
Python left-fold reference (the same ordered IEEE-double chain the
Spark plan and the DuckDB oracle both compute).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.operators.similarity import (
    PQ_FP_SCALE,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
)


@pytest.fixture(scope="module")
def encoded(spark, sf_dir):
    rows = entrymod.queries()["pq_encode"](spark, sf_dir).collect()
    return [(r.vec_id, r.subspace, r.code, r.d2_fp) for r in rows]


def test_every_vector_gets_all_subspaces(encoded, sf_dir):
    n_vecs = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'").fetchone()[0]
    assert len(encoded) == n_vecs * PQ_M
    per_vec: dict[int, set[int]] = {}
    for vec_id, subspace, code, _ in encoded:
        per_vec.setdefault(vec_id, set()).add(subspace)
        assert 0 <= code < PQ_K
    assert all(subs == set(range(PQ_M)) for subs in per_vec.values())


def test_anchor_vectors_quantize_with_zero_error(encoded):
    """The codebook is the sub-vectors of vec_id < PQ_K, so those
    vectors must encode with exact zero quantization error in every
    subspace (their own sub-vector is a codeword)."""
    anchor_rows = [r for r in encoded if r[0] < PQ_K]
    assert len(anchor_rows) == PQ_K * PQ_M
    assert all(d2_fp == 0 for _, _, _, d2_fp in anchor_rows)


def test_encode_matches_python_left_fold(encoded, sf_dir):
    """Independent reference: the same ordered left fold in Python
    doubles (float32 -> float64 widening, (a-b)^2 accumulation in index
    order, one floor to fixed point) must reproduce every (code, d2_fp)
    bit-exactly — three engines (Spark, DuckDB via the oracle gate, and
    Python here) agreeing pins the numeric contract."""
    vecs = dict(duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'")
        .fetchall())

    def sub(v, m):
        return v[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]

    def d2_fp(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - float(y)) * (float(x) - float(y))
        return math.floor(acc * PQ_FP_SCALE + 0.5)

    codebook = {(m, k): sub(vecs[k], m)
                for k in range(PQ_K) for m in range(PQ_M)}
    for vec_id, subspace, code, got_fp in encoded:
        dists = [(d2_fp(sub(vecs[vec_id], subspace),
                        codebook[(subspace, k)]), k) for k in range(PQ_K)]
        want_fp, want_code = min(dists)
        assert (code, got_fp) == (want_code, want_fp), \
            f"vec {vec_id} subspace {subspace}"


def test_search_ranks_are_dense_and_deterministic(spark, sf_dir):
    rows = entrymod.queries()["pq_search"](spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # ranks follow (distance, cand_id) strictly
        keys = [(r.approx_d2_fp, r.cand_id) for r in rs]
        assert keys == sorted(keys), f"query {q} rank order broken"
        assert all(r.cand_id != q for r in rs)
