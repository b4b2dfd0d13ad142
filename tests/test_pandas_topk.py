"""embedding_topk_pandas (Arrow/numpy matmul) vs embedding_topk (JVM
fold): identical top-k members and 4-dp scores, modulo rank swaps at
exact floor4 ties (both variants tie-break deterministically by cand_id
on their own score column, and the scores agree to 4 dp)."""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_spark.operators.similarity import (
    embedding_topk, embedding_topk_pandas,
)


def _by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, []).append((r.cand_id, r.cos_sim))
    return {q: sorted(v) for q, v in out.items()}


def test_pandas_topk_matches_jvm_topk(spark, sf_dir):
    jvm = _by_query(embedding_topk(spark, sf_dir))
    arrow = _by_query(embedding_topk_pandas(spark, sf_dir))
    assert jvm.keys() == arrow.keys()
    for q in jvm:
        jvm_ids = [c for c, _ in jvm[q]]
        arrow_ids = [c for c, _ in arrow[q]]
        assert jvm_ids == arrow_ids, (q, jvm[q], arrow[q])
        for (_, a), (_, b) in zip(jvm[q], arrow[q]):
            assert a == pytest.approx(b, abs=2e-4)
