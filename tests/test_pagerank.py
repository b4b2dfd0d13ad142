"""doc_pagerank vs an independent numpy power iteration with identical
graph, damping, and round count."""

from __future__ import annotations

import numpy as np
import pytest

from mit_6_5840_mapreduce_spark.operators.textstats import (
    PAGERANK_DAMPING, PAGERANK_ITERS, doc_pagerank, tfidf_cosine_pairs,
)


def test_pagerank_matches_numpy(spark, sf_dir):
    pairs = tfidf_cosine_pairs(spark, sf_dir).collect()
    edges = {}
    for r in pairs:
        edges.setdefault(r.doc_a, []).append((r.doc_b, r.cos_sim))
        edges.setdefault(r.doc_b, []).append((r.doc_a, r.cos_sim))
    nodes = sorted(edges)
    idx = {d: i for i, d in enumerate(nodes)}
    n = len(nodes)
    assert n > 0, "corpus produced no similarity edges at this sf"
    T = np.zeros((n, n))
    for src, outs in edges.items():
        out_w = sum(w for _, w in outs)
        for dst, w in outs:
            T[idx[dst], idx[src]] += w / out_w
    r = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        r = (1 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * (T @ r)

    got = {row.doc_id: row.rank
           for row in doc_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(nodes)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)
    for d in nodes:
        assert got[d] == pytest.approx(r[idx[d]], abs=1e-5), d
