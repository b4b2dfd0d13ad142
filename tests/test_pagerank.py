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


def test_bfs_hops_multi_hop_and_unreached(spark):
    """Hand-built graph: chain 0-1-...-8 (bfs_hops seeds on
    doc_id % BFS_SEED_MOD == 0, so 0 and 5 are both seeds) plus a
    seeded pair 10-11 (10 % 5 == 0) and a seedless isolated pair
    12-13: hops follow the chain up to BFS_MAX_HOPS=4, nodes beyond
    the cap and the seedless component report -1. Node 11 must
    resolve to 1 hop through seed 10 — distinguishing 'unreached'
    from 'far'."""
    from mit_6_5840_mapreduce_spark.operators.textstats import (
        BFS_MAX_HOPS, BFS_SEED_MOD, bfs_hops,
    )
    assert (BFS_MAX_HOPS, BFS_SEED_MOD) == (4, 5)
    chain = [(i, i + 1) for i in range(0, 8)]     # 0-1-...-8
    extra = [(10, 11), (12, 13)]                  # 10 is a seed; 12/13 not
    und = chain + extra
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und],
        "src long, dst long")
    got = {r.doc_id: r.hops for r in bfs_hops(edges).collect()}
    # seeds: 0 and 5 in the chain; 10 in its pair
    assert got[0] == 0 and got[5] == 0 and got[10] == 0
    assert got[1] == 1 and got[4] == 1 and got[6] == 1
    assert got[2] == 2 and got[3] == 2 and got[7] == 2
    assert got[8] == 3
    assert got[11] == 1
    assert got[12] == -1 and got[13] == -1
