"""ivf_train (iterative k-means) vs an independent numpy reference.

The operator is the canonical non-SQL-expressible iterative algorithm
(driver-gate records a rows-only check), so correctness is pinned here:
same deterministic init, same cosine assignment with lowest-id
tiebreak, same mean recombination, same iteration count.
"""

from __future__ import annotations

import numpy as np
import pytest

from mit_6_5840_mapreduce_spark.operators.similarity import (
    KMEANS_ITERS, N_CENTROIDS, ivf_train,
)
from mit_6_5840_mapreduce_spark.sources.tables import load_table


def _numpy_kmeans(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cents = vecs[:N_CENTROIDS].astype(np.float64).copy()
    x = vecs.astype(np.float64)
    xn = np.linalg.norm(x, axis=1)
    assign = None
    for _ in range(KMEANS_ITERS):
        cn = np.linalg.norm(cents, axis=1)
        cs = (x @ cents.T) / (xn[:, None] * cn[None, :])
        assign = cs.argmax(axis=1)  # argmax takes the FIRST max: lowest id
        for k in range(N_CENTROIDS):
            members = x[assign == k]
            if len(members):
                cents[k] = members.mean(axis=0)
    cn = np.linalg.norm(cents, axis=1)
    cs = (x @ cents.T) / (xn[:, None] * cn[None, :])
    assign = cs.argmax(axis=1)
    return cents, assign


def test_ivf_train_matches_numpy(spark, sf_dir):
    rows = (load_table(spark, sf_dir, "embeddings")
            .orderBy("vec_id").collect())
    vecs = np.array([r.embedding for r in rows])
    cents, assign = _numpy_kmeans(vecs)

    got = {r.centroid_id: r for r in ivf_train(spark, sf_dir).collect()}
    assert len(got) == len(set(assign))
    assert sum(r.n_members for r in got.values()) == len(vecs)
    counts = np.bincount(assign, minlength=N_CENTROIDS)
    for k, r in got.items():
        # float-order ulps can flip borderline assignments between the
        # engines' accumulation orders; sizes must agree within a hair
        assert abs(r.n_members - int(counts[k])) <= 2, (k, r.n_members,
                                                        int(counts[k]))
        for j, v in enumerate((r.c0, r.c1, r.c2)):
            assert v == pytest.approx(cents[k][j], abs=2e-4)


def test_ivf_train_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, ivf_train(spark, sf_dir).collect()))
    b = sorted(map(tuple, ivf_train(spark, sf_dir).collect()))
    assert a == b
