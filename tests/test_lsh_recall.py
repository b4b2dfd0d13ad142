"""LSH near-dup recall on TRUE near-duplicates.

The driver corpus has no high-similarity pairs (max cosine ~0.51), so the
oracle check there exercises correctness but not the operator's purpose.
Here: synthesize vectors with noised copies (cosine ~0.95) and assert the
banded pipeline actually finds them."""

from __future__ import annotations

import math
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def neardup_dir(tmp_path_factory):
    rng = random.Random(7)
    dim = 64
    base = []
    for _ in range(150):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        base.append([x / n for x in v])
    vecs, labels = [], []
    for v in base:
        vecs.append(v)
        labels.append(0)
    # 50 noised copies of the first 50: noise norm ~0.04*sqrt(64)=0.32
    # relative to the unit vector -> cosine ~1/sqrt(1+0.32^2) ~ 0.95
    for i in range(50):
        v = base[i]
        noise = [rng.gauss(0, 0.04) for _ in range(dim)]
        w = [a + b for a, b in zip(v, noise)]
        n = math.sqrt(sum(x * x for x in w))
        vecs.append([x / n for x in w])
        labels.append(1)
    d = tmp_path_factory.mktemp("neardup_sf")
    table = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_lsh_finds_true_neardups(spark, neardup_dir):
    from mit_6_5840_mapreduce_spark.operators.similarity import (
        embedding_neardup_exact, embedding_neardup_lsh)
    exact = {(r.vec_a, r.vec_b) for r in
             embedding_neardup_exact(spark, neardup_dir)
             .where("cos_sim >= 0.9").collect()}
    lsh = {(r.vec_a, r.vec_b) for r in
           embedding_neardup_lsh(spark, neardup_dir)
           .where("cos_sim >= 0.9").collect()}
    assert len(exact) >= 40        # the planted copies are found exactly
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f} on true near-dups"
    assert lsh <= exact            # zero false positives
