"""Perceptual-hash property tests.

The oracle gate proves the phash VALUES; these tests prove the hash is
actually perceptual: a global brightness shift (every pixel byte + d)
leaves the hash bit-identical — provable-exact for the block-mean
cross-multiplication form, since (s_j + d*c_j)*c_k > (s_k + d*c_k)*c_j
reduces to the unshifted comparison — while structural reordering of
the same bytes changes it for non-degenerate images.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

N_BASE = 20
SHIFT = 5


@pytest.fixture(scope="module")
def phash_dir(tmp_path_factory):
    """Documents where doc 2i+1 is doc 2i with every byte shifted +SHIFT
    (all chars kept ASCII so the UTF-8 payload shifts bytewise)."""
    rng = random.Random(11)
    texts = []
    for _ in range(N_BASE):
        base = "".join(chr(rng.randrange(97, 117)) for _ in range(240))
        texts.append(base)
        texts.append("".join(chr(ord(ch) + SHIFT) for ch in base))
    out = tmp_path_factory.mktemp("phash_docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["synth"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(str(out), "documents.parquet"))
    return str(out)


def test_phash_is_brightness_invariant(spark, phash_dir):
    rows = entrymod.queries()["image_phash"](spark, phash_dir).collect()
    ph = {r.doc_id: r.phash for r in rows}
    assert len(ph) == 2 * N_BASE
    for i in range(N_BASE):
        assert ph[2 * i] == ph[2 * i + 1], f"pair {i} diverged"


def test_phash_separates_structurally_different_images(spark, phash_dir):
    """Distinct random base images should rarely collide — the sketch
    must carry structure, not be constant."""
    rows = entrymod.queries()["image_phash"](spark, phash_dir).collect()
    base_hashes = {r.phash for r in rows if r.doc_id % 2 == 0}
    assert len(base_hashes) >= N_BASE // 2
