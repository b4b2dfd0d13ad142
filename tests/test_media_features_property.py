"""Property test for media_features' cross-engine float chain.

The oracle-parity gate exercises the featurizer only on the synthetic
corpus text; the bit-identity claim (exact integer sums -> mirrored
float chain -> floor4) must hold for ANY payload. Hypothesis drives
arbitrary unicode documents — including pathological ones (empty,
all-identical bytes giving zero variance, single-pixel-row minimums,
high-codepoint UTF-8) — through the numpy featurizer and the DuckDB
oracle side by side, without Spark (the pandas batch body and the SQL
are exactly what the distributed forms run)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.operators.multimodal import (
    _MEDIA_FEATURES_ORACLE,
    _ROW_BYTES,
    _extract_features,
)


def _numpy_side(texts: list[str]) -> pd.DataFrame:
    pdf = pd.DataFrame({
        "doc_id": list(range(len(texts))),
        "payload": [t.encode("utf-8") for t in texts],
    })
    out = pd.concat(list(_extract_features(iter([pdf]))),
                    ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def _oracle_side(texts: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    docs = pd.DataFrame({"doc_id": list(range(len(texts))),
                         "text": texts})
    con.register("documents", docs)
    out = con.execute(_MEDIA_FEATURES_ORACLE).df()
    return out.sort_values("doc_id").reset_index(drop=True)


def _canon(df: pd.DataFrame) -> list[tuple]:
    rows = []
    for _, r in df.iterrows():
        rows.append((int(r["doc_id"]),) + tuple(
            f"{r[f'f{k}']:.6f}" for k in range(8)))
    return rows


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=200), min_size=1, max_size=8))
def test_features_bit_identical_on_arbitrary_text(texts):
    got = _canon(_numpy_side(texts))
    want = _canon(_oracle_side(texts))
    assert got == want


@pytest.mark.parametrize("text", [
    "",                                  # no payload at all
    "a" * (_ROW_BYTES - 1),              # one byte short of a pixel row
    "a" * _ROW_BYTES,                    # exactly one row, zero variance
    "\x00" * 24,                         # NUL bytes, sum 0
    "ÿ" * 12,                       # 2-byte UTF-8 sequences
    "\U0001f600" * 6,                    # 4-byte UTF-8 sequences
])
def test_features_edge_payloads(text):
    got = _canon(_numpy_side([text]))
    want = _canon(_oracle_side([text]))
    assert got == want
