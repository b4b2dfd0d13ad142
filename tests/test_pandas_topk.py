"""embedding_topk_pandas (Arrow/numpy matmul) vs embedding_topk (JVM
fold): BIT-IDENTICAL rows on the gate corpora.

Round 8: the pin tightened from approx(2e-4) to exact equality — the
pandas variant now SHARES embedding_topk's DuckDB oracle (VERDICT r7
item 1), which is only honest while the floor4 scores (and therefore
ranks) agree exactly on the corpora the driver gate runs. Sum-order
freedom between numpy matmul and the SQL fold could in principle move
a score across a floor4 boundary on some OTHER corpus; this test makes
any such drift on the gate corpora a loud pytest failure before the
driver ever compares hashes.
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators.similarity import (
    embedding_topk, embedding_topk_pandas,
)


def _rows(df):
    return sorted(
        (r.query_id, r.cand_id, r.cos_sim, r.rank) for r in df.collect())


def test_pandas_topk_bit_identical_to_jvm_topk(spark, sf_dir):
    jvm = _rows(embedding_topk(spark, sf_dir))
    arrow = _rows(embedding_topk_pandas(spark, sf_dir))
    assert jvm == arrow
