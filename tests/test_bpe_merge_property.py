"""Property coverage for operators/bpe._merge_pair — the JVM greedy
left-to-right merge fold — on adversarial symbol shapes the corpus
never produces: overlapping same-symbol runs under an (a, a) rule
("aaa" must fuse non-overlapping as ["aa", "a"]), rules whose fused
symbol re-matches lexically ("ab"+"c" next to "a"+"bc"), empty and
1-symbol arrays, and rules absent from the array entirely.

All generated cases run through ONE Spark job (a DataFrame of symbol
arrays per rule) and compare elementwise against the sequential
pend-loop reference test_bpe.py pins training against — so the fold
and the reference can never drift apart silently on shapes outside
the training corpus.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.operators.bpe import _merge_pair


def _python_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, pend = [], None
    for x in syms:
        if pend is None:
            pend = x
        elif pend == a and x == b:
            out.append(a + b)
            pend = None
        else:
            out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return out


ALPHABET = ["a", "b", "c", "ab", "bc", "aa", "</w>"]


def _cases(seed: int, n: int):
    rng = random.Random(seed)
    cases = []
    for i in range(n):
        syms = [rng.choice(ALPHABET)
                for _ in range(rng.randrange(0, 12))]
        a, b = rng.choice(ALPHABET), rng.choice(ALPHABET)
        cases.append((i, syms, a, b))
    # pinned adversarial shapes on top of the random sweep
    cases += [
        (n + 0, ["a", "a", "a"], "a", "a"),           # overlap run
        (n + 1, ["a", "a", "a", "a"], "a", "a"),      # even overlap run
        (n + 2, ["a", "b", "c"], "ab", "c"),          # fused re-match
        (n + 3, [], "a", "b"),                        # empty
        (n + 4, ["a"], "a", "a"),                     # single symbol
        (n + 5, ["b", "a", "b", "a", "b"], "a", "b"), # interleaved
    ]
    return cases


@pytest.mark.parametrize("seed", [7, 1234])
def test_merge_pair_matches_python_reference(spark, seed):
    cases = _cases(seed, 150)
    # group cases by rule so each (a, b) runs as one column expression
    by_rule: dict[tuple[str, str], list[tuple[int, list[str]]]] = {}
    for i, syms, a, b in cases:
        by_rule.setdefault((a, b), []).append((i, syms))
    for (a, b), rows in by_rule.items():
        df = spark.createDataFrame(
            [(i, syms) for i, syms in rows],
            "case_id INT, syms ARRAY<STRING>")
        got = {r.case_id: list(r.merged)
               for r in df.select(
                   "case_id",
                   _merge_pair(F.col("syms"), a, b).alias("merged"))
               .collect()}
        for i, syms in rows:
            assert got[i] == _python_merge(syms, a, b), (
                f"rule ({a!r},{b!r}) on {syms!r}: "
                f"{got[i]!r} != {_python_merge(syms, a, b)!r}")
