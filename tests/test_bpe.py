"""BPE training pinned against a sequential pure-Python reference.

The distributed loop (operators/bpe.py) must produce the EXACT merge
table — same pairs, same order, same counts — as a straightforward
single-machine BPE over the same word-frequency dict: the determinism
rules (count DESC, lexicographic pair tiebreak, greedy left-to-right
merge application) leave no legal divergence.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.operators.bpe import BPE_MERGES, EOW


def _python_tokens(s: str) -> list[str]:
    toks, cur = [], []
    for ch in s:
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            toks.append("".join(cur))
            cur = []
    if cur:
        toks.append("".join(cur))
    return toks


def _reference_bpe(word_counts: dict[str, int], k: int):
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, c))
        fused = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, cnt in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == a and x == b:
                    out.append(fused)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def word_counts(sf_dir) -> dict[str, int]:
    rows = duckdb.connect().execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    counts: Counter = Counter()
    for (text,) in rows:
        counts.update(_python_tokens(text.lower()))
    return dict(counts)


def test_bpe_train_matches_python_reference(spark, sf_dir, word_counts):
    got = [(r.rank, r.left, r.right, r.pair_count) for r in
           entrymod.queries()["bpe_train"](spark, sf_dir).collect()]
    got.sort()
    want = _reference_bpe(word_counts, BPE_MERGES)
    assert got == want


def test_bpe_merges_are_ranked_and_monotonic_enough(spark, sf_dir):
    """Structural invariants: dense ranks 1..K, every merged pair
    count positive, and no (left, right) pair repeats."""
    rows = sorted(entrymod.queries()["bpe_train"](spark, sf_dir)
                  .collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == BPE_MERGES
    assert all(r.pair_count > 0 for r in rows)
    assert len({(r.left, r.right) for r in rows}) == len(rows)


def test_bpe_encode_matches_python_reference(spark, sf_dir, word_counts):
    """Per-doc subword counts from the distributed encode must equal
    applying the reference merges to every word sequentially."""
    merges = _reference_bpe(word_counts, BPE_MERGES)

    def encode_len(word: str) -> int:
        syms = list(word) + [EOW]
        for _, a, b, _c in merges:
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
            syms = out
        return len(syms)

    enc_cache = {w: encode_len(w) for w in word_counts}
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    want = {}
    for doc_id, text in rows:
        toks = _python_tokens(text.lower())
        if not toks:
            continue
        n_sub = sum(enc_cache[w] for w in toks)
        import math
        want[doc_id] = (len(toks), n_sub,
                        math.floor(n_sub / len(toks) * 10000) / 10000)
    got = {r.doc_id: (r.n_words, r.n_subwords, r.avg_subwords) for r in
           entrymod.queries()["bpe_encode"](spark, sf_dir).collect()}
    assert got == want


def test_bpe_encode_accepts_pretrained_merges(spark, sf_dir, word_counts):
    """Passing a pre-trained merge table must skip retraining and give
    the identical result (the train-once-encode-many path)."""
    from mit_6_5840_mapreduce_spark.operators.bpe import bpe_encode
    rules = [(r, a, b) for r, a, b, _c in
             _reference_bpe(word_counts, BPE_MERGES)]
    got = {x.doc_id: (x.n_words, x.n_subwords, x.avg_subwords)
           for x in bpe_encode(spark, sf_dir, merge_rules=rules).collect()}
    default = {x.doc_id: (x.n_words, x.n_subwords, x.avg_subwords)
               for x in entrymod.queries()["bpe_encode"](
                   spark, sf_dir).collect()}
    assert got == default
