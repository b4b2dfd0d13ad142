"""epoch_assembly — the composed curation capstone (r12).

The driver gate value-checks the full composition against the CTE
oracle on the gate corpus; here a PLANTED corpus pins each stage's
contract where membership is known by construction (resample keeps,
split restriction, span scrub shrinking the pack, zero-token drop,
deterministic sequence shuffle), plus the registered oracle diffed
bit-exact on a second distribution.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.operators.dedup import SPAN_TOKENS
from mit_6_5840_mapreduce_spark.operators.textstats import SHUFFLE_SHARDS

SPAN = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
        .split())
assert len(SPAN) == SPAN_TOKENS


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8],
               16) % 100


def _ids(pred, n, start=0):
    out = []
    i = start
    while len(out) < n:
        if pred(_bucket(i)):
            out.append(i)
        i += 1
    return out


def _write(tmp_path_factory, name, rows, sources):
    d = tmp_path_factory.mktemp(name)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_epoch_stage_contracts_on_planted_corpus(spark,
                                                 tmp_path_factory):
    """Single source (resample keeps everything: rate 1000), split
    membership chosen via real md5 buckets:

    - T1 (train): 20 unique tokens — packs whole.
    - T2 (train): the 10-token SPAN + 10 unique tokens — the test doc
      quotes the span, so exactly those 10 positions are cut and T2
      contributes 10 tokens.
    - T3 (train): the SPAN alone — scrubbed to zero tokens, dropped.
    - E (test): the SPAN — detection source; test split never packs.
    - V (val): unique text — val split never packs.

    Expected epoch: ONE sequence (source, seq 0) holding T1 then T2,
    30 tokens, at the md5-derived shard with pos 1."""
    t1, t2, t3 = _ids(lambda b: b < 80, 3)
    (e,) = _ids(lambda b: b >= 90, 1)
    (v,) = _ids(lambda b: 80 <= b < 90, 1)
    uniq1 = [f"unica{i}" for i in range(20)]
    uniq2 = [f"segona{i}" for i in range(10)]
    rows = [
        (t1, " ".join(uniq1)),
        (t2, " ".join(SPAN + uniq2)),
        (t3, " ".join(SPAN)),
        (e, " ".join(SPAN)),
        (v, "valiana text kept out of the epoch entirely"),
    ]
    d = _write(tmp_path_factory, "epoch_plant_sf", rows, ["s0"] * 5)
    got = entrymod.queries()["epoch_assembly"](spark, d).collect()
    assert len(got) == 1
    row = got[0]
    assert row.source == "s0" and row.seq_id == 0
    assert row.n_docs == 2 and row.seq_tokens == 30
    assert row.doc_ids == f"{min(t1, t2)},{max(t1, t2)}"
    shard = int(hashlib.md5(b"shard:s0:0").hexdigest()[:8],
                16) % SHUFFLE_SHARDS
    assert row.shard == shard and row.pos == 1


def test_epoch_oracle_matches_engine_on_second_distribution(
        spark, tmp_path_factory):
    """The REAL registered oracle SQL diffed bit-exact against the
    engine on a two-source corpus dense enough that every stage is
    non-trivial: the size imbalance drives a sub-1000 resample rate
    on the big source (docs genuinely dropped), cross-split quotes
    drive cuts, and multiple sequences per source exercise the pack
    boundary and the sequence shuffle."""
    import duckdb
    import random

    rng = random.Random(20260817)
    rows, sources = [], []
    span_text = " ".join(SPAN)
    for i in range(400):
        n = rng.randint(12, 90)
        words = ["".join(rng.choice("abcdefghijklmnop")
                         for _ in range(rng.randint(2, 9)))
                 for _ in range(n)]
        if rng.random() < 0.15:         # plant cross-doc span copies
            k = rng.randrange(0, max(1, n - SPAN_TOKENS))
            words[k:k + SPAN_TOKENS] = SPAN
        rows.append((i, " ".join(words)))
        sources.append("big" if i % 4 else "small")
    d = _write(tmp_path_factory, "epoch_dense_sf", rows, sources)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(d, 'documents.parquet')}'")
    oracle = entrymod.oracle_sql()["epoch_assembly"]
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    got = sorted(
        (r.source, r.seq_id, r.n_docs, r.seq_tokens, r.doc_ids,
         r.shard, r.pos)
        for r in entrymod.queries()["epoch_assembly"](spark, d).collect())
    assert got == want
    assert len(got) > 10                       # multiple sequences
    assert len({g[0] for g in got}) == 2       # both sources packed


def test_epoch_pack_boundary_uses_first_token_rule(spark,
                                                   tmp_path_factory):
    """pack_sequences' rule carried into the epoch: a document belongs
    to the sequence its FIRST surviving token lands in, so a doc that
    straddles the PACK_BUDGET boundary stays in the earlier sequence
    and the NEXT doc opens the new one. Planted: 250 + 20 + 10 tokens
    in doc_id order -> seq 0 holds docs 1-2 (270 tokens: doc 2 starts
    at offset 250 < 256), seq 1 holds doc 3 (starts at 270)."""
    from mit_6_5840_mapreduce_spark.operators.textstats import PACK_BUDGET
    assert PACK_BUDGET == 256   # the arithmetic below is written to it
    t1, t2, t3 = _ids(lambda b: b < 80, 3)
    rows = [
        (t1, " ".join(f"prima{i}" for i in range(250))),
        (t2, " ".join(f"secunda{i}" for i in range(20))),
        (t3, " ".join(f"tertia{i}" for i in range(10))),
    ]
    # ids must ascend with the intended packing order
    rows = [(i, txt) for i, (_, txt) in zip(sorted((t1, t2, t3)), rows)]
    d = _write(tmp_path_factory, "epoch_boundary_sf", rows, ["s0"] * 3)
    got = {r.seq_id: r for r in
           entrymod.queries()["epoch_assembly"](spark, d).collect()}
    a, b, c = sorted((t1, t2, t3))
    assert set(got) == {0, 1}
    assert got[0].n_docs == 2 and got[0].seq_tokens == 270
    assert got[0].doc_ids == f"{a},{b}"
    assert got[1].n_docs == 1 and got[1].seq_tokens == 10
    assert got[1].doc_ids == str(c)


def test_epoch_empty_corpus_yields_zero_rows(spark, tmp_path_factory):
    """Empty-corpus contract: no documents -> no sequences, and the
    oracle agrees (the resample stage's zero-total guard and the
    scrub's empty train split compose to an empty epoch, not an
    error)."""
    import duckdb
    d = _write(tmp_path_factory, "epoch_empty_sf", [], [])
    assert entrymod.queries()["epoch_assembly"](spark, d).count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(d, 'documents.parquet')}'")
    assert con.execute(
        entrymod.oracle_sql()["epoch_assembly"]).fetchall() == []
