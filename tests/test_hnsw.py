"""Graph-ANN (hnsw_search) quality pins — the rows-only operator's
equivalent of an oracle: recall against the exact brute-force twin and
bit-for-bit run-to-run determinism (insertion order, beam ties, and
pruning all tie-break on vec_id, so two runs must agree exactly).
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.operators.similarity import (
    TOP_K,
    embedding_topk,
    hnsw_search,
)


def _hits(df):
    return {(r.query_id, r.cand_id) for r in df.collect()}


def test_hnsw_recall_vs_brute_force(spark, sf_dir):
    """Union-of-shard-topk beam search must recover most of the exact
    top-k. The structural ceiling: a query's true neighbor can only be
    missed by beam-search error inside its own shard, never by the
    merge (each vector lives in exactly one shard)."""
    exact = _hits(embedding_topk(spark, sf_dir))
    approx = _hits(hnsw_search(spark, sf_dir))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall@{TOP_K} = {recall:.2f}"


def test_hnsw_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, hnsw_search(spark, sf_dir).collect()))
    b = sorted(map(tuple, hnsw_search(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_hnsw_persisted_equals_inline(spark, sf_dir):
    """The serving-path form (adjacency built once, materialized to
    parquet, searched via cogroup applyInPandas) must return
    BIT-IDENTICAL rows to the inline build — same deterministic graph,
    same beams."""
    from mit_6_5840_mapreduce_spark.operators.similarity import (
        hnsw_search_persisted,
    )
    inline = sorted(map(tuple, hnsw_search(spark, sf_dir).collect()))
    persisted = sorted(map(tuple,
                           hnsw_search_persisted(spark, sf_dir).collect()))
    assert inline == persisted and len(inline) > 0


def test_hnsw_shard_count_scales_with_corpus():
    """The shard count is a pure, monotone function of corpus size —
    per-shard graph build is serial Python, so shards must grow with
    the data (a fixed count makes the build the 100x bottleneck) while
    staying independent of cluster parallelism for reproducibility."""
    from mit_6_5840_mapreduce_spark.operators.similarity import (
        HNSW_VECS_PER_SHARD, _hnsw_n_shards,
    )
    assert _hnsw_n_shards(0) == 1
    assert _hnsw_n_shards(1) == 1
    assert _hnsw_n_shards(HNSW_VECS_PER_SHARD) == 1
    assert _hnsw_n_shards(HNSW_VECS_PER_SHARD + 1) == 2
    assert _hnsw_n_shards(500) == 2          # the test corpus: 2 shards
    assert _hnsw_n_shards(2000) == 8         # sf0.1
    # growth keeps per-shard build work bounded by the target
    for n in (2000, 200000, 20_000_000):
        assert n <= _hnsw_n_shards(n) * HNSW_VECS_PER_SHARD


def test_hnsw_multi_shard_at_test_scale(spark, sf_dir):
    """The derived shard count at the gate corpus must be > 1 so every
    hnsw test above actually exercises the shard-and-merge path, and
    the physical grouping must produce exactly that many shards."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_spark.operators.similarity import (
        _hnsw_n_shards,
    )
    from mit_6_5840_mapreduce_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    n_shards = _hnsw_n_shards(emb.count())
    assert n_shards > 1
    got = (emb.select(F.pmod(F.xxhash64("vec_id"), F.lit(n_shards))
                      .alias("shard"))
           .distinct().count())
    assert got == n_shards


def test_hnsw_row_contract(spark, sf_dir):
    """Exactly TOP_K ranked rows per query, rank dense from 1, scores
    non-increasing within a query."""
    rows = hnsw_search(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q, "no queries returned"
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == TOP_K
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.cand_id != q for r in rs)


def test_graph_recall_eval_matches_direct_computation(spark, sf_dir):
    """The driver-certified recall audit (r6) must report exactly the
    recall a direct set intersection of its two inputs yields — pins
    the artifact round trip (scratch parquet both engines read) against
    the in-memory truth, so a stale or clobbered artifact can't
    silently distort the certified numbers."""
    from mit_6_5840_mapreduce_spark.operators.similarity import (
        graph_recall_eval,
    )
    exact = _hits(embedding_topk(spark, sf_dir))
    approx = _hits(hnsw_search(spark, sf_dir))
    want = {}
    for q, c in exact:
        want.setdefault(q, [0, 0])[1] += 1
        if (q, c) in approx:
            want[q][0] += 1
    got = {r.query_id: (r.n_hit, r.k)
           for r in graph_recall_eval(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for q, (n_hit, k) in got.items():
        assert (n_hit, k) == (want[q][0], TOP_K), q


def test_graph_recall_oracle_embeds_the_artifact_path():
    """The graph_recall_eval ORACLE reads the scratch artifact the
    operator writes; the two sides must agree on the path (a rename in
    one place would break the driver gate, not pytest, without this)."""
    import os

    from mit_6_5840_mapreduce_spark.operators.similarity import ORACLES
    from mit_6_5840_mapreduce_spark.sources.scratch import scratch_path
    expect = os.path.join(scratch_path("graph_recall_cand"), "cand")
    assert expect in ORACLES["graph_recall_eval"]


def test_graph_recall_oracle_rejects_stale_artifact(spark, sf_dir):
    """Ordering-contract enforcement (ADVICE r6): the oracle embeds a
    process-lifetime artifact path, so it is only meaningful evaluated
    AFTER the Spark side materialized the artifact for the SAME corpus.
    The artifact carries a nonce marker (query_id=-1, cand_id=
    count(embeddings)); an oracle whose embeddings view disagrees must
    raise loudly, not certify a stale candidate set."""
    import os

    import duckdb
    import pytest

    from mit_6_5840_mapreduce_spark.operators.similarity import (
        ORACLES, graph_recall_eval,
    )
    graph_recall_eval(spark, sf_dir).collect()   # writes artifact+nonce
    emb = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb}'")
    assert len(con.execute(ORACLES["graph_recall_eval"]).df()) > 0
    # same process, 'different corpus': a view with one row fewer
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb}' "
                 "WHERE vec_id <> (SELECT max(vec_id) FROM '" + emb + "')")
    with pytest.raises(duckdb.Error, match="different corpus"):
        con2.execute(ORACLES["graph_recall_eval"]).df()


def test_hnsw_scores_match_jvm_fold_at_floor4(spark, sf_dir):
    """ADVICE r8: the driver's hnsw artifact oracle requires every
    numpy beam score (pre-normalized rows, BLAS pairwise-summed dot)
    to equal the SQL sequential-fold cosine bit-exactly at floor4. A
    single ulp landing on a floor4 boundary under a future numpy/BLAS
    would hard-error the driver GATE; this pin makes that drift a
    pytest failure first — the test_pandas_topk discipline applied to
    the graph search. The JVM fold here (F.aggregate, left-to-right)
    is the same fold shape the DuckDB oracle re-derives."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_spark.functions.numeric import floor4
    from mit_6_5840_mapreduce_spark.operators.similarity import (
        _dot, _with_norm,
    )
    from mit_6_5840_mapreduce_spark.sources.tables import load_table

    hits = hnsw_search(spark, sf_dir) \
        .select("query_id", "cand_id", "cos_sim")
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_norm(emb, "query_id", "qv", "qn")
    c = _with_norm(emb, "cand_id", "cv", "cn")
    folded = (hits.join(q, "query_id").join(c, "cand_id")
              .select("query_id", "cand_id", "cos_sim",
                      floor4(_dot(F.col("qv"), F.col("cv"))
                             / (F.col("qn") * F.col("cn")))
                      .alias("fold_sim")))
    rows = folded.collect()
    assert rows, "join lost the hnsw hits"
    bad = [(r.query_id, r.cand_id, r.cos_sim, r.fold_sim)
           for r in rows if r.cos_sim != r.fold_sim]
    assert not bad, f"floor4 disagreement numpy-vs-fold: {bad[:5]}"
