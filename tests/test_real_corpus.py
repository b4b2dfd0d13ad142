"""Golden diff on the reference's REAL corpus.

The reference harness runs wc/indexer over the eight actual Gutenberg
books (``/root/reference/src/main/test-mr.sh:81-144``, ``pg-*.txt``,
~3.3 MB) and diffs against the sequential binary. This is the exact
analogue: ``mr_run`` over the same files via the whole-text source,
diffed line-for-line against ``mr_sequential`` — tokenizer parity proven
on real text (curly quotes, accented letters, ``_italics_`` markup),
not just the property sweep in test_tokenizer_parity.py.

Read-only access to the reference corpus; skipped if absent.
"""

from __future__ import annotations

import glob
import os

import pytest

from mit_6_5840_mapreduce_spark.mr.api import collect_output, mr_run
from mit_6_5840_mapreduce_spark.mr.apps import (
    indexer_map,
    indexer_reduce,
    wc_map,
    wc_reduce,
)
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential
from mit_6_5840_mapreduce_spark.sources.text import whole_text_files

PG_GLOB = "/root/reference/src/main/pg-*.txt"

pytestmark = pytest.mark.skipif(
    not glob.glob(PG_GLOB), reason="reference corpus not present")


@pytest.fixture(scope="module")
def pg_inputs():
    inputs = []
    for path in sorted(glob.glob(PG_GLOB)):
        with open(path, encoding="utf-8") as f:
            inputs.append((os.path.basename(path), f.read()))
    assert len(inputs) == 8
    return inputs


def _spark_lines(spark, mapf, reducef):
    rdd = whole_text_files(spark, PG_GLOB)
    return collect_output(mr_run(spark, mapf, reducef, rdd, n_reduce=10))


def test_wc_golden_diff_on_reference_corpus(spark, pg_inputs):
    golden = sorted(mr_sequential(wc_map, wc_reduce, pg_inputs))
    got = _spark_lines(spark, wc_map, wc_reduce)
    assert got == golden


def test_indexer_golden_diff_on_reference_corpus(spark, pg_inputs):
    golden = sorted(mr_sequential(indexer_map, indexer_reduce, pg_inputs))
    got = _spark_lines(spark, indexer_map, indexer_reduce)
    assert got == golden


@pytest.fixture(scope="module")
def pg_docs_dir(tmp_path_factory, pg_inputs):
    """The 8 Gutenberg books as a ``documents`` table, so the span
    family and BPE run over REAL text (curly quotes, accents,
    ``_italics_`` markup, and the genuinely shared Project Gutenberg
    license boilerplate — organic cross-document duplicate spans the
    synthetic corpus cannot produce)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    texts = [text for _, text in pg_inputs]
    out = tmp_path_factory.mktemp("pg_docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["gutenberg"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(str(out), "documents.parquet"))
    return str(out)


def _oracle_diff(spark, pg_docs_dir, name):
    """Engine vs the REGISTERED DuckDB oracle on the real books,
    exact-tuple comparison (VERDICT r12 item 6)."""
    import duckdb

    import __spark_entry__ as entrymod
    def canon(rows):
        # floats through the driver's 6dp convention (floor4 columns
        # are engine-exact integers divided by 1e4, but the final
        # binary double can differ in the last ulp across engines)
        return sorted(tuple(f"{v:.6f}" if isinstance(v, float) else v
                            for v in r) for r in rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(pg_docs_dir, 'documents.parquet')}'")
    want = canon(tuple(r) for r in
                 con.execute(entrymod.oracle_sql()[name]).fetchall())
    got = canon(tuple(r) for r in
                entrymod.queries()[name](spark, pg_docs_dir).collect())
    assert got == want
    return got


def test_duplicate_spans_oracle_diff_on_reference_corpus(
        spark, pg_docs_dir):
    rows = _oracle_diff(spark, pg_docs_dir, "duplicate_spans")
    assert len(rows) == 8
    # the shared Gutenberg license/header boilerplate must surface as
    # real cross-document duplicated windows in more than one book
    dup_docs = [r for r in rows if r[2] > 0]     # n_dup_windows column
    assert len(dup_docs) >= 2, rows


def test_span_scrub_oracle_diff_on_reference_corpus(spark, pg_docs_dir):
    rows = _oracle_diff(spark, pg_docs_dir, "dedup_span_scrub")
    assert len(rows) == 8


def test_bpe_train_oracle_diff_on_reference_corpus(spark, pg_docs_dir):
    rows = _oracle_diff(spark, pg_docs_dir, "bpe_train")
    assert len(rows) == 12                       # one row per merge round


def test_bigram_pmi_oracle_diff_on_reference_corpus(spark, pg_docs_dir):
    """The PMI oracle linearized through the shared ``token_rows_sql``
    fragment (VERDICT r13 item 2): value-diff engine vs the REGISTERED
    oracle on real book-length documents — the corpus shape where the
    old per-position array-carry class of oracle was measured
    quadratic (the r13 span-family lesson)."""
    rows = _oracle_diff(spark, pg_docs_dir, "bigram_pmi")
    # real English prose: collocations above the count floor must exist
    assert len(rows) > 100


def test_doc_lm_score_oracle_diff_on_reference_corpus(spark, pg_docs_dir):
    """Same linearization class as bigram_pmi (the ``toks[i]``-carry
    rewritten to a pos/pos+1 equi-join over token rows)."""
    rows = _oracle_diff(spark, pg_docs_dir, "doc_lm_score")
    assert len(rows) == 8


def test_ngram_jaccard_capped_oracle_diff_on_reference_corpus(
        spark, pg_docs_dir):
    """Capped dedup family on ORGANIC near-duplicate surface (VERDICT
    r13 item 4): the 8 books share the Project Gutenberg license
    boilerplate, so the shingle inverted index meets real cross-doc
    overlap the synthetic corpus cannot produce."""
    _oracle_diff(spark, pg_docs_dir, "dedup_ngram_jaccard_capped")


def test_shingle_containment_oracle_diff_on_reference_corpus(
        spark, pg_docs_dir):
    rows = _oracle_diff(spark, pg_docs_dir, "shingle_containment")
    # whole-BOOK containment of the shared license boilerplate is a
    # tiny fraction of each 70k-token doc, so both engines agree the
    # thresholded result is EMPTY here — the organic-overlap signal is
    # asserted by the span-family tests above; this diff pins that the
    # inverted-index join + threshold agree on real text
    assert rows == []


def test_minhash_lsh_oracle_diff_on_reference_corpus(spark, pg_docs_dir):
    _oracle_diff(spark, pg_docs_dir, "dedup_minhash_lsh")
