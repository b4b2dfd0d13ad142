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
