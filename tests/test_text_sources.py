"""Whole-text-file sources feeding the MR pipeline — the reference's
exact input lifecycle (files on disk -> (name, contents) -> mapf)."""

from __future__ import annotations

import os

import pytest

from mit_6_5840_mapreduce_spark.mr.api import collect_output, mr_run
from mit_6_5840_mapreduce_spark.mr.apps import APPS
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential
from mit_6_5840_mapreduce_spark.sources.text import (
    documents_from_dir,
    whole_text_files,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, documents):
    d = tmp_path_factory.mktemp("corpus")
    for name, contents in documents[:20]:
        (d / f"pg-{name}.txt").write_text(contents, encoding="utf-8")
    return str(d)


def test_wholetextfiles_feeds_mr_run(spark, corpus_dir, documents):
    inputs = whole_text_files(spark, os.path.join(corpus_dir, "*.txt"))
    mapf, reducef = APPS["wc"]
    got = collect_output(mr_run(spark, mapf, reducef, inputs, n_reduce=5))
    want = sorted(mr_sequential(
        mapf, reducef,
        [(f"pg-{n}.txt", c) for n, c in documents[:20]]))
    assert got == want


def test_documents_from_dir_matches_files(spark, corpus_dir, documents):
    df = documents_from_dir(spark, os.path.join(corpus_dir, "*.txt"))
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows == {f"pg-{n}.txt": c for n, c in documents[:20]}
