"""Differential correctness: every declared query vs its DuckDB oracle at
sf0.001 — the in-repo mirror of the driver's t2 gate. (The slower sf0.01
sweep is `python tools/parity.py /root/testdata/sf0.01`.)"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from parity import canon  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    from mit_6_5840_mapreduce_spark.sources.tables import TABLES
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")
    return con


# Round 8 (VERDICT r7 item 1): the rows-only class is EMPTY — the
# former members (sketches, k-means, graph-ANN, BPE, numpy top-k) all
# gained oracles (unrolled SQL replay / validated scratch artifacts /
# shared brute-force SQL). This pin makes any future oracle-less
# registration a loud failure instead of a silent err:no_oracle row.
NO_ORACLE: set[str] = set()


def test_every_query_has_an_oracle():
    assert set(QUERIES) - set(ORACLES) == NO_ORACLE
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    got = canon(QUERIES[name](spark, sf_dir).toPandas())
    want = canon(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    if not got.equals(want):
        diff = (got != want).any(axis=1)
        bad = diff[diff].index[:3]
        raise AssertionError(
            f"{name}: {int(diff.sum())} mismatched rows, first: "
            + "; ".join(f"{got.loc[i].to_dict()} != {want.loc[i].to_dict()}"
                        for i in bad))
