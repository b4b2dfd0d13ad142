from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mit_6_5840_mapreduce_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    # local[4,2]: 4 threads, maxFailures=2 — lets the retry-determinism
    # test inject one task failure and still succeed (FIXTURES.md §5)
    spark = get_spark(
        "tests", shuffle_partitions=10,
        extra_conf={"spark.master": "local[4,2]"})
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def documents(sf_dir):
    """(name, contents) pairs for the MR layer, read engine-independently."""
    import duckdb
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    return [(str(doc_id), text) for doc_id, text in rows]
