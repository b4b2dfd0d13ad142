"""MR-compat layer vs the pure-Python sequential oracle — the exact shape
of the reference's golden-diff harness (``src/main/test-mr.sh:78-144``):
run distributed, run sequential, compare the canonical sorted union.
"""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_spark.mr.api import collect_output, ihash, mr_run
from mit_6_5840_mapreduce_spark.mr.apps import APPS
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential


@pytest.mark.parametrize("app", sorted(APPS))
def test_app_matches_sequential_oracle(spark, documents, app):
    mapf, reducef = APPS[app]
    got = collect_output(mr_run(spark, mapf, reducef, documents, n_reduce=10))
    want = sorted(mr_sequential(mapf, reducef, documents))
    assert got == want


def test_reduce_sees_all_values_in_one_call(spark, documents):
    """The defining semantic: reducef(key, values) receives EVERY value of
    the key at once (never partial/combined), src/mr/worker.go:176-192."""
    def counting_reduce(key: str, values: list[str]) -> str:
        # executed on executors; assert via output instead of shared state
        return f"{len(values)}"

    out = collect_output(mr_run(
        spark, lambda n, c: [("k", n)], counting_reduce,
        documents, n_reduce=3))
    # single key "k": exactly one output line whose value = total doc count
    assert out == [f"k {len(documents)}"]


def test_output_is_key_sorted_within_partitions(spark, documents):
    mapf, reducef = APPS["wc"]
    rdd = mr_run(spark, mapf, reducef, documents, n_reduce=5)
    parts = rdd.glom().collect()
    assert len(parts) == 5
    for part in parts:
        keys = [line.split(" ", 1)[0] for line in part]
        assert keys == sorted(keys)


def test_partitioning_is_by_key_hash(spark, documents):
    """Every output partition holds exactly the keys that FNV-hash to it
    (src/mr/worker.go:32-36,130-133)."""
    mapf, reducef = APPS["wc"]
    n = 5
    parts = mr_run(spark, mapf, reducef, documents, n_reduce=n) \
        .glom().collect()
    for idx, part in enumerate(parts):
        for line in part:
            key = line.split(" ", 1)[0]
            assert ihash(key) % n == idx


def test_ihash_reference_values():
    """FNV-32a spot checks (independently computable constants)."""
    # FNV-32a("") = offset basis; masked to 31 bits
    assert ihash("") == 2166136261 & 0x7FFFFFFF
    # FNV-32a("a") = 0xe40c292c
    assert ihash("a") == 0xE40C292C & 0x7FFFFFFF


def test_retry_determinism(spark, documents):
    """Crash-test analogue (src/main/test-mr.sh:284-330): a map task that
    fails once and is retried must produce byte-identical output."""
    import os
    import tempfile

    marker_dir = tempfile.mkdtemp(prefix="mr_crash_")
    mapf, reducef = APPS["wc"]

    def crashing_map(name: str, contents: str):
        marker = os.path.join(marker_dir, "crashed_once")
        if name.endswith("7") and not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected task failure (crash.go analogue)")
        return mapf(name, contents)

    got = collect_output(mr_run(spark, crashing_map, reducef,
                                documents, n_reduce=10))
    want = sorted(mr_sequential(mapf, reducef, documents))
    assert got == want


def test_map_tasks_run_in_parallel(spark, documents):
    """mtiming analogue (src/main/test-mr.sh:147-174): the map phase uses
    >= 2 concurrent slots under local[4]."""
    sc = spark.sparkContext
    n_parts = sc.parallelize(documents, 4).mapPartitions(
        lambda it: [1]).collect()
    assert len(n_parts) >= 2


def test_exactly_once_absent_failures(spark, documents):
    """jobcount analogue (src/main/test-mr.sh:201-223): without failures,
    each input record is mapped exactly once (speculation off)."""
    acc = spark.sparkContext.accumulator(0)
    mapf, reducef = APPS["doccount"]

    def counting_map(name: str, contents: str):
        acc.add(1)
        return mapf(name, contents)

    collect_output(mr_run(spark, counting_map, reducef, documents,
                          n_reduce=10))
    assert acc.value == len(documents)
