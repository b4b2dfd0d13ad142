"""bench.py contract consistency: the frozen headline set, its
round-1 baseline table, and the registry must stay in sync — a rename
in the registry or a drifted baseline key would otherwise surface only
as a driver-round bench crash."""

from __future__ import annotations

import bench


def test_baseline_covers_exactly_the_headline_set():
    assert set(bench.BASELINE_R1) == set(bench.HEADLINE)


def test_headline_queries_are_registered_with_oracles():
    from mit_6_5840_mapreduce_spark.operators import registry
    queries, oracles = registry()
    missing = [n for n in bench.HEADLINE if n not in queries]
    assert not missing, f"headline queries not registered: {missing}"
    no_oracle = [n for n in bench.HEADLINE if n not in oracles]
    assert not no_oracle, f"headline queries without oracles: {no_oracle}"


def test_bench_extra_set_is_registered_with_oracles_or_rows_only():
    """Every extra-timed query must exist in the registry (the bench
    would crash at runtime otherwise)."""
    import inspect
    import re

    import bench
    import __spark_entry__ as entrymod
    q = entrymod.queries()
    # EXTRA is defined inside main(); re-derive it from the source to
    # keep the contract honest without executing Spark
    src = inspect.getsource(bench)
    m = re.search(r"EXTRA = \(([^)]*)\)", src)
    assert m, "EXTRA tuple not found"
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert names, "EXTRA parsed empty"
    unknown = [n for n in names if n not in q]
    assert not unknown, f"EXTRA names not registered: {unknown}"
