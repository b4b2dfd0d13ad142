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
