"""Approximate-sketch queries: bounded error vs exact (no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.sources.tables import load_table


def test_sketch_within_rsd_bounds(spark, sf_dir):
    got = {r.event_type: r.approx_users
           for r in entrymod.queries()["events_user_sketch"](
               spark, sf_dir).collect()}
    exact = {r.event_type: r.n
             for r in load_table(spark, sf_dir, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for t, est in got.items():
        # HLL++ at rsd=5%: allow 4 sigma
        assert abs(est - exact[t]) <= max(2, 0.2 * exact[t]), \
            f"{t}: approx {est} vs exact {exact[t]}"


def test_sketch_has_no_oracle_on_purpose():
    assert "events_user_sketch" not in entrymod.oracle_sql()
    assert "events_user_sketch" in entrymod.queries()
