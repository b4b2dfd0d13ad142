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


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    row = entrymod.queries()["order_value_percentiles_approx"](
        spark, sf_dir).collect()[0]
    exact = load_table(spark, sf_dir, "orders").select(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
        .alias("p")).collect()[0].p
    for approx, true in zip((row.p50, row.p90, row.p99), exact):
        # GK sketch at accuracy 10000 over this corpus: sub-percent error
        assert abs(approx - true) <= max(1.0, 0.01 * true), (approx, true)
    assert row.n_orders > 0


def test_cms_never_underestimates(spark, sf_dir):
    """The count-min guarantee: every estimate >= the exact count, and
    the gate corpus actually produces collisions (vocabulary of ~900
    bigrams into 512 columns) so the sketch is not trivially exact."""
    import __spark_entry__ as entrymod
    rows = entrymod.queries()["heavy_hitters_cms"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_estimate == r.exact_count + r.overestimate
               for r in rows)
