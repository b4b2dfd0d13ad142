"""Bucketed join: zero exchanges, identical results to the shuffled join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.sources.bucketing import bucketize_facts
from mit_6_5840_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # (warehouse dir is static config; tables land in ./spark-warehouse,
    # which is gitignored and dropped at fixture teardown)
    # disable AQE broadcast demotion interfering with the tiny test data:
    # force the sort-merge path so the bucketing (not a broadcast) is
    # what eliminates the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield bucketize_facts(spark, sf_dir)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def _joined(spark, orders_name, lineitem_name):
    o = spark.table(orders_name)
    l = spark.table(lineitem_name)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    orders_t, lineitem_t = bucketed
    o = spark.table(orders_t)
    l = spark.table(lineitem_t)
    # the bare join: bucket layout must satisfy the join's distribution
    bare = l.join(o, l.l_orderkey == o.o_orderkey)
    plan = bare._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan

    # with the aggregation on top: exactly ONE exchange (for the groupBy
    # re-key), none for the join — vs two/three on unbucketed tables
    agg_plan = _joined(spark, orders_t, lineitem_t)._jdf.queryExecution() \
        .executedPlan().toString()
    assert agg_plan.count("Exchange hashpartitioning") == 1


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed):
    orders_t, lineitem_t = bucketed
    got = {tuple(r) for r in _joined(spark, orders_t, lineitem_t).collect()}
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    want = {tuple(r) for r in
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total"))
            .collect()}
    assert got == want
