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


def test_incremental_dedup_index_side_has_no_exchange(spark, sf_dir):
    """dedup_incremental's probe join must read the persisted shingle
    index IN PLACE: the index is written bucketed by ``hs``, so the
    plan has no Exchange above the index scan — only the (small) new
    batch shuffles into the bucket partitioning. Forces the sort-merge
    path so the bucketing, not a broadcast, is what eliminates the
    index-side exchange."""
    from mit_6_5840_mapreduce_spark.operators.dedup import (
        INCR_INDEX_BUCKETS, dedup_index_build, _incr_split,
        _doc_shingles,
    )
    from mit_6_5840_mapreduce_spark.sources.bucketing import write_bucketed
    from mit_6_5840_mapreduce_spark.sources.scratch import scratch_dir
    # a test-owned database, NOT the operator's INCR_INDEX_DB: CREATE
    # DATABASE IF NOT EXISTS ignores LOCATION when the DB already
    # exists, so sharing the name would make this test order-dependent
    # with any earlier dedup_incremental run in the session (and would
    # leave the operator's index under the test's location afterwards)
    test_db = "graft_dedup_index_plan_test"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        loc = scratch_dir("dedup_index_plan")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {test_db} "
                  f"LOCATION '{loc}'")
        write_bucketed(dedup_index_build(spark, sf_dir),
                       f"{test_db}.shingle_index_plan", "hs",
                       INCR_INDEX_BUCKETS)
        index = spark.table(
            f"{test_db}.shingle_index_plan").select("hs")
        _, new_sh = _incr_split(_doc_shingles(spark, sf_dir))
        plan = (new_sh.join(index, "hs")._jdf.queryExecution()
                .executedPlan().toString())
        assert "SortMergeJoin" in plan
        # the index scan reads its buckets in place...
        assert "Bucketed: true" in plan
        # ...with no Exchange anywhere on the index branch: the index
        # scan is the join's last child, so its branch is everything
        # after the final Sort — which must be exchange-free
        index_branch = plan[plan.rindex("+- Sort"):]
        assert "shingle_index_plan" in index_branch
        assert "Exchange" not in index_branch
        # and the twin joined against the UNBUCKETED same files needs
        # exactly one MORE exchange — the index-side one we eliminated
        flat = spark.read.parquet(
            f"{loc}/shingle_index_plan").select("hs")
        flat_plan = (new_sh.join(flat, "hs")._jdf.queryExecution()
                     .executedPlan().toString())
        assert (flat_plan.count("Exchange hashpartitioning")
                == plan.count("Exchange hashpartitioning") + 1)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {test_db}.shingle_index_plan")
        spark.sql(f"DROP DATABASE IF EXISTS {test_db}")


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
