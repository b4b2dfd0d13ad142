"""Physical-plan quality gates — the 100 TB discipline, asserted.

A query that is correct but plans a cartesian product, skips predicate
pushdown, or drags Python into the row path will pass the oracle check and
then fall over at scale; these tests pin the plan shape instead.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()


def explain_formatted(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))


def test_q6_pushes_filters_to_scan(spark, sf_dir):
    plan = explain_formatted(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_q6_prunes_columns(spark, sf_dir):
    plan = explain_formatted(spark, sf_dir, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the 4 referenced columns are read, not all 11
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q5_broadcasts_dimension_tables(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Cross joins are allowed only where one side is broadcast-tiny
    (similarity queries); a non-broadcast CartesianProduct is a scale bug."""
    for name in QUERIES:
        plan = plan_of(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            assert "Broadcast" in plan or name in (
                "embedding_neardup",), f"{name} plans a CartesianProduct"


def test_mr_wc_stays_jvm_side(spark, sf_dir):
    """The DataFrame word count must not serialize rows through Python."""
    plan = plan_of(spark, sf_dir, "mr_wc")
    assert "BatchEvalPython" not in plan
    # AQE shows the pre-execution plan; JVM hash aggregation is the marker
    assert "HashAggregate" in plan


def test_dataframe_queries_avoid_python_row_path(spark, sf_dir):
    """Only multimodal_meta (deliberate mapInPandas) may cross into
    Python; everything else must be pure JVM."""
    for name in QUERIES:
        if name == "multimodal_meta":
            continue
        plan = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} has a Python row path"


def test_asof_join_is_single_shuffle_per_side(spark, sf_dir):
    """The as-of join must be the union-merge plan: no join operator at
    all, just exchanges + window sort."""
    plan = plan_of(spark, sf_dir, "asof_join_orders")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_embedding_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "embedding_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
