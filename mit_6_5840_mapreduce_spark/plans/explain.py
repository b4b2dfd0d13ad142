"""Physical-plan inspection helpers — the engine's scale-discipline API.

Every operator in this repo is expected to satisfy, at any scale factor:

- filters and column pruning reach the parquet scan (``pushed_filters``,
  ``read_schema``)
- small dimensions broadcast (``has_broadcast_join``)
- no accidental cartesian products (``has_cartesian_product``)
- no Python in the row path unless deliberately Arrow-batched
  (``has_python_eval``)

tests/test_plans.py enforces these for the whole query registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the (possibly adaptive, pre-execution) physical plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') text, including scan details."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("formatted"))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines from every scan node (one string per scan)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines from every scan node."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line[len("ReadSchema:"):].strip())
    return out


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in executed_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_python_eval(df: DataFrame) -> bool:
    """True if rows cross into Python (Batch/ArrowEvalPython, mapInPandas,
    grouped applyInPandas) — the slow path unless explicitly intended."""
    plan = executed_plan(df)
    return ("EvalPython" in plan or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan)
