"""Query library. Each module exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-ANSI SQL computing the same result
  on the same parquet tables (omitted for non-SQL-expressible ops).

``registry()`` merges all modules for ``__spark_entry__``.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _with_package(fn: Callable[[SparkSession, str], DataFrame]
                  ) -> Callable[[SparkSession, str], DataFrame]:
    """Ensure executors can import this package even when the caller built
    its own SparkSession from an arbitrary cwd (the driver does)."""
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mit_6_5840_mapreduce_spark.session import attach_package
        attach_package(spark)
        return fn(spark, sf_dir)
    return wrapped


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]],
                        dict[str, str]]:
    from mit_6_5840_mapreduce_spark.operators import (
        dedup,
        events,
        mrqueries,
        multimodal,
        relational,
        similarity,
        textstats,
    )
    from mit_6_5840_mapreduce_spark.streaming import jobs as streaming_jobs
    modules = (mrqueries, relational, events, dedup, similarity, textstats,
               multimodal, streaming_jobs)
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        overlap = set(m.QUERIES) & set(queries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update({name: _with_package(fn)
                        for name, fn in m.QUERIES.items()})
        oracles.update(m.ORACLES)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
