"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the orders x lineitem join's dominant cost is shuffling both
fact tables. Writing them bucketed by the join key (``bucketBy`` +
``saveAsTable``) stores rows pre-partitioned by hash(key) so Catalyst
plans the join with ZERO Exchange operators — each task reads matching
buckets from both sides. This module materializes bucketed copies and is
exercised by tests/test_bucketing.py, which asserts the exchange-free
plan and result identity with the shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8,
                   sort_col: str | None = None) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketize_facts(spark: SparkSession, sf_dir: str,
                    n_buckets: int = 8) -> tuple[str, str]:
    """Materialize orders and lineitem bucketed by order key; returns the
    table names. (One-time cost; every subsequent orderkey join is
    shuffle-free.)"""
    from mit_6_5840_mapreduce_spark.sources.tables import load_table
    write_bucketed(load_table(spark, sf_dir, "orders"),
                   "orders_bucketed", "o_orderkey", n_buckets)
    write_bucketed(load_table(spark, sf_dir, "lineitem"),
                   "lineitem_bucketed", "l_orderkey", n_buckets)
    return "orders_bucketed", "lineitem_bucketed"
