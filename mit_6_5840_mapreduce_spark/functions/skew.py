"""Skew-mitigation primitives for hot-key aggregations.

At 100 TB a handful of hot keys (stopwords in wc, bot users in events)
serialize an otherwise-parallel aggregation. Two standard remedies, both
exposed here:

1. AQE skew-join splitting — already on in session.py
   (``spark.sql.adaptive.skewJoin.enabled``), handles skewed JOINS.
2. Two-phase salted aggregation for skewed GROUP BYs — this module:
   partial-aggregate on (key, salt), then final-aggregate on key. The
   row count entering the wide shuffle shrinks to ``n_keys * n_salts``
   regardless of input skew.

``salted_agg`` is semantics-preserving for any aggregate expressible as
(partial, merge) — the same contract Spark's own partial aggregation
uses. For built-in aggs over unsalted keys Catalyst already does
map-side partial aggregation; salting matters when the DISTINCT-ish
state per key is large (collect_set, countDistinct) or when a custom
pandas UDAF forces a full shuffle by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Add a uniform salt column derived from a stable row hash (NOT
    rand() — deterministic across retries, so task re-execution cannot
    change results; cf. the reference's deterministic-replay contract)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))


def salted_count_distinct(df: DataFrame, key: str, value: str,
                          n_salts: int = 16) -> DataFrame:
    """count(DISTINCT value) per key, skew-safe: distinct state is built
    per (key, salt) — each at most 1/n_salts of the hot key's values
    (salt derives from the VALUE, so duplicates land in the same salt
    and the per-salt distinct counts are disjoint and additive)."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)),
                                           F.lit(n_salts)))
    partial = (
        salted.groupBy(key, "_salt")
        .agg(F.countDistinct(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").alias("n_distinct"))


def salted_collect_set(df: DataFrame, key: str, value: str,
                       n_salts: int = 16) -> DataFrame:
    """sort_array(collect_set(value)) per key via two-phase salted
    aggregation — per-task state bounded by the salt fan-out."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)),
                                           F.lit(n_salts)))
    partial = (
        salted.groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_vals"))
    )
    return partial.groupBy(key).agg(
        F.sort_array(F.flatten(F.collect_list("_vals"))).alias("values"))
