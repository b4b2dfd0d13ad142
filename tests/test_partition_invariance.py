"""Results must not depend on the shuffle-partition count.

The driver certifies queries from its OWN SparkSession, whose
``spark.sql.shuffle.partitions`` differs from this suite's (32 vs 10) —
and at 100 TB the count is retuned per deployment. Any operator whose
VALUES depend on physical partitioning (per-partition ids leaking into
output, partition-local sampling, non-commutative merges) would pass a
fixed-conf oracle check and still break under retuning. Representative
queries from every partition-sensitive family — deterministic shuffle,
sequence packing, span windows, iterative CC, sketch build, window
functions, RDD-path MR — are pinned to produce the identical row
multiset under deliberately awkward counts (5 and 37: below and above
parallelism, prime, non-dividing).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SWEEP = ("mr_wc", "training_shuffle", "pack_sequences",
         "duplicate_spans", "dedup_groups", "heavy_hitters_cms_direct",
         "sessionize", "user_scd2",
         # r6: distributed exact rank — approx-percentile split points
         # vary with sketch merge order, output values must not
         "customer_value_quartiles",
         # r7: two-stage exact money sums — chunk ids (spark_partition_id)
         # vary with split planning, the exact totals must not
         "q1_pricing_summary",
         # r7 second session: decimal-accumulated rarity sums — exact
         # integers in any merge order, so values must survive retuning
         "token_rarity",
         # r10: the capped compositions — the bucket-population count
         # is an exact integer agg and the keep-join a plain equi-join,
         # so the capped candidate set (and everything downstream: CC
         # labels, signature comparison) must survive retuning
         "dedup_minhash_lsh_capped", "dedup_groups_capped",
         # r10 late: diagonal gaps-and-islands over occurrence-capped
         # window hashes — run grouping rides a per-(pair, diag)
         # row_number, which must not depend on shuffle partitioning
         "dedup_span_pairs")


def _rows(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", SWEEP)
def test_result_invariant_with_aqe_disabled(spark, sf_dir, name):
    """Same property for Adaptive Query Execution: AQE re-plans
    shuffles and coalesces partitions at runtime — results must be
    identical with it off (a driver/production session may disable
    it)."""
    base_conf = spark.conf.get("spark.sql.adaptive.enabled")
    baseline = _rows(spark, sf_dir, name)
    assert baseline, name
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.catalog.clearCache()
        assert _rows(spark, sf_dir, name) == baseline, (
            f"{name}: result changed with AQE disabled")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", base_conf)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", SWEEP)
def test_result_invariant_under_shuffle_partition_count(spark, sf_dir,
                                                        name):
    base_conf = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = _rows(spark, sf_dir, name)
    assert baseline, name
    try:
        for n in ("5", "37"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            spark.catalog.clearCache()
            assert _rows(spark, sf_dir, name) == baseline, (
                f"{name}: result changed at shuffle.partitions={n}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_conf)
        spark.catalog.clearCache()
