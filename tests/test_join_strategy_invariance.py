"""Results must not depend on the join strategy Catalyst picks.

The r7 broadcast-hint policy (docs/SCALE.md) de-hinted every join whose
build side GROWS with the corpus (filtered customer/part/supplier, the
vocabulary-keyed textstats tables, the Bloom truth set): at gate SF the
cost-based planner still broadcasts them, but at 100 TB the same plans
must degrade to shuffle joins. This suite drives that exact regime by
disabling ``spark.sql.autoBroadcastJoinThreshold``:

- the plan must actually contain a non-broadcast equi-join (a hint that
  silently crept back in would keep BroadcastHashJoin even at -1 —
  precisely the OOM-at-scale regression the policy forbids), and
- the row multiset must be identical to the default broadcast plan
  (join strategy is an execution detail; any value drift would mean
  merge-order-sensitive arithmetic hiding behind the small-SF plan).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mit_6_5840_mapreduce_spark.plans import executed_plan

# every query the r7 policy de-hinted, batch and streaming
DEHINTED = ("q3_shipping_priority", "q19_discounted_revenue",
            "q14_promo_revenue", "q8_market_share",
            "q17_small_quantity_revenue", "q16_parts_supplier_relationship",
            "bloom_prune_join", "tfidf_top_terms", "tfidf_cosine_pairs",
            "token_rarity", "stream_enriched_events",
            # r10 TPC-H completers: filtered part / supplier joins are
            # SF-growing and unhinted by the same policy
            "q2_min_cost_supplier", "q20_dominant_suppliers")

# streaming queries materialize through a memory sink; their micro-batch
# plans aren't visible via df.explain, so they get the value check only
_STREAMING = {"stream_enriched_events"}


def _df(spark, sf_dir, name):
    return entrymod.queries()[name](spark, sf_dir)


def _rows(spark, sf_dir, name):
    return sorted(map(tuple, _df(spark, sf_dir, name).collect()))


@pytest.mark.parametrize("name", DEHINTED)
def test_values_identical_without_broadcast(spark, sf_dir, name):
    base = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    baseline = _rows(spark, sf_dir, name)
    assert baseline, name
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.catalog.clearCache()
        assert _rows(spark, sf_dir, name) == baseline, (
            f"{name}: result changed when broadcast joins were disabled")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", base)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name",
                         [n for n in DEHINTED if n not in _STREAMING])
def test_plan_degrades_to_shuffle_join(spark, sf_dir, name):
    """With the threshold off, the de-hinted join must leave the
    broadcast path — proof no forced hint survives on an SF-growing
    side. Both thresholds are disabled (ADVICE r7): the static
    autoBroadcastJoinThreshold alone still lets AQE convert back to a
    broadcast join at runtime from shuffle-stage statistics, so the
    degradation claim would not hold through runtime re-planning."""
    base = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    base_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       "-1")
        spark.catalog.clearCache()
        plan = executed_plan(_df(spark, sf_dir, name))
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), (
            f"{name}: no shuffle join with broadcast disabled — "
            f"a forced broadcast hint is back on an SF-growing side\n{plan}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", base)
        if base_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", base_aqe)
        spark.catalog.clearCache()
