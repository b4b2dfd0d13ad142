"""fan_out contract: widen narrow scans, never re-shuffle wide ones.

The r7 conditional matters at 100 TB: production scans already plan
many splits, and an unconditional repartition would add a full-corpus
exchange to every per-row-heavy consumer. Both branches are pinned —
the gate-SF single-row-group scan still widens to all cores, and an
already-wide input passes through untouched (same object, no new
Exchange in the plan).
"""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.sources.tables import fan_out, load_table


def test_fan_out_widens_single_rowgroup_scan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    assert docs.rdd.getNumPartitions() < target, (
        "testdata no longer single-row-group; revisit fan_out")
    assert fan_out(spark, docs).rdd.getNumPartitions() == target


def test_fan_out_passes_wide_input_through(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target * 4)
    assert fan_out(spark, wide) is wide


def test_fan_out_rejects_derived_frames(spark, sf_dir):
    """ADVICE r7: probing .rdd on a plan with exchanges EXECUTES the
    upstream stages under AQE, so the scan-only precondition is
    enforced, not assumed — aggregates, joins, and repartitions raise
    loudly; projections/filters over the scan stay allowed."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, docs.groupBy("lang").count())
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, docs.join(docs.select("doc_id"), "doc_id"))
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, docs.repartition(4))
    # the allowed shape: projection + filter over the raw relation
    from pyspark.sql import functions as F
    ok = fan_out(spark, docs.select("doc_id", "text")
                 .where(F.col("doc_id") >= 0))
    assert ok.count() > 0


def test_fan_out_rejects_subquery_aggregates(spark, sf_dir):
    """r9 review: banned nodes hiding in plan EXPRESSIONS (scalar/IN
    subqueries) must trip the guard too — children() alone misses
    them, and probing .rdd would execute the subquery's upstream
    stages under AQE exactly like a top-level aggregate."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fan_out_guard_docs")
    sub = spark.sql(
        "SELECT doc_id, text FROM fan_out_guard_docs "
        "WHERE doc_id > (SELECT avg(doc_id) FROM fan_out_guard_docs)")
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, sub)


def test_fan_out_guard_matches_nodes_not_substrings(spark, sf_dir):
    """r8 review: a filter LITERAL or alias containing a banned node
    name (e.g. 'Union') must not trip the scan-only guard — only real
    plan nodes do."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    ok = fan_out(spark, docs.where(F.col("source") != "Union Wire Sort")
                 .select("doc_id", F.col("text").alias("JoinText")))
    assert ok.count() > 0


def test_fan_out_rejects_analysis_surviving_set_ops(spark, sf_dir):
    """ADVICE r9: Distinct / Intersect / Except keep their own node
    identity in the ANALYZED plan (their Aggregate/join rewrites run in
    the optimizer), so the class-name denylist must ban them directly —
    a SQL `SELECT DISTINCT` input previously passed the guard and the
    .rdd probe silently executed the aggregate-equivalent shuffle."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fan_out_setop_docs")
    distinct_sql = spark.sql(
        "SELECT DISTINCT lang FROM fan_out_setop_docs")
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, distinct_sql)
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, spark.sql(
            "SELECT doc_id FROM fan_out_setop_docs WHERE doc_id < 10 "
            "INTERSECT SELECT doc_id FROM fan_out_setop_docs"))
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, spark.sql(
            "SELECT doc_id FROM fan_out_setop_docs "
            "EXCEPT SELECT doc_id FROM fan_out_setop_docs WHERE doc_id < 10"))
    # DataFrame-API .distinct() analyzes to Deduplicate (already banned)
    with pytest.raises(ValueError, match="scan-only"):
        fan_out(spark, docs.select("lang").distinct())
