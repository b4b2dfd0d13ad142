"""Pin the round-7 DECIMAL(38,0)/HUGEINT accumulation fixes past the
BIGINT cliff they exist for (the r6 user_value_outliers discipline,
extended this round to semantic_dedup's medoid dot and token_rarity's
rarity_sum).

Each test drives the exact aggregation expression the operator uses
over inputs sized BEYOND BIGINT range, checks the value against pure
Python big-int arithmetic, and checks Spark and DuckDB agree on the
DOUBLE the exact integer converts to — the cross-engine contract the
driver gate hashes.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_rarity_sum_decimal_survives_bigint_overflow(spark):
    """token_rarity's per-doc sum: two rarity values of 2^62 overflow a
    BIGINT sum; the DECIMAL(38,0) accumulation is exact and converts
    to the same DOUBLE DuckDB's HUGEINT path produces."""
    v = 1 << 62
    df = spark.createDataFrame([(1, v), (1, v), (1, v)],
                               "doc_id INT, r BIGINT")
    got = (df.groupBy("doc_id")
           .agg(F.sum(F.expr("CAST(r AS DECIMAL(38,0))")).alias("rsum"))
           .select(F.col("rsum").cast("double").alias("rarity_sum"))
           .collect())
    expect = float(3 * v)                   # exact int -> nearest double
    assert got[0].rarity_sum == expect
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE) "
        f"FROM (VALUES ({v}), ({v}), ({v})) t(r)").fetchone()[0]
    assert duck == expect


def test_rarity_sum_bigint_form_would_overflow(spark):
    """The failure mode the fix closes: the old BIGINT sum raises
    (ANSI) on the same inputs rather than answering."""
    v = 1 << 62
    df = spark.createDataFrame([(1, v), (1, v), (1, v)],
                               "doc_id INT, r BIGINT")
    with pytest.raises(Exception, match="(?i)overflow|out of range"):
        df.groupBy("doc_id").agg(F.sum("r").alias("s")).collect()


def test_medoid_dot_decimal_matches_bigint_python(spark):
    """semantic_dedup's dot = sum(qx * sx): qx ~ 2^16-scale fixed
    point, sx ~ group_size * 2^16. With sx sized for a ~2^31-member
    group the per-term product passes 2^62 and the 3-term sum passes
    BIGINT; the DECIMAL(38,0) aggregation matches exact Python big-int
    arithmetic and DuckDB's HUGEINT twin on the ranking DOUBLE."""
    qx = [65521, 65293, 64997]
    sx = [(1 << 31) * 65521, (1 << 31) * 65293, (1 << 31) * 64997]
    rows = [(1, q, s) for q, s in zip(qx, sx)]
    df = spark.createDataFrame(rows, "vec_id INT, qx BIGINT, sx BIGINT")
    got = (df.groupBy("vec_id")
           .agg(F.sum(F.col("qx").cast("decimal(38,0)") * F.col("sx"))
                .alias("dot"),
                F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qx"))
                .alias("nrm2"))
           .select((F.col("dot") / F.sqrt(F.col("nrm2"))).alias("score"))
           .collect())
    true_dot = sum(q * s for q, s in zip(qx, sx))
    true_nrm2 = sum(q * q for q in qx)
    assert true_dot > (1 << 63)             # genuinely past BIGINT
    expect = float(true_dot) / (float(true_nrm2) ** 0.5)
    assert got[0].score == pytest.approx(expect, rel=0, abs=0)
    values = ", ".join(f"({q}, {s})" for q, s in zip(qx, sx))
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(qx AS HUGEINT) * sx) AS HUGEINT)"
        f" / sqrt(CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT))"
        f" FROM (VALUES {values}) t(qx, sx)").fetchone()[0]
    assert duck == got[0].score
