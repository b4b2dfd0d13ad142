"""Pin the exact-decimal accumulation shapes past the BIGINT cliff they
exist for (the r6 user_value_outliers discipline; token_rarity keeps
per-row DECIMAL(38,0) — measured cost ~1% there — while semantic_dedup's
medoid dot and user_value_outliers' sum-of-squares moved in r9 to the
BIGINT-product -> DECIMAL(18,0) row shape, which stays on the
unscaled-long aggregation path and raises LOUDLY at the row bound;
in r14 semantic_dedup's dot became a ROW-LOCAL fold of the same
(18,0) element products into a DECIMAL(38,0) total — same values,
same loud row bound, 64x-row shuffles gone — pinned below).

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
    """semantic_dedup's dot = sum((qx * sx) :: DECIMAL(18,0)) — the r9
    row shape (BIGINT product per row, unscaled-long aggregation):
    qx ~ 2^16-scale fixed point, sx ~ group_size * 2^16. With sx sized
    for a ~2^27-member group, 20 terms push the SUM past BIGINT while
    every per-row product stays under the (18,0) row bound; the
    DECIMAL(28,0) aggregation matches exact Python big-int arithmetic
    and DuckDB's HUGEINT twin on the ranking DOUBLE."""
    n = 20
    qx = [65521 - i for i in range(n)]
    sx = [(1 << 27) * q for q in qx]
    rows = [(1, q, s) for q, s in zip(qx, sx)]
    df = spark.createDataFrame(rows, "vec_id INT, qx BIGINT, sx BIGINT")
    got = (df.groupBy("vec_id")
           .agg(F.sum((F.col("qx") * F.col("sx")).cast("decimal(18,0)"))
                .alias("dot"),
                F.sum((F.col("qx") * F.col("qx")).cast("decimal(18,0)"))
                .alias("nrm2"))
           .select((F.col("dot") / F.sqrt(F.col("nrm2"))).alias("score"))
           .collect())
    true_dot = sum(q * s for q, s in zip(qx, sx))
    true_nrm2 = sum(q * q for q in qx)
    assert true_dot > (1 << 63)             # the SUM is past BIGINT
    assert all(q * s < 10 ** 18 for q, s in zip(qx, sx))  # rows in (18,0)
    expect = float(true_dot) / (float(true_nrm2) ** 0.5)
    assert got[0].score == pytest.approx(expect, rel=0, abs=0)
    values = ", ".join(f"({q}, {s})" for q, s in zip(qx, sx))
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(qx AS HUGEINT) * sx) AS HUGEINT)"
        f" / sqrt(CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT))"
        f" FROM (VALUES {values}) t(qx, sx)").fetchone()[0]
    assert duck == got[0].score


def test_medoid_row_past_decimal18_raises_loudly(spark):
    """The r9 envelope contract: a per-row product past 1e18 (a
    near-dup group of ~2.3e8+ members) must RAISE under ANSI, never
    silently NULL out of the medoid sum."""
    q, s = 65521, (1 << 28) * 65521          # q*s ~ 1.15e18 > 1e18
    # the interesting region: past the (18,0) row bound but INSIDE
    # BIGINT, so the failure must come from the cast, not the multiply
    assert 10 ** 18 < q * s < 2 ** 63
    df = spark.createDataFrame([(1, q, s)], "vec_id INT, qx BIGINT, sx BIGINT")
    with pytest.raises(Exception, match="(?i)overflow|cannot be represented"):
        (df.groupBy("vec_id")
         .agg(F.sum((F.col("qx") * F.col("sx")).cast("decimal(18,0)"))
              .alias("dot"))
         .collect())


def test_outlier_sum_of_squares_decimal_survives_bigint_overflow(spark):
    """user_value_outliers' s2 = sum((c * c) :: DECIMAL(18,0)) — the
    r9 row shape: with c near the $10M-event row bound, 20 events push
    the BIGINT sum past 2^63 while each square stays in (18,0); the
    exact total matches Python big-int and DuckDB HUGEINT."""
    n = 20
    cs = [999_999_000 - i for i in range(n)]      # cents, c^2 < 1e18
    df = spark.createDataFrame([(1, c) for c in cs],
                               "user_id INT, c BIGINT")
    got = (df.groupBy("user_id")
           .agg(F.sum((F.col("c") * F.col("c")).cast("decimal(18,0)"))
                .alias("s2"))
           .select(F.col("s2").cast("double").alias("s2d"))
           .collect())
    true_s2 = sum(c * c for c in cs)
    assert true_s2 > (1 << 63)
    assert all(c * c < 10 ** 18 for c in cs)
    assert got[0].s2d == float(true_s2)
    values = ", ".join(f"({c})" for c in cs)
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) "
        f"FROM (VALUES {values}) t(c)").fetchone()[0]
    assert duck == got[0].s2d


def test_medoid_fold_decimal_matches_bigint_python(spark):
    """semantic_dedup's r14 row-local fold: dot =
    aggregate(zip_with(qv, sarr, (x,y) -> (x*y)::DECIMAL(18,0)),
    0::DECIMAL(38,0), acc + x) — same exact integer as the r9
    grouped-sum shape (pinned above) with the 64x-row shuffles gone.
    With sx sized for a ~2^27-member group, 20 terms push the total
    past BIGINT while every element product stays under the (18,0)
    row bound; the (38,0) fold is exact and lands the identical
    ranking DOUBLE as Python big-int and DuckDB HUGEINT."""
    n = 20
    qx = [65521 - i for i in range(n)]
    sx = [(1 << 27) * q for q in qx]
    df = spark.createDataFrame(
        [(1, qx, sx)], "vec_id INT, qv ARRAY<BIGINT>, sarr ARRAY<BIGINT>")
    fold = F.aggregate(
        F.zip_with("qv", "sarr",
                   lambda x, y: (x * y).cast("decimal(18,0)")),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + x).cast("decimal(38,0)"))
    nrm = F.aggregate(
        F.transform("qv", lambda x: (x * x).cast("decimal(18,0)")),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + x).cast("decimal(38,0)"))
    got = (df.select((fold / F.sqrt(nrm)).alias("score")).collect())
    true_dot = sum(q * s for q, s in zip(qx, sx))
    true_nrm2 = sum(q * q for q in qx)
    assert true_dot > (1 << 63)             # the fold total is past BIGINT
    assert all(q * s < 10 ** 18 for q, s in zip(qx, sx))
    expect = float(true_dot) / (float(true_nrm2) ** 0.5)
    assert got[0].score == pytest.approx(expect, rel=0, abs=0)
    values = ", ".join(f"({q}, {s})" for q, s in zip(qx, sx))
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(qx AS HUGEINT) * sx) AS HUGEINT)"
        f" / sqrt(CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT))"
        f" FROM (VALUES {values}) t(qx, sx)").fetchone()[0]
    assert duck == got[0].score


def test_medoid_fold_row_past_decimal18_raises_loudly(spark):
    """The ~2.3e8-member-group envelope is UNCHANGED by the r14 fold:
    an element product past 1e18 must RAISE under ANSI from the
    (18,0) cast inside the lambda, never silently corrupt the fold."""
    q, s = 65521, (1 << 28) * 65521          # q*s ~ 1.15e18 > 1e18
    assert 10 ** 18 < q * s < 2 ** 63
    df = spark.createDataFrame(
        [(1, [q], [s])], "vec_id INT, qv ARRAY<BIGINT>, sarr ARRAY<BIGINT>")
    fold = F.aggregate(
        F.zip_with("qv", "sarr",
                   lambda x, y: (x * y).cast("decimal(18,0)")),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + x).cast("decimal(38,0)"))
    with pytest.raises(Exception, match="(?i)overflow|cannot be represented"):
        df.select(fold.alias("dot")).collect()
