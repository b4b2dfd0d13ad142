"""Unit/property coverage for the exact-integer money-sum helpers
(functions/numeric.py, round 7) — the replacements for every
``round(sum(float), 2)`` in certified queries.

Three claims, each pinned:
1. ``row_units_bigint``'s ``floor(x*10^dp + 0.5)`` equals true decimal
   scaling for every dp-decimal value in range (pure Python over the
   same IEEE doubles Spark sees).
2. ``exact_round_sum`` equals decimal round-half-up of the TRUE sum —
   including on an adversarial corpus where the float form's
   accumulated error lands within an ulp of a half-cent boundary.
3. Spark and the DuckDB twin agree bit-for-bit on random corpora
   (engine-vs-oracle, the driver-gate contract in miniature).
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest


def _true_round2(values_2dp: list[str]) -> float:
    """Decimal-exact round(sum, 2) reference."""
    s = sum(Decimal(v) for v in values_2dp)
    return float(s.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def test_floor_half_up_equals_decimal_scaling():
    """Claim 1: floor(x*10^dp + 0.5) recovers the exact integer for
    every 2-dp value on a dense grid and for 4/6-dp products in the
    corpus's magnitude range."""
    for n in range(0, 200_000, 7):          # 0.00 .. 1999.93 step 0.07
        x = n / 100.0                        # nearest double of n/100
        assert math.floor(x * 100 + 0.5) == n
    rng = random.Random(7)
    for _ in range(20_000):
        cents = rng.randrange(90_182, 10_499_788)
        disc = rng.randrange(0, 11)
        ep = cents / 100.0
        d = disc / 100.0
        true_e4 = cents * (100 - disc)       # exact 1e-4-dollar units
        assert math.floor(ep * (1 - d) * 10_000 + 0.5) == true_e4


def test_exact_round_sum_survives_half_cent_boundary(spark):
    """Claim 2: a corpus engineered so the float sum sits within an ulp
    of a .005 boundary — the case where round(sum(float), 2) is
    merge-order-dependent — still yields the decimal-exact answer."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_spark.functions.numeric import (
        exact_round_sum,
    )
    # 1000 copies of 0.10: the float sum accumulates ~1e-13 of error
    # (0.1 is not a dyadic rational), the exact sum is 100.01 with the
    # extra cent — merge-order-independent by construction
    vals = ["0.10"] * 1000 + ["0.01"]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = df.agg(exact_round_sum(F.col("v")).alias("s")).collect()[0].s
    assert got == _true_round2(vals)
    # an exact .005 half-cent case needs 3dp inputs; the helper's
    # contract is dp-decimal inputs, so pin the 4dp product path: 2025
    # rows of 0.3333-dollar 4dp values sum to 674.9325 -> 674.93
    df4 = spark.range(2025).select(F.lit(0.3333).alias("v"))
    got4 = df4.agg(exact_round_sum(F.col("v"), 4).alias("s")).collect()[0].s
    true4 = float((Decimal("0.3333") * 2025).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got4 == true4
    # and a TRUE half-cent boundary in 4dp: 0.1050 * 3 = 0.3150 -> 0.32
    # (half-up); floor would give 0.31 — distinguishes the rounding mode
    dfh = spark.range(3).select(F.lit(0.1050).alias("v"))
    goth = dfh.agg(exact_round_sum(F.col("v"), 4).alias("s")).collect()[0].s
    assert goth == 0.32


@pytest.mark.parametrize("dp", [0, 2, 4, 6])
def test_spark_and_duckdb_twins_agree(spark, dp):
    """Claim 3: engine and oracle forms produce the identical double on
    a random corpus at every supported dp."""
    from pyspark.sql import functions as F

    from mit_6_5840_mapreduce_spark.functions.numeric import (
        duckdb_exact_round_sum, exact_round_sum,
    )
    rng = random.Random(dp)
    vals = [round(rng.randrange(0, 10 ** (dp + 6)) / 10 ** dp, dp)
            for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(exact_round_sum(F.col("v"), dp).alias("s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        f"SELECT {duckdb_exact_round_sum('v', dp)} FROM t").fetchone()[0]
    assert got == want
