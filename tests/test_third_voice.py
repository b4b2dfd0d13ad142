"""Third-voice differential for the TPC-H money queries (round 8,
VERDICT r7 item 7).

The 167 DuckDB oracles are hand-written SQL that changes in LOCKSTEP
with engine changes (the r7 exact-money conversion edited both sides
together), so engine-vs-oracle parity alone cannot catch a bug that
lands on both sides at once. This suite recomputes q1/q3/q5/q6 from the
raw parquet with a THIRD implementation — pyarrow + plain Python
integer arithmetic, no Spark, no DuckDB, no shared helper code — and
diffs it against the engine output. (The corpus is driver-synthesized
TPC-H-ish data, not dbgen output, so published TPC-H answer sets do not
apply; an independent implementation is the strongest third voice
available.) The money semantics replicated here are the documented
contract (functions/numeric.py): per-row integer units via
floor(x * 10^dp + 0.5), exact integer sums, HALF-UP integer cents, one
final double division; floor4 for averages.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq
import pytest

from mit_6_5840_mapreduce_spark.operators.relational import (
    q1_pricing_summary, q3_shipping_priority, q5_local_supplier_volume,
    q6_forecast_revenue,
)


def _tbl(sf_dir: str, name: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/{name}.parquet").to_pandas()


def _units(x: float, dp: int) -> int:
    return math.floor(x * 10 ** dp + 0.5)


def _dollars(total_units: int, dp: int) -> float:
    if dp <= 2:
        cents = total_units * 10 ** (2 - dp)
    else:
        q = 10 ** (dp - 2)
        cents = (total_units + q // 2) // q
    return cents / 100.0


def _floor4(x: float) -> float:
    return math.floor(x * 10_000) / 10_000


def test_q1_third_voice(spark, sf_dir):
    li = _tbl(sf_dir, "lineitem")
    li = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")]
    acc: dict[tuple, list] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in li.itertuples():
        disc_price = r.l_extendedprice * (1 - r.l_discount)
        charge = disc_price * (1 + r.l_tax)
        a = acc[(r.l_returnflag, r.l_linestatus)]
        a[0] += _units(r.l_quantity, 0)
        a[1] += _units(r.l_extendedprice, 2)
        a[2] += _units(disc_price, 4)
        a[3] += _units(charge, 6)
        a[4] += _units(r.l_discount, 2)
        a[5] += 1
    expected = {}
    for k, (uq, up, ud, uc, udisc, n) in acc.items():
        sum_qty = _dollars(uq, 0)
        sum_base = _dollars(up, 2)
        expected[k] = (
            sum_qty, sum_base, _dollars(ud, 4), _dollars(uc, 6),
            _floor4(sum_qty / n), _floor4(sum_base / n),
            _floor4(_dollars(udisc, 2) / n), n)
    got = {(r.l_returnflag, r.l_linestatus):
           (r.sum_qty, r.sum_base_price, r.sum_disc_price, r.sum_charge,
            r.avg_qty, r.avg_price, r.avg_disc, r.count_order)
           for r in q1_pricing_summary(spark, sf_dir).collect()}
    assert got == expected


def test_q3_third_voice(spark, sf_dir):
    cutoff = pd.Timestamp("1998-03-15")
    cust = _tbl(sf_dir, "customer")
    cust = set(cust[cust["c_mktsegment"] == "BUILDING"]["c_custkey"])
    orders = _tbl(sf_dir, "orders")
    orders = orders[(orders["o_orderdate"] < cutoff)
                    & orders["o_custkey"].isin(cust)]
    omap = {r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
            for r in orders.itertuples()}
    li = _tbl(sf_dir, "lineitem")
    li = li[li["l_shipdate"] > cutoff]
    cents: dict[int, int] = defaultdict(int)
    for r in li.itertuples():
        if r.l_orderkey in omap:
            cents[r.l_orderkey] += math.floor(
                r.l_extendedprice * (1 - r.l_discount) * 100)
    top = sorted(((c, omap[k][0], k) for k, c in cents.items()),
                 key=lambda t: (-t[0], t[1], t[2]))[:10]
    expected = [(k, d.to_pydatetime(), omap[k][1], c / 100.0)
                for c, d, k in top]
    got = [(r.l_orderkey, r.o_orderdate, r.o_orderpriority, r.revenue)
           for r in q3_shipping_priority(spark, sf_dir).collect()]
    assert got == expected


def test_q5_third_voice(spark, sf_dir):
    region = _tbl(sf_dir, "region")
    asia = set(region[region["r_name"] == "ASIA"]["r_regionkey"])
    nation = _tbl(sf_dir, "nation")
    nation = nation[nation["n_regionkey"].isin(asia)]
    nk_to_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = _tbl(sf_dir, "customer")
    c_nk = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    supp = _tbl(sf_dir, "supplier")
    s_nk = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    orders = _tbl(sf_dir, "orders")
    orders = orders[(orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
                    & (orders["o_orderdate"] < pd.Timestamp("1997-01-01"))]
    o_ck = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    units: dict[str, int] = defaultdict(int)
    for r in _tbl(sf_dir, "lineitem").itertuples():
        ck = o_ck.get(r.l_orderkey)
        if ck is None:
            continue
        cn, sn = c_nk[ck], s_nk[r.l_suppkey]
        if cn != sn or cn not in nk_to_name:
            continue
        units[nk_to_name[cn]] += _units(
            r.l_extendedprice * (1 - r.l_discount), 4)
    expected = {n: _dollars(u, 4) for n, u in units.items()}
    got = {r.n_name: r.revenue
           for r in q5_local_supplier_volume(spark, sf_dir).collect()}
    assert got == expected


def test_q6_third_voice(spark, sf_dir):
    li = _tbl(sf_dir, "lineitem")
    m = ((li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
         & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
         & (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07)
         & (li["l_quantity"] < 24))
    total = sum(_units(r.l_extendedprice * r.l_discount, 4)
                for r in li[m].itertuples())
    expected = _dollars(total, 4)
    row = q6_forecast_revenue(spark, sf_dir).collect()
    assert len(row) == 1 and row[0].revenue == expected


def test_third_voice_is_really_independent():
    """Guard the guard: this module must not import the engine's money
    helpers — a shared units/dollars implementation would let a bug in
    functions/numeric.py drift all three voices together. Only the
    query entry points under test may come from the package."""
    import tests.test_third_voice as tv
    src = open(tv.__file__).read()
    # banned strings assembled at runtime so this test can't match its
    # own source
    assert ("functions" + ".numeric") not in src
    assert ("functions" + " import") not in src
    imports = [ln for ln in src.splitlines()
               if ln.startswith(("import ", "from "))
               and "mit_6_5840_mapreduce_spark" in ln]
    assert imports == [
        "from mit_6_5840_mapreduce_spark.operators.relational import ("]
