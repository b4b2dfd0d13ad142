"""q12's NULL-priority contract, pinned with the REAL oracle SQL.

The gate corpus never emits a NULL o_orderpriority, so engine/oracle
agreement on NULLs is untestable there (the r10 review found the
engine originally dropped NULL-priority rows from BOTH counts while
the oracle's CASE ELSE routed them to low_line_count — a latent gate
failure on any corpus with NULLs). This test plants one and runs the
registered DuckDB oracle text against the engine output, the
dedup_fuzzy_verify precedent for planted cross-engine pins.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entrymod


def _plant(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("q12nulls"))
    d = datetime.datetime(1996, 3, 1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 11, 12], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F"]),
        "o_totalprice": pa.array([100.0, 200.0, 300.0]),
        "o_orderdate": pa.array([d, d, d], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", None, "5-LOW"]),
    }), os.path.join(out, "orders.parquet"))
    ship_fast = d + datetime.timedelta(days=10)
    ship_slow = d + datetime.timedelta(days=90)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0, 1.0, 1.0]),
        "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_returnflag": pa.array(["N"] * 4),
        "l_linestatus": pa.array(["O"] * 4),
        "l_shipdate": pa.array([ship_fast, ship_fast, ship_slow,
                                ship_fast], pa.timestamp("us")),
    }), os.path.join(out, "lineitem.parquet"))
    return out


def test_q12_null_priority_counts_as_low_on_both_engines(
        spark, tmp_path_factory):
    """The NULL-priority order's FAST lineitem lands in low_line_count
    (never dropped, never high) on the engine AND on the registered
    oracle text run over the same planted parquet."""
    d = _plant(tmp_path_factory)
    got = {r.ship_class: (r.high_line_count, r.low_line_count)
           for r in entrymod.queries()["q12_shipping_speed_priority"](
               spark, d).collect()}
    # order 1 (URGENT): fast -> high. order 2 (NULL): one fast + one
    # slow lineitem -> low in each class. order 3 (5-LOW): fast -> low.
    assert got == {"FAST": (1, 2), "SLOW": (0, 1)}
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(d, t + '.parquet')}'")
    oracle = {row[0]: (row[1], row[2]) for row in con.execute(
        entrymod.oracle_sql()["q12_shipping_speed_priority"]).fetchall()}
    assert oracle == got
