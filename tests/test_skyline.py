"""skyline_pareto: dominance semantics on a constructed corpus where
the frontier is computable by hand, plus the mutual-non-dominance
invariant on the real corpus.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entrymod


def _mini_sf(tmp_path_factory):
    """6 parts, 2 lineitems. Objectives: min price, max size, max
    demand (sum l_quantity, 0 when never sold).

      part  price size demand  verdict
      0     10.0  5    7.0     skyline (cheapest at size 5, demand 7)
      1     10.0  5    7.0     skyline (exact tie with 0 - both kept)
      2     12.0  5    7.0     dominated by 0 (worse price only)
      3      8.0  3    0.0     skyline (strictly cheapest)
      4     20.0  9    0.0     skyline (strictly largest)
      5     20.0  9    0.0     skyline (tie with 4)
    """
    out = str(tmp_path_factory.mktemp("skyline"))
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(6), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(6)]),
        "p_mfgr": pa.array(["m"] * 6),
        "p_brand": pa.array(["b"] * 6),
        "p_type": pa.array(["t"] * 6),
        "p_size": pa.array([5, 5, 5, 3, 9, 9], pa.int32()),
        "p_container": pa.array(["c"] * 6),
        "p_retailprice": pa.array([10.0, 10.0, 12.0, 8.0, 20.0, 20.0]),
        "p_comment": pa.array([""] * 6),
    }), os.path.join(out, "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        "l_partkey": pa.array([0, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3], pa.int32()),
        "l_quantity": pa.array([7.0, 7.0, 7.0]),
        "l_extendedprice": pa.array([1.0, 1.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0, 0.0]),
        "l_returnflag": pa.array(["N"] * 3),
        "l_linestatus": pa.array(["O"] * 3),
        "l_shipdate": pa.array([18000] * 3, pa.date32()),
        "l_commitdate": pa.array([18000] * 3, pa.date32()),
        "l_receiptdate": pa.array([18000] * 3, pa.date32()),
        "l_shipinstruct": pa.array(["NONE"] * 3),
        "l_shipmode": pa.array(["MAIL"] * 3),
        "l_comment": pa.array([""] * 3),
    }), os.path.join(out, "lineitem.parquet"))
    return out


def test_skyline_hand_computed(spark, tmp_path_factory):
    d = _mini_sf(tmp_path_factory)
    rows = {r.p_partkey: r for r in
            entrymod.queries()["skyline_pareto"](spark, d).collect()}
    assert set(rows) == {0, 1, 3, 4, 5}
    assert rows[0].demand == 7.0 and rows[3].demand == 0.0


def test_skyline_local_prune_is_sound_across_partitions(
        spark, tmp_path_factory):
    """Force the dominating point and its victim into DIFFERENT
    partitions: the local phase cannot see the dominance, so only the
    global merge can remove the victim — any bug there shows up here."""
    d = _mini_sf(tmp_path_factory)
    # repartition the metric frame by partkey so part 0 (dominator) and
    # part 2 (victim) land in separate tasks; rerun the registered query
    # unchanged on a repartitioned COPY of the source tables
    part = spark.read.parquet(os.path.join(d, "part.parquet")) \
        .repartition(6, "p_partkey")
    out = str(tmp_path_factory.mktemp("skyline_split"))
    part.write.parquet(os.path.join(out, "part.parquet"))
    spark.read.parquet(os.path.join(d, "lineitem.parquet")) \
        .write.parquet(os.path.join(out, "lineitem.parquet"))
    got = {r.p_partkey for r in
           entrymod.queries()["skyline_pareto"](spark, out).collect()}
    assert got == {0, 1, 3, 4, 5}


def test_skyline_mutual_nondominance_real_corpus(spark, sf_dir):
    rows = entrymod.queries()["skyline_pareto"](spark, sf_dir).collect()
    assert rows
    for a in rows:
        for b in rows:
            dominates = (b.price <= a.price and b.size >= a.size
                         and b.demand >= a.demand
                         and (b.price < a.price or b.size > a.size
                              or b.demand > a.demand))
            assert not dominates
