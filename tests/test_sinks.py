from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.operators.mrqueries import mr_wc
from mit_6_5840_mapreduce_spark.sources.sinks import (
    write_mr_text,
    write_partitioned_parquet,
)


def test_write_mr_text_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "wc_out")
    wc = mr_wc(spark, sf_dir).select(
        F.col("word").alias("key"), F.col("cnt").alias("value"))
    write_mr_text(wc, out, n_partitions=5)
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) == 5
    all_lines = []
    for p in parts:
        lines = [ln for ln in open(p).read().splitlines() if ln]
        keys = [ln.split(" ", 1)[0] for ln in lines]
        assert keys == sorted(keys)          # key-sorted per partition
        all_lines += lines
    want = sorted(f"{r.word} {r.cnt}" for r in
                  mr_wc(spark, sf_dir).collect())
    assert sorted(all_lines) == want          # sorted-union contract


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_pq")
    from mit_6_5840_mapreduce_spark.sources.tables import load_table
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned_parquet(orders, out,
                              partition_by=["o_orderstatus"], n_files=4)
    dirs = {os.path.basename(d) for d in
            glob.glob(os.path.join(out, "o_orderstatus=*"))}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O",
                    "o_orderstatus=P"}
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning reaches the file listing
    from mit_6_5840_mapreduce_spark.plans import formatted_plan
    plan = formatted_plan(back.where(F.col("o_orderstatus") == "F"))
    pf_lines = [ln for ln in plan.splitlines()
                if ln.strip().startswith("PartitionFilters:")]
    assert pf_lines and "o_orderstatus" in pf_lines[0]
