"""Parquet table sources for the driver-generated TPC-H-ish corpus.

At 100 TB these reads are the dominant cost; everything here is a plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column pruning
and partition pruning (verify with ``.explain``: ``PushedFilters`` /
``ReadSchema`` must reflect the query, not the table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# fixes region=5 and nation=25 rows; suppliers/parts grow with SF).
BROADCAST_SAFE = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects; read nanos as long and convert to microsecond
        # TIMESTAMP_NTZ (the corpus has microsecond precision, so the
        # `div 1000` is lossless).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        return df.withColumn(
            "ts",
            F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a scan across all cores before per-row-heavy compute
    (tokenize/shingle/hash/project). The driver testdata writes each
    table as ONE parquet row group, which Spark cannot split — so without
    this, a compute-bound stage runs on a single core no matter how many
    are free. The shuffle moves only the scanned columns once; at
    production scale inputs arrive as many splits and this becomes pure
    overhead-free redistribution (or can be dropped).
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
