"""Sinks — the reference's output model plus the scale-appropriate ones.

Reference parity: ``write_mr_text`` reproduces the ``mr-out-Y`` layout
(``src/mr/worker.go:173-189``): one text file per reduce partition, lines
``"key value"``, key-sorted within each partition, partitioned by key
hash. Spark's output committer supplies the atomic-rename commit the
reference lacks (SURVEY.md §4.3 bug 4).

Scale: ``write_partitioned_parquet`` is what a 100 TB pipeline actually
writes — columnar, optionally hive-partitioned by a low-cardinality
column, sized by ``target_file_rows`` via repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_mr_text(df: DataFrame, path: str, n_partitions: int = 10,
                  key_col: str = "key", value_col: str = "value") -> None:
    """Write ``"key value"`` lines, hash-partitioned by key into
    n_partitions files, key-sorted within each file."""
    (
        df.select(F.col(key_col).cast("string").alias("k"),
                  F.col(value_col).cast("string").alias("v"))
        .repartition(n_partitions, "k")
        .sortWithinPartitions("k", "v")
        .select(F.concat_ws(" ", "k", "v").alias("value"))
        .write.mode("overwrite").text(path)
    )


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: list[str] | None = None,
                              n_files: int | None = None) -> None:
    """Columnar sink with optional hive partitioning and file-count
    control (repartition on the partition columns co-locates rows so
    each hive partition gets coherent files, not one sliver per task)."""
    if n_files:
        df = (df.repartition(n_files, *partition_by) if partition_by
              else df.repartition(n_files))
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
