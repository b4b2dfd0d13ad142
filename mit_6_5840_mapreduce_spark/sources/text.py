"""Whole-text-file sources — the reference's input model.

The reference reads each input file fully; one logical record is
``(filename, contents)`` (``src/mr/worker.go:112-123``,
``src/main/mrsequential.go:39-51``). Two Spark forms:

- RDD: ``whole_text_files`` -> RDD[(name, contents)], feeds ``mr_run``
  directly (basename keys match the reference's ``os.Args`` filenames).
- DataFrame: ``documents_from_dir`` -> (doc_id STRING, text STRING),
  interchangeable with the parquet ``documents`` table for every
  text operator in this engine. Contract difference: empty files yield
  a (name, "") record on the RDD path but NO row on the DataFrame path
  (wholetext emits nothing for a 0-byte file) — irrelevant to token
  queries, relevant to raw row counts.

Scale note: whole-file records mean one file = one row; parallelism is
bounded by file count, and a giant file becomes a giant row. That is the
reference's own contract (its map task holds the full file in memory).
For 100 TB corpora prefer many moderate files (the ``minPartitions``
knob only splits the FILE LIST, never a file).
"""

from __future__ import annotations

import os

from pyspark import RDD
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def whole_text_files(spark: SparkSession, path_glob: str,
                     min_partitions: int | None = None,
                     basename_keys: bool = True) -> RDD:
    rdd = spark.sparkContext.wholeTextFiles(
        path_glob, minPartitions=min_partitions)
    if basename_keys:
        rdd = rdd.map(lambda kv: (os.path.basename(kv[0]), kv[1]))
    return rdd


def documents_from_dir(spark: SparkSession, path_glob: str) -> DataFrame:
    """DataFrame twin: wholetext scan + input_file_name, columns named to
    match the parquet documents table (doc_id, text)."""
    return (
        spark.read.option("wholetext", "true").text(path_glob)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1)
             .alias("doc_id"),
            F.col("value").alias("text"))
    )
