"""PySpark-native analytics engine with the query and data-processing
capabilities of NeoRickyee/MIT-6.5840-MapReduce (MIT 6.5840 Lab 1 MapReduce),
rebuilt Spark-first.

The reference's data plane (whole-file scan -> flatMap -> hash-partitioned
shuffle -> sort-group -> reduce -> text sink; see SURVEY.md section 2.1) is
provided by two API layers:

- ``mr``: an RDD-based MapReduce-compat layer preserving the reference's
  exact semantics (``Reduce`` sees all values of a key, value order
  unspecified, per-partition key-sorted text output).
- ``operators``: the DataFrame/SQL query library — the reference's query
  apps (wc, indexer, crash-metadata, early-exit counts) plus the relational,
  events, dedup/similarity and text-analysis surface, all expressed as
  Catalyst plans designed for 100 TB scale.
"""

__version__ = "0.1.0"

from mit_6_5840_mapreduce_spark.session import get_spark  # noqa: F401
