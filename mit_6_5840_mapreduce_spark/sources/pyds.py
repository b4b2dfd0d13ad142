"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource``
API): a tab-separated, escape-encoded document format with BOTH a
distributed reader (one InputPartition per shard file) and a
distributed writer (one shard file per task). This exercises the
engine-extension surface the built-in formats can't: user-defined
sources plug into the same ``spark.read.format(...)`` /
``df.write.format(...)`` planner path as parquet or CSV, partitions
and all.

Wire format: one record per line, fields joined by raw TAB, with
backslash-escaping of ``\\``, TAB, LF, CR inside fields — so arbitrary
document text (embedded newlines/tabs included) round-trips losslessly.
Fields: doc_id, text, lang, source, n_chars.

Scale design (100 TB): reads parallelize per shard file (partition
planning lists the directory once on the driver); writes parallelize
per task with no coordination (task id names the shard). The row path
is Python — this is the extension-point demo, not the hot path; a
production column store would be a JVM DataSource V2 with vectorized
batches. NULL text is not representable (the documents corpus is
non-null by construction; the writer raises loudly rather than
corrupting the stream).
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

DOC_SCHEMA = ("doc_id BIGINT, text STRING, lang STRING, source STRING, "
              "n_chars BIGINT")

_UNESC = {"\\": "\\", "t": "\t", "n": "\n", "r": "\r"}


def escape_field(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def unescape_field(s: str) -> str:
    return re.sub(r"\\(.)", lambda m: _UNESC[m.group(1)], s)


class _ShardFile(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class DocLinesReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options["path"]

    def partitions(self):  # noqa: D102 — DataSource contract
        shards = sorted(glob.glob(os.path.join(self.path, "part-*.txt")))
        # zero shards (empty write) still needs >= 1 partition for Spark
        # to plan the scan; an empty shard list yields zero rows
        return [_ShardFile(p) for p in shards] or [_ShardFile("")]

    def read(self, partition: _ShardFile) -> Iterator[tuple]:
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                doc_id, text, lang, source, n_chars = \
                    line.rstrip("\n").split("\t")
                yield (int(doc_id), unescape_field(text),
                       unescape_field(lang), unescape_field(source),
                       int(n_chars))


class DocLinesWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options["path"]

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.txt")
        with open(out, "w", encoding="utf-8") as f:
            for row in iterator:
                if row.text is None:
                    raise ValueError("doclines cannot encode NULL text")
                f.write("\t".join((
                    str(row.doc_id), escape_field(row.text),
                    escape_field(row.lang), escape_field(row.source),
                    str(row.n_chars))) + "\n")
        return WriterCommitMessage()


class DocLinesDataSource(DataSource):
    """``spark.read.format("doclines")`` / ``.write.format("doclines")``."""

    @classmethod
    def name(cls) -> str:
        return "doclines"

    def schema(self) -> str:
        return DOC_SCHEMA

    def reader(self, schema) -> DocLinesReader:
        return DocLinesReader(self.options)

    def writer(self, schema, overwrite: bool) -> DocLinesWriter:
        return DocLinesWriter(self.options)
