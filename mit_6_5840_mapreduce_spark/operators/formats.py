"""Driver-certifiable format round trips.

The CSV/JSONL/ORC readers and writers are exercised by
tests/test_format_roundtrips.py locally, but nothing put them through
the driver's DuckDB differential gate. These queries close that gap:
write the documents table through a non-parquet format, read it back,
and aggregate — the result only hash-matches the oracle (which reads
the original parquet) if the round trip preserved every row and every
character.

Scale note: the round trip here is the certification VEHICLE, not a
recommended pipeline step; the aggregate shape (groupBy on a
low-cardinality key) is the standard post-ingest profile query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.sources.scratch import scratch_dir
from mit_6_5840_mapreduce_spark.sources.tables import load_table

# CSV null/empty pinning (ADVICE r3): Spark's CSV reader collapses
# quoted empty strings to NULL by default, and the writer's default
# null token is an empty field — so "" and NULL don't survive a round
# trip unless both representations are pinned explicitly on BOTH sides.
# multiLine=true on read keeps embedded newlines inside quoted fields.
#
# The null token is a CONTROL-CHARACTER sentinel, not the conventional
# \N: the reader applies nullValue to quoted fields too, so any token
# that can appear as literal text (like the string "\N" itself) is
# ambiguous with NULL in the written bytes — no quoting scheme can
# distinguish them. A \x01/\x00 sentinel cannot occur in sane text, so
# literal "\N" documents survive (pinned by
# tests/test_format_roundtrips.py::test_csv_roundtrip_hostile_text).
CSV_NULL = "\x01\x00N\x01"


def _csv_write_options(w):
    # emptyValue='""' writes empty strings as a QUOTED empty field,
    # distinguishable from the null token; the writer's whitespace
    # trimming DEFAULTS TO TRUE and silently drops leading/trailing
    # spaces and newlines — disable both so text survives verbatim
    return (w.option("header", "true").option("escape", '"')
            .option("nullValue", CSV_NULL).option("emptyValue", '""')
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false"))


def _csv_read_options(r):
    # emptyValue='' maps the quoted empty field back to "" (the reader's
    # default turns it into NULL); multiLine keeps quoted newlines
    return (r.option("header", "true").option("escape", '"')
            .option("multiLine", "true")
            .option("nullValue", CSV_NULL).option("emptyValue", ""))


def _roundtrip_stats(df: DataFrame) -> DataFrame:
    # 32-bit md5 prefix as the per-doc checksum (the repo's standard
    # cross-engine hash); the SUM only matches if every text survived.
    # Accumulation is DECIMAL(38,0)/HUGEINT (r7: BIGINT would overflow
    # at ~2e9 docs per language group), emitted as DOUBLE — the same
    # exact integer cast identically on both engines (DuckDB's pandas
    # bridge turns wide decimals into float64, so DOUBLE is the one
    # representation both sides agree on byte-for-byte).
    h32 = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    return (
        df.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.length("text")).alias("total_chars"),
             F.countDistinct("source").alias("n_sources"),
             F.sum(h32.cast("decimal(38,0)")).cast("double")
              .alias("text_hash_sum"))
    )


_STATS_ORACLE_BODY = """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           count(DISTINCT source) AS n_sources,
           CAST(sum(CAST(CAST(concat('0x', substring(md5(text), 1, 8))
                              AS BIGINT) AS HUGEINT)) AS DOUBLE)
               AS text_hash_sum
    FROM documents
    GROUP BY lang
"""


def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSON Lines -> read back -> per-language profile.
    32-bit md5-prefix checksum sums make any encoding/escaping loss
    visible."""
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("fmt_jsonl"), "docs")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    return _roundtrip_stats(back)


def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> quoted CSV -> read back -> per-language profile.
    Null/empty/newline handling is pinned on both sides (see
    _csv_write_options) so the round trip is corpus-independent — a
    text with embedded newlines or empty strings survives, not just the
    current corpus which happens to contain neither."""
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("fmt_csv"), "docs")
    _csv_write_options(docs.write.mode("overwrite")).csv(out)
    back = _csv_read_options(spark.read.schema(docs.schema)).csv(out)
    return _roundtrip_stats(back)


def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> ORC -> read back -> per-language profile."""
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("fmt_orc"), "docs")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.schema(docs.schema).orc(out)
    return _roundtrip_stats(back)


def _xml_read_options(r):
    # the StaxXML reader TRIMS surrounding whitespace by default —
    # leading/trailing spaces and newlines in text would not survive;
    # NULL (absent element) vs empty string ("" element) round-trips
    # natively, which CSV needed a sentinel for
    return r.option("rowTag", "doc") \
        .option("ignoreSurroundingSpaces", "false")


def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> XML (Spark 4 native StaxXML source) -> read back ->
    per-language profile. Entity escaping (&lt; &amp; quotes) and
    whitespace preservation are exercised by the hostile-text test;
    the checksum-sum oracle catches any escaping loss on the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("fmt_xml"), "docs")
    (docs.write.mode("overwrite")
     .option("rootTag", "docs").option("rowTag", "doc").xml(out))
    back = _xml_read_options(spark.read.schema(docs.schema)).xml(out)
    return _roundtrip_stats(back)


def pyds_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> custom PYTHON DATASOURCE (Spark 4
    ``pyspark.sql.datasource`` API, ``sources/pyds.py``) -> read back ->
    per-language profile. The fifth certified format path, and the only
    one exercising the USER-DEFINED source extension point: the write
    distributes one escape-encoded shard per task, the read plans one
    InputPartition per shard, and the checksum-sum oracle proves the
    custom wire format round-trips every byte of text."""
    from mit_6_5840_mapreduce_spark.sources.pyds import DocLinesDataSource
    spark.dataSource.register(DocLinesDataSource)
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("fmt_pyds"), "docs")
    docs.write.format("doclines").mode("append").save(out)
    back = spark.read.format("doclines").load(out)
    return _roundtrip_stats(back)


QUERIES = {
    "jsonl_roundtrip_stats": jsonl_roundtrip_stats,
    "csv_roundtrip_stats": csv_roundtrip_stats,
    "orc_roundtrip_stats": orc_roundtrip_stats,
    "xml_roundtrip_stats": xml_roundtrip_stats,
    "pyds_roundtrip_stats": pyds_roundtrip_stats,
}

ORACLES = {
    "jsonl_roundtrip_stats": _STATS_ORACLE_BODY,
    "csv_roundtrip_stats": _STATS_ORACLE_BODY,
    "orc_roundtrip_stats": _STATS_ORACLE_BODY,
    "xml_roundtrip_stats": _STATS_ORACLE_BODY,
    "pyds_roundtrip_stats": _STATS_ORACLE_BODY,
}
