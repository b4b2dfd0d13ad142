"""Source/sink format breadth: the same relation written to CSV, JSON
lines, and ORC must read back value-identical (with explicit schemas
where the format is untyped). The reference's only format is whole text
files; a Spark-native engine speaks every columnar/text format the
reader API does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.sources.tables import load_table


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _orders(spark, sf_dir):
    # timestamps stringified for the text formats' round-trip stability
    return (load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate")))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert _canon(back) == _canon(src)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_jsonl")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert _canon(back) == _canon(src)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _canon(back) == _canon(src)


def test_csv_schema_inference_matches_explicit(spark, sf_dir, tmp_path):
    """inferSchema on the CSV round-trip recovers the numeric columns."""
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_csv2")
    src.write.mode("overwrite").option("header", True).csv(path)
    inferred = (spark.read.option("header", True)
                .option("inferSchema", True).csv(path))
    types = dict(inferred.dtypes)
    assert types["o_orderkey"] in ("int", "bigint")
    assert types["o_totalprice"] == "double"


def test_csv_roundtrip_hostile_text(spark, tmp_path):
    """The pinned CSV options must round-trip text the current corpus
    happens not to contain: embedded newlines, empty strings, NULLs,
    quotes, and the null token itself as literal text (ADVICE r3)."""
    from mit_6_5840_mapreduce_spark.operators.formats import (
        _csv_read_options,
        _csv_write_options,
    )
    rows = [
        (1, "line one\nline two\nline three"),
        (2, ""),
        (3, None),
        (4, 'quote " and, comma'),
        (5, "\\N"),                      # literal backslash-N text
        (6, "trailing newline\n"),
        (7, " leading and trailing spaces "),
    ]
    src = spark.createDataFrame(rows, "id BIGINT, text STRING")
    path = str(tmp_path / "hostile_csv")
    _csv_write_options(src.write.mode("overwrite")).csv(path)
    back = _csv_read_options(spark.read.schema(src.schema)).csv(path)
    assert (sorted(back.collect(), key=lambda r: r.id)
            == sorted(src.collect(), key=lambda r: r.id))


def test_xml_roundtrip_hostile_text(spark, tmp_path):
    """The XML round trip must survive markup characters, embedded and
    trailing newlines, edge whitespace, empty strings, and NULLs —
    entity escaping plus ignoreSurroundingSpaces=false on read."""
    from mit_6_5840_mapreduce_spark.operators.formats import (
        _xml_read_options,
    )
    rows = [
        (1, "line one\nline two"),
        (2, ""),
        (3, None),
        (4, 'quote " and <tag> & amp; ]]>'),
        (5, " lead and trail "),
        (6, "trailing newline\n"),
        (7, "\\N"),
    ]
    src = spark.createDataFrame(rows, "id BIGINT, text STRING")
    path = str(tmp_path / "hostile_xml")
    (src.write.mode("overwrite")
     .option("rootTag", "docs").option("rowTag", "doc").xml(path))
    back = _xml_read_options(spark.read.schema(src.schema)).xml(path)
    assert (sorted(back.collect(), key=lambda r: r.id)
            == sorted(src.collect(), key=lambda r: r.id))


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """mergeSchema unions evolving parquet schemas: files written before
    a column existed read back with NULLs in that column."""
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_evolving")
    src.select("o_orderkey", "o_custkey").limit(100) \
       .write.mode("append").parquet(path)
    src.select("o_orderkey", "o_custkey", "o_totalprice").limit(50) \
       .write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_custkey",
                                   "o_totalprice"}
    assert merged.count() == 150
    assert merged.where(F.col("o_totalprice").isNull()).count() == 100


def test_pyds_roundtrip_hostile_text(spark, tmp_path):
    """The custom Python DataSource wire format must round-trip text
    containing every character its framing uses: tabs, newlines, CRs,
    backslashes, and combinations (escape-encoding correctness), plus
    empty strings and edge whitespace."""
    from mit_6_5840_mapreduce_spark.sources.pyds import DocLinesDataSource
    spark.dataSource.register(DocLinesDataSource)
    rows = [
        (1, "tab\there", "en", "s", 8),
        (2, "line one\nline two", "en", "s", 17),
        (3, "back\\slash and \\t literal", "en", "s", 25),
        (4, "cr\rlf\n mix \t\t", "en", "s", 13),
        (5, "", "en", "s", 0),
        (6, " edge space ", "en", "s", 12),
        (7, "\\n not a newline", "en", "s", 16),
    ]
    src = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
              "n_chars BIGINT")
    path = str(tmp_path / "hostile_pyds")
    src.write.format("doclines").mode("append").save(path)
    back = spark.read.format("doclines").load(path)
    assert (sorted(back.collect(), key=lambda r: r.doc_id)
            == sorted(src.collect(), key=lambda r: r.doc_id))


def test_pyds_writer_rejects_null_text(spark, tmp_path):
    """NULL text is unrepresentable in the line format — the writer
    must fail loudly, not corrupt the stream."""
    import pytest as _pytest
    from mit_6_5840_mapreduce_spark.sources.pyds import DocLinesDataSource
    spark.dataSource.register(DocLinesDataSource)
    src = spark.createDataFrame(
        [(1, None, "en", "s", 0)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT")
    with _pytest.raises(Exception, match="cannot encode NULL text"):
        src.write.format("doclines").mode("append").save(
            str(tmp_path / "null_pyds"))


def test_pyds_escaping_roundtrips_arbitrary_text():
    """Property: unescape(escape(s)) == s for arbitrary text, and the
    escaped form never contains a raw TAB/LF/CR (the framing bytes)."""
    from hypothesis import given, settings, strategies as st

    from mit_6_5840_mapreduce_spark.sources.pyds import (
        escape_field,
        unescape_field,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text())
    def prop(s):
        e = escape_field(s)
        assert "\t" not in e and "\n" not in e and "\r" not in e
        assert unescape_field(e) == s

    prop()
