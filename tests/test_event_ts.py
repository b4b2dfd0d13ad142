"""normalize_event_ts must produce identical instants from BOTH parquet
reader behaviors: Spark <= 4.0 (nanosAsLong -> BIGINT nanos) and
Spark >= 4.1 (native TIMESTAMP_NTZ at micros). The runtime only
exercises one path, so the other is simulated."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from mit_6_5840_mapreduce_spark.sources.tables import (
    load_table, normalize_event_ts,
)


def test_long_nanos_path_matches_native(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    # simulate the <=4.0 reader: ts as BIGINT nanoseconds since epoch
    sim = (load_table(spark, sf_dir, "events")
           .withColumn("ts", F.expr(
               "unix_micros(cast(ts as timestamp)) * 1000")))
    assert isinstance(sim.schema["ts"].dataType, LongType)
    got = normalize_event_ts(sim).select("event_id", "ts")
    assert isinstance(got.schema["ts"].dataType, TimestampNTZType)
    assert got.exceptAll(ev).count() == 0
    assert ev.exceptAll(got).count() == 0
    assert got.count() == ev.count()


def test_streaming_target_is_ltz(spark, sf_dir):
    """The streaming reader needs TIMESTAMP (ltz) for watermarks; the
    same helper serves both targets."""
    ev = normalize_event_ts(
        load_table(spark, sf_dir, "events"), target="timestamp")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
