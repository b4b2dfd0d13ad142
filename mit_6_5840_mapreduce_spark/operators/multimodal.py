"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed through Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (``decode_image_stub``) — but the Spark-side plumbing
(schema, batch shape, partitioning, UDF signature) is real and oracle-
checked: payload bytes are derived deterministically from ``documents.text``
(UTF-8 encoding) so DuckDB can verify byte lengths and hex prefixes.

Scale design: mapInPandas streams Arrow batches; payloads never pass
through the driver, and the metadata projection prunes the binary column
immediately after extraction so downstream stages don't carry blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.sources.tables import load_table

META_SCHEMA = ("doc_id BIGINT, n_bytes BIGINT, header_hex STRING, "
               "media_type STRING")


def decode_image_stub(payload: bytes) -> None:
    """Placeholder for a real image decode (PIL/libvips not installed).

    The production implementation would return (height, width, channels,
    pixel array); pipelines in this container must not call it.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "container; see module docstring")


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction over binary payloads."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "header_hex": payloads.map(lambda b: b[:8].hex().upper()),
            "media_type": "text/plain",   # stubbed sniffing
        })


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction via mapInPandas (real Arrow path,
    deterministic payloads = UTF-8 bytes of documents.text)."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(_extract_meta, META_SCHEMA)


QUERIES = {
    "multimodal_meta": multimodal_meta,
}

ORACLES = {
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               substring(hex(encode(text)), 1, 16) AS header_hex,
               'text/plain' AS media_type
        FROM documents
    """,
}
