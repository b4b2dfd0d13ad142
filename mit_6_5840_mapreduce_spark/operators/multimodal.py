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


N_FRAMES = 4
FRAME_BYTES = 16


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampling stub: up to N_FRAMES slices of
    FRAME_BYTES each from the head of the payload (a real video pipeline
    would decode and sample keyframes here — same batch shape)."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [],
                                "frame_hex": [], "frame_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(N_FRAMES):
                frame = payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                if not frame:
                    break
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_hex"].append(frame.hex().upper())
                out["frame_bytes"].append(len(frame))
        yield pd.DataFrame(out)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary payloads via mapInPandas
    (decode stubbed; schema/batching/partitioning real)."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(
        _sample_frames,
        "doc_id BIGINT, frame_idx INT, frame_hex STRING, frame_bytes BIGINT")


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "frame_sample": frame_sample,
}

ORACLES = {
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               substring(hex(encode(text)), 1, 16) AS header_hex,
               'text/plain' AS media_type
        FROM documents
    """,
    "frame_sample": f"""
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               substring(hex(encode(text)), i * {FRAME_BYTES} * 2 + 1,
                         {FRAME_BYTES} * 2) AS frame_hex,
               CAST(least({FRAME_BYTES},
                    octet_length(encode(text)) - i * {FRAME_BYTES})
                    AS BIGINT) AS frame_bytes
        FROM documents
        CROSS JOIN (SELECT unnest(range(0, {N_FRAMES})) AS i)
        WHERE octet_length(encode(text)) > i * {FRAME_BYTES}
    """,
}
