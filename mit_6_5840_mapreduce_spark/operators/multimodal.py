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


N_FEATURES = 8


def _extract_features(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
    """Feature-extraction stub: N_FEATURES pseudo-features from md5 of
    the payload (a real pipeline would run an image/audio encoder here —
    same Arrow batch shape, same output schema). Deterministic, so the
    oracle recomputes them exactly."""
    import hashlib
    for pdf in batches:
        cols: dict[str, list] = {"doc_id": list(pdf["doc_id"])}
        feats = [
            [int(hashlib.md5(p).hexdigest()[k * 4:k * 4 + 4], 16) / 65535.0
             for k in range(N_FEATURES)]
            for p in pdf["payload"]
        ]
        for k in range(N_FEATURES):
            cols[f"f{k}"] = [f[k] for f in feats]
        yield pd.DataFrame(cols)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoder-stub feature extraction over binary payloads via
    mapInPandas (Arrow batches in, fixed-width feature schema out —
    exactly the shape a real CLIP/wav2vec stage has)."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    schema = "doc_id BIGINT, " + ", ".join(
        f"f{k} DOUBLE" for k in range(N_FEATURES))
    return with_payload.mapInPandas(_extract_features, schema)


THUMB_SAMPLES = 8


def _thumbnail(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Downsample stub: THUMB_SAMPLES bytes sampled at even strides from
    the payload head (stand-in for image resize / audio downsample —
    the real operator swaps the per-batch body, not the plumbing)."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "thumb_hex": [],
                                "stride": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            stride = max(len(payload) // THUMB_SAMPLES, 1)
            sampled = payload[::stride][:THUMB_SAMPLES]
            out["doc_id"].append(doc_id)
            out["thumb_hex"].append(sampled.hex().upper())
            out["stride"].append(stride)
        yield pd.DataFrame(out)


def payload_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided-byte downsampling over binary payloads via mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(
        _thumbnail, "doc_id BIGINT, thumb_hex STRING, stride BIGINT")


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "frame_sample": frame_sample,
    "media_features": media_features,
    "payload_thumbnail": payload_thumbnail,
}

# md5(text) == md5 of the payload: the payload IS text's UTF-8 bytes,
# and DuckDB's md5(VARCHAR) hashes the string's UTF-8 encoding
_FEATURE_COLS = ", ".join(
    f"CAST(concat('0x', substring(md5(text), {k * 4 + 1}, 4)) "
    f"AS BIGINT) / 65535.0 AS f{k}"
    for k in range(N_FEATURES))

_THUMB_PIECES = " || ".join(
    f"(CASE WHEN {i} * stride < n THEN "
    f"substring(h, {i} * stride * 2 + 1, 2) ELSE '' END)"
    for i in range(THUMB_SAMPLES))

ORACLES = {
    "media_features": f"""
        SELECT doc_id, {_FEATURE_COLS} FROM documents
    """,
    "payload_thumbnail": f"""
        SELECT doc_id, {_THUMB_PIECES} AS thumb_hex, stride
        FROM (
            SELECT doc_id, hex(encode(text)) AS h,
                   octet_length(encode(text)) AS n,
                   greatest(octet_length(encode(text)) // {THUMB_SAMPLES},
                            1) AS stride
            FROM documents
        )
    """,
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
