"""Magic-byte media sniffing (functions/sniff.py) over real encoder
output — every container this repo owns a codec for must be detected
from its leading bytes alone."""

from __future__ import annotations

from mit_6_5840_mapreduce_spark.functions.audio import encode_wav
from mit_6_5840_mapreduce_spark.functions.gif import (
    GRAYSCALE_PALETTE, encode_gif,
)
from mit_6_5840_mapreduce_spark.functions.imaging import encode_bmp
from mit_6_5840_mapreduce_spark.functions.sniff import sniff_media_type
from mit_6_5840_mapreduce_spark.functions.video import encode_avi

RAW = bytes(range(48)) * 2


def test_sniffs_real_encoder_output():
    assert sniff_media_type(encode_bmp(RAW[:48], 4, 4)) == "image/bmp"
    assert sniff_media_type(encode_wav(RAW, 16000)) == "audio/x-wav"
    assert sniff_media_type(
        encode_avi([RAW[:48], RAW[48:]], 4, 4)) == "video/avi"
    assert sniff_media_type(
        encode_gif(RAW[:32], 16, 2, GRAYSCALE_PALETTE)) == "image/gif"


def test_text_and_lookalikes():
    assert sniff_media_type(b"hello world") == "text/plain"
    assert sniff_media_type(b"") == "text/plain"
    # RIFF magic with an unknown form type is NOT claimed as wav/avi
    assert sniff_media_type(b"RIFF\x00\x00\x00\x00WEBP") == "text/plain"
    # truncated RIFF header (no form type yet)
    assert sniff_media_type(b"RIFF") == "text/plain"


def test_wrap_payload_mix_is_sniffable():
    """The multimodal_meta corpus construction: each doc_id % 4 bucket
    lands on its intended container, small payloads fall back to text."""
    from mit_6_5840_mapreduce_spark.operators.multimodal import _wrap_payload
    raw = b"The quick brown fox jumps over the lazy dog, repeatedly." * 2
    assert sniff_media_type(_wrap_payload(0, raw)) == "image/bmp"
    assert sniff_media_type(_wrap_payload(1, raw)) == "audio/x-wav"
    assert sniff_media_type(_wrap_payload(2, raw)) == "video/avi"
    assert sniff_media_type(_wrap_payload(3, raw)) == "text/plain"
    assert sniff_media_type(_wrap_payload(2, b"x")) == "text/plain"


def test_media_decode_oracle_magic_prefixed_text(spark, tmp_path):
    """A raw TEXT document starting with a container magic must produce
    the SAME row from the Spark query and the DuckDB oracle: sniffed
    type, byte stats, decode_ok=0 (ADVICE r3 — the old oracle's text
    arm assumed no such prefix exists in the corpus)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mit_6_5840_mapreduce_spark.operators.multimodal import (
        ORACLES,
        media_decode_stats,
    )
    texts = [
        "BM this text cosplays as a bitmap",          # doc 3: m=3
        "GIF89a but actually prose",                  # doc 7: m=3
        "RIFF1234WAVE pretending to be audio",        # doc 11: m=3
        "RIFF5678AVIX wrong form type, stays text",   # doc 15: m=3 (form
                                                      # != 'AVI ')
        "plain old text document",                    # doc 19: m=3
    ]
    doc_ids = [3, 7, 11, 15, 19]
    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["synthetic"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    got = {r.doc_id: (r.media_type, r.n_units, r.mean_val, r.decode_ok)
           for r in media_decode_stats(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(str(tmp_path), 'documents.parquet')}'")
    want = {r[0]: tuple(r[1:])
            for r in con.execute(ORACLES["media_decode_stats"]).fetchall()}
    assert got == want
    assert got[3][0] == "image/bmp" and got[3][3] == 0
    assert got[7][0] == "image/gif" and got[7][3] == 0
    assert got[19][0] == "text/plain" and got[19][3] == 1
