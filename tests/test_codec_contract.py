"""The multimodal operators' Arrow batch contract is codec-agnostic.

docs/MULTIMODAL_CODECS.md: a native decoder can replace the pure-Python
codec layer without touching operator code, because the per-batch
functions (a) import the codec symbols by module path at call time and
(b) promise only the declared output schema and one-row-per-decoded-unit
shape. This test swaps in a stand-in "native" codec via monkeypatch and
asserts the batch functions produce the same schema and shape — no
SparkSession needed, the contract is at the pandas-batch level.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mit_6_5840_mapreduce_spark.operators import multimodal as mm

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "payload": [
        b"The quick brown fox jumps over the lazy dog" * 4,
        b"pack my box with five dozen liquor jugs!" * 3,
        b"0123456789abcdef" * 7,
        b"x",                      # too small for any container
    ],
})


def _run(batch_fn):
    return pd.concat(list(batch_fn(iter([DOCS]))), ignore_index=True)


def test_frame_sample_schema_and_shape():
    out = _run(mm._sample_frames)
    assert list(out.columns) == ["doc_id", "frame_idx", "frame_hex",
                                 "frame_bytes"]
    assert (out["frame_bytes"] == mm.VID_FRAME_BYTES).all()
    # one row per decoded frame, capped at N_FRAMES per doc
    assert out.groupby("doc_id").size().max() <= mm.N_FRAMES


def test_frame_sample_contract_survives_codec_swap(monkeypatch):
    """A 'native' decoder honoring the decode_avi signature slots in
    with no operator change: same schema, same row shape."""
    from mit_6_5840_mapreduce_spark.functions import video

    def native_decode_avi(payload):
        # stand-in for a C decoder: same (w, h, frames) contract,
        # deliberately different internals (returns constant frames)
        n = max(1, (len(payload) - 228) // 56)
        return mm.VID_W, mm.VID_H, [b"\x7f" * mm.VID_FRAME_BYTES] * n

    baseline = _run(mm._sample_frames)
    monkeypatch.setattr(video, "decode_avi", native_decode_avi)
    swapped = _run(mm._sample_frames)
    assert list(swapped.columns) == list(baseline.columns)
    assert [str(t) for t in swapped.dtypes] == \
        [str(t) for t in baseline.dtypes]
    # same docs produce rows; per-doc row counts unchanged (frame count
    # is container-determined, not codec-determined)
    assert swapped.groupby("doc_id").size().to_dict() == \
        baseline.groupby("doc_id").size().to_dict()


def test_meta_contract_survives_codec_swap(monkeypatch):
    from mit_6_5840_mapreduce_spark.functions import sniff

    original = sniff.sniff_media_type

    def native_sniff(payload):
        # a libmagic-class sniffer must agree on these public magics
        return original(payload)

    baseline = _run(mm._extract_meta)
    monkeypatch.setattr(sniff, "sniff_media_type", native_sniff)
    swapped = _run(mm._extract_meta)
    pd.testing.assert_frame_equal(baseline, swapped)
    assert list(baseline.columns) == ["doc_id", "n_bytes", "header_hex",
                                      "media_type"]
    assert set(baseline["media_type"]) >= {"image/bmp", "audio/x-wav",
                                           "video/avi", "text/plain"}


@pytest.mark.parametrize("batch_fn,cols", [
    (mm._decode_stats, ["doc_id", "width", "height", "n_pixels",
                        "mean_r", "mean_g", "mean_b"]),
    (mm._audio_stats, ["doc_id", "sample_rate", "n_samples",
                       "mean_amp", "rms"]),
    (mm._gif_stats, ["doc_id", "width", "height", "n_pixels",
                     "mean_lum"]),
    (mm._video_stats, ["doc_id", "frame_idx", "n_frames", "mean_px"]),
])
def test_decode_stats_batch_contracts(batch_fn, cols):
    out = _run(batch_fn)
    assert list(out.columns) == cols
    assert len(out) > 0
    # the too-small payload is skipped, never errored
    assert 3 not in set(out["doc_id"])


def test_truncated_containers_raise_valueerror():
    """The documented codec contract: ANY malformed payload — including
    one truncated mid-header, which struct would reject with its own
    error type — surfaces as ValueError, so batch-level corrupt-payload
    handling (multimodal._media_stats) can catch it uniformly."""
    import pytest

    from mit_6_5840_mapreduce_spark.functions.audio import decode_wav
    from mit_6_5840_mapreduce_spark.functions.gif import decode_gif
    from mit_6_5840_mapreduce_spark.functions.imaging import decode_image
    from mit_6_5840_mapreduce_spark.functions.video import decode_avi

    for blob in (b"BM", b"BM" + b"\x01" * 20, b"GIF89a\x02",
                 b"RIFF\xff\xff\xff\xffWAVE", b"RIFF\x00\x00\x00\x00AVI "):
        for dec in (decode_image, decode_wav, decode_avi, decode_gif):
            with pytest.raises(ValueError):
                dec(blob)
