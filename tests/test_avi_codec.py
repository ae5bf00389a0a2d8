"""MJPEG-AVI codec (functions.avi): real container walk + per-frame
JPEG decode, with the unsupported/corrupt envelopes pinned down and
the real frame-feature path exercised through the Spark operator."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.functions.avi import (
    UnsupportedAvi,
    avi_info,
    decode_frame,
    encode_avi_mjpeg,
    frame_payload,
    is_avi,
)
from datalake_scripts_spark.functions.jpeg import is_jpeg
from datalake_scripts_spark.operators.multimodal import DECODE_ERRORS


def _frames(n, h=16, w=24, seed=1):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_roundtrip_every_frame():
    frames = _frames(6)
    avi = encode_avi_mjpeg(frames, fps=5, quality=95)
    assert is_avi(avi)
    assert avi_info(avi) == (6, 24, 16, 5)
    for i, f in enumerate(frames):
        assert is_jpeg(frame_payload(avi, i))
        dec = decode_frame(avi, i)
        assert dec.shape == f.shape
        assert np.abs(dec.astype(int) - f.astype(int)).max() <= 32


def test_single_frame_and_greyscale():
    g = [np.random.RandomState(3).randint(0, 256, (9, 11), dtype=np.uint8)]
    avi = encode_avi_mjpeg(g, fps=1)
    assert avi_info(avi)[:3] == (1, 11, 9)
    assert decode_frame(avi, 0).shape == (9, 11, 1)


def test_out_of_range_frame_raises_valueerror():
    avi = encode_avi_mjpeg(_frames(3))
    with pytest.raises(ValueError, match="only 3 frames"):
        frame_payload(avi, 3)


def test_non_mjpeg_fourcc_unsupported():
    avi = bytearray(encode_avi_mjpeg(_frames(2)))
    i = bytes(avi).index(b"vidsMJPG")
    avi[i + 4 : i + 8] = b"H264"
    with pytest.raises(UnsupportedAvi):
        avi_info(bytes(avi))


def test_corrupt_raises_only_decode_errors():
    good = encode_avi_mjpeg(_frames(3))
    variants = [good[:k] for k in (12, 16, 40, len(good) // 2, len(good) - 5)]
    for pos in range(12, len(good), max(1, len(good) // 50)):
        b = bytearray(good)
        b[pos] ^= 0xFF
        variants.append(bytes(b))
    b = bytearray(good)
    b[16:20] = struct.pack("<I", 0x7FFFFFFF)  # absurd chunk length
    variants.append(bytes(b))
    for v in variants:
        for fn in (avi_info, lambda d: decode_frame(d, 0)):
            try:
                fn(v)
            except UnsupportedAvi:
                pass
            except DECODE_ERRORS:
                pass


def test_decode_metadata_probes_real_frame_count(spark):
    from datalake_scripts_spark.operators.multimodal import decode_metadata

    avi = encode_avi_mjpeg(_frames(5, h=12, w=20))
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id bigint, payload binary"
    )
    row = decode_metadata(df, with_status=True).first()
    assert (row.fake_width, row.fake_height, row.fake_n_frames) == (20, 12, 5)
    assert row.decode_status == "avi"


def test_real_frame_features(spark):
    """AVI payloads get descriptors of ACTUAL decoded pixels: two
    videos with different content yield different embeddings, the same
    video is deterministic, and everything stays L2-normalized."""
    from datalake_scripts_spark.operators.multimodal import (
        extract_frame_features_stub,
    )

    a = encode_avi_mjpeg(_frames(3, seed=1))
    b = encode_avi_mjpeg(_frames(3, seed=2))
    df = spark.createDataFrame(
        [(1, bytearray(a), 0), (1, bytearray(a), 2), (2, bytearray(b), 0)],
        "doc_id bigint, payload binary, frame_idx int",
    )
    rows = extract_frame_features_stub(df).collect()
    assert len(rows) == 3
    embs = {(r.doc_id, r.frame_idx): r.frame_embedding for r in rows}
    for e in embs.values():
        assert abs(sum(x * x for x in e) - 1.0) < 1e-6  # L2-normalized
    assert embs[(1, 0)] != embs[(2, 0)]  # different content
    assert embs[(1, 0)] != embs[(1, 2)]  # different frames
    again = {
        (r.doc_id, r.frame_idx): r.frame_embedding
        for r in extract_frame_features_stub(df).collect()
    }
    assert again == embs  # deterministic
    # non-AVI payloads keep the md5 stub path (and never raise)
    stub_df = spark.createDataFrame(
        [(3, bytearray(b"not a video"), 0)],
        "doc_id bigint, payload binary, frame_idx int",
    )
    assert len(extract_frame_features_stub(stub_df).collect()) == 1


def test_quarantine_lane_for_corrupt_avi(spark):
    from datalake_scripts_spark.operators.multimodal import decode_metadata

    good = encode_avi_mjpeg(_frames(2))
    corrupt = good[:20]  # valid RIFF/AVI magic, truncated header
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in decode_metadata(df, with_status=True).collect()}
    assert rows[1].decode_status == "avi"
    assert rows[2].decode_status.startswith("quarantined:")
