"""Corrupt-payload fuzz: magic-valid but broken PNG/WAV bytes must
NEVER fail a decode task (VERDICT r4 ask #1 — the poison-pill fix).

A 100 TB web corpus always contains truncated downloads and bit-flipped
payloads whose magic still matches; Spark retries a failing task 4x
then kills the job, so a single uncaught ``zlib.error`` in mapInPandas
is a full-job poison pill. Every decode-path operator here must instead
route the row to the deterministic stub lane (quarantine)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.functions.jpeg import (
    UnsupportedJpeg,
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)
from datalake_scripts_spark.functions.png import (
    UnsupportedPng,
    decode_png,
    encode_png,
    png_dimensions,
)
from datalake_scripts_spark.functions.wav import (
    decode_wav,
    encode_wav,
    wav_info,
)
from datalake_scripts_spark.operators.multimodal import (
    DECODE_ERRORS,
    audio_chunk_stub,
    decode_metadata,
    decode_metadata_arrow,
    resize_stub,
)


def _good_png() -> bytes:
    rng = np.random.RandomState(7)
    return encode_png(rng.randint(0, 256, (12, 9, 3), dtype=np.uint8))


def _good_wav() -> bytes:
    rng = np.random.RandomState(7)
    return encode_wav(rng.randint(-500, 500, (800, 2)).astype(np.int16), 8000)


def _corrupt_variants(good: bytes, magic_len: int) -> list[bytes]:
    """Magic-valid corruptions: truncations at every region boundary,
    bit flips across the body, absurd declared lengths."""
    variants = []
    for cut in (magic_len, magic_len + 2, magic_len + 8, len(good) // 2,
                len(good) - 1, len(good) - 7):
        variants.append(good[:cut])
    for pos in range(magic_len, len(good), max(1, len(good) // 40)):
        b = bytearray(good)
        b[pos] ^= 0xFF
        variants.append(bytes(b))
    # declared chunk length far past the buffer
    b = bytearray(good)
    b[magic_len : magic_len + 4] = struct.pack(">I", 2**31 - 1)
    variants.append(bytes(b))
    return variants


def _good_jpeg() -> bytes:
    rng = np.random.RandomState(7)
    return encode_jpeg(rng.randint(0, 256, (16, 12, 3), dtype=np.uint8), 90)


CORRUPT_PNGS = _corrupt_variants(_good_png(), 8)
CORRUPT_WAVS = _corrupt_variants(_good_wav(), 12)
CORRUPT_JPEGS = _corrupt_variants(_good_jpeg(), 2)


def test_codec_raises_only_decode_errors():
    """Library level: corrupt magic-valid bytes raise nothing outside
    DECODE_ERRORS (so the operator-level catch tuple is complete)."""
    for p in CORRUPT_PNGS:
        for fn in (decode_png, png_dimensions):
            try:
                fn(p)
            except UnsupportedPng:
                pass
            except DECODE_ERRORS:
                pass
    for p in CORRUPT_WAVS:
        for fn in (decode_wav, wav_info):
            try:
                fn(p)
            except DECODE_ERRORS:
                pass
    for p in CORRUPT_JPEGS:
        for fn in (decode_jpeg, jpeg_dimensions):
            try:
                fn(p)
            except UnsupportedJpeg:
                pass
            except DECODE_ERRORS:
                pass


def test_zero_channel_wav_is_valueerror_not_zerodivision():
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    for fn in (decode_wav, wav_info):
        with pytest.raises(ValueError, match="channels=0"):
            fn(wav)


def test_png_decompression_bomb_bounded():
    """An IDAT inflating far past the declared scanlines must error,
    not allocate: the inflate is capped at the declared geometry."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)

    def chunk(tag, bd):
        return (struct.pack(">I", len(bd)) + tag + bd
                + struct.pack(">I", zlib.crc32(tag + bd) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="wrong size"):
        decode_png(png)


def _df(spark, payloads):
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


@pytest.fixture(scope="module")
def corrupt_df(spark):
    good = [_good_png(), _good_wav(), _good_jpeg()]
    return _df(
        spark, good + CORRUPT_PNGS + CORRUPT_WAVS + CORRUPT_JPEGS
    ).repartition(4)


def test_decode_metadata_survives_and_quarantines(corrupt_df):
    out = decode_metadata(corrupt_df, with_status=True).collect()
    assert len(out) == corrupt_df.count()  # zero task failures
    statuses = [r.decode_status for r in out]
    assert any(s.startswith("quarantined:") for s in statuses)
    assert all(r.fake_width > 0 and r.fake_height > 0 for r in out)
    # report the quarantine split the way a pipeline would
    n_q = sum(s.startswith("quarantined:") for s in statuses)
    assert n_q < len(out)  # the good rows decoded


def test_decode_metadata_default_schema_unchanged(corrupt_df):
    out = decode_metadata(corrupt_df)
    assert "decode_status" not in out.columns
    assert out.count() == corrupt_df.count()


def test_decode_metadata_arrow_survives_and_matches_pandas(corrupt_df):
    a = sorted(decode_metadata(corrupt_df).collect())
    b = sorted(decode_metadata_arrow(corrupt_df).collect())
    assert a == b


def test_resize_survives_corrupt_payloads(corrupt_df):
    out = resize_stub(corrupt_df, 16, 16).collect()
    assert len(out) == corrupt_df.count()
    assert all(r.width == 16 and r.height == 16 for r in out)


def test_audio_chunk_survives_corrupt_payloads(corrupt_df):
    out = audio_chunk_stub(corrupt_df).collect()
    assert len(out) >= corrupt_df.count()  # >=1 chunk per row
    assert all(r.n_samples >= 0 and r.fake_rms >= 0.0 for r in out)


def test_quarantined_rows_are_deterministic(corrupt_df):
    a = sorted(decode_metadata(corrupt_df, with_status=True).collect())
    b = sorted(decode_metadata(corrupt_df, with_status=True).collect())
    assert a == b


def test_md5_still_native_on_corrupt(corrupt_df):
    stub = decode_metadata(corrupt_df).select("doc_id", "content_md5")
    native = corrupt_df.select("doc_id", F.md5("payload").alias("content_md5"))
    assert stub.exceptAll(native).count() == 0


def test_corrupt_wav_takes_quarantine_lane(spark):
    """ADVICE r5: corrupt magic-valid RIFF/WAVE payloads must report
    'quarantined:<Error>' (not 'stub') and valid WAVs decode for real
    (status 'wav', width=sample_rate, height=channels)."""
    df = _df(spark, [_good_wav()] + CORRUPT_WAVS)
    out = decode_metadata(df, with_status=True).collect()
    by_id = {r.doc_id: r for r in out}
    good = by_id[0]
    assert good.decode_status == "wav"
    assert good.fake_width == 8000 and good.fake_height == 2
    assert good.fake_n_frames == 800
    statuses = [r.decode_status for i, r in by_id.items() if i > 0]
    # truncation before fmt parses and bit-flipped lengths both land
    # in quarantine; an intact fmt chunk with flipped sample bytes can
    # still header-probe ('wav') — what must NOT appear is silent 'stub'
    assert any(s.startswith("quarantined:") for s in statuses)
    assert "stub" not in statuses


def test_multiscan_jpeg_falls_to_stub_not_garbage():
    """ADVICE r5: a baseline JPEG whose first SOS covers fewer
    components than the SOF declares (non-interleaved scans, legal per
    T.81) must raise UnsupportedJpeg — previously it silently decoded
    only component 1 and returned a wrong image."""
    good = _good_jpeg()
    i = good.find(b"\xff\xda")
    assert i > 0
    # rewrite the 3-component SOS header to a single-component scan:
    # length 8, ns=1, first (cs, tables) pair, then Ss/Se/AhAl
    old_len = struct.unpack(">H", good[i + 2 : i + 4])[0]
    sos = good[i + 2 : i + 2 + old_len]
    new_sos = struct.pack(">HB", 8, 1) + sos[3:5] + sos[-3:]
    patched = good[:i + 2] + new_sos + good[i + 2 + old_len :]
    with pytest.raises(UnsupportedJpeg, match="multi-scan"):
        decode_jpeg(patched)
    # and through the operator it's a stub, not a quarantine (the
    # layout is VALID, just unimplemented — mirrors progressive)
    from datalake_scripts_spark.operators.multimodal import (
        _decode_dims_status,
    )

    # dims probe still succeeds (SOF carries dims regardless)
    w, h, nf, status = _decode_dims_status(patched)
    assert status == "jpeg" and (w, h) == (12, 16)


def _progressive_jpeg(w=20, h=12) -> bytes:
    comps = b"".join(struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3))
    sof2 = struct.pack(">BHHB", 8, h, w, 3) + comps
    return (b"\xff\xd8\xff\xc2" + struct.pack(">H", len(sof2) + 2)
            + sof2 + b"\xff\xd9")


def test_progressive_dims_probe_and_truncations():
    """VERDICT r5 ask #3: SOF2 files report REAL dims (status
    jpeg_progressive); truncated/bit-flipped SOF2 headers quarantine,
    never crash, never report as plain 'stub' with fake dims marked
    real."""
    from datalake_scripts_spark.functions.jpeg import jpeg_frame_info
    from datalake_scripts_spark.operators.multimodal import (
        _decode_dims_status,
    )

    good = _progressive_jpeg()
    assert jpeg_frame_info(good) == (20, 12, 3, "progressive")
    w, h, nf, status = _decode_dims_status(good)
    assert (w, h, nf, status) == (20, 12, 1, "jpeg_progressive")
    # full decode is implemented now (r7), but THIS payload is a bare
    # frame header with no scan — still an error, never garbage
    with pytest.raises(ValueError):
        decode_jpeg(good)
    # truncations: while the SOF2 frame header is incomplete the row
    # survives via stub/quarantine; once the header is whole (byte 21
    # in this layout) the probe legitimately reports real dims again
    header_end = 6 + (len(good) - 8)  # SOI+marker+len, payload, EOI
    for cut in range(2, len(good) - 1):
        _, _, _, st_ = _decode_dims_status(good[:cut])
        if cut < header_end:
            assert st_ == "stub" or st_.startswith("quarantined:"), (cut, st_)
        else:
            assert st_ == "jpeg_progressive", (cut, st_)
    # bit flips across the frame header
    for pos in range(2, len(good)):
        b = bytearray(good)
        b[pos] ^= 0xFF
        _decode_dims_status(bytes(b))  # must not raise


def test_frame_info_covers_all_sof_codings():
    from datalake_scripts_spark.functions.jpeg import (
        SOF_CODINGS,
        jpeg_frame_info,
    )

    for marker, coding in SOF_CODINGS.items():
        comps = b"".join(
            struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3)
        )
        sof = struct.pack(">BHHB", 8, 7, 9, 3) + comps
        data = (b"\xff\xd8" + bytes([0xFF, marker])
                + struct.pack(">H", len(sof) + 2) + sof + b"\xff\xd9")
        assert jpeg_frame_info(data) == (9, 7, 3, coding)
