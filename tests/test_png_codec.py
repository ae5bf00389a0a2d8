"""Real PNG codec (functions.png) + its integration into the
multimodal Arrow stages: decode/resize of actual generated PNGs
e2e through mapInPandas, stub fallback (and therefore the DuckDB
oracle twins) untouched for non-PNG payloads."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from datalake_scripts_spark.functions.png import (
    UnsupportedPng,
    decode_png,
    encode_png,
    is_png,
    png_dimensions,
    resize_bilinear,
    resize_nearest,
)


def test_roundtrip_exact_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(5, 7), (8, 6, 3), (4, 4, 4), (1, 1, 3), (33, 17, 3)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = encode_png(a)
        assert is_png(b)
        expected = a[:, :, None] if a.ndim == 2 else a
        assert np.array_equal(decode_png(b), expected)
        w, h, ch = png_dimensions(b)
        assert (h, w, ch) == expected.shape


def test_decode_all_five_filter_types_independent_encoder():
    """Decode a PNG whose rows were filtered by an INDEPENDENT encoder
    (one row per filter type 0..4) — proves the unfilter math, not
    just self-consistency with our own filter-0 encoder."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    stride = 5 * 3

    def paeth(pa, pb, pc):
        p = pa + pb - pc
        da, db, dc = abs(p - pa), abs(p - pb), abs(p - pc)
        return pa if da <= db and da <= dc else (pb if db <= dc else pc)

    rows, prev = [], np.zeros(stride, dtype=np.int32)
    for y in range(6):
        line = a[y].reshape(-1).astype(np.int32)
        f = y % 5
        enc = line.copy()
        if f == 1:
            enc[3:] = (line[3:] - line[:-3]) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            for x in range(stride):
                left = line[x - 3] if x >= 3 else 0
                enc[x] = (line[x] - ((left + prev[x]) // 2)) % 256
        elif f == 4:
            for x in range(stride):
                left = int(line[x - 3]) if x >= 3 else 0
                ul = int(prev[x - 3]) if x >= 3 else 0
                enc[x] = (line[x] - paeth(left, int(prev[x]), ul)) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), a)


def test_corrupt_and_unsupported_pngs_rejected():
    a = np.zeros((2, 2, 3), np.uint8)
    good = encode_png(a)
    with pytest.raises(ValueError, match="CRC"):
        decode_png(good[:-5] + bytes(5))
    # 16-bit depth: valid magic, unsupported layout
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    deep = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedPng):
        decode_png(deep)
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png at all")


def test_resize_shapes_and_values():
    big = np.zeros((10, 10, 3), np.uint8)
    big[:5, :, :] = 255
    nn = resize_nearest(big, 4, 4)
    bl = resize_bilinear(big, 4, 4)
    assert nn.shape == (4, 4, 3) and bl.shape == (4, 4, 3)
    assert nn[0, 0, 0] == 255 and nn[3, 0, 0] == 0
    # bilinear preserves flat regions exactly
    assert bl[0, 0, 0] == 255 and bl[3, 0, 0] == 0
    # grayscale keeps its rank
    assert resize_bilinear(np.arange(16, dtype=np.uint8).reshape(4, 4), 2, 2).shape == (2, 2)


def test_decode_metadata_real_png_through_arrow(spark):
    """e2e: real generated PNGs flow through the mapInPandas decode
    stage and come back with their TRUE dimensions (VERDICT r3 ask #5);
    non-PNG payloads in the same batch keep the deterministic stub
    dims the oracle twin recomputes."""
    from datalake_scripts_spark.operators.multimodal import decode_metadata

    rng = np.random.default_rng(11)
    png_a = encode_png(rng.integers(0, 256, size=(24, 48, 3), dtype=np.uint8))
    png_b = encode_png(rng.integers(0, 256, size=(7, 9), dtype=np.uint8))
    raw = b"plain text payload"
    df = spark.createDataFrame(
        [(1, bytearray(png_a)), (2, bytearray(png_b)), (3, bytearray(raw))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_metadata(df).collect()}
    assert (got[1].fake_width, got[1].fake_height, got[1].fake_n_frames) == (48, 24, 1)
    assert (got[2].fake_width, got[2].fake_height) == (9, 7)
    h = hashlib.md5(raw).digest()
    assert (got[3].fake_width, got[3].fake_height, got[3].fake_n_frames) == (
        16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 8,
    )
    assert got[1].n_bytes == len(png_a)
    assert got[1].content_md5 == hashlib.md5(png_a).hexdigest()


def test_resize_real_png_through_arrow(spark):
    """e2e: the resize stage decodes, bilinear-resamples, and
    re-encodes real PNGs executor-side; the output payload is a valid
    PNG of the target size."""
    from datalake_scripts_spark.operators.multimodal import resize_stub

    rng = np.random.default_rng(13)
    src = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(src))), (2, bytearray(b"not a png"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in resize_stub(df, 8, 6).collect()}
    out = decode_png(bytes(got[1].payload))
    assert out.shape == (6, 8, 3)
    assert np.array_equal(out, resize_bilinear(src, 8, 6))
    assert (got[1].orig_width, got[1].orig_height) == (30, 20)
    # non-PNG payload keeps the stub contract: fixed-size byte block
    assert len(bytes(got[2].payload)) == 8 * 6


# ---------------------------------------------------------------------------
# WAV codec (functions.wav) — audio sibling of the PNG tests above
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact_mono_and_stereo():
    from datalake_scripts_spark.functions.wav import (
        decode_wav, encode_wav, wav_info,
    )

    rng = np.random.default_rng(5)
    for shape, rate in [((100,), 16000), ((333, 2), 44100), ((1, 1), 8000)]:
        a = rng.integers(-(2**15), 2**15, size=shape, dtype=np.int16)
        b = encode_wav(a, rate)
        decoded, got_rate = decode_wav(b)
        expected = a[:, None] if a.ndim == 1 else a
        assert got_rate == rate
        assert np.array_equal(decoded, expected)
        n, r, ch = wav_info(b)
        assert (n, r, ch) == (expected.shape[0], rate, expected.shape[1])


def test_wav_unsupported_and_corrupt_rejected():
    import struct

    from datalake_scripts_spark.functions.wav import (
        UnsupportedWav, decode_wav, encode_wav,
    )

    with pytest.raises(ValueError):
        decode_wav(b"not riff data at all!!")
    # float-PCM (format 3) is valid WAV but unsupported here
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(UnsupportedWav):
        decode_wav(bad)
    assert decode_wav(encode_wav(np.zeros(4, np.int16)))[0].shape == (4, 1)


def test_audio_chunk_real_wav_rms(spark):
    """audio_chunk_stub takes the REAL path for WAV payloads: declared
    sample rate wins, chunk fan-out matches the data chunk, and
    fake_rms carries the true per-chunk RMS energy."""
    from datalake_scripts_spark.functions.wav import encode_wav, rms_int16
    from datalake_scripts_spark.operators.multimodal import audio_chunk_stub

    rate, n = 8000, 8000 + 1234  # 2 chunks at 1000 ms
    rng = np.random.default_rng(17)
    pcm = rng.integers(-(2**15), 2**15, size=(n, 1), dtype=np.int16)
    wav = encode_wav(pcm, rate)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"raw-non-wav-payload-xx"))],
        "doc_id long, payload binary",
    )
    rows = audio_chunk_stub(df, sample_rate=16000, chunk_ms=1000).collect()
    wav_chunks = sorted(
        [r for r in rows if r.doc_id == 1], key=lambda r: r.chunk_idx
    )
    assert len(wav_chunks) == 2  # 8000-sample chunks at the DECLARED 8 kHz
    assert wav_chunks[0].n_samples == 8000
    assert wav_chunks[1].n_samples == 1234
    assert abs(wav_chunks[0].fake_rms - rms_int16(pcm[:8000])) < 1e-9
    assert abs(wav_chunks[1].fake_rms - rms_int16(pcm[8000:])) < 1e-9
    # non-WAV payload keeps the md5-derived stub rms in [0, 1)
    stub = [r for r in rows if r.doc_id == 2]
    assert len(stub) == 1 and 0.0 <= stub[0].fake_rms < 1.0


def test_wav_roundtrip_check_through_arrow(spark, sf_dir):
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.multimodal import wav_roundtrip_check
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").limit(40)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    rows = wav_roundtrip_check(payloads).collect()
    assert len(rows) == 40
    assert all(r.pcm_ok and r.sample_rate == 16000 for r in rows)
    assert all(r.n_chunks == -(-r.n_samples // 4000) for r in rows)


def test_decode_metadata_arrow_real_png(spark):
    """The mapInArrow hot-path twin detects real PNG dims identically
    to the mapInPandas path (it previously bypassed the codec probe)."""
    from datalake_scripts_spark.operators.multimodal import (
        decode_metadata,
        decode_metadata_arrow,
    )

    rng = np.random.default_rng(23)
    png = encode_png(rng.integers(0, 256, size=(12, 34, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"rawbytes"))],
        "doc_id long, payload binary",
    )
    a = {r.doc_id: r for r in decode_metadata_arrow(df).collect()}
    p = {r.doc_id: r for r in decode_metadata(df).collect()}
    assert (a[1].fake_width, a[1].fake_height) == (34, 12)
    for k in (1, 2):
        assert a[k] == p[k]
