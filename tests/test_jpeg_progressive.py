"""Progressive JPEG (SOF2) encode/decode — functions/jpeg.py Annex G
section (VERDICT r6 ask #1).

The load-bearing property: a progressive file carries the SAME
quantized coefficients as the baseline file at the same quality, so
decoding either must yield BIT-IDENTICAL pixels. That cross-path
equality is the oracle here (a symmetric encoder/decoder bug cannot
cancel out — the baseline path is independently tested against its
own bounded-error roundtrip and external-dialect checks).

Reference-parity note: the reference's binary-recording ingest
(zoom_load.py:148-206) is exactly this decode-web-media shape; SOF2
is a large share of real web JPEGs.
"""

from __future__ import annotations

import numpy as np
import pytest

from datalake_scripts_spark.functions.jpeg import (
    _canonical_codes,
    _optimal_huffman,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    jpeg_dimensions,
    jpeg_frame_info,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "h,w,grey,sub",
    [
        (16, 16, False, "444"),
        (20, 19, False, "420"),  # odd dims: scan grid < interleaved grid
        (9, 25, True, "444"),
        (8, 8, False, "420"),
        (33, 17, False, "444"),
        (1, 1, True, "444"),
        (7, 64, False, "420"),
    ],
)
def test_progressive_equals_baseline_decode(h, w, grey, sub):
    px = _rand((h, w) if grey else (h, w, 3), seed=h * 100 + w)
    sub = "444" if grey else sub
    base = decode_jpeg(encode_jpeg(px, 90, sub))
    enc = encode_jpeg_progressive(px, 90, sub)
    assert jpeg_frame_info(enc)[3] == "progressive"
    assert jpeg_dimensions(enc) == (w, h, 1 if grey else 3)
    prog = decode_jpeg(enc)  # dispatches through the SOF2 path
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("quality", [35, 75, 95])
def test_progressive_equals_baseline_across_qualities(quality):
    px = _rand((24, 31, 3), seed=quality)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, quality, "420")),
        decode_jpeg(encode_jpeg_progressive(px, quality, "420")),
    )


@pytest.mark.parametrize("restart", [1, 2, 3, 7])
def test_progressive_restart_intervals(restart):
    px = _rand((24, 40, 3), seed=restart)
    enc = encode_jpeg_progressive(px, 85, "420", restart=restart)
    assert b"\xff\xdd" in enc  # DRI present
    assert np.array_equal(decode_jpeg(encode_jpeg(px, 85, "420")), decode_jpeg(enc))


def test_eob_runs_and_refinement_paths():
    # flat image: every AC band is an EOB run (EOBRUN >> 1, EOBn
    # symbols with extension bits)
    flat = np.full((64, 64, 3), 130, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, 90, "444")),
        decode_jpeg(encode_jpeg_progressive(flat, 90, "444")),
    )
    # one feature in a flat field: EOB runs interleaved with coded
    # blocks, ZRL + correction-bit buffering in the refinement scans
    px = np.full((48, 48, 3), 90, dtype=np.uint8)
    px[20:28, 20:28] = 250
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, 90, "444")),
        decode_jpeg(encode_jpeg_progressive(px, 90, "444")),
    )
    # smooth gradient: small coefficients everywhere — the
    # successive-approximation scans carry most of the signal
    g = (np.arange(48)[:, None] * np.arange(56)[None, :] % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, 75)),
        decode_jpeg(encode_jpeg_progressive(g, 75)),
    )


def test_spectral_selection_only_script():
    # Ah=Al=0 everywhere: pure spectral selection, no successive
    # approximation — the simplest legal progressive dialect
    px = _rand((17, 22, 3), seed=3)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    enc = encode_jpeg_progressive(px, 90, "444", scans=scans)
    assert np.array_equal(decode_jpeg(encode_jpeg(px, 90, "444")), decode_jpeg(enc))


def test_banded_spectral_script_with_approximation():
    # several AC bands per component plus two refinement levels
    px = _rand((40, 28, 3), seed=9)
    scans = [
        ([0, 1, 2], 0, 0, 0, 2),
        ([0], 1, 2, 0, 1),
        ([0], 3, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]
    enc = encode_jpeg_progressive(px, 80, "444", scans=scans)
    assert np.array_equal(decode_jpeg(encode_jpeg(px, 80, "444")), decode_jpeg(enc))


def test_optimal_huffman_tables_are_valid():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        syms = rng.integers(0, 256, n).tolist()
        bits, vals = _optimal_huffman(syms)
        assert len(bits) == 16 and sum(bits) == len(vals)
        assert sorted(set(vals)) == sorted(set(syms))
        codes, _dht = _canonical_codes(bits, vals)
        # kraft inequality strict (the reserved all-ones point is free)
        assert sum(2 ** (16 - length) for length, _ in codes.values()) < 2**16
        assert max(length for length, _ in codes.values()) <= 16


def test_truncation_fuzz_never_garbage():
    px = _rand((16, 20, 3), seed=4)
    good = encode_jpeg_progressive(px, 90, "420", restart=2)
    expected = decode_jpeg(good)
    step = max(1, len(good) // 80)
    for cut in range(2, len(good) - 1, step):
        # progressive is prefix-decodable by design: a truncation must
        # either raise a DECODE_ERRORS member or decode to a full-size
        # (coarser) image — never crash, never a wrong-shape array
        try:
            out = decode_jpeg(good[:cut])
            assert out.shape == expected.shape, cut
        except ValueError:  # includes UnsupportedJpeg
            pass
    # bit flips must raise a DECODE_ERRORS member or still decode to
    # the full-size image — never crash with an unexpected type
    for pos in range(2, len(good), step):
        b = bytearray(good)
        b[pos] ^= 0xFF
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == expected.shape
        except (ValueError, ZeroDivisionError):
            pass


def test_progressive_probe_status_and_decode_agree():
    from datalake_scripts_spark.operators.multimodal import _decode_dims_status

    px = _rand((12, 20, 3), seed=8)
    enc = encode_jpeg_progressive(px, 90)
    w, h, nf, status = _decode_dims_status(enc)
    assert (w, h, status) == (20, 12, "jpeg_progressive")
    assert decode_jpeg(enc).shape == (12, 20, 3)
