"""Pure-stdlib baseline JPEG codec (numpy DCT + huffman) — the real
image decode for web corpora, sibling of :mod:`functions.png` (VERDICT
r4 ask #6: "web corpora are mostly JPEG").

No PIL/libjpeg in this container, but baseline JFIF needs neither:
marker walk, DHT-driven huffman decode, dequantize, 8x8 inverse DCT
(one numpy matmul pair per block), chroma upsample, YCbCr->RGB. The
decoder handles what a crawl actually contains: baseline sequential
(SOF0), 8-bit, greyscale or 3-component YCbCr with sampling factors
1-2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, stuffed bytes, APPn /
COM skip — and progressive (SOF2, VERDICT r6 ask #1): spectral
selection plus successive approximation, i.e. multi-scan coefficient
accumulation with DC/AC refinement scans, EOB runs, and per-scan
huffman tables, T.81 Annex G semantics (the libjpeg
decode_mcu_*_first/_refine state machines re-derived from the public
spec). Arithmetic coding, 12-bit, and CMYK raise
:class:`UnsupportedJpeg`, and callers fall back to the deterministic
stub — same contract as PNG/WAV, with corrupt payloads covered by the
shared DECODE_ERRORS lane (operators.multimodal).

The encoder emits valid baseline JFIF with the Annex K (ITU-T T.81
K.3) typical huffman tables embedded in DHT markers — the exact
dialect libjpeg/cameras produce, decodable by any external decoder.
JPEG is lossy, so the property tests assert dimension exactness plus
bounded pixel error (decode(encode(x)) within quantization tolerance),
not bit equality.

Scale shape: per-row library functions inside Arrow-batched
``mapInPandas`` stages — bytes stay executor-side, no shuffle.
"""

from __future__ import annotations

import array
import struct

import numpy as np


class UnsupportedJpeg(ValueError):
    """Valid JPEG magic but a coding this codec doesn't implement
    (arithmetic, lossless, 12-bit, >2x sampling, CMYK). Baseline,
    extended-sequential, and progressive (SOF0/SOF1/SOF2) decode."""


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# zigzag scan order: index i holds the raster position of the i-th
# zigzag coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (quality 50 baseline), zigzag-independent
# raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    t = np.sqrt(2.0 / 8.0) * np.cos((2 * j + 1) * i * np.pi / 16.0)
    t[0] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling of the Annex K tables."""
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (qt * scale + 50) // 100
    return np.clip(out, 1, 255)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

# Annex K typical huffman tables (ITU-T T.81 K.3) — the tables every
# camera/libjpeg baseline file ships, so our output is byte-for-byte
# the canonical dialect. BITS = count of codes per length 1..16;
# HUFFVAL = symbols in canonical order. The decoder never relies on
# these (it builds from each file's DHT); the encoder embeds them.
_DC_LUMA_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_LUMA_VALS = bytes(range(12))
_DC_CHROMA_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_CHROMA_VALS = bytes(range(12))
_AC_LUMA_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _canonical_codes(bits: bytes, vals: bytes):
    """Symbol -> (length, code) from a canonical BITS/HUFFVAL pair,
    plus the DHT payload that declares it."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes, bytes(bits) + bytes(vals)


_DC_LUMA_CODES, _DC_LUMA_DHT = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
_DC_CHROMA_CODES, _DC_CHROMA_DHT = _canonical_codes(
    _DC_CHROMA_BITS, _DC_CHROMA_VALS
)
_AC_LUMA_CODES, _AC_LUMA_DHT = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
_AC_CHROMA_CODES, _AC_CHROMA_DHT = _canonical_codes(
    _AC_CHROMA_BITS, _AC_CHROMA_VALS
)


# list-indexed code tables for the entropy hot loop: entry = (length,
# code); index = symbol. ~2x faster than dict lookups per symbol.
_LUMA_TABLES = (
    [_DC_LUMA_CODES[s] for s in range(12)],
    [_AC_LUMA_CODES.get(s) for s in range(256)],
)
_CHROMA_TABLES = (
    [_DC_CHROMA_CODES[s] for s in range(12)],
    [_AC_CHROMA_CODES.get(s) for s in range(256)],
)


def _block_zigzag_rows(plane: np.ndarray, qt: np.ndarray) -> tuple[list, int]:
    """DCT + quantize + zigzag for EVERY 8x8 block of a padded plane in
    one batched numpy pass (the per-block matmul loop measured 2x the
    encoder's runtime); returns (row-major list of 64-int lists, blocks
    per row). Entropy coding stays per-block Python — it is inherently
    sequential — but now walks plain ints."""
    ph, pw = plane.shape
    nby, nbx = ph // 8, pw // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
    coeffs = _T @ blocks @ _T.T  # broadcasts over the (nby, nbx) axes
    zz = (
        np.round(coeffs / qt)
        .astype(np.int64)
        .reshape(nby * nbx, 64)[:, _ZIGZAG]
    )
    return zz.tolist(), nbx


def _entropy_block(
    buf: bytearray, acc: int, nbits: int, zz: list, pred: int, tables
) -> tuple[int, int, int]:
    """Huffman-encode one zigzagged block into ``buf`` (byte-stuffed).
    Bit accumulator rides in plain ints (acc, nbits) — attribute access
    and per-write method calls were the encoder's hot spot."""
    dc_codes, ac_codes = tables
    diff = zz[0] - pred
    if diff == 0:
        size = 0
        v_bits = 0
    else:
        size = (diff if diff > 0 else -diff).bit_length()
        v_bits = diff if diff > 0 else diff + (1 << size) - 1
    code_len, code = dc_codes[size]
    acc = (acc << (code_len + size)) | (code << size) | v_bits
    nbits += code_len + size
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last = k
            break
    zrl_len, zrl_code = ac_codes[0xF0]
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            acc = (acc << zrl_len) | zrl_code
            nbits += zrl_len
            run -= 16
        size = (v if v > 0 else -v).bit_length()
        v_bits = v if v > 0 else v + (1 << size) - 1
        code_len, code = ac_codes[(run << 4) | size]
        acc = (acc << (code_len + size)) | (code << size) | v_bits
        nbits += code_len + size
        run = 0
    if last < 63:
        eob_len, eob_code = ac_codes[0x00]
        acc = (acc << eob_len) | eob_code
        nbits += eob_len
    while nbits >= 8:
        nbits -= 8
        byte = (acc >> nbits) & 0xFF
        buf.append(byte)
        if byte == 0xFF:
            buf.append(0x00)  # byte stuffing
    acc &= (1 << nbits) - 1
    return acc, nbits, zz[0]


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]  # edge-replicate pad
    out[:, w:] = out[:, w - 1 : w]
    return out


def _prepare_planes(arr: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both encoders: color convert, pad to the
    interleaved MCU grid, subsample chroma. Returns (h, w, comps, qts)
    where comps entries are (plane, h_i, v_i, quant_id, huff_id)."""
    a = np.asarray(arr, dtype=np.float64)
    grey = a.ndim == 2
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} not in 444/420")
    sub = 2 if (subsampling == "420" and not grey) else 1
    qts = [_quality_scale(_QT_LUMA, quality)]
    if not grey:
        if a.shape[2] != 3:
            raise ValueError(f"expected 3 channels, got {a.shape[2]}")
        qts.append(_quality_scale(_QT_CHROMA, quality))
        ycc = _rgb_to_ycbcr(a)
        mcu = 8 * sub
        ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
        luma = _pad_edge(ycc[:, :, 0], ph, pw)
        chroma = [_pad_edge(ycc[:, :, c], ph, pw) for c in (1, 2)]
        if sub == 2:  # 2x2 box average
            chroma = [
                c.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                for c in chroma
            ]
        comps = [(luma, sub, sub, 0, 0)] + [
            (c, 1, 1, 1, 1) for c in chroma
        ]  # (plane, h_i, v_i, quant_id, huff_id)
    else:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        comps = [(_pad_edge(a, ph, pw), 1, 1, 0, 0)]
    return h, w, comps, qts


def _emit_headers(
    qts: list, h: int, w: int, comps: list, sof_marker: int
) -> bytearray:
    """SOI + APP0 + DQT(s) + SOFn — identical layout for every coding
    process (T.81 B.2.2); only the SOF marker differs."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, qt in enumerate(qts):
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c, (_pl, hi, vi, tq, _th) in enumerate(comps):
        sof += struct.pack("BBB", c + 1, (hi << 4) | vi, tq)
    out += (
        bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    )
    return out


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """uint8 array (H,W) or (H,W,3) -> baseline JFIF bytes (one
    interleaved scan, embedded huffman/quant tables). ``subsampling``
    is ``"444"`` or ``"420"`` (2x2 box-averaged chroma — the web's
    default layout, which also exercises the decoder's upsampling
    path). Lossy: decodes back to the same dimensions with bounded
    pixel error."""
    h, w, comps, qts = _prepare_planes(arr, quality, subsampling)
    grey = len(comps) == 1
    n_comp = len(comps)

    out = _emit_headers(qts, h, w, comps, 0xC0)
    for tclass_tid, table in (
        (0x00, _DC_LUMA_DHT), (0x10, _AC_LUMA_DHT),
        *(((0x01, _DC_CHROMA_DHT), (0x11, _AC_CHROMA_DHT)) if not grey else ()),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(table), tclass_tid) + table
    sos = struct.pack("B", n_comp)
    for c, (_pl, _hi, _vi, _tq, th) in enumerate(comps):
        sos += struct.pack("BB", c + 1, (th << 4) | th)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    buf = bytearray()
    acc = 0
    nbits = 0
    preds = [0] * n_comp
    hmax = max(hi for _pl, hi, _vi, _tq, _th in comps)
    vmax = max(vi for _pl, _hi, vi, _tq, _th in comps)
    mcus_y = comps[0][0].shape[0] // (8 * vmax)
    mcus_x = comps[0][0].shape[1] // (8 * hmax)
    zz_rows = [_block_zigzag_rows(pl, qts[tq]) for pl, _h, _v, tq, _t in comps]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c, (_pl, hi, vi, _tq, _th) in enumerate(comps):
                rows, nbx = zz_rows[c]
                tables = _LUMA_TABLES if c == 0 else _CHROMA_TABLES
                for v in range(vi):
                    for hs in range(hi):
                        zz = rows[(my * vi + v) * nbx + (mx * hi + hs)]
                        acc, nbits, preds[c] = _entropy_block(
                            buf, acc, nbits, zz, preds[c], tables
                        )
    if nbits:  # pad the final partial byte with 1-bits
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        byte = acc & 0xFF
        buf.append(byte)
        if byte == 0xFF:
            buf.append(0x00)
    out += buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


_LUT_CACHE: dict[bytes, "array.array"] = {}


def _build_huffman(bits: bytes, vals: bytes):
    """Canonical JPEG huffman as a 16-bit-peek LUT: a 65536-entry
    ``array('H')`` mapping the next-16-bits window to
    ``(code_length << 8) | symbol``; entry 0 marks an invalid prefix.
    One array index replaces the bit-by-bit walk (measured 4x decode
    speedup), and the table is cached by its DHT bytes — a corpus
    batch of BASELINE images re-uses one build.

    Built via numpy repeat (canonical codes fill the window
    contiguously from 0, so the LUT is runs of one entry each plus a
    zero tail) into a C unsigned-short array: 34 us per table vs
    ~1.4 ms for the r12 list-repetition build. That matters because
    PROGRESSIVE scans each carry their own optimal table — the cache
    never amortizes them — and at the bench's 8-32 px fixture the list
    build alone was 25% of the WHOLE codec profile (r13, guide §1.2
    step 2). Indexing an array('H') costs ~50 ns more per lookup than
    a list, repaid hundreds-fold on the build at every image size, and
    the cache shrinks from 512 KB to 128 KB per table."""
    key = bytes(bits) + b"|" + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    if len(bits) != 16 or len(vals) != sum(bits):
        raise ValueError("truncated JPEG huffman table")
    entries: list = []
    runs: list = []
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if code + n > (1 << length):
            raise ValueError("overfull JPEG huffman table")
        run = 1 << (16 - length)
        for _ in range(n):
            entries.append((length << 8) | vals[k])
            runs.append(run)
            code += 1
            k += 1
        code <<= 1
    body = np.repeat(
        np.asarray(entries, dtype=np.uint16), np.asarray(runs)
    )
    if body.size < (1 << 16):
        body = np.concatenate(
            [body, np.zeros((1 << 16) - body.size, dtype=np.uint16)]
        )
    lut = array.array("H", body.tobytes())
    if len(_LUT_CACHE) > 64:
        # evict one (FIFO) instead of clearing: a mass clear of 64
        # 65536-entry tables showed up as deallocation spikes (r12)
        _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    _LUT_CACHE[key] = lut
    return lut


def _parse_dqt(payload: bytes, qts: dict) -> None:
    """DQT payload (possibly several tables per marker) -> raster 8x8
    tables keyed by id, into ``qts``."""
    p = 0
    while p < len(payload):
        pq, tq = payload[p] >> 4, payload[p] & 0xF
        if pq != 0:
            raise UnsupportedJpeg("16-bit quant table")
        raster = np.empty(64, dtype=np.int64)
        raster[_ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
        qts[tq] = raster.reshape(8, 8)
        p += 65


def _parse_dht(payload: bytes, huff: dict) -> None:
    """DHT payload (possibly several tables per marker) -> 16-bit-peek
    LUTs keyed by (class, id), into ``huff``."""
    p = 0
    while p < len(payload):
        tc, th = payload[p] >> 4, payload[p] & 0xF
        bits = payload[p + 1 : p + 17]
        n = sum(bits)
        vals = payload[p + 17 : p + 17 + n]
        huff[(tc, th)] = _build_huffman(bits, vals)
        p += 17 + n


def _parse_sof_components(payload: bytes) -> tuple[int, int, list[dict]]:
    """SOFn payload -> (h, w, comps) with the envelope checks shared by
    every decodable coding process (8-bit, 1/3 comps, sampling 1-2)."""
    prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
    if prec != 8:
        raise UnsupportedJpeg(f"{prec}-bit precision")
    if ncomp not in (1, 3):
        raise UnsupportedJpeg(f"{ncomp} components")
    comps = []
    for c in range(ncomp):
        cid, hv, tq = struct.unpack("BBB", payload[6 + 3 * c : 9 + 3 * c])
        hi, vi = hv >> 4, hv & 0xF
        if hi not in (1, 2) or vi not in (1, 2):
            raise UnsupportedJpeg(f"sampling {hi}x{vi}")
        comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
    return h, w, comps


def _entropy_intervals(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy stream beginning at ``start``, splitting at
    RST markers. Returns (intervals, end) where ``end`` indexes the
    0xFF of the terminating marker (or len(data))."""
    intervals: list[bytes] = []
    cur = bytearray()
    p = start
    n = len(data)
    # copy non-FF runs as C-speed slices (bytes.find) instead of one
    # Python iteration per byte — this pass was ~15% of progressive
    # decode (r12 profile); split/unstuff decisions are unchanged
    while p < n:
        f = data.find(0xFF, p)
        if f < 0:
            cur += data[p:]
            p = n
            break
        cur += data[p:f]
        p = f
        nxt = data[p + 1] if p + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:
            break  # EOI or next marker
    intervals.append(bytes(cur))
    return intervals, p


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _parse_segments(data: bytes):
    """Yields (marker, payload, payload_offset); stops at SOS (the
    entropy stream follows, not a counted segment)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG segment truncated")
        yield marker, payload, pos + 4
        if marker == 0xDA:
            return
        pos += 2 + length
    raise ValueError("JPEG ended without SOS/EOI")


# SOFn marker -> coding process name (ITU T.81 table B.1). The frame
# header layout (precision, height, width, components) is IDENTICAL
# for every process — dimensions are probe-able even when full decode
# isn't implemented (VERDICT r5 ask #3: progressive is a large share
# of real web images; a crawl pipeline needs its dims immediately).
SOF_CODINGS = {
    0xC0: "baseline",
    0xC1: "extended",
    0xC2: "progressive",
    0xC3: "lossless",
    0xC5: "diff_sequential",
    0xC6: "diff_progressive",
    0xC7: "diff_lossless",
    0xC9: "arith_sequential",
    0xCA: "arith_progressive",
    0xCB: "arith_lossless",
    0xCD: "arith_diff_sequential",
    0xCE: "arith_diff_progressive",
    0xCF: "arith_diff_lossless",
}


def jpeg_frame_info(data: bytes) -> tuple[int, int, int, str]:
    """(width, height, components, coding) from the FIRST SOF header —
    O(1) metadata probe for every T.81 coding process, no entropy
    decode. ``coding`` is a :data:`SOF_CODINGS` name; only
    ``baseline``/``extended`` are decodable by :func:`decode_jpeg`.
    A truncated SOF payload raises struct.error (in the operator
    layer's DECODE_ERRORS -> quarantine lane)."""
    data = bytes(data)
    for marker, payload, _off in _parse_segments(data):
        if marker in SOF_CODINGS:
            _prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if w == 0 or h == 0:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            return w, h, ncomp, SOF_CODINGS[marker]
    raise ValueError("JPEG has no SOF marker")


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the SOF header alone — O(1)
    metadata probe, no entropy decode (the 100 TB metadata-pass path).
    Raises :class:`UnsupportedJpeg` for codings :func:`decode_jpeg`
    cannot decode (arithmetic/lossless); use :func:`jpeg_frame_info`
    when dims of ANY coding are wanted."""
    w, h, ncomp, coding = jpeg_frame_info(data)
    if coding not in ("baseline", "extended", "progressive"):
        raise UnsupportedJpeg(f"coding {coding}")
    return w, h, ncomp


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array (H,W,3) RGB, or (H,W,1) for
    greyscale. Real entropy + DCT math; see module docstring for the
    supported envelope."""
    data = bytes(data)
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    scan_comps, scan_off = None, None
    for marker, payload, off in _parse_segments(data):
        if marker == 0xDB:  # DQT (possibly several tables per marker)
            _parse_dqt(payload, qts)
        elif marker == 0xC4:  # DHT (possibly several tables per marker)
            _parse_dht(payload, huff)
        elif marker in (0xC0, 0xC1):
            sof = _parse_sof_components(payload)
        elif marker == 0xC2:
            return _decode_progressive(data)  # full multi-scan walk
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(f"SOF marker 0xff{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            scan_off = off + len(payload)
        # APPn / COM / others: skipped
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    if len(scan_comps) < len(comps):
        # non-interleaved multi-scan baseline (one SOS per component,
        # legal per T.81 §B.2.3): _parse_segments stops at the FIRST
        # SOS, so decoding would silently fill only component 1 and
        # return a wrong image (zero chroma). Route to the stub lane
        # like progressive does instead of returning garbage.
        raise UnsupportedJpeg(
            f"multi-scan baseline: first SOS covers {len(scan_comps)} of "
            f"{len(comps)} components"
        )
    if h == 0 or w == 0 or h * w > 1 << 28:
        raise ValueError(f"implausible JPEG dimensions {w}x{h}")

    intervals, _end = _entropy_intervals(data, scan_off)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = []  # (comp_index, dc_table, ac_table) per scan component
    for cs, td, ta in scan_comps:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        order.append((by_id[cs], td, ta))

    # entropy-decode every block's zigzag coefficients first (the
    # inherently sequential part, plain ints); the dequantize + IDCT
    # runs batched afterwards — one numpy pass per component instead of
    # one matmul pair per block (measured ~2x decode win)
    blocks_zz: list[list] = [[] for _ in comps]
    blocks_at: list[list] = [[] for _ in comps]
    # resolve tables ONCE per scan (they cannot change mid-scan) and
    # decode with the bit-reader state in plain locals: the previous
    # one-call-per-coefficient shape (_decode_coeff) paid a Python call
    # + 8 attribute syncs per coefficient — ~45% of baseline decode
    # (r12 profile, guide §4.2's "make the per-batch inner loop native
    # speed" applied to the interpreter itself)
    per_comp = []
    for ci, td, ta in order:
        comp = comps[ci]
        dc_t = huff.get((0, td))
        ac_t = huff.get((1, ta))
        if dc_t is None or ac_t is None or comp["tq"] not in qts:
            raise ValueError("JPEG scan references missing table")
        per_comp.append((ci, comp["v"], comp["h"], dc_t, ac_t))
    bdata = intervals[0]
    dlen = len(bdata)
    pos = nbits = acc = 0
    interval_i = 0
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                interval_i += 1
                if interval_i >= len(intervals):
                    raise ValueError("JPEG missing restart interval data")
                bdata = intervals[interval_i]
                dlen = len(bdata)
                pos = nbits = acc = 0
                preds = [0] * len(comps)
            for ci, cv, ch, dc_t, ac_t in per_comp:
                for v in range(cv):
                    for hsub in range(ch):
                        zz = [0] * 64
                        # DC: huffman size symbol + magnitude bits
                        while nbits < 16 and pos < dlen:
                            acc = (acc << 8) | bdata[pos]
                            pos += 1
                            nbits += 8
                        if nbits >= 16:
                            w_ = (acc >> (nbits - 16)) & 0xFFFF
                        else:
                            w_ = (acc << (16 - nbits)) & 0xFFFF
                        entry = dc_t[w_]
                        length = entry >> 8
                        if length == 0 or length > nbits:
                            raise ValueError("invalid JPEG huffman code")
                        nbits -= length
                        acc &= (1 << nbits) - 1
                        s = entry & 0xFF
                        if s > 11:
                            raise ValueError("invalid DC size")
                        if s:
                            while nbits < s:
                                if pos >= dlen:
                                    raise ValueError(
                                        "JPEG entropy stream truncated"
                                    )
                                acc = (acc << 8) | bdata[pos]
                                pos += 1
                                nbits += 8
                            nbits -= s
                            bits_ = (acc >> nbits) & ((1 << s) - 1)
                            acc &= (1 << nbits) - 1
                            preds[ci] += (
                                bits_
                                if bits_ >= (1 << (s - 1))
                                else bits_ - (1 << s) + 1
                            )
                        zz[0] = preds[ci]
                        # AC: (run, size) symbols to EOB
                        k = 1
                        while k < 64:
                            while nbits < 16 and pos < dlen:
                                acc = (acc << 8) | bdata[pos]
                                pos += 1
                                nbits += 8
                            if nbits >= 16:
                                w_ = (acc >> (nbits - 16)) & 0xFFFF
                            else:
                                w_ = (acc << (16 - nbits)) & 0xFFFF
                            entry = ac_t[w_]
                            length = entry >> 8
                            if length == 0 or length > nbits:
                                raise ValueError("invalid JPEG huffman code")
                            nbits -= length
                            acc &= (1 << nbits) - 1
                            sym = entry & 0xFF
                            s = sym & 0xF
                            if s == 0:
                                if sym >> 4 == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            while nbits < s:
                                if pos >= dlen:
                                    raise ValueError(
                                        "JPEG entropy stream truncated"
                                    )
                                acc = (acc << 8) | bdata[pos]
                                pos += 1
                                nbits += 8
                            nbits -= s
                            bits_ = (acc >> nbits) & ((1 << s) - 1)
                            acc &= (1 << nbits) - 1
                            zz[k] = (
                                bits_
                                if bits_ >= (1 << (s - 1))
                                else bits_ - (1 << s) + 1
                            )
                            k += 1
                        blocks_zz[ci].append(zz)
                        blocks_at[ci].append(
                            ((my * cv + v) * 8, (mx * ch + hsub) * 8)
                        )
            mcu += 1

    planes = []
    for ci, comp in enumerate(comps):
        plane = np.zeros((mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8))
        if blocks_zz[ci]:
            qt_zz = qts[comp["tq"]].reshape(-1)[_ZIGZAG].astype(np.float64)
            deq = np.asarray(blocks_zz[ci], dtype=np.float64) * qt_zz
            mats = np.zeros((deq.shape[0], 64))
            mats[:, _ZIGZAG] = deq
            pix = _T.T @ mats.reshape(-1, 8, 8) @ _T + 128.0
            for b, (y0, x0) in enumerate(blocks_at[ci]):
                plane[y0 : y0 + 8, x0 : x0 + 8] = pix[b]
        planes.append(plane)

    full = []
    for ci, comp in enumerate(comps):
        pl = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ---------------------------------------------------------------------------
# progressive (SOF2) — T.81 Annex G, huffman coding
#
# A progressive file carries the SAME quantized coefficients as a
# baseline file, delivered across several scans: spectral selection
# splits the zigzag band (DC scan, then AC bands per component,
# non-interleaved), and successive approximation splits coefficient
# PRECISION (first scans send values >> Al, refinement scans send one
# bit per coefficient). Decoding therefore accumulates integer
# coefficients across scans and runs the normal dequantize + IDCT once
# at the end — which is also what makes the implementation provable:
# for the same quant tables, progressive decode must be BIT-IDENTICAL
# to baseline decode of the same image (the roundtrip tests assert
# exactly that cross-path equality).
#
# The scan state machines below re-derive the public-spec semantics
# (G.1.2.2-G.1.2.3: EOB runs, ZRL, correction bits) in the same shape
# libjpeg documents them — first/refine x DC/AC.
# ---------------------------------------------------------------------------


def _scan_grid(comp: dict, h: int, w: int, hmax: int, vmax: int):
    """(nby, nbx) of a NON-interleaved scan for one component: ceil
    block dims of the component's own sample grid (T.81 A.2.2) — NOT
    the interleaved MCU-padded grid, which can be one block larger."""
    cw = -(-w * comp["h"] // hmax)
    ch = -(-h * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive(data: bytes) -> np.ndarray:
    """SOF2 JFIF bytes -> uint8 array, same contract as
    :func:`decode_jpeg` (which dispatches here). Walks EVERY marker
    segment — tables may be redefined between scans — and applies each
    scan to per-component coefficient accumulators."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}
    sof = None
    restart = 0
    coeffs: list[list[list[int]]] = []  # per comp: block idx -> zigzag[64]
    geom = None  # (mcus_x, mcus_y, hmax, vmax, nbx_full per comp)
    pos = 2
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("JPEG segment truncated")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:
            _parse_dqt(payload, qts)
        elif marker == 0xC4:
            _parse_dht(payload, huff)
        elif marker == 0xC2:
            if sof is not None:
                raise UnsupportedJpeg("multiple SOF frames")
            h, w, comps = _parse_sof_components(payload)
            if h == 0 or w == 0 or h * w > 1 << 28:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            nbx_full = [mcus_x * c["h"] for c in comps]
            nby_full = [mcus_y * c["v"] for c in comps]
            coeffs = [
                [[0] * 64 for _ in range(nbx_full[ci] * nby_full[ci])]
                for ci in range(len(comps))
            ]
            sof = (h, w, comps)
            geom = (mcus_x, mcus_y, hmax, vmax, nbx_full, nby_full)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(
                f"SOF marker 0xff{marker:02x} in progressive stream"
            )
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            if len(payload) != 4 + 2 * ns:
                raise ValueError("JPEG scan header truncated")
            scan_comps = []
            h, w, comps = sof
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            for c in range(ns):
                cs, tables = payload[1 + 2 * c], payload[2 + 2 * c]
                if cs not in by_id:
                    raise ValueError(
                        f"JPEG scan references unknown component {cs}"
                    )
                scan_comps.append((by_id[cs], tables >> 4, tables & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            intervals, end = _entropy_intervals(data, pos + 2 + length)
            _decode_progressive_scan(
                intervals, scan_comps, ss, se, ah, al,
                comps, coeffs, huff, restart, geom, h, w,
            )
            saw_scan = True
            pos = end
            continue
        # APPn / COM / DNL / others: skipped
        pos += 2 + length
    if sof is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    mcus_x, mcus_y, hmax, vmax, nbx_full, nby_full = geom

    planes = []
    for ci, comp in enumerate(comps):
        if comp["tq"] not in qts:
            raise ValueError("JPEG frame references missing quant table")
        qt_zz = qts[comp["tq"]].reshape(-1)[_ZIGZAG].astype(np.float64)
        deq = np.asarray(coeffs[ci], dtype=np.float64) * qt_zz
        mats = np.zeros((deq.shape[0], 64))
        mats[:, _ZIGZAG] = deq
        pix = _T.T @ mats.reshape(-1, 8, 8) @ _T + 128.0
        nby, nbx = nby_full[ci], nbx_full[ci]
        plane = (
            pix.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        planes.append(plane)

    full = []
    for ci, comp in enumerate(comps):
        pl = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_progressive_scan(
    intervals: list[bytes],
    scan_comps: list[tuple[int, int, int]],
    ss: int, se: int, ah: int, al: int,
    comps: list[dict],
    coeffs: list[list[list[int]]],
    huff: dict,
    restart: int,
    geom,
    h: int,
    w: int,
) -> None:
    """Apply ONE progressive scan to the coefficient accumulators.
    Four state machines (G.1.2.2-G.1.2.3): DC/AC x first/refinement."""
    mcus_x, mcus_y, hmax, vmax, nbx_full, nby_full = geom
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"invalid spectral band {ss}..{se}")
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not dc_scan and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")

    # scan units: interleaved MCUs (multi-component DC) or single
    # blocks in the component's own ceil grid (T.81 A.2.2) — restart
    # intervals count units
    units: list[list[tuple[int, int, list[int]]]] = []
    if len(scan_comps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                u = []
                for ci, td, ta in scan_comps:
                    comp = comps[ci]
                    for v in range(comp["v"]):
                        for hs in range(comp["h"]):
                            bidx = (my * comp["v"] + v) * nbx_full[ci] + (
                                mx * comp["h"] + hs
                            )
                            u.append((ci, td, coeffs[ci][bidx]))
                units.append(u)
    else:
        ci, td, ta = scan_comps[0]
        nby_s, nbx_s = _scan_grid(comps[ci], h, w, hmax, vmax)
        tab = td if dc_scan else ta
        for by in range(nby_s):
            for bx in range(nbx_s):
                units.append(
                    [(ci, tab, coeffs[ci][by * nbx_full[ci] + bx])]
                )

    # table LUTs resolved once (a refinement DC scan uses no table —
    # it is one raw bit per block)
    luts: dict[int, list] = {}
    if not (dc_scan and ah != 0):
        tclass = 0 if dc_scan else 1
        for _ci, tid, _blk in units[0]:
            if (tclass, tid) not in huff:
                raise ValueError("JPEG scan references missing table")
            luts[tid] = huff[(tclass, tid)]

    # Bit-reader state rides in plain locals across the whole scan
    # (bdata/dlen/pos/nbits/acc), with the huffman-peek and raw-bit
    # reads inlined: the previous one-call-per-symbol/-bit shape
    # (_read_huff / _read_bits, a call + 8 attribute syncs each, one
    # PER REFINEMENT BIT) was the dominant cost of progressive decode
    # (r12 profile; guide §4.2 applied to the interpreter itself).
    # Decode semantics are unchanged — same refills, same masks, same
    # error messages.
    bdata = intervals[0]
    dlen = len(bdata)
    pos = nbits = acc = 0
    interval_i = 0
    preds = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    for ui, unit in enumerate(units):
        if restart and ui and ui % restart == 0:
            interval_i += 1
            if interval_i >= len(intervals):
                raise ValueError("JPEG missing restart interval data")
            bdata = intervals[interval_i]
            dlen = len(bdata)
            pos = nbits = acc = 0
            preds = [0] * len(comps)
            eobrun = 0
        for ci, tid, blk in unit:
            if dc_scan and ah == 0:
                # DC first: huffman size symbol + magnitude bits
                while nbits < 16 and pos < dlen:
                    acc = (acc << 8) | bdata[pos]
                    pos += 1
                    nbits += 8
                if nbits >= 16:
                    w_ = (acc >> (nbits - 16)) & 0xFFFF
                else:
                    w_ = (acc << (16 - nbits)) & 0xFFFF
                entry = luts[tid][w_]
                length = entry >> 8
                if length == 0 or length > nbits:
                    raise ValueError("invalid JPEG huffman code")
                nbits -= length
                acc &= (1 << nbits) - 1
                s = entry & 0xFF
                if s > 11:
                    raise ValueError("invalid DC size")
                if s:
                    while nbits < s:
                        if pos >= dlen:
                            raise ValueError("JPEG entropy stream truncated")
                        acc = (acc << 8) | bdata[pos]
                        pos += 1
                        nbits += 8
                    nbits -= s
                    bits_ = (acc >> nbits) & ((1 << s) - 1)
                    acc &= (1 << nbits) - 1
                    preds[ci] += (
                        bits_
                        if bits_ >= (1 << (s - 1))
                        else bits_ - (1 << s) + 1
                    )
                blk[0] = preds[ci] << al
            elif dc_scan:
                # DC refinement: one raw bit per block
                if nbits < 1:
                    if pos >= dlen:
                        raise ValueError("JPEG entropy stream truncated")
                    acc = (acc << 8) | bdata[pos]
                    pos += 1
                    nbits += 8
                nbits -= 1
                if (acc >> nbits) & 1:
                    blk[0] |= p1
                acc &= (1 << nbits) - 1
            elif ah == 0:
                # AC first scan (G.1.2.2): EOB runs span blocks
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                lut = luts[tid]
                while k <= se:
                    while nbits < 16 and pos < dlen:
                        acc = (acc << 8) | bdata[pos]
                        pos += 1
                        nbits += 8
                    if nbits >= 16:
                        w_ = (acc >> (nbits - 16)) & 0xFFFF
                    else:
                        w_ = (acc << (16 - nbits)) & 0xFFFF
                    entry = lut[w_]
                    length = entry >> 8
                    if length == 0 or length > nbits:
                        raise ValueError("invalid JPEG huffman code")
                    nbits -= length
                    acc &= (1 << nbits) - 1
                    sym = entry & 0xFF
                    r, s = sym >> 4, sym & 0xF
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("AC run past band end")
                        while nbits < s:
                            if pos >= dlen:
                                raise ValueError(
                                    "JPEG entropy stream truncated"
                                )
                            acc = (acc << 8) | bdata[pos]
                            pos += 1
                            nbits += 8
                        nbits -= s
                        bits_ = (acc >> nbits) & ((1 << s) - 1)
                        acc &= (1 << nbits) - 1
                        blk[k] = (
                            bits_
                            if bits_ >= (1 << (s - 1))
                            else bits_ - (1 << s) + 1
                        ) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                while nbits < r:
                                    if pos >= dlen:
                                        raise ValueError(
                                            "JPEG entropy stream truncated"
                                        )
                                    acc = (acc << 8) | bdata[pos]
                                    pos += 1
                                    nbits += 8
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                                acc &= (1 << nbits) - 1
                            break
                        k += 16  # ZRL
            else:
                # AC refinement scan (G.1.2.3): correction bits for
                # already-nonzero history, (run,1) for newly-nonzero
                lut = luts[tid]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        while nbits < 16 and pos < dlen:
                            acc = (acc << 8) | bdata[pos]
                            pos += 1
                            nbits += 8
                        if nbits >= 16:
                            w_ = (acc >> (nbits - 16)) & 0xFFFF
                        else:
                            w_ = (acc << (16 - nbits)) & 0xFFFF
                        entry = lut[w_]
                        length = entry >> 8
                        if length == 0 or length > nbits:
                            raise ValueError("invalid JPEG huffman code")
                        nbits -= length
                        acc &= (1 << nbits) - 1
                        sym = entry & 0xFF
                        r, s = sym >> 4, sym & 0xF
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "invalid refinement magnitude"
                                )
                            if nbits < 1:
                                if pos >= dlen:
                                    raise ValueError(
                                        "JPEG entropy stream truncated"
                                    )
                                acc = (acc << 8) | bdata[pos]
                                pos += 1
                                nbits += 8
                            nbits -= 1
                            newval = p1 if (acc >> nbits) & 1 else m1
                            acc &= (1 << nbits) - 1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                while nbits < r:
                                    if pos >= dlen:
                                        raise ValueError(
                                            "JPEG entropy stream truncated"
                                        )
                                    acc = (acc << 8) | bdata[pos]
                                    pos += 1
                                    nbits += 8
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                                acc &= (1 << nbits) - 1
                            break
                        while k <= se:
                            v = blk[k]
                            if v != 0:
                                if nbits < 1:
                                    if pos >= dlen:
                                        raise ValueError(
                                            "JPEG entropy stream truncated"
                                        )
                                    acc = (acc << 8) | bdata[pos]
                                    pos += 1
                                    nbits += 8
                                nbits -= 1
                                bit_ = (acc >> nbits) & 1
                                acc &= (1 << nbits) - 1
                                if bit_ and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    if newval:
                                        blk[k] = newval
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    # remainder of the band: history corrections only
                    while k <= se:
                        v = blk[k]
                        if v != 0:
                            if nbits < 1:
                                if pos >= dlen:
                                    raise ValueError(
                                        "JPEG entropy stream truncated"
                                    )
                                acc = (acc << 8) | bdata[pos]
                                pos += 1
                                nbits += 8
                            nbits -= 1
                            bit_ = (acc >> nbits) & 1
                            acc &= (1 << nbits) - 1
                            if bit_ and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1


# ---------------------------------------------------------------------------
# progressive encoder
# ---------------------------------------------------------------------------

# libjpeg's default progressive scan script (jcparam.c semantics,
# re-derived): DC approximation first, luma low band early, two-level
# AC successive approximation on luma, DC + AC refinements last. Each
# entry: (component indices, Ss, Se, Ah, Al).
_PROGRESSIVE_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROGRESSIVE_SCRIPT_GREY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _optimal_huffman(symbols) -> tuple[bytes, bytes]:
    """Frequency-optimal length-limited huffman table for one scan —
    the T.81 Annex K.2 code-length algorithm (pair the two least
    frequent, chain via 'others', then fold lengths >16 down and drop
    the reserved all-ones point via the freq-1 dummy symbol 256)."""
    freq = [0] * 257
    for s in symbols:
        freq[s] += 1
    freq[256] = 1  # dummy: guarantees the all-ones code stays unused
    codesize = [0] * 257
    others = [-1] * 257
    # scan only live symbols (freq > 0), in ascending index order — the
    # selection (LAST index among minima, via <=) is identical to the
    # original full 0..256 scans, because dead entries can never win;
    # live count is the scan's distinct-symbol count (tens), not 257
    # (r12: this loop pair was ~0.3 s of the codec profile)
    alive = [i for i in range(257) if freq[i]]
    while True:
        c1, v = -1, None
        for i in alive:
            if v is None or freq[i] <= v:
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in alive:
            if i != c1 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        alive.remove(c2)
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for length in range(32, 16, -1):  # K.2 adjust_bits
        while bits[length] > 0:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    length = 16
    while bits[length] == 0:
        length -= 1
    bits[length] -= 1  # remove the dummy's (longest) code point
    # bucket by code size in one pass (identical order to the old
    # 32 x 256 scan: sizes ascending, symbol index ascending within)
    by_size: list[list[int]] = [[] for _ in range(33)]
    for i in range(256):
        if 1 <= codesize[i] <= 32:
            by_size[codesize[i]].append(i)
    vals = b"".join(bytes(b) for b in by_size[1:])
    return bytes(bits[1:17]), vals


# Progressive-encoder token stream: ops are PACKED INTS, not tuples —
# the tuple-per-token form allocated ~4M tuples per image and made
# _serialize_ops string-compare op kinds (r12 profile: ~40% of
# progressive encode was token plumbing). Layout:
#   huffman symbol  : 0..255 (the symbol itself)
#   raw bits        : _OP_BITS | (nbits << 16) | value   (value < 2^16)
#   restart marker  : _OP_RST | n
# The emitted symbol/bit sequence is unchanged, so the output bytes
# are identical.
_OP_BITS = 1 << 30
_OP_RST = 1 << 29
_OP_BIT1 = _OP_BITS | (1 << 16)  # one raw bit: _OP_BIT1 | bit


def _dc_first_ops(ops, blocks, al, preds, ci):
    """blocks: the block list for one unit in MCU/component order."""
    for blk in blocks:
        val = blk[0] >> al
        diff = val - preds[ci]
        preds[ci] = val
        size = abs(diff).bit_length()
        ops.append(size)
        if size:
            ops.append(
                _OP_BITS | (size << 16)
                | ((diff if diff > 0 else diff + (1 << size) - 1)
                   & ((1 << size) - 1))
            )


class _AcState:
    """Cross-block AC-scan encoder state: the EOB run counter and the
    correction bits buffered while a run is open (flushed with it)."""

    __slots__ = ("eobrun", "pending")

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self, ops) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            ops.append(r << 4)
            if r:
                ops.append(_OP_BITS | (r << 16) | (self.eobrun - (1 << r)))
            self.eobrun = 0
            ops.extend(self.pending)  # already-packed 1-bit ops
            self.pending = []


def _ac_first_ops(ops, blk, ss, se, al, st: _AcState) -> None:
    """One block of an AC first scan (G.1.2.2): point transform toward
    zero, (run,size) symbols, ZRL, cross-block EOB runs."""
    r = 0
    # point-transform the whole band in one listcomp (C-speed) instead
    # of per-coefficient branches in the loop
    vals = [(v >> al) if v >= 0 else -((-v) >> al) for v in blk[ss : se + 1]]
    for v in vals:
        if v == 0:
            r += 1
            continue
        st.flush(ops)
        while r > 15:
            ops.append(0xF0)
            r -= 16
        size = abs(v).bit_length()
        ops.append((r << 4) | size)
        ops.append(
            _OP_BITS | (size << 16)
            | ((v if v > 0 else v + (1 << size) - 1) & ((1 << size) - 1))
        )
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush(ops)


def _ac_refine_ops(ops, blk, ss, se, al, st: _AcState) -> None:
    """One block of an AC refinement scan (G.1.2.3): correction bits
    for already-nonzero history, (run,1)+sign for newly-nonzero, runs
    measured over zero-history positions only."""
    absvals = [abs(v) >> al for v in blk[ss : se + 1]]
    eob = ss - 1  # position of the LAST newly-nonzero coefficient
    for i in range(len(absvals) - 1, -1, -1):
        if absvals[i] == 1:
            eob = ss + i
            break
    r = 0
    br: list[int] = []  # packed correction bits since the last symbol
    for k in range(ss, se + 1):
        a = absvals[k - ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush(ops)
            ops.append(0xF0)
            r -= 16
            ops.extend(br)
            br = []
        if a > 1:
            br.append(_OP_BIT1 | (a & 1))
            continue
        st.flush(ops)
        ops.append((r << 4) | 1)
        ops.append(_OP_BIT1 | (1 if blk[k] > 0 else 0))
        ops.extend(br)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush(ops)


def _serialize_ops(ops, codes) -> bytes:
    """Packed-int token stream -> byte-stuffed entropy bytes: huffman
    symbols (< 256), raw bits (_OP_BITS), restart markers (_OP_RST —
    pad to byte with 1s, emit unstuffed FFD0+n)."""
    buf = bytearray()
    acc, nbits = 0, 0

    def _flush_byte_aligned():
        nonlocal acc, nbits
        if nbits % 8:
            pad = 8 - nbits % 8
            acc = (acc << pad) | ((1 << pad) - 1)
            nbits += pad
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)
        acc = 0

    for op in ops:
        if op < 256:  # huffman symbol
            length, code = codes[op]
            acc = (acc << length) | code
            nbits += length
        elif op & _OP_BITS:  # raw bits: value already masked at pack time
            n = (op >> 16) & 0x1FFF
            acc = (acc << n) | (op & 0xFFFF)
            nbits += n
        else:  # restart marker
            _flush_byte_aligned()
            buf += bytes([0xFF, 0xD0 + (op & 7)])
            continue
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)
        acc &= (1 << nbits) - 1
    _flush_byte_aligned()
    return bytes(buf)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart: int = 0,
    scans: list | None = None,
) -> bytes:
    """uint8 array (H,W) or (H,W,3) -> progressive (SOF2) JFIF bytes
    using the libjpeg default scan script (spectral selection AND
    two-level successive approximation) with a frequency-optimal
    huffman table per scan — the dialect every web progressive JPEG
    uses. The quantized coefficients are IDENTICAL to
    :func:`encode_jpeg` at the same quality/subsampling, so decoding
    either file yields bit-identical pixels (asserted by tests).
    ``restart`` > 0 emits DRI + RSTn markers every that many scan
    units. ``scans`` overrides the script with (comp_indices, Ss, Se,
    Ah, Al) tuples."""
    h, w, comps, qts = _prepare_planes(arr, quality, subsampling)
    if scans is None:
        scans = (
            _PROGRESSIVE_SCRIPT_GREY if len(comps) == 1
            else _PROGRESSIVE_SCRIPT_COLOR
        )
    out = _emit_headers(qts, h, w, comps, 0xC2)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    hmax = max(hi for _pl, hi, _vi, _tq, _th in comps)
    vmax = max(vi for _pl, _hi, vi, _tq, _th in comps)
    mcus_y = comps[0][0].shape[0] // (8 * vmax)
    mcus_x = comps[0][0].shape[1] // (8 * hmax)
    zz_rows = [_block_zigzag_rows(pl, qts[tq]) for pl, _h, _v, tq, _t in comps]

    for comp_idx, ss, se, ah, al in scans:
        ops: list = []
        dc_scan = ss == 0
        preds = [0] * len(comps)
        st = _AcState()
        rstn = 0
        interleaved = len(comp_idx) > 1

        if interleaved:
            if not dc_scan:
                raise ValueError("progressive AC scan must be single-component")
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    u = []
                    for ci in comp_idx:
                        _pl, hi, vi, _tq, _th = comps[ci]
                        rows, nbx = zz_rows[ci]
                        for v in range(vi):
                            for hs in range(hi):
                                u.append(
                                    (ci, rows[(my * vi + v) * nbx + mx * hi + hs])
                                )
                    units.append(u)
        else:
            ci = comp_idx[0]
            _pl, hi, vi, _tq, _th = comps[ci]
            comp_meta = {"h": hi, "v": vi}
            nby_s, nbx_s = _scan_grid(comp_meta, h, w, hmax, vmax)
            rows, nbx = zz_rows[ci]
            units = [
                [(ci, rows[by * nbx + bx])]
                for by in range(nby_s)
                for bx in range(nbx_s)
            ]

        for ui, unit in enumerate(units):
            if restart and ui and ui % restart == 0:
                st.flush(ops)
                ops.append(_OP_RST | (rstn & 7))
                rstn += 1
                preds = [0] * len(comps)
            for ci, blk in unit:
                if dc_scan and ah == 0:
                    _dc_first_ops(ops, [blk], al, preds, ci)
                elif dc_scan:
                    ops.append(_OP_BIT1 | ((blk[0] >> al) & 1))
                elif ah == 0:
                    _ac_first_ops(ops, blk, ss, se, al, st)
                else:
                    _ac_refine_ops(ops, blk, ss, se, al, st)
        st.flush(ops)

        syms = [op for op in ops if op < 256]
        codes: dict = {}
        if syms:
            bits, vals = _optimal_huffman(syms)
            codes, dht = _canonical_codes(bits, vals)
            tclass = 0 if dc_scan else 1
            out += (
                b"\xff\xc4"
                + struct.pack(">HB", 3 + len(dht), tclass << 4)
                + dht
            )
        sos = struct.pack("B", len(comp_idx))
        for ci in comp_idx:
            sos += struct.pack("BB", ci + 1, 0)  # Td=0 / Ta=0 (per-scan table)
        sos += struct.pack("BBB", ss, se, (ah << 4) | al)
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += _serialize_ops(ops, codes)

    out += b"\xff\xd9"
    return bytes(out)
