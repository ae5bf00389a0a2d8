"""Pure-Python XXH64 — bit-identical to Spark's ``F.xxhash64`` (seed
42), so DRIVER-side code can compute the same hash an executor-side
expression produces. Used by the hidden-partitioning layer to translate
a ``bucket(n, col)`` equality predicate into the partition value it
lands in (planning-time arithmetic, no Spark job), and available to any
test that wants to cross-check xxhash64-derived layouts.

Algorithm: the public XXH64 specification (Yann Collet, BSD); Spark's
``XxHash64`` expression hashes a LongType as its 8-byte little-endian
block and a StringType as its UTF-8 bytes, both with the column seed.
Parity is pinned by tests/test_hidden_partitioning.py against
``F.xxhash64`` for longs and strings.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` — returned as Spark's SIGNED
    64-bit long."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        while i <= n - 32:
            lanes = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _round(v1, lanes[0]), _round(v2, lanes[1])
            v3, v4 = _round(v3, lanes[2]), _round(v4, lanes[3])
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_long(value: int, seed: int = 42) -> int:
    """Spark ``xxhash64(CAST(x AS BIGINT))``: XXH64 over the value's
    8-byte little-endian encoding."""
    return xxh64(struct.pack("<q", value), seed)


def xxhash64_str(value: str, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col)``: XXH64 over the UTF-8 bytes."""
    return xxh64(value.encode("utf-8"), seed)
