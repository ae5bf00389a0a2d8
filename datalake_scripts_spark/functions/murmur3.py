"""Pure-Python MurmurHash3 x86_32 — the hash Iceberg's ``bucket[N]``
transform is DEFINED over (Iceberg table spec, Appendix B: 32-bit
Murmur3, x86 variant, seed 0, over the single-value binary
serialization). The write-time ``bucket_hash='murmur3'`` option in the
versioned layer uses this so new tables' hidden bucket layouts are
truthfully exportable as Iceberg ``bucket[N]`` specs — an xxhash64
layout can never be (a translated spec would make foreign readers
prune WRONG, the r9 refusal rationale).

Algorithm: the public MurmurHash3 reference (Austin Appleby, public
domain; github.com/aappleby/smhasher). Value serialization per the
Iceberg spec:

- int and long  -> 8-byte little-endian long (ints are widened first,
  so bucket(int x) == bucket(long x));
- string        -> UTF-8 bytes;
- date          -> days from epoch as long;
- timestamp(tz) -> micros from epoch as long;
- binary/fixed  -> raw bytes.

``bucket_value = (murmur3_32(serialized) & 0x7FFFFFFF) % N`` — the
two's-complement positive part, NOT abs().

Parity pinned by tests/test_murmur3.py against the spec's published
hash examples (Appendix B) and the reference implementation's generic
test strings.
"""

from __future__ import annotations

import struct

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32 over ``data`` -> SIGNED 32-bit int (the
    Java convention Iceberg's examples are published in)."""
    h = seed & _M32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    # tail
    k = 0
    tail = data[n_blocks * 4:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    # finalization mix
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_long(v: int) -> int:
    """Iceberg hash of an int/long value: murmur3_32 of the 8-byte
    little-endian two's-complement long."""
    return murmur3_32(struct.pack("<q", int(v)))


def hash_str(s: str) -> int:
    """Iceberg hash of a string value: murmur3_32 of its UTF-8."""
    return murmur3_32(s.encode("utf-8"))


def bucket_long(v: int, n: int) -> int:
    return (hash_long(v) & 0x7FFFFFFF) % n


def bucket_str(s: str, n: int) -> int:
    return (hash_str(s) & 0x7FFFFFFF) % n
