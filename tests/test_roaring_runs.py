"""Run-container roaring fixtures (ADVICE r11, medium): every prior
DV fixture was re-encoded by this repo's own NO-RUN serializer, so the
run branch (cookie 12347), the n>=4 offset-header skip, run+array+
bitmap mixes, and the signed-cookie edge had never executed. The
serializer below is an INDEPENDENT clean-room implementation of the
public RoaringFormatSpec (https://github.com/RoaringBitmap/
RoaringFormatSpec) — container choice, offset computation, and byte
packing are written from the spec text, not from delta_interop/
delta_reader — and both parsers under test must invert it exactly.

Layout (spec "standard serialization", run-capable):
  <u32 cookie = 12347 | (n_containers-1) << 16>
  <ceil(n/8) bytes run bitset, bit i -> container i is a run>
  n x <u16 key><u16 cardinality-1>              (descriptive header)
  [n x <u32 byte offset from bitmap start>]      (only when n >= 4)
  containers in key order:
    run:    <u16 n_runs> then n_runs x <u16 start><u16 length-1>
    array:  card x <u16>          (card <= 4096)
    bitmap: 1024 x <u64>          (card > 4096)
Delta wraps 32-bit bitmaps in a RoaringBitmapArray:
  <i32 magic 1681511377><i64 n_bitmaps> then each bitmap, index = the
  value's high 32 bits.
"""

from __future__ import annotations

import struct

from datalake_scripts_spark.operators.delta_interop import (
    _deserialize_positions,
)
from datalake_scripts_spark.operators.delta_reader import (
    _parse_roaring_bitmap32,
)

MAGIC = 1681511377
COOKIE_RUN = 12347


def rb32_runs(containers: list[tuple[int, str, object]]) -> bytes:
    """Serialize one 32-bit roaring bitmap with the RUN cookie.

    ``containers``: ordered (key, kind, payload) where kind is
    'run'    -> payload [(start, count), ...]   (count = elements)
    'array'  -> payload sorted [u16, ...]
    'bitmap' -> payload sorted [u16, ...] (emitted as 1024 u64 words)
    """
    n = len(containers)
    assert n >= 1
    cookie = (COOKIE_RUN | ((n - 1) << 16)) & 0xFFFFFFFF
    out = bytearray(struct.pack("<I", cookie))
    bitset = bytearray((n + 7) // 8)
    for i, (_k, kind, _p) in enumerate(containers):
        if kind == "run":
            bitset[i // 8] |= 1 << (i % 8)
    out += bytes(bitset)
    bodies = []
    for key, kind, payload in containers:
        if kind == "run":
            card = sum(c for _s, c in payload)
            body = struct.pack("<H", len(payload))
            for start, count in payload:
                body += struct.pack("<HH", start, count - 1)
        elif kind == "array":
            card = len(payload)
            assert card <= 4096
            body = struct.pack(f"<{card}H", *sorted(payload))
        else:  # bitmap
            card = len(payload)
            words = [0] * 1024
            for v in payload:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        bodies.append((key, card, body))
    for key, card, _body in bodies:
        out += struct.pack("<HH", key, card - 1)
    if n >= 4:  # NO_OFFSET_THRESHOLD: offset header present
        pos = len(out) + 4 * n
        for _key, _card, body in bodies:
            out += struct.pack("<I", pos)
            pos += len(body)
    for _key, _card, body in bodies:
        out += body
    return bytes(out)


def rbarray(bitmaps: list[bytes]) -> bytes:
    return struct.pack("<iq", MAGIC, len(bitmaps)) + b"".join(bitmaps)


def expected(containers, hi=0):
    vals = []
    for key, kind, payload in containers:
        base = (hi << 32) | (key << 16)
        if kind == "run":
            for start, count in payload:
                vals.extend(base + start + j for j in range(count))
        else:
            vals.extend(base + v for v in payload)
    return sorted(vals)


def both_parsers(blob32: bytes) -> tuple[list[int], list[int]]:
    """(interop values, reader values) for ONE 32-bit bitmap."""
    interop = list(_deserialize_positions(rbarray([blob32])))
    reader, end = _parse_roaring_bitmap32(blob32, 0)
    assert end == len(blob32), "parser did not consume the whole bitmap"
    return interop, sorted(reader)


def test_single_run_container():
    cs = [(0, "run", [(5, 3), (100, 1), (4000, 10)])]
    want = expected(cs)
    interop, reader = both_parsers(rb32_runs(cs))
    assert interop == want
    assert reader == want


def test_mixed_three_containers_no_offset_header():
    # n = 3 < NO_OFFSET_THRESHOLD: run-cookie stream with NO offset
    # header — the skip branch both parsers must NOT take
    cs = [
        (0, "array", [1, 7, 65535]),
        (2, "run", [(0, 65536)]),          # full-container run
        (9, "array", [0]),
    ]
    want = expected(cs)
    interop, reader = both_parsers(rb32_runs(cs))
    assert interop == want
    assert reader == want


def test_mixed_four_containers_with_offset_header():
    # n = 4 >= threshold: offset header IS present and must be skipped
    dense = list(range(0, 9000, 2))  # card 4500 > 4096 -> bitmap
    cs = [
        (1, "run", [(10, 5)]),
        (3, "array", [42, 43, 44]),
        (5, "bitmap", dense),
        (700, "run", [(0, 1), (65534, 2)]),
    ]
    want = expected(cs)
    interop, reader = both_parsers(rb32_runs(cs))
    assert interop == want
    assert reader == want


def test_bitmap_container_card_over_4096():
    dense = list(range(4097))
    cs = [(0, "bitmap", dense)]
    want = expected(cs)
    interop, reader = both_parsers(rb32_runs(cs))
    assert interop == want
    assert reader == want


def test_multi_bitmap_array_mixes_cookies():
    # hi=0: this repo's own no-run serialization (from the exporter);
    # hi=1: run-serialized — a RoaringBitmapArray mixing both cookies,
    # which delta-spark may legally produce
    from datalake_scripts_spark.operators.delta_interop import (
        _serialize_roaring32,
    )

    lo_cs = [(0, "array", [3, 4, 5])]
    hi_cs = [(0, "run", [(0, 8)]), (1, "array", [9])]
    blob = rbarray([
        _serialize_roaring32([3, 4, 5]),
        rb32_runs(hi_cs),
    ])
    want = expected(lo_cs, hi=0) + expected(hi_cs, hi=1)
    assert list(_deserialize_positions(blob)) == sorted(want)


def test_signed_cookie_32769_containers():
    """Container count >= 32769 sets bit 31 of the cookie word: the
    interop parser unpacks it as SIGNED int32, so an unmasked shift
    went negative (ADVICE r11). 32769 single-value array containers."""
    n = 32769
    cs = [(k, "array", [k & 0xFFFF]) for k in range(n)]
    blob = rb32_runs(cs)
    want = expected(cs)
    interop, reader = both_parsers(blob)
    assert interop == want
    assert reader == want


def test_roundtrip_fuzz_against_independent_encoder():
    """Deterministic pseudo-random position sets, encoded with the
    independent serializer using run containers for dense spans —
    both parsers must recover the exact set."""
    import random

    rng = random.Random(1234)
    for trial in range(5):
        vals = set()
        # dense runs
        for _ in range(rng.randint(1, 4)):
            start = rng.randrange(0, 1 << 18)
            vals.update(range(start, start + rng.randint(1, 300)))
        # sparse points
        vals.update(rng.randrange(0, 1 << 20) for _ in range(50))
        by_key: dict[int, list[int]] = {}
        for v in sorted(vals):
            by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
        containers = []
        for key, lows in sorted(by_key.items()):
            if rng.random() < 0.5:
                # encode as runs (any set is legal as runs)
                runs, s = [], None
                prev = None
                for x in lows:
                    if s is None:
                        s = prev = x
                    elif x == prev + 1:
                        prev = x
                    else:
                        runs.append((s, prev - s + 1))
                        s = prev = x
                runs.append((s, prev - s + 1))
                containers.append((key, "run", runs))
            elif len(lows) > 4096:
                containers.append((key, "bitmap", lows))
            else:
                containers.append((key, "array", lows))
        blob = rb32_runs(containers)
        want = sorted(vals)
        interop, reader = both_parsers(blob)
        assert interop == want, f"trial {trial} interop"
        assert reader == want, f"trial {trial} reader"
