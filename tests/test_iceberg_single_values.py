"""Property tests for the Iceberg single-value binary codec (table
spec Appendix D): the exporter's encoder (_single_value_ser) and BOTH
independent decoders — the importer's (_single_value_deser, native
stats convention) and the reader's own (_sv_deser, logical values) —
agree on every value hypothesis can produce. Cross-implementation
agreement is the point: the reader shares no code with the exporter,
so a codec bug breaks these instead of round-tripping invisibly."""

from __future__ import annotations

import datetime
import struct

from hypothesis import given, settings, strategies as st

from datalake_scripts_spark.operators.iceberg_interop import (
    _single_value_deser,
    _single_value_ser,
)
from datalake_scripts_spark.operators.iceberg_reader import _sv_deser

S = settings(max_examples=200, deadline=None)


@S
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(v):
    b = _single_value_ser("long", v)
    assert b == struct.pack("<q", v)
    assert _single_value_deser("long", b) == v
    assert _sv_deser("long", b) == v


@S
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_roundtrip(v):
    b = _single_value_ser("int", v)
    assert len(b) == 4
    assert _single_value_deser("int", b) == v
    assert _sv_deser("int", b) == v


@S
@given(st.floats(allow_nan=False, width=64))
def test_double_roundtrip(v):
    b = _single_value_ser("double", v)
    assert len(b) == 8
    assert _single_value_deser("double", b) == v
    assert _sv_deser("double", b) == v


@S
@given(st.text(max_size=200))
def test_string_roundtrip(v):
    b = _single_value_ser("string", v)
    assert _single_value_deser("string", b) == v
    assert _sv_deser("string", b) == v


@S
@given(
    st.dates(
        min_value=datetime.date(1000, 1, 1),
        max_value=datetime.date(9000, 1, 1),
    )
)
def test_date_roundtrip(d):
    b = _single_value_ser("date", d.isoformat())
    assert len(b) == 4  # int days little-endian per spec
    assert _single_value_deser("date", b) == d.isoformat()
    assert _sv_deser("date", b) == d


@S
@given(
    st.datetimes(
        min_value=datetime.datetime(1000, 1, 1),
        max_value=datetime.datetime(9000, 1, 1),
    )
)
def test_timestamp_roundtrip(dt):
    b = _single_value_ser("timestamp", dt.isoformat())
    assert len(b) == 8  # long micros little-endian per spec
    assert _single_value_deser("timestamp", b) == dt.isoformat()
    assert _sv_deser("timestamp", b) == dt


def test_booleans_and_refusals():
    assert _single_value_ser("boolean", True) == b"\x01"
    assert _sv_deser("boolean", b"\x00") is False
    # decimal bounds are deliberately NOT exported (float-narrowing
    # would prune true extremes) and unknown types return None
    assert _single_value_ser("decimal(9,2)", 1.5) is None
    assert _single_value_ser("uuid", "x") is None
    assert _single_value_deser("uuid", b"x") is None
